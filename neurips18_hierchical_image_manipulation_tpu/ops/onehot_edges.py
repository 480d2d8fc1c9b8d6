"""Fused on-device preprocessing: one-hot label maps + instance edge maps.

Reference behavior (SURVEY.md §3.2 ``encode_input`` hot path, pix2pixHD
``models/pix2pixHD_model.py`` lineage):

  * label ids (B,1,H,W float) -> ``zeros(B, label_nc, H, W).scatter_(1,
    label.long(), 1.0)``
  * edge map from instance ids: a pixel is an edge if it differs from any
    4-neighbour — computed as four shifted != comparisons OR-ed together,
    float-cast, concatenated as one extra input channel (skipped under
    ``--no_instance``).

Here both run on-device inside the jitted train step (BASELINE.json:5 —
"preprocessing hot path fuses into the jitted XLA graph"), NHWC.
"""

from __future__ import annotations

import jax.numpy as jnp


def one_hot_label(label_ids, label_nc, dtype=jnp.float32):
    """(B,H,W) int ids -> (B,H,W,label_nc) one-hot. Matches torch scatter_
    semantics for in-range ids; out-of-range ids produce all-zero rows
    (torch would error — we clip-free encode, documented divergence)."""
    ids = label_ids.astype(jnp.int32)
    nc_range = jnp.arange(label_nc, dtype=jnp.int32)
    return (ids[..., None] == nc_range).astype(dtype)


def instance_edges(inst, dtype=jnp.float32):
    """(B,H,W) instance-id map -> (B,H,W,1) binary edge map.

    Exactly reproduces pix2pixHD ``get_edges``: edge[:, 1:] |= inst[:, 1:]
    != inst[:, :-1] in all four shift directions (so both pixels adjacent
    to a boundary are marked), borders stay zero-extended. Implemented as
    shifted-compare + zero-pad + OR (no scatter: the .at[].set form
    lowered to ~1.6 ms/step of XLA scatter at 512x256 bs32)."""
    inst = inst.astype(jnp.int32)
    dif_w = inst[:, :, 1:] != inst[:, :, :-1]
    dif_h = inst[:, 1:, :] != inst[:, :-1, :]

    def padw(x, before, after):
        return jnp.pad(x, ((0, 0), (0, 0), (before, after)))

    def padh(x, before, after):
        return jnp.pad(x, ((0, 0), (before, after), (0, 0)))

    e = padw(dif_w, 1, 0) | padw(dif_w, 0, 1) | padh(dif_h, 1, 0) | padh(dif_h, 0, 1)
    return e.astype(dtype)[..., None]


def encode_input(label_ids, inst=None, label_nc=35, dtype=jnp.float32):
    """Fused encode_input: one-hot [+ edge channel]. Returns (B,H,W,C)
    with C = label_nc (+1 when inst given) — the generator/discriminator
    conditioning tensor.

    The one-hot and edge channels are built in ONE elementwise select over
    the output channel index instead of concatenating two full-res
    tensors — the concat re-lays the 35->36ch lane tiles and measured
    5.5 ms/step at 512x256 bs32; this form fuses to a single write."""
    if inst is None:
        return one_hot_label(label_ids, label_nc, dtype)
    ids = label_ids.astype(jnp.int32)[..., None]
    edge = instance_edges(inst, jnp.bool_)
    c_idx = jnp.arange(label_nc + 1, dtype=jnp.int32)
    cond = jnp.where(c_idx == label_nc, edge, ids == c_idx)
    return cond.astype(dtype)


def encode_input_rgb_packed(label_pad, edge_pad, rgb_pad, label_nc, dtype=jnp.float32):
    """Build the generator stem input DIRECTLY in s2d-by-2 packed layout
    from PRE-PADDED (reflect) components: label_pad (B,Hp,Wp) int ids,
    edge_pad (B,Hp,Wp,1) or None, rgb_pad (B,Hp,Wp,k) float extras.
    Returns (B,Hp/2,Wp/2,4*(label_nc[+1]+k)) matching nnops.s2d2 of the
    unpacked concat — one fused write, no unpacked intermediate."""
    from . import nnops

    ids4 = nnops.s2d2(label_pad.astype(jnp.int32)[..., None])  # (.,.,.,4)
    k = rgb_pad.shape[-1]
    ne = label_nc + (0 if edge_pad is None else 1)
    c_idx = jnp.arange(ne + k, dtype=jnp.int32)
    out = ids4[..., None] == c_idx  # (.,.,.,4,ne+k); ids never match >= label_nc
    if edge_pad is not None:
        edge4 = nnops.s2d2(edge_pad.astype(jnp.bool_))
        out = jnp.where(c_idx == label_nc, edge4[..., None], out)
    out = out.astype(dtype)
    rgb4 = nnops.s2d2(rgb_pad).reshape(rgb_pad.shape[0], *ids4.shape[1:3], 4, k)
    for j in range(k):
        out = jnp.where(c_idx == ne + j, rgb4[..., j : j + 1].astype(dtype), out)
    n, h2, w2 = ids4.shape[:3]
    return out.reshape(n, h2, w2, 4 * (ne + k))


def encode_input_rgb(label_ids, inst, rgb, label_nc=35, dtype=jnp.float32):
    """(label one-hot ⊕ edge ⊕ rgb) built in ONE fused elementwise select
    over the output channel index — no full-res concats (each costs
    5-8 ms/step at 512x256 bs32 re-laying the lane tiles). ``rgb`` is any
    extra float conditioning with a small channel count (the masked image,
    optionally + encoder features); ``inst`` may be None (--no_instance).
    Channel layout matches concat([one_hot, edges?, rgb], -1) exactly."""
    ids = label_ids.astype(jnp.int32)[..., None]
    ne = label_nc + (0 if inst is None else 1)
    c_idx = jnp.arange(ne + rgb.shape[-1], dtype=jnp.int32)
    oh = ids == c_idx  # channels >= label_nc never match in-range ids
    if inst is not None:
        edge = instance_edges(inst, jnp.bool_)
        oh = jnp.where(c_idx == label_nc, edge, oh)
    # rgb channels, selected per output channel: nested wheres stay one
    # fused write (3-6 channels)
    out = oh.astype(dtype)
    for k in range(rgb.shape[-1]):
        out = jnp.where(c_idx == ne + k, rgb[..., k : k + 1].astype(dtype), out)
    return out
