"""Pallas TPU kernels: the fused encode_input CHANNEL EXPANSION.

The flagship train step (models/pix2pixhd.py encode_input, stem-pack
branch) materializes two conditioning tensors per step from int id maps
and the RGB batch:

  * ``cond``     (B, H, W, nc+1)              one-hot label ⊕ instance-edge
  * ``g_packed`` (B, (H+6)/2, (W+6)/2, 4*(nc+4))
                 reflect-3-padded, space-to-depth-by-2 packed
                 (one-hot ⊕ edge ⊕ box-masked RGB) generator stem input

No gradient flows through any of it (label / inst / image / boxes are
data), so it is a pure-bandwidth producer: ~640 MB of writes per step at
512x256 bs32 bf16 against a 655 GB/s stream bound (~1.9 ms), yet XLA's
select_n/broadcast/eq fusion chain measures ~11 ms (TRACE_r03_baseline.txt
— the narrow 36/39-channel lane dim and the materialized pad/compare
intermediates keep it at ~425 GB/s).

Split of labor (set by what the real Mosaic backend supports — strided
slices, lane-axis reshapes, and dynamic-offset row loads all either fail
lowering with gather-shape errors or crash the tpu_compile_helper on this
axon v5e backend, measured 2026-08-18):

  * XLA prep (cheap, NARROW planes — ~5 channels, <0.3 ms of stream
    traffic): instance edges, mask_box, reflect pad, s2d2 phase split.
  * Pallas expansion (the WIDE writes): one-hot + edge/RGB channel
    assembly per output tile, full-block loads/stores only — no dynamic
    slicing, no strided slicing, nothing the lowering rejects.

Semantics match ops.onehot_edges.{encode_input, encode_input_rgb,
encode_input_rgb_packed} ∘ boxcomposite.mask_box bit-for-bit
(golden-tested in tests/test_pallas_kernels.py); the jnp path remains the
--no_pallas fallback and serves every non-flagship configuration (odd
sizes, no_instance, encoder features, Precision.HIGHEST parity tier).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# set True (tests) to run in interpreter mode on non-TPU backends
INTERPRET = False

_HT = 32  # full-res expansion row tile
_PT = 8   # g_packed packed-row tile

# Scoped-VMEM eligibility: the row tile's working set scales with
# W x (nc+4) x itemsize. The proven-good shape is the flagship 512x256
# bs32 bf16 (W=512, nc=35 -> ran for 2 rounds); measured failures
# (2026-08-19): 1024x512 bf16 dies in compile with "Ran out of memory in
# memory space vmem ... 32.00M and limit 16.00M", and the 512-wide
# two-step pipeline at FP32 dies 8 KB over the same limit (f32 doubles
# the row bytes) — the compiler's stack accounting is superlinear in W,
# so gate at the proven row BYTE footprint and fall back to XLA's fused
# build above it.
_MAX_ROW_BYTES = 512 * 39 * 2  # the proven bf16 flagship row


def rows_fit(w: int, nc: int, dtype=jnp.bfloat16) -> bool:
    """True if the expansion row tile fits scoped VMEM (see note above).
    Gates the PACKED build (encode_packed; f32 at W=256 is proven on-chip
    there — BENCH_secondary_r04's g_forward leg ran it)."""
    return w * (nc + 4) * jnp.dtype(dtype).itemsize <= _MAX_ROW_BYTES


def full_rows_fit(w: int, nc: int, dtype=jnp.bfloat16) -> bool:
    """Stricter gate for the FULL-res expansion (encode_full): f32 is
    rejected outright — measured 2026-08-19, f32 W=256 nc=35 sits exactly
    AT the byte limit yet dies in compile ("allocating on stack for
    f32[16,128,256,39] ... 29.17M and limit 16.00M"): Mosaic's stack
    accounting for the full-res kernel is worse than the packed one's,
    and bf16 is the only itemsize ever proven good here."""
    dt = jnp.dtype(dtype)
    return dt.itemsize <= 2 and w * (nc + 4) * dt.itemsize <= _MAX_ROW_BYTES


def _edge_plane(inst, dtype):
    """(B,H,W) int -> (B,H,W) edge plane (pix2pixHD get_edges)."""
    from .. import onehot_edges

    return onehot_edges.instance_edges(inst, dtype)[..., 0]


def _expand_kernel(ids_ref, edge_ref, out_ref, *, nc, dtype):
    ids = ids_ref[0]                         # (HT, W) int32
    e = edge_ref[0]                          # (HT, W) float32 (Mosaic only
    #                                          minor-dim-inserts 32-bit types)
    ht, w = ids.shape
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (ht, w, nc + 1), 2)
    oh = (ids[..., None] == c_idx).astype(dtype)
    out_ref[0] = jnp.where(c_idx == nc, e[..., None].astype(dtype), oh)


def encode_cond(label, inst, nc, dtype=jnp.bfloat16):
    """(B,H,W) int label + inst -> (B,H,W,nc+1) one-hot ⊕ edge. Matches
    onehot_edges.encode_input(label, inst, nc, dtype)."""
    b, h, w = label.shape
    ht = min(_HT, h)
    kern = functools.partial(_expand_kernel, nc=nc, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(b, pl.cdiv(h, ht)),
        in_specs=[
            pl.BlockSpec((1, ht, w), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, ht, w), lambda bb, i: (bb, i, 0)),
        ],
        out_specs=pl.BlockSpec((1, ht, w, nc + 1), lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nc + 1), dtype),
        interpret=INTERPRET,
    )(label.astype(jnp.int32), _edge_plane(inst, jnp.float32))


def _expand_rgb_kernel(ids_ref, edge_ref, rgb_ref, out_ref, *, nc, dtype):
    ids = ids_ref[0]                         # (HT, W) int32
    e = edge_ref[0]                          # (HT, W) float32
    rgb = rgb_ref[0]                         # (HT, W, 3)
    ht, w = ids.shape
    nco = nc + 4
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (ht, w, nco), 2)
    out = (ids[..., None] == c_idx).astype(dtype)
    out = jnp.where(c_idx == nc, e[..., None].astype(dtype), out)
    for c in range(3):
        out = jnp.where(c_idx == nc + 1 + c, rgb[..., c:c + 1].astype(dtype), out)
    out_ref[0] = out


def encode_full(label, inst, image, boxes, nc, dtype=jnp.bfloat16):
    """(B,H,W,nc+4) = one-hot ⊕ edge ⊕ mask_box(image) — matches
    onehot_edges.encode_input_rgb(label, inst, mask_box(image, boxes), nc).
    The non-stem-pack configs' hot build (LocalEnhancer 1024p trains
    through this path)."""
    from .. import boxcomposite

    b, h, w = label.shape
    ht = min(_HT, h)
    rgb = boxcomposite.mask_box(image, boxes)
    kern = functools.partial(_expand_rgb_kernel, nc=nc, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(b, pl.cdiv(h, ht)),
        in_specs=[
            pl.BlockSpec((1, ht, w), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, ht, w), lambda bb, i: (bb, i, 0)),
            pl.BlockSpec((1, ht, w, 3), lambda bb, i: (bb, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, ht, w, nc + 4), lambda bb, i: (bb, i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nc + 4), dtype),
        interpret=INTERPRET,
    )(label.astype(jnp.int32), _edge_plane(inst, jnp.float32), rgb)


def _expand_packed_kernel(ids4_ref, edge4_ref, rgb12_ref, out_ref, *, nc, dtype):
    ids4 = ids4_ref[0]                       # (PT, w2, 4) int32
    edge4 = edge4_ref[0]                     # (PT, w2, 4) dtype
    rgb12 = rgb12_ref[0]                     # (PT, w2, 12) phase-major
    pt, w2 = ids4.shape[:2]
    nco = nc + 4
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (pt, w2, nco), 2)
    # per-phase static lane-slice stores (no concat: keeps the live VMEM
    # set at one (PT, w2, nco) group — the concat form tripped the 16M
    # scoped-vmem limit at the flagship shape)
    for p in range(4):
        g = (ids4[..., p:p + 1] == c_idx).astype(dtype)
        g = jnp.where(c_idx == nc, edge4[..., p:p + 1], g)
        for c in range(3):
            g = jnp.where(
                c_idx == nc + 1 + c,
                rgb12[..., 3 * p + c:3 * p + c + 1].astype(dtype),
                g,
            )
        out_ref[0, :, :, p * nco:(p + 1) * nco] = g


def _reflect3(x):
    """Reflect-pad H and W by 3 (mode='reflect') on (B,H,W[,C])."""
    pad = [(0, 0), (3, 3), (3, 3)] + [(0, 0)] * (x.ndim - 3)
    return jnp.pad(x, pad, mode="reflect")


def encode_packed(label, inst, image, boxes, nc, dtype=jnp.bfloat16):
    """Fused (reflect-3 pad ∘ s2d2 ∘ one-hot ⊕ edge ⊕ mask_box(image))
    generator stem input: (B, (H+6)/2, (W+6)/2, 4*(nc+4)). Matches
    onehot_edges.encode_input_rgb_packed on reflect-padded components with
    rgb = boxcomposite.mask_box(image, boxes)."""
    from .. import boxcomposite, nnops

    b, h, w = label.shape
    assert h % 2 == 0 and w % 2 == 0, (
        f"encode_packed needs even H/W for the s2d2 phase split, got {h}x{w}"
    )
    h2, w2 = (h + 6) // 2, (w + 6) // 2
    nco = nc + 4

    # XLA prep on NARROW planes: all strided work stays where the
    # compiler supports it; total traffic ~90 MB/step at 512x256 bs32
    ids4 = nnops.s2d2(_reflect3(label.astype(jnp.int32))[..., None])
    edge4 = nnops.s2d2(_reflect3(_edge_plane(inst, dtype))[..., None])
    rgb12 = nnops.s2d2(_reflect3(boxcomposite.mask_box(image, boxes)))

    kern = functools.partial(_expand_packed_kernel, nc=nc, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(b, pl.cdiv(h2, _PT)),
        in_specs=[
            pl.BlockSpec((1, _PT, w2, 4), lambda bb, i: (bb, i, 0, 0)),
            pl.BlockSpec((1, _PT, w2, 4), lambda bb, i: (bb, i, 0, 0)),
            pl.BlockSpec((1, _PT, w2, 12), lambda bb, i: (bb, i, 0, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, _PT, w2, 4 * nco), lambda bb, i: (bb, i, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, 4 * nco), dtype),
        interpret=INTERPRET,
    )(ids4, edge4, rgb12)


def encode_stem_pack(label, inst, image, boxes, nc, dtype=jnp.bfloat16):
    """Both flagship conditioning tensors: (g_packed, cond)."""
    g = encode_packed(label, inst, image, boxes, nc, dtype)
    cond = encode_cond(label, inst, nc, dtype)
    return g, cond


def encode_cond_pooled(label, inst, nc, dtype=jnp.bfloat16):
    """(B, H/2, W/2, nc+1) = nnops.avg_pool_3x3s2(encode_cond(label, inst))
    — the multiscale-D scale-1 conditioning. The pool itself stays on XLA
    (its strided window sums have no Mosaic lowering on this backend); the
    expansion underneath is the Pallas kernel, so mode 3 now differs from
    mode 1 only in where the pool reads its input."""
    from .. import nnops

    b, h, w = label.shape
    assert h % (2 * 16) == 0 and h >= 64 and w % 2 == 0
    return nnops.avg_pool_3x3s2(encode_cond(label, inst, nc, dtype))
