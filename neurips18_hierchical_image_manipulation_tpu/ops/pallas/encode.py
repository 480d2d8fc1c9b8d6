"""Pallas TPU kernel: the fused encode_input build.

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
— the narrow 36/39-channel lane dim and the four materialized pad/compare
intermediates keep it at ~425 GB/s). These kernels compute every channel
of an output tile in one VMEM pass from row-gathered source planes:

  kernel A (cond): grid (B, H/HT); the inst plane rides along full-height
    so the ±1-row edge neighborhood needs no halo blocks.
  kernel B (g_packed): grid (B, ceil(Hp2/PT)); label/inst/image planes ride
    full-height; each padded row k maps to source row reflect(k-3), read as
    one dynamic sublane slice; W-axis reflect pad + phase split are static
    lane slices. Channel layout matches nnops.s2d2 exactly:
    out[..., p*(nc+4) + c] with p = 2*row_phase + col_phase.

Semantics match ops.onehot_edges.{encode_input, encode_input_rgb_packed}
∘ boxcomposite.mask_box bit-for-bit (golden-tested in
tests/test_pallas_kernels.py); the jnp path remains the --no_pallas
fallback and serves every non-flagship configuration (odd sizes,
no_instance, encoder features, Precision.HIGHEST parity tier).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# set True (tests) to run in interpreter mode on non-TPU backends
INTERPRET = False

_HT = 32  # cond row tile
_PT = 8   # g_packed packed-row tile


def _edge_rows(i_c, i_u, i_d, up_valid, dn_valid):
    """pix2pixHD get_edges on a row block: 4-neighbour any-diff, zero at
    image borders. i_* are (R, W) int32; *_valid are broadcastable bools
    masking rows whose up/down neighbour falls outside the image."""
    dif_w = i_c[:, 1:] != i_c[:, :-1]
    zcol = jnp.zeros((i_c.shape[0], 1), jnp.bool_)
    e = jnp.concatenate([zcol, dif_w], 1) | jnp.concatenate([dif_w, zcol], 1)
    e = e | ((i_c != i_u) & up_valid) | ((i_c != i_d) & dn_valid)
    return e


def _cond_kernel(label_ref, inst_ref, out_ref, *, nc, ht, h_img, dtype):
    i = pl.program_id(1)
    r0 = i * ht
    ids = label_ref[0]                       # (HT, W) int32
    inst_c = inst_ref[0, pl.ds(r0, ht), :]   # (HT, W)

    # ±1-row neighbours from the resident full plane; first/last block
    # substitute the in-block shift (whose boundary row self-compares to 0)
    up = inst_ref[0, pl.ds(jnp.maximum(r0 - 1, 0), ht), :]
    dn = inst_ref[0, pl.ds(jnp.minimum(r0 + 1, h_img - ht), ht), :]
    up_in = jnp.concatenate([inst_c[:1], inst_c[:-1]], 0)
    dn_in = jnp.concatenate([inst_c[1:], inst_c[-1:]], 0)
    first = r0 == 0
    last = r0 + ht == h_img
    i_u = jnp.where(first, up_in, up)
    i_d = jnp.where(last, dn_in, dn)
    e = _edge_rows(inst_c, i_u, i_d, True, True)

    c_idx = jax.lax.broadcasted_iota(jnp.int32, (ht, ids.shape[1], nc + 1), 2)
    oh = ids[..., None] == c_idx
    out = jnp.where(c_idx == nc, e[..., None], oh)
    out_ref[0] = out.astype(dtype)


def encode_cond(label, inst, nc, dtype=jnp.bfloat16):
    """(B,H,W) int label + inst -> (B,H,W,nc+1) one-hot ⊕ edge. Matches
    onehot_edges.encode_input(label, inst, nc, dtype)."""
    b, h, w = label.shape
    ht = _HT if h % _HT == 0 else h
    kern = functools.partial(
        _cond_kernel, nc=nc, ht=ht, h_img=h, dtype=dtype
    )
    return pl.pallas_call(
        kern,
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((1, ht, w), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w, nc + 1), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nc + 1), dtype),
        interpret=INTERPRET,
    )(label.astype(jnp.int32), inst.astype(jnp.int32))


def _reflect3_w(x):
    """Reflect-pad the LANE (W) axis by 3 on both sides, mode='reflect':
    cols [3,2,1] + x + cols [W-2,W-3,W-4]."""
    head = jnp.concatenate([x[:, 3:4], x[:, 2:3], x[:, 1:2]], 1)
    w = x.shape[1]
    tail = jnp.concatenate([x[:, w - 2:w - 1], x[:, w - 3:w - 2],
                            x[:, w - 4:w - 3]], 1)
    return jnp.concatenate([head, x, tail], 1)


def _packed_kernel(boxes_ref, label_ref, inst_ref, image_ref, out_ref, *,
                   nc, pt, h_img, w_img, dtype):
    i = pl.program_id(1)
    i0 = i * pt
    nce = nc + 1
    nco = nce + 3
    hm1 = h_img - 1

    y0 = boxes_ref[0, 0]
    x0 = boxes_ref[0, 1]
    bh = boxes_ref[0, 2]
    bw = boxes_ref[0, 3]

    lab_rows, edge_rows, rgb_rows, inbox_rows = [], [], [], []
    for t in range(pt):
        for r in (0, 1):
            k = 2 * (i0 + t) + r          # padded row index
            src = k - 3
            h = jnp.where(src < 0, -src,
                          jnp.where(src > hm1, 2 * hm1 - src, src))
            lab_rows.append(label_ref[0, pl.ds(h, 1), :])
            i_c = inst_ref[0, pl.ds(h, 1), :]
            i_u = inst_ref[0, pl.ds(jnp.maximum(h - 1, 0), 1), :]
            i_d = inst_ref[0, pl.ds(jnp.minimum(h + 1, hm1), 1), :]
            edge_rows.append(
                _edge_rows(i_c, i_u, i_d, h > 0, h < hm1)
            )
            rgb_rows.append(image_ref[0, pl.ds(h, 1), :, :])
            hf = h.astype(jnp.float32)
            inbox_rows.append(
                jnp.where((hf >= y0) & (hf < y0 + bh), 1.0, 0.0).reshape(1, 1)
            )

    lab16 = jnp.concatenate(lab_rows, 0)    # (2*PT, W) int32
    edge16 = jnp.concatenate(edge_rows, 0)  # (2*PT, W) bool
    rgb16 = jnp.concatenate(rgb_rows, 0)    # (2*PT, W, 3)

    # box-masked RGB (boxcomposite.mask_box, fill=0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (1, w_img), 1).astype(jnp.float32)
    in_w = (xs >= x0) & (xs < x0 + bw)      # (1, W)
    in_h = jnp.concatenate(inbox_rows, 0)   # (2PT, 1)
    inside = in_h * jnp.where(in_w, 1.0, 0.0)  # (2PT, W)
    rgb16 = rgb16 * (1.0 - inside[..., None]).astype(rgb16.dtype)

    # W-axis reflect pad to W+6, then phase split
    lab_p = _reflect3_w(lab16)
    edge_p = _reflect3_w(edge16)
    rgb_p = jnp.concatenate(
        [_reflect3_w(rgb16[..., c])[..., None] for c in range(3)], -1
    )

    groups = []
    w2 = (w_img + 6) // 2
    for r in (0, 1):
        lab_r = lab_p[r::2]
        edge_r = edge_p[r::2]
        rgb_r = rgb_p[r::2]
        for s in (0, 1):
            ids_s = lab_r[:, s::2]          # (PT, W2)
            edge_s = edge_r[:, s::2]
            rgb_s = rgb_r[:, s::2]
            c_idx = jax.lax.broadcasted_iota(jnp.int32, (pt, w2, nco), 2)
            oh = ids_s[..., None] == c_idx
            g = jnp.where(c_idx == nc, edge_s[..., None], oh).astype(dtype)
            for c in range(3):
                g = jnp.where(c_idx == nce + c,
                              rgb_s[..., c:c + 1].astype(dtype), g)
            groups.append(g)
    out_ref[0] = jnp.concatenate(groups, -1)


def encode_packed(label, inst, image, boxes, nc, dtype=jnp.bfloat16):
    """Fused (reflect-3 pad ∘ s2d2 ∘ one-hot ⊕ edge ⊕ mask_box(image))
    generator stem input: (B, (H+6)/2, (W+6)/2, 4*(nc+4)). Matches
    onehot_edges.encode_input_rgb_packed on reflect-padded components with
    rgb = boxcomposite.mask_box(image, boxes)."""
    b, h, w = label.shape
    assert h % 2 == 0 and w % 2 == 0, (
        f"encode_packed needs even H/W for the s2d2 phase split, got {h}x{w}"
    )
    h2, w2 = (h + 6) // 2, (w + 6) // 2
    nco = nc + 4
    kern = functools.partial(
        _packed_kernel, nc=nc, pt=_PT, h_img=h, w_img=w, dtype=dtype
    )
    grid_h = pl.cdiv(h2, _PT)
    return pl.pallas_call(
        kern,
        grid=(b, grid_h),
        in_specs=[
            pl.BlockSpec((1, 4), lambda bb, i: (bb, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, h, w), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w, 3), lambda bb, i: (bb, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _PT, w2, 4 * nco),
                               lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, w2, 4 * nco), dtype),
        interpret=INTERPRET,
    )(boxes.astype(jnp.float32), label.astype(jnp.int32),
      inst.astype(jnp.int32), image)


def encode_stem_pack(label, inst, image, boxes, nc, dtype=jnp.bfloat16):
    """Both flagship conditioning tensors: (g_packed, cond)."""
    g = encode_packed(label, inst, image, boxes, nc, dtype)
    cond = encode_cond(label, inst, nc, dtype)
    return g, cond


def _full_kernel(boxes_ref, label_ref, inst_ref, image_ref, out_ref, *,
                 nc, ht, h_img, dtype):
    """Unpacked fused build: one-hot ⊕ edge ⊕ box-masked RGB at full res
    (the encode_input_rgb layout) — the non-stem-pack configs' hot build
    (LocalEnhancer 1024p trains through this path)."""
    i = pl.program_id(1)
    r0 = i * ht
    w_img = label_ref.shape[2]
    ids = label_ref[0]                       # (HT, W)
    inst_c = inst_ref[0, pl.ds(r0, ht), :]

    up = inst_ref[0, pl.ds(jnp.maximum(r0 - 1, 0), ht), :]
    dn = inst_ref[0, pl.ds(jnp.minimum(r0 + 1, h_img - ht), ht), :]
    up_in = jnp.concatenate([inst_c[:1], inst_c[:-1]], 0)
    dn_in = jnp.concatenate([inst_c[1:], inst_c[-1:]], 0)
    i_u = jnp.where(r0 == 0, up_in, up)
    i_d = jnp.where(r0 + ht == h_img, dn_in, dn)
    e = _edge_rows(inst_c, i_u, i_d, True, True)

    # box-masked RGB rows (boxcomposite.mask_box, fill=0)
    y0, x0 = boxes_ref[0, 0], boxes_ref[0, 1]
    bh, bw = boxes_ref[0, 2], boxes_ref[0, 3]
    rows = jax.lax.broadcasted_iota(jnp.int32, (ht, 1), 0).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w_img), 1).astype(jnp.float32)
    rows = rows + jnp.asarray(r0, jnp.float32)
    inside = (
        jnp.where((rows >= y0) & (rows < y0 + bh), 1.0, 0.0)
        * jnp.where((cols >= x0) & (cols < x0 + bw), 1.0, 0.0)
    )
    rgb = image_ref[0]
    rgb = rgb * (1.0 - inside[..., None]).astype(rgb.dtype)

    nco = nc + 4
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (ht, w_img, nco), 2)
    out = ids[..., None] == c_idx
    out = jnp.where(c_idx == nc, e[..., None], out).astype(dtype)
    for c in range(3):
        out = jnp.where(c_idx == nc + 1 + c, rgb[..., c:c + 1].astype(dtype), out)
    out_ref[0] = out


def encode_full(label, inst, image, boxes, nc, dtype=jnp.bfloat16):
    """(B,H,W,nc+4) = one-hot ⊕ edge ⊕ mask_box(image) — matches
    onehot_edges.encode_input_rgb(label, inst, mask_box(image, boxes), nc)."""
    b, h, w = label.shape
    ht = _HT if h % _HT == 0 else h
    kern = functools.partial(_full_kernel, nc=nc, ht=ht, h_img=h, dtype=dtype)
    return pl.pallas_call(
        kern,
        grid=(b, h // ht),
        in_specs=[
            pl.BlockSpec((1, 4), lambda bb, i: (bb, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, ht, w), lambda bb, i: (bb, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ht, w, 3), lambda bb, i: (bb, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ht, w, nc + 4), lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, nc + 4), dtype),
        interpret=INTERPRET,
    )(boxes.astype(jnp.float32), label.astype(jnp.int32),
      inst.astype(jnp.int32), image)


_PT2 = 16  # pooled-cond out-row tile


def _cond_pooled_kernel(label_ref, inst_ref, out_ref, *, nc, h_img, dtype):
    """avg_pool_3x3s2(cond) computed straight from the id planes: for each
    pooled row tile, build the 33 cond rows its windows touch (one-hot ⊕
    edge, same math as _cond_kernel) and window-sum them with strided
    slices. Sums stay in ``dtype``: cond values are 0/1, window sums <= 9
    are exact in bf16, and count division uses the same bf16 operands as
    the reduce_window lowering — bit-identical to
    nnops.avg_pool_3x3s2(encode_cond(...))."""
    i = pl.program_id(1)
    i0 = i * _PT2
    start = jnp.maximum(2 * i0 - 1, 0)
    first = i0 == 0
    last = start + 33 >= h_img
    hm1 = h_img - 1

    lab = label_ref[0, pl.ds(start, 33), :]     # (33, W) int32
    inst_c = inst_ref[0, pl.ds(start, 33), :]
    up = inst_ref[0, pl.ds(jnp.maximum(start - 1, 0), 33), :]
    dn = inst_ref[0, pl.ds(jnp.minimum(start + 1, h_img - 33), 33), :]
    up_in = jnp.concatenate([inst_c[:1], inst_c[:-1]], 0)
    dn_in = jnp.concatenate([inst_c[1:], inst_c[-1:]], 0)
    i_u = jnp.where(first, up_in, up)
    i_d = jnp.where(last, dn_in, dn)
    g_row = start + jax.lax.broadcasted_iota(jnp.int32, (33, 1), 0)
    e = _edge_rows(inst_c, i_u, i_d, g_row > 0, g_row < hm1)

    w_img = lab.shape[1]
    c_idx = jax.lax.broadcasted_iota(jnp.int32, (33, w_img, nc + 1), 2)
    cond = jnp.where(c_idx == nc, e[..., None], lab[..., None] == c_idx)
    cond = cond.astype(dtype)

    # first block: logical window rows are -1..31 -> shift down one, zero
    # row on top (the H pad)
    shifted = jnp.concatenate([jnp.zeros_like(cond[:1]), cond[:32]], 0)
    cond = jnp.where(first, shifted, cond)

    s_h = cond[0:31:2] + cond[1:32:2] + cond[2:33:2]       # (16, W, C)
    wp = jnp.concatenate([jnp.zeros_like(s_h[:, :1]), s_h], 1)  # (16, W+1, C)
    s = (
        wp[:, 0:w_img - 1:2]
        + wp[:, 1:w_img:2]
        + wp[:, 2:w_img + 1:2]
    )                                                       # (16, W/2, C)

    w2 = w_img // 2
    rows_g = i0 + jax.lax.broadcasted_iota(jnp.int32, (_PT2, 1), 0)
    rcnt = jnp.where(rows_g == 0, 2.0, 3.0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w2), 1)
    ccnt = jnp.where(cols == 0, 2.0, 3.0)
    cnt = (rcnt * ccnt).astype(dtype)[..., None]
    out_ref[0] = s / cnt


def encode_cond_pooled(label, inst, nc, dtype=jnp.bfloat16):
    """(B, H/2, W/2, nc+1) = nnops.avg_pool_3x3s2(encode_cond(label, inst))
    computed directly from the id planes — the multiscale-D scale-1
    conditioning without materializing-then-pooling the full-res cond.
    Requires H % 32 == 0 and even W."""
    b, h, w = label.shape
    # h >= 64: each program reads a 33-row slab, so the plane must hold
    # one slab beyond the first tile's shifted window
    assert h % (2 * _PT2) == 0 and h >= 64 and w % 2 == 0
    kern = functools.partial(_cond_pooled_kernel, nc=nc, h_img=h, dtype=dtype)
    h2 = h // 2
    return pl.pallas_call(
        kern,
        grid=(b, h2 // _PT2),
        in_specs=[
            pl.BlockSpec((1, h, w), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, h, w), lambda bb, i: (bb, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _PT2, w // 2, nc + 1),
                               lambda bb, i: (bb, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h2, w // 2, nc + 1), dtype),
        interpret=INTERPRET,
    )(label.astype(jnp.int32), inst.astype(jnp.int32))
