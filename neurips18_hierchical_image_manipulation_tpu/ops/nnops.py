"""Low-level NN primitives with torch-exact semantics, NHWC layout.

These reproduce — bit-comparably at fp32 (tight ulp band, see tests) — the
PyTorch ops the reference stacks into its networks (SURVEY.md §3.2):

  * ``conv2d``            <-> ``torch.nn.Conv2d`` (symmetric int padding)
  * ``conv_transpose2d``  <-> ``torch.nn.ConvTranspose2d(k, s, p, output_padding)``
  * ``instance_norm``     <-> ``torch.nn.InstanceNorm2d(affine=False, eps=1e-5)``
                              (biased variance, no running stats)
  * ``reflect_pad``       <-> ``torch.nn.ReflectionPad2d``
  * ``avg_pool_3x3s2``    <-> ``torch.nn.AvgPool2d(3, 2, padding=1,
                              count_include_pad=False)`` — the downsampler
                              between multiscale-D scales
  * ``leaky_relu``        <-> slope 0.2 (PatchGAN)

Layout convention: activations NHWC, conv kernels HWIO. Transposed-conv
kernels are ALSO stored HWIO with I = the op's input channels (i.e. already
"flipped" relative to torch's (in, out, kH, kW)); the spatial flip happens
inside ``conv_transpose2d``.

Everything here is pure jnp/lax — jit-fusable, static shapes, MXU-friendly.
The Pallas fast path for the fused conv+IN+ReLU residual block lives in
``ops/pallas``; this module is the always-available reference tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

_DIMNUMS = ("NHWC", "HWIO", "NHWC")

# fp32 parity mode: on TPU, XLA lowers fp32 convs onto the MXU with bf16
# passes by default, which breaks the BASELINE.json:5 "bit-comparable at
# fp32" bar. HIGHEST forces full fp32 accumulation. The perf training path
# runs in bf16 anyway (set via configs), so this only taxes the parity path.
_PRECISION = lax.Precision.HIGHEST


def set_default_precision(p):
    """Override conv precision globally ('default'/'highest' or a
    lax.Precision). Used by the bf16 perf configs."""
    global _PRECISION
    if isinstance(p, str):
        p = {"default": lax.Precision.DEFAULT, "highest": lax.Precision.HIGHEST}[p]
    _PRECISION = p


def _lane_pad_targets(ci: int, co: int):
    """Channel-padding policy for the bf16 perf path (v5e profiling,
    2026-08-16): XLA picks pathological batch-minor layouts for low/odd
    channel counts (the 39-ch conditioning stem and 3-ch RGB head cost
    ~40ms/step in pure transposes+copies at 512x256 bs32). Padding input/
    output channels with zeros is numerically EXACT (0-channels contribute
    exactly 0) and restores lane-aligned layouts. Measured END-TO-END it
    LOSES (74.1 vs 81.3 img/s full GAN step: the padded full-res tensors
    raise HBM pressure and worsen XLA's auto-remat), so _LANE_PAD defaults
    off. Returns (ci_t, co_t)."""
    def up(c):
        if c >= 64:
            return c  # 64+ already lane-friendly in T(8,128) tiles
        if c > 32:
            return 64
        return -(-c // 8) * 8  # next multiple of 8 (sublane)

    return up(ci), up(co)


def conv2d(x, w, b=None, *, stride=1, padding=0, precision=None):
    """torch.nn.Conv2d equivalent. x: (N,H,W,Cin), w: (kh,kw,Cin,Cout).

    On the perf path (Precision.DEFAULT) low-channel operands are
    zero-padded to lane-aligned widths and the output sliced back — see
    ``_lane_pad_targets``. Exact math; disable with HIMAN_LANE_PAD=0."""
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [tuple(p) if isinstance(p, (tuple, list)) else (p, p) for p in padding]
    prec = precision or _PRECISION
    co = w.shape[-1]
    if prec == lax.Precision.DEFAULT and _LANE_PAD:
        ci = x.shape[-1]
        ci_t, co_t = _lane_pad_targets(ci, co)
        if ci_t != ci:
            x = jnp.pad(x, [(0, 0), (0, 0), (0, 0), (0, ci_t - ci)])
            w = jnp.pad(w, [(0, 0), (0, 0), (0, ci_t - ci), (0, 0)])
        if co_t != co:
            w = jnp.pad(w, [(0, 0), (0, 0), (0, 0), (0, co_t - co)])
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=pad,
        dimension_numbers=_DIMNUMS,
        precision=prec,
    )
    if y.shape[-1] != co:
        y = y[..., :co]
    if b is not None:
        y = y + b
    return y


# conv-transpose implementation selector for ConvT(k3,s2,p1,op1):
#   "adjoint"  = lhs_dilated conv (torch-exact accumulation order; parity tier)
#   "subpixel" = 4 phase convs + interleave
#   "d2s"      = one 2x2 conv to 4*Co channels + depth-to-space
#   "auto"     = currently ADJOINT everywhere. Isolated fwd+bwd timings
#                (v5e bs32 bf16, tools/bench_convt.py 2026-08-16) say the
#                alternates should win at low-channel/large-spatial shapes:
#                  16x32x1024->512: adjoint 3.75ms  subpixel 3.77  d2s 6.38
#                  32x64x512->256 : adjoint 5.25    subpixel 4.96  d2s 6.22
#                  64x128x256->128: adjoint 8.36    subpixel 8.34  d2s 5.58
#                  128x256x128->64: adjoint 22.38   subpixel 22.39 d2s 6.16
#                ...but END-TO-END the full GAN train step measured SLOWER
#                with them (subpixel-everywhere 73.9 img/s, shape-adaptive
#                subpixel/d2s 74.1 vs adjoint 81.3): the phase stacks add
#                materialized intermediates that break XLA's fusion/remat
#                schedule in the memory-pressured full program. Honestly
#                gated off until a variant wins end-to-end; force with
#                HIMAN_CONVT_IMPL=subpixel|d2s.
import os as _os

_CONVT_IMPL = _os.environ.get("HIMAN_CONVT_IMPL", "auto")
# end-to-end LOSS measured (74.1 vs 81.3 img/s, see _lane_pad_targets
# docstring) — opt-in via HIMAN_LANE_PAD=1
_LANE_PAD = _os.environ.get("HIMAN_LANE_PAD", "0") == "1"


def set_conv_transpose_impl(impl: str):
    global _CONVT_IMPL
    assert impl in ("adjoint", "subpixel", "auto"), impl
    _CONVT_IMPL = impl


def conv_transpose2d_subpixel(x, w, b=None, *, precision=None):
    """ConvTranspose2d(k=3, s=2, p=1, op=1) via subpixel phase decomposition.

    The adjoint form dilates the input with zeros (3 of every 4 positions),
    so a dense 3x3 conv over it wastes ~4x the MXU work. Output pixels
    partition into 4 phases by parity, each an ordinary small conv:

      out[2i,   2j  ] = x[i,j]*w[1,1]
      out[2i,   2j+1] = x[i,j]*w[1,2] + x[i,j+1]*w[1,0]
      out[2i+1, 2j  ] = x[i,j]*w[2,1] + x[i+1,j]*w[0,1]
      out[2i+1, 2j+1] = x[i,j]*w[2,2] + x[i,j+1]*w[2,0]
                      + x[i+1,j]*w[0,2] + x[i+1,j+1]*w[0,0]

    (w indexed HWIO, out-of-range x terms are zero). Identical arithmetic
    to the adjoint modulo float summation order.
    """
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    prec = precision or _PRECISION

    def pconv(kern, pad_h, pad_w):
        return lax.conv_general_dilated(
            x, kern, window_strides=(1, 1),
            padding=[(0, pad_h), (0, pad_w)],
            dimension_numbers=_DIMNUMS, precision=prec,
        )

    p00 = pconv(w[1:2, 1:2], 0, 0)
    p01 = pconv(jnp.stack([w[1, 2], w[1, 0]])[None], 0, 1)  # (1,2,Ci,Co)
    p10 = pconv(jnp.stack([w[2, 1], w[0, 1]])[:, None], 1, 0)  # (2,1,Ci,Co)
    k11 = jnp.stack(
        [jnp.stack([w[2, 2], w[2, 0]]), jnp.stack([w[0, 2], w[0, 0]])]
    )  # (2,2,Ci,Co)
    p11 = pconv(k11, 1, 1)

    top = jnp.stack([p00, p01], axis=3)  # (N,H,W,2,C)
    bot = jnp.stack([p10, p11], axis=3)
    y = jnp.stack([top, bot], axis=2).reshape(n, 2 * h, 2 * wd, co)
    if b is not None:
        y = y + b
    return y


def conv_transpose2d_d2s(x, w, b=None, *, precision=None):
    """ConvTranspose2d(k=3, s=2, p=1, op=1) as ONE 2x2 conv producing
    4*Co channels followed by depth-to-space — the same phase math as
    ``conv_transpose2d_subpixel`` but as a single MXU matmul (unused taps
    zero-padded: 4 taps/output vs the naive dilated form's 9)."""
    n, h, wd, ci = x.shape
    co = w.shape[-1]
    z = jnp.zeros_like(w[0, 0])
    # phase kernels laid out (2,2,Ci,4,Co): tap (dy,dx) contributes to
    # phase p in out[2i+p_r, 2j+p_c] per the subpixel decomposition
    k = jnp.stack(
        [
            # tap (0,0): all four phases read x[i,j]
            jnp.stack([w[1, 1], w[1, 2], w[2, 1], w[2, 2]], axis=-2),
            # tap (0,1): phases (0,1) and (1,1) read x[i,j+1]
            jnp.stack([z, w[1, 0], z, w[2, 0]], axis=-2),
        ]
    )  # (2, Ci, 4, Co) after inner stacks -> shape (2,2,Ci,4,Co)? build row2:
    k2 = jnp.stack(
        [
            # tap (1,0): phases (1,0) and (1,1) read x[i+1,j]
            jnp.stack([z, z, w[0, 1], w[0, 2]], axis=-2),
            # tap (1,1): phase (1,1) reads x[i+1,j+1]
            jnp.stack([z, z, z, w[0, 0]], axis=-2),
        ]
    )
    kern = jnp.stack([k, k2]).reshape(2, 2, ci, 4 * co)
    y4 = lax.conv_general_dilated(
        x, kern, window_strides=(1, 1), padding=[(0, 1), (0, 1)],
        dimension_numbers=_DIMNUMS, precision=precision or _PRECISION,
    )  # (N,H,W,4Co), channel layout [phase(2x2), Co]
    y = y4.reshape(n, h, wd, 2, 2, co)
    y = y.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, co)
    if b is not None:
        y = y + b
    return y


def conv_transpose2d(
    x, w, b=None, *, stride=2, padding=1, output_padding=1, precision=None
):
    """torch.nn.ConvTranspose2d equivalent (fractionally-strided conv).

    x: (N,H,W,Cin); w: (kh,kw,Cin,Cout) — NOTE torch stores (Cin,Cout,kh,kw);
    converters must permute (2,3,0,1). Output spatial size is
    ``(i-1)*s - 2p + k + output_padding`` per axis (exactly 2x for the
    reference's k=3, s=2, p=1, op=1 upsamplers).

    Implemented as conv_general_dilated with lhs_dilation=s over the
    spatially-flipped kernel with padding (k-1-p, k-1-p+op) — this is the
    exact adjoint-of-conv definition torch uses, so fp32 results match the
    CPU-torch oracle to float accumulation order.
    """
    kh, kw = w.shape[0], w.shape[1]
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    p = (padding, padding) if isinstance(padding, int) else tuple(padding)
    prec = precision or _PRECISION
    eligible = (
        (kh, kw) == (3, 3)
        and s == (2, 2)
        and p == (1, 1)
        and (output_padding == 1 or output_padding == (1, 1))
    )
    if eligible:
        impl = _CONVT_IMPL
        if impl == "auto":
            impl = "adjoint"  # end-to-end winner; see selector comment
        if impl == "subpixel":
            return conv_transpose2d_subpixel(x, w, b, precision=prec)
        if impl == "d2s":
            return conv_transpose2d_d2s(x, w, b, precision=prec)
    op = (
        (output_padding, output_padding)
        if isinstance(output_padding, int)
        else tuple(output_padding)
    )
    w_flipped = w[::-1, ::-1, :, :]
    pad = [
        (kh - 1 - p[0], kh - 1 - p[0] + op[0]),
        (kw - 1 - p[1], kw - 1 - p[1] + op[1]),
    ]
    y = lax.conv_general_dilated(
        x,
        w_flipped,
        window_strides=(1, 1),
        padding=pad,
        lhs_dilation=s,
        dimension_numbers=_DIMNUMS,
        precision=precision or _PRECISION,
    )
    if b is not None:
        y = y + b
    return y


def instance_norm(x, *, eps=1e-5):
    """torch.nn.InstanceNorm2d(affine=False): per-(N,C) spatial standardize.

    Biased variance (torch IN normalizes by HW, not HW-1), eps inside the
    sqrt, no learned affine (the reference uses ``--norm instance`` which is
    InstanceNorm2d(affine=False) — SURVEY.md §3.2 weights_init note).

    Statistics are always accumulated in fp32 — under the bf16 training
    policy the conv FLOPs stay bf16 on the MXU while the spatial mean/var
    reduction keeps full precision (bf16 mantissa is too short for
    HW-sized accumulations).
    """
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=(1, 2), keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=(1, 2), keepdims=True)
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def batch_norm_inference(x, mean, var, gamma, beta, *, eps=1e-5):
    """torch.nn.BatchNorm2d eval-mode (running stats), NHWC."""
    inv = lax.rsqrt(var + eps)
    return (x - mean) * inv * gamma + beta


def reflect_pad(x, pad):
    """torch.nn.ReflectionPad2d(pad) on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def leaky_relu(x, negative_slope=0.2):
    return jnp.where(x >= 0, x, x * negative_slope)


def relu(x):
    return jnp.maximum(x, 0)


def avg_pool_3x3s2(x):
    """torch.nn.AvgPool2d(kernel=3, stride=2, padding=1,
    count_include_pad=False) — the multiscale-D inter-scale downsampler
    (SURVEY.md §3.2 MultiscaleDiscriminator)."""
    window = (1, 3, 3, 1)
    strides = (1, 2, 2, 1)
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    summed = lax.reduce_window(x, 0.0, lax.add, window, strides, pad)
    ones = jnp.ones(x.shape[1:3], dtype=x.dtype)[None, :, :, None]
    counts = lax.reduce_window(ones, 0.0, lax.add, window, strides, pad)
    return summed / counts


def max_pool_2x2(x):
    """torch.nn.MaxPool2d(2, 2) — used by VGG19 features."""
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def upsample_nearest_2x(x):
    """torch.nn.Upsample(scale_factor=2, mode='nearest'), NHWC."""
    n, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (n, h, 2, w, 2, c))
    return x.reshape(n, h * 2, w * 2, c)


@functools.partial(jax.jit, static_argnames=("num_segments",))
def segment_mean_2d(feat, seg_ids, num_segments):
    """Instance-wise average pooling (pix2pixHD Encoder, SURVEY.md §3.2).

    feat: (N,H,W,C); seg_ids: (N,H,W) int32 in [0, num_segments). Returns
    (N,H,W,C) where every pixel holds the mean of its segment — the
    jit-able, static-shape equivalent of torch's loop over
    ``inst.unique()``. Callers map raw Cityscapes instance ids into the
    static segment range (see models/networks.py Encoder).
    """
    n, h, w, c = feat.shape
    flat_feat = feat.reshape(n, h * w, c)
    flat_ids = seg_ids.reshape(n, h * w)

    def per_image(f, ids):
        sums = jax.ops.segment_sum(f, ids, num_segments=num_segments)
        counts = jax.ops.segment_sum(
            jnp.ones((f.shape[0],), f.dtype), ids, num_segments=num_segments
        )
        means = sums / jnp.maximum(counts, 1.0)[:, None]
        return means[ids]

    out = jax.vmap(per_image)(flat_feat, flat_ids)
    return out.reshape(n, h, w, c)
