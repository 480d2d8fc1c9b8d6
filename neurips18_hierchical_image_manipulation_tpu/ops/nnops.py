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


def conv2d(x, w, b=None, *, stride=1, padding=0, precision=None):
    """torch.nn.Conv2d equivalent. x: (N,H,W,Cin), w: (kh,kw,Cin,Cout)."""
    s = (stride, stride) if isinstance(stride, int) else tuple(stride)
    if isinstance(padding, int):
        pad = [(padding, padding), (padding, padding)]
    else:
        pad = [tuple(p) if isinstance(p, (tuple, list)) else (p, p) for p in padding]
    y = lax.conv_general_dilated(
        x,
        w,
        window_strides=s,
        padding=pad,
        dimension_numbers=_DIMNUMS,
        precision=precision or _PRECISION,
    )
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
