"""Spatial sharding escape hatch (SURVEY.md §6.7).

The reference has no sequence axis (fully-convolutional GAN) — its
long-"context" analogue is image resolution. For >2K-res workloads the
TPU-idiomatic context-parallel analogue is sharding the W axis of NHWC
activations across the data mesh, exchanging K//2-wide halos between
neighbouring shards with ``lax.ppermute`` before each conv.

``halo_exchange_conv2d`` is that primitive: inside a ``shard_map`` over a
1-D mesh, each device holds an (N, H, W/D, C) slab; the function gathers
left/right halo columns from mesh neighbours, runs the conv VALID over the
widened slab, and the result is exactly the W-sharded slice of the global
conv (golden-tested against the unsharded conv in
tests/test_spatial_sharding.py).

This is an out-of-scope-for-512x256 capability kept small and tested —
wire it into the generators if the target resolution ever exceeds one
chip's HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P


def halo_exchange_conv2d(x, w, b=None, *, padding: int, axis_name: str = "data"):
    """Stride-1 conv over W-sharded NHWC activations with ppermute halos.

    Must run inside shard_map over a 1-D mesh; ``padding`` is the torch
    symmetric padding of the equivalent unsharded conv (halo = padding;
    requires kernel = 2*padding+1, the reference's 3x3/7x7 cases).
    """
    kh, kw = w.shape[0], w.shape[1]
    assert kw == 2 * padding + 1, "halo conv expects symmetric odd kernels"
    # zero-filled global edges = the unsharded conv's zero padding
    widened = _exchange_lr(x, padding, padding, axis_name)
    # H axis is unsharded: normal symmetric padding there; W is VALID over
    # the widened slab (halos supply the cross-shard columns)
    y = lax.conv_general_dilated(
        widened,
        w,
        window_strides=(1, 1),
        padding=[(padding, padding), (0, 0)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=lax.Precision.HIGHEST,
    )
    if b is not None:
        y = y + b
    return y


def make_spatial_conv(mesh: Mesh, w, b=None, *, padding: int, axis: str = "data"):
    """Wrap halo_exchange_conv2d into a jitted shard_map callable taking
    the FULL (unsharded) array — the demonstration entry point."""

    def inner(x_shard, w, b):
        return halo_exchange_conv2d(x_shard, w, b, padding=padding, axis_name=axis)

    sharded = jax.shard_map(
        inner,
        mesh=mesh,
        in_specs=(P(None, None, axis, None), P(), P()),
        out_specs=P(None, None, axis, None),
    )
    return jax.jit(lambda x: sharded(x, w, b))


# ---------------------------------------------------------------------------
# Full spatially-sharded GlobalGenerator forward (SURVEY.md §6.7: "wire it
# into the generators if the target resolution ever exceeds one chip's
# HBM"). Every layer of the pix2pixHD GlobalGenerator runs with W-sharded
# activations: reflect pads take their cross-shard columns from ppermute
# halos (edge shards reflect their own interior), stride-2 downs carry a
# left-only halo, transposed-conv ups a right-only halo (the adjoint
# padding (1,0) reproduces torch's k3/s2/p1/op1 grid per shard exactly),
# and InstanceNorm statistics are psum-reduced over the mesh axis.
# Inference-path capability (golden-tested vs the unsharded generator in
# tests/test_spatial_sharding.py); precision pinned HIGHEST like
# halo_exchange_conv2d above — this is the parity tier, not the bf16 hot
# path.
# ---------------------------------------------------------------------------

_DN = ("NHWC", "HWIO", "NHWC")


def _exchange_lr(x, left: int, right: int, axis_name: str, reflect_edges=False):
    """Widen the W-sharded slab with ``left``/``right`` neighbour columns.
    Global edges are zero-filled (conv zero padding) or, with
    ``reflect_edges``, filled with the edge shard's own reflected interior
    columns (torch ReflectionPad2d semantics across the global image)."""
    n_dev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)
    parts = []
    if left:
        from_left = lax.ppermute(
            x[:, :, -left:, :], axis_name,
            [(i, (i + 1) % n_dev) for i in range(n_dev)],
        )
        edge = (
            x[:, :, 1:left + 1, :][:, :, ::-1, :]
            if reflect_edges
            else jnp.zeros_like(from_left)
        )
        parts.append(jnp.where(idx == 0, edge, from_left))
    parts.append(x)
    if right:
        from_right = lax.ppermute(
            x[:, :, :right, :], axis_name,
            [(i, (i - 1) % n_dev) for i in range(n_dev)],
        )
        edge = (
            x[:, :, -right - 1:-1, :][:, :, ::-1, :]
            if reflect_edges
            else jnp.zeros_like(from_right)
        )
        parts.append(jnp.where(idx == n_dev - 1, edge, from_right))
    return jnp.concatenate(parts, axis=2)


def _sconv(x, w, b=None, *, stride=(1, 1), pad_h=(0, 0), pad_w=(0, 0)):
    y = lax.conv_general_dilated(
        x, w, window_strides=stride, padding=[pad_h, pad_w],
        dimension_numbers=_DN, precision=lax.Precision.HIGHEST,
    )
    return y if b is None else y + b


def _sconv_reflect(x, w, axis_name, b=None):
    """k x k stride-1 conv under global ReflectionPad2d(k//2)."""
    p = w.shape[0] // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0), (0, 0)), mode="reflect")
    widened = _exchange_lr(xp, p, p, axis_name, reflect_edges=True)
    return _sconv(widened, w, b)


def _sconv_down(x, w, axis_name):
    """3x3 stride-2 pad-1 conv (requires even per-shard W): the first
    output column of shard d reads global input column d*Ws - 1, so only a
    left halo of 1 is needed; H pads locally with zeros."""
    widened = _exchange_lr(x, 1, 0, axis_name)
    return _sconv(widened, w, stride=(2, 2), pad_h=(1, 1))


def _sconv_up(x, w, axis_name):
    """ConvTranspose2d(k=3, s=2, p=1, op=1): the adjoint conv over the
    lhs-dilated input. Per shard the dilated-grid window [2*d*Ws, ...)
    starts on an interleaved-zero slot, so local padding (1, 0) with a
    right halo of 1 reproduces torch's global grid exactly (see
    nnops.conv_transpose2d for the unsharded derivation)."""
    x_ext = _exchange_lr(x, 0, 1, axis_name)
    w_flipped = w[::-1, ::-1, :, :]
    return lax.conv_general_dilated(
        x_ext, w_flipped, window_strides=(1, 1),
        padding=[(1, 2), (1, 0)], lhs_dilation=(2, 2),
        dimension_numbers=_DN, precision=lax.Precision.HIGHEST,
    )


def _s_instance_norm(x, axis_name, eps=1e-5):
    """InstanceNorm2d(affine=False) with the spatial mean/var psum-reduced
    across the W shards (fp32 statistics, biased variance — matches
    nnops.instance_norm)."""
    xf = x.astype(jnp.float32)
    cnt = lax.psum(
        jnp.asarray(x.shape[1] * x.shape[2], jnp.float32), axis_name
    )
    mean = lax.psum(jnp.sum(xf, axis=(1, 2), keepdims=True), axis_name) / cnt
    var = (
        lax.psum(jnp.sum(jnp.square(xf - mean), axis=(1, 2), keepdims=True),
                 axis_name)
        / cnt
    )
    return ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)


def _s_norm_relu(h, axis_name, eps):
    return jnp.maximum(_s_instance_norm(h, axis_name, eps), 0)


def _s_resblocks(p, h, names, axis_name, eps):
    for name in names:
        r = p[name]
        y = _sconv_reflect(h, r["conv1"]["kernel"], axis_name)
        y = _s_norm_relu(y, axis_name, eps)
        y = _sconv_reflect(y, r["conv2"]["kernel"], axis_name)
        h = h + _s_instance_norm(y, axis_name, eps)
    return h


def _s_backbone(p, x, n_downsampling, n_blocks, axis_name, eps):
    """GlobalGenerator trunk (stem..ups, no head) over a W-sharded slab —
    shared by the sharded GlobalGenerator and the LocalEnhancer's
    ``global`` subtree (models/networks.py _GlobalBackbone)."""
    h = _sconv_reflect(x, p["conv_in"]["kernel"], axis_name)
    h = _s_norm_relu(h, axis_name, eps)
    for i in range(n_downsampling):
        h = _sconv_down(h, p[f"down{i}"]["kernel"], axis_name)
        h = _s_norm_relu(h, axis_name, eps)
    h = _s_resblocks(p, h, [f"res{i}" for i in range(n_blocks)], axis_name, eps)
    for i in range(n_downsampling):
        h = _sconv_up(h, p[f"up{i}"]["kernel"], axis_name)
        h = _s_norm_relu(h, axis_name, eps)
    return h


def _s_avg_pool_3x3s2(x, axis_name):
    """nnops.avg_pool_3x3s2 (k3/s2/p1, count_include_pad=False) over the
    W-sharded slab: left-only halo like the stride-2 conv; the inverse
    count map is global-border-aware (first output col of shard 0 and the
    global top row have 2 taps on the clipped axis, interior 3)."""
    widened = _exchange_lr(x, 1, 0, axis_name)
    n, h, wp, c = widened.shape
    ws = wp - 1
    s_w = (
        widened[:, :, 0:ws - 1:2, :]
        + widened[:, :, 1:ws:2, :]
        + widened[:, :, 2:ws + 1:2, :]
    )
    hp = jnp.pad(s_w, ((0, 0), (1, 1), (0, 0), (0, 0)))
    s = hp[:, 0:h - 1:2] + hp[:, 1:h:2] + hp[:, 2:h + 1:2]
    h2, w2 = s.shape[1], s.shape[2]
    rows = jnp.full((h2,), 3.0, jnp.float32).at[0].set(2.0)
    cols = jnp.full((w2,), 3.0, jnp.float32)
    first = (lax.axis_index(axis_name) == 0).astype(jnp.float32)
    cols = cols.at[0].add(-first)  # global col 0 has 2 horizontal taps
    inv = (1.0 / (rows[:, None] * cols[None, :]))[None, :, :, None]
    return (s.astype(jnp.float32) * inv).astype(x.dtype)


def spatial_generator_forward(
    params, x, *, n_downsampling, n_blocks, output_nc=3,
    axis_name: str = "data", eps: float = 1e-5
):
    """GlobalGenerator forward over a W-sharded input slab (N,H,Ws,C) —
    run inside shard_map. ``params`` is the UNMODIFIED flax param tree of
    models.networks.GlobalGenerator (norm='instance'); biases under IN are
    dead there and skipped here identically."""
    p = params["params"] if "params" in params else params
    h = _s_backbone(p, x, n_downsampling, n_blocks, axis_name, eps)
    h = _sconv_reflect(
        h, p["conv_out"]["kernel"], axis_name, b=p["conv_out"]["bias"]
    )
    return jnp.tanh(h)


def spatial_local_enhancer_forward(
    params, x, *, n_downsample_global, n_blocks_global,
    n_local_enhancers=1, n_blocks_local=3, output_nc=3,
    axis_name: str = "data", eps: float = 1e-5
):
    """LocalEnhancer (the 1024p coarse-to-fine model — where one image may
    genuinely exceed one chip's HBM) over a W-sharded input slab: sharded
    avg-pool input pyramid, sharded global trunk at 1/2 res, local branch
    (stem, down, +trunk fuse, resblocks, up) and head, all W-sharded."""
    p = params["params"] if "params" in params else params
    pyramid = [x]
    for _ in range(n_local_enhancers):
        pyramid.append(_s_avg_pool_3x3s2(pyramid[-1], axis_name))

    out = _s_backbone(
        p["global"], pyramid[-1], n_downsample_global, n_blocks_global,
        axis_name, eps,
    )
    for n in range(1, n_local_enhancers + 1):
        inp = pyramid[n_local_enhancers - n]
        h = _sconv_reflect(inp, p[f"local{n}_conv_in"]["kernel"], axis_name)
        h = _s_norm_relu(h, axis_name, eps)
        h = _sconv_down(h, p[f"local{n}_down"]["kernel"], axis_name)
        h = _s_norm_relu(h, axis_name, eps)
        h = h + out
        h = _s_resblocks(
            p, h, [f"local{n}_res{i}" for i in range(n_blocks_local)],
            axis_name, eps,
        )
        h = _sconv_up(h, p[f"local{n}_up"]["kernel"], axis_name)
        h = _s_norm_relu(h, axis_name, eps)
        out = h
    out = _sconv_reflect(
        out, p["conv_out"]["kernel"], axis_name, b=p["conv_out"]["bias"]
    )
    return jnp.tanh(out)


def make_spatial_generator(
    mesh: Mesh, params, *, n_downsampling, n_blocks, output_nc=3,
    axis: str = "data"
):
    """Jitted W-sharded GlobalGenerator inference: full (N,H,W,C) in,
    full (N,H,W,output_nc) out, activations sharded over ``axis``.

    Requirements: W / n_devices divisible by 2**n_downsampling, per-shard
    W >= 4 (stem reflect-3 halo), bottleneck per-shard width >= 2
    (resblock reflect-1 edge fill)."""

    def inner(x_shard, params):
        ws = x_shard.shape[2]
        # bottleneck per-shard width must be >= 2: the resblocks' reflect-1
        # edge fill slices x[:, :, 1:2], which is EMPTY at width 1 and the
        # output silently collapses to width 0 (no error)
        assert ws % (2 ** n_downsampling) == 0 and ws // (2 ** n_downsampling) >= 2, (
            f"per-shard W {ws} incompatible with {n_downsampling} downs "
            f"(bottleneck width must be >= 2)"
        )
        assert ws >= 4, "stem reflect-3 halo needs per-shard W >= 4"
        return spatial_generator_forward(
            params, x_shard, n_downsampling=n_downsampling,
            n_blocks=n_blocks, output_nc=output_nc, axis_name=axis,
        )

    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, None, axis, None), P()),
        out_specs=P(None, None, axis, None),
    )
    return jax.jit(lambda x: sharded(x, params))


def make_spatial_local_enhancer(
    mesh: Mesh, params, *, n_downsample_global, n_blocks_global,
    n_local_enhancers=1, n_blocks_local=3, output_nc=3, axis: str = "data"
):
    """Jitted W-sharded LocalEnhancer inference (see
    spatial_local_enhancer_forward). Requires per-shard W divisible by
    2**(n_local_enhancers + n_downsample_global) and >= 8."""

    def inner(x_shard, params):
        ws = x_shard.shape[2]
        need = 2 ** (n_local_enhancers + n_downsample_global)
        # trunk bottleneck per-shard width >= 2 (same silent-collapse
        # hazard as make_spatial_generator)
        assert ws % need == 0 and ws // need >= 2 and ws >= 8, (
            f"per-shard W {ws} incompatible (need multiple of {need}, "
            f"bottleneck >= 2, ws >= 8)"
        )
        return spatial_local_enhancer_forward(
            params, x_shard, n_downsample_global=n_downsample_global,
            n_blocks_global=n_blocks_global,
            n_local_enhancers=n_local_enhancers,
            n_blocks_local=n_blocks_local, output_nc=output_nc,
            axis_name=axis,
        )

    sharded = jax.shard_map(
        inner, mesh=mesh,
        in_specs=(P(None, None, axis, None), P()),
        out_specs=P(None, None, axis, None),
    )
    return jax.jit(lambda x: sharded(x, params))
