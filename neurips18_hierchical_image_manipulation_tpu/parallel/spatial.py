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


def _halo_from_neighbors(x, halo: int, axis_name: str):
    """Collect the rightmost ``halo`` columns of the LEFT neighbour and the
    leftmost of the RIGHT neighbour (zero-padded at the mesh edges)."""
    n_dev = lax.axis_size(axis_name)
    idx = lax.axis_index(axis_name)

    right_edge = x[:, :, -halo:, :]  # what our RIGHT neighbour needs
    left_edge = x[:, :, :halo, :]  # what our LEFT neighbour needs

    # send right_edge to the right neighbour (it becomes their left halo)
    from_left = lax.ppermute(
        right_edge, axis_name, [(i, (i + 1) % n_dev) for i in range(n_dev)]
    )
    # send left_edge to the left neighbour (their right halo)
    from_right = lax.ppermute(
        left_edge, axis_name, [(i, (i - 1) % n_dev) for i in range(n_dev)]
    )
    # zero the wrapped-around edges (conv padding semantics, not circular)
    from_left = jnp.where(idx == 0, jnp.zeros_like(from_left), from_left)
    from_right = jnp.where(
        idx == n_dev - 1, jnp.zeros_like(from_right), from_right
    )
    return from_left, from_right


def halo_exchange_conv2d(x, w, b=None, *, padding: int, axis_name: str = "data"):
    """Stride-1 conv over W-sharded NHWC activations with ppermute halos.

    Must run inside shard_map over a 1-D mesh; ``padding`` is the torch
    symmetric padding of the equivalent unsharded conv (halo = padding;
    requires kernel = 2*padding+1, the reference's 3x3/7x7 cases).
    """
    kh, kw = w.shape[0], w.shape[1]
    assert kw == 2 * padding + 1, "halo conv expects symmetric odd kernels"
    halo = padding
    from_left, from_right = _halo_from_neighbors(x, halo, axis_name)
    widened = jnp.concatenate([from_left, x, from_right], axis=2)
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
