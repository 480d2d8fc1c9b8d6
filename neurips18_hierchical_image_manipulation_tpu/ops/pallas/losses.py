"""Pallas TPU kernels: fused loss reductions (BASELINE.json:5 "LSGAN/
feature-matching/VGG loss reductions ... as Pallas kernels").

Two primitives cover every loss tail in the framework:

  * ``mse_to_scalar(x, target)``  — mean((x - target)^2), target a scalar
    constant (LSGAN real/fake targets are 1.0 / 0.0)
  * ``l1_to_scalar(a, b)``        — mean(|a - b|)        (FM / VGG terms)

Each is a single sweep over flattened chunks with an fp32 accumulator in
VMEM scratch that persists across the sequential TPU grid — one HBM read
per element, no intermediate materialization. Backward passes are
closed-form elementwise (2(x-t)/N and sign(a-b)/N) and left to XLA via
custom VJP (they fuse into neighbors there; a kernel would add nothing).

Arrays whose size is not a multiple of the 1024-lane chunk are padded by
the wrapper; the denominator uses the TRUE element count.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

_LANES = 128
_SUBLANES = 2048  # 2048x128 fp32 = 1MB per grid step — amortizes step overhead
_CHUNK = _LANES * _SUBLANES  # elements per grid step tile row-block


def _reduce_call(kernel, flat, n_true):
    n = flat.shape[0]
    nchunks = n // _CHUNK
    out = pl.pallas_call(
        functools.partial(kernel, n_true=n_true),
        interpret=INTERPRET,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec(
                (_SUBLANES, _LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
        out_shape=jax.ShapeDtypeStruct((1,), jnp.float32),
        scratch_shapes=[pltpu.SMEM((1,), jnp.float32)],
    )(flat.reshape(nchunks * _SUBLANES, _LANES))
    return out[0]


def _sq_kernel(x_ref, o_ref, acc, *, n_true):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[0] = 0.0

    xf = x_ref[:].astype(jnp.float32)
    acc[0] += jnp.sum(xf * xf)

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[0] = acc[0] / n_true


def _abs_kernel(x_ref, o_ref, acc, *, n_true):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        acc[0] = 0.0

    acc[0] += jnp.sum(jnp.abs(x_ref[:].astype(jnp.float32)))

    @pl.when(i == pl.num_programs(0) - 1)
    def _():
        o_ref[0] = acc[0] / n_true


def _pad_flat(x):
    flat = x.reshape(-1)
    n = flat.shape[0]
    pad = (-n) % _CHUNK
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), flat.dtype)])
    return flat, n


def _use_pallas():
    return jax.default_backend() == "tpu" or INTERPRET


@jax.custom_vjp
def mse_to_scalar(diff):
    """mean(diff^2) fused to scalar. diff = x - target."""
    if not _use_pallas() or diff.size < _CHUNK:
        return jnp.mean(jnp.square(diff.astype(jnp.float32)))
    flat, n = _pad_flat(diff)
    return _reduce_call(_sq_kernel, flat, float(n))


def _mse_fwd(diff):
    return mse_to_scalar(diff), diff


def _mse_bwd(diff, g):
    n = diff.size
    return (((2.0 * g / n) * diff.astype(jnp.float32)).astype(diff.dtype),)


mse_to_scalar.defvjp(_mse_fwd, _mse_bwd)


@jax.custom_vjp
def l1_to_scalar(diff):
    """mean(|diff|) fused to scalar."""
    if not _use_pallas() or diff.size < _CHUNK:
        return jnp.mean(jnp.abs(diff.astype(jnp.float32)))
    flat, n = _pad_flat(diff)
    return _reduce_call(_abs_kernel, flat, float(n))


def _l1_fwd(diff):
    return l1_to_scalar(diff), diff


def _l1_bwd(diff, g):
    return (
        ((g / diff.size) * jnp.sign(diff.astype(jnp.float32))).astype(diff.dtype),
    )


l1_to_scalar.defvjp(_l1_fwd, _l1_bwd)
