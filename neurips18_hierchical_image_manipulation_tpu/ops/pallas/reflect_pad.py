"""Pallas TPU kernel: fused backward of ReflectionPad2d.

XLA derives reflect-pad's VJP as a chain of slice / rev / add fusions
that re-reads the cotangent several times — measured 10.8 ms/step of
`add_any` (plus slices/revs) at the mask2image bench config, ~686 GB/s
against the v5e ~819 GB/s roofline AND ~2.5x the minimal traffic. This
kernel does the whole fold in ONE read of dy and one write of dx per
sample:

  dx = dy[p:-p, p:-p]
  dx[1:p+1]     += flip(dy[:p])        (top mirror,   H axis)
  dx[H-1-p:H-1] += flip(dy[p+H:])      (bottom mirror)
  ... then the same fold on W applied to the H-folded tensor —
  separable exactly like jnp.pad(mode="reflect") itself.

Grid is (N,): one padded sample per step — every pad site in the model
fits VMEM this way except the 7x7 head/stem pads at full resolution
(e.g. [262,518,64] ~ 17 MB), which keep the lax path (their inputs are
conditioning tensors without gradients anyway, except the RGB head whose
single pad-bwd is left to XLA). Forward stays jnp.pad; only the VJP is
custom. Golden-tested vs the jnp VJP in tests/test_pallas_kernels.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = False

# per-sample padded block must fit comfortably in VMEM (multi-buffered
# in/out pair)
_MAX_BLOCK_BYTES = 3 * 1024 * 1024


def _bwd_kernel(dy_ref, dx_ref, *, p, h, w):
    # ONE direct separable fold (no scratch copy): the output block starts
    # as the core slice, then p row strips, p col strips and p*p corner
    # patches per side fold in with static-index read-modify-writes
    # (Mosaic lowers neither `rev` nor value scatter-add; p <= 3).
    #   top:    dy[k]       mirrors dx[p-k]    (k = 0..p-1)
    #   bottom: dy[p+h+k]   mirrors dx[h-2-k]
    dx_ref[0] = dy_ref[0, p : p + h, p : p + w]
    for k in range(p):
        dx_ref[0, p - k] = dx_ref[0, p - k] + dy_ref[0, k, p : p + w]
        dx_ref[0, h - 2 - k] = dx_ref[0, h - 2 - k] + dy_ref[0, p + h + k, p : p + w]
        dx_ref[0, :, p - k] = dx_ref[0, :, p - k] + dy_ref[0, p : p + h, k]
        dx_ref[0, :, w - 2 - k] = (
            dx_ref[0, :, w - 2 - k] + dy_ref[0, p : p + h, p + w + k]
        )
        for m in range(p):
            dx_ref[0, p - k, p - m] = dx_ref[0, p - k, p - m] + dy_ref[0, k, m]
            dx_ref[0, p - k, w - 2 - m] = (
                dx_ref[0, p - k, w - 2 - m] + dy_ref[0, k, p + w + m]
            )
            dx_ref[0, h - 2 - k, p - m] = (
                dx_ref[0, h - 2 - k, p - m] + dy_ref[0, p + h + k, m]
            )
            dx_ref[0, h - 2 - k, w - 2 - m] = (
                dx_ref[0, h - 2 - k, w - 2 - m] + dy_ref[0, p + h + k, p + w + m]
            )


def reflect_pad_bwd_eligible(shape, pad, dtype) -> bool:
    n, h, w, c = shape
    hp, wp = h + 2 * pad, w + 2 * pad
    if h <= 2 * pad + 1 or w <= 2 * pad + 1:
        return False  # mirrors overlap multiple times; lax handles it
    blk = hp * wp * c * dtype.itemsize
    return blk <= _MAX_BLOCK_BYTES


def reflect_pad_bwd(dy, pad, h, w):
    """dy: (N, H+2p, W+2p, C) cotangent of jnp.pad(x, reflect); returns
    dx: (N, H, W, C)."""
    n, hp, wp, c = dy.shape
    kernel = functools.partial(_bwd_kernel, p=pad, h=h, w=w)
    return pl.pallas_call(
        kernel,
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hp, wp, c), lambda i: (i, 0, 0, 0))],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h, w, c), dy.dtype),
        interpret=INTERPRET,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024,
        ),
    )(dy)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def reflect_pad_fused_bwd(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")


def _fwd(x, pad):
    y = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)), mode="reflect")
    return y, x.shape


def _bwd(pad, xshape, g):
    n, h, w, c = xshape
    return (reflect_pad_bwd(g, pad, h, w),)


reflect_pad_fused_bwd.defvjp(_fwd, _bwd)
