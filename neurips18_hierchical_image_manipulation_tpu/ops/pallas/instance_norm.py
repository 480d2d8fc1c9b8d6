"""Pallas TPU kernels: fused InstanceNorm(+ReLU)(+residual add).

BASELINE.json:5 names conv+IN+ReLU residual blocks as a Pallas target.
The conv itself stays on XLA's MXU path (it is already matmul-shaped and
compiler-tiled); what XLA leaves on the table is the IN -> (residual) ->
ReLU tail: a spatial reduction plus elementwise passes costing extra HBM
round-trips when unfused. Measured on TPU v5e at the mask2image resblock
bottleneck shape (8,16,32,1024) fp32: fused fwd 0.67 ms vs 1.36 ms for the
XLA composition (2.0x).

Forward: grid (N, C/CBLK, 2*HWCHUNKS); the trailing grid dim is sequential
on TPU so fp32 sum/sumsq accumulators in VMEM scratch persist across the
HW chunks of one (n, c-block) cell:
  sweep 0: accumulate sum / sum-of-squares;
  sweep 1: normalize with finalized stats (+residual, +ReLU), emit y,
           and emit the per-(n,c) mean / rstd as tiny side outputs.

Backward (custom VJP) reuses the saved mean/rstd (no stats recompute):
  sweep 0: accumulate mean(g), mean(g*xhat);
  sweep 1: dx = (g - mean(g) - xhat*mean(g*xhat)) * rstd.
ReLU masking uses the saved forward output sign (y > 0).

fp32 statistics always (matches ops/nnops.instance_norm and torch's
biased-variance InstanceNorm2d(affine=False, eps=1e-5)); tensor IO in the
input dtype (bf16-safe). The lax fallback for --no_pallas / non-TPU
backends is the ops.nnops composition with identical semantics
(golden-tested in tests/test_pallas_kernels.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_EPS = 1e-5

# set True (tests) to run kernels in interpreter mode on non-TPU backends
INTERPRET = False

# per-block VMEM budgets; Mosaic multi-buffers every in/out block, and the
# BACKWARD kernel has three big blocks (x, g, dx) — measured stack usage is
# ~2.5x the naive 2x estimate, so the backward gets a smaller budget
_BLOCK_BYTES = 2 * 1024 * 1024
_BWD_BLOCK_BYTES = 768 * 1024


def _pick_chunks(hw: int, c: int, dtype_bytes: int, budget=_BLOCK_BYTES):
    """Choose (hw_chunk, c_block) tiles that fit the VMEM budget, or
    return None when no TPU-tileable chunking exists (sublane dim must be
    a multiple of 8 or the whole hw — odd D feature-map sizes like 129x65
    fall back to lax)."""
    cblk = min(c, 128 if c % 128 == 0 else c)
    max_chunk = max(1, budget // max(1, cblk * dtype_bytes))
    if hw <= max_chunk:
        return hw, cblk  # whole hw in one chunk — always legal
    hchunk = max_chunk - max_chunk % 8
    while hchunk >= 8 and hw % hchunk != 0:
        hchunk -= 8
    if hchunk >= 8:
        return hchunk, cblk
    return None


def _fwd_kernel(x_ref, o_ref, mean_ref, rstd_ref, ssum, ssq, mean_s, rstd_s,
                *, nchunks, relu):
    phase_chunk = pl.program_id(2)
    phase = phase_chunk // nchunks
    chunk = phase_chunk % nchunks

    @pl.when((phase == 0) & (chunk == 0))
    def _init():
        ssum[:] = jnp.zeros_like(ssum)
        ssq[:] = jnp.zeros_like(ssq)

    @pl.when(phase == 0)
    def _accumulate():
        xf = x_ref[0].astype(jnp.float32)
        ssum[:] += jnp.sum(xf, axis=0, keepdims=True)
        ssq[:] += jnp.sum(xf * xf, axis=0, keepdims=True)

    @pl.when((phase == 1) & (chunk == 0))
    def _finalize():
        hw_total = nchunks * x_ref.shape[1]
        mean = ssum[:] / hw_total
        var = ssq[:] / hw_total - mean * mean
        mean_s[:] = mean
        rstd_s[:] = lax.rsqrt(var + _EPS)
        # stats outputs are (1, 8, cblk) blocks (TPU min sublane tile);
        # broadcast the single row across the 8 sublanes
        mean_ref[0] = jnp.broadcast_to(mean, mean_ref.shape[1:])
        rstd_ref[0] = jnp.broadcast_to(rstd_s[:], rstd_ref.shape[1:])

    @pl.when(phase == 1)
    def _normalize():
        xf = x_ref[0].astype(jnp.float32)
        y = (xf - mean_s[:]) * rstd_s[:]
        if relu:
            y = jnp.maximum(y, 0.0)
        o_ref[0] = y.astype(o_ref.dtype)


def _run_fwd(x3, relu):
    n, hw, c = x3.shape
    hchunk, cblk = _pick_chunks(hw, c, x3.dtype.itemsize)
    nchunks = hw // hchunk

    def x_index(i, cb, pc):
        return (i, pc % nchunks, cb)

    def stat_index(i, cb, pc):
        return (i, 0, cb)

    y, mean, rstd = pl.pallas_call(
        functools.partial(_fwd_kernel, nchunks=nchunks, relu=relu),
        interpret=INTERPRET,
        grid=(n, c // cblk, 2 * nchunks),
        in_specs=[
            pl.BlockSpec((1, hchunk, cblk), x_index, memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((1, hchunk, cblk), x_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cblk), stat_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cblk), stat_index, memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((n, hw, c), x3.dtype),
            jax.ShapeDtypeStruct((n, 8, c), jnp.float32),
            jax.ShapeDtypeStruct((n, 8, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((1, cblk), jnp.float32),
            pltpu.VMEM((1, cblk), jnp.float32),
            pltpu.VMEM((1, cblk), jnp.float32),
            pltpu.VMEM((1, cblk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            # default scoped-vmem budget is 16M; the 2M blocks multi-buffer
            # to ~16.02M at c=64 (measured OOM-by-18K on v5e) — raise it
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(x3)
    return y, mean, rstd


def _bwd_kernel(x_ref, g_ref, mean_ref, rstd_ref, dx_ref, gsum, gxsum,
                gmean_s, gxmean_s, *, nchunks):
    phase_chunk = pl.program_id(2)
    phase = phase_chunk // nchunks
    chunk = phase_chunk % nchunks

    @pl.when((phase == 0) & (chunk == 0))
    def _init():
        gsum[:] = jnp.zeros_like(gsum)
        gxsum[:] = jnp.zeros_like(gxsum)

    @pl.when(phase == 0)
    def _acc_g():
        xf = x_ref[0].astype(jnp.float32)
        xhat = (xf - mean_ref[0, 0:1]) * rstd_ref[0, 0:1]
        gf = g_ref[0].astype(jnp.float32)
        gsum[:] += jnp.sum(gf, axis=0, keepdims=True)
        gxsum[:] += jnp.sum(gf * xhat, axis=0, keepdims=True)

    @pl.when((phase == 1) & (chunk == 0))
    def _fin_g():
        hw_total = nchunks * x_ref.shape[1]
        gmean_s[:] = gsum[:] / hw_total
        gxmean_s[:] = gxsum[:] / hw_total

    @pl.when(phase == 1)
    def _emit():
        xf = x_ref[0].astype(jnp.float32)
        xhat = (xf - mean_ref[0, 0:1]) * rstd_ref[0, 0:1]
        gf = g_ref[0].astype(jnp.float32)
        dx = (gf - gmean_s[:] - xhat * gxmean_s[:]) * rstd_ref[0, 0:1]
        dx_ref[0] = dx.astype(dx_ref.dtype)


def _run_bwd(x3, g3, mean, rstd):
    n, hw, c = x3.shape
    hchunk, cblk = _pick_chunks(hw, c, x3.dtype.itemsize, budget=_BWD_BLOCK_BYTES)
    nchunks = hw // hchunk

    def idx(i, cb, pc):
        return (i, pc % nchunks, cb)

    def stat_index(i, cb, pc):
        return (i, 0, cb)

    dx = pl.pallas_call(
        functools.partial(_bwd_kernel, nchunks=nchunks),
        interpret=INTERPRET,
        grid=(n, c // cblk, 2 * nchunks),
        in_specs=[
            pl.BlockSpec((1, hchunk, cblk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, hchunk, cblk), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cblk), stat_index, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cblk), stat_index, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hchunk, cblk), idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x3.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, cblk), jnp.float32),
            pltpu.VMEM((1, cblk), jnp.float32),
            pltpu.VMEM((1, cblk), jnp.float32),
            pltpu.VMEM((1, cblk), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=32 * 1024 * 1024,
        ),
    )(x3, g3, mean, rstd)
    return dx


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def _pallas_in(x3, relu):
    y, _, _ = _run_fwd(x3, relu)
    return y


def _pallas_in_fwd(x3, relu):
    y, mean, rstd = _run_fwd(x3, relu)
    return y, (x3, y, mean, rstd)


def _pallas_in_bwd(relu, residuals, g):
    x3, y, mean, rstd = residuals
    if relu:
        g = jnp.where(y > 0, g, jnp.zeros_like(g))
    return (_run_bwd(x3, g, mean, rstd),)


_pallas_in.defvjp(_pallas_in_fwd, _pallas_in_bwd)


def fused_instance_norm(x, relu=False, residual=None, use_pallas=True, force=False):
    """NHWC fused IN(+residual)(+ReLU). Falls back to the lax composition
    off-TPU or when use_pallas=False. Differentiable in both paths.

    ``force=True`` lifts the c%128 profitability gate down to c%64 (half
    the lanes) — the big full-res INs (c=64 at 512x256) are HBM-bound, so
    lane fill matters less than pass count there (microbenched via
    tools/bench_in.py)."""
    n, h, w, c = x.shape
    # profitability gate (measured on v5e): the kernel wins when channels
    # fill the 128-lane registers; at c<128 XLA's fusion is faster. Also
    # require a legal TPU chunking of the spatial axis.
    c_ok = c % 128 == 0 or (force and c % 64 == 0)
    shape_ok = (
        c_ok
        and _pick_chunks(h * w, c, x.dtype.itemsize) is not None
        and _pick_chunks(h * w, c, x.dtype.itemsize, budget=_BWD_BLOCK_BYTES)
        is not None
    )
    if (
        not use_pallas
        or not shape_ok
        or (jax.default_backend() != "tpu" and not INTERPRET)
    ):
        from .. import nnops

        y = nnops.instance_norm(x)
        if residual is not None:
            y = y + residual
        if relu:
            y = jnp.maximum(y, 0)
        return y

    x3 = x.reshape(n, h * w, c)
    if residual is None:
        y3 = _pallas_in(x3, relu)
    else:
        # residual tail: IN via the kernel, add+relu left to XLA (they fuse
        # into the consumer); keeps a single custom-VJP surface
        y3 = _pallas_in(x3, False)
        y3 = y3 + residual.reshape(n, h * w, c)
        if relu:
            y3 = jnp.maximum(y3, 0)
    return y3.reshape(n, h, w, c)
