"""Pallas TPU kernel: FULLY-fused 3x3 conv + InstanceNorm (+ReLU)
(+residual) — the resblock body as ONE kernel (BASELINE.json:5
"conv+instance-norm+ReLU residual blocks ... run as Pallas kernels").

Strategy (stride-1, reflect-pad-1, the reference's resblock conv):
  * caller reflect-pads x to (N, H+2, W+2, Cin) and reshapes the 3x3
    kernel to 9 taps (9, Cin, Cout);
  * grid = (N, Cout/CBLK); per step the padded slab lives in VMEM and the
    conv accumulates in an fp32 VMEM scratch as 9 MXU matmuls — tap
    (dy,dx) is a contiguous row-slab (H, W+2, Cin) reshaped to 2D, matmul
    against (Cin, CBLK), then the dx-shifted window added into the
    accumulator (≈(W+2)/W extra FLOPs, no im2col materialization);
  * InstanceNorm statistics (per channel, this Cout block) are computed
    from the accumulator IN REGISTERS, then normalize + optional residual
    + optional ReLU and a single HBM write.

One x read + one y write total — XLA's graph does conv-write + IN
read/stats + normalize read/write. The custom VJP delegates the backward
to jax.vjp of the equivalent lax composition (recompute-based).

MEASURED (v5e, bottleneck shape (8,16,32,1024)->1024, bf16): this kernel
1.38 ms vs 1.02 ms for XLA's conv+IN+ReLU — XLA's convolution emitters
beat the tap-loop matmul formulation (the 9 VPU shift-adds and the
(W+2)/W waste outweigh the fusion saving). It therefore ships as a
correct, tested, GATED op (``use_pallas=False`` falls back; callers must
opt in) and is NOT wired into networks.py — it is the documented tuning
surface for a future revisit (e.g. fusing BOTH resblock convs + both INs
in one kernel, halving intermediate traffic).

Gates: Cin*Cout tile + slab must fit VMEM (deep-layer shapes — the 9
resblocks at the generator bottleneck are exactly this), Cout % 128 == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .. import nnops

_EPS = 1e-5
INTERPRET = False

_VMEM_BUDGET = 10 * 1024 * 1024  # conservative: slab + taps + acc + out


def _plan(n, h, w, cin, cout, in_bytes):
    if cout % 128 != 0:
        return None
    cblk = 128
    slab = (h + 2) * (w + 2) * cin * in_bytes
    acc = h * w * cblk * 4
    out = h * w * cblk * in_bytes
    taps = 9 * cin * cblk * in_bytes
    # Mosaic multi-buffers in/out blocks: count slab twice, out twice
    total = 2 * slab + 2 * out + 2 * taps + acc
    if total > _VMEM_BUDGET:
        return None
    return cblk


def _kernel(x_ref, w_ref, b_ref, res_ref, o_ref, acc, *, h, w, relu, has_res):
    cblk = o_ref.shape[3]
    cin = x_ref.shape[3]
    acc[:] = jnp.zeros_like(acc)
    for dy in range(3):
        slab = x_ref[0, dy : dy + h, :, :]  # (h, w+2, cin), contiguous
        slab2d = slab.reshape(h * (w + 2), cin)
        for dx in range(3):
            t = dy * 3 + dx
            z = jax.lax.dot_general(
                slab2d,
                w_ref[t],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            z3 = z.reshape(h, w + 2, cblk)
            acc[:] += z3[:, dx : dx + w, :]

    y = acc[:] + b_ref[0, 0:1, :]  # (h, w, cblk) + (1, cblk)
    hw = h * w
    mean = jnp.sum(y, axis=(0, 1), keepdims=True) / hw
    var = jnp.sum(jnp.square(y - mean), axis=(0, 1), keepdims=True) / hw
    y = (y - mean) * lax.rsqrt(var + _EPS)
    if has_res:
        y = y + res_ref[0].astype(jnp.float32)
    if relu:
        y = jnp.maximum(y, 0.0)
    o_ref[0] = y.astype(o_ref.dtype)


def _run(x_pad, taps, b, res, relu):
    n = x_pad.shape[0]
    hp, wp, cin = x_pad.shape[1], x_pad.shape[2], x_pad.shape[3]
    h, w = hp - 2, wp - 2
    cout = taps.shape[2]
    cblk = 128
    has_res = res is not None

    in_specs = [
        pl.BlockSpec((1, hp, wp, cin), lambda i, cb: (i, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((9, cin, cblk), lambda i, cb: (0, 0, cb),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 8, cblk), lambda i, cb: (0, 0, cb),
                     memory_space=pltpu.VMEM),
    ]
    b_padded = jnp.broadcast_to(b[None, None, :], (1, 8, cout))
    inputs = [x_pad, taps, b_padded]
    if has_res:
        in_specs.append(
            pl.BlockSpec((1, h, w, cblk), lambda i, cb: (i, 0, 0, cb),
                         memory_space=pltpu.VMEM)
        )
        inputs.append(res)
        kernel = functools.partial(_kernel, h=h, w=w, relu=relu, has_res=True)
    else:
        def kernel(x_ref, w_ref, b_ref, o_ref, acc):
            return _kernel(x_ref, w_ref, b_ref, None, o_ref, acc,
                           h=h, w=w, relu=relu, has_res=False)

    return pl.pallas_call(
        kernel,
        interpret=INTERPRET,
        grid=(n, cout // cblk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, h, w, cblk), lambda i, cb: (i, 0, 0, cb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x_pad.dtype),
        scratch_shapes=[pltpu.VMEM((h, w, cblk), jnp.float32)],
    )(*inputs)


def _reference(x, w3x3, b, res, relu):
    y = nnops.conv2d(nnops.reflect_pad(x, 1), w3x3, b, stride=1, padding=0)
    y = nnops.instance_norm(y)
    if res is not None:
        y = y + res
    if relu:
        y = jnp.maximum(y, 0)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _fused(x, w3x3, b, res, relu):
    x_pad = nnops.reflect_pad(x, 1)
    cin, cout = w3x3.shape[2], w3x3.shape[3]
    taps = w3x3.reshape(9, cin, cout)
    return _run(x_pad, taps, b, res, relu)


def _fused_fwd(x, w3x3, b, res, relu):
    return _fused(x, w3x3, b, res, relu), (x, w3x3, b, res)


def _fused_bwd(relu, residuals, g):
    x, w3x3, b, res = residuals
    # backward = autodiff of the equivalent lax composition (recompute);
    # the fused kernel is an inference-path optimization, training uses
    # the XLA graph directly (see module docstring)
    if res is None:
        _, vjp = jax.vjp(lambda x, w, b: _reference(x, w, b, None, relu), x, w3x3, b)
        dx, dw, db = vjp(g)
        return dx, dw, db, None
    _, vjp = jax.vjp(lambda x, w, b, r: _reference(x, w, b, r, relu), x, w3x3, b, res)
    return vjp(g)


_fused.defvjp(_fused_fwd, _fused_bwd)


def conv3x3_in_act(x, w3x3, b, *, relu=False, residual=None, use_pallas=True):
    """NHWC fused reflect-pad-1 conv3x3 + IN (+residual) (+ReLU). Falls
    back to the lax composition when the shape doesn't fit the kernel's
    VMEM plan or off-TPU."""
    n, h, w, cin = x.shape
    cout = w3x3.shape[3]
    plan = _plan(n, h, w, cin, cout, x.dtype.itemsize)
    on_tpu = jax.default_backend() == "tpu" or INTERPRET
    if not use_pallas or plan is None or not on_tpu:
        return _reference(x, w3x3, b, residual, relu)
    return _fused(x, w3x3, b, residual, relu)
