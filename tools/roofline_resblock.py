"""Roofline artifact for the resblock-trunk Pallas decision (VERDICT r2
missing#2 / next#1: "build it or retire the claim with a committed
roofline artifact").

Measures ON THE TPU, at the generator-bottleneck resblock shape
(N=batch, 16x32 spatial, 1024ch, bf16 — the 9-block trunk that is the
step profile's largest bucket):

  1. bare MXU matmul at the conv's implicit-GEMM shape
     (M=N*H*W, K=9*Cin, N=Cout) — the speed-of-light for ANY
     hand-written implicit-GEMM kernel formulation;
  2. the same-FLOPs matmul at the per-tap formulation (K=Cin, 9 calls)
     — the ceiling for the tap-loop Pallas kernel that was built;
  3. XLA's conv3x3+IN+ReLU composition (the shipping lax path), fwd and
     fwd+bwd, converted to achieved conv-TFLOP/s;
  4. the gated Pallas fused conv3x3+IN kernel (ops/pallas/conv_in.py);
  5. a full resblock (two convs + two INs + residual) via XLA, fwd+bwd.

Writes ROOFLINE_resblock.json at the repo root. Interpretation: if (3)
achieves >= (1) x ~0.9, XLA's conv emitter is already at the implicit-
GEMM speed-of-light and NO Pallas reformulation of the same FLOPs can
win end-to-end — the kernel tier's resblock claim is retired with this
artifact rather than a sixth losing kernel.

Usage: python tools/roofline_resblock.py [batch=32]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _sync(out):
    """Hard sync: fetch ONE element of the last output. axon's
    block_until_ready does not synchronize reliably (same caveat as
    bench.py:112) — a device->host scalar fetch drains the exec queue."""
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.ravel()[0])


def timeit(fn, *args, iters=200, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    # one tunnel RTT for the closing fetch is amortized over `iters`
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    bs = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    h, w, c = 16, 32, 1024
    dt = jnp.bfloat16
    rng = np.random.RandomState(0)

    x = jnp.asarray(rng.randn(bs, h, w, c), dt)
    w1 = jnp.asarray(rng.randn(3, 3, c, c) * 0.02, dt)
    w2 = jnp.asarray(rng.randn(3, 3, c, c) * 0.02, dt)
    b1 = jnp.zeros((c,), dt)
    b2 = jnp.zeros((c,), dt)

    conv_flops = 2.0 * bs * h * w * c * c * 9  # one 3x3 conv
    report = {
        "shape": [bs, h, w, c],
        "dtype": "bfloat16",
        "conv_flops": conv_flops,
        "peak_tflops_v5e_bf16": 197.0,
    }

    # ---- 1. implicit-GEMM speed-of-light: one (M, 9C) x (9C, C) matmul ----
    M = bs * h * w
    A = jnp.asarray(rng.randn(M, 9 * c), dt)
    B = jnp.asarray(rng.randn(9 * c, c), dt)

    @jax.jit
    def mm(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )

    t = timeit(mm, A, B)
    report["implicit_gemm_matmul"] = {
        "ms": t * 1e3, "tflops": conv_flops / t / 1e12,
        "note": "M=N*H*W K=9C N=C single matmul - ceiling for ANY "
        "implicit-GEMM kernel (ignores its im2col read amplification)",
    }

    # ---- 2. tap-loop formulation ceiling: 9 x (M, C) x (C, C) ----
    A2 = jnp.asarray(rng.randn(M, c), dt)
    Bt = jnp.asarray(rng.randn(9, c, c), dt)

    @jax.jit
    def mm9(a, bt):
        acc = jnp.zeros((M, c), jnp.float32)
        for t_ in range(9):
            acc += jax.lax.dot_general(
                a, bt[t_], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    t = timeit(mm9, A2, Bt)
    report["tap_loop_matmuls"] = {
        "ms": t * 1e3, "tflops": conv_flops / t / 1e12,
        "note": "9 K=C matmuls + fp32 adds - ceiling for the tap-loop "
        "Pallas kernel (ops/pallas/conv_in.py)",
    }

    # ---- 3. XLA conv+IN+ReLU (the shipping path) ----
    def conv_in_relu(x_, w_, b_):
        y = nnops.conv2d(nnops.reflect_pad(x_, 1), w_, b_, stride=1, padding=0)
        y = nnops.instance_norm(y)
        return jnp.maximum(y, 0)

    f = jax.jit(conv_in_relu)
    t = timeit(f, x, w1, b1)
    report["xla_conv_in_relu_fwd"] = {"ms": t * 1e3, "tflops": conv_flops / t / 1e12}

    # ---- 4. Pallas fused conv3x3+IN (gated kernel) ----
    try:
        from neurips18_hierchical_image_manipulation_tpu.ops.pallas.conv_in import (
            conv3x3_in_act,
        )

        g = jax.jit(lambda x_, w_, b_: conv3x3_in_act(x_, w_, b_, relu=True,
                                                      use_pallas=True))
        t = timeit(g, x, w1, b1)
        report["pallas_conv_in_relu_fwd"] = {
            "ms": t * 1e3, "tflops": conv_flops / t / 1e12,
        }
    except Exception as e:  # noqa: BLE001 - report the failure, don't die
        report["pallas_conv_in_relu_fwd"] = {"error": repr(e)}

    # ---- 5. full resblock via XLA, fwd and fwd+bwd ----
    def resblock(x_, w1_, b1_, w2_, b2_):
        y = conv_in_relu(x_, w1_, b1_)
        y = nnops.conv2d(nnops.reflect_pad(y, 1), w2_, b2_, stride=1, padding=0)
        y = nnops.instance_norm(y)
        return x_ + y

    f = jax.jit(resblock)
    t = timeit(f, x, w1, b1, w2, b2)
    report["xla_resblock_fwd"] = {
        "ms": t * 1e3, "tflops": 2 * conv_flops / t / 1e12,
    }

    def loss(x_, w1_, b1_, w2_, b2_):
        return jnp.sum(resblock(x_, w1_, b1_, w2_, b2_).astype(jnp.float32))

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    t = timeit(g, x, w1, b1, w2, b2)
    # fwd+bwd ~= 3x the fwd conv FLOPs (dgrad + wgrad per conv)
    report["xla_resblock_fwd_bwd"] = {
        "ms": t * 1e3, "tflops": 6 * conv_flops / t / 1e12,
    }

    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "ROOFLINE_resblock.json")
    with open(out, "w") as fjson:
        json.dump(report, fjson, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
