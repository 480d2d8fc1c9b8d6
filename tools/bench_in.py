"""Isolated instance-norm microbench: lax composition vs Pallas kernel.

Times fwd and fwd+bwd of InstanceNorm(+ReLU) on the GAN step's real IN
shapes (512x256 bs32 config) on the TPU, against the HBM roofline
(~819 GB/s on v5e). The full-step profile shows the IN convert+reduce
fusions at ~74 ms/step running well below bandwidth — this isolates
whether the op composition itself is slow or only its in-graph schedule.

Usage: python tools/bench_in.py [--iters 30]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


SHAPES = [
    (32, 256, 512, 64),   # stem / up3 IN (full res)
    (32, 128, 256, 128),  # down0 / up2
    (32, 64, 128, 256),   # down1 / up1
    (32, 16, 32, 1024),   # resblock bottleneck
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )

    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.ops.pallas.instance_norm import (
        fused_instance_norm,
    )

    nnops.set_default_precision("default")
    rng = np.random.RandomState(0)

    def timeit(fn, *xs):
        y = jax.block_until_ready(fn(*xs))
        # scalar fetch = hard sync on axon
        _ = float(jnp.asarray(y).reshape(-1)[0].astype(jnp.float32))
        t0 = time.perf_counter()
        for _i in range(args.iters):
            y = fn(*xs)
        _ = float(jnp.asarray(y).reshape(-1)[0].astype(jnp.float32))
        return (time.perf_counter() - t0) / args.iters * 1e3

    for shape in SHAPES:
        x = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
        g = jnp.asarray(rng.randn(*shape).astype(np.float32)).astype(jnp.bfloat16)
        nbytes = x.size * 2

        lax_fwd = jax.jit(lambda x: nnops.instance_norm(jnp.maximum(x, 0)))
        # fwd+bwd through IN(+relu): dx of sum(IN(relu-ish)*g)
        lax_fb = jax.jit(
            jax.grad(lambda x: jnp.sum(jnp.maximum(nnops.instance_norm(x), 0).astype(jnp.float32) * g.astype(jnp.float32)))
        )
        pl_fwd = jax.jit(lambda x: fused_instance_norm(x, relu=True, force=True))
        pl_fb = jax.jit(
            jax.grad(lambda x: jnp.sum(fused_instance_norm(x, relu=True, force=True).astype(jnp.float32) * g.astype(jnp.float32)))
        )

        t_lf = timeit(lax_fwd, x)
        t_lb = timeit(lax_fb, x)
        t_pf = timeit(pl_fwd, x)
        t_pb = timeit(pl_fb, x)
        # roofline: fwd = 2 reads + 1 write; bwd = +2 reads +1 write (+stats)
        roof_f = 3 * nbytes / 819e9 * 1e3
        roof_b = roof_f + 5 * nbytes / 819e9 * 1e3
        print(
            f"{str(shape):22s} lax fwd {t_lf:7.3f}  fwd+bwd {t_lb:7.3f} | "
            f"pallas fwd {t_pf:7.3f}  fwd+bwd {t_pb:7.3f} | roof fwd {roof_f:5.2f} f+b {roof_b:5.2f} ms"
        )


if __name__ == "__main__":
    main()
