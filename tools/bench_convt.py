"""Microbench: ConvT(k3,s2,p1,op1) implementations at the generator's real
upsampling shapes (bs32, bf16, fwd+bwd). One process, real TPU.

Impls: adjoint (lhs-dilated conv), subpixel (4 phase convs + interleave),
d2s (one 2x2 conv to 4*Co channels + depth-to-space).
"""

import json
import os
import time

import os as _os_, sys as _sys_
_sys_.path.insert(0, _os_.path.join(_os_.path.dirname(_os_.path.abspath(__file__)), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    P = jax.lax.Precision.DEFAULT
    bs = 32
    # the G's four upsamplers at 512x256 training: (H,W,Cin->Cout)
    shapes = [
        (16, 32, 1024, 512),
        (32, 64, 512, 256),
        (64, 128, 256, 128),
        (128, 256, 128, 64),
    ]
    impls = {
        "adjoint": lambda x, w: nnops.conv_transpose2d(
            x, w, stride=2, padding=1, output_padding=1, precision=P
        ),
        "subpixel": lambda x, w: nnops.conv_transpose2d_subpixel(x, w, precision=P),
        "d2s": lambda x, w: nnops.conv_transpose2d_d2s(x, w, precision=P),
    }
    rng = np.random.RandomState(0)
    for h, w_, ci, co in shapes:
        x = jnp.asarray(rng.randn(bs, h, w_, ci).astype(np.float32)).astype(jnp.bfloat16)
        k = jnp.asarray(0.05 * rng.randn(3, 3, ci, co).astype(np.float32)).astype(jnp.bfloat16)
        row = {"shape": f"{h}x{w_}x{ci}->{co}"}
        for name, fn in impls.items():
            @jax.jit
            def fwdbwd(x, k, fn=fn):
                def loss(x, k):
                    return jnp.sum(fn(x, k).astype(jnp.float32) ** 2)
                l, g = jax.value_and_grad(loss, argnums=(0, 1))(x, k)
                return l, g

            l, g = fwdbwd(x, k)
            _ = float(l)
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                l, g = fwdbwd(x, k)
            _ = float(l)
            row[name + "_ms"] = round((time.perf_counter() - t0) / iters * 1e3, 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
