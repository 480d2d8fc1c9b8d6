"""Standalone 1024x512 coarse-to-fine (LocalEnhancer) train-step bench —
the bench_all.py --with_1024p leg on its own, for A/B runs against env
knobs (HIMAN_IN_CUSTOM_VJP, HIMAN_BENCH_REMAT_POLICY) without re-running
the whole secondary grid (VERDICT r3 next#6).

Prints ONE JSON line; --out appends JSONL with the env knobs recorded.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--bs", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    # shared cache policy (options._setup_jax_compile_cache honors
    # $HIMAN_JAX_CACHE_DIR); default to the repo checkout's cache so the
    # tool shares bench.py's entries regardless of CWD
    os.environ.setdefault(
        "HIMAN_JAX_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"
        ),
    )
    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        _setup_jax_compile_cache,
    )

    _setup_jax_compile_cache()
    import jax.numpy as jnp
    import optax

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops
    from neurips18_hierchical_image_manipulation_tpu.train import (
        steps as train_steps,
    )
    from neurips18_hierchical_image_manipulation_tpu.train.state import (
        GANTrainState,
    )

    nnops.set_default_precision("default")
    opt = MaskToImageTrainOptions(
        name="b1k", checkpoints_dir="/tmp/himan_b1k", label_nc=35,
        netG="local", ngf=32, n_downsample_global=4, n_blocks_global=9,
        n_blocks_local=3, num_D=3, n_layers_D=3, batchSize=args.bs,
        use_masked_image=True, dtype="bfloat16",
        remat_policy=os.environ.get("HIMAN_BENCH_REMAT_POLICY", "none"),
    )
    model = create_model(opt)
    rng = np.random.RandomState(0)
    batch = synthetic_batch(rng, args.bs, hw=(512, 1024), label_nc=35)
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = jax.jit(lambda r: model.init_params(r, batch))(jax.random.PRNGKey(0))
    vgg = params.pop("VGG", None)
    tx = optax.adam(2e-4, b1=0.5)
    state = GANTrainState.create(params, tx, tx, jax.random.PRNGKey(1))
    step = train_steps.make_train_step(model, vgg_params=vgg, compute_dtype=jnp.bfloat16)

    state, m, _ = step(state, batch)
    _ = float(m["D_real"])
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, m, _ = step(state, batch)
    _ = float(m["D_real"])
    dt = (time.perf_counter() - t0) / args.iters
    row = {
        "metric": "train_1024x512_local_enhancer",
        "value": round(args.bs / dt, 2),
        "unit": "images/sec/chip",
        "ms_per_step": round(dt * 1e3, 1),
        "bs": args.bs,
        "env": {
            k: os.environ[k]
            for k in (
                "HIMAN_IN_CUSTOM_VJP",
                "HIMAN_BENCH_REMAT_POLICY",
                "HIMAN_STEM_PACK",
                "HIMAN_CONV_REFLECT_FUSED",
            )
            if k in os.environ
        },
    }
    print(json.dumps(row))
    if args.out:
        with open(args.out, "a") as f:
            f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
