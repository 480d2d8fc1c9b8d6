"""Secondary benchmark harness: the non-headline BASELINE.json configs.

bench.py (the driver's entry) reports config #3/#5 (full GAN train step).
This tool times the rest:
  #1 label->RGB GlobalGenerator forward at 256x128
  #2 structure-generator forward (bbox-conditioned layout inpainting)
  #4 two-step manipulation chain (box -> layout -> image, fully jitted)

Usage: python tools/bench_all.py [--bs 16] [--iters 50]
Prints one JSON line per config.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def timeit(fn, sync, iters):
    r = fn()
    sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn()
    sync(r)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
    )

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        BoxToMaskTestOptions,
        MaskToImageTestOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
        synthetic_box2mask_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.eval.two_step import (
        TwoStepPipeline,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model
    from neurips18_hierchical_image_manipulation_tpu.ops import nnops

    nnops.set_default_precision("default")

    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--iters", type=int, default=50)
    p.add_argument("--out", default="", help="also write results to this JSON file")
    p.add_argument(
        "--with_1024p",
        action="store_true",
        help="include the 1024p LocalEnhancer train-step config (long compile)",
    )
    args = p.parse_args()
    bs = args.bs
    rng = np.random.RandomState(0)

    results = []

    def emit(rec):
        results.append(rec)
        print(json.dumps(rec))

    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    # --- config #1: GlobalGenerator forward 256x128 label -> RGB ---
    m2i_opt = MaskToImageTestOptions(
        name="ba", checkpoints_dir="/tmp/himan_ba", label_nc=35, ngf=64,
        n_downsample_global=4, n_blocks_global=9, use_masked_image=True,
        # perf tier explicitly: create_model resolves precision from the
        # config since round 4, and these fp32 opts would otherwise flip
        # the global precision back to HIGHEST mid-bench
        conv_precision="default",
    )
    m2i = create_model(m2i_opt)
    b1 = synthetic_batch(rng, bs, hw=(128, 256), label_nc=35)
    b1 = {k: jnp.asarray(v) for k, v in b1.items()}
    params1 = jax.jit(lambda r: m2i.init_params(r, b1))(jax.random.PRNGKey(0))
    infer1 = jax.jit(lambda p, b: m2i.inference(p, b))
    dt = timeit(lambda: infer1(params1, b1), sync, args.iters)
    emit({"metric": "g_forward_256x128", "value": round(bs / dt, 2),
          "unit": "images/sec/chip"})

    # --- config #2: structure generator forward 128x128 crops ---
    b2m_opt = BoxToMaskTestOptions(
        name="ba2", checkpoints_dir="/tmp/himan_ba", label_nc=35, ngf=64,
        n_downsample_global=3, n_blocks_global=4, fineSize=128,
        conv_precision="default",  # see m2i_opt
    )
    b2m = create_model(b2m_opt)
    b2 = synthetic_box2mask_batch(rng, bs, size=128, label_nc=35)
    b2 = {k: jnp.asarray(v) for k, v in b2.items()}
    params2 = jax.jit(lambda r: b2m.init_params(r, b2))(jax.random.PRNGKey(0))
    infer2 = jax.jit(lambda p, b: b2m.inference(p, b))
    dt = timeit(lambda: infer2(params2, b2), sync, args.iters)
    emit({"metric": "structure_forward_128", "value": round(bs / dt, 2),
          "unit": "crops/sec/chip"})

    # --- config #4: full two-step manipulation chain ---
    pipe = TwoStepPipeline(b2m, params2, m2i, params1)
    scene = synthetic_batch(rng, bs, hw=(256, 512), label_nc=35)
    image = jnp.asarray(scene["image"])
    label = jnp.asarray(scene["label"])
    inst = jnp.asarray(scene["inst"])
    boxes = jnp.asarray(scene["boxes"])
    cls = jnp.full((bs,), 26, jnp.int32)
    fwd4 = lambda: pipe.add_object(image, label, inst, boxes, cls)
    dt = timeit(fwd4, sync, args.iters)
    emit({"metric": "two_step_edit_512x256", "value": round(bs / dt, 2),
          "unit": "edits/sec/chip"})

    # --- 1024p coarse-to-fine train step (scripts/..._1024p.sh config) ---
    if args.with_1024p:
        import optax

        from neurips18_hierchical_image_manipulation_tpu.configs.options import (
            MaskToImageTrainOptions,
        )
        from neurips18_hierchical_image_manipulation_tpu.train import (
            steps as train_steps,
        )
        from neurips18_hierchical_image_manipulation_tpu.train.state import (
            GANTrainState,
        )

        bs1k = 4
        opt1k = MaskToImageTrainOptions(
            name="ba1k", checkpoints_dir="/tmp/himan_ba", label_nc=35,
            netG="local", ngf=32, n_downsample_global=4, n_blocks_global=9,
            n_blocks_local=3, num_D=3, n_layers_D=3, batchSize=bs1k,
            use_masked_image=True, dtype="bfloat16",
        )
        m1k = create_model(opt1k)
        b1k = synthetic_batch(rng, bs1k, hw=(512, 1024), label_nc=35)
        b1k = {k: jnp.asarray(v) for k, v in b1k.items()}
        p1k = jax.jit(lambda r: m1k.init_params(r, b1k))(jax.random.PRNGKey(0))
        vgg1k = p1k.pop("VGG", None)
        tx = optax.adam(2e-4, b1=0.5)
        st = GANTrainState.create(p1k, tx, tx, jax.random.PRNGKey(1))
        step1k = train_steps.make_train_step(
            m1k, vgg_params=vgg1k, compute_dtype=jnp.bfloat16
        )

        st, m, _ = step1k(st, b1k)
        _ = float(m["D_real"])
        t0 = time.perf_counter()
        n = max(args.iters // 5, 5)
        for _ in range(n):
            st, m, _ = step1k(st, b1k)
        _ = float(m["D_real"])
        dt = (time.perf_counter() - t0) / n
        emit({"metric": "train_1024x512_local_enhancer", "value": round(bs1k / dt, 2),
              "unit": "images/sec/chip"})

    if args.out:
        with open(args.out, "w") as f:
            json.dump(
                {"configs": results, "bs": bs, "iters": args.iters}, f, indent=1
            )
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
