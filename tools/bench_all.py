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
    args = p.parse_args()
    bs = args.bs
    rng = np.random.RandomState(0)

    def sync(r):
        leaf = jax.tree.leaves(r)[0]
        np.asarray(jax.device_get(leaf[(0,) * leaf.ndim]))

    # --- config #1: GlobalGenerator forward 256x128 label -> RGB ---
    m2i_opt = MaskToImageTestOptions(
        name="ba", checkpoints_dir="/tmp/himan_ba", label_nc=35, ngf=64,
        n_downsample_global=4, n_blocks_global=9, use_masked_image=True,
    )
    m2i = create_model(m2i_opt)
    b1 = synthetic_batch(rng, bs, hw=(128, 256), label_nc=35)
    b1 = {k: jnp.asarray(v) for k, v in b1.items()}
    params1 = jax.jit(lambda r: m2i.init_params(r, b1))(jax.random.PRNGKey(0))
    infer1 = jax.jit(lambda p, b: m2i.inference(p, b))
    dt = timeit(lambda: infer1(params1, b1), sync, args.iters)
    print(json.dumps({"metric": "g_forward_256x128", "value": round(bs / dt, 2),
                      "unit": "images/sec/chip"}))

    # --- config #2: structure generator forward 128x128 crops ---
    b2m_opt = BoxToMaskTestOptions(
        name="ba2", checkpoints_dir="/tmp/himan_ba", label_nc=35, ngf=64,
        n_downsample_global=3, n_blocks_global=4, fineSize=128,
    )
    b2m = create_model(b2m_opt)
    b2 = synthetic_box2mask_batch(rng, bs, size=128, label_nc=35)
    b2 = {k: jnp.asarray(v) for k, v in b2.items()}
    params2 = jax.jit(lambda r: b2m.init_params(r, b2))(jax.random.PRNGKey(0))
    infer2 = jax.jit(lambda p, b: b2m.inference(p, b))
    dt = timeit(lambda: infer2(params2, b2), sync, args.iters)
    print(json.dumps({"metric": "structure_forward_128", "value": round(bs / dt, 2),
                      "unit": "crops/sec/chip"}))

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
    print(json.dumps({"metric": "two_step_edit_512x256", "value": round(bs / dt, 2),
                      "unit": "edits/sec/chip"}))


if __name__ == "__main__":
    main()
