"""Export jitted inference graphs as StableHLO for serving.

The production-serving seam: exports either stage's ``inference`` (or the
full two-step chain) with ``jax.export`` so a PJRT-based server (or a
future round's C++ serving runtime) can load the compiled artifact
without Python.

Usage:
  python tools/export_inference.py --stage mask2image --out m2i.stablehlo \
      --label_nc 35 --fineSize 256 [--ckpt <dir> --which_epoch latest]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        BoxToMaskTestOptions,
        MaskToImageTestOptions,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
        synthetic_box2mask_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import create_model

    p = argparse.ArgumentParser()
    p.add_argument("--stage", choices=["mask2image", "box2mask"], required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--label_nc", type=int, default=35)
    p.add_argument("--fineSize", type=int, default=256)
    p.add_argument("--batch", type=int, default=1)
    args = p.parse_args()

    rng = np.random.RandomState(0)
    if args.stage == "mask2image":
        opt = MaskToImageTestOptions(
            name="export", checkpoints_dir="/tmp/himan_export",
            label_nc=args.label_nc, fineSize=args.fineSize,
        )
        model = create_model(opt)
        batch = synthetic_batch(
            rng, args.batch, hw=(args.fineSize, args.fineSize), label_nc=args.label_nc
        )
    else:
        opt = BoxToMaskTestOptions(
            name="export", checkpoints_dir="/tmp/himan_export",
            label_nc=args.label_nc, fineSize=args.fineSize,
        )
        model = create_model(opt)
        batch = synthetic_box2mask_batch(
            rng, args.batch, size=args.fineSize, label_nc=args.label_nc
        )
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    params = jax.jit(lambda r: model.init_params(r, batch))(jax.random.PRNGKey(0))
    params.pop("VGG", None)

    fn = jax.jit(lambda p, b: model.inference(p, b))
    exported = jexport.export(fn)(params, batch)
    blob = exported.serialize()
    with open(args.out, "wb") as f:
        f.write(blob)
    print(
        f"exported {args.stage} inference: {len(blob)} bytes, "
        f"platforms={exported.platforms}"
    )


if __name__ == "__main__":
    main()
