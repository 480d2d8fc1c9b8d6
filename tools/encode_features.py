"""Offline instance-feature encoding + clustering (pix2pixHD's
encode_features / precompute step, SURVEY C15): run the trained Encoder
over the train set and write the per-class cluster-center npy consumed by
``--cluster_path`` at test time.

Usage:
  python tools/encode_features.py --name mask2image_city \
      --dataroot ./datasets/cityscapes --n_clusters 10 \
      --out features_clustered_010.npy
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        MaskToImageTrainOptions,
        parse_cli,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.loader import (
        CreateDataLoader,
    )
    from neurips18_hierchical_image_manipulation_tpu.eval.features import (
        cluster_features,
        encode_dataset_features,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )
    from neurips18_hierchical_image_manipulation_tpu.cli.mask2image_test import (
        restore_params,
    )

    import argparse

    extra = argparse.ArgumentParser(add_help=False)
    extra.add_argument("--out", default="features_clustered_010.npy")
    ns, rest = extra.parse_known_args()

    opt = parse_cli(MaskToImageTrainOptions, rest)
    opt.instance_feat = True
    loader = CreateDataLoader(opt)
    model = create_model(opt)

    first = next(iter(loader))
    batch = {k: jnp.asarray(v) for k, v in first.items() if not isinstance(v, list)}
    params = restore_params(opt, model, batch)

    feats = encode_dataset_features(model, params, loader)
    clusters = cluster_features(feats, opt.label_nc, opt.n_clusters, opt.feat_num)
    np.save(ns.out, clusters)
    print(
        f"wrote {ns.out}: {clusters.shape} centers from "
        f"{sum(len(v) for v in feats.values())} instances"
    )


if __name__ == "__main__":
    main()
