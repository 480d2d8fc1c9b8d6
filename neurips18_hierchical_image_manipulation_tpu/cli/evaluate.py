"""Parity evaluation driver (SURVEY.md §6.5 / BASELINE.md metrics):

  * box2mask: layout mIoU + in-box segmentation consistency between
    predicted and GT layouts over the test split.
  * mask2image: FID between generated and real images (feature extractor
    = VGG19 taps; inject converted Inception/VGG weights via
    --feature_params for paper-comparable numbers).

Usage:
  python -m ...cli.evaluate --stage box2mask --name box2mask_city ...
  python -m ...cli.evaluate --stage mask2image --name mask2image_city ...
"""

from __future__ import annotations

import argparse
import json

import numpy as np

import jax
import jax.numpy as jnp

from ..configs.options import BoxToMaskTestOptions, MaskToImageTestOptions, parse_cli
from ..data.loader import CreateDataLoader
from ..eval.metrics import (
    FIDEvaluator,
    layout_miou,
    segmentation_consistency,
    vgg_pool_features,
)
from ..models.factory import create_model
from .mask2image_test import restore_params


def eval_box2mask(argv=None):
    opt = parse_cli(BoxToMaskTestOptions, argv)
    loader = CreateDataLoader(opt)
    model = create_model(opt)
    fwd = jax.jit(lambda p, b: model.inference(p, b))
    params = None
    mious, consis = [], []
    n = 0
    for host_batch in loader:
        batch = {k: jnp.asarray(v) for k, v in host_batch.items() if not isinstance(v, list)}
        if params is None:
            params = restore_params(opt, model, batch)
        merged, _ = fwd(params, batch)
        pred = np.asarray(jnp.argmax(merged, axis=-1))
        gt = host_batch["gt_layout"]
        mious.append(layout_miou(pred, gt, opt.label_nc))
        consis.append(segmentation_consistency(pred, gt, host_batch["boxmask"]))
        n += pred.shape[0]
        if n >= opt.how_many:
            break
    result = {
        "metric": "layout_miou",
        "value": float(np.mean(mious)),
        "segmentation_consistency": float(np.mean(consis)),
        "samples": n,
    }
    print(json.dumps(result))
    return result


def eval_mask2image(argv=None, feature_params_path=None):
    opt = parse_cli(MaskToImageTestOptions, argv)
    loader = CreateDataLoader(opt)
    model = create_model(opt)
    fwd = jax.jit(lambda p, b: model.inference(p, b))

    from ..models.networks import Vgg19Features

    vgg = Vgg19Features()
    params = None
    fid_eval = None
    n = 0
    for host_batch in loader:
        batch = {k: jnp.asarray(v) for k, v in host_batch.items() if not isinstance(v, list)}
        if params is None:
            params = restore_params(opt, model, batch)
            vgg_params = vgg.init(jax.random.PRNGKey(0), batch["image"][:1])
            if feature_params_path:
                from ..utils.checkpoint import load_params_npz

                vgg_params = load_params_npz(feature_params_path, vgg_params)
            fid_eval = FIDEvaluator(vgg_pool_features(vgg, vgg_params), 512)
        fake = fwd(params, batch)
        fid_eval.update(real_images=batch["image"], fake_images=fake)
        n += int(fake.shape[0])
        if n >= opt.how_many:
            break
    result = {"metric": "fid_vgg", "value": fid_eval.compute(), "samples": n}
    print(json.dumps(result))
    return result


def main(argv=None):
    p = argparse.ArgumentParser(add_help=False)
    p.add_argument("--stage", choices=["box2mask", "mask2image"], required=True)
    p.add_argument("--feature_params", default="")
    ns, rest = p.parse_known_args(argv)
    if ns.stage == "box2mask":
        return eval_box2mask(rest)
    return eval_mask2image(rest, feature_params_path=ns.feature_params or None)


if __name__ == "__main__":
    main()
