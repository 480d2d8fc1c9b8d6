"""Two-step joint-inference driver (SURVEY.md C26, §4.4): loads both stage
checkpoints and runs add/remove/swap edits over the test set, dumping an
HTML gallery of (original, completed layout, edited photo) triplets.

Usage:
  python -m neurips18_hierchical_image_manipulation_tpu.cli.two_step_demo \
      --name demo --b2m_name b2m_city --m2i_name m2i_city \
      --dataroot ./datasets/cityscapes --edit add --cls 26
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax.numpy as jnp
import numpy as np

from ..configs.options import (
    BoxToMaskTestOptions,
    MaskToImageTestOptions,
    _setup_jax_compile_cache,
)
from ..data.cityscapes import AlignedDataset
from ..data.bbox import bboxes_from_instance_map
from ..eval.two_step import TwoStepPipeline
from ..models.factory import create_model
from ..utils import html as html_mod
from ..utils.imaging import save_image, tensor2im, tensor2label
from .mask2image_test import restore_params


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--name", default="two_step_demo")
    p.add_argument("--b2m_name", default="box2mask_city")
    p.add_argument("--m2i_name", default="mask2image_city")
    p.add_argument("--checkpoints_dir", default="./checkpoints")
    p.add_argument("--results_dir", default="./results")
    p.add_argument("--dataroot", default="./datasets/cityscapes")
    p.add_argument("--edit", choices=["add", "remove", "swap"], default="add")
    p.add_argument("--cls", type=int, default=26, help="class for add/swap")
    p.add_argument("--how_many", type=int, default=8)
    p.add_argument("--label_nc", type=int, default=35)
    p.add_argument("--fineSize_b2m", type=int, default=128)
    p.add_argument("--fineSize_m2i", type=int, default=256)
    p.add_argument("--loadSize", type=int, default=512)
    args = p.parse_args(argv)
    # the two-step chain is the longest compile in the repo (8-18 min over
    # the axon tunnel) — the persistent cache matters most here
    _setup_jax_compile_cache()

    def stage_opt(cls_, name, fine_size, **kw):
        """Build stage options, adopting the TRAINED run's architecture
        from its saved config.json (ngf / depths / label_nc / fineSize)
        so demo-time models match the checkpoints."""
        opt = cls_(
            name=name, checkpoints_dir=args.checkpoints_dir,
            dataroot=args.dataroot, label_nc=args.label_nc,
            fineSize=fine_size, **kw,
        )
        cfg_path = os.path.join(args.checkpoints_dir, name, "config.json")
        if os.path.exists(cfg_path):
            import json

            cfg = json.load(open(cfg_path))
            # dtype adopted too (round 4): a bf16-trained stage demos on
            # the perf precision tier, same as its training ran
            for k in ("ngf", "n_downsample_global", "n_blocks_global",
                      "label_nc", "fineSize", "norm", "netG", "no_instance",
                      "n_local_enhancers", "n_blocks_local", "dtype"):
                if k in cfg and hasattr(opt, k):
                    setattr(opt, k, cfg[k])
            print(f"[{name}] adopted architecture from {cfg_path}")
        return opt

    b2m_opt = stage_opt(BoxToMaskTestOptions, args.b2m_name, args.fineSize_b2m)
    m2i_opt = stage_opt(
        MaskToImageTestOptions, args.m2i_name, args.fineSize_m2i,
        use_masked_image=True,
    )
    b2m = create_model(b2m_opt)
    m2i = create_model(m2i_opt)

    # dataset: full scenes + their object boxes
    scene_opt = dataclasses.replace(
        m2i_opt, resize_or_crop="scale_width", loadSize=args.loadSize
    )
    scenes = AlignedDataset(scene_opt)

    from ..data.synthetic import synthetic_batch, synthetic_box2mask_batch

    rng = np.random.RandomState(0)
    bb = synthetic_box2mask_batch(rng, 1, size=b2m_opt.fineSize, label_nc=b2m_opt.label_nc)
    bb = {k: jnp.asarray(v) for k, v in bb.items()}
    b2m_params = restore_params(b2m_opt, b2m, bb)
    mb = synthetic_batch(rng, 1, hw=(m2i_opt.fineSize, m2i_opt.fineSize),
                         label_nc=m2i_opt.label_nc)
    mb = {k: jnp.asarray(v) for k, v in mb.items()}
    m2i_params = restore_params(m2i_opt, m2i, mb)

    pipe = TwoStepPipeline(b2m, b2m_params, m2i, m2i_params)

    web_dir = os.path.join(args.results_dir, args.name)
    webpage = html_mod.HTML(web_dir, f"two-step {args.edit} demo")

    done = 0
    for idx in range(len(scenes)):
        s = scenes[idx]
        recs = bboxes_from_instance_map(s["inst"], min_size=16)
        if not recs:
            continue
        rec = recs[0]
        image = jnp.asarray(s["image"][None])
        label = jnp.asarray(s["label"][None])
        inst = jnp.asarray(s["inst"][None])
        boxes = jnp.asarray(np.asarray(rec["bbox"], np.float32)[None])
        cls = jnp.asarray([args.cls if args.edit != "remove" else 0], jnp.int32)

        if args.edit == "add":
            out = pipe.add_object(image, label, inst, boxes, cls)
        elif args.edit == "remove":
            out = pipe.remove_object(image, label, inst, boxes)
        else:
            new_boxes = boxes.at[:, 1].add(50.0)
            out = pipe.swap_object(image, label, inst, boxes, new_boxes, cls)

        visuals = {
            "original": tensor2im(np.asarray(image[0])),
            "input_label": tensor2label(np.asarray(label[0]), args.label_nc),
            "completed_label": tensor2label(
                np.asarray(out["completed_label"][0]), args.label_nc
            ),
            "edited": tensor2im(np.asarray(out["edited_image"][0])),
        }
        name = os.path.splitext(os.path.basename(s["path"]))[0]
        webpage.add_header(f"{name} [{args.edit}]")
        ims, txts, links = [], [], []
        for k, v in visuals.items():
            fn = f"{name}_{k}.png"
            save_image(v, os.path.join(webpage.get_image_dir(), fn))
            ims.append(fn); txts.append(k); links.append(fn)
        webpage.add_images(ims, txts, links)
        done += 1
        if done >= args.how_many:
            break
    webpage.save()
    print(f"wrote {done} edits to {web_dir}")


if __name__ == "__main__":
    main()
