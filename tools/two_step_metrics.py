"""Quantitative two-step edit gate (VERDICT r4 next#4).

Runs the REAL TwoStepPipeline (both stages restored from CLI-trained
checkpoints, same loading path as cli/two_step_demo.py) over paired
procedural scenes where the ground truth of each edit is KNOWN
(tools/train_dynamics.synth_scene renders every scene with and without
its last-drawn car):

  * remove @ car_box on the full scene   -> completed layout in-box must
    match label_pre (context-restore accuracy)
  * add(cls=26) @ car_box on the pre scene -> completed layout in-box
    must match the full scene's label (in-box accuracy + car-class IoU)
  * all modes: OUTSIDE the edited box the pipeline must be a bit-exact
    passthrough for both the label map and the photo

Writes/merges the numbers into {out}/summary.json; tests/
test_two_step_metrics.py asserts the committed thresholds.

Usage (after tools/train_dynamics_b2m.py + tools/two_step_gallery.py so
both stage checkpoints exist):
  python tools/two_step_metrics.py --ckpt /tmp/himan_dyn_b2m_ckpt \
      --b2m_name dynamics_b2m --m2i_name gallery_m2i \
      --out reports/two_step_r05
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def load_stage(cls_, name, ckpt_dir, fine_size, label_nc, **kw):
    """Stage model + restored params, adopting the trained run's
    architecture from its config.json (the two_step_demo loading path)."""
    import jax.numpy as jnp

    from neurips18_hierchical_image_manipulation_tpu.cli.mask2image_test import (
        restore_params,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.synthetic import (
        synthetic_batch,
        synthetic_box2mask_batch,
    )
    from neurips18_hierchical_image_manipulation_tpu.models.factory import (
        create_model,
    )

    opt = cls_(
        name=name, checkpoints_dir=ckpt_dir, label_nc=label_nc,
        fineSize=fine_size, **kw,
    )
    cfg_path = os.path.join(ckpt_dir, name, "config.json")
    if os.path.exists(cfg_path):
        cfg = json.load(open(cfg_path))
        for k in ("ngf", "n_downsample_global", "n_blocks_global", "label_nc",
                  "fineSize", "norm", "netG", "no_instance",
                  "n_local_enhancers", "n_blocks_local", "dtype"):
            if k in cfg and hasattr(opt, k):
                setattr(opt, k, cfg[k])
    model = create_model(opt)
    rng = np.random.RandomState(0)
    if cls_.__name__.startswith("BoxToMask"):
        bb = synthetic_box2mask_batch(rng, 1, size=opt.fineSize,
                                      label_nc=opt.label_nc)
    else:
        bb = synthetic_batch(rng, 1, hw=(opt.fineSize, opt.fineSize),
                             label_nc=opt.label_nc)
    bb = {k: jnp.asarray(v) for k, v in bb.items()}
    return model, restore_params(opt, model, bb)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", default="/tmp/himan_dyn_b2m_ckpt")
    p.add_argument("--b2m_name", default="dynamics_b2m")
    p.add_argument("--m2i_name", default="gallery_m2i")
    p.add_argument("--n_scenes", type=int, default=8)
    p.add_argument("--hw", default="128x256")
    p.add_argument("--label_nc", type=int, default=35)
    p.add_argument("--out", default="reports/two_step_r05")
    args = p.parse_args(argv)

    from neurips18_hierchical_image_manipulation_tpu.configs.options import (
        BoxToMaskTestOptions,
        MaskToImageTestOptions,
        _setup_jax_compile_cache,
    )

    _setup_jax_compile_cache()

    import jax.numpy as jnp

    from neurips18_hierchical_image_manipulation_tpu.eval import (
        two_step_metrics as m,
    )
    from neurips18_hierchical_image_manipulation_tpu.eval.two_step import (
        TwoStepPipeline,
    )
    from train_dynamics import synth_scene

    b2m, b2m_params = load_stage(
        BoxToMaskTestOptions, args.b2m_name, args.ckpt, 128, args.label_nc
    )
    m2i, m2i_params = load_stage(
        MaskToImageTestOptions, args.m2i_name, args.ckpt, 256, args.label_nc,
        use_masked_image=True,
    )
    pipe = TwoStepPipeline(b2m, b2m_params, m2i, m2i_params)

    h, w = [int(v) for v in args.hw.split("x")]
    rng = np.random.RandomState(7)

    def to_float_img(u8):
        return jnp.asarray(u8[None].astype(np.float32) / 127.5 - 1.0)

    rows = []
    for i in range(args.n_scenes):
        s = synth_scene(rng, h, w, i, args.n_scenes, paired_car=True)
        box = np.asarray(s["car_box"], np.float32)
        boxes = jnp.asarray(box[None])
        cls26 = jnp.asarray([26], jnp.int32)

        # --- remove the car from the full scene; GT = the pre scene ---
        out_rm = pipe.remove_object(
            to_float_img(s["img"]), jnp.asarray(s["label"][None].astype(np.int32)),
            jnp.asarray(s["inst"][None]), boxes,
        )
        rm_label = np.asarray(out_rm["completed_label"][0])
        rm_img = np.asarray(out_rm["edited_image"][0])
        row = {
            "remove_context_restore_acc": m.inbox_accuracy(
                rm_label, s["label_pre"], box
            ),
            "remove_label_passthrough": m.outside_box_max_abs(
                rm_label, s["label"], box
            ),
            "remove_image_passthrough": m.outside_box_max_abs(
                rm_img, np.asarray(to_float_img(s["img"])[0]), box
            ),
        }

        # --- add a car at the same box on the PRE scene; GT = full scene ---
        out_add = pipe.add_object(
            to_float_img(s["img_pre"]),
            jnp.asarray(s["label_pre"][None].astype(np.int32)),
            jnp.asarray(s["inst_pre"][None]), boxes, cls26,
        )
        add_label = np.asarray(out_add["completed_label"][0])
        add_img = np.asarray(out_add["edited_image"][0])
        row.update(
            add_inbox_acc=m.inbox_accuracy(add_label, s["label"], box),
            add_car_iou=m.inbox_class_iou(add_label, s["label"], box, 26),
            add_label_passthrough=m.outside_box_max_abs(
                add_label, s["label_pre"], box
            ),
            add_image_passthrough=m.outside_box_max_abs(
                add_img, np.asarray(to_float_img(s["img_pre"])[0]), box
            ),
        )
        rows.append(row)
        print(f"[metrics] scene {i}: " + json.dumps(
            {k: round(v, 4) for k, v in row.items()}))

    metrics = {}
    for k in rows[0]:
        metrics[k] = m.summarize([r[k] for r in rows])
    report = {
        "n_scenes": args.n_scenes,
        "world": "procedural paired scenes (train_dynamics.synth_scene, "
        "paired_car=True): GT known for both remove (pre-car layout) and "
        "add (the real car's layout)",
        "metrics": metrics,
        "passthrough_basis": "outside_box_max_abs must be exactly 0: the "
        "pipeline composes with jnp.where(box_mask) at full res",
    }
    os.makedirs(args.out, exist_ok=True)
    summary_path = os.path.join(args.out, "summary.json")
    existing = {}
    if os.path.exists(summary_path):
        existing = json.load(open(summary_path))
    existing["edit_metrics"] = report
    with open(summary_path, "w") as f:
        json.dump(existing, f, indent=1)
    print(f"[metrics] wrote {summary_path}")
    print(json.dumps(metrics, indent=1))


if __name__ == "__main__":
    main()
