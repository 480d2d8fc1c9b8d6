"""Two-step demo gallery as a committed artifact (VERDICT r3 next#8).

Trains BOTH stages through the REAL CLI drivers on the procedural world
(the same world as the dynamics harnesses), then runs the real
cli.two_step_demo for add / remove / swap and copies the HTML galleries
into reports/ — the product-demo UX evidence, same treatment
reports/dynamics_r03 gave training.

Designed to run AFTER tools/train_dynamics_b2m.py so the b2m stage reuses
that run's checkpoint (pass --b2m_ckpt; otherwise a b2m stage is trained
here too). Run solo on the TPU via nohup (axon single-claim rule).

Usage:
  python tools/train_dynamics_b2m.py --steps 600 --out reports/dynamics_b2m_r04
  python tools/two_step_gallery.py --out reports/two_step_r04
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def ensure_test_split(root, n=4):
    """two_step_demo reads the test split; the dynamics world only writes
    train_*. Clone the first n train scenes (identity split is fine for a
    UX gallery — edits are conditioned on GT layout, not memorized RGB)."""
    import glob

    for sub in ("label", "inst", "img"):
        os.makedirs(os.path.join(root, f"test_{sub}"), exist_ok=True)
        srcs = sorted(glob.glob(os.path.join(root, f"train_{sub}", "*")))[:n]
        for s in srcs:
            d = os.path.join(root, f"test_{sub}", os.path.basename(s))
            if not os.path.exists(d):
                shutil.copy(s, d)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--world", default="/tmp/himan_dyn_world_b2m")
    p.add_argument("--ckpt", default="/tmp/himan_dyn_b2m_ckpt")
    p.add_argument("--b2m_name", default="dynamics_b2m")
    p.add_argument("--m2i_name", default="gallery_m2i")
    p.add_argument("--m2i_steps", type=int, default=600)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--out", default="reports/two_step_r04")
    p.add_argument("--how_many", type=int, default=4)
    p.add_argument("--skip_m2i_train", action="store_true")
    args = p.parse_args()

    if not os.path.isdir(os.path.join(args.world, "train_label")):
        from train_dynamics import make_world

        make_world(args.world, 128, hw=(128, 256))
    ensure_test_split(args.world)

    # m2i stage: flagship conditioning (bbox crops + masked RGB) through
    # the real CLI, arch sized like the b2m dynamics stage
    if not args.skip_m2i_train:
        from neurips18_hierchical_image_manipulation_tpu.cli import (
            mask2image_train,
        )

        n_obj = 0
        from neurips18_hierchical_image_manipulation_tpu.configs.options import (
            MaskToImageTrainOptions,
        )

        # count records cheaply via the dataset itself
        probe = MaskToImageTrainOptions(
            name="probe", checkpoints_dir="/tmp/himan_gal_probe",
            dataroot=args.world, label_nc=35, fineSize=64, min_box_size=6,
            resize_or_crop="none", no_flip=True,
        )
        from neurips18_hierchical_image_manipulation_tpu.data.bbox import (
            BboxCropDataset,
        )

        n_obj = len(BboxCropDataset(probe).records)
        spe = max(n_obj // args.bs, 1)
        epochs = max(args.m2i_steps // spe, 2)
        flags = [
            "--name", args.m2i_name,
            "--dataroot", args.world,
            "--checkpoints_dir", args.ckpt,
            "--label_nc", "35", "--ngf", "32", "--ndf", "32",
            "--n_downsample_global", "3", "--n_blocks_global", "3",
            "--num_D", "1", "--n_layers_D", "2",
            "--fineSize", "64", "--min_box_size", "6",
            "--resize_or_crop", "none", "--no_flip",
            "--batchSize", str(args.bs),
            "--device_resident_data",
            "--niter", str(max(epochs // 2, 1)),
            "--niter_decay", str(epochs - max(epochs // 2, 1)),
            "--print_freq", str(spe), "--display_freq", str(20 * spe),
            "--save_epoch_freq", "1000000",
            "--save_latest_freq", "1000000",  # final save only (train loop always writes latest at end)
            "--no_vgg_loss", "--nThreads", "1",
        ]
        print(f"[gallery] training m2i: {n_obj} records, {epochs} epochs")
        mask2image_train.main(flags)

    # the real demo driver, one gallery per edit mode
    from neurips18_hierchical_image_manipulation_tpu.cli import two_step_demo

    os.makedirs(args.out, exist_ok=True)
    results = os.path.join(args.ckpt, "demo_results")
    summary = {}
    for edit in ("add", "remove", "swap"):
        name = f"two_step_{edit}"
        two_step_demo.main([
            "--name", name,
            "--b2m_name", args.b2m_name,
            "--m2i_name", args.m2i_name,
            "--checkpoints_dir", args.ckpt,
            "--results_dir", results,
            "--dataroot", args.world,
            "--edit", edit, "--cls", "26",
            "--how_many", str(args.how_many),
            "--loadSize", "256",
        ])
        src = os.path.join(results, name)
        dst = os.path.join(args.out, name)
        if os.path.isdir(dst):
            shutil.rmtree(dst)
        shutil.copytree(src, dst)
        n_imgs = len(os.listdir(os.path.join(dst, "images")))
        summary[edit] = {"images": n_imgs, "gallery": f"{name}/index.html"}
        print(f"[gallery] {edit}: {n_imgs} images")

    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(
            {
                "world": "procedural label->RGB world (tools/train_dynamics.py)",
                "b2m_ckpt": args.b2m_name,
                "m2i_ckpt": args.m2i_name,
                "edits": summary,
                "driver": "cli/two_step_demo.py (real CLI), one jitted "
                "two-stage program per edit",
            },
            f, indent=1,
        )
    print(f"[gallery] wrote {args.out}")


if __name__ == "__main__":
    main()
