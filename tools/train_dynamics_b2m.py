"""Training-dynamics evidence for the STRUCTURE GENERATOR (box2mask) —
the second model family's analogue of tools/train_dynamics.py.

Trains box2mask through the REAL cli driver on the same procedural world
(cars with instance ids on road/sky scenes), then renders loss curves and
measures layout-mIoU / segmentation-consistency with cli.evaluate twice:
with random init and with the trained checkpoint — the delta is the
learning evidence (real Cityscapes + reference weights are unreachable in
this zero-egress env; see PARITY.md for the turnkey real-parity runbook).

Usage:
  python tools/train_dynamics_b2m.py --steps 800 --out reports/dynamics_b2m_r03 [--cpu]

--cpu forces the CPU backend (must be first device use in the process) —
used when the axon TPU pool is unavailable; the dynamics claim is about
optimization behavior, not device speed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=800)
    p.add_argument("--bs", type=int, default=8)
    p.add_argument("--n_images", type=int, default=128)
    p.add_argument("--out", default="reports/dynamics_b2m_r03")
    p.add_argument("--dataroot", default="/tmp/himan_dyn_world_b2m")
    p.add_argument("--ckpt", default="/tmp/himan_dyn_b2m_ckpt")
    p.add_argument("--cpu", action="store_true")
    p.add_argument("--skip_train", action="store_true")
    args = p.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from train_dynamics import make_world, parse_loss_log

    name = "dynamics_b2m"
    hw = (128, 256)
    # G architecture + dataset flags (valid for train AND test options)
    arch = [
        "--label_nc", "35", "--ngf", "32",
        "--n_downsample_global", "3", "--n_blocks_global", "3",
        "--fineSize", "64", "--min_box_size", "6",
        "--resize_or_crop", "none", "--no_flip",
    ]
    # bg_box_prob: every 4th sample is a null-class background box — the
    # supervision remove-mode reads (see options.py help / box2mask.py)
    train_only = [
        "--ndf", "32", "--num_D", "1", "--n_layers_D", "2",
        "--bg_box_prob", "0.25", "--lambda_ctx_neg", "5.0",
    ]
    if not args.skip_train:
        if not os.path.exists(os.path.join(args.dataroot, "train_label")):
            print("building procedural world ...")
            make_world(args.dataroot, args.n_images, hw=hw)
        from neurips18_hierchical_image_manipulation_tpu.cli import box2mask_train
        from neurips18_hierchical_image_manipulation_tpu.configs.options import (
            BoxToMaskTrainOptions,
        )
        from neurips18_hierchical_image_manipulation_tpu.data.bbox import (
            BboxCropDataset,
        )

        # epochs from the actual object count (multiple boxes per image)
        scan_opt = BoxToMaskTrainOptions(
            dataroot=args.dataroot, fineSize=64, min_box_size=6,
            resize_or_crop="none", no_flip=True,
        )
        n_obj = len(BboxCropDataset(scan_opt))
        steps_per_epoch = max(n_obj // args.bs, 1)
        epochs = max(args.steps // steps_per_epoch, 2)
        shutil.rmtree(os.path.join(args.ckpt, name), ignore_errors=True)
        box2mask_train.main([
            "--name", name, "--dataroot", args.dataroot,
            "--checkpoints_dir", args.ckpt, *arch, *train_only,
            "--batchSize", str(args.bs),
            "--niter", str(max(epochs // 2, 1)),
            "--niter_decay", str(epochs - max(epochs // 2, 1)),
            "--print_freq", str(steps_per_epoch),
            "--display_freq", str(20 * steps_per_epoch),
            "--save_epoch_freq", "1000000",
            "--save_latest_freq", "1000000",  # final save only (train loop always writes latest at end)
        ])

    run_dir = os.path.join(args.ckpt, name)
    os.makedirs(args.out, exist_ok=True)

    # mIoU with the trained checkpoint vs random init (learning evidence)
    from neurips18_hierchical_image_manipulation_tpu.cli import evaluate

    eval_flags = [
        "--name", name, "--dataroot", args.dataroot,
        "--checkpoints_dir", args.ckpt, *arch,
        "--phase", "train", "--how_many", "64",
        "--serial_batches", "--nThreads", "1", "--batchSize", "1",
    ]
    trained = evaluate.main(["--stage", "box2mask"] + eval_flags)
    rand = evaluate.main(
        ["--stage", "box2mask"] + eval_flags + ["--which_epoch", "nonexistent"]
    )

    rows = parse_loss_log(os.path.join(run_dir, "loss_log.txt"))
    assert rows, "no loss rows parsed"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [k for k in rows[-1] if k not in ("epoch", "iters", "img_per_s_per_chip")]
    xs = np.arange(len(rows))
    fig, ax = plt.subplots(figsize=(8, 4.5))
    for k in sorted(keys):
        ax.plot(xs, [r.get(k, np.nan) for r in rows], label=k, linewidth=1.2)
    ax.set_xlabel("print step")
    ax.set_title(
        "box2mask training dynamics (procedural world)\n"
        f"layout mIoU: random {rand['value']:.3f} -> trained {trained['value']:.3f}"
    )
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curves_b2m.png"), dpi=110)

    summary = {
        "steps": args.steps,
        "miou_random_init": rand["value"],
        "miou_trained": trained["value"],
        "seg_consistency_random": rand["segmentation_consistency"],
        "seg_consistency_trained": trained["segmentation_consistency"],
        "final_losses": {k: rows[-1][k] for k in keys},
    }
    with open(os.path.join(args.out, "summary_b2m.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
