"""1024p coarse-to-fine training-dynamics evidence (VERDICT r4 next#3).

Drives the FULL pix2pixHD two-stage recipe through the REAL CLI on the
procedural world at 1024x512:

  1. global stage (GlobalGenerator ngf=64) at 512x256,
  2. --load_pretrain hand-off: the global checkpoint's trunk loads into
     the LocalEnhancer's `global` scope (utils/checkpoint.py
     load_pretrain_into),
  3. local stage (netG local, ngf=32) at 1024x512 with
     --niter_fix_global freezing the trunk for the first epochs.

Renders loss curves + gallery + the loop-level rate for the LOCAL stage
into --out (the artifact VERDICT asks for: the enhancer config had bench
and traces but had never been TRAINED end-to-end on the TPU).

Usage (solo on the TPU, via nohup):
  python tools/train_dynamics_1024p.py --out reports/dynamics_1024p_r05
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

from train_dynamics import make_world, parse_loss_log


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--global_steps", type=int, default=400)
    p.add_argument("--local_steps", type=int, default=400)
    p.add_argument("--global_bs", type=int, default=8)
    p.add_argument("--local_bs", type=int, default=4)
    p.add_argument("--n_images", type=int, default=64)
    p.add_argument("--fix_frac", type=float, default=0.5,
                   help="fraction of local epochs with the global trunk "
                   "frozen (--niter_fix_global)")
    p.add_argument("--out", default="reports/dynamics_1024p_r05")
    p.add_argument("--dataroot", default="/tmp/himan_dyn_world_1024p")
    p.add_argument("--ckpt", default="/tmp/himan_dyn_ckpt_1024p")
    p.add_argument("--skip_global", action="store_true")
    p.add_argument("--skip_local", action="store_true")
    args = p.parse_args()

    if not os.path.exists(os.path.join(args.dataroot, "train_label")):
        print("building 1024x512 procedural world ...")
        make_world(args.dataroot, args.n_images, hw=(512, 1024))

    from neurips18_hierchical_image_manipulation_tpu.cli import mask2image_train

    common = [
        "--dataroot", args.dataroot, "--checkpoints_dir", args.ckpt,
        "--label_nc", "35", "--ndf", "64", "--num_D", "2", "--n_layers_D", "3",
        "--no-use_bbox_dataset", "--no-use_masked_image",
        "--uint8_transfer", "--device_resident_data",
        "--dtype", "bfloat16", "--no_flip",
        "--save_epoch_freq", "1000000",
    ]

    # ---- stage 1: global generator at 512x256 (scale_width 512) ----
    gname = "dyn1024_global"
    spe_g = args.n_images // args.global_bs
    ep_g = max(args.global_steps // spe_g, 2)
    if not args.skip_global:
        shutil.rmtree(os.path.join(args.ckpt, gname), ignore_errors=True)
        mask2image_train.main([
            "--name", gname, *common,
            "--netG", "global", "--ngf", "64",
            "--n_downsample_global", "4", "--n_blocks_global", "9",
            "--resize_or_crop", "scale_width", "--loadSize", "512",
            "--batchSize", str(args.global_bs),
            "--niter", str(max(ep_g // 2, 1)),
            "--niter_decay", str(ep_g - max(ep_g // 2, 1)),
            "--print_freq", str(spe_g),
            "--display_freq", str(10 * spe_g),
            "--save_latest_freq", "1000000",  # final save only (train loop always writes latest at end)
        ])

    # ---- stage 2: LocalEnhancer at 1024x512, trunk handed off ----
    lname = "dyn1024_local"
    spe_l = args.n_images // args.local_bs
    ep_l = max(args.local_steps // spe_l, 2)
    fix = max(int(ep_l * args.fix_frac), 1)
    if not args.skip_local:
        shutil.rmtree(os.path.join(args.ckpt, lname), ignore_errors=True)
        mask2image_train.main([
            "--name", lname, *common,
            "--netG", "local", "--ngf", "32",
            "--n_local_enhancers", "1", "--n_blocks_local", "3",
            "--n_downsample_global", "4", "--n_blocks_global", "9",
            "--resize_or_crop", "none",
            "--load_pretrain", os.path.join(args.ckpt, gname),
            "--niter_fix_global", str(fix),
            "--batchSize", str(args.local_bs),
            "--niter", str(max(ep_l // 2, 1)),
            "--niter_decay", str(ep_l - max(ep_l // 2, 1)),
            "--print_freq", str(spe_l),
            "--display_freq", str(5 * spe_l),
            "--save_latest_freq", "1000000",  # final save only (train loop always writes latest at end)
        ])

    # ---- report: curves + gallery + rates for BOTH stages ----
    os.makedirs(args.out, exist_ok=True)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    summary = {"stages": {}}
    fig, axes = plt.subplots(2, 2, figsize=(13, 8))
    for row, (name, title) in enumerate(
        [(gname, "global 512x256"), (lname, "local (enhancer) 1024x512")]
    ):
        rows = parse_loss_log(os.path.join(args.ckpt, name, "loss_log.txt"))
        assert rows, f"no loss rows for {name}"
        keys = [k for k in rows[-1]
                if k not in ("epoch", "iters", "img_per_s_per_chip")]
        xs = np.arange(len(rows))
        for k in sorted(keys):
            ys = [r.get(k, np.nan) for r in rows]
            ax = axes[row][0] if k.startswith("G_") else axes[row][1]
            ax.plot(xs, ys, label=k, linewidth=1.2)
        axes[row][0].set_title(f"{title}: G losses")
        axes[row][1].set_title(f"{title}: D losses")
        for ax in axes[row]:
            ax.set_xlabel("print step")
            ax.legend(fontsize=7)
            ax.grid(alpha=0.3)
        first, last = rows[0], rows[-1]
        rates = [r["img_per_s_per_chip"] for r in rows
                 if "img_per_s_per_chip" in r]
        summary["stages"][name] = {
            "steps_logged": len(rows),
            "first": {k: first.get(k) for k in keys},
            "last": {k: last.get(k) for k in keys},
            "loop_img_per_s_median": (
                round(float(np.median(rates)), 2) if rates else None
            ),
            "finite": all(
                np.isfinite([r.get(k, 0.0) for k in keys]).all() for r in rows
            ),
        }
        if name == lname and len(rows) > fix:
            # the two optimization phases are distinct claims: while the
            # pretrained trunk is FROZEN (--niter_fix_global) only the
            # enhancer branch trains and the losses should fall from the
            # hand-off point; unfreezing a 45M-param trunk mid-GAN is a
            # known transient (fresh Adam moments + D already warm), so
            # it is reported separately rather than averaged away.
            froz, unfr = rows[:fix], rows[fix:]

            def med(rs, k):
                vs = [r[k] for r in rs if k in r]
                return round(float(np.median(vs)), 3) if vs else None

            summary["stages"][name]["phases"] = {
                "frozen_trunk_epochs": fix,
                "frozen": {k: {"first": froz[0].get(k),
                               "min": round(min(r[k] for r in froz if k in r), 3),
                               "median": med(froz, k)} for k in keys},
                "unfrozen_median": {k: med(unfr, k) for k in keys},
            }
    fig.suptitle("1024p coarse-to-fine dynamics: global -> load_pretrain "
                 f"-> local (niter_fix_global={fix} of {ep_l} epochs)")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curves.png"), dpi=110)

    # gallery contact sheet from the LOCAL stage's web/images
    from PIL import Image

    imgdir = os.path.join(args.ckpt, lname, "web", "images")
    files = sorted(os.listdir(imgdir)) if os.path.isdir(imgdir) else []
    synth = [f for f in files if "synthesized" in f]
    picks = synth[:: max(len(synth) // 6, 1)][:6]
    if picks:
        tiles = []
        for f in picks:
            im = Image.open(os.path.join(imgdir, f)).convert("RGB")
            im.thumbnail((512, 256))
            tiles.append(np.asarray(im))
        h = max(t.shape[0] for t in tiles)
        w = max(t.shape[1] for t in tiles)
        sheet = np.zeros((2 * h, 3 * w, 3), np.uint8)
        for j, t in enumerate(tiles):
            r, c = divmod(j, 3)
            sheet[r * h : r * h + t.shape[0], c * w : c * w + t.shape[1]] = t
        Image.fromarray(sheet).save(os.path.join(args.out, "gallery.png"))

    summary["handoff"] = (
        "stage 2 ran --load_pretrain {}/{} (+--niter_fix_global {}): see "
        "'load_pretrain: N leaves loaded' in the local stage's stdout — "
        "the GlobalGenerator trunk loads into the enhancer's global scope "
        "(utils/checkpoint.load_pretrain_into)".format(args.ckpt, gname, fix)
    )
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
