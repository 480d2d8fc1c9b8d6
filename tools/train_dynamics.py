"""Training-dynamics evidence run (VERDICT r2 next#8).

Real Cityscapes weights/data are unreachable in this zero-egress env, so
this builds a PROCEDURAL but learnable label->RGB world (per-class base
colors + smooth illumination + instance-correlated texture), trains the
flagship mask2image GAN on it for a few thousand 512x256 steps through
the REAL cli driver (checkpoints, HTML gallery, loss log — the whole
UX surface), then renders the loss curves + a gallery contact sheet
into reports/ for committing.

Usage:
  python tools/train_dynamics.py --steps 2000 --out reports/dynamics_r03
"""

from __future__ import annotations

import argparse
import json
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


_BASE_COLORS = {
    7: (96, 96, 96),     # road: gray
    23: (120, 170, 230),  # sky: blue
    21: (60, 130, 60),   # vegetation: green
    26: (170, 40, 40),   # car: red-ish, varied per instance
    11: (150, 120, 90),  # building: tan
}


def _render_rgb(label, inst, illum, tex):
    """RGB as a deterministic function of (layout, illum, texture)."""
    h, w = label.shape
    img = np.zeros((h, w, 3), np.float32)
    for cls, c in _BASE_COLORS.items():
        img[label == cls] = c
    # instance-correlated hue shift for cars
    for k in np.unique(inst[label == 26]):
        m = inst == k
        img[m] += ((int(k) % 7) - 3) * np.asarray([12.0, -6.0, 9.0])
    return np.clip(img + illum + tex, 0, 255).astype(np.uint8)


def synth_scene(rng, h, w, i, n_images, xx=None, paired_car=False):
    """One procedural scene; rng call ORDER is the make_world contract
    (committed dynamics artifacts replay it).

    paired_car=True additionally returns the SAME scene rendered without
    its last-drawn car (which nothing occludes) + that car's box — the
    ground truth pair for the two-step edit metrics: `remove` at car_box
    on the full scene must restore label_pre/img_pre; `add` of class 26
    at car_box on the pre scene must reproduce label/img (eval/
    two_step_metrics.py)."""
    if xx is None:
        xx = np.mgrid[0:h, 0:w][1].astype(np.float32)
    sy, sx = h / 256.0, w / 512.0  # object sizes scale with resolution

    def r(lo, hi, s):
        return int(rng.randint(max(int(lo * s), 2), max(int(hi * s), 3)))

    label = np.full((h, w), 23, np.uint8)  # sky
    horizon = h // 2 + int(rng.randint(-int(20 * sy) - 1, int(20 * sy) + 1))
    label[horizon:] = 7  # road
    # buildings: 2-3 blocks on the horizon
    for _ in range(rng.randint(2, 4)):
        bw_, bh_ = r(60, 140, sx), r(50, 110, sy)
        x0 = int(rng.randint(0, w - bw_))
        label[max(horizon - bh_, 0) : horizon, x0 : x0 + bw_] = 11
    # vegetation strip
    if rng.rand() < 0.7:
        vw = r(30, 80, sx)
        x0 = int(rng.randint(0, w - vw))
        label[max(horizon - 40, 0) : horizon, x0 : x0 + vw] = 21
    inst = label.astype(np.int32) * 1000
    # cars on the road
    label_pre = inst_pre = car_box = None
    n_cars = rng.randint(1, 4)
    for k in range(n_cars):
        ch_, cw_ = r(28, 48, sy), r(48, 90, sx)
        y0 = int(rng.randint(horizon, max(h - ch_, horizon + 1)))
        x0 = int(rng.randint(0, w - cw_))
        if paired_car and k == n_cars - 1:
            label_pre = label.copy()
            inst_pre = inst.copy()
            car_box = (y0, x0, min(ch_, h - y0), min(cw_, w - x0))
        label[y0 : y0 + ch_, x0 : x0 + cw_] = 26
        inst[y0 : y0 + ch_, x0 : x0 + cw_] = 26000 + k
    # smooth illumination + gentle texture (ONE tex draw; pair renders
    # share it so pre/post differ only under the car)
    illum = 24.0 * np.sin(2 * np.pi * (xx / w + i / n_images))[..., None]
    tex = rng.randn(h, w, 1).astype(np.float32) * 4.0
    scene = {
        "label": label,
        "inst": inst,
        "img": _render_rgb(label, inst, illum, tex),
    }
    if paired_car:
        scene.update(
            label_pre=label_pre,
            inst_pre=inst_pre,
            img_pre=_render_rgb(label_pre, inst_pre, illum, tex),
            car_box=car_box,
        )
    return scene


def make_world(root, n_images, hw=(256, 512), seed=0):
    """Scenes where RGB is a (noisy) deterministic function of layout —
    a GAN with enough capacity should drive recon/GAN losses down."""
    rng = np.random.RandomState(seed)
    h, w = hw
    for sub in ("train_label", "train_inst", "train_img"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    xx = np.mgrid[0:h, 0:w][1].astype(np.float32)

    for i in range(n_images):
        s = synth_scene(rng, h, w, i, n_images, xx=xx)

        from PIL import Image as I

        I.fromarray(s["label"]).save(f"{root}/train_label/{i:04d}.png")
        I.fromarray(s["inst"], mode="I").save(f"{root}/train_inst/{i:04d}.png")
        I.fromarray(s["img"]).save(f"{root}/train_img/{i:04d}.png")


def parse_loss_log(path):
    pat = re.compile(r"\(epoch: (\d+), iters: (\d+), time: [\d.]+\)(.*)")
    kv = re.compile(r"(\w+): ([\d.eE+-]+)")
    rows = []
    for line in open(path):
        m = pat.match(line.strip())
        if not m:
            continue
        row = {"epoch": int(m.group(1)), "iters": int(m.group(2))}
        for k, v in kv.findall(m.group(3)):
            row[k] = float(v)
        rows.append(row)
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=2000)
    p.add_argument("--bs", type=int, default=16)
    p.add_argument("--n_images", type=int, default=256)
    p.add_argument("--out", default="reports/dynamics_r03")
    p.add_argument("--dataroot", default="/tmp/himan_dyn_world")
    p.add_argument("--ckpt", default="/tmp/himan_dyn_ckpt")
    p.add_argument("--skip_train", action="store_true",
                   help="only render reports from an existing run")
    p.add_argument("--smoke", action="store_true",
                   help="tiny arch/res for CI (CPU-feasible)")
    p.add_argument("--extra", action="append", default=[],
                   help="extra CLI flag(s) passed through to the train "
                   "driver (repeatable) — e.g. --extra=--instance_feat "
                   "for the Encoder-conditioned dynamics leg")
    p.add_argument("--name", default="dynamics512")
    args = p.parse_args()

    name = args.name
    if not args.skip_train:
        hw = (64, 128) if args.smoke else (256, 512)
        if not os.path.exists(os.path.join(args.dataroot, "train_label")):
            print("building procedural world ...")
            make_world(args.dataroot, args.n_images, hw=hw)
        steps_per_epoch = args.n_images // args.bs
        epochs = max(args.steps // steps_per_epoch, 1)
        shutil.rmtree(os.path.join(args.ckpt, name), ignore_errors=True)
        from neurips18_hierchical_image_manipulation_tpu.cli import mask2image_train

        arch = (
            ["--ngf", "16", "--ndf", "16", "--n_downsample_global", "2",
             "--n_blocks_global", "2", "--num_D", "1", "--n_layers_D", "2",
             "--no_vgg_loss"]
            if args.smoke
            else ["--ngf", "64", "--ndf", "64", "--n_downsample_global", "4",
                  "--n_blocks_global", "9", "--num_D", "2", "--n_layers_D", "3"]
        )
        mask2image_train.main([
            "--name", name, "--dataroot", args.dataroot,
            "--checkpoints_dir", args.ckpt,
            "--label_nc", "35", *arch,
            "--batchSize", str(args.bs),
            "--resize_or_crop", "none", "--no_flip",
            "--no-use_bbox_dataset", "--no-use_masked_image",
            "--uint8_transfer", "--device_resident_data",
            "--dtype", "bfloat16",
            "--niter", str(max(epochs // 2, 1)),
            "--niter_decay", str(epochs - max(epochs // 2, 1)),
            "--print_freq", str(steps_per_epoch),
            "--display_freq", str(10 * steps_per_epoch),
            "--save_epoch_freq", "1000000",
            "--save_latest_freq", "1000000",
            *args.extra,
        ])

    # ---- render the report ----
    run_dir = os.path.join(args.ckpt, name)
    os.makedirs(args.out, exist_ok=True)
    rows = parse_loss_log(os.path.join(run_dir, "loss_log.txt"))
    assert rows, "no loss rows parsed"

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    keys = [k for k in rows[-1] if k not in ("epoch", "iters", "img_per_s_per_chip")]
    xs = np.arange(len(rows))
    fig, axes = plt.subplots(1, 2, figsize=(12, 4))
    for k in sorted(keys):
        ys = [r.get(k, np.nan) for r in rows]
        ax = axes[0] if k.startswith(("G_",)) else axes[1]
        ax.plot(xs, ys, label=k, linewidth=1.2)
    axes[0].set_title("generator losses")
    axes[1].set_title("discriminator losses")
    for ax in axes:
        ax.set_xlabel("print step")
        ax.legend(fontsize=8)
        ax.grid(alpha=0.3)
    fig.suptitle("mask2image 512x256 bf16 training dynamics (procedural world)")
    fig.tight_layout()
    fig.savefig(os.path.join(args.out, "loss_curves.png"), dpi=110)

    # gallery contact sheet from the run's web/images
    from PIL import Image

    imgdir = os.path.join(run_dir, "web", "images")
    files = sorted(os.listdir(imgdir)) if os.path.isdir(imgdir) else []
    synth = [f for f in files if "synthesized" in f]
    picks = synth[:: max(len(synth) // 6, 1)][:6]
    if picks:
        tiles = []
        for f in picks:
            im = Image.open(os.path.join(imgdir, f)).convert("RGB")
            im.thumbnail((256, 128))
            tiles.append(np.asarray(im))
        h = max(t.shape[0] for t in tiles)
        w = max(t.shape[1] for t in tiles)
        sheet = np.zeros((2 * h, 3 * w, 3), np.uint8)
        for j, t in enumerate(tiles):
            r, c = divmod(j, 3)
            sheet[r * h : r * h + t.shape[0], c * w : c * w + t.shape[1]] = t
        Image.fromarray(sheet).save(os.path.join(args.out, "gallery.png"))

    first, last = rows[0], rows[-1]
    summary = {
        "steps_logged": len(rows),
        "first": {k: first.get(k) for k in keys},
        "last": {k: last.get(k) for k in keys},
        "img_per_s_per_chip_last": last.get("img_per_s_per_chip"),
        "finite": all(
            np.isfinite([r.get(k, 0.0) for k in keys]).all() for r in rows
        ),
    }
    with open(os.path.join(args.out, "summary.json"), "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
