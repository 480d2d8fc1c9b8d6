"""Inject pretrained VGG19 weights into the flax Vgg19Features module.

The environment has no torchvision and no network (SURVEY.md §8 "VGG19
weights"), so the perceptual loss runs with random-init VGG by default.
When pretrained weights ARE available (e.g. the harness provides a
torchvision ``vgg19-dcbb9e9d.pth`` or a safetensors export), this tool
converts them to the npz layout of models/networks.py::Vgg19Features:

  VGG/params/conv{b}_{c}/kernel|bias   (b=block 1..5, c=conv-in-block)

torchvision ``features`` indices of the convs:
  block1: 0, 2 | block2: 5, 7 | block3: 10,12,14,16
  block4: 19,21,23,25 | block5: 28,30,32,34

Usage:
  python tools/load_vgg_weights.py --pth vgg19.pth --out vgg_params.npz
"""

from __future__ import annotations

import argparse

import numpy as np

TORCHVISION_CONV_INDICES = {
    (1, 1): 0, (1, 2): 2,
    (2, 1): 5, (2, 2): 7,
    (3, 1): 10, (3, 2): 12, (3, 3): 14, (3, 4): 16,
    (4, 1): 19, (4, 2): 21, (4, 3): 23, (4, 4): 25,
    (5, 1): 28, (5, 2): 30, (5, 3): 32, (5, 4): 34,
}


def convert_vgg19_state_dict(sd, prefix="features"):
    flat = {}
    for (b, c), idx in TORCHVISION_CONV_INDICES.items():
        w = np.asarray(sd[f"{prefix}.{idx}.weight"]).transpose(2, 3, 1, 0)
        bb = np.asarray(sd[f"{prefix}.{idx}.bias"])
        flat[f"VGG/params/conv{b}_{c}/kernel"] = np.ascontiguousarray(w)
        flat[f"VGG/params/conv{b}_{c}/bias"] = bb
    return flat


def main():
    import torch

    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    sd = torch.load(args.pth, map_location="cpu", weights_only=True)
    sd = {k: (v.numpy() if hasattr(v, "numpy") else v) for k, v in sd.items()}
    flat = convert_vgg19_state_dict(sd)
    np.savez(args.out, **flat)
    print(f"wrote {len(flat)} arrays to {args.out}")


if __name__ == "__main__":
    main()
