"""Offline bbox preprocessing (SURVEY.md C9): scan a Cityscapes-layout
dataroot's ``{phase}_inst`` instance maps and write ``{phase}_bboxes.json``
— the per-object records the BboxCropDataset trains from. Uses the C++
one-pass scanner (native/dataio.cpp).

Usage:
  python tools/preprocess_city_bboxes.py --dataroot ./datasets/cityscapes \
      --phase train --min_box_size 16
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
from PIL import Image


def main():
    from neurips18_hierchical_image_manipulation_tpu.data.bbox import (
        bboxes_from_instance_map,
        save_bbox_records,
    )
    from neurips18_hierchical_image_manipulation_tpu.data.image_folder import (
        make_dataset,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--dataroot", required=True)
    p.add_argument("--phase", default="train")
    p.add_argument("--min_box_size", type=int, default=16)
    p.add_argument("--max_box_size", type=int, default=10_000)
    args = p.parse_args()

    inst_paths = make_dataset(os.path.join(args.dataroot, f"{args.phase}_inst"))
    records = []
    for idx, path in enumerate(inst_paths):
        inst = np.asarray(Image.open(path), np.int32)
        if inst.ndim == 3:
            inst = inst[..., 0]
        for rec in bboxes_from_instance_map(inst, args.min_box_size, args.max_box_size):
            rec["image_index"] = idx
            records.append(rec)
        if (idx + 1) % 100 == 0:
            print(f"{idx + 1}/{len(inst_paths)} images, {len(records)} objects")

    out = os.path.join(args.dataroot, f"{args.phase}_bboxes.json")
    save_bbox_records(records, out)
    print(f"wrote {len(records)} object records to {out}")


if __name__ == "__main__":
    main()
