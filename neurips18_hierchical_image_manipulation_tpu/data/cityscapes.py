"""Aligned (label, inst, img) dataset (SURVEY.md C7: data/aligned_dataset.py
[L]): ``{dataroot}/{phase}_label`` (nearest-resized id maps),
``{phase}_inst``, ``{phase}_img`` — paired transforms, dict samples.

Returns numpy NHWC batches ready for device_put; all tensor math
(one-hot, edges, masking) runs on-device in the models' encode_input.
"""

from __future__ import annotations

import hashlib
import os
from typing import Dict

import numpy as np
from PIL import Image

from .image_folder import make_dataset
from .transforms import apply_transform, get_params, normalize_rgb


def _open_cached(path: str, cache_root: str):
    """Decode-once image open: PNG inflate dominates host time on weak
    TPU-host CPUs (measured 83% host overhead at 512x256 bs32 on a 1-core
    host — tools/bench_loop.py), so the first epoch persists the decoded
    array as an .npy sidecar and later epochs memcpy it back. mtime-keyed;
    falls back to plain decode on any error. New capability vs the
    reference (which re-inflates PNGs every epoch)."""
    try:
        st = os.stat(path)
        # Stable digest (NOT Python hash(), which is salt-randomized per
        # process and would defeat the cache across runs).
        digest = hashlib.md5(os.path.abspath(path).encode()).hexdigest()[:16]
        key = f"{digest}_{int(st.st_mtime)}_{st.st_size}"
        cpath = os.path.join(cache_root, key + ".npz")
        if os.path.exists(cpath):
            with np.load(cpath, allow_pickle=False) as z:
                arr = z["arr"]
                mode = str(z["mode"])
                if mode == "P" and "palette" in z:
                    img = Image.fromarray(arr, "P")
                    img.putpalette(z["palette"].tolist())
                else:
                    img = Image.fromarray(arr, "I" if mode == "I" else None)
                return img
        img = Image.open(path)
        img.load()
        arr = np.asarray(img)
        os.makedirs(cache_root, exist_ok=True)
        tmp = cpath + f".{os.getpid()}.tmp.npz"
        extra = {}
        if img.mode == "P":
            # Preserve the palette so a later .convert('RGB') on the
            # reconstructed image yields true colors, not index grayscale.
            extra["palette"] = np.asarray(img.getpalette(), dtype=np.uint8)
        with open(tmp, "wb") as f:
            np.savez(f, arr=arr, mode=np.str_(img.mode), **extra)
        os.replace(tmp, cpath)
        return img
    except OSError:
        return Image.open(path)


class AlignedDataset:
    def __init__(self, opt):
        self.opt = opt
        self.root = opt.dataroot
        phase = getattr(opt, "phase", "train")

        self.label_paths = make_dataset(
            os.path.join(self.root, f"{phase}_label"), opt.max_dataset_size
        )
        self.inst_paths = None
        if not opt.no_instance:
            self.inst_paths = make_dataset(
                os.path.join(self.root, f"{phase}_inst"), opt.max_dataset_size
            )
        self.image_paths = None
        img_dir = os.path.join(self.root, f"{phase}_img")
        if os.path.isdir(img_dir):
            self.image_paths = make_dataset(img_dir, opt.max_dataset_size)
        self.seed = getattr(opt, "seed", 0)
        self._epoch = 0
        self._cache = (
            os.path.join(self.root, ".decoded_cache")
            if getattr(opt, "decode_cache", False)
            else None
        )

    def _open(self, path):
        if self._cache is not None:
            return _open_cached(path, self._cache)
        return Image.open(path)

    def set_epoch(self, epoch: int) -> None:
        """Augmentation draws are a pure function of (seed, epoch, index) —
        thread-safe under the loader's worker pool and independent of
        scheduling order (no shared mutable RandomState)."""
        self._epoch = int(epoch)

    def _item_rng(self, index: int) -> np.random.RandomState:
        mix = (self.seed + 1) * 2654435761 + self._epoch * 40503 + index * 97
        return np.random.RandomState(mix % (2**31 - 1))

    def __len__(self):
        return len(self.label_paths)

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        label_img = self._open(self.label_paths[index])
        params = get_params(self.opt, label_img.size, self._item_rng(index))

        u8 = getattr(self.opt, "uint8_transfer", False)
        label = apply_transform(label_img, self.opt, params, Image.NEAREST)
        label_ids = np.asarray(label).astype(np.uint8 if u8 else np.int32)
        if label_ids.ndim == 3:
            label_ids = label_ids[..., 0]

        sample = {"label": label_ids, "path": self.label_paths[index]}

        if self.inst_paths is not None:
            inst = apply_transform(
                self._open(self.inst_paths[index]), self.opt, params, Image.NEAREST
            )
            inst_ids = np.asarray(inst).astype(np.uint16 if u8 else np.int32)
            if inst_ids.ndim == 3:
                inst_ids = inst_ids[..., 0]
            sample["inst"] = inst_ids
        else:
            sample["inst"] = np.zeros_like(label_ids)

        if self.image_paths is not None:
            rgb = apply_transform(
                self._open(self.image_paths[index]).convert("RGB"),
                self.opt,
                params,
                Image.BICUBIC,
            )
            arr = np.asarray(rgb)
            sample["image"] = arr if u8 else normalize_rgb(arr)
        return sample
