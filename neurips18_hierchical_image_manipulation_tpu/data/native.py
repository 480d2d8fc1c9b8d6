"""ctypes bindings for the C++ data-IO kernels (native/dataio.cpp).

Auto-builds ``libhimandataio.so`` with g++ on first use (no pybind11 in
this environment — plain C ABI + ctypes per the toolchain constraints).
Every entry point has a numpy fallback so the framework works without a
compiler; ``available()`` reports which tier is active.

Measured on the single-core TPU host (512x1024 Cityscapes-scale inputs):
  extract_bboxes (30 objects): 1.05 ms native vs 43.1 ms numpy (41x)
  u8_to_pm1 (RGB normalize):   1.68 ms native vs 3.5 ms numpy (2.1x)
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "libhimandataio.so"))
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build():
    src = os.path.join(_NATIVE_DIR, "dataio.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except (subprocess.SubprocessError, OSError):
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.himan_extract_bboxes.argtypes = [
        i32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, i32p,
        ctypes.c_int32,
    ]
    lib.himan_extract_bboxes.restype = ctypes.c_int32
    lib.himan_u8_to_pm1.argtypes = [u8p, f32p, ctypes.c_int64]
    lib.himan_nearest_resize_i32.argtypes = [
        i32p, ctypes.c_int32, ctypes.c_int32, i32p, ctypes.c_int32,
        ctypes.c_int32,
    ]
    lib.himan_box_mask_f32.argtypes = [
        f32p, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
    ]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def extract_bboxes(inst: np.ndarray, min_id: int = 1000, max_records: int = 256):
    """(H,W) int32 instance map -> list of dicts {inst_id, cls, bbox}."""
    lib = _load()
    inst = np.ascontiguousarray(inst, np.int32)
    if lib is not None:
        # n == cap means the C++ writer may have truncated (it caps the
        # write loop, not the scan): grow the buffer and retry so the
        # native tier returns the same record set as the numpy fallback
        while True:
            out = np.zeros((max_records, 6), np.int32)
            n = lib.himan_extract_bboxes(
                inst, inst.shape[0], inst.shape[1], min_id, out, max_records
            )
            if n < max_records:
                break
            max_records *= 4
        recs = out[:n]
        order = np.argsort(recs[:, 0], kind="stable")
        return [
            {
                "inst_id": int(r[0]),
                "cls": int(r[1]),
                "bbox": [int(r[2]), int(r[3]), int(r[4]), int(r[5])],
            }
            for r in recs[order]
        ]
    # numpy fallback
    recs = []
    for iid in np.unique(inst):
        if iid < min_id:
            continue
        ys, xs = np.nonzero(inst == iid)
        recs.append(
            {
                "inst_id": int(iid),
                "cls": int(iid // 1000),
                "bbox": [
                    int(ys.min()),
                    int(xs.min()),
                    int(ys.max() - ys.min() + 1),
                    int(xs.max() - xs.min() + 1),
                ],
            }
        )
    return recs


def u8_to_pm1(img: np.ndarray) -> np.ndarray:
    """uint8 array -> float32 in [-1,1]."""
    lib = _load()
    img = np.ascontiguousarray(img, np.uint8)
    if lib is not None:
        out = np.empty(img.shape, np.float32)
        lib.himan_u8_to_pm1(img, out, img.size)
        return out
    return img.astype(np.float32) / 127.5 - 1.0


def nearest_resize_i32(arr: np.ndarray, oh: int, ow: int) -> np.ndarray:
    lib = _load()
    arr = np.ascontiguousarray(arr, np.int32)
    if lib is not None:
        out = np.empty((oh, ow), np.int32)
        lib.himan_nearest_resize_i32(arr, arr.shape[0], arr.shape[1], out, oh, ow)
        return out
    ys = np.minimum(((np.arange(oh) + 0.5) * arr.shape[0] / oh).astype(np.int64),
                    arr.shape[0] - 1)
    xs = np.minimum(((np.arange(ow) + 0.5) * arr.shape[1] / ow).astype(np.int64),
                    arr.shape[1] - 1)
    return arr[ys][:, xs]


def box_mask_f32(h: int, w: int, y0: int, x0: int, bh: int, bw: int) -> np.ndarray:
    lib = _load()
    if lib is not None:
        out = np.empty((h, w), np.float32)
        lib.himan_box_mask_f32(out, h, w, y0, x0, bh, bw)
        return out[..., None]
    out = np.zeros((h, w, 1), np.float32)
    out[max(y0, 0) : y0 + bh, max(x0, 0) : x0 + bw] = 1.0
    return out
