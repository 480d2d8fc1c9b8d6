"""Data-loader factory (SURVEY.md C5: CreateDataLoader [L]).

Batches dataset samples into stacked numpy NHWC arrays with background
thread prefetch (the TPU host pipeline analogue of torch DataLoader
workers — on this 1-core host threads only hide PIL decode latency, the
heavy math is all on-device). ``shuffle = not serial_batches``.
"""

from __future__ import annotations

from collections import deque
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, Iterator, List

import numpy as np


def _collate(samples: List[Dict]) -> Dict[str, np.ndarray]:
    out = {}
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if isinstance(vals[0], str):
            out[key] = vals
        else:
            out[key] = np.stack(vals)
    return out


class DataLoader:
    """Thread-pool prefetching loader.

    ``num_threads`` workers run ``dataset.__getitem__`` concurrently
    (per-SAMPLE futures, so even a single in-flight batch parallelizes);
    at most ``prefetch`` batches are in flight, yielded strictly in order.
    Determinism: datasets must not draw from shared mutable RNG state in
    ``__getitem__`` — augmentation seeds derive from ``(epoch, index)``
    via ``dataset.set_epoch`` (see AlignedDataset), so sample contents are
    independent of worker scheduling.
    """

    def __init__(self, dataset, batch_size=1, shuffle=True, seed=0,
                 drop_last=True, prefetch=2, num_threads=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = max(1, prefetch)
        self.num_threads = max(1, num_threads)
        self.rng = np.random.RandomState(seed)
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def _index_batches(self):
        idx = np.arange(len(self.dataset))
        if self.shuffle:
            self.rng.shuffle(idx)
        nb = len(self)
        for b in range(nb):
            yield idx[b * self.batch_size : (b + 1) * self.batch_size]

    def first_batch(self) -> Dict[str, np.ndarray]:
        """One batch for model init, loaded synchronously — no prefetch
        thread is spawned and no shuffle/epoch state is consumed (the
        reference peeks the loader for init shapes only)."""
        n = min(self.batch_size, len(self.dataset))
        return _collate([self.dataset[i] for i in range(n)])

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if hasattr(self.dataset, "set_epoch"):
            self.dataset.set_epoch(self._epoch)
        self._epoch += 1
        batches = list(self._index_batches())

        with ThreadPoolExecutor(max_workers=self.num_threads) as pool:
            inflight: deque = deque()  # deque of lists of per-sample futures

            def submit(batch_idx):
                inflight.append(
                    [pool.submit(self.dataset.__getitem__, int(i)) for i in batch_idx]
                )

            b = 0
            while b < len(batches) and len(inflight) < self.prefetch:
                submit(batches[b])
                b += 1
            while inflight:
                futs = inflight.popleft()
                if b < len(batches):
                    submit(batches[b])
                    b += 1
                yield _collate([f.result() for f in futs])


def CreateDataLoader(opt, records=None):
    """opt.model selects the dataset family (aligned vs bbox-crop)."""
    # the resident stores materialize label/inst/image planes only;
    # precomputed feature maps would be silently dropped — refuse rather
    # than train without the conditioning the user asked for
    # (--instance_feat WITHOUT --load_features is fine: features are
    # encoded on-device from the resident image/inst planes). ValueError,
    # not assert: the guard must survive python -O. Applies to BOTH
    # dataset families (aligned and bbox-crop).
    if getattr(opt, "device_resident_data", False) and getattr(
        opt, "load_features", False
    ):
        raise ValueError(
            "--device_resident_data does not support --load_features; "
            "drop one of the two (on-the-fly --instance_feat works)"
        )
    if getattr(opt, "model", "pix2pixHD") == "box2mask" or getattr(
        opt, "use_bbox_dataset", False
    ):
        from .bbox import BboxCropDataset

        ds = BboxCropDataset(opt, records=records)
        if getattr(opt, "device_resident_data", False):
            from .device_resident import DeviceResidentBboxLoader

            return DeviceResidentBboxLoader(
                ds,
                batch_size=opt.batchSize,
                shuffle=not opt.serial_batches,
                seed=getattr(opt, "seed", 0),
            )
    else:
        from .cityscapes import AlignedDataset

        ds = AlignedDataset(opt)
        if getattr(opt, "device_resident_data", False):
            # upload-once HBM-resident mode (data/device_resident.py):
            # sidesteps the measured axon H2D collapse; per-step host
            # work is one index-vector put
            from .device_resident import DeviceResidentLoader

            return DeviceResidentLoader(
                ds,
                batch_size=opt.batchSize,
                shuffle=not opt.serial_batches,
                seed=getattr(opt, "seed", 0),
            )
    if getattr(opt, "data_backend", "threads") == "grain":
        from .grain_pipeline import GrainLoader

        return GrainLoader(
            ds,
            batch_size=opt.batchSize,
            shuffle=not opt.serial_batches,
            seed=getattr(opt, "seed", 0),
            num_workers=getattr(opt, "grain_workers", 0),
        )
    return DataLoader(
        ds,
        batch_size=opt.batchSize,
        shuffle=not opt.serial_batches,
        seed=getattr(opt, "seed", 0),
        num_threads=opt.nThreads,
    )
