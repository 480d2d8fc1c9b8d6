"""Data-loader factory (SURVEY.md C5: CreateDataLoader [L]).

Batches dataset samples into stacked numpy NHWC arrays with background
thread prefetch (the TPU host pipeline analogue of torch DataLoader
workers — on this 1-core host threads only hide PIL decode latency, the
heavy math is all on-device). ``shuffle = not serial_batches``.
"""

from __future__ import annotations

import queue
import threading
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
    def __init__(self, dataset, batch_size=1, shuffle=True, seed=0,
                 drop_last=True, prefetch=2, num_threads=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.num_threads = max(1, num_threads)
        self.rng = np.random.RandomState(seed)

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

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        batches = list(self._index_batches())

        def worker():
            for batch_idx in batches:
                q.put(_collate([self.dataset[int(i)] for i in batch_idx]))
            q.put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is None:
                return
            yield item


def CreateDataLoader(opt, records=None):
    """opt.model selects the dataset family (aligned vs bbox-crop)."""
    if getattr(opt, "model", "pix2pixHD") == "box2mask" or getattr(
        opt, "use_bbox_dataset", False
    ):
        from .bbox import BboxCropDataset

        ds = BboxCropDataset(opt, records=records)
    else:
        from .cityscapes import AlignedDataset

        ds = AlignedDataset(opt)
    return DataLoader(
        ds,
        batch_size=opt.batchSize,
        shuffle=not opt.serial_batches,
        seed=getattr(opt, "seed", 0),
        num_threads=opt.nThreads,
    )
