"""Grain-backed host input pipeline (SURVEY.md §4.5: "this whole path
becomes a tf.data/grain host pipeline feeding device arrays").

Alternative backend to the thread-pool ``DataLoader`` (data/loader.py),
selected with ``--data_backend grain``. Wraps the SAME map-style datasets
(AlignedDataset / BboxCropDataset are pure numpy+PIL, so they pickle into
grain worker processes cleanly) in a ``grain.MapDataset`` chain:

    source(dataset) -> seed -> [shuffle] -> batch(collate)

and iterates it through grain's Dataset API. What grain adds over the
thread loader:

* **Checkpointable iteration** — every epoch iterator exposes
  ``get_state()/set_state()`` (grain's OSS iterator-checkpoint contract),
  so mid-epoch resume can restore the exact sampler position instead of
  the train loop's skip-N replay (train/loop.py). Round-trip covered in
  tests/test_data.py.
* **Process-parallel decode** — ``--grain_workers N`` fans
  ``__getitem__`` out to N worker processes via ``mp_prefetch``
  (true parallelism, no GIL). Default 0: this axon host has ONE core
  (see configs/options.py device_prefetch note), so extra processes only
  thrash; the lever exists for real multi-core TPU hosts.
* Deterministic per-epoch reshuffle from ``seed(base_seed + epoch)``
  with no shared mutable RNG (same contract as DataLoader: dataset
  augmentation seeds derive from (epoch, index) via ``set_epoch``).

Throughput note: on THIS host the winning input path remains
``--device_resident_data`` (upload once, gather on-chip — see
STATUS.md); grain is the idiomatic host-pipeline option for hosts where
CPU decode, not the axon H2D tunnel, is the bottleneck.
"""

from __future__ import annotations

from typing import Dict, Iterator

import numpy as np

# single batch-format definition for both backends (loader.py only
# imports this module lazily inside CreateDataLoader — no cycle)
from .loader import _collate


class GrainLoader:
    """grain.MapDataset-backed loader with the DataLoader interface
    (``__len__`` / ``__iter__`` / ``first_batch``)."""

    def __init__(self, dataset, batch_size=1, shuffle=True, seed=0,
                 drop_last=True, num_workers=0, per_worker_buffer=2):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.num_workers = max(0, int(num_workers))
        self.per_worker_buffer = max(1, int(per_worker_buffer))
        self._epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def first_batch(self) -> Dict[str, np.ndarray]:
        """One batch for model init, loaded synchronously — consumes no
        shuffle/epoch state (the reference peeks the loader for init
        shapes only)."""
        n = min(self.batch_size, len(self.dataset))
        return _collate([self.dataset[i] for i in range(n)])

    def _build_epoch(self, epoch: int):
        import grain

        if hasattr(self.dataset, "set_epoch"):
            # set BEFORE source() so worker processes inherit the epoch
            # (augmentation seeds are (epoch, index)-pure, so any copy of
            # the dataset object yields identical samples)
            self.dataset.set_epoch(epoch)
        ds = grain.MapDataset.source(self.dataset).seed(self.seed + epoch)
        if self.shuffle:
            ds = ds.shuffle()
        ds = ds.batch(
            self.batch_size, drop_remainder=self.drop_last, batch_fn=_collate
        )
        it_ds = ds.to_iter_dataset()
        if self.num_workers > 0:
            it_ds = it_ds.mp_prefetch(
                grain.MultiprocessingOptions(
                    num_workers=self.num_workers,
                    per_worker_buffer_size=self.per_worker_buffer,
                )
            )
        return it_ds

    def epoch_iterator(self, epoch: int):
        """A grain DatasetIterator for one epoch — supports
        ``get_state()`` / ``set_state()`` for exact mid-epoch resume."""
        return iter(self._build_epoch(epoch))

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        epoch = self._epoch
        self._epoch += 1
        return self.epoch_iterator(epoch)
