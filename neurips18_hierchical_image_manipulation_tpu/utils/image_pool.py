"""Fake-image replay buffer (SURVEY.md C20: util/image_pool.py [L]).

Host-side buffer of generated samples for the discriminator. pix2pixHD's
default is ``pool_size=0`` (passthrough) — kept as the default here, where
the entire train step stays on-device; with pool_size>0 the pool runs on
host between jitted steps (a documented divergence: the D-vs-pooled-fake
loss is then computed by a second jitted D-only step — see
train/loop.py).
"""

from __future__ import annotations

import numpy as np


class ImagePool:
    def __init__(self, pool_size: int, seed: int = 0):
        self.pool_size = pool_size
        self.images = []
        self.rng = np.random.RandomState(seed)

    def query(self, images):
        """images: (B,H,W,C) host array of fakes. Returns same-shape array
        mixing fresh fakes with replayed ones (50/50 once full)."""
        if self.pool_size == 0:
            return images
        images = np.asarray(images)
        out = []
        for image in images:
            if len(self.images) < self.pool_size:
                self.images.append(image.copy())
                out.append(image)
            elif self.rng.uniform() > 0.5:
                idx = self.rng.randint(0, self.pool_size)
                out.append(self.images[idx].copy())
                self.images[idx] = image.copy()
            else:
                out.append(image)
        return np.stack(out)
