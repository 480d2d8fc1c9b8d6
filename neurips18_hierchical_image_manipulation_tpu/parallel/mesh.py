"""Device-mesh utilities (SURVEY.md §3.5/§6.8).

The framework's parallelism is a 1-D data mesh: params replicated, batch
sharded, psum gradient allreduce over ICI (train/steps.py). TP/PP/SP are
deliberately absent — the reference's models are <50M-param convnets where
DP is the whole story (SURVEY §3.5 table); a spatial-sharding escape hatch
for >2K resolutions is sketched in SURVEY §6.7 and out of scope.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_data_mesh(opt=None, n_devices: int = 0, batch_size: int = 0):
    """Build the 1-D 'data' mesh, or return None when sharding is not
    applicable (single device, or batch not divisible by device count —
    we then shrink to the largest divisor)."""
    if opt is not None:
        n_devices = n_devices or getattr(opt, "mesh_devices", 0)
        batch_size = batch_size or getattr(opt, "batchSize", 0)
    devs = jax.devices()
    n = n_devices or len(devs)
    n = min(n, len(devs))
    if batch_size:
        while n > 1 and batch_size % n != 0:
            n -= 1
    if n <= 1:
        return None
    return Mesh(np.array(devs[:n]), ("data",))
