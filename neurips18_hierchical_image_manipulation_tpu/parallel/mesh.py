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


def make_hybrid_data_mesh(n_slices: int, n_devices: int = 0):
    """2-D data-parallel mesh ('dcn', 'data') for multi-slice jobs: the
    leading axis crosses slice boundaries (gradient allreduce rides DCN),
    the trailing axis stays intra-slice (ICI). On real multi-slice
    hardware ``mesh_utils.create_hybrid_device_mesh`` orders devices so
    each 'data' row is one slice; on flat single-slice/CPU device sets
    (no slice_index attribute) a plain reshape gives the same logical
    mesh for testing. Batch shards over BOTH axes — use
    ``train/steps.make_dp_train_step(..., axis=('dcn', 'data'))``.
    SURVEY §6.8 "multi-host future via jax.distributed + DCN collectives".
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    n = min(n, len(devs))
    assert n_slices >= 1 and n % n_slices == 0, (n, n_slices)
    per_slice = n // n_slices
    if getattr(devs[0], "slice_index", None) is not None:
        # real multi-slice topology: let mesh_utils order devices so each
        # 'data' row stays within one slice. Errors here are real
        # misconfigurations (e.g. n_slices not matching the actual slice
        # count) and must propagate — a reshape fallback would silently
        # route the per-step allreduce across DCN on the ICI axis.
        from jax.experimental import mesh_utils

        arr = mesh_utils.create_hybrid_device_mesh(
            (1, per_slice), (n_slices, 1), devices=devs[:n]
        )
    else:
        # flat device set (single slice / CPU / virtual): no slice
        # topology to respect — logical reshape gives the same mesh shape
        # for testing the multi-axis sharding
        arr = np.array(devs[:n]).reshape(n_slices, per_slice)
    return Mesh(arr, ("dcn", "data"))


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
