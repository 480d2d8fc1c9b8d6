"""Multi-host bootstrap (SURVEY.md §6.8 "multi-host future").

Single-slice TPU jobs need nothing; on a multi-host slice call
``maybe_initialize()`` before building the mesh — ``jax.distributed``
wires the cross-host PJRT coordination, and the data mesh in
``parallel/mesh.py`` then spans all global devices, with ICI collectives
intra-slice and DCN across slices (XLA inserts both; no custom comm
layer, per the blueprint).
"""

from __future__ import annotations

import os

import jax

_initialized = False


def maybe_initialize(coordinator_address=None, num_processes=None, process_id=None):
    """Idempotent jax.distributed.initialize from args or the standard env
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID). No-op
    for single-process jobs."""
    global _initialized
    if _initialized:
        return False
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    if not coordinator_address:
        return False
    kwargs = {"coordinator_address": coordinator_address}
    num_processes = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if num_processes is not None:
        kwargs["num_processes"] = int(num_processes)
    if process_id is not None:
        kwargs["process_id"] = int(process_id)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return True
