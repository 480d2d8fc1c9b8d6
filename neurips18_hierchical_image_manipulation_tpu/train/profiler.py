"""Tracing / profiling (SURVEY.md §6.1 — the reference has none; rebuild
uses jax.profiler traces + a block_until_ready throughput harness for the
images/sec/chip headline metric)."""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (view with tensorboard-plugin-profile).
    No-op when logdir is falsy."""
    if not logdir:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Images/sec/chip over a sliding window of train steps."""

    def __init__(self, batch_size: int, n_chips: int = 1, window: int = 50):
        self.batch_size = batch_size
        self.n_chips = max(n_chips, 1)
        self.window = window
        self._t0 = None
        self._count = 0
        self.value = 0.0

    def tick(self):
        now = time.perf_counter()
        if self._t0 is None:
            self._t0 = now
            return self.value
        self._count += 1
        if self._count >= self.window:
            dt = now - self._t0
            self.value = self.batch_size * self._count / dt / self.n_chips
            self._t0 = now
            self._count = 0
        return self.value


def measure_steps(step_fn, state, batch, iters=20, sync_fetch=None):
    """Timed step loop with a hard device sync via a scalar fetch (the axon
    backend's block_until_ready on donated buffers does not synchronize —
    fetching a metric value does)."""
    state, metrics, _ = step_fn(state, batch)
    _ = float((sync_fetch or (lambda m: next(iter(m.values()))))(metrics))
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics, _ = step_fn(state, batch)
    _ = float((sync_fetch or (lambda m: next(iter(m.values()))))(metrics))
    dt = time.perf_counter() - t0
    return state, dt / iters
