"""Host->device double-buffered prefetch (SURVEY §4.5; VERDICT r2 next#2).

The train loop's measured dominant host cost on the 1-core axon host is
the H2D batch transfer (~25 MB/step uint8 at 512x256 bs32 over the
tunnel). ``device_prefetch`` stages the transfer for batch N+1 on a
background thread while step N executes, so transfer and compute
overlap (classic double buffer). JAX device_put/asarray is thread-safe
and async on TPU; the queue depth bounds device-memory held by staged
batches.

New capability vs the reference (torch DataLoader workers overlap host
decode but its train loop still transfers synchronously via .cuda()).
"""

from __future__ import annotations

import queue
import threading
from typing import Callable, Iterable, Iterator, Tuple

_SENTINEL = object()


def device_prefetch(
    host_iter: Iterable,
    put_fn: Callable,
    depth: int = 2,
) -> Iterator[Tuple[object, object]]:
    """Yield ``(put_fn(batch), batch)`` pairs, running ``put_fn`` (the H2D
    staging) up to ``depth`` batches ahead on a worker thread.

    Exceptions in the worker (loader or transfer errors) re-raise at the
    consuming ``next()`` call. ``depth <= 0`` degrades to the synchronous
    path (no thread).
    """
    if depth <= 0:
        for hb in host_iter:
            yield put_fn(hb), hb
        return

    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that aborts when the consumer is gone — a plain
        # q.put would block forever on a full queue after abandonment,
        # leaving a zombie thread staging H2D batches for the rest of
        # the epoch and pinning `depth` device batches
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for hb in host_iter:
                if stop.is_set():
                    return
                if not _put((put_fn(hb), hb)):
                    return
            _put(_SENTINEL)
        except BaseException as e:  # noqa: BLE001 — re-raised on the consumer
            _put(e)

    t = threading.Thread(target=worker, daemon=True, name="himan-h2d-prefetch")
    t.start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        # Stop the worker if the consumer abandons the iterator early
        # (e.g. an exception in the train step), then drain so its
        # in-flight put unblocks.
        stop.set()
        if t.is_alive():
            try:
                while True:
                    q.get_nowait()
            except queue.Empty:
                pass
            t.join(timeout=5.0)
