"""Background-thread batch prefetching.

Equivalent of BasicSR's prefetchers (`basicsr/data/prefetch_dataloader.py`):
- CPUPrefetcher: plain iterator passthrough.
- CUDAPrefetcher (side CUDA stream, :61-123) -> TPU version: a worker thread
  assembles the next numpy batch and `jax.device_put`s it (sharded across
  the data mesh when given) while the current step runs — host->device copy
  overlaps compute, which is what the side-stream achieved on GPU.
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator


class DevicePrefetcher:
    """Wraps a host-batch iterator; overlaps device transfer with compute.

    Pipeline errors propagate: an exception raised inside the worker is
    queued and re-raised in the consumer, so a decode/transfer failure
    fails the train loop loudly (like the reference DataLoader) instead of
    reading as a silent end-of-epoch.
    """

    def __init__(self, batch_iter: Iterator, sharding=None, depth: int = 2):
        self._iter = batch_iter
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        import jax

        multiproc = jax.process_count() > 1

        def put_one(v):
            if self._sharding is None:
                return jax.device_put(v)
            if multiproc:
                # Each host holds only its shard of the global batch;
                # assemble the global array from process-local data
                # (the JAX equivalent of DistributedSampler sharding).
                return jax.make_array_from_process_local_data(
                    self._sharding, v)
            return jax.device_put(v, self._sharding)

        try:
            for batch in self._iter:
                if self._stop.is_set():
                    break
                batch = {k: put_one(v) for k, v in batch.items()}
                self._put(batch)
        except BaseException as e:  # re-raised in __iter__
            self._put(e)
        finally:
            self._put(self._done)

    def _put(self, item):
        # Bounded put that gives up when close() drains concurrently, so the
        # worker never blocks forever on a full queue after early exit.
        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.1)
                return
            except queue.Full:
                continue

    def close(self):
        """Stop the worker and release the wrapped generator (call when
        leaving the epoch loop early, e.g. at total_iter)."""
        self._stop.set()
        while True:  # drain so the worker's pending put unblocks
            try:
                self._q.get_nowait()
            except queue.Empty:
                break
        self._thread.join(timeout=5)
        close = getattr(self._iter, "close", None)
        if close is not None:
            try:
                close()
            except Exception:
                pass

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
