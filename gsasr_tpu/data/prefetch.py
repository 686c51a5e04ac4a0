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
    """Wraps a host-batch iterator; overlaps device transfer with compute."""

    def __init__(self, batch_iter: Iterator, sharding=None, depth: int = 2):
        self._iter = batch_iter
        self._sharding = sharding
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._done = object()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        import jax

        try:
            for batch in self._iter:
                if self._sharding is not None:
                    batch = {k: jax.device_put(v, self._sharding)
                             for k, v in batch.items()}
                else:
                    batch = {k: jax.device_put(v) for k, v in batch.items()}
                self._q.put(batch)
        finally:
            self._q.put(self._done)

    def __iter__(self):
        while True:
            item = self._q.get()
            if item is self._done:
                return
            yield item
