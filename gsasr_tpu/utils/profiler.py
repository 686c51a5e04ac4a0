"""Profiling harness.

TPU equivalent of the reference's tooling (SURVEY.md §5): `MyLineProfiler`
(settrace line timing with cuda_sync + memory tracking,
`utils/gs_cuda*/mylineprofiler.py:14-264`) and the benchmark instrumentation
of `inference_paper_benchmark.py:127-156` (sync -> reset peak -> time ->
peak memory).

- StageTimer: named-stage wall timing with `block_until_ready` sync and a
  pretty report (the role of MyLineProfiler's per-line table).
- trace(): context manager around `jax.profiler` emitting an xprof trace
  directory for op-level analysis (the TPU-native deep profile).
- device_memory_stats(): live/peak HBM bytes per device (the
  max_memory_allocated analogue).
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict


class StageTimer:
    """Accumulates wall time per named stage, device-synced."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_value=None):
        import jax

        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            out = holder.get("out", sync_value)
            if out is not None:
                jax.block_until_ready(out)
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def report(self) -> str:
        lines = [f"{'stage':<24}{'calls':>8}{'total_ms':>12}{'avg_ms':>10}"]
        for name, total in sorted(self.totals.items(),
                                  key=lambda kv: -kv[1]):
            n = self.counts[name]
            lines.append(
                f"{name:<24}{n:>8}{total * 1e3:>12.2f}{total / n * 1e3:>10.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> Dict[str, Dict[str, int]]:
    """Per-device live/peak HBM usage in bytes (where supported)."""
    import jax

    stats = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            stats[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use", -1),
                "peak_bytes_in_use": s.get("peak_bytes_in_use", -1),
                "bytes_limit": s.get("bytes_limit", -1),
            }
    return stats
