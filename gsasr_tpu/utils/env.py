"""Runtime environment helpers."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None):
    """Enable JAX's persistent compilation cache.

    On the axon-tunneled TPU, every XLA compile is a remote round-trip
    taking 10-90s; the persistent cache makes repeat runs (benchmarks,
    CLIs, restarted training) start in seconds.
    """
    import jax

    path = path or os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                  os.path.expanduser("~/.cache/jax_comp"))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
