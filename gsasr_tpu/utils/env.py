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


def get_env_info() -> str:
    """Runtime environment banner — equivalent of the reference's
    `get_env_info` (`basicsr/utils/logger.py:188-213`), reporting the
    TPU-native stack instead of torch/CUDA."""
    import jax

    lines = [f"jax: {jax.__version__}"]
    try:
        import jaxlib
        lines.append(f"jaxlib: {jaxlib.__version__}")
    except Exception:
        pass
    for mod in ("flax", "optax", "orbax.checkpoint"):
        try:
            import importlib
            m = importlib.import_module(mod)
            lines.append(f"{mod}: {getattr(m, '__version__', '?')}")
        except Exception:
            pass
    try:
        devs = jax.devices()
        lines.append(f"backend: {jax.default_backend()} "
                     f"({len(devs)}x {devs[0].device_kind})")
        lines.append(f"process: {jax.process_index()}/{jax.process_count()}")
    except Exception as e:  # device init can fail in restricted envs
        lines.append(f"backend: unavailable ({e})")
    return "\n\t".join(["Environment:"] + lines)
