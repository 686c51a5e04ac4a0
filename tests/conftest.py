"""Test configuration: run everything on a virtual 8-device CPU platform.

The reference has no pytest suite (verification was ad-hoc check/profile
scripts, see SURVEY.md §4); this suite is the test pyramid the TPU build
adds.  Sharding logic is exercised on 8 virtual CPU devices via XLA_FLAGS;
Pallas kernels run in interpreter mode on CPU (see
gsasr_tpu/ops/rasterizer.py:_interpret).
"""

import os

# Force CPU (the session env pins JAX to the axon TPU tunnel via a
# sitecustomize hook that sets jax_platforms="axon,cpu" in jax.config, so the
# env var alone is not enough; parity tolerances assume fp32 CPU math).
# Set GSASR_TEST_TPU=1 to run the suite on hardware instead.
if os.environ.get("GSASR_TEST_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # On hardware, force full-precision matmuls so the dense reference
    # renderer (einsum) meets the parity tolerances.
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")
    from gsasr_tpu.utils.env import enable_compilation_cache

    enable_compilation_cache()
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
