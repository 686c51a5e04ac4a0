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

# ---------------------------------------------------------------------------
# Test tiering (markers declared in pytest.ini):
#   core   — fast essential gate:   pytest -m core          (< 3 min)
#   oracle — executes the mounted torch reference as a numeric oracle
#   slow   — > ~8 s per test (full-size shapes, train loops, subprocesses)
# Default CI tier: pytest -m "not slow"  (< 10 min). Everything: pytest.
# Markers are assigned by module/name lists here so individual files stay
# unannotated unless they need per-test overrides (@pytest.mark.*).
# ---------------------------------------------------------------------------

_ORACLE_MODULES = {
    "test_aux_utils", "test_classic_archs", "test_convert_cli",
    "test_diffjpeg", "test_legacy_ops", "test_matlab_resize",
    "test_metrics_perceptual", "test_model_parity", "test_niqe",
    "test_vgg_perceptual",
}

_SLOW_TESTS = {
    # measured > ~8 s on a clean CPU run (see BENCH_NOTES r3)
    "test_loss_decreases_on_fixed_batch",
    "test_train_step_runs_and_updates",
    "test_sparse_sample_coords_training",
    "test_train_step_with_ssim_loss",
    "test_windowed_backward_matches",
    "test_windowed_backward_overflow_falls_back",
    "test_banded_render_matches_single",
    "test_banded_render_uneven_bands",
    "test_windowed_forward_matches",
    "test_gradients_match_composition",
    "test_sr_forward_fused_matches",
    "test_convert_cli_e2e_pixel_parity",
    "test_convert_cli_infer_roundtrip",
    "test_demo_server_e2e",
    "test_dist_rendezvous_two_procs",
}

_CORE_MODULES = {
    "test_rasterizer", "test_rendering", "test_attention", "test_data",
    "test_trainer", "test_model", "test_tiling", "test_parallel",
    "test_init",
}

# In core modules but too heavy for the < 3 min gate; still in the
# default "not slow" tier.
_NOT_CORE = {
    "test_checkpoint_roundtrip",
    "test_train_step_bf16_amp_family",
    "test_dp_consistency",
    "test_sr_forward_spatial_matches",
    "test_swinlike_trunc_normal",
    "test_linear_default_distribution",
    "test_conv_default_distribution",
    "test_backward_chunked_sorted",
    "test_windowed_backward_bitwise_vs_dense",
    "test_binned_gradients_match",
    "test_binned_overflow_falls_back",
    "test_binned_forward_matches_reference",
    "test_backward_float64_numerical_oracle",
    "test_sr_forward_shapes",
    "test_encoder_plain_torch_default",
    "test_head_outputs_unsaturated",
    "test_render_batch_shapes",
    "test_split_and_joint_shapes",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        mod = item.module.__name__.rsplit(".", 1)[-1]
        name = item.name.split("[")[0]
        if mod in _ORACLE_MODULES:
            item.add_marker(pytest.mark.oracle)
        if name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
        elif mod in _CORE_MODULES and name not in _NOT_CORE:
            item.add_marker(pytest.mark.core)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
