"""Legacy-op parity: upfirdn2d / fused_leaky_relu vs the reference's pure
torch fallbacks; DCN vs a standard conv at zero offset."""

import numpy as np
import pytest

from tests.reference_oracle import import_reference_module, reference_available


def test_fused_leaky_relu():
    import jax.numpy as jnp
    from gsasr_tpu.ops.legacy import fused_leaky_relu

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 4, 8)).astype(np.float32)
    b = rng.normal(size=(8,)).astype(np.float32)
    out = np.asarray(fused_leaky_relu(jnp.array(x), jnp.array(b)))
    ref = np.where(x + b > 0, x + b, 0.2 * (x + b)) * np.sqrt(2)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


@pytest.mark.skipif(not reference_available(), reason="no reference")
@pytest.mark.parametrize("up,down,pad", [(1, 1, (1, 1)), (2, 1, (2, 1)),
                                         (1, 2, (1, 1)), (2, 2, (2, 2))])
def test_upfirdn2d_vs_reference(up, down, pad):
    import torch
    ref = import_reference_module(
        "TrainTestGSASR.basicsr.ops.upfirdn2d.upfirdn2d")
    import jax.numpy as jnp
    from gsasr_tpu.ops.legacy import upfirdn2d

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 3, 9, 11)).astype(np.float32)  # NCHW for torch
    k = rng.normal(size=(4, 4)).astype(np.float32)

    out_ref = ref.upfirdn2d_native(
        torch.tensor(x), torch.tensor(k), up, up, down, down,
        pad[0], pad[1], pad[0], pad[1]).numpy()

    out = upfirdn2d(jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(k),
                    up=up, down=down, pad=pad)
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, out_ref, rtol=1e-4, atol=1e-5)


def test_dcn_zero_offset_equals_conv():
    import jax
    import jax.numpy as jnp
    from gsasr_tpu.ops.legacy import modulated_deform_conv

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(3, 3, 4, 6)).astype(np.float32))
    offset = jnp.zeros((1, 8, 8, 2 * 9))
    mask = jnp.ones((1, 8, 8, 9))
    out = modulated_deform_conv(x, offset, mask, w, padding=1)

    ref = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4,
                               atol=1e-4)
