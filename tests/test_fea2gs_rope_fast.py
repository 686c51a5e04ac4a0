"""Fused Enhanced-decoder fast-path parity: `fea2gs_rope_apply_fused` must
reproduce `Fea2GSRopeAMP.apply` on the same parameter tree (kernels in
interpret mode on CPU). Covers shifted + unshifted layers, in-kernel RoPE
rotations, block-tail lattice convs, conv_final + long residual and the
head/UPNet tail. Reference: `/root/reference/utils/fea2gsropeamp.py:518-719`.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("b,hw", [(1, 8), (2, 12)])
def test_fused_rope_decoder_matches_module(b, hw):
    from gsasr_tpu.models.fea2gs_rope import Fea2GSRopeAMP
    from gsasr_tpu.models.fea2gs_rope_fast import fea2gs_rope_apply_fused

    m = Fea2GSRopeAMP(inchannel=8, channel=32, num_heads=4,
                      num_crossattn_blocks=1, num_crossattn_layers=2,
                      num_selfattn_blocks=2, num_selfattn_layers=2,
                      num_gs_seed=16, window_size=4)
    rng = np.random.default_rng(0)
    srcs = jnp.asarray(rng.random((b, hw, hw, 8), dtype=np.float32))
    scale = jnp.asarray(rng.uniform(1.5, 4.0, (b,)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), srcs, scale)["params"]

    ref = m.apply({"params": params}, srcs, scale)
    out = fea2gs_rope_apply_fused(m, {"params": params}, srcs, scale)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_rope_default_config_shape():
    """Default Enhanced config (192ch, 6 heads) at trimmed depth."""
    from gsasr_tpu.models.fea2gs_rope import Fea2GSRopeAMP
    from gsasr_tpu.models.fea2gs_rope_fast import fea2gs_rope_apply_fused

    m = Fea2GSRopeAMP(num_selfattn_blocks=2)
    rng = np.random.default_rng(1)
    srcs = jnp.asarray(rng.random((1, 12, 12, 64), dtype=np.float32))
    scale = jnp.full((1,), 3.0, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), srcs, scale)["params"]
    ref = m.apply({"params": params}, srcs, scale)
    out = fea2gs_rope_apply_fused(m, {"params": params}, srcs, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)


def test_fused_rope_bf16_trunk_close():
    """bf16 trunk + fp32 heads stays within bf16 tolerance of fp32."""
    from gsasr_tpu.models.fea2gs_rope import Fea2GSRopeAMP
    from gsasr_tpu.models.fea2gs_rope_fast import fea2gs_rope_apply_fused

    m = Fea2GSRopeAMP(inchannel=8, channel=32, num_heads=4,
                      num_crossattn_blocks=1, num_crossattn_layers=2,
                      num_selfattn_blocks=1, num_selfattn_layers=2,
                      num_gs_seed=16, window_size=4)
    rng = np.random.default_rng(2)
    srcs = jnp.asarray(rng.random((1, 8, 8, 8), dtype=np.float32))
    scale = jnp.full((1,), 2.0, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), srcs, scale)["params"]
    ref = fea2gs_rope_apply_fused(m, {"params": params}, srcs, scale)
    out = fea2gs_rope_apply_fused(m, {"params": params}, srcs, scale,
                                  dtype=jnp.bfloat16)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=0.1, atol=0.06)
