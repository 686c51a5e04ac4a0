"""Fused decoder fast-path parity: `fea2gs_apply_fused` must reproduce
`Fea2GS.apply` on the same parameter tree (kernels in interpret mode on
CPU). Covers shifted + unshifted layers, multiple blocks/windows and the
full head/UPNet tail."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.mark.parametrize("b,hw", [(1, 8), (2, 12)])
def test_fused_decoder_matches_module(b, hw):
    from gsasr_tpu.models import Fea2GS
    from gsasr_tpu.models.fea2gs_fast import fea2gs_apply_fused

    m = Fea2GS(inchannel=8, channel=24, num_heads=4, num_crossattn_blocks=1,
               num_crossattn_layers=2, num_selfattn_blocks=2,
               num_selfattn_layers=2, num_gs_seed=16, window_size=4)
    rng = np.random.default_rng(0)
    srcs = jnp.asarray(rng.random((b, hw, hw, 8), dtype=np.float32))
    scale = jnp.asarray(rng.uniform(1.5, 4.0, (b,)).astype(np.float32))
    params = m.init(jax.random.PRNGKey(0), srcs, scale)["params"]

    ref = m.apply({"params": params}, srcs, scale)
    out = fea2gs_apply_fused(m, {"params": params}, srcs, scale)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_fused_decoder_default_config_shape():
    """Default-size decoder (180ch, 6 heads, 6x6 self-attn) on a tiny
    spatial extent — structure parity at production channel counts."""
    from gsasr_tpu.models import Fea2GS
    from gsasr_tpu.models.fea2gs_fast import fea2gs_apply_fused

    m = Fea2GS(num_selfattn_blocks=2)  # trimmed depth to keep CPU time sane
    rng = np.random.default_rng(1)
    srcs = jnp.asarray(rng.random((1, 12, 12, 64), dtype=np.float32))
    scale = jnp.full((1,), 3.0, jnp.float32)
    params = m.init(jax.random.PRNGKey(0), srcs, scale)["params"]
    ref = m.apply({"params": params}, srcs, scale)
    out = fea2gs_apply_fused(m, {"params": params}, srcs, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=5e-4, atol=5e-4)
