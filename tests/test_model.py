"""End-to-end sr_forward tests with tiny models (CPU)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny():
    from gsasr_tpu.models import EDSRNOUP, Fea2GS

    enc = EDSRNOUP(num_feat=8, num_block=1)
    dec = Fea2GS(inchannel=8, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4)
    rng = jax.random.PRNGKey(0)
    ep = enc.init(rng, jnp.zeros((1, 4, 4, 3)))["params"]
    dp = dec.init(rng, jnp.zeros((1, 4, 4, 8)), jnp.ones((1,)))["params"]
    return enc, dec, ep, dp


@pytest.mark.parametrize("hw,scale", [
    ((12, 16), 2.0), ((10, 13), 3.3),
    # BASELINE.json arbitrary-scale configs: fractional x6.5, large x12
    ((8, 9), 6.5), ((6, 7), 12.0),
])
def test_sr_forward_shapes(tiny, rng, hw, scale):
    from gsasr_tpu.model import sr_forward

    enc, dec, ep, dp = tiny
    lq = jnp.asarray(rng.random((1, *hw, 3), dtype=np.float32))
    out = sr_forward(enc, dec, ep, dp, lq, scale, denominator=4, dmax=0.5)
    want = (math.floor(hw[0] * scale), math.floor(hw[1] * scale))
    assert out.shape == (1, *want, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pad_to_denominator():
    from gsasr_tpu.model import pad_to_denominator

    x = jnp.ones((1, 10, 13, 3))
    padded, orig = pad_to_denominator(x, 4)
    assert padded.shape == (1, 12, 16, 3)
    assert orig == (10, 13)
    # already aligned: no-op
    y = jnp.ones((1, 8, 8, 3))
    p2, _ = pad_to_denominator(y, 4)
    assert p2.shape == y.shape


def test_sr_forward_fused_matches(tiny, rng):
    from gsasr_tpu.model import sr_forward

    enc, dec, ep, dp = tiny
    lq = jnp.asarray(rng.random((1, 8, 8, 3), dtype=np.float32))
    a = sr_forward(enc, dec, ep, dp, lq, 2.0, denominator=4, dmax=0.5)
    b = sr_forward(enc, dec, ep, dp, lq, 2.0, denominator=4, dmax=0.5,
                   fused=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)
