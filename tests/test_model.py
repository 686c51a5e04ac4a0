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


def test_bf16_decoder_fp32_heads(rng):
    """bf16-trunk decoders emit fp32 Gaussian parameters by default
    (fp32_heads — BENCH_NOTES r4 measured -1.1 to -1.4 dB from bf16 head
    outputs); fp32_heads=False reproduces the all-bf16 autocast behavior."""
    from gsasr_tpu.models import Fea2GS

    kw = dict(inchannel=8, channel=24, num_heads=6, num_crossattn_blocks=1,
              num_crossattn_layers=2, num_selfattn_blocks=1,
              num_selfattn_layers=2, num_gs_seed=16, window_size=4)
    feat = jnp.asarray(rng.random((1, 8, 8, 8), dtype=np.float32))
    scale = jnp.full((1,), 2.0)

    dec32 = Fea2GS(dtype=jnp.float32, **kw)
    params = dec32.init(jax.random.PRNGKey(0), feat, scale)["params"]

    dec_bf = Fea2GS(dtype=jnp.bfloat16, **kw)
    out_bf = dec_bf.apply({"params": params}, feat, scale)
    assert out_bf.dtype == jnp.float32  # heads kept fp32

    dec_bf_all = Fea2GS(dtype=jnp.bfloat16, fp32_heads=False, **kw)
    out_all = dec_bf_all.apply({"params": params}, feat, scale)
    assert out_all.dtype == jnp.bfloat16

    # fp32 heads track the fp32 model's output closer than bf16 heads do
    out_32 = dec32.apply({"params": params}, feat, scale)
    err_heads = float(jnp.abs(out_bf - out_32).mean())
    err_all = float(jnp.abs(out_all.astype(jnp.float32) - out_32).mean())
    assert err_heads <= err_all
