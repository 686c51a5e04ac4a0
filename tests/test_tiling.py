"""Tiled inference tests (split_and_joint_image)."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_models():
    import jax
    import jax.numpy as jnp
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


@pytest.mark.parametrize("scale", [2.0, 2.5])
def test_split_and_joint_shapes(tiny_models, rng, scale):
    import jax.numpy as jnp
    from gsasr_tpu.tiling import split_and_joint_image

    enc, dec, ep, dp = tiny_models
    lq = jnp.asarray(rng.random((1, 20, 28, 3), dtype=np.float32))
    split, overlap = 12, 4
    canvas = split_and_joint_image(lq, scale, split, overlap, enc, dec,
                                   ep, dp, crop_size=2, dmax=0.5,
                                   tile_batch=4)
    split_sr = math.ceil(split * scale)
    overlap_sr = math.ceil(overlap * scale)
    th = math.ceil((20 - overlap) / (split - overlap))
    tw = math.ceil((28 - overlap) / (split - overlap))
    want_h = (th - 1) * (split_sr - overlap_sr) + split_sr
    want_w = (tw - 1) * (split_sr - overlap_sr) + split_sr
    assert canvas.shape == (1, want_h, want_w, 3)
    want = (math.floor(20 * scale), math.floor(28 * scale))
    assert canvas.shape[1] >= want[0] and canvas.shape[2] >= want[1]
    assert np.isfinite(canvas).all()
    # most of the crop region must be written (seam logic leaves no holes
    # away from the trailing clamp rows)
    crop = canvas[0, :want[0], :want[1]]
    assert (np.abs(crop).sum(axis=-1) > 0).mean() > 0.9
