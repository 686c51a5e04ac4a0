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


def test_paste_tiles_integer_scale_seam_trim():
    """Integer-scale pasting: every non-leading edge is seam-trimmed by
    crop_size; later tiles overwrite earlier ones in the overlap."""
    from gsasr_tpu.tiling import paste_tiles

    th, tw, split, stride, crop = 2, 2, 8, 6, 2
    tiles = np.stack([np.full((split, split, 1), k, np.float32)
                      for k in range(th * tw)])
    canvas = paste_tiles(tiles, th, tw, stride, split, crop,
                         fractional=False)[0, :, :, 0]
    assert canvas.shape == (14, 14)
    # leading tile occupies its full extent until overwritten
    assert canvas[0, 0] == 0
    # tile 1 (row 0, col 1) writes x in [stride+crop, stride+split) = [8,14)
    assert (canvas[0, 6:8] == 0).all() and (canvas[0, 8:] == 1).all()
    # tile 2 (row 1, col 0) writes y in [8, 14)
    assert (canvas[6:8, 0] == 0).all() and (canvas[8:, 0] == 2).all()
    # tile 3 overwrites the corner block [8:14, 8:14]
    assert (canvas[8:, 8:] == 3).all()
    # seam rows between trims keep the earlier tile's values
    assert (canvas[7, 7] == 0)


def test_paste_tiles_fractional_last_column_quirk():
    """Fractional scale: the reference writes last-column INTERIOR-row tiles
    without the vertical seam trim (`split_and_joint_image.py:196-198`);
    first and last rows keep the trim."""
    from gsasr_tpu.tiling import paste_tiles

    th, tw, split, stride, crop = 3, 2, 8, 6, 2
    tiles = np.stack([np.full((split, split, 1), k, np.float32)
                      for k in range(th * tw)])
    canvas = paste_tiles(tiles, th, tw, stride, split, crop,
                         fractional=True)[0, :, :, 0]
    # tile 3 = row 1 (interior), col 1 (last): writes y from y (no +crop),
    # rows [6, 14) in the last-column region; tile 5 then owns [14, 20)
    assert (canvas[6:14, 8:] == 3).all()
    # row 0 last column (tile 1) still trims horizontally only: y0 = 0
    assert (canvas[0, 8:] == 1).all()
    # last row last column (tile 5) trims normally (y0 = 12+crop)
    assert (canvas[14:, 8:] == 5).all()
