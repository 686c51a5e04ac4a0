"""Training losses.

Mirrors `basicsr/losses/basic_loss.py`: L1/MSE/Charbonnier with 'mean'
reduction and loss_weight. GSASR configs use L1 only
(`options/train/paper/*.yml: pixel_opt: type: L1Loss`), optionally + SSIM.

The reference computes the loss per-sample on the crop to gt_size
(`gsasr_model.py:227-242`); on TPU we render on a padded canvas and use a
validity mask, which is mathematically the masked mean below.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def masked_l1(pred, target, mask):
    """Per-sample masked-mean L1, averaged over the batch.

    pred/target: (B, H, W, C); mask: (B, H, W, 1) of {0,1}. Per sample the
    mean runs over mask * C elements (== L1 over the gt_size crop).
    """
    diff = jnp.abs(pred - target) * mask
    c = pred.shape[-1]
    per = diff.sum(axis=(1, 2, 3)) / (mask.sum(axis=(1, 2, 3)) * c + 1e-12)
    return per.mean()


def masked_mse(pred, target, mask):
    diff = jnp.square(pred - target) * mask
    c = pred.shape[-1]
    per = diff.sum(axis=(1, 2, 3)) / (mask.sum(axis=(1, 2, 3)) * c + 1e-12)
    return per.mean()


def masked_charbonnier(pred, target, mask, eps=1e-12):
    diff = jnp.sqrt(jnp.square(pred - target) + eps) * mask
    c = pred.shape[-1]
    per = diff.sum(axis=(1, 2, 3)) / (mask.sum(axis=(1, 2, 3)) * c + 1e-12)
    return per.mean()


def size_mask(h_sizes, w_sizes, hmax: int, wmax: int):
    """(B,) effective sizes -> (B, hmax, wmax, 1) {0,1} masks."""
    rows = jnp.arange(hmax)[None, :, None]
    cols = jnp.arange(wmax)[None, None, :]
    m = (rows < h_sizes[:, None, None]) & (cols < w_sizes[:, None, None])
    return m[..., None].astype(jnp.float32)


# ---------------------------------------------------------------------------
# SSIM loss (pytorch-msssim equivalent, `basic_loss.py:255-263`)
# ---------------------------------------------------------------------------


def _ssim_window(size=11, sigma=1.5):
    xs = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    k = jnp.exp(-(xs ** 2) / (2 * sigma ** 2))
    return k / k.sum()


def ssim(pred, target, data_range=1.0, size=11, sigma=1.5, reduce=True):
    """Mean SSIM over a (B, H, W, C) batch (valid-mode gaussian windows),
    matching pytorch_msssim.ssim(size_average=True). reduce=False returns
    the per-window map (B, H-size+1, W-size+1, C)."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _ssim_window(size, sigma)

    def blur(x):
        # separable valid conv over H then W, per channel
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda m: jnp.convolve(m, k, mode="valid"), 0, img))(x)
        x = jax.vmap(lambda img: jnp.apply_along_axis(
            lambda m: jnp.convolve(m, k, mode="valid"), 1, img))(x)
        return x

    mu1, mu2 = blur(pred), blur(target)
    mu1_sq, mu2_sq, mu12 = mu1 ** 2, mu2 ** 2, mu1 * mu2
    s1 = blur(pred * pred) - mu1_sq
    s2 = blur(target * target) - mu2_sq
    s12 = blur(pred * target) - mu12
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return ssim_map.mean() if reduce else ssim_map


def ssim_loss(pred, target, data_range=1.0):
    """1 - SSIM (`basic_loss.py:255-263`)."""
    return 1.0 - ssim(pred, target, data_range)


def weighted_tv_loss(pred, weight=None):
    """Weighted total-variation loss on (B, H, W, C)
    (`basic_loss.py:119-144`)."""
    def l1(a, b, w):
        d = jnp.abs(a - b)
        if w is not None:
            d = d * w
        return d.mean()

    y_w = None if weight is None else weight[:, :-1, :, :]
    x_w = None if weight is None else weight[:, :, :-1, :]
    return (l1(pred[:, :-1], pred[:, 1:], y_w)
            + l1(pred[:, :, :-1], pred[:, :, 1:], x_w))
