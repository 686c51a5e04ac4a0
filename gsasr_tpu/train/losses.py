"""Training losses.

Mirrors `basicsr/losses/basic_loss.py`: L1/MSE/Charbonnier with 'mean'
reduction and loss_weight. GSASR configs use L1 only
(`options/train/paper/*.yml: pixel_opt: type: L1Loss`), optionally + SSIM.

The reference computes the loss per-sample on the crop to gt_size
(`gsasr_model.py:227-242`); on TPU we render on a padded canvas and use a
validity mask, which is mathematically the masked mean below.
"""

from __future__ import annotations

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
