"""Image-processing ops: batched 2D filtering and USM sharpening.

TPU-native equivalents of the reference `basicsr/utils/img_process_util.py`:
`filter2D` (:7-31, per-sample kernels via grouped conv) and
`usm_sharp`/`USMSharp` (:34-83). Layout is NHWC; filtering maps onto one
`lax.conv_general_dilated` with `feature_group_count = B*C` so XLA tiles it
on the MXU instead of a python loop.
"""

from __future__ import annotations


import jax.numpy as jnp
from jax import lax


def gaussian_kernel1d(ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    """cv2.getGaussianKernel semantics: sigma<=0 derives it from ksize as
    0.3*((ksize-1)*0.5 - 1) + 0.8, and cv2 additionally uses a bit-exact
    fixed-point table in that case — so delegate to cv2 when present
    (host-side, construction time only) and fall back to the analytic
    formula otherwise."""
    try:
        import cv2
        return jnp.asarray(
            cv2.getGaussianKernel(ksize, sigma).ravel().astype("float32"))
    except ImportError:
        pass
    if sigma <= 0:
        sigma = 0.3 * ((ksize - 1) * 0.5 - 1) + 0.8
    x = jnp.arange(ksize, dtype=jnp.float32) - (ksize - 1) / 2.0
    k = jnp.exp(-(x * x) / (2.0 * sigma * sigma))
    return k / jnp.sum(k)


def gaussian_kernel2d(ksize: int, sigma: float = 0.0) -> jnp.ndarray:
    k = gaussian_kernel1d(ksize, sigma)
    return jnp.outer(k, k)


def filter2D(img: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """Correlate each sample with its own 2D kernel.

    Args:
        img: (B, H, W, C) NHWC.
        kernel: (k, k), (1, k, k) shared, or (B, k, k) per-sample.

    Matches the reference's reflect padding (odd k only,
    `img_process_util.py:16-19`); cv2/torch 'reflect' is reflect-101,
    which is jnp.pad mode='reflect'.
    """
    if kernel.ndim == 2:
        kernel = kernel[None]
    k = kernel.shape[-1]
    if k % 2 != 1:
        raise ValueError("kernel size must be odd")
    b, h, w, c = img.shape
    pad = k // 2
    img = jnp.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                  mode="reflect")
    if kernel.shape[0] == 1:
        kb = jnp.broadcast_to(kernel, (b, k, k))
    else:
        kb = kernel
    # (B, H', W', C) -> (1, H', W', B*C) grouped depthwise conv.
    x = jnp.moveaxis(img, 0, -2).reshape(1, h + 2 * pad, w + 2 * pad, b * c)
    # rhs (k, k, 1, B*C): output channel (b, c) uses kernel b.
    rhs = jnp.repeat(kb, c, axis=0)              # (B*C, k, k)
    rhs = jnp.transpose(rhs, (1, 2, 0))[:, :, None, :]
    out = lax.conv_general_dilated(
        x, rhs, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=b * c)
    return jnp.moveaxis(out.reshape(h, w, b, c), 2, 0)


def usm_sharp(img: jnp.ndarray, weight: float = 0.5, radius: int = 50,
              threshold: float = 10.0) -> jnp.ndarray:
    """Unsharp-mask sharpening (`img_process_util.py:34-83`).

    Args:
        img: (B, H, W, C) or (H, W, C), float32 in [0, 1].
    """
    squeeze = img.ndim == 3
    if squeeze:
        img = img[None]
    if radius % 2 == 0:
        radius += 1
    kernel = gaussian_kernel2d(radius)[None]
    blur = filter2D(img, kernel)
    residual = img - blur
    mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
    soft_mask = filter2D(mask, kernel)
    sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
    out = soft_mask * sharp + (1.0 - soft_mask) * img
    return out[0] if squeeze else out


class USMSharp:
    """Stateful wrapper mirroring `USMSharp(torch.nn.Module)`
    (`img_process_util.py:63-83`): precomputes the Gaussian kernel once."""

    def __init__(self, radius: int = 50, sigma: float = 0.0):
        if radius % 2 == 0:
            radius += 1
        self.radius = radius
        self.kernel = gaussian_kernel2d(radius, sigma)[None]

    def __call__(self, img, weight: float = 0.5, threshold: float = 10.0):
        blur = filter2D(img, self.kernel)
        residual = img - blur
        mask = (jnp.abs(residual) * 255.0 > threshold).astype(img.dtype)
        soft_mask = filter2D(mask, self.kernel)
        sharp = jnp.clip(img + weight * residual, 0.0, 1.0)
        return soft_mask * sharp + (1.0 - soft_mask) * img


