"""Blur-kernel and noise degradations.

Equivalent of `TrainTestGSASR/basicsr/data/degradations.py` (Real-ESRGAN
style; present in the framework inventory though unused by the GSASR
configs, SURVEY.md §2.4): isotropic/anisotropic Gaussian kernels,
generalized Gaussian, plateau kernels, sinc filters, random mixed-kernel
sampling, and Gaussian/Poisson noise injection.

All numpy, host-side (degradations run in the data pipeline).
"""

from __future__ import annotations

import math
import random
from typing import Sequence

import numpy as np


def _mesh(size: int):
    ax = np.arange(size) - size // 2
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], axis=-1).astype(np.float64)  # (k, k, 2)


def _sigma_matrix(sig_x: float, sig_y: float, theta: float):
    d = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]])
    u = np.array([[math.cos(theta), -math.sin(theta)],
                  [math.sin(theta), math.cos(theta)]])
    return u @ d @ u.T


def bivariate_gaussian(kernel_size: int, sig_x: float, sig_y: float = None,
                       theta: float = 0.0, isotropic: bool = True):
    """(An)isotropic Gaussian kernel, L1-normalized."""
    if isotropic:
        sig_y, theta = sig_x, 0.0
    grid = _mesh(kernel_size)
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta))
    k = np.exp(-0.5 * np.einsum("...i,ij,...j->...", grid, inv, grid))
    return k / k.sum()


def bivariate_generalized_gaussian(kernel_size: int, sig_x: float,
                                   sig_y: float = None, theta: float = 0.0,
                                   beta: float = 1.0, isotropic: bool = True):
    """exp(-(q/2)^beta) with q the Mahalanobis quadratic."""
    if isotropic:
        sig_y, theta = sig_x, 0.0
    grid = _mesh(kernel_size)
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta))
    q = np.einsum("...i,ij,...j->...", grid, inv, grid)
    k = np.exp(-0.5 * np.power(q, beta))
    return k / k.sum()


def bivariate_plateau(kernel_size: int, sig_x: float, sig_y: float = None,
                      theta: float = 0.0, beta: float = 1.0,
                      isotropic: bool = True):
    """1 / (1 + q^beta) plateau-shaped kernel."""
    if isotropic:
        sig_y, theta = sig_x, 0.0
    grid = _mesh(kernel_size)
    inv = np.linalg.inv(_sigma_matrix(sig_x, sig_y, theta))
    q = np.einsum("...i,ij,...j->...", grid, inv, grid)
    k = 1.0 / (1.0 + np.power(q, beta))
    return k / k.sum()


def circular_lowpass_kernel(cutoff: float, kernel_size: int,
                            pad_to: int = 0):
    """2D sinc filter (`degradations.py` sinc path)."""
    assert kernel_size % 2 == 1
    from scipy.special import j1

    ax = np.arange(kernel_size) - (kernel_size - 1) / 2
    xx, yy = np.meshgrid(ax, ax)
    r = np.sqrt(xx ** 2 + yy ** 2)
    with np.errstate(divide="ignore", invalid="ignore"):
        k = cutoff * j1(cutoff * r) / (2 * math.pi * r)
    k[(kernel_size - 1) // 2, (kernel_size - 1) // 2] = cutoff ** 2 / (
        4 * math.pi)
    k = k / k.sum()
    if pad_to > kernel_size:
        pad = (pad_to - kernel_size) // 2
        k = np.pad(k, ((pad, pad), (pad, pad)))
    return k


def random_mixed_kernels(kernel_list: Sequence[str],
                         kernel_prob: Sequence[float], kernel_size: int,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-math.pi, math.pi),
                         betag_range=(0.5, 8), betap_range=(0.5, 8),
                         rng: random.Random = None):
    """Sample one kernel from the Real-ESRGAN kernel pool."""
    rng = rng or random
    kind = rng.choices(list(kernel_list), list(kernel_prob))[0]
    sx = rng.uniform(*sigma_x_range)
    sy = rng.uniform(*sigma_y_range)
    th = rng.uniform(*rotation_range)
    if kind == "iso":
        return bivariate_gaussian(kernel_size, sx, isotropic=True)
    if kind == "aniso":
        return bivariate_gaussian(kernel_size, sx, sy, th, isotropic=False)
    if kind == "generalized_iso":
        return bivariate_generalized_gaussian(
            kernel_size, sx, beta=rng.uniform(*betag_range), isotropic=True)
    if kind == "generalized_aniso":
        return bivariate_generalized_gaussian(
            kernel_size, sx, sy, th, beta=rng.uniform(*betag_range),
            isotropic=False)
    if kind == "plateau_iso":
        return bivariate_plateau(kernel_size, sx,
                                 beta=rng.uniform(*betap_range),
                                 isotropic=True)
    if kind == "plateau_aniso":
        return bivariate_plateau(kernel_size, sx, sy, th,
                                 beta=rng.uniform(*betap_range),
                                 isotropic=False)
    raise ValueError(kind)


def apply_kernel(img: np.ndarray, kernel: np.ndarray):
    """Convolve HWC image with a 2D kernel (reflect padding)."""
    from scipy.ndimage import convolve

    out = np.empty_like(img)
    for c in range(img.shape[2]):
        out[..., c] = convolve(img[..., c], kernel, mode="reflect")
    return out


def random_add_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0.0,
                              rng: random.Random = None):
    rng = rng or random
    sigma = rng.uniform(*sigma_range) / 255.0
    g = np.random.default_rng(rng.randrange(1 << 31))
    if rng.random() < gray_prob:
        noise = g.normal(0, sigma, img.shape[:2])[..., None]
    else:
        noise = g.normal(0, sigma, img.shape)
    return np.clip(img + noise, 0, 1).astype(np.float32)


def random_add_poisson_noise(img, scale_range=(0.05, 3), gray_prob=0.0,
                             rng: random.Random = None):
    rng = rng or random
    scale = rng.uniform(*scale_range)
    g = np.random.default_rng(rng.randrange(1 << 31))
    src = img if rng.random() >= gray_prob else np.mean(
        img, axis=2, keepdims=True)
    vals = 10 ** np.ceil(np.log10(len(np.unique((src * 255).astype(int)))
                                  + 1))
    noisy = g.poisson(src * vals) / vals
    noise = (noisy - src) * scale
    return np.clip(img + noise, 0, 1).astype(np.float32)


def jpeg_compression(img, quality: int):
    """JPEG round-trip via cv2 (the reference's DiffJPEG is a differentiable
    approximation used only for on-GPU training augmentation; our data
    pipeline degrades on host where real JPEG is exact)."""
    import cv2

    q = int(quality)
    ok, enc = cv2.imencode(".jpg", (img[:, :, ::-1] * 255).astype(np.uint8),
                           [cv2.IMWRITE_JPEG_QUALITY, q])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    return dec[:, :, ::-1].astype(np.float32) / 255.0
