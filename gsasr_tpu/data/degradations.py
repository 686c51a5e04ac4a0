"""Blur-kernel and noise degradations — full Real-ESRGAN surface.

Equivalent of `TrainTestGSASR/basicsr/data/degradations.py` (present in the
framework inventory though unused by the GSASR configs, SURVEY.md §2.4):

- kernel priors: (an)isotropic Gaussian / generalized Gaussian / plateau,
  2D sinc (circular low-pass), `random_bivariate_*` samplers with optional
  multiplicative kernel noise, `random_mixed_kernels` pool sampling
  (reference `degradations.py:84-386`);
- Gaussian / Poisson noise with the reference's generate/add split and
  clip/rounds output modes (`degradations.py:419-744`), plus the random
  per-call samplers;
- batched device variants (`*_batch`) — the TPU-idiomatic equivalent of the
  reference's `*_pt` torch functions (`degradations.py:460-514, 609-728`):
  NHWC (B, H, W, C) jax arrays, explicit PRNG keys, per-sample sigma/scale
  and gray-noise mixing, so a degradation stage can run inside the jitted
  input pipeline on device;
- JPEG round-trips (`degradations.py:731-764`).

Host functions are numpy (degradations normally run in the data workers);
images are RGB HWC float32 in [0, 1] everywhere in this repo (the
reference's numpy path is BGR via cv2 — grayscale conversions here apply
the same BT.601 weights to the correspondingly-ordered channels).

Randomized samplers take an optional ``rng`` (``random.Random``) so the
dataset's per-position seeding discipline (data/datasets.py) extends to
degradations; the reference uses the global numpy/random state.
"""

from __future__ import annotations

import math
import random
from typing import Optional, Sequence

import numpy as np

# --------------------------------------------------------------------------
# kernel priors
# --------------------------------------------------------------------------


def _mesh(size: int):
    ax = np.arange(size) - size // 2
    xx, yy = np.meshgrid(ax, ax)
    return np.stack([xx, yy], axis=-1).astype(np.float64)  # (k, k, 2)


def mesh_grid(kernel_size: int):
    """Reference `mesh_grid` (`degradations.py:32-47`): returns (grid, xx,
    yy) where grid is (K, K, 2)."""
    ax = np.arange(-kernel_size // 2 + 1.0, kernel_size // 2 + 1.0)
    xx, yy = np.meshgrid(ax, ax)
    grid = np.hstack((xx.reshape(kernel_size * kernel_size, 1),
                      yy.reshape(kernel_size * kernel_size, 1))).reshape(
                          kernel_size, kernel_size, 2)
    return grid, xx, yy


def _sigma_matrix(sig_x: float, sig_y: float, theta: float):
    d = np.array([[sig_x ** 2, 0], [0, sig_y ** 2]])
    u = np.array([[math.cos(theta), -math.sin(theta)],
                  [math.sin(theta), math.cos(theta)]])
    return u @ d @ u.T


# public alias matching the reference name (`degradations.py:16-29`)
sigma_matrix2 = _sigma_matrix


def pdf2(sigma_matrix: np.ndarray, grid: np.ndarray):
    """Un-normalized bivariate Gaussian PDF on `grid` (K, K, 2)
    (`degradations.py:50-63`)."""
    inv = np.linalg.inv(sigma_matrix)
    return np.exp(-0.5 * np.einsum("...i,ij,...j->...", grid, inv, grid))


def cdf2(d_matrix: np.ndarray, grid: np.ndarray):
    """Skewed standard-bivariate-Gaussian CDF (`degradations.py:66-81`),
    used by skewed-Gaussian kernel priors."""
    from scipy.stats import multivariate_normal

    rv = multivariate_normal([0, 0], [[1, 0], [0, 1]])
    return rv.cdf(np.dot(grid, d_matrix))


def bivariate_gaussian(kernel_size: int, sig_x: float, sig_y: float = None,
                       theta: float = 0.0, isotropic: bool = True):
    """(An)isotropic Gaussian kernel, L1-normalized."""
    if isotropic:
        sig_y, theta = sig_x, 0.0
    grid = _mesh(kernel_size)
    k = pdf2(_sigma_matrix(sig_x, sig_y, theta), grid)
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
    """2D sinc filter (`degradations.py:389-416`)."""
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


# --------------------------------------------------------------------------
# random kernel samplers (`degradations.py:176-322`)
# --------------------------------------------------------------------------


def _apply_kernel_noise(kernel, noise_range, rng):
    """Multiplicative kernel noise + renormalize (`degradations.py:211-216`)."""
    if noise_range is not None:
        assert noise_range[0] < noise_range[1], "Wrong noise range."
        g = np.random.default_rng(rng.randrange(1 << 31))
        kernel = kernel * g.uniform(noise_range[0], noise_range[1],
                                    size=kernel.shape)
    return kernel / np.sum(kernel)


def random_bivariate_gaussian(kernel_size: int, sigma_x_range,
                              sigma_y_range=None, rotation_range=None,
                              noise_range=None, isotropic: bool = True,
                              rng: random.Random = None):
    """Random (an)isotropic Gaussian kernel (`degradations.py:176-217`)."""
    assert kernel_size % 2 == 1, "Kernel size must be an odd number."
    rng = rng or random
    sx = rng.uniform(*sigma_x_range)
    if isotropic:
        sy, th = sx, 0.0
    else:
        sy = rng.uniform(*sigma_y_range)
        th = rng.uniform(*rotation_range)
    k = bivariate_gaussian(kernel_size, sx, sy, th, isotropic=isotropic)
    return _apply_kernel_noise(k, noise_range, rng)


def random_bivariate_generalized_gaussian(kernel_size: int, sigma_x_range,
                                          sigma_y_range=None,
                                          rotation_range=None,
                                          beta_range=(0.5, 8),
                                          noise_range=None,
                                          isotropic: bool = True,
                                          rng: random.Random = None):
    """Random generalized-Gaussian kernel (`degradations.py:220-269`).
    Matches the reference's bimodal beta draw (below/above 1)."""
    assert kernel_size % 2 == 1
    rng = rng or random
    sx = rng.uniform(*sigma_x_range)
    if isotropic:
        sy, th = sx, 0.0
    else:
        sy = rng.uniform(*sigma_y_range)
        th = rng.uniform(*rotation_range)
    if rng.random() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    k = bivariate_generalized_gaussian(kernel_size, sx, sy, th, beta,
                                       isotropic=isotropic)
    return _apply_kernel_noise(k, noise_range, rng)


def random_bivariate_plateau(kernel_size: int, sigma_x_range,
                             sigma_y_range=None, rotation_range=None,
                             beta_range=(1, 4), noise_range=None,
                             isotropic: bool = True,
                             rng: random.Random = None):
    """Random plateau kernel (`degradations.py:272-321`)."""
    assert kernel_size % 2 == 1
    rng = rng or random
    sx = rng.uniform(*sigma_x_range)
    if isotropic:
        sy, th = sx, 0.0
    else:
        sy = rng.uniform(*sigma_y_range)
        th = rng.uniform(*rotation_range)
    if rng.random() < 0.5:
        beta = rng.uniform(beta_range[0], 1)
    else:
        beta = rng.uniform(1, beta_range[1])
    k = bivariate_plateau(kernel_size, sx, sy, th, beta,
                          isotropic=isotropic)
    return _apply_kernel_noise(k, noise_range, rng)


def random_mixed_kernels(kernel_list: Sequence[str],
                         kernel_prob: Sequence[float], kernel_size: int = 21,
                         sigma_x_range=(0.6, 5), sigma_y_range=(0.6, 5),
                         rotation_range=(-math.pi, math.pi),
                         betag_range=(0.5, 8), betap_range=(0.5, 8),
                         noise_range=None, rng: random.Random = None):
    """Sample one kernel from the Real-ESRGAN kernel pool
    (`degradations.py:324-386`; plateau kernels never get multiplicative
    noise there — preserved)."""
    rng = rng or random
    kind = rng.choices(list(kernel_list), list(kernel_prob))[0]
    if kind == "iso":
        return random_bivariate_gaussian(
            kernel_size, sigma_x_range, noise_range=noise_range,
            isotropic=True, rng=rng)
    if kind == "aniso":
        return random_bivariate_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            noise_range=noise_range, isotropic=False, rng=rng)
    if kind == "generalized_iso":
        return random_bivariate_generalized_gaussian(
            kernel_size, sigma_x_range, beta_range=betag_range,
            noise_range=noise_range, isotropic=True, rng=rng)
    if kind == "generalized_aniso":
        return random_bivariate_generalized_gaussian(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betag_range, noise_range=noise_range, isotropic=False, rng=rng)
    if kind == "plateau_iso":
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, beta_range=betap_range,
            noise_range=None, isotropic=True, rng=rng)
    if kind == "plateau_aniso":
        return random_bivariate_plateau(
            kernel_size, sigma_x_range, sigma_y_range, rotation_range,
            betap_range, noise_range=None, isotropic=False, rng=rng)
    raise ValueError(kind)


def apply_kernel(img: np.ndarray, kernel: np.ndarray):
    """Convolve HWC image with a 2D kernel (reflect padding)."""
    from scipy.ndimage import convolve

    out = np.empty_like(img)
    for c in range(img.shape[2]):
        out[..., c] = convolve(img[..., c], kernel, mode="reflect")
    return out


# --------------------------------------------------------------------------
# noise: shared output modes
# --------------------------------------------------------------------------


def _finalize(out, clip: bool, rounds: bool, xp=np):
    """The reference's clip/rounds output modes (`degradations.py:449-458`):
    clip+rounds quantizes to uint8 levels, clip alone clamps, rounds alone
    quantizes without clamping."""
    if clip and rounds:
        return xp.clip((out * 255.0).round(), 0, 255) / 255.0
    if clip:
        return xp.clip(out, 0, 1)
    if rounds:
        return (out * 255.0).round() / 255.0
    return out


# --------------------------------------------------------------------------
# Gaussian noise (host / numpy) — `degradations.py:419-533`
# --------------------------------------------------------------------------


def generate_gaussian_noise(img, sigma: float = 10, gray_noise: bool = False,
                            rng: random.Random = None):
    """Noise field for an HWC image; sigma measured in the 255 range."""
    g = (np.random.default_rng(rng.randrange(1 << 31)) if rng is not None
         else np.random.default_rng())
    if gray_noise:
        noise = g.standard_normal(img.shape[:2]).astype(np.float32)
        noise = np.repeat(noise[:, :, None], img.shape[2], axis=2)
    else:
        noise = g.standard_normal(img.shape).astype(np.float32)
    return noise * (sigma / 255.0)


def add_gaussian_noise(img, sigma: float = 10, clip: bool = True,
                       rounds: bool = False, gray_noise: bool = False,
                       rng: random.Random = None):
    noise = generate_gaussian_noise(img, sigma, gray_noise, rng)
    return _finalize(img + noise, clip, rounds).astype(np.float32)


def random_generate_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0.0,
                                   rng: random.Random = None):
    rng = rng or random
    sigma = rng.uniform(*sigma_range)
    return generate_gaussian_noise(img, sigma, rng.random() < gray_prob, rng)


def random_add_gaussian_noise(img, sigma_range=(0, 10), gray_prob=0.0,
                              clip: bool = True, rounds: bool = False,
                              rng: random.Random = None):
    noise = random_generate_gaussian_noise(img, sigma_range, gray_prob, rng)
    return _finalize(img + noise, clip, rounds).astype(np.float32)


# --------------------------------------------------------------------------
# Poisson (shot) noise (host / numpy) — `degradations.py:559-728`
# --------------------------------------------------------------------------


def _poisson_vals(img: np.ndarray) -> float:
    """The scikit-image/skimage convention the reference follows
    (`degradations.py:576-578`): quantize to uint8 levels, count unique
    values, round the count up to a power of two."""
    q = np.clip((img * 255.0).round(), 0, 255) / 255.0
    return float(2 ** np.ceil(np.log2(len(np.unique(q)))))


def _luminance(img: np.ndarray) -> np.ndarray:
    """BT.601 luma of an RGB HWC image (the reference converts with
    cv2.COLOR_BGR2GRAY on BGR data — same weights, matching channels)."""
    return (img[..., 0] * 0.299 + img[..., 1] * 0.587
            + img[..., 2] * 0.114).astype(np.float32)


def generate_poisson_noise(img, scale: float = 1.0,
                           gray_noise: bool = False,
                           rng: random.Random = None):
    g = (np.random.default_rng(rng.randrange(1 << 31)) if rng is not None
         else np.random.default_rng())
    src = _luminance(img) if gray_noise else img
    src = np.clip((src * 255.0).round(), 0, 255) / 255.0
    vals = _poisson_vals(src)
    out = (g.poisson(src * vals) / vals).astype(np.float32)
    noise = out - src
    if gray_noise:
        noise = np.repeat(noise[:, :, None], img.shape[2], axis=2)
    return noise * scale


def add_poisson_noise(img, scale: float = 1.0, clip: bool = True,
                      rounds: bool = False, gray_noise: bool = False,
                      rng: random.Random = None):
    noise = generate_poisson_noise(img, scale, gray_noise, rng)
    return _finalize(img + noise, clip, rounds).astype(np.float32)


def random_generate_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0.0,
                                  rng: random.Random = None):
    rng = rng or random
    scale = rng.uniform(*scale_range)
    return generate_poisson_noise(img, scale, rng.random() < gray_prob, rng)


def random_add_poisson_noise(img, scale_range=(0, 1.0), gray_prob=0.0,
                             clip: bool = True, rounds: bool = False,
                             rng: random.Random = None):
    noise = random_generate_poisson_noise(img, scale_range, gray_prob, rng)
    return _finalize(img + noise, clip, rounds).astype(np.float32)


# --------------------------------------------------------------------------
# batched device variants — TPU equivalents of the `*_pt` torch functions
# --------------------------------------------------------------------------
#
# Layout is NHWC (B, H, W, C) jax arrays in [0, 1]; randomness is an explicit
# jax PRNG key; sigma/scale/gray may be scalars or per-sample (B,) arrays
# (matching the reference's per-sample tensors, `degradations.py:460-490`).
# Everything except the Poisson `vals` count (data-dependent unique count,
# computed host-side exactly like the reference's python loop,
# `degradations.py:634-650`) is jit-compatible.


def _per_sample(x, b):
    import jax.numpy as jnp

    x = jnp.asarray(x, jnp.float32)
    return x.reshape(-1, 1, 1, 1) if x.ndim else jnp.full((b, 1, 1, 1), x)


def generate_gaussian_noise_batch(key, img, sigma=10, gray_noise=0):
    """(B, H, W, C) Gaussian noise field; sigma in the 255 range, scalar or
    (B,). gray_noise is a 0/1 scalar or (B,) blend mask."""
    import jax
    import jax.numpy as jnp

    b, h, w, c = img.shape
    sigma = _per_sample(sigma, b)
    kc, kg = jax.random.split(key)
    noise = jax.random.normal(kc, img.shape, jnp.float32) * sigma / 255.0
    if isinstance(gray_noise, (int, float)) and gray_noise <= 0:
        return noise  # static no-gray: skip the second field entirely
    gray = _per_sample(gray_noise, b)
    noise_g = jax.random.normal(kg, (b, h, w, 1), jnp.float32) * sigma / 255.0
    return noise * (1 - gray) + jnp.broadcast_to(noise_g, img.shape) * gray


def add_gaussian_noise_batch(key, img, sigma=10, gray_noise=0,
                             clip: bool = True, rounds: bool = False):
    import jax.numpy as jnp

    noise = generate_gaussian_noise_batch(key, img, sigma, gray_noise)
    return _finalize(img + noise, clip, rounds, xp=jnp)


def random_add_gaussian_noise_batch(key, img, sigma_range=(0, 1.0),
                                    gray_prob=0.0, clip: bool = True,
                                    rounds: bool = False):
    """Per-sample random sigma + gray decision (`degradations.py:536-556`)."""
    import jax
    import jax.numpy as jnp

    b = img.shape[0]
    ks, kg, kn = jax.random.split(key, 3)
    sigma = jax.random.uniform(ks, (b,), jnp.float32,
                               sigma_range[0], sigma_range[1])
    gray = (jax.random.uniform(kg, (b,)) < gray_prob).astype(jnp.float32)
    noise = generate_gaussian_noise_batch(kn, img, sigma, gray)
    return _finalize(img + noise, clip, rounds, xp=jnp)


def _poisson_vals_batch(img) -> np.ndarray:
    """Per-sample power-of-two unique-value counts, host-side (the
    reference's python loop over the batch, `degradations.py:645-649`)."""
    arr = np.asarray(img)
    q = np.clip((arr * 255.0).round(), 0, 255)
    return np.array([2 ** np.ceil(np.log2(len(np.unique(q[i]))))
                     for i in range(arr.shape[0])], np.float32)


def generate_poisson_noise_batch(key, img, scale=1.0, gray_noise=0):
    """(B, H, W, C) Poisson shot noise. `vals` is counted host-side from the
    materialized batch (data-dependent), the sampling runs on device.
    The gray branch (second Poisson field + second host-side unique count)
    is skipped entirely when gray_noise is a static 0, mirroring the
    reference's cal_gray_noise guard (`degradations.py:628-640`)."""
    import jax
    import jax.numpy as jnp

    b = img.shape[0]
    kc, kg = jax.random.split(key)
    q = jnp.clip(jnp.round(img * 255.0), 0, 255) / 255.0
    vals = jnp.asarray(_poisson_vals_batch(img)).reshape(b, 1, 1, 1)
    out = jax.random.poisson(kc, q * vals).astype(jnp.float32) / vals
    noise = out - q

    cal_gray = not (isinstance(gray_noise, (int, float)) and gray_noise <= 0)
    if cal_gray:
        gray = _per_sample(gray_noise, b)
        lum = (q[..., :1] * 0.299 + q[..., 1:2] * 0.587
               + q[..., 2:3] * 0.114)
        lum = jnp.clip(jnp.round(lum * 255.0), 0, 255) / 255.0
        vals_g = jnp.asarray(_poisson_vals_batch(lum)).reshape(b, 1, 1, 1)
        out_g = (jax.random.poisson(kg, lum * vals_g).astype(jnp.float32)
                 / vals_g)
        noise_g = jnp.broadcast_to(out_g - lum, img.shape)
        noise = noise * (1 - gray) + noise_g * gray
    return noise * _per_sample(scale, b)


def add_poisson_noise_batch(key, img, scale=1.0, gray_noise=0,
                            clip: bool = True, rounds: bool = False):
    import jax.numpy as jnp

    noise = generate_poisson_noise_batch(key, img, scale, gray_noise)
    return _finalize(img + noise, clip, rounds, xp=jnp)


def random_add_poisson_noise_batch(key, img, scale_range=(0, 1.0),
                                   gray_prob=0.0, clip: bool = True,
                                   rounds: bool = False):
    """Per-sample random scale + gray decision (`degradations.py:706-728`)."""
    import jax
    import jax.numpy as jnp

    b = img.shape[0]
    ks, kg, kn = jax.random.split(key, 3)
    scale = jax.random.uniform(ks, (b,), jnp.float32,
                               scale_range[0], scale_range[1])
    gray = (jax.random.uniform(kg, (b,)) < gray_prob).astype(jnp.float32)
    noise = generate_poisson_noise_batch(kn, img, scale, gray)
    return _finalize(img + noise, clip, rounds, xp=jnp)


# --------------------------------------------------------------------------
# JPEG compression — `degradations.py:731-764`
# --------------------------------------------------------------------------


def jpeg_compression(img, quality: int):
    """JPEG round-trip via cv2 (the reference's DiffJPEG is a differentiable
    approximation used only for on-GPU training augmentation; our data
    pipeline degrades on host where real JPEG is exact)."""
    import cv2

    q = int(quality)
    ok, enc = cv2.imencode(".jpg", (np.clip(img[:, :, ::-1], 0, 1)
                                    * 255).astype(np.uint8),
                           [cv2.IMWRITE_JPEG_QUALITY, q])
    dec = cv2.imdecode(enc, cv2.IMREAD_COLOR)
    return dec[:, :, ::-1].astype(np.float32) / 255.0


# reference name (`degradations.py:731`)
add_jpg_compression = jpeg_compression


def random_add_jpg_compression(img, quality_range=(90, 100),
                               rng: random.Random = None):
    """Random-quality JPEG round-trip (`degradations.py:750-764`)."""
    rng = rng or random
    return jpeg_compression(img, int(rng.uniform(*quality_range)))
