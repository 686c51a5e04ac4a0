"""Differentiable JPEG compression/decompression in JAX.

Equivalent of the reference `basicsr/utils/diffjpeg.py:26-498` (itself from
mlomnitz/DiffJPEG): RGB->YCbCr, 2x2 chroma subsampling, 8x8 block DCT,
quantization with the standard luma/chroma tables scaled by a
quality-derived factor, then the inverse chain. With `differentiable=True`
rounding is `round(x) + (x - round(x))^3` (`diffjpeg.py:26-29`) so the op
admits gradients for degradation-aware training.

TPU-first notes: everything is batched jnp ops under jit; the 8x8 DCT is
two small einsums (XLA lowers them onto the MXU); per-sample quality
factors are a traced (B,) vector, so one compiled program serves any
quality draw.
"""

from __future__ import annotations

import itertools

import jax.numpy as jnp
import numpy as np

# Standard JPEG quantization tables (transposed, matching diffjpeg.py:14-24).
Y_TABLE = np.array(
    [[16, 11, 10, 16, 24, 40, 51, 61], [12, 12, 14, 19, 26, 58, 60, 55],
     [14, 13, 16, 24, 40, 57, 69, 56], [14, 17, 22, 29, 51, 87, 80, 62],
     [18, 22, 37, 56, 68, 109, 103, 77], [24, 35, 55, 64, 81, 104, 113, 92],
     [49, 64, 78, 87, 103, 121, 120, 101],
     [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float32).T

C_TABLE = np.full((8, 8), 99, dtype=np.float32)
C_TABLE[:4, :4] = np.array([[17, 18, 24, 47], [18, 21, 26, 66],
                            [24, 26, 56, 99], [47, 66, 99, 99]],
                           dtype=np.float32).T


def _dct_tensor():
    t = np.zeros((8, 8, 8, 8), dtype=np.float32)
    for x, y, u, v in itertools.product(range(8), repeat=4):
        t[x, y, u, v] = (np.cos((2 * x + 1) * u * np.pi / 16)
                         * np.cos((2 * y + 1) * v * np.pi / 16))
    return t


_DCT_T = _dct_tensor()                      # fwd basis (diffjpeg.py:125-132)
_IDCT_T = np.transpose(_DCT_T, (2, 3, 0, 1))  # inverse basis (:301-306)
_ALPHA = np.outer(np.array([1.0 / np.sqrt(2)] + [1] * 7),
                  np.array([1.0 / np.sqrt(2)] + [1] * 7)).astype(np.float32)

_RGB2YCC = np.array([[0.299, 0.587, 0.114], [-0.168736, -0.331264, 0.5],
                     [0.5, -0.418688, -0.081312]], dtype=np.float32).T
_YCC2RGB = np.array([[1.0, 0.0, 1.402], [1, -0.344136, -0.714136],
                     [1, 1.772, 0]], dtype=np.float32).T


def diff_round(x):
    """`diffjpeg.py:26-29`: round with a cubic correction carrying grads."""
    r = jnp.round(x)
    return r + (x - r) ** 3


def quality_to_factor(quality):
    """`diffjpeg.py:32-46`, vectorized for traced per-sample qualities."""
    quality = jnp.asarray(quality, dtype=jnp.float32)
    return jnp.where(quality < 50, 5000.0 / quality,
                     200.0 - quality * 2) / 100.0


def _blocks(x):
    """(B, H, W) -> (B, H/8 * W/8, 8, 8) (diffjpeg.py:106-119)."""
    b, h, w = x.shape
    x = x.reshape(b, h // 8, 8, w // 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, -1, 8, 8)


def _merge(x, h, w):
    """(B, N, 8, 8) -> (B, H, W) (diffjpeg.py:331-344)."""
    b = x.shape[0]
    x = x.reshape(b, h // 8, w // 8, 8, 8)
    return x.transpose(0, 1, 3, 2, 4).reshape(b, h, w)


def _dct8x8(x):
    """(B, N, 8, 8) blocks -> DCT coefficients (diffjpeg.py:134-145)."""
    x = x - 128.0
    out = jnp.einsum("bnxy,xyuv->bnuv", x, jnp.asarray(_DCT_T))
    return jnp.asarray(_ALPHA * 0.25) * out


def _idct8x8(x):
    """Inverse DCT (diffjpeg.py:310-319)."""
    x = x * jnp.asarray(_ALPHA)
    return 0.25 * jnp.einsum("bnuv,uvxy->bnxy", x, jnp.asarray(_IDCT_T)) + 128.0


def _factor_bcast(factor, batch):
    f = jnp.asarray(factor, dtype=jnp.float32)
    if f.ndim == 0:
        f = jnp.broadcast_to(f, (batch,))
    return f[:, None, None, None]


def diff_jpeg(x, quality, differentiable: bool = True):
    """Differentiable JPEG round-trip.

    Args:
        x: (B, H, W, 3) RGB in [0, 1] (NHWC; reference is NCHW).
        quality: scalar or (B,) quality in (0, 100].
        differentiable: cubic-corrected rounding vs hard rounding.

    Returns:
        (B, H, W, 3) compressed-then-decompressed image in [0, 1].
    """
    rounding = diff_round if differentiable else jnp.round
    b, h, w, _ = x.shape
    factor = quality_to_factor(quality)

    # pad to a multiple of 16 (diffjpeg.py:476-483)
    h_pad = (16 - h % 16) % 16
    w_pad = (16 - w % 16) % 16
    x = jnp.pad(x, ((0, 0), (0, h_pad), (0, w_pad), (0, 0)))
    hp, wp = h + h_pad, w + w_pad

    # ---- compress (diffjpeg.py:208-243) ----
    ycc = jnp.tensordot(x * 255.0, jnp.asarray(_RGB2YCC), axes=1) \
        + jnp.asarray([0.0, 128.0, 128.0])
    y = ycc[..., 0]
    # 2x2 mean pool == avg_pool2d(count_include_pad=False) on even sizes
    cbcr = ycc[..., 1:].reshape(b, hp // 2, 2, wp // 2, 2, 2).mean(axis=(2, 4))
    cb, cr = cbcr[..., 0], cbcr[..., 1]

    fb = _factor_bcast(factor, b)
    yt = jnp.asarray(Y_TABLE)
    ct = jnp.asarray(C_TABLE)
    comp_y = rounding(_dct8x8(_blocks(y)) / (yt * fb))
    comp_cb = rounding(_dct8x8(_blocks(cb)) / (ct * fb))
    comp_cr = rounding(_dct8x8(_blocks(cr)) / (ct * fb))

    # ---- decompress (diffjpeg.py:401-446) ----
    y_r = _merge(_idct8x8(comp_y * (yt * fb)), hp, wp)
    cb_r = _merge(_idct8x8(comp_cb * (ct * fb)), hp // 2, wp // 2)
    cr_r = _merge(_idct8x8(comp_cr * (ct * fb)), hp // 2, wp // 2)

    cb_up = jnp.repeat(jnp.repeat(cb_r, 2, axis=1), 2, axis=2)
    cr_up = jnp.repeat(jnp.repeat(cr_r, 2, axis=1), 2, axis=2)
    ycc_r = jnp.stack([y_r, cb_up, cr_up], axis=-1)
    rgb = jnp.tensordot(ycc_r + jnp.asarray([0.0, -128.0, -128.0]),
                        jnp.asarray(_YCC2RGB), axes=1)
    rgb = jnp.clip(rgb, 0.0, 255.0) / 255.0
    return rgb[:, :h, :w, :]


class DiffJPEG:
    """Callable wrapper mirroring `DiffJPEG(nn.Module)`
    (`diffjpeg.py:449-489`)."""

    def __init__(self, differentiable: bool = True):
        self.differentiable = differentiable

    def __call__(self, x, quality):
        return diff_jpeg(x, quality, differentiable=self.differentiable)
