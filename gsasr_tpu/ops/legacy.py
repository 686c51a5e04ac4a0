"""JAX equivalents of BasicSR's legacy CUDA ops (SURVEY.md N5-N7).

The reference compiles these only under BASICSR_EXT=True
(`TrainTestGSASR/setup_basicsr.py:126-139`) and no GSASR arch/config uses
them, but they are part of the framework surface (`basicsr/ops/`):

- `upfirdn2d` (`basicsr/ops/upfirdn2d/`): StyleGAN2 up/FIR/down resampling.
- `fused_leaky_relu` (`basicsr/ops/fused_act/`): bias + LeakyReLU * scale.
- `modulated_deform_conv` (`basicsr/ops/dcn/`): DCNv2, implemented with
  bilinear gather (TPU-friendly: one static gather + interpolation instead
  of per-thread scatter).

All NHWC; differentiable via autodiff (no custom kernels needed — XLA's
gather/conv fusion handles these shapes well on TPU).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def fused_leaky_relu(x, bias=None, negative_slope: float = 0.2,
                     scale: float = 2 ** 0.5):
    """`basicsr/ops/fused_act`: leaky_relu(x + bias) * scale (channel-last
    bias)."""
    if bias is not None:
        x = x + bias.reshape((1,) * (x.ndim - 1) + (-1,))
    return jax.nn.leaky_relu(x, negative_slope) * scale


def upfirdn2d(x, kernel, up: int = 1, down: int = 1, pad=(0, 0)):
    """StyleGAN2 up-FIR-down resample on (B, H, W, C).

    Semantics of `basicsr/ops/upfirdn2d`: zero-insert upsample by `up`,
    pad (pad[0], pad[1]) on each spatial side, correlate with the 2D FIR
    `kernel`, then subsample by `down`.
    """
    b, h, w, c = x.shape
    kh, kw = kernel.shape
    p0, p1 = pad

    # upsample by zero insertion
    if up > 1:
        x = x.reshape(b, h, 1, w, 1, c)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, up - 1), (0, 0), (0, up - 1),
                        (0, 0)))
        x = x.reshape(b, h * up, w * up, c)

    x = jnp.pad(x, ((0, 0), (max(p0, 0), max(p1, 0)),
                    (max(p0, 0), max(p1, 0)), (0, 0)))
    if p0 < 0 or p1 < 0:
        x = x[:, max(-p0, 0):x.shape[1] - max(-p1, 0),
              max(-p0, 0):x.shape[2] - max(-p1, 0)]

    # depthwise correlation with the flipped kernel (upfirdn uses conv)
    k = jnp.asarray(kernel, x.dtype)[::-1, ::-1]
    k = jnp.tile(k[:, :, None, None], (1, 1, 1, c))
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(down, down), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c)
    return out


def _bilinear_gather(img, ys, xs):
    """img (H, W, C); ys/xs (...): bilinear sample with zero padding."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        vals = img[yc, xc]
        return jnp.where(valid[..., None], vals, 0.0)

    return ((1 - wy)[..., None] * (1 - wx)[..., None] * tap(y0, x0)
            + (1 - wy)[..., None] * wx[..., None] * tap(y0, x0 + 1)
            + wy[..., None] * (1 - wx)[..., None] * tap(y0 + 1, x0)
            + wy[..., None] * wx[..., None] * tap(y0 + 1, x0 + 1))


def modulated_deform_conv(x, offset, mask, weight, bias=None, stride: int = 1,
                          padding: int = 1, dilation: int = 1,
                          deform_groups: int = 1):
    """DCNv2 (`basicsr/ops/dcn`), NHWC.

    Args:
      x: (B, H, W, Cin).
      offset: (B, Ho, Wo, 2 * dg * kh * kw) — (dy, dx) interleaved per tap,
        matching torchvision/mmcv channel layout (y first).
      mask: (B, Ho, Wo, dg * kh * kw) modulation scalars.
      weight: (kh, kw, Cin, Cout) conv kernel.
      bias: (Cout,) or None.
    Returns (B, Ho, Wo, Cout).
    """
    b, h, w, cin = x.shape
    kh, kw, _, cout = weight.shape
    dg = deform_groups
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1

    # base sampling grid per output position and tap
    ys0 = (jnp.arange(ho) * stride - padding)
    xs0 = (jnp.arange(wo) * stride - padding)
    ky = jnp.arange(kh) * dilation
    kx = jnp.arange(kw) * dilation
    base_y = ys0[:, None, None, None] + ky[None, None, :, None]  # ho,1,kh,1
    base_x = xs0[None, :, None, None] + kx[None, None, None, :]  # 1,wo,1,kw

    off = offset.reshape(b, ho, wo, dg, kh, kw, 2)
    msk = mask.reshape(b, ho, wo, dg, kh, kw)
    cpg = cin // dg  # channels per deform group

    def one_sample(xi, oi, mi):
        # xi (h, w, cin); oi (ho, wo, dg, kh, kw, 2); mi (ho, wo, dg, kh, kw)
        outs = []
        for g in range(dg):
            ys = base_y[:, :, :, :] + oi[:, :, g, :, :, 0]  # ho,wo,kh,kw
            xs = base_x[:, :, :, :] + oi[:, :, g, :, :, 1]
            vals = _bilinear_gather(xi[:, :, g * cpg:(g + 1) * cpg], ys, xs)
            outs.append(vals * mi[:, :, g, :, :, None])
        return jnp.concatenate(outs, axis=-1)  # ho, wo, kh, kw, cin

    sampled = jax.vmap(one_sample)(x, off, msk)  # b, ho, wo, kh, kw, cin
    out = jnp.einsum("bhwijc,ijco->bhwo", sampled, weight)
    if bias is not None:
        out = out + bias
    return out
