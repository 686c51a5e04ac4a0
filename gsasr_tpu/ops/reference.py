"""Pure-JAX dense reference renderer for 2D Gaussian splatting.

Numerically mirrors the reference CUDA kernel semantics
(`/root/reference/utils/gs_cuda_dmax/gs.cu:7-64` and the pure-torch oracle in
`/root/reference/utils/gs_cuda_dmax/check.py:4-31`):

- pixel (hi, wi) of an (h, w) image maps to normalized coordinates
  ``y = 2*hi/(h-1) - 1``, ``x = 2*wi/(w-1) - 1``;
- each Gaussian contributes
  ``v = exp(-0.5/(1-rho^2) * (dx^2/sx^2 - 2 rho dx dy/(sx sy) + dy^2/sy^2))``
  (the normalization constant is deliberately dropped so the kernel peak is 1);
- contributions are box-culled: a Gaussian is skipped at a pixel when
  ``|dx| > dmax`` or ``|dy| > dmax`` (inclusive at exactly dmax);
- the image accumulates ``v * color`` per channel.

This implementation is dense (no culling for compute, only for masking), fully
differentiable through JAX autodiff, and is the parity oracle for the Pallas
kernel. O(S * H * W) memory when S is large — use chunked evaluation via
``chunk`` for big inputs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _pixel_axes(h: int, w: int, dtype=jnp.float32):
    """Normalized pixel-center coordinates per the reference convention."""
    ys = 2.0 * jnp.arange(h, dtype=dtype) / (h - 1) - 1.0
    xs = 2.0 * jnp.arange(w, dtype=dtype) / (w - 1) - 1.0
    return ys, xs


def _render_chunk(sigmas, coords, colors, ys, xs, dmax):
    """Render a chunk of Gaussians densely. Returns (h, w, c) image."""
    sx = sigmas[:, 0]  # pairs with dx (the w axis), matching gs.cu:24,52
    sy = sigmas[:, 1]  # pairs with dy (the h axis)
    rho = sigmas[:, 2]

    # (S, h, 1) and (S, 1, w) broadcast distances
    dy = ys[None, :, None] - coords[:, 1][:, None, None]
    dx = xs[None, None, :] - coords[:, 0][:, None, None]

    inv_sx2 = 1.0 / (sx * sx)
    inv_sy2 = 1.0 / (sy * sy)
    rho_term = 2.0 * rho / (sx * sy)
    neg_half = -0.5 / (1.0 - rho * rho)

    quad = (
        inv_sx2[:, None, None] * dx * dx
        - rho_term[:, None, None] * dx * dy
        + inv_sy2[:, None, None] * dy * dy
    )
    v = jnp.exp(neg_half[:, None, None] * quad)

    mask = (jnp.abs(dx) <= dmax) & (jnp.abs(dy) <= dmax)
    v = jnp.where(mask, v, 0.0)

    # (S, h, w) x (S, c) -> (h, w, c)
    return jnp.einsum("shw,sc->hwc", v, colors)


@functools.partial(jax.jit, static_argnames=("image_size", "chunk"))
def gs_render_reference(sigmas, coords, colors, image_size, dmax=100.0, chunk=4096):
    """Dense reference 2D Gaussian splatting.

    Args:
      sigmas: (S, 3) float32 — [sigma_x, sigma_y, rho] in *kernel units*
        (already divided by step size and normalized to the pixel grid, see
        ``gsasr_tpu.rendering`` for the conversion from model outputs).
      coords: (S, 2) float32 — [x, y] normalized centers in [-1, 1]
        (align-corners-True convention after the rendering-layer remap).
      colors: (S, C) float32 — per-Gaussian colors (already alpha-multiplied).
      image_size: (h, w) static ints.
      dmax: scalar box-culling radius in normalized units.
      chunk: Gaussians per dense evaluation block (bounds peak memory).

    Returns:
      (h, w, C) float32 rendered image.
    """
    h, w = image_size
    s = sigmas.shape[0]
    c = colors.shape[-1]
    ys, xs = _pixel_axes(h, w, sigmas.dtype)

    if s <= chunk:
        return _render_chunk(sigmas, coords, colors, ys, xs, dmax)

    # Pad to a multiple of chunk; padded Gaussians have colors == 0 so they
    # contribute nothing regardless of geometry.
    n_chunks = -(-s // chunk)
    pad = n_chunks * chunk - s
    sigmas = jnp.pad(sigmas, ((0, pad), (0, 0)), constant_values=1.0)
    coords = jnp.pad(coords, ((0, pad), (0, 0)), constant_values=3.0)
    colors = jnp.pad(colors, ((0, pad), (0, 0)))

    def body(carry, args):
        sg, co, cl = args
        return carry + _render_chunk(sg, co, cl, ys, xs, dmax), None

    init = jnp.zeros((h, w, c), sigmas.dtype)
    out, _ = jax.lax.scan(
        body,
        init,
        (
            sigmas.reshape(n_chunks, chunk, 3),
            coords.reshape(n_chunks, chunk, 2),
            colors.reshape(n_chunks, chunk, c),
        ),
    )
    return out
