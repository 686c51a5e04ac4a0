"""Rendering orchestration: raw decoder outputs -> rendered SR image.

Mirrors `/root/reference/utils/gaussian_splatting.py`:

- activations (`generate_2D_gaussian_splatting_step`, :174-180):
    sigma = 0.99999 * sigmoid(p) + 1e-6
    rho   = 0.999999 * tanh(p)
    alpha = sigmoid(p); rgb = sigmoid(p); colors = rgb * alpha
    coords = 2 * p - 1
- step size (:166-171): step_size = default_step_size / scale  (1.2 default)
- kernel-unit conversion (`rendering_cuda_dmax`, :121-123):
    kernel sigma_x (pairs with the w axis) = sigma_y / step * 2 / (W - 1)
    kernel sigma_y (pairs with the h axis) = sigma_x / step * 2 / (H - 1)
    (note the deliberate x/y swap, matching the CUDA kernel's dx<->sigmas[0]
    convention)
- center remap from align-corners-False to the kernel's pixel-center grid:
    x' = (x + 1 - 1/W) * W / (W - 1) - 1  (same for y with H)
- dmax modes (:203-208): 'fix' passes dmax through; 'dynamic' uses
  (dmax + 2) / min(H, W).

Everything is jit-friendly: sr_size and dmax_mode are static, scale is a
traced scalar.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp

from gsasr_tpu.ops.rasterizer import (GEOM_COLS, gs_render, gs_render_px,
                                      pack_geometry)
from gsasr_tpu.ops.reference import gs_render_reference

DEFAULT_STEP_SIZE = 1.2


@functools.lru_cache(maxsize=64)
def _static_lattice_perm(lat_h: int, lat_w: int, sr_h: int, sr_w: int,
                         th: int = 32, tw: int = 128):
    """Static tile-coherent permutation of decoder outputs.

    Decoder Gaussian i anchors at lattice cell (i // lat_w, i % lat_w)
    (`fea2gs.py:553-563` reference points are row-major); its center lands
    near pixel ((row+.5)/lat_h*sr_h, (col+.5)/lat_w*sr_w). Sorting by the
    rasterizer tile id of that anchor is therefore a *static* permutation —
    it gives the same chunk-locality as the runtime argsort (which costs an
    O(S log S) device sort per render) at zero runtime cost. Per-Gaussian
    cull boxes keep correctness exact even for centers that stray from
    their anchors (measured drift at trained weights: p99 = 2.2 px,
    scripts/analyze_walk_volume.py).
    """
    import numpy as _np

    n = lat_h * lat_w
    rows = _np.arange(n) // lat_w
    cols = _np.arange(n) % lat_w
    py = ((rows + 0.5) / lat_h * sr_h).astype(_np.int64)
    px = ((cols + 0.5) / lat_w * sr_w).astype(_np.int64)
    key = (py // th) * (-(-sr_w // tw)) + (px // tw)
    return _np.argsort(key, kind="stable")


def gs_activations(gs_parameters):
    """Raw (N, 9) decoder outputs -> physical Gaussian parameters.

    Returns (sigma_x, sigma_y, rho, coords, colors_with_alpha) with shapes
    (N,), (N,), (N,), (N, 2), (N, 3).
    """
    sigma_x = 0.99999 * jax.nn.sigmoid(gs_parameters[:, 0]) + 1e-6
    sigma_y = 0.99999 * jax.nn.sigmoid(gs_parameters[:, 1]) + 1e-6
    rho = 0.999999 * jnp.tanh(gs_parameters[:, 2])
    alpha = jax.nn.sigmoid(gs_parameters[:, 3:4])
    colors = jax.nn.sigmoid(gs_parameters[:, 4:7])
    coords = gs_parameters[:, 7:9] * 2.0 - 1.0
    return sigma_x, sigma_y, rho, coords, colors * alpha


def to_kernel_units(sigma_x, sigma_y, rho, coords, sr_size, step_size):
    """Convert physical units to rasterizer-kernel units.

    Matches `/root/reference/utils/gaussian_splatting.py:121-123` including
    the x/y swap and the align-corners remap of centers.
    """
    sr_h, sr_w = sr_size
    ksig_x = sigma_y / step_size * 2.0 / (sr_w - 1)
    ksig_y = sigma_x / step_size * 2.0 / (sr_h - 1)
    sigmas = jnp.stack([ksig_x, ksig_y, rho], axis=-1)
    cx = (coords[:, 0] + 1.0 - 1.0 / sr_w) * sr_w / (sr_w - 1) - 1.0
    cy = (coords[:, 1] + 1.0 - 1.0 / sr_h) * sr_h / (sr_h - 1) - 1.0
    return sigmas, jnp.stack([cx, cy], axis=-1)


def resolve_dmax(dmax, dmax_mode: str, sr_size):
    """`gaussian_splatting.py:203-208` dmax resolution."""
    if dmax_mode == "dynamic":
        return (dmax + 2.0) / min(int(sr_size[0]), int(sr_size[1]))
    if dmax_mode == "fix":
        return dmax
    raise ValueError(f"dmax_mode '{dmax_mode}' must be 'fix' or 'dynamic'")


def prepare_kernel_inputs(sr_size, gs_parameters, scale, *,
                          default_step_size: float = DEFAULT_STEP_SIZE,
                          if_dmax: bool = True, dmax_mode: str = "fix",
                          dmax: float = 25.0):
    """Shared raw-decoder-output -> rasterizer-input pipeline: activations,
    kernel-unit conversion, dmax resolution and the static cull-box bound.

    Returns (sigmas, kcoords, colors, final_dmax, max_box_px)."""
    sr = (int(sr_size[0]), int(sr_size[1]))
    # Rendering is always fp32 — the reference's CUDA rasterizer only
    # accepts fp32, so its AMP model leaves the autocast region at this
    # boundary. bf16 activations here (mu quantized to ~2^-8 relative =
    # ~0.4 px on a 192-canvas) destabilize training.
    gs_parameters = jnp.asarray(gs_parameters, jnp.float32)
    step_size = default_step_size / scale
    sigma_x, sigma_y, rho, coords, colors = gs_activations(gs_parameters)
    sigmas, kcoords = to_kernel_units(sigma_x, sigma_y, rho, coords, sr,
                                      step_size)
    final_dmax = resolve_dmax(dmax, dmax_mode, sr) if if_dmax else 100.0
    max_box_px = None
    if isinstance(final_dmax, (int, float)):
        max_box_px = (min(sr[0], final_dmax * (sr[0] - 1) + 1),
                      min(sr[1], final_dmax * (sr[1] - 1) + 1))
    return sigmas, kcoords, colors, final_dmax, max_box_px


def render_gaussians(
    sr_size: Sequence[int],
    gs_parameters,
    scale,
    *,
    default_step_size: float = DEFAULT_STEP_SIZE,
    if_dmax: bool = True,
    dmax_mode: str = "fix",
    dmax: float = 25.0,
    use_pallas: bool = True,
    sample_coords=None,
    static_perm: bool = True,
    lat_hw=None,
):
    """The canonical render entry — TPU equivalent of
    `generate_2D_gaussian_splatting_step` (`gaussian_splatting.py:158-217`).

    Args:
      sr_size: static (H, W) of the output image.
      gs_parameters: (N, 9) raw decoder outputs
        [sigma_x, sigma_y, rho, alpha, r, g, b, mu_x, mu_y].
      scale: traced scalar — the (isotropic) realized scale factor; the
        reference's `mode='scale_modify'` asserts isotropy and uses
        scale_modify[0] (:166-171), so we take one scalar.
      if_dmax / dmax_mode / dmax: culling config (see resolve_dmax).
      use_pallas: False falls back to the dense pure-JAX reference renderer.
      sample_coords: optional (K, 2) integer pixel coords for sparse
        supervision — returns (3, K) sampled values like :214-216.
      static_perm: replace the runtime device sort with the zero-cost
        lattice-anchor permutation (default True — r5). Correctness never
        depends on it (per-Gaussian cull boxes are ground truth); only
        chunk locality does, and measured trained decoders keep centers
        within ~3 px of their anchors (|center-anchor| p99 = 2.2 px at the
        r5 checkpoint, scripts/analyze_walk_volume.py) while the runtime
        518k-element argsort costs ~40 ms hard-synced on this part. With
        anchor-divergent centers (random init) the two are within ~4% e2e
        because saturated boxes defeat locality either way. Falls back to
        the runtime sort automatically for non-square lattices; pass False
        to force the device sort of actual coordinates.
      lat_hw: optional static (lat_h, lat_w) decoder-lattice dims enabling
        the static perm for RECTANGULAR lattices (inferred automatically
        only for square N).

    Returns:
      (3, H, W) rendered image (the reference's post-permute layout,
      `rendering_cuda_dmax` :130), or (3, K) if sample_coords is given.
    """
    sr_size = (int(sr_size[0]), int(sr_size[1]))
    import math

    n = gs_parameters.shape[0]
    if lat_hw is None and math.isqrt(n) ** 2 == n:
        lat_hw = (math.isqrt(n), math.isqrt(n))
    use_static_perm = (static_perm and use_pallas and lat_hw is not None
                       and lat_hw[0] * lat_hw[1] == n)
    if use_static_perm:
        perm = _static_lattice_perm(int(lat_hw[0]), int(lat_hw[1]),
                                    sr_size[0], sr_size[1])
        gs_parameters = jnp.take(gs_parameters, jnp.asarray(perm), axis=0)
    sigmas, kcoords, colors, final_dmax, _ = prepare_kernel_inputs(
        sr_size, gs_parameters, scale, default_step_size=default_step_size,
        if_dmax=if_dmax, dmax_mode=dmax_mode, dmax=dmax)

    if use_pallas:
        # With static_perm the tile-coherence comes from the lattice-anchor
        # permutation above and the runtime argsort is skipped; otherwise the
        # device sort of the actual predicted centers supplies it.
        img = gs_render(sigmas, kcoords, colors, sr_size, final_dmax,
                        spatial_sort=not use_static_perm)
    else:
        img = gs_render_reference(sigmas, kcoords, colors, sr_size, final_dmax)
    img = img.transpose(2, 0, 1)  # (3, H, W)

    if sample_coords is not None:
        return img[:, sample_coords[:, 0], sample_coords[:, 1]]
    return img


def render_batch(sr_size, gs_parameters, scales, **kw):
    """vmap'd batched rendering.

    The reference loops the batch in Python (`gsasr_model.py:191`); here we
    vmap over the batch with a shared static sr_size. NOTE: vmap over the
    pallas rasterizer compiles poorly through the axon remote-compile path —
    prefer `render_training_batch` (canvas slot stacking) on hardware; this
    helper is for CPU/testing and small batches.

    Args:
      gs_parameters: (B, N, 9); scales: (B,).
    Returns: (B, 3, H, W).
    """
    fn = functools.partial(render_gaussians, sr_size, **kw)
    return jax.vmap(fn)(gs_parameters, scales)


def render_training_batch(
    gs_parameters,
    scales,
    gt_h,
    gt_w,
    canvas_hw,
    *,
    default_step_size: float = DEFAULT_STEP_SIZE,
    if_dmax: bool = True,
    dmax_mode: str = "fix",
    dmax: float = 25.0,
):
    """Batched training-time rendering on a vertically stacked canvas.

    The reference loops the batch in Python, rendering each sample at its own
    realized gt_size (`gsasr_model.py:191-211`). TPU-native: every sample
    renders into its own row-slot of one (B*Hmax, Wmax) canvas; the per-sample
    effective size (gt_h[i], gt_w[i]) is a *traced* value folded into the
    pixel-unit Gaussian parameters, so one compilation serves all scales.
    Cull boxes are clamped to each sample's effective region — pixels beyond
    gt_size stay zero exactly like the reference's per-sample canvases.

    Args:
      gs_parameters: (B, N, 9) raw decoder outputs.
      scales: (B,) realized scale factors (scale_modify[:, 0]).
      gt_h, gt_w: (B,) effective SR sizes (int or float, traced ok).
      canvas_hw: static (Hmax, Wmax), Hmax >= max(gt_h), Wmax >= max(gt_w).

    Returns:
      (B, Hmax, Wmax, 3) float32; rows/cols beyond (gt_h[i], gt_w[i]) are 0.
    """
    b, n, _ = gs_parameters.shape
    hmax, wmax = int(canvas_hw[0]), int(canvas_hw[1])
    geoms, colors, max_box_px = training_batch_geometry(
        gs_parameters, scales, gt_h, gt_w, canvas_hw,
        default_step_size=default_step_size, if_dmax=if_dmax,
        dmax_mode=dmax_mode, dmax=dmax)
    canvas = gs_render_px(geoms.reshape(b * n, GEOM_COLS),
                          colors.reshape(b * n, 3), (b * hmax, wmax),
                          max_box_px=max_box_px)
    return canvas.reshape(b, hmax, wmax, 3)


def training_batch_geometry(
    gs_parameters,
    scales,
    gt_h,
    gt_w,
    canvas_hw,
    *,
    default_step_size: float = DEFAULT_STEP_SIZE,
    if_dmax: bool = True,
    dmax_mode: str = "fix",
    dmax: float = 25.0,
    band_y0=None,
    slot_h: int | None = None,
):
    """Slot-stacked pixel-unit geometry for a training batch.

    Shared by the single-device canvas render (`render_training_batch`)
    and the band-sharded one (`parallel/spatial.py`): with `band_y0`
    (traced scalar, the first canvas row this device renders) and `slot_h`
    (static per-sample rows on the local canvas), sample i's rows
    [band_y0, band_y0 + slot_h) land on local rows [i*slot_h, ...) and
    everything outside the band is clamped into an empty cull box.

    Returns (geoms (B, N, 16), colors (B, N, 3), max_box_px).
    """
    b, n, _ = gs_parameters.shape
    hmax, wmax = int(canvas_hw[0]), int(canvas_hw[1])
    if slot_h is None:
        slot_h = hmax
    if band_y0 is None:
        band_y0 = jnp.zeros((), jnp.float32)

    def one(g, scale, h, w, idx):
        # fp32 render boundary (see prepare_kernel_inputs)
        g = jnp.asarray(g, jnp.float32)
        step_size = default_step_size / scale
        sigma_x, sigma_y, rho, coords, colors = gs_activations(g)
        h_f = jnp.asarray(h, jnp.float32)
        w_f = jnp.asarray(w, jnp.float32)
        ksig_x = sigma_y / step_size * 2.0 / (w_f - 1)
        ksig_y = sigma_x / step_size * 2.0 / (h_f - 1)
        sigmas = jnp.stack([ksig_x, ksig_y, rho], axis=-1)
        cx = (coords[:, 0] + 1.0 - 1.0 / w_f) * w_f / (w_f - 1) - 1.0
        cy = (coords[:, 1] + 1.0 - 1.0 / h_f) * h_f / (h_f - 1) - 1.0
        kcoords = jnp.stack([cx, cy], axis=-1)
        if if_dmax:
            if dmax_mode == "dynamic":
                d = (dmax + 2.0) / jnp.minimum(h_f, w_f)
            else:
                d = jnp.asarray(dmax, jnp.float32)
        else:
            d = jnp.asarray(100.0, jnp.float32)
        # sample rows [band_y0, band_y0+slot_h) -> local rows [idx*slot_h..)
        b0 = jnp.asarray(band_y0, jnp.float32)
        off = idx.astype(jnp.float32) * slot_h - b0
        lo = idx.astype(jnp.float32) * slot_h
        # valid rows within the band: min(h, band_y0+slot_h) - band_y0
        hi = lo + jnp.clip(h_f - b0, 0.0, float(slot_h)) - 1.0
        geom = pack_geometry(
            sigmas, kcoords, (h_f, w_f), d,
            y_offset=off,
            y_slot=(lo, hi),
            x_slot=(0.0, w_f - 1.0),
        )
        return geom, colors

    geoms, colors = jax.vmap(one)(
        gs_parameters, jnp.asarray(scales, jnp.float32),
        jnp.asarray(gt_h), jnp.asarray(gt_w), jnp.arange(b))
    # Static box bound for the forward's list capacity: with fixed dmax
    # the cull box spans at most dmax*(dim-1) pixels per axis (each sample's
    # effective dims are <= the canvas slot dims).
    max_box_px = None
    if if_dmax and dmax_mode != "dynamic" and isinstance(dmax, (int, float)):
        max_box_px = (min(slot_h, dmax * (hmax - 1) + 1),
                      min(wmax, dmax * (wmax - 1) + 1))
    return geoms, colors, max_box_px
