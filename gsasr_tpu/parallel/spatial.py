"""Spatially-sharded (tile-parallel) rendering over a device mesh.

The reference scales only by data parallelism (DDP over NCCL,
`/root/reference/TrainTestGSASR/basicsr/models/base_model.py:88-102`); its
"spatial scaling" is a host-side Python tiling loop
(`/root/reference/utils/split_and_joint_image.py:98-232`). The TPU-native
mapping (SURVEY.md §5): shard the HR pixel grid across the mesh — every
device rasterizes one horizontal band of the canvas against the full
(replicated) Gaussian set. Per-Gaussian cull boxes make off-band Gaussians
dead on arrival: the band's corner-key sort classifies them invisible, so
their chunks are never walked. No collectives in the render hot loop; the
output is born sharded `P(axis)` along H for downstream sharded ops (or one
all-gather if the host wants the full image).

The encoder/decoder halves stay in plain `jit` with input shardings — XLA
partitions convs/attention and inserts the halo exchanges itself; only the
rasterizer needs the explicit `shard_map` because its per-band culling is a
program-level decision, not a tiling XLA can infer.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gsasr_tpu.ops.rasterizer import (G_CY, G_YHI, G_YLO, _cdiv,
                                      gs_render_px, pack_geometry)
from gsasr_tpu.rendering import DEFAULT_STEP_SIZE, prepare_kernel_inputs


def gs_render_px_banded(geom, colors, canvas_hw: Sequence[int], mesh: Mesh,
                        *, axis_name: str = "data", max_box_px=None, **kw):
    """Band-parallel `gs_render_px`: device i renders rows
    [i*hb, (i+1)*hb) of the canvas; geometry/colors are replicated and the
    band shift is folded into the pixel-unit geometry.

    Returns (H, W, C) with H = the padded n*hb band total; callers crop to
    canvas_hw[0]. The result is sharded P(axis_name) along H.
    """
    h, w = int(canvas_hw[0]), int(canvas_hw[1])
    n = mesh.shape[axis_name]
    hb = _cdiv(h, n)
    if max_box_px is not None:
        # per-band canvas is hb tall; the box bound clamps accordingly
        max_box_px = (min(float(max_box_px[0]), float(hb)),
                      float(max_box_px[1]))

    def band(geom, colors):
        i = jax.lax.axis_index(axis_name)
        y0 = (i * hb).astype(jnp.float32)
        g = geom.at[:, G_CY].add(-y0)
        g = g.at[:, G_YLO].add(-y0)
        g = g.at[:, G_YHI].add(-y0)
        return gs_render_px(g, colors, (hb, w), max_box_px=max_box_px, **kw)

    # check_vma=False: pallas_call out_shapes don't carry varying-mesh-axes
    # metadata, and the band function is genuinely device-varying (it reads
    # axis_index), so the rep check cannot apply anyway.
    fn = jax.shard_map(band, mesh=mesh, in_specs=(P(), P()),
                       out_specs=P(axis_name, None, None), check_vma=False)
    return fn(geom, colors)


def render_gaussians_banded(
    sr_size: Sequence[int],
    gs_parameters,
    scale,
    mesh: Mesh,
    *,
    axis_name: str = "data",
    default_step_size: float = DEFAULT_STEP_SIZE,
    if_dmax: bool = True,
    dmax_mode: str = "fix",
    dmax: float = 25.0,
):
    """Band-parallel equivalent of `rendering.render_gaussians` (same raw
    (N, 9) decoder-output convention). Returns (3, H, W)."""
    sr = (int(sr_size[0]), int(sr_size[1]))
    sigmas, kcoords, colors, fd, max_box_px = prepare_kernel_inputs(
        sr, gs_parameters, scale, default_step_size=default_step_size,
        if_dmax=if_dmax, dmax_mode=dmax_mode, dmax=dmax)
    geom = pack_geometry(sigmas, kcoords, sr, fd)
    img = gs_render_px_banded(geom, colors, sr, mesh, axis_name=axis_name,
                              max_box_px=max_box_px)
    return img[:sr[0]].transpose(2, 0, 1)


@functools.lru_cache(maxsize=None)
def _jitted_enc_dec(enc, dec):
    """Per-(enc, dec) cached jit — a fresh inner @jax.jit per call would
    re-trace/re-lower the full pipeline every image (10-90s per remote
    compile on the axon path; see model._jitted_apply)."""

    @jax.jit
    def enc_dec(enc_params, dec_params, x, scale_vec):
        feat = enc.apply({"params": enc_params}, x)
        return dec.apply({"params": dec_params}, feat, scale_vec)

    return enc_dec


def sr_forward_spatial(enc, dec, enc_params, dec_params, lq, scale: float,
                       mesh: Mesh, *, axis_name: str = "data",
                       denominator: int = 12, sr_size=None,
                       dmax_mode: str = "fix", dmax: float = 0.1):
    """Whole-image multi-chip SR inference: encoder/decoder under `jit`
    with the LR image sharded along H (XLA partitions the convs/attention
    and inserts halo collectives), then the band-parallel rasterizer.

    Single image only (B=1). Returns (1, H_sr, W_sr, 3).
    """
    import math

    from gsasr_tpu.model import pad_to_denominator

    b, h, w, _ = lq.shape
    assert b == 1, "spatial sharding targets single-image inference"
    if sr_size is None:
        sr_size = (math.floor(h * scale), math.floor(w * scale))
    padded, _ = pad_to_denominator(lq, denominator)
    ph, pw = padded.shape[1], padded.shape[2]
    pad_sr = (math.floor(ph * scale), math.floor(pw * scale))

    x_sharded = jax.device_put(
        padded, NamedSharding(mesh, P(None, axis_name, None, None)))
    rep = NamedSharding(mesh, P())

    gs = _jitted_enc_dec(enc, dec)(
        jax.device_put(enc_params, rep), jax.device_put(dec_params, rep),
        x_sharded, jnp.full((1,), scale, jnp.float32))
    gs = jax.device_put(gs, rep)  # replicate for the band render
    img = render_gaussians_banded(pad_sr, gs[0], jnp.float32(scale), mesh,
                                  axis_name=axis_name, dmax_mode=dmax_mode,
                                  dmax=dmax)
    img = img.transpose(1, 2, 0)[None]
    return img[:, :sr_size[0], :sr_size[1], :]


def render_training_batch_banded(
    gs_parameters,
    scales,
    gt_h,
    gt_w,
    canvas_hw,
    mesh: Mesh,
    *,
    data_axis: str = "data",
    band_axis: str = "band",
    default_step_size: float = DEFAULT_STEP_SIZE,
    if_dmax: bool = True,
    dmax_mode: str = "fix",
    dmax: float = 25.0,
):
    """2D-mesh training render: device (d, j) rasterizes horizontal band j
    of every sample in data-shard d's slot-stacked canvas (VERDICT r4 #6 —
    the BASELINE.json north star of sharding HR tiles AND Gaussian batches
    inside training, vs the reference's DP-only
    `basicsr/models/base_model.py:88-102`).

    gs_parameters (B, N, 9) sharded on `data_axis`; returns
    (B, ceil(Hmax/nb)*nb, Wmax, 3) sharded P(data, band) along (B, H) —
    crop rows to canvas_hw[0]. No collectives in the render: per-Gaussian
    cull boxes clamp everything outside a device's band to empty.
    """
    from gsasr_tpu.ops.rasterizer import GEOM_COLS, gs_render_px
    from gsasr_tpu.rendering import training_batch_geometry

    hmax, wmax = int(canvas_hw[0]), int(canvas_hw[1])
    nb = mesh.shape[band_axis]
    hb = _cdiv(hmax, nb)

    def local(gs_l, scales_l, gt_h_l, gt_w_l):
        j = jax.lax.axis_index(band_axis)
        b_l, n, _ = gs_l.shape
        geoms, colors, max_box_px = training_batch_geometry(
            gs_l, scales_l, gt_h_l, gt_w_l, (hmax, wmax),
            default_step_size=default_step_size, if_dmax=if_dmax,
            dmax_mode=dmax_mode, dmax=dmax,
            band_y0=(j * hb).astype(jnp.float32), slot_h=hb)
        canvas = gs_render_px(geoms.reshape(b_l * n, GEOM_COLS),
                              colors.reshape(b_l * n, 3), (b_l * hb, wmax),
                              max_box_px=max_box_px)
        return canvas.reshape(b_l, hb, wmax, 3)

    fn = jax.shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
        out_specs=P(data_axis, band_axis, None, None), check_vma=False)
    return fn(gs_parameters, jnp.asarray(scales, jnp.float32),
              jnp.asarray(gt_h), jnp.asarray(gt_w))
