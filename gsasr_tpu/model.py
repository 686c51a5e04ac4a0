"""End-to-end GSASR model assembly: encoder -> Fea2GS -> rasterizer.

Mirrors the single-image inference path (`/root/reference/inference_paper.py:
79-141`): reflect-pad the LR image to a denominator multiple, run encoder and
decoder, render at floor(scale * HW), crop.

jit notes: output size depends on (lr_shape, scale) — both static per call
site. For training, the data pipeline pads GT to gt_size_max so one
compilation serves the whole run.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gsasr_tpu.models import (EDSRNOUP, Fea2GS, Fea2GSRopeAMP, HATNOUP,
                              RDNNOUP, SwinIRNOUP)
from gsasr_tpu.rendering import render_gaussians

# Denominator = window_size * lcm considerations per encoder
# (`inference_paper.py:112-118`): 12 for EDSR/RDN, 24 for SwinIR.
DENOMINATORS = {"edsr": 12, "rdn": 12, "swinir": 24, "hat": 16}


def pad_to_denominator(img, denom: int):
    """Reflect-pad (B, H, W, C) so H and W are multiples of denom
    (`gsasr_model.py:363-375`). Returns (padded, (h, w))."""
    b, h, w, c = img.shape
    ph = (denom - h % denom) % denom
    pw = (denom - w % denom) % denom
    if ph or pw:
        img = jnp.pad(img, ((0, 0), (0, ph), (0, pw), (0, 0)),
                      mode="reflect")
    return img, (h, w)


def make_models(encoder: str = "edsr", version: str = "paper", *,
                dtype=jnp.float32, decoder_kwargs: Optional[dict] = None):
    """Build (encoder_module, decoder_module) for a named config.

    version: 'paper' (Fea2GS decoder) or 'enhanced'/'ultra'
    (Fea2GSRopeAMP with the per-backbone configs of
    `inference_enhenced.py:40-52`).
    """
    decoder_kwargs = dict(decoder_kwargs or {})
    encoders = {
        "edsr": EDSRNOUP,
        "rdn": RDNNOUP,
        "swinir": SwinIRNOUP,
        "hat": HATNOUP,
    }
    if encoder not in encoders:
        raise NotImplementedError(f"encoder '{encoder}'")
    enc = encoders[encoder](dtype=dtype)

    if version == "paper":
        dec = Fea2GS(dtype=dtype, **decoder_kwargs)
    else:
        enhanced_cfg = {
            "edsr": {},
            "rdn": dict(num_crossattn_blocks=2),
            "swinir": dict(num_crossattn_blocks=2, num_crossattn_layers=4,
                           num_gs_seed=256, window_size=16),
            "hat": dict(channel=192, num_crossattn_blocks=4,
                        num_crossattn_layers=4, num_selfattn_blocks=8,
                        num_selfattn_layers=6, num_gs_seed=256,
                        window_size=16),
        }[encoder]
        enhanced_cfg.update(decoder_kwargs)
        dec = Fea2GSRopeAMP(dtype=dtype, **enhanced_cfg)
    return enc, dec


@functools.lru_cache(maxsize=None)
def _use_fused_decoder() -> bool:
    # Paper-decoder inference rides the fused-layer Pallas fast path
    # (models/fea2gs_fast.py) by default: same params, exact parity tests,
    # identical val PSNR (20.9917 both paths, BENCH_NOTES r4), decoder
    # stage -26% net / e2e 187.5 -> 167.6 ms measured on-chip.
    # GSASR_FUSED_DECODER=0 restores the module path.
    import os
    return os.environ.get("GSASR_FUSED_DECODER", "1") == "1"


def _fused_dtype(module):
    """Trunk dtype of the fused decoder fast path.

    GSASR_FUSED_DTYPE=bfloat16|float32 overrides; otherwise the paper
    family stays fp32 (its eval protocol) while the Enhanced/Ultra family
    defaults to bf16-trunk + fp32 heads — the reference's AMP semantics
    (`gsasr_amp_model.py:208`, `inference_enhenced.py --AMP_test`;
    VERDICT r4 #3)."""
    import os
    env = os.environ.get("GSASR_FUSED_DTYPE", "")
    if env in ("bfloat16", "bf16"):
        return jnp.bfloat16
    if env in ("float32", "fp32"):
        return None
    return jnp.bfloat16 if isinstance(module, Fea2GSRopeAMP) else None


def _fused_decoder_apply(module):
    """Fused fast-path apply fn for a decoder module, or None."""
    if not _use_fused_decoder():
        return None
    if isinstance(module, Fea2GS):
        from gsasr_tpu.models.fea2gs_fast import fea2gs_apply_fused
        fn = fea2gs_apply_fused
    elif isinstance(module, Fea2GSRopeAMP):
        from gsasr_tpu.models.fea2gs_rope_fast import fea2gs_rope_apply_fused
        fn = fea2gs_rope_apply_fused
    else:
        return None
    fdt = _fused_dtype(module)
    return lambda params, *xs: fn(module, {"params": params}, *xs, dtype=fdt)


def _jitted_apply(module):
    """Per-module cached jit of `module.apply` (modules are frozen
    dataclasses, hence hashable). Stage-wise jits keep each compiled
    program small — one monolithic jit of the whole pipeline compiles
    pathologically slowly through the axon remote-compile path."""
    fused = _fused_decoder_apply(module)
    if fused is not None:
        return jax.jit(fused)
    return jax.jit(lambda params, *xs: module.apply({"params": params}, *xs))


def _lat_hw(dec, ph: int, pw: int):
    """Static decoder-lattice dims for a (ph, pw) input — enables the
    zero-cost static anchor permutation for rectangular images."""
    import math as _m
    try:
        f = (int(_m.isqrt(dec.num_gs_seed)) / dec.window_size
             * dec.shuffle_scale1 * dec.shuffle_scale2)
        lh, lw = int(round(ph * f)), int(round(pw * f))
        return (lh, lw) if lh > 0 and lw > 0 else None
    except AttributeError:
        return None


@functools.lru_cache(maxsize=None)
def _jitted_render(scale: float, dmax_mode: str, dmax: float,
                   use_pallas: bool, lat_hw=None):
    # NOTE: batching via lax/vmap over the pallas rasterizer is deliberately
    # avoided (vmap of pallas_call compiles pathologically through the
    # remote-compile path); the batch dim is scanned as a python loop —
    # inference batches are tiny and each iteration reuses one compiled
    # program.
    @functools.partial(jax.jit, static_argnames=("hw",))
    def render_one(g, hw):
        return render_gaussians(hw, g, jnp.float32(scale),
                                dmax_mode=dmax_mode, dmax=dmax,
                                use_pallas=use_pallas, lat_hw=lat_hw)

    def render_all(gs, hw):
        return jnp.stack([render_one(gs[i], hw)
                          for i in range(gs.shape[0])])

    return render_all


@functools.lru_cache(maxsize=None)
def _jitted_pipeline(enc, dec, scale: float, dmax_mode: str, dmax: float,
                     sr_hw: Tuple[int, int]):
    """One fused jit of encoder + decoder + per-sample render: a single
    device dispatch per image (the stage-wise path costs one tunnel
    round-trip per stage on axon)."""

    dec_apply = _fused_decoder_apply(dec)
    if dec_apply is None:
        dec_apply = lambda p, f, s: dec.apply({"params": p}, f, s)

    @jax.jit
    def fused(enc_params, dec_params, padded):
        feat = enc.apply({"params": enc_params}, padded)
        b = padded.shape[0]
        gs = dec_apply(dec_params, feat,
                       jnp.full((b,), scale, jnp.float32))
        lat = _lat_hw(dec, padded.shape[1], padded.shape[2])
        imgs = [render_gaussians(sr_hw, gs[i], jnp.float32(scale),
                                 dmax_mode=dmax_mode, dmax=dmax, lat_hw=lat)
                for i in range(b)]
        return jnp.stack(imgs)

    return fused


def sr_forward(enc, dec, enc_params, dec_params, lq, scale: float,
               *, sr_size: Optional[Tuple[int, int]] = None,
               denominator: int = 12, dmax_mode: str = "fix",
               dmax: float = 0.1, use_pallas: bool = True,
               fused: bool = False):
    """Full-image SR forward for one batch at one scale.

    Args:
      lq: (B, H, W, 3) in [0, 1].
      scale: python float scale factor.
      sr_size: target (H_sr, W_sr); default floor(scale * HW)
        (`inference_paper.py:91`).
      fused: one monolithic jit instead of stage-wise jits — fewer device
        dispatches per image (compiles slower the first time).

    Returns (B, H_sr, W_sr, 3).
    """
    b, h, w, _ = lq.shape
    if sr_size is None:
        sr_size = (math.floor(h * scale), math.floor(w * scale))
    padded, _ = pad_to_denominator(lq, denominator)
    ph, pw = padded.shape[1], padded.shape[2]
    # Render on the padded canvas at floor(scale * padded), then crop to the
    # unpadded target (`inference_paper.py:113-114, 135`).
    pad_sr = (math.floor(ph * scale), math.floor(pw * scale))

    if fused and use_pallas:
        img = _jitted_pipeline(enc, dec, float(scale), dmax_mode,
                               float(dmax), pad_sr)(
            enc_params, dec_params, padded)
    else:
        feat = _jitted_apply(enc)(enc_params, padded)
        scales = jnp.full((b,), scale, jnp.float32)
        gs = _jitted_apply(dec)(dec_params, feat, scales)
        img = _jitted_render(float(scale), dmax_mode, float(dmax),
                             use_pallas, _lat_hw(dec, ph, pw))(
            gs, pad_sr)  # (B, 3, H, W)
    img = img.transpose(0, 2, 3, 1)
    return img[:, :sr_size[0], :sr_size[1], :]
