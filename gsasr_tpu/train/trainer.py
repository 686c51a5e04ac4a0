"""Data-parallel GSASR trainer.

TPU re-design of `basicsr/models/gsasr_model.py` (GSASRModel) +
`basicsr/models/base_model.py`:

- two networks (encoder `net_g` + decoder `net_fea2gs`), one fused train
  step: encoder fwd -> decoder fwd -> batched canvas-stacked rendering ->
  masked L1 -> grads -> per-network clip-by-norm(5) -> Adam(2e-4, 0.9/0.99)
  with MultiStep x warmup schedule -> EMA(0.999) for both networks
  (`gsasr_model.py:175-280`, train yml `:94-122`);
- gradient accumulation via optax.MultiSteps (`accumulation_steps`);
- data parallelism: params replicated, batch sharded over the mesh 'data'
  axis; XLA inserts the gradient all-reduce over ICI (replaces DDP/NCCL,
  `base_model.py:88-102`);
- bf16 compute (AMP family, `gsasr_amp_model.py:208`) is a model-dtype
  switch — no GradScaler needed on TPU (bf16 has fp32-range exponent).

Checkpoints keep the reference's dual-key semantics ({params, params_ema},
`base_model.py:208-253`) via gsasr_tpu.utils.checkpoint.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence, Tuple

import flax.struct
import jax
import jax.numpy as jnp
import optax

from gsasr_tpu.parallel.mesh import (batch_sharding, make_mesh,
                                     replicated_sharding)
from gsasr_tpu.rendering import render_training_batch
from gsasr_tpu.train.losses import masked_l1, size_mask
from gsasr_tpu.train.schedules import multistep_warmup_schedule


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Paper recipe defaults
    (`options/train/paper/train_GSASR_EDSR-Baseline_paper_bicubic_x1_4.yml:
    94-122`)."""
    lr: float = 2e-4
    betas: Tuple[float, float] = (0.9, 0.99)
    milestones: Tuple[int, ...] = (250000, 400000, 450000, 475000)
    gamma: float = 0.5
    total_iter: int = 500000
    warmup_iter: int = 2000
    ema_decay: float = 0.999
    clip_grad_norm: Optional[float] = 5.0
    accumulation_steps: int = 1
    # rendering (train yml :18-20)
    default_step_size: float = 1.2
    dmax: float = 0.5
    dmax_mode: str = "fix"
    if_dmax: bool = True
    # canvas (gt_size_max from the dataset config)
    canvas_hw: Tuple[int, int] = (192, 192)
    # optional SSIM loss term (reference `gsasr_model.py:227-242`:
    # l_total = L1 + ssim_weight * (1 - SSIM)); 0 disables it.
    ssim_weight: float = 0.0
    # base seed for stochastic layers (droppath); threads the reference's
    # `manual_seed` into the per-step rng stream so seed-variation studies
    # draw different stochastic-depth masks. No host-id folding: the step
    # is one jit-global SPMD computation, so the key must be identical
    # across processes; per-sample decorrelation comes from the batch axis.
    seed: int = 0
    # r5 (VERDICT r4 #2): run the decoder's loss forward through the fused
    # Pallas layer kernels (ops/fused_layers.py custom VJPs, recompute-in-
    # VMEM backward) instead of the module path. Grad parity is asserted
    # by tests/test_fused_backward.py; the module path stays the default
    # until an on-chip step-time A/B picks a winner per family.
    fused_decoder: bool = False


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray
    params_g: Any
    params_d: Any
    ema_g: Any
    ema_d: Any
    opt_state: Any


class Trainer:
    """Functional trainer: `state = trainer.init(...)`,
    `state, metrics = trainer.step(state, batch)` (jitted, donates state).

    Batch dict (see gsasr_tpu.data): lq (B,h,w,3), gt (B,Hmax,Wmax,3),
    scale (B,), gt_h (B,), gt_w (B,) int32.
    """

    def __init__(self, enc, dec, config: TrainConfig = TrainConfig(),
                 mesh=None):
        self.enc = enc
        self.dec = dec
        self.cfg = config
        self.mesh = mesh if mesh is not None else make_mesh()
        self.schedule = multistep_warmup_schedule(
            config.lr, config.milestones, config.gamma, config.warmup_iter)
        tx = optax.adam(self.schedule, b1=config.betas[0], b2=config.betas[1])
        if config.accumulation_steps > 1:
            tx = optax.MultiSteps(tx, config.accumulation_steps)
        self.tx = tx

        self._step = jax.jit(
            self._step_impl,
            donate_argnums=(0,),
            in_shardings=(replicated_sharding(self.mesh),
                          batch_sharding(self.mesh)),
            out_shardings=(replicated_sharding(self.mesh),
                           replicated_sharding(self.mesh)),
        )

    # -- init ---------------------------------------------------------------

    def init(self, rng, lq_shape: Sequence[int]) -> TrainState:
        from gsasr_tpu.models.init import init_with_torch_defaults
        rng_g, rng_d = jax.random.split(rng)
        b, h, w, c = lq_shape
        # decoder input channels = encoder output channels; the decoder's
        # `inchannel` is authoritative across all encoder families
        feat_ch = getattr(self.dec, "inchannel",
                          getattr(self.enc, "num_feat", 64))
        # torch-faithful init (see models/init.py): flax defaults saturate
        # the Gaussian-parameter activations at production width.
        params_g = init_with_torch_defaults(
            self.enc, rng_g, jnp.zeros((1, h, w, c)))
        params_d = init_with_torch_defaults(
            self.dec, rng_d, jnp.zeros((1, h, w, feat_ch)), jnp.ones((1,)))
        opt_state = self.tx.init({"g": params_g, "d": params_d})
        # EMA trees must be distinct buffers: the jitted step donates the
        # state, and aliased params/ema leaves would be donated twice.
        copy = lambda tree: jax.tree_util.tree_map(jnp.copy, tree)
        state = TrainState(
            step=jnp.zeros((), jnp.int32),
            params_g=params_g, params_d=params_d,
            ema_g=copy(params_g), ema_d=copy(params_d),
            opt_state=opt_state)
        return jax.device_put(state, replicated_sharding(self.mesh))

    # -- one training step --------------------------------------------------

    def _dec_apply(self, params_d, feat, scales):
        if self.cfg.fused_decoder:
            from gsasr_tpu.models import Fea2GS, Fea2GSRopeAMP
            # bf16-family modules carry dtype=bfloat16; the fused path
            # mirrors it as bf16 trunk + fp32 UPNet/heads (a slightly
            # MORE precise tail than the module's bf16 UPNet — the
            # fp32-heads recipe either way).
            mdt = getattr(self.dec, "dtype", jnp.float32)
            fdt = None if mdt == jnp.float32 else mdt
            if isinstance(self.dec, Fea2GS):
                from gsasr_tpu.models.fea2gs_fast import fea2gs_apply_fused
                return fea2gs_apply_fused(self.dec, {"params": params_d},
                                          feat, scales, dtype=fdt)
            if isinstance(self.dec, Fea2GSRopeAMP):
                from gsasr_tpu.models.fea2gs_rope_fast import \
                    fea2gs_rope_apply_fused
                return fea2gs_rope_apply_fused(
                    self.dec, {"params": params_d}, feat, scales, dtype=fdt)
        return self.dec.apply({"params": params_d}, feat, scales)

    def _loss_fn(self, params, batch, rng):
        cfg = self.cfg
        if getattr(self.enc, "drop_path_rate", 0.0) > 0.0:
            # SwinIR/HAT train with stochastic depth (reference
            # `swinir.py:816, 877`); EDSR/RDN have no droppath arg.
            feat = self.enc.apply({"params": params["g"]}, batch["lq"],
                                  True, rngs={"droppath": rng})
        else:
            feat = self.enc.apply({"params": params["g"]}, batch["lq"])
        gs = self._dec_apply(params["d"], feat, batch["scale"])
        if "band" in self.mesh.axis_names:
            # 2D (data, band) mesh: each device rasterizes its data shard's
            # canvas band via the banded training render — spatial x data
            # parallelism in ONE step (VERDICT r4 #6). Rows are cropped
            # back from the band-padded canvas.
            from gsasr_tpu.parallel.spatial import \
                render_training_batch_banded
            out = render_training_batch_banded(
                gs, batch["scale"], batch["gt_h"], batch["gt_w"],
                cfg.canvas_hw, self.mesh,
                default_step_size=cfg.default_step_size,
                if_dmax=cfg.if_dmax, dmax_mode=cfg.dmax_mode, dmax=cfg.dmax)
            out = out[:, :cfg.canvas_hw[0]]
        else:
            out = render_training_batch(
                gs, batch["scale"], batch["gt_h"], batch["gt_w"],
                cfg.canvas_hw, default_step_size=cfg.default_step_size,
                if_dmax=cfg.if_dmax, dmax_mode=cfg.dmax_mode, dmax=cfg.dmax)
        if "sample_coords" in batch:
            # sparse supervision (`gsasr_model.py` sample_coords path):
            # gather K pixels per sample from the rendered canvas.
            coords = batch["sample_coords"]  # (B, K, 2) as (y, x)
            sampled = jax.vmap(
                lambda img, c: img[c[:, 0], c[:, 1], :])(out, coords)
            l_pix = jnp.abs(sampled - batch["gt_samples"]).mean()
            return l_pix, {"l_pix": l_pix}
        mask = size_mask(batch["gt_h"], batch["gt_w"], *cfg.canvas_hw)
        l_pix = masked_l1(out, batch["gt"], mask)
        if cfg.ssim_weight > 0.0:
            from gsasr_tpu.train.losses import ssim
            # SSIM over the masked canvas. Pure-padding windows give
            # ssim=1 (zero numerator); normalizing by the per-sample count
            # of fully-real windows keeps the term's magnitude equal to
            # the reference's per-crop `1 - ssim` (gsasr_model.py:227-242)
            # instead of diluting it by the canvas/crop area ratio.
            # Boundary windows straddling real/pad pixels remain a small
            # approximation vs the reference's exact crop.
            smap = ssim(out * mask, batch["gt"] * mask, reduce=False)
            win = 11
            # Per-sample mask over the valid-window lattice: window (i, j)
            # is fully inside the real crop iff i < gt_h-win+1 and
            # j < gt_w-win+1. Per-sample mean of (1-ssim) over its own
            # valid windows, then equal-weight average across the batch —
            # matching the reference's per-crop SSIMLoss + /b averaging
            # (gsasr_model.py:227-242) so larger crops in a mixed-scale
            # batch are not overweighted.
            wh, ww = smap.shape[1], smap.shape[2]
            iy = jnp.arange(wh)[None, :, None, None]
            ix = jnp.arange(ww)[None, None, :, None]
            vh = jnp.asarray(batch["gt_h"], jnp.int32)[:, None, None, None]
            vw = jnp.asarray(batch["gt_w"], jnp.int32)[:, None, None, None]
            wmask = ((iy < vh - (win - 1)) & (ix < vw - (win - 1))
                     ).astype(smap.dtype)  # (B, wh, ww, 1)
            num = jnp.sum((1.0 - smap) * wmask, axis=(1, 2, 3))
            den = jnp.sum(wmask, axis=(1, 2, 3)) * smap.shape[-1]
            per_sample = num / jnp.maximum(den, 1.0)
            l_ssim = cfg.ssim_weight * per_sample.mean()
            return l_pix + l_ssim, {"l_pix": l_pix, "l_ssim": l_ssim}
        return l_pix, {"l_pix": l_pix}

    def _step_impl(self, state: TrainState, batch):
        cfg = self.cfg
        params = {"g": state.params_g, "d": state.params_d}
        # per-step droppath stream, deterministic in (manual_seed, step)
        rng = jax.random.fold_in(
            jax.random.fold_in(jax.random.PRNGKey(17), cfg.seed), state.step)
        (loss, metrics), grads = jax.value_and_grad(
            self._loss_fn, has_aux=True)(params, batch, rng)

        if cfg.clip_grad_norm is not None:
            # Reference clips each network separately
            # (`gsasr_model.py:250-252`).
            def clip(tree):
                norm = optax.global_norm(tree)
                scale = jnp.minimum(1.0, cfg.clip_grad_norm / (norm + 1e-12))
                return jax.tree_util.tree_map(lambda x: x * scale, tree), norm

            g_g, norm_g = clip(grads["g"])
            g_d, norm_d = clip(grads["d"])
            grads = {"g": g_g, "d": g_d}
            metrics = dict(metrics, grad_norm_g=norm_g, grad_norm_d=norm_d)

        updates, opt_state = self.tx.update(grads, state.opt_state, params)
        params = optax.apply_updates(params, updates)

        d = cfg.ema_decay
        ema_g = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), state.ema_g, params["g"])
        ema_d = jax.tree_util.tree_map(
            lambda e, p: e * d + p * (1.0 - d), state.ema_d, params["d"])

        metrics = dict(metrics, loss=loss, lr=self.schedule(state.step))
        new_state = state.replace(
            step=state.step + 1, params_g=params["g"], params_d=params["d"],
            ema_g=ema_g, ema_d=ema_d, opt_state=opt_state)
        return new_state, metrics

    def step(self, state: TrainState, batch):
        return self._step(state, batch)
