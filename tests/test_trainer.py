"""Trainer smoke tests on a virtual 8-device CPU mesh (data parallelism)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest


def _tiny_setup():
    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = EDSRNOUP(num_feat=16, num_block=1)
    dec = Fea2GS(inchannel=16, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4,
                 shuffle_scale1=2, shuffle_scale2=2)
    cfg = TrainConfig(canvas_hw=(32, 32), warmup_iter=2,
                      milestones=(100,), accumulation_steps=1)
    return enc, dec, cfg


def _tiny_batch(rng, b, lr_size=8, canvas=32):
    scales = 2.0 + 2.0 * rng.random(b).astype(np.float32)
    gt_h = np.round(scales * lr_size).astype(np.int32)
    gt_w = np.round(scales * lr_size).astype(np.int32)
    return {
        "lq": jnp.asarray(rng.random((b, lr_size, lr_size, 3),
                                     dtype=np.float32)),
        "gt": jnp.asarray(rng.random((b, canvas, canvas, 3),
                                     dtype=np.float32)),
        "scale": jnp.asarray(scales),
        "gt_h": jnp.asarray(gt_h),
        "gt_w": jnp.asarray(gt_w),
    }


def test_train_step_runs_and_updates(rng):
    from gsasr_tpu.train import Trainer

    enc, dec, cfg = _tiny_setup()
    trainer = Trainer(enc, dec, cfg)
    assert len(jax.devices()) == 8  # conftest forces the virtual mesh

    state = trainer.init(jax.random.PRNGKey(0), (8, 8, 8, 3))
    # snapshot before stepping: the step donates (deletes) the input state
    leaf0 = np.asarray(jax.tree_util.tree_leaves(state.params_g)[0])
    batch = _tiny_batch(rng, 8)
    state2, metrics = trainer.step(state, batch)
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # params changed
    leaf1 = jax.tree_util.tree_leaves(state2.params_g)[0]
    assert not np.allclose(np.asarray(leaf0), np.asarray(leaf1))
    # EMA moved toward params but not equal
    e1 = jax.tree_util.tree_leaves(state2.ema_g)[0]
    assert not np.allclose(np.asarray(e1), np.asarray(leaf1))

    # second step with a different scale distribution — same compiled fn
    batch2 = _tiny_batch(rng, 8)
    state3, m2 = trainer.step(state2, batch2)
    assert int(state3.step) == 2
    assert np.isfinite(float(m2["loss"]))


def test_loss_decreases_on_fixed_batch(rng):
    """Overfit a single tiny batch for a few steps: loss must go down."""
    from gsasr_tpu.train import TrainConfig, Trainer

    enc, dec, _ = _tiny_setup()
    cfg = TrainConfig(canvas_hw=(32, 32), lr=5e-3, warmup_iter=-1,
                      milestones=(10000,))
    trainer = Trainer(enc, dec, cfg)
    state = trainer.init(jax.random.PRNGKey(1), (8, 8, 8, 3))
    batch = _tiny_batch(rng, 8)
    losses = []
    for _ in range(8):
        state, metrics = trainer.step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def test_masked_loss_matches_cropped(rng):
    from gsasr_tpu.train.losses import masked_l1, size_mask

    pred = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    tgt = jnp.asarray(rng.random((2, 16, 16, 3), dtype=np.float32))
    hs = jnp.asarray(np.int32([10, 16]))
    ws = jnp.asarray(np.int32([12, 16]))
    m = size_mask(hs, ws, 16, 16)
    got = float(masked_l1(pred, tgt, m))
    want = 0.5 * (
        np.abs(np.asarray(pred[0, :10, :12]) - np.asarray(tgt[0, :10, :12])).mean()
        + np.abs(np.asarray(pred[1]) - np.asarray(tgt[1])).mean())
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_train_step_bf16_amp_family(rng):
    """GSASRAMPModel equivalent: bf16 compute dtype modules, fp32 params,
    no GradScaler (TPU bf16 keeps fp32 exponent range)."""
    import jax
    import jax.numpy as jnp
    from gsasr_tpu.models import EDSRNOUP, Fea2GSRopeAMP
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = EDSRNOUP(num_feat=16, num_block=1, dtype=jnp.bfloat16)
    # head_dim must be >= 4 for the RoPE frequency construction
    dec = Fea2GSRopeAMP(inchannel=16, channel=24, num_heads=6,
                        num_crossattn_blocks=1, num_crossattn_layers=1,
                        num_selfattn_blocks=1, num_selfattn_layers=1,
                        num_gs_seed=16, window_size=4, dtype=jnp.bfloat16)
    cfg = TrainConfig(canvas_hw=(32, 32), warmup_iter=-1, milestones=(100,))
    tr = Trainer(enc, dec, cfg)
    state = tr.init(jax.random.PRNGKey(0), (8, 8, 8, 3))
    # params stay fp32
    leaf = jax.tree_util.tree_leaves(state.params_d)[0]
    assert leaf.dtype == jnp.float32
    b = _tiny_batch(rng, 8)  # batch must divide the 8-device mesh
    state, m = tr.step(state, b)
    assert np.isfinite(float(m["loss"]))


def test_sparse_sample_coords_training(rng):
    """Sparse supervision path: loss on K sampled pixels per sample."""
    import jax
    import jax.numpy as jnp
    enc, dec, cfg = _tiny_setup()
    from gsasr_tpu.train import Trainer
    tr = Trainer(enc, dec, cfg)
    state = tr.init(jax.random.PRNGKey(0), (8, 8, 8, 3))

    scales = 2.0 + rng.random(8).astype(np.float32)
    gh = np.ceil(scales * 8).astype(np.int32)
    k = 16
    coords = np.stack([rng.integers(0, 16, (8, k)),
                       rng.integers(0, 16, (8, k))], -1).astype(np.int32)
    batch = {
        "lq": jnp.asarray(rng.random((8, 8, 8, 3), dtype=np.float32)),
        "sample_coords": jnp.asarray(coords),
        "gt_samples": jnp.asarray(rng.random((8, k, 3), dtype=np.float32)),
        "scale": jnp.asarray(scales),
        "gt_h": jnp.asarray(gh), "gt_w": jnp.asarray(gh),
    }
    state, m = tr.step(state, batch)
    assert np.isfinite(float(m["loss"]))


def test_train_step_with_ssim_loss(rng):
    """Optional SSIM loss term (reference gsasr_model.py:227-242)."""
    import jax
    import jax.numpy as jnp
    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = EDSRNOUP(num_feat=8, num_block=1)
    dec = Fea2GS(inchannel=8, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4)
    from gsasr_tpu.parallel.mesh import make_mesh
    cfg = TrainConfig(canvas_hw=(24, 24), warmup_iter=-1, milestones=(100,),
                      ssim_weight=0.1)
    tr = Trainer(enc, dec, cfg, mesh=make_mesh(jax.devices()[:1]))
    state = tr.init(jax.random.PRNGKey(0), (2, 8, 8, 3))
    scales = np.asarray([2.0, 2.5], np.float32)
    batch = {
        "lq": jnp.asarray(rng.random((2, 8, 8, 3), dtype=np.float32)),
        "gt": jnp.asarray(rng.random((2, 24, 24, 3), dtype=np.float32)),
        "scale": jnp.asarray(scales),
        "gt_h": jnp.asarray(np.round(scales * 8).astype(np.int32)),
        "gt_w": jnp.asarray(np.round(scales * 8).astype(np.int32)),
    }
    state, metrics = tr.step(state, batch)
    assert np.isfinite(float(metrics["loss"]))
    assert "l_ssim" in metrics and float(metrics["l_ssim"]) > 0


def test_build_networks_all_families():
    """Yaml -> modules across the registry surface (reference
    ARCH_REGISTRY parity for training configs)."""
    import jax.numpy as jnp
    from gsasr_tpu.config import build_networks

    for gtype, extra_g in [("EDSRNOUP", {"num_feat": 8, "num_block": 1}),
                           ("RDNNOUP", {}), ("SwinIRNOUP", {}),
                           ("HATNOUP_ROPE_AMP", {})]:
        for dt in ("Fea2GS", "Fea2GS_ROPE_AMP"):
            opt = {"network_g": {"type": gtype, **extra_g},
                   "network_fea2gs": {"type": dt}}
            enc, dec = build_networks(opt)
            assert enc is not None and dec is not None

    # model_dtype selects the bf16 family
    opt = {"model_dtype": "bfloat16",
           "network_g": {"type": "EDSRNOUP", "num_feat": 8, "num_block": 1},
           "network_fea2gs": {"type": "Fea2GS"}}
    enc, dec = build_networks(opt)
    assert enc.dtype == jnp.bfloat16 and dec.dtype == jnp.bfloat16


def test_load_pretrained_params_orbax(tmp_path, rng):
    """pretrain_network_* loading from an orbax step dir (reference
    train.py:132-142 finetune entry)."""
    import jax
    import jax.numpy as jnp
    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.parallel.mesh import make_mesh
    from gsasr_tpu.train import TrainConfig, Trainer
    from gsasr_tpu.utils.checkpoint import (load_pretrained_params,
                                            save_checkpoint)

    enc = EDSRNOUP(num_feat=8, num_block=1)
    dec = Fea2GS(inchannel=8, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4)
    cfg = TrainConfig(canvas_hw=(16, 16), warmup_iter=-1, milestones=(10,))
    tr = Trainer(enc, dec, cfg, mesh=make_mesh(jax.devices()[:1]))
    state = tr.init(jax.random.PRNGKey(0), (1, 8, 8, 3))
    save_checkpoint(tmp_path / "ck", 7, state)

    pg = load_pretrained_params(str(tmp_path / "ck" / "7"), "edsr")
    pd = load_pretrained_params(str(tmp_path / "ck" / "7"), "fea2gs")
    for loaded, ref in ((pg, state.params_g), (pd, state.params_d)):
        la = jax.tree_util.tree_leaves(loaded)
        lb = jax.tree_util.tree_leaves(ref)
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert load_pretrained_params(None, "edsr") is None


def test_train_step_fused_decoder_matches_module(rng):
    """One training step with cfg.fused_decoder=True (decoder loss forward
    + backward through the fused Pallas layer kernels, VERDICT r4 #2) must
    track the module-path step: same loss and near-identical updated
    parameters from identical init."""
    import dataclasses

    from gsasr_tpu.train import Trainer

    enc, dec, cfg = _tiny_setup()
    batch = _tiny_batch(rng, 8)

    results = []
    for fused in (False, True):
        cfg_i = dataclasses.replace(cfg, fused_decoder=fused)
        trainer = Trainer(enc, dec, cfg_i)
        state = trainer.init(jax.random.PRNGKey(0), (8, 8, 8, 3))
        state2, metrics = trainer.step(state, batch)
        results.append((float(metrics["loss"]),
                        jax.tree_util.tree_leaves(state2.params_d)))
    (l_mod, p_mod), (l_fused, p_fused) = results
    np.testing.assert_allclose(l_fused, l_mod, rtol=1e-5)
    for a, b in zip(p_fused, p_mod):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=5e-3)
