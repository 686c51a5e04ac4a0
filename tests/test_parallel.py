"""Data-parallel consistency: the same batch must produce (numerically) the
same updated parameters on a 1-device and an 8-device mesh — XLA inserts the
gradient all-reduce; only summation order may differ."""

import jax
import numpy as np


def test_dp_consistency(rng):
    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.parallel.mesh import make_mesh
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = EDSRNOUP(num_feat=8, num_block=1)
    dec = Fea2GS(inchannel=8, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4)
    cfg = TrainConfig(canvas_hw=(24, 24), warmup_iter=-1, milestones=(100,))

    import jax.numpy as jnp
    scales = 1.5 + rng.random(8).astype(np.float32)
    gh = np.ceil(scales * 8).astype(np.int32)
    batch = {
        "lq": jnp.asarray(rng.random((8, 8, 8, 3), dtype=np.float32)),
        "gt": jnp.asarray(rng.random((8, 24, 24, 3), dtype=np.float32)),
        "scale": jnp.asarray(scales),
        "gt_h": jnp.asarray(gh),
        "gt_w": jnp.asarray(gh),
    }

    outs = []
    for n_dev in (1, 8):
        mesh = make_mesh(jax.devices()[:n_dev])
        tr = Trainer(enc, dec, cfg, mesh=mesh)
        state = tr.init(jax.random.PRNGKey(0), (8, 8, 8, 3))
        state, metrics = tr.step(state, batch)
        outs.append((float(metrics["loss"]),
                     np.asarray(jax.tree_util.tree_leaves(state.params_d)[0])))

    assert abs(outs[0][0] - outs[1][0]) < 1e-5, (outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4, atol=1e-6)


def test_banded_render_matches_single(rng):
    """Band-sharded rasterization over 8 virtual devices must reproduce the
    single-device render (same Gaussians, same canvas)."""
    import jax.numpy as jnp
    from gsasr_tpu.parallel.mesh import make_mesh
    from gsasr_tpu.parallel.spatial import render_gaussians_banded
    from gsasr_tpu.rendering import render_gaussians

    n = 4096
    gp = jnp.asarray(0.1 * rng.standard_normal((n, 9)).astype(np.float32))
    sr = (96, 64)
    single = render_gaussians(sr, gp, jnp.float32(3.0), dmax_mode="fix",
                              dmax=0.2)
    mesh = make_mesh(jax.devices()[:8])
    banded = render_gaussians_banded(sr, gp, jnp.float32(3.0), mesh,
                                     dmax_mode="fix", dmax=0.2)
    assert banded.shape == single.shape
    np.testing.assert_allclose(np.asarray(banded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


def test_banded_render_uneven_bands(rng):
    """H not divisible by the device count: bands pad internally, output
    crops exactly."""
    import jax.numpy as jnp
    from gsasr_tpu.parallel.mesh import make_mesh
    from gsasr_tpu.parallel.spatial import render_gaussians_banded
    from gsasr_tpu.rendering import render_gaussians

    n = 2048
    gp = jnp.asarray(0.1 * rng.standard_normal((n, 9)).astype(np.float32))
    sr = (90, 130)
    single = render_gaussians(sr, gp, jnp.float32(2.5), dmax_mode="fix",
                              dmax=0.3)
    mesh = make_mesh(jax.devices()[:8])
    banded = render_gaussians_banded(sr, gp, jnp.float32(2.5), mesh,
                                     dmax_mode="fix", dmax=0.3)
    assert banded.shape == single.shape
    np.testing.assert_allclose(np.asarray(banded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)


def test_sr_forward_spatial_matches(rng):
    """Whole-pipeline spatial sharding (encoder/decoder H-sharded via jit,
    band-parallel render) vs the plain single-device sr_forward."""
    import jax.numpy as jnp
    from gsasr_tpu.model import sr_forward
    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.parallel.mesh import make_mesh
    from gsasr_tpu.parallel.spatial import sr_forward_spatial

    enc = EDSRNOUP(num_feat=8, num_block=1)
    dec = Fea2GS(inchannel=8, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4)
    key = jax.random.PRNGKey(0)
    lq = jnp.asarray(rng.random((1, 24, 24, 3), dtype=np.float32))
    ep = enc.init(key, lq)["params"]
    dp = dec.init(key, jnp.zeros((1, 24, 24, 8)), jnp.ones((1,)))["params"]

    ref = sr_forward(enc, dec, ep, dp, lq, 2.0, denominator=4,
                     dmax=0.3)
    mesh = make_mesh(jax.devices()[:8])
    out = sr_forward_spatial(enc, dec, ep, dp, lq, 2.0, mesh,
                             denominator=4, dmax=0.3)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_2d_mesh_training_step_matches_1d(rng):
    """(data, band) 2x4 mesh training step vs the 1D 8-device DP step:
    identical init + batch must produce matching loss and parameters
    (VERDICT r4 #6 — data x spatial parallelism composed in ONE step)."""
    import jax.numpy as jnp

    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = EDSRNOUP(num_feat=8, num_block=1)
    dec = Fea2GS(inchannel=8, channel=12, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=1,
                 num_gs_seed=16, window_size=4)
    cfg = TrainConfig(canvas_hw=(24, 24), warmup_iter=-1, milestones=(100,))

    scales = 1.5 + rng.random(8).astype(np.float32)
    gh = np.ceil(scales * 8).astype(np.int32)
    batch = {
        "lq": jnp.asarray(rng.random((8, 8, 8, 3), dtype=np.float32)),
        "gt": jnp.asarray(rng.random((8, 24, 24, 3), dtype=np.float32)),
        "scale": jnp.asarray(scales),
        "gt_h": jnp.asarray(gh),
        "gt_w": jnp.asarray(gh),
    }

    outs = []
    for mesh in (make_mesh(jax.devices()[:8]), make_mesh_2d(2, 4)):
        tr = Trainer(enc, dec, cfg, mesh=mesh)
        state = tr.init(jax.random.PRNGKey(0), (8, 8, 8, 3))
        state, metrics = tr.step(state, batch)
        outs.append((float(metrics["loss"]),
                     np.asarray(jax.tree_util.tree_leaves(state.params_d)[0])))

    assert abs(outs[0][0] - outs[1][0]) < 1e-5, (outs[0][0], outs[1][0])
    np.testing.assert_allclose(outs[0][1], outs[1][1], rtol=1e-4, atol=1e-6)


def test_banded_training_render_matches_single(rng):
    """render_training_batch_banded on a (2, 4) mesh == the single-device
    slot-stacked canvas, including the uneven final band and per-sample
    gt-size masking."""
    import jax.numpy as jnp

    from gsasr_tpu.parallel.mesh import make_mesh_2d
    from gsasr_tpu.parallel.spatial import render_training_batch_banded
    from gsasr_tpu.rendering import render_training_batch

    mesh = make_mesh_2d(2, 4)
    b, n = 4, 256
    gp = jnp.asarray(0.3 * rng.standard_normal((b, n, 9)).astype(np.float32))
    scales = jnp.asarray(1.5 + rng.random(b).astype(np.float32))
    gh = jnp.asarray(np.array([22, 17, 20, 19], np.int32))
    gw = jnp.asarray(np.array([21, 22, 18, 22], np.int32))
    canvas = (22, 22)  # 22 rows over 4 bands: uneven last band (22=3*6+4)

    single = render_training_batch(gp, scales, gh, gw, canvas,
                                   dmax_mode="fix", dmax=0.5)
    banded = render_training_batch_banded(gp, scales, gh, gw, canvas, mesh,
                                          dmax_mode="fix", dmax=0.5)
    banded = banded[:, :canvas[0]]
    np.testing.assert_allclose(np.asarray(banded), np.asarray(single),
                               rtol=1e-5, atol=1e-6)
