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
