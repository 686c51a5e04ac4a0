"""Stochastic depth (DropPath) behavior for SwinIR/HAT training
(VERDICT r2 ask #7; reference `utils/swinir.py:96-122, 877`).

- eval (train=False, the default) is deterministic and identical to the
  pre-DropPath module — inference/conversion parity unchanged;
- train=True with a 'droppath' rng produces sample-dependent variance;
- the linspace decay rule assigns rate 0 to the first block.
"""

import jax
import jax.numpy as jnp
import numpy as np


def _tiny_swinir(**over):
    from gsasr_tpu.models import SwinIRNOUP

    kw = dict(embed_dim=16, depths=(2, 2), num_heads=(2, 2),
              window_size=4, drop_path_rate=0.5)
    kw.update(over)
    return SwinIRNOUP(**kw)


def test_droppath_eval_deterministic_and_rate_independent():
    m = _tiny_swinir()
    m0 = _tiny_swinir(drop_path_rate=0.0)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 3),
                                                    dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    a = m.apply({"params": params}, x)
    b = m.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rate is irrelevant at eval: same params give same output at rate 0
    c = m0.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_droppath_train_stochastic():
    m = _tiny_swinir()
    x = jnp.asarray(np.random.default_rng(0).random((4, 8, 8, 3),
                                                    dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    a = m.apply({"params": params}, x, True,
                rngs={"droppath": jax.random.PRNGKey(1)})
    b = m.apply({"params": params}, x, True,
                rngs={"droppath": jax.random.PRNGKey(2)})
    # different rng streams -> different outputs (branches dropped
    # per-sample)
    assert float(jnp.abs(a - b).max()) > 0.0
    # and train-mode differs from eval for at least some samples
    ev = m.apply({"params": params}, x)
    assert float(jnp.abs(a - ev).max()) > 0.0


def test_droppath_hat_train_stochastic():
    from gsasr_tpu.models import HATNOUP

    m = HATNOUP(embed_dim=16, depths=(2,), num_heads=(2,), window_size=4,
                squeeze_factor=4, drop_path_rate=0.5)
    x = jnp.asarray(np.random.default_rng(0).random((2, 8, 8, 3),
                                                    dtype=np.float32))
    params = m.init(jax.random.PRNGKey(0), x)["params"]
    ev = m.apply({"params": params}, x)
    tr = m.apply({"params": params}, x, True,
                 rngs={"droppath": jax.random.PRNGKey(3)})
    assert float(jnp.abs(tr - ev).max()) > 0.0
    ev2 = m.apply({"params": params}, x)
    np.testing.assert_array_equal(np.asarray(ev), np.asarray(ev2))


def test_trainer_threads_droppath_rng():
    """A training step on a droppath encoder must run (rng threaded) and
    produce finite loss."""
    from gsasr_tpu.models import Fea2GS
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = _tiny_swinir(num_feat=64)
    dec = Fea2GS(inchannel=64, channel=24, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=2,
                 num_selfattn_blocks=1, num_selfattn_layers=2,
                 num_gs_seed=16, window_size=4)
    cfg = TrainConfig(total_iter=10, warmup_iter=-1, canvas_hw=(16, 16),
                      milestones=(100,))
    tr = Trainer(enc, dec, cfg)
    rng = np.random.default_rng(0)
    b = 8  # divisible by the 8-device virtual test mesh
    state = tr.init(jax.random.PRNGKey(0), (b, 8, 8, 3))
    batch = {
        "lq": jnp.asarray(rng.random((b, 8, 8, 3), dtype=np.float32)),
        "gt": jnp.asarray(rng.random((b, 16, 16, 3), dtype=np.float32)),
        "scale": jnp.full((b,), 2.0, jnp.float32),
        "gt_h": jnp.full((b,), 16, jnp.int32),
        "gt_w": jnp.full((b,), 16, jnp.int32),
    }
    state, metrics = tr.step(state, batch)
    assert np.isfinite(float(metrics["loss"]))


def test_trainer_droppath_respects_manual_seed():
    """Two `manual_seed`s must draw different stochastic-depth masks
    (VERDICT r3 weak #6: the stream used to be pinned to PRNGKey(17))."""
    import dataclasses

    from gsasr_tpu.models import Fea2GS
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = _tiny_swinir(num_feat=64)
    dec = Fea2GS(inchannel=64, channel=24, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=2,
                 num_selfattn_blocks=1, num_selfattn_layers=2,
                 num_gs_seed=16, window_size=4)
    cfg = TrainConfig(total_iter=10, warmup_iter=-1, canvas_hw=(16, 16),
                      milestones=(100,))
    tr0 = Trainer(enc, dec, cfg)
    tr1 = Trainer(enc, dec, dataclasses.replace(cfg, seed=1))
    rng = np.random.default_rng(0)
    b = 8
    state = tr0.init(jax.random.PRNGKey(0), (b, 8, 8, 3))
    batch = {
        "lq": jnp.asarray(rng.random((b, 8, 8, 3), dtype=np.float32)),
        "gt": jnp.asarray(rng.random((b, 16, 16, 3), dtype=np.float32)),
        "scale": jnp.full((b,), 2.0, jnp.float32),
        "gt_h": jnp.full((b,), 16, jnp.int32),
        "gt_w": jnp.full((b,), 16, jnp.int32),
    }
    # eager (un-jitted) steps: same params, same batch, only the seed in
    # the droppath stream differs -> losses must differ
    _, m0 = tr0._step_impl(state, batch)
    _, m1 = tr1._step_impl(state, batch)
    assert float(m0["l_pix"]) != float(m1["l_pix"])
