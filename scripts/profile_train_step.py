"""Training-step decomposition at paper-recipe shapes (VERDICT r3 #5).

Answers the question the r3 step-time trajectory left open: the flat
0.47-0.52 s/it curve despite sigmas training down (22k-ckpt boxes p50
~29 px at x4 vs the 95 px dmax clamp) means the step is NOT dominated by
the render's walked volume — this script measures what it IS dominated
by, with init vs trained parameters.

Times, each with hard host syncs (median of reps):
  step_ms        — the full jitted train step (fwd+bwd+Adam+EMA)
  fwdbwd_ms      — value_and_grad of the loss alone
  fwd_ms         — loss forward alone
  render_fwd_ms  — render_training_batch on the decoder's actual outputs
  decfwd_ms      — encoder+decoder forward alone
So: render bwd share ~= fwdbwd - fwd - (grad machinery of enc/dec),
render fwd share = render_fwd, enc/dec fwd = decfwd.

Usage:
  python scripts/profile_train_step.py [orbax_step_dir]
(no arg = random init; pass experiments/<run>/checkpoints/<step> to
measure at trained params.)
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    from gsasr_tpu.model import make_models
    from gsasr_tpu.rendering import render_training_batch
    from gsasr_tpu.train import TrainConfig, Trainer

    enc, dec = make_models("edsr")
    cfg = TrainConfig(total_iter=30000, warmup_iter=2000,
                      milestones=(15000, 23000, 27000, 29000),
                      canvas_hw=(192, 192), dmax=0.5)
    tr = Trainer(enc, dec, cfg)
    b = 16
    state = tr.init(jax.random.PRNGKey(0), (b, 48, 48, 3))

    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    if ckpt:
        from gsasr_tpu.utils.checkpoint import load_eval_params
        ep, dp = load_eval_params(ckpt, key="params")
        state = state.replace(params_g=jax.device_put(ep),
                              params_d=jax.device_put(dp))

    rng = np.random.default_rng(0)
    scales = np.round(rng.uniform(1, 4, b) * 48) / 48
    gt_hw = np.round(scales * 48).astype(np.int32)
    batch = {
        "lq": jnp.asarray(rng.random((b, 48, 48, 3), dtype=np.float32)),
        "gt": jnp.asarray(rng.random((b, 192, 192, 3), dtype=np.float32)),
        "scale": jnp.asarray(scales, jnp.float32),
        "gt_h": jnp.asarray(gt_hw),
        "gt_w": jnp.asarray(gt_hw),
    }
    from gsasr_tpu.parallel.mesh import batch_sharding, replicated_sharding
    batch = jax.device_put(batch, batch_sharding(tr.mesh))

    csum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def sync(out):
        float(csum(jax.tree_util.tree_leaves(out)[0]))

    def timed(fn, *args, reps=7, discard=2):
        out = fn(*args)
        sync(out)
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            sync(out)
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts[discard:])) * 1e3, out

    params = {"g": state.params_g, "d": state.params_d}
    key = jax.random.PRNGKey(0)

    fwd = jax.jit(lambda p, bt: tr._loss_fn(p, bt, key)[0])
    fwdbwd = jax.jit(lambda p, bt: jax.value_and_grad(
        lambda q: tr._loss_fn(q, bt, key)[0])(p))

    @jax.jit
    def encdec(p, bt):
        feat = enc.apply({"params": p["g"]}, bt["lq"])
        return dec.apply({"params": p["d"]}, feat, bt["scale"])

    @jax.jit
    def render_only(gs, bt):
        return render_training_batch(
            gs, bt["scale"], bt["gt_h"], bt["gt_w"], cfg.canvas_hw,
            default_step_size=cfg.default_step_size, if_dmax=cfg.if_dmax,
            dmax_mode=cfg.dmax_mode, dmax=cfg.dmax)

    # full step must come first with a fresh state copy (donation)
    step_ms, _ = timed(lambda: tr.step(
        jax.tree_util.tree_map(jnp.copy, state), batch)[1]["loss"])
    fwd_ms, _ = timed(fwd, params, batch)
    fwdbwd_ms, _ = timed(lambda: fwdbwd(params, batch)[0])
    decfwd_ms, gs = timed(encdec, params, batch)
    render_ms, _ = timed(render_only, gs, batch)

    print(json.dumps({
        "weights": "trained" if ckpt else "init",
        "ckpt": ckpt,
        "step_ms": round(step_ms, 1),
        "fwdbwd_ms": round(fwdbwd_ms, 1),
        "fwd_ms": round(fwd_ms, 1),
        "encdec_fwd_ms": round(decfwd_ms, 1),
        "render_fwd_ms": round(render_ms, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
