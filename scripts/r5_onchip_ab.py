"""On-chip A/B for the r5 changes (run during a trainer pause).

1. Render forward: static_perm x binning (chunklist vs windowed) at the
   720^2/518k bench workload with TRAINED decoder outputs — net ms per
   path, hard host syncs (float(sum)) per the axon timing rules.
2. Training step: fused_decoder True/False at production shapes.

Usage:  python scripts/r5_onchip_ab.py [render|train|both] [ckpt]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _sync(x):
    import jax.numpy as jnp
    import jax
    return float(jax.jit(lambda v: jnp.sum(v.astype(jnp.float32)))(x))


def _timed(fn, args_list, reps=7, discard=2):
    ts = []
    out = fn(*args_list[0])
    _sync(out)
    for i in range(reps):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        out = fn(*a)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[discard:])) * 1e3


def bench_render(ckpt):
    import jax
    import jax.numpy as jnp

    from gsasr_tpu.model import _jitted_apply, make_models
    from gsasr_tpu.rendering import render_gaussians
    from gsasr_tpu.utils.checkpoint import load_eval_params

    enc, dec = make_models("edsr")
    enc_params, dec_params = load_eval_params(ckpt)
    rngs = [np.random.default_rng(i) for i in range(3)]
    lqs = [jnp.asarray(r.random((1, 180, 180, 3), dtype=np.float32))
           for r in rngs]
    scale = 4.0
    sr = (720, 720)
    enc_fn = _jitted_apply(enc)
    dec_fn = _jitted_apply(dec)
    gss = []
    for lq in lqs:
        feat = enc_fn(enc_params, lq)
        gs = dec_fn(dec_params, feat, jnp.full((1,), scale, jnp.float32))
        _sync(gs)
        gss.append([gs[0]])

    for static_perm in (True, False):
        def render_one(g, _sp=static_perm):
            return render_gaussians(sr, g, jnp.float32(scale),
                                    dmax_mode="fix", dmax=0.1,
                                    static_perm=_sp)
        ms = _timed(jax.jit(render_one), gss)
        print(f"render_gaussians static_perm={static_perm} (binning=auto): "
              f"{ms:.2f} ms")

    # direct gs_render paths for binning control
    from gsasr_tpu.rendering import prepare_kernel_inputs, \
        _static_lattice_perm
    from gsasr_tpu.ops.rasterizer import gs_render

    perm = jnp.asarray(_static_lattice_perm(720, 720, 720, 720))
    prepped = []
    for (g,) in gss:
        gp = jnp.take(g, perm, axis=0)
        sg, kc, col, fd, _ = prepare_kernel_inputs(
            sr, gp, jnp.float32(scale), dmax_mode="fix", dmax=0.1)
        _sync(sg)
        prepped.append([sg, kc, col])

    import functools as ft
    # chunklist tile/chunk geometry sweep (smaller tiles cut body waste,
    # more steps pay per-step overhead — the crossover is empirical)
    for th, gc in ((32, 1024), (16, 512), (8, 256), (8, 512)):
        fn = jax.jit(ft.partial(
            lambda s, c, cl, _th, _gc: gs_render(
                s, c, cl, sr, 0.1, spatial_sort=False, binning="auto",
                th=_th, gc=_gc), _th=th, _gc=gc))
        try:
            ms = _timed(fn, prepped)
            print(f"gs_render chunklist th={th} gc={gc}: {ms:.2f} ms")
        except Exception as e:
            print(f"gs_render chunklist th={th} gc={gc}: FAIL "
                  f"{type(e).__name__}: {e}")
    for binning in ("auto", "off", "exact"):
        for sort in (False, True):
            fn = jax.jit(ft.partial(
                lambda s, c, cl, _b, _s: gs_render(
                    s, c, cl, sr, 0.1, spatial_sort=_s, binning=_b),
                _b=binning, _s=sort))
            try:
                ms = _timed(fn, prepped)
                print(f"gs_render binning={binning} sort={sort}: "
                      f"{ms:.2f} ms")
            except Exception as e:
                print(f"gs_render binning={binning} sort={sort}: "
                      f"FAIL {type(e).__name__}: {e}")
    # parity check chunklist vs windowed on one input
    a = gs_render(*prepped[0], sr, 0.1, spatial_sort=False, binning="auto")
    b = gs_render(*prepped[0], sr, 0.1, spatial_sort=False, binning="off")
    err = float(jnp.abs(a - b).max())
    print(f"chunklist-vs-windowed max abs diff: {err:.3e}")


def bench_train():
    import jax
    import jax.numpy as jnp

    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = EDSRNOUP()
    dec = Fea2GS()
    rng = np.random.default_rng(0)
    b, lr_size, canvas = 16, 48, 192
    batches = []
    for i in range(3):
        scales = 1.0 + 3.0 * rng.random(b).astype(np.float32)
        gh = np.round(scales * lr_size).astype(np.int32)
        batches.append([{
            "lq": jnp.asarray(rng.random((b, lr_size, lr_size, 3),
                                         dtype=np.float32)),
            "gt": jnp.asarray(rng.random((b, canvas, canvas, 3),
                                         dtype=np.float32)),
            "scale": jnp.asarray(scales),
            "gt_h": jnp.asarray(gh), "gt_w": jnp.asarray(gh),
        }])
    for fused in (False, True):
        cfg = TrainConfig(canvas_hw=(canvas, canvas), warmup_iter=2000,
                          milestones=(10000,), fused_decoder=fused)
        tr = Trainer(enc, dec, cfg)
        state = tr.init(jax.random.PRNGKey(0), (b, lr_size, lr_size, 3))
        ts = []
        st = state
        st, m = tr.step(st, batches[0][0])
        _sync(m["loss"])
        for i in range(6):
            t0 = time.perf_counter()
            st, m = tr.step(st, batches[i % 3][0])
            _sync(m["loss"])
            ts.append(time.perf_counter() - t0)
        print(f"train step fused_decoder={fused}: "
              f"{np.median(ts[1:]) * 1e3:.0f} ms "
              f"(loss {float(m['loss']):.4f})")


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "both"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else None
    if ckpt is None:
        import glob
        cands = [p for p in glob.glob("experiments/*/checkpoints/*")
                 if os.path.isdir(p) and os.path.basename(p).isdigit()]
        ckpt = max(cands, key=lambda p: (os.path.getmtime(p),
                                         int(os.path.basename(p))))
    print("ckpt:", ckpt)
    if what in ("render", "both"):
        bench_render(ckpt)
    if what in ("train", "both"):
        bench_train()
