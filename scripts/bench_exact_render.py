"""A/B the exact-list render forward vs the windowed path on-chip.

Workload = the bench shape (720^2 canvas, 518k Gaussians, dmax 0.1) at two
box-statistics regimes:
  - trained-like: sigma_px lognormal around p50 ~1.1 px (the flagship 20k
    checkpoint's measured distribution, BENCH_NOTES round 4) -> boxes p50
    ~32 px; this is where the windowed walk visits ~3.5x the exact volume.
  - init-like: saturated sigmas -> every box at the dmax clamp; the exact
    path must detect capacity overflow and fall back at no loss.

Usage: python scripts/bench_exact_render.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gsasr_tpu.ops.rasterizer import gs_render


_csum = None


def _sync(out):
    # hard host sync — block_until_ready alone is unreliable through the
    # remote tunnel (same trick as bench.py)
    global _csum
    if _csum is None:
        _csum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    float(_csum(jax.tree_util.tree_leaves(out)[0]))


def timed(fn, *args, reps=7, discard=2):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[discard:]) * 1e3), out


def workload(kind, s=518400, hw=720, seed=0):
    rng = np.random.default_rng(seed)
    half = (hw - 1) / 2.0
    if kind == "trained":
        sig_px = np.exp(rng.normal(np.log(1.1), 0.7, (s, 2))).astype(
            np.float32)
        sig_px = np.clip(sig_px, 0.3, 60.0)
    else:
        sig_px = np.full((s, 2), 300.0, np.float32)  # saturated
    sigmas = np.concatenate(
        [sig_px / half, rng.uniform(-0.6, 0.6, (s, 1)).astype(np.float32)],
        axis=1)
    # lattice-ish centers with jitter (matches decoder output statistics)
    n = int(np.sqrt(s))
    gx, gy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n))
    coords = np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32)
    coords += rng.uniform(-1.0 / n, 1.0 / n, coords.shape).astype(np.float32)
    colors = rng.uniform(0, 0.3, (s, 3)).astype(np.float32)
    return (jnp.asarray(sigmas), jnp.asarray(coords), jnp.asarray(colors),
            (hw, hw))


def main():
    for kind in ("trained", "init"):
        sigmas, coords, colors, size = workload(kind)
        res = {}
        for name, kwargs in (
            ("windowed", dict(binning="off")),
            ("exact", dict(binning="exact")),
        ):
            fn = jax.jit(lambda sg, co, cl, kw=dict(kwargs): gs_render(
                sg, co, cl, size, 0.1, **kw))
            ms, out = timed(fn, sigmas, coords, colors)
            res[name] = (ms, np.asarray(out))
        wm, wout = res["windowed"]
        em, eout = res["exact"]
        rel = np.abs(eout - wout) / (np.abs(wout) + 1.0)
        print(f"{kind:8s} windowed {wm:7.2f} ms | exact {em:7.2f} ms "
              f"| speedup {wm / em:4.2f}x | max rel-ish diff {rel.max():.2e}")


if __name__ == "__main__":
    main()
