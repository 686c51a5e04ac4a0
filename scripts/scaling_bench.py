"""Data-parallel scaling benchmark.

On real multi-chip hardware this measures pixels/s scaling over the ICI mesh
(BASELINE target: >=85% at 2+ hosts). This environment exposes ONE physical
chip, so by default the script runs on N virtual CPU devices to validate the
mechanism (batch sharding, psum overlap) and reports *relative* step time —
run with JAX_PLATFORMS unset on a real slice for true numbers.

Usage:
  JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/scaling_bench.py [--devices 1 2 4 8] [--batch-per 2]
"""

import argparse
import time

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, nargs="*", default=[1, 2, 4, 8])
    p.add_argument("--batch-per", type=int, default=2)
    p.add_argument("--lr-size", type=int, default=16)
    p.add_argument("--iters", type=int, default=4)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gsasr_tpu.models import EDSRNOUP, Fea2GS
    from gsasr_tpu.parallel.mesh import make_mesh
    from gsasr_tpu.train import TrainConfig, Trainer

    enc = EDSRNOUP(num_feat=16, num_block=2)
    dec = Fea2GS(inchannel=16, channel=24, num_heads=6,
                 num_crossattn_blocks=1, num_crossattn_layers=1,
                 num_selfattn_blocks=1, num_selfattn_layers=2,
                 num_gs_seed=16, window_size=4)
    canvas = args.lr_size * 4
    cfg = TrainConfig(canvas_hw=(canvas, canvas), warmup_iter=-1,
                      milestones=(10 ** 9,))

    rng = np.random.default_rng(0)
    results = {}
    for n in args.devices:
        if n > len(jax.devices()):
            continue
        mesh = make_mesh(jax.devices()[:n])
        tr = Trainer(enc, dec, cfg, mesh=mesh)
        b = args.batch_per * n
        state = tr.init(jax.random.PRNGKey(0), (b, args.lr_size,
                                                args.lr_size, 3))

        def batch(seed):
            r = np.random.default_rng(seed)
            scales = (1.5 + 2.0 * r.random(b)).astype(np.float32)
            gh = np.ceil(scales * args.lr_size).astype(np.int32)
            return {
                "lq": jnp.asarray(r.random((b, args.lr_size, args.lr_size, 3),
                                           dtype=np.float32)),
                "gt": jnp.asarray(r.random((b, canvas, canvas, 3),
                                           dtype=np.float32)),
                "scale": jnp.asarray(scales),
                "gt_h": jnp.asarray(gh), "gt_w": jnp.asarray(gh),
            }

        state, m = tr.step(state, batch(0))  # compile
        float(m["loss"])
        t0 = time.perf_counter()
        for i in range(args.iters):
            state, m = tr.step(state, batch(i + 1))
            float(m["loss"])  # host sync
        dt = (time.perf_counter() - t0) / args.iters
        samples_s = b / dt
        results[n] = samples_s
        base = results[min(results)]
        eff = samples_s / (base * n / min(results)) * 100
        print(f"devices={n} batch={b} step={dt * 1e3:.0f} ms "
              f"{samples_s:.2f} samples/s weak-scaling-eff={eff:.0f}%",
              flush=True)


if __name__ == "__main__":
    main()
