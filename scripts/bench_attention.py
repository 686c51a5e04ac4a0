"""Window-attention kernel microbenchmark: fused Pallas vs einsum
composition, forward and forward+backward, at the decoder's real shapes.

Shapes: the 180^2 -> x4 bench decoder self-attention (225 windows x 144
tokens x 180 ch / 6 heads, packed layout) and the training-step shape
(batch 16 x 16 windows). Timing per the axon protocol: jit returns a
scalar, host-materialize each rep, vary inputs, discard warmups.

Usage:  python scripts/bench_attention.py          (on the chip)
Writes one JSON line per (shape, mode, pass).
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, args_list, reps=7, discard=2):
    out = fn(*args_list[0])
    float(out)  # compile + sync
    ts = []
    for i in range(reps):
        a = args_list[i % len(args_list)]
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[discard:])) * 1e3


def main():
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    from gsasr_tpu.ops.attention import (window_attention_packed,
                                         _attention_packed_reference)

    shapes = {
        "bench_decoder": (225, 144, 180, 6),   # b=1 e2e bench, 38 layers
        "train_step": (256, 144, 180, 6),      # batch16 x 16 windows
    }
    rng = np.random.default_rng(0)
    for name, (b, t, c, nh) in shapes.items():
        mk = lambda: jnp.asarray(rng.standard_normal((b, t, c)),
                                 jnp.float32)
        args = [(mk(), mk(), mk()) for _ in range(3)]
        bias = jnp.asarray(rng.standard_normal((nh, t, t)), jnp.float32)
        scale = (c // nh) ** -0.5

        fns = {
            "pallas": lambda q, k, v: window_attention_packed(
                q, k, v, bias, num_heads=nh),
            "einsum": functools.partial(_attention_packed_reference,
                                        bias=bias, scale=scale,
                                        num_heads=nh),
        }
        for mode, f in fns.items():
            fwd = jax.jit(lambda q, k, v, f=f: jnp.sum(f(q, k, v)))
            ms = timed(fwd, args)

            def loss(q, k, v, f=f):
                return jnp.sum(jnp.cos(f(q, k, v)))
            gfn = jax.jit(lambda q, k, v: sum(
                jnp.sum(jnp.abs(g)) for g in jax.grad(loss, (0, 1, 2))(
                    q, k, v)))
            ms_bwd = timed(gfn, args)
            print(json.dumps({
                "shape": name, "mode": mode,
                "fwd_ms": round(ms, 2),
                "fwd_bwd_ms": round(ms_bwd, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
