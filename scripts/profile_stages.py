"""Per-stage timing of the benchmark workload (encoder / decoder / render).

Resolves what the single e2e number cannot (±15-20% tunnel noise): each
stage is timed separately with hard host syncs, median over reps, so
kernel-level changes (e.g. the fused window attention, GSASR_ATTN=fused
vs reference) are attributable to the stage they touch.

Usage:
  GSASR_ATTN=fused     python scripts/profile_stages.py
  GSASR_ATTN=reference python scripts/profile_stages.py

Protocol matches bench.py / the reference compute-cost measurement
(`/root/reference/inference_paper_benchmark.py:127-172`): 180^2 LR -> x4
-> 720^2, EDSR paper config, dmax 0.1, fp32.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


_csum = None


def _sync(out):
    # block_until_ready is unreliable through the axon tunnel (see bench.py);
    # force a scalar host transfer instead.
    global _csum
    if _csum is None:
        _csum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    leaves = jax.tree_util.tree_leaves(out)
    float(_csum(leaves[0]))


def timed(fn, *args, reps=9, discard=2):
    out = fn(*args)
    _sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts[discard:])) * 1e3, out


def main():
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    from gsasr_tpu.model import _jitted_apply, make_models
    from gsasr_tpu.rendering import render_gaussians

    mode = os.environ.get("GSASR_ATTN", "fused")
    enc_name = os.environ.get("GSASR_PROF_ENC", "edsr")  # edsr|rdn|swinir|hat
    # GSASR_PROF_DTYPE=bfloat16 A/Bs the bf16-compute model family (fp32
    # params, fp32 softmax, fp32 render boundary — the AMP_test inference
    # recipe) against the default fp32 path, per stage.
    dt_name = os.environ.get("GSASR_PROF_DTYPE", "float32")
    dtype = {"float32": jnp.float32, "bfloat16": jnp.bfloat16,
             "bf16": jnp.bfloat16}[dt_name]
    enc, dec = make_models(enc_name, dtype=dtype)
    rng = jax.random.PRNGKey(0)
    lr_size, scale = 180, 4.0
    lq = jnp.asarray(np.random.default_rng(0).random(
        (1, lr_size, lr_size, 3), dtype=np.float32))
    enc_params = enc.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
    dec_params = dec.init(rng, jnp.zeros((1, 12, 12, 64)),
                          jnp.ones((1,)))["params"]

    enc_fn = _jitted_apply(enc)
    dec_fn = _jitted_apply(dec)

    @jax.jit
    def render_fn(g):
        return render_gaussians((720, 720), g, jnp.float32(scale),
                                dmax_mode="fix", dmax=0.1)

    # Null stage: dispatch + scalar host transfer only — the constant tunnel
    # round-trip baked into every per-stage number below.
    tiny = jnp.zeros((8, 128), jnp.float32)
    null_ms, _ = timed(jax.jit(lambda x: x + 1), tiny)

    enc_ms, feat = timed(enc_fn, enc_params, lq)
    scales = jnp.full((1,), scale, jnp.float32)
    dec_ms, gs = timed(lambda f: dec_fn(dec_params, f, scales), feat)
    ren_ms, _ = timed(render_fn, gs[0])

    dev = jax.local_devices()[0]
    stats = dev.memory_stats() or {}

    # Decoder memory-bound quantification (VERDICT r3 #2): compiled
    # bytes-accessed over HBM bandwidth = the time a perfectly-overlapped
    # memory-bound execution of the SAME HLO would take. This counts the
    # bytes of every materialized buffer between fusions — the actual
    # number the r3 "bounded by f32 activation traffic" claim needed.
    dec_bytes = dec_flops = None
    mem_bound_ms = None
    try:
        ca = (dec_fn.lower(dec_params, feat, scales).compile()
              .cost_analysis() or {})
        dec_bytes = float(ca.get("bytes accessed", 0.0)) or None
        dec_flops = float(ca.get("flops", 0.0)) or None
        hbm = {"TPU v5e": 819e9, "TPU v5 lite": 819e9,
               "TPU v4": 1228e9, "TPU v6e": 1640e9}
        bw = next((v for k, v in hbm.items()
                   if k in str(getattr(dev, "device_kind", ""))), None)
        if dec_bytes and bw:
            mem_bound_ms = round(dec_bytes / bw * 1e3, 2)
    except Exception:
        pass

    print(json.dumps({
        "attn_mode": mode,
        "dtype": dt_name,
        "encoder": enc_name,
        "null_ms": round(null_ms, 2),
        "encoder_ms": round(enc_ms, 2),
        "decoder_ms": round(dec_ms, 2),
        "render_ms": round(ren_ms, 2),
        "sum_ms": round(enc_ms + dec_ms + ren_ms, 2),
        "decoder_bytes_accessed": dec_bytes,
        "decoder_flops": dec_flops,
        "decoder_mem_bound_ms": mem_bound_ms,
        "peak_mem_bytes": stats.get("peak_bytes_in_use"),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
