"""Benchmark: end-to-end GSASR x4 inference throughput on one chip.

Protocol mirrors the reference's compute-cost measurement
(`/root/reference/inference_paper_benchmark.py:127-172`, README.md:343-344):
full-size LR of a 720^2-GT DIV2K crop (180x180 LR at x4), no tiling; the
timed region covers encoder + decoder + rendering; warmup iterations
discarded. EDSR-paper config, dmax=0.1, fp32.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline: ratio of the reference's A100 wall time to ours for the same
workload. The repo ships no absolute A100 number for this exact protocol
(README points to a paper figure); we use 250 ms as the baseline estimate —
the EDSR-GSASR paper-version 720^2 total reported in the paper's compute
figure is ~0.2-0.3 s on A100. Until a measured number is available this is
an estimate, stated here explicitly.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS = 250.0  # estimated A100 reference total (see module docstring)


def main():
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    from gsasr_tpu.model import make_models, sr_forward

    enc, dec = make_models("edsr")
    rng = jax.random.PRNGKey(0)
    lr_size = 180
    scale = 4.0
    lq = jnp.asarray(np.random.default_rng(0).random(
        (1, lr_size, lr_size, 3), dtype=np.float32))
    enc_params = enc.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
    dec_params = dec.init(rng, jnp.zeros((1, 12, 12, 64)),
                          jnp.ones((1,)))["params"]

    def forward(enc_params, dec_params, lq):
        # stage-jitted pipeline (encoder / decoder / renderer) — see
        # gsasr_tpu/model.py:sr_forward
        return sr_forward(enc, dec, enc_params, dec_params, lq, scale,
                          dmax=0.1)

    csum = jax.jit(jnp.sum)
    out = forward(enc_params, dec_params, lq)
    float(csum(out))  # compile + warmup, host-synced

    times = []
    for _ in range(7):
        t0 = time.perf_counter()
        out = forward(enc_params, dec_params, lq)
        float(csum(out))  # hard host sync — block_until_ready alone proved
                          # unreliable through the remote tunnel
        times.append(time.perf_counter() - t0)
    times = times[2:]  # discard first 2 (inference_paper_benchmark.py:169)
    dt = float(np.median(times))

    ms = dt * 1e3
    print(json.dumps({
        "metric": "edsr_gsasr_x4_720sq_e2e_inference",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
    }))


if __name__ == "__main__":
    main()
