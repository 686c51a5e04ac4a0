"""Capture an xprof trace of the e2e x4 inference pipeline.

Usage (on TPU, serialized via scripts/tpu_run.sh):
  scripts/tpu_run.sh /tmp/profile.log scripts/profile_e2e.py [outdir]

View with tensorboard/xprof pointing at the trace directory. This is the
TPU-native replacement for the reference's settrace line profiler
(`utils/gs_cuda*/mylineprofiler.py`) when op-level attribution is needed;
for stage-level timing use gsasr_tpu.utils.profiler.StageTimer.
"""

import sys

import numpy as np


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/xprof_e2e"

    import jax
    import jax.numpy as jnp

    from gsasr_tpu.model import make_models, sr_forward
    from gsasr_tpu.utils.env import enable_compilation_cache
    from gsasr_tpu.utils.profiler import trace

    enable_compilation_cache()
    enc, dec = make_models("edsr")
    rng = jax.random.PRNGKey(0)
    ep = jax.jit(enc.init)(rng, jnp.zeros((1, 12, 12, 3)))["params"]
    dp = jax.jit(dec.init)(rng, jnp.zeros((1, 12, 12, 64)),
                           jnp.ones((1,)))["params"]
    lq = jnp.asarray(np.random.default_rng(0).random((1, 180, 180, 3),
                                                     dtype=np.float32))
    # warm (compiles outside the trace)
    out = sr_forward(enc, dec, ep, dp, lq, 4.0, dmax=0.1)
    float(out.sum())

    with trace(outdir):
        for _ in range(3):
            out = sr_forward(enc, dec, ep, dp, lq, 4.0, dmax=0.1)
            float(out.sum())
    print(f"trace written to {outdir}")


if __name__ == "__main__":
    main()
