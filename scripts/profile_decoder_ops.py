"""HLO-op-level profile of the decoder stage on the bench workload.

Runs the jitted Fea2GS decoder under jax.profiler.trace and aggregates
device-plane op durations from the xplane proto (parsed with tensorflow's
profiler protobuf). Answers "where do the decoder's ~100 ms go" at the
fusion level — attention einsums vs head MLPs vs UPNet convs vs layout ops.
"""

import glob
import os
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    from gsasr_tpu.model import _jitted_apply, make_models

    enc, dec = make_models("edsr")
    rng = jax.random.PRNGKey(0)
    lq = jnp.asarray(np.random.default_rng(0).random(
        (1, 180, 180, 3), dtype=np.float32))
    enc_params = enc.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
    dec_params = dec.init(rng, jnp.zeros((1, 12, 12, 64)),
                          jnp.ones((1,)))["params"]
    enc_fn = _jitted_apply(enc)
    dec_fn = _jitted_apply(dec)
    feat = enc_fn(enc_params, lq)
    scales = jnp.ones((1,), jnp.float32)
    csum = jax.jit(lambda x: jnp.sum(x))
    float(csum(dec_fn(dec_params, feat, scales)))  # compile + warm

    log_dir = "/tmp/jaxtrace"
    os.system(f"rm -rf {log_dir}")
    with jax.profiler.trace(log_dir):
        for _ in range(3):
            float(csum(dec_fn(dec_params, feat, scales)))

    files = glob.glob(f"{log_dir}/**/*.xplane.pb", recursive=True)
    print("trace files:", files)
    if not files:
        return
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(files[-1], "rb").read())
    for plane in xs.planes:
        print("PLANE:", plane.name, "lines:", len(plane.lines))
    # Aggregate per-event-name duration on TPU/device planes.
    for plane in xs.planes:
        if "TPU" not in plane.name and "device" not in plane.name.lower():
            continue
        meta = {k: v.name for k, v in plane.event_metadata.items()}
        tot = defaultdict(float)
        for line in plane.lines:
            for ev in line.events:
                tot[meta.get(ev.metadata_id, "?")] += ev.duration_ps / 1e9
        top = sorted(tot.items(), key=lambda kv: -kv[1])[:40]
        print(f"== {plane.name} (ms over 3 reps)")
        for name, ms in top:
            print(f"{ms:10.3f}  {name[:120]}")


if __name__ == "__main__":
    main()
