"""Benchmark: end-to-end GSASR x4 inference throughput on one chip.

Protocol mirrors the reference's compute-cost measurement
(`/root/reference/inference_paper_benchmark.py:127-172`, README.md:343-344):
full-size LR of a 720^2-GT DIV2K crop (180x180 LR at x4), no tiling; the
timed region covers encoder + decoder + rendering; warmup iterations
discarded. EDSR-paper config, dmax=0.1, fp32 params (TPU matmuls run at
JAX default precision = bf16 multiply / fp32 accumulate, the TPU analog of
the A100's TF32 conv path the reference rides).

Prints ONE JSON line with the driver fields (metric/value/unit/
vs_baseline) plus resolvability fields (VERDICT r3 #4):
  value / e2e_iqr_ms — median and [q1, q3] of the timed e2e runs; the
                      tunnel's ±15-20% single-run noise makes a bare
                      median unresolvable across rounds, the IQR says
                      whether a cross-round delta means anything
  null_ms/encoder_ms/decoder_ms/render_ms — per-stage medians (each timed
                      separately with hard host syncs; null = dispatch +
                      scalar transfer, the constant tunnel round-trip
                      baked into every stage number)
  render_walk_bound_frac — the per-tile-EXACT-list VPU bound for this
                      workload's actual cull boxes (tile-quantized true
                      overlap volume x ~24 VPU ops/elem / VPU peak)
                      divided by net render time: ->1 means the kernel
                      walks ~its structural floor
  decoder_mem_bound_frac — compiled bytes-accessed / HBM bandwidth,
                      divided by net decoder time: ->1 means the stage
                      runs at the memory bound
  (these replace the r3 `roofline_frac`, which divided matmul FLOPs by
  MXU peak on a VPU/copy-bound workload — structurally uninformative)
  peak_mem_bytes    — runtime memory_stats when exposed, else compiled
                      memory analysis of the largest stage
  weights / ckpt    — 'init' or 'trained' + WHICH checkpoint was used
                      (auto-detect prefers experiments matching the
                      benched EDSR config; ADVICE r3)
  baseline          — 'estimate': vs_baseline divides a 250 ms A100
                      estimate for this workload (the repo ships no
                      measured A100 number; the paper's compute figure
                      reads ~0.2-0.3 s)

BENCH_NOTES.md carries the history and the A/B tables.
"""

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_MS = 250.0  # estimated A100 reference total (see module docstring)
# Minimum checkpoint step for the "trained" weights label; below this the
# JSON says "early" (half the 20k ladder = first LR milestone).
MIN_TRAINED_STEP = 10000

# Per-chip structural peaks by device kind (public spec sheets).
PEAK_HBM_BPS = {
    "TPU v4": 1228e9,
    "TPU v5e": 819e9,
    "TPU v5 lite": 819e9,
    "TPU v5p": 2765e9,
    "TPU v6e": 1640e9,
    "TPU v6 lite": 1640e9,
}
PEAK_VPU_OPS = {
    "TPU v5e": 3.8e12,
    "TPU v5 lite": 3.8e12,
}
# VPU ops per walked (pixel, gaussian) element of the forward kernel body
# (quad form + exp + mask; BENCH_NOTES roofline section).
_OPS_PER_ELEM = 24.0


def _median_iqr(ts):
    q1, med, q3 = np.percentile(ts, [25, 50, 75])
    return float(med), [round(float(q1) * 1e3, 2), round(float(q3) * 1e3, 2)]


def _timed(fn, *args, reps=9, discard=2, sync=None):
    out = fn(*args)
    sync(out)
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        sync(out)
        ts.append(time.perf_counter() - t0)
    return ts[discard:], out


def _find_ckpt():
    """Auto-detect a trained checkpoint from this round's runs. Prefers
    experiment dirs whose name mentions the benched encoder (edsr) so a
    stray run of another config can't be silently loaded (ADVICE r3);
    highest finalized (digit-named) step wins."""
    import glob
    cands = [p for p in glob.glob("experiments/*/checkpoints/*")
             if os.path.isdir(p) and os.path.basename(p).isdigit()
             # Enhanced/AMP-family runs carry a different decoder: their
             # checkpoints must not shadow the paper-family bench weights
             and not any(k in p.lower() for k in ("rope", "enh", "amp"))]
    pref = [p for p in cands if "edsr" in p.lower()]
    pool = pref or cands
    # the most recently trained experiment wins (the round's own run),
    # then its highest step — an older run's higher step number must not
    # shadow this round's checkpoint
    return max(pool, key=lambda p: (os.path.getmtime(p),
                                    int(os.path.basename(p))), default=None)


def main():
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    from gsasr_tpu.model import _jitted_apply, make_models
    from gsasr_tpu.rendering import render_gaussians

    enc, dec = make_models("edsr")
    rng = jax.random.PRNGKey(0)
    lr_size = 180
    scale = 4.0
    sr = (720, 720)
    lq = jnp.asarray(np.random.default_rng(0).random(
        (1, lr_size, lr_size, 3), dtype=np.float32))

    ckpt = os.environ.get("GSASR_BENCH_CKPT") or _find_ckpt()
    if ckpt and os.path.isdir(ckpt):
        from gsasr_tpu.utils.checkpoint import load_eval_params
        enc_params, dec_params = load_eval_params(ckpt)
        enc_params = jax.device_put(enc_params)
        dec_params = jax.device_put(dec_params)
        # Refuse the "trained" label for early checkpoints (VERDICT r4
        # weak #1): walk-volume-dependent stages are sigma-dependent, so
        # a headline number silently riding a 2k-iter ckpt is misleading.
        step = int(os.path.basename(ckpt))
        weights = "trained" if step >= MIN_TRAINED_STEP else "early"
    else:
        ckpt = None
        enc_params = enc.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
        dec_params = dec.init(rng, jnp.zeros((1, 12, 12, 64)),
                              jnp.ones((1,)))["params"]
        weights = "init"

    enc_fn = _jitted_apply(enc)
    dec_fn = _jitted_apply(dec)
    scales = jnp.full((1,), scale, jnp.float32)

    def forward(enc_params, dec_params, lq):
        feat = enc_fn(enc_params, lq)
        gs = dec_fn(dec_params, feat, scales)
        return render_one(gs[0])

    @jax.jit
    def render_one(g):
        return render_gaussians(sr, g, jnp.float32(scale),
                                dmax_mode="fix", dmax=0.1)

    csum = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))

    def sync(out):
        # hard host sync — block_until_ready alone proved unreliable
        # through the remote tunnel
        float(csum(jax.tree_util.tree_leaves(out)[0]))

    # -- e2e --------------------------------------------------------------
    ts, _ = _timed(lambda: forward(enc_params, dec_params, lq),
                   reps=7, discard=2, sync=sync)
    dt, e2e_iqr = _median_iqr(ts)
    ms = dt * 1e3
    stagewise_ms = ms

    # -- single-dispatch e2e ----------------------------------------------
    # The stage-wise loop pays THREE tunnel round-trips (~30 ms null each
    # way through axon) that the reference's on-device protocol
    # (`inference_paper_benchmark.py:127-156`, cuda-sync around the whole
    # pipeline) never sees; the monolithic jit is the faithful analog —
    # one dispatch, one sync. Headline `value` takes it when it wins; the
    # per-stage numbers remain stage-wise. GSASR_BENCH_MONO=0 skips.
    mono_ms = mono_iqr = None
    if os.environ.get("GSASR_BENCH_MONO", "1") == "1":
        try:
            from gsasr_tpu.model import _jitted_pipeline
            pipe = _jitted_pipeline(enc, dec, float(scale), "fix", 0.1, sr)
            ts_m, _ = _timed(lambda: pipe(enc_params, dec_params, lq),
                             reps=7, discard=2, sync=sync)
            dtm, mono_iqr = _median_iqr(ts_m)
            mono_ms = round(dtm * 1e3, 2)
        except Exception:
            pass
    dispatch = "stagewise"
    if mono_ms is not None and mono_ms < ms:
        ms, e2e_iqr, dt, dispatch = mono_ms, mono_iqr, dtm, "monolithic"

    # -- per-stage --------------------------------------------------------
    tiny = jnp.zeros((8, 128), jnp.float32)
    t_null, _ = _timed(jax.jit(lambda x: x + 1), tiny, sync=sync)
    null_ms, null_iqr = _median_iqr(t_null)
    t_enc, feat = _timed(enc_fn, enc_params, lq, sync=sync)
    enc_ms, enc_iqr = _median_iqr(t_enc)
    t_dec, gs = _timed(lambda f: dec_fn(dec_params, f, scales), feat,
                       sync=sync)
    dec_ms, dec_iqr = _median_iqr(t_dec)
    t_ren, _ = _timed(render_one, gs[0], sync=sync)
    ren_ms, ren_iqr = _median_iqr(t_ren)

    # -- structural bounds ------------------------------------------------
    dev = jax.local_devices()[0]
    kind = str(getattr(dev, "device_kind", ""))
    hbm = next((v for k, v in PEAK_HBM_BPS.items() if k in kind), None)
    vpu = next((v for k, v in PEAK_VPU_OPS.items() if k in kind), None)

    render_bound_frac = None
    sigma_px_p50 = sigma_px_p90 = None
    if vpu:
        try:
            from gsasr_tpu.ops.rasterizer import pack_geometry
            from gsasr_tpu.rendering import prepare_kernel_inputs
            sg, kc, _, fdmax, _ = prepare_kernel_inputs(
                sr, gs[0], jnp.float32(scale), dmax_mode="fix", dmax=0.1)
            # sigma in px (kernel units span 2/(n-1) per px) — recorded so
            # walk-volume-dependent numbers are interpretable across rounds
            # (VERDICT r4 #7)
            s_np = np.asarray(sg[:, :2])
            s_px = s_np * np.array([(sr[1] - 1) / 2.0, (sr[0] - 1) / 2.0])
            sigma_px_p50, sigma_px_p90 = (
                round(float(np.percentile(s_px, p)), 3) for p in (50, 90))
            gm = np.asarray(pack_geometry(sg, kc, sr, fdmax))
            xlo = np.clip(gm[:, 5], 0, sr[1] - 1)
            xhi = np.clip(gm[:, 6], 0, sr[1] - 1)
            ylo = np.clip(gm[:, 7], 0, sr[0] - 1)
            yhi = np.clip(gm[:, 8], 0, sr[0] - 1)
            vis = (gm[:, 5] <= sr[1] - 1) & (gm[:, 6] >= 0) & \
                  (gm[:, 7] <= sr[0] - 1) & (gm[:, 8] >= 0) & \
                  (gm[:, 6] >= gm[:, 5]) & (gm[:, 8] >= gm[:, 7])
            th, tw = 8, 128  # binned-forward tile floor (min sublane x lane)
            tiles = ((yhi // th - ylo // th + 1)
                     * (xhi // tw - xlo // tw + 1))[vis]
            bound_s = float(tiles.sum()) * th * tw * _OPS_PER_ELEM / vpu
            net = max(ren_ms - null_ms, 1e-9)  # stage medians are seconds
            render_bound_frac = round(bound_s / net, 4)
        except Exception:
            pass

    decoder_bound_frac = None
    peak_mem = (dev.memory_stats() or {}).get("peak_bytes_in_use")
    mem_est = 0
    try:
        comp = dec_fn.lower(dec_params, feat, scales).compile()
        ca = comp.cost_analysis() or {}
        dec_bytes = float(ca.get("bytes accessed", 0.0))
        ma = comp.memory_analysis()
        if ma is not None:
            mem_est = max(mem_est, ma.argument_size_in_bytes
                          + ma.temp_size_in_bytes + ma.output_size_in_bytes)
        if hbm and dec_bytes:
            net = max(dec_ms - null_ms, 1e-9)  # stage medians are seconds
            decoder_bound_frac = round(dec_bytes / hbm / net, 4)
    except Exception:
        pass
    if peak_mem is None and mem_est:
        peak_mem = mem_est

    # -- Enhanced family (Fea2GSRopeAMP, bf16-trunk fused default) --------
    # The family the reference recommends (`README.md:206-209`); measured
    # on the same protocol so BENCH jsons carry an enhanced row
    # (VERDICT r4 #3). GSASR_BENCH_ENHANCED=0 skips it.
    enh_ms = enh_iqr = enh_weights = enh_err = None
    enh_path = "fused"
    if os.environ.get("GSASR_BENCH_ENHANCED", "1") == "1":
        try:
            enc_e, dec_e = make_models("edsr", "enhanced")
            eckpt = os.environ.get("GSASR_BENCH_ENHANCED_CKPT")
            if not eckpt:
                import glob
                cands = [p for p in glob.glob("experiments/*/checkpoints/*")
                         if os.path.isdir(p)
                         and os.path.basename(p).isdigit()
                         and any(k in p.lower()
                                 for k in ("rope", "enh", "amp"))]
                eckpt = max(cands, key=lambda p: (os.path.getmtime(p),
                                                  int(os.path.basename(p))),
                            default=None)
            if eckpt:
                from gsasr_tpu.utils.checkpoint import load_eval_params
                ep, dp = load_eval_params(eckpt)
                estep = int(os.path.basename(eckpt))
                enh_weights = ("trained" if estep >= MIN_TRAINED_STEP
                               else "early")
            else:
                ep = enc_e.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
                dp = dec_e.init(rng, jnp.zeros((1, 12, 12, 64)),
                                jnp.ones((1,)))["params"]
                enh_weights = "init"
            efn = _jitted_apply(enc_e)

            def measure(dfn):
                def forward_e(ep, dp, lq):
                    feat = efn(ep, lq)
                    gs = dfn(dp, feat, scales)
                    return render_one(gs[0])
                ts_e, _ = _timed(lambda: forward_e(ep, dp, lq), reps=7,
                                 discard=2, sync=sync)
                return _median_iqr(ts_e)

            try:
                dte, enh_iqr = measure(_jitted_apply(dec_e))
            except Exception as e:  # fused rope kernel failure: fall back
                enh_err = f"fused: {type(e).__name__}: {e}"[:300]
                enh_path = "module"
                dfn_m = jax.jit(lambda p, *xs: dec_e.apply(
                    {"params": p}, *xs))
                dte, enh_iqr = measure(dfn_m)
            enh_ms = round(dte * 1e3, 2)
        except Exception as e:
            enh_err = f"{type(e).__name__}: {e}"[:300]

    print(json.dumps({
        "metric": "edsr_gsasr_x4_720sq_e2e_inference",
        "value": round(ms, 2),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 3),
        "e2e_iqr_ms": e2e_iqr,
        "dispatch": dispatch,
        "e2e_stagewise_ms": round(stagewise_ms, 2),
        "e2e_mono_ms": mono_ms,
        "null_ms": round(null_ms * 1e3, 2),
        "encoder_ms": round(enc_ms * 1e3, 2),
        "decoder_ms": round(dec_ms * 1e3, 2),
        "render_ms": round(ren_ms * 1e3, 2),
        "stage_iqr_ms": {"null": null_iqr, "encoder": enc_iqr,
                         "decoder": dec_iqr, "render": ren_iqr},
        "render_walk_bound_frac": render_bound_frac,
        "sigma_px_p50": sigma_px_p50,
        "sigma_px_p90": sigma_px_p90,
        "decoder_mem_bound_frac": decoder_bound_frac,
        "hr_pixels_per_s": round(sr[0] * sr[1] / dt),
        "peak_mem_bytes": peak_mem,
        "device_kind": kind,
        "weights": weights,
        "ckpt": ckpt,
        "enhanced_e2e_ms": enh_ms,
        "enhanced_iqr_ms": enh_iqr,
        "enhanced_weights": enh_weights,
        "enhanced_path": enh_path,
        "enhanced_error": enh_err,
        "baseline": "estimate",
    }))


if __name__ == "__main__":
    main()
