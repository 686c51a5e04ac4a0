"""Walk-volume analysis for render-forward designs (r5 task #1).

Loads a trained checkpoint, runs encoder+decoder on a real LR crop (CPU),
derives the per-Gaussian cull boxes exactly as the production render does,
and computes the *predicted walked volume* (gaussians visited per output
tile) for candidate forward designs:

  exact      — per-tile exact Gaussian lists (the structural floor)
  windowed   — today's production path (th=32/gc=1024 y-range + chunk bbox)
  chunklist  — per-tile exact CHUNK lists under the static anchor
               permutation, for several chunk shapes
  classK     — chunklist after a K-way box-height class partition
               (classes rendered as separate passes over the same array)

This is a measurement harness, not product code: the numbers pick the r5
kernel design before any Pallas work. Run on CPU (trainer owns the TPU):
  env JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS= python scripts/analyze_walk_volume.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import cv2
    import jax
    import jax.numpy as jnp

    from gsasr_tpu.model import _jitted_apply, make_models
    from gsasr_tpu.ops.rasterizer import pack_geometry
    from gsasr_tpu.rendering import _static_lattice_perm, prepare_kernel_inputs
    from gsasr_tpu.utils.checkpoint import load_eval_params

    ckpt = sys.argv[1] if len(sys.argv) > 1 else None
    if ckpt is None:
        import glob
        cands = [p for p in glob.glob("experiments/*/checkpoints/*")
                 if os.path.isdir(p) and os.path.basename(p).isdigit()]
        ckpt = max(cands, key=lambda p: (os.path.getmtime(p),
                                         int(os.path.basename(p))))
    print("ckpt:", ckpt)

    enc, dec = make_models("edsr")
    enc_params, dec_params = load_eval_params(ckpt)

    # no in-env asset reaches 720^2 — mosaic four 360^2 natural crops
    # (box statistics need real-image content, not one contiguous scene)
    srcs = ["/root/reference/assets/0846x4.png",
            "/root/reference/assets/0873x4.png",
            "/root/reference/assets/tree.png",
            "/root/reference/assets/0892x4.png"]
    tiles = []
    offs = [(0, 0), (0, 150), (40, 0), (0, 100), (80, 0), (0, 0)]
    for i in range(6):
        im = cv2.imread(srcs[i % 4])
        oy, ox = offs[i]
        tiles.append(im[oy:oy + 240, ox:ox + 360])
    crop = np.concatenate(
        [np.concatenate(tiles[2 * r:2 * r + 2], 1) for r in range(3)], 0)
    assert crop.shape[:2] == (720, 720), crop.shape
    from gsasr_tpu.data.matlab_resize import imresize_new
    lr = imresize_new(crop.astype(np.float32) / 255.0, 0.25, 0.25)
    lq = jnp.asarray(lr[None].astype(np.float32))
    print("lr:", lq.shape)

    scale = 4.0
    sr = (720, 720)
    t0 = time.time()
    feat = _jitted_apply(enc)(enc_params, lq)
    gs = _jitted_apply(dec)(dec_params, feat, jnp.full((1,), scale))
    gs = np.asarray(gs[0])
    print(f"decoder out {gs.shape} in {time.time()-t0:.1f}s")

    n = gs.shape[0]
    perm = _static_lattice_perm(720, 720, sr[0], sr[1], th=8, tw=128)
    gsp = jnp.asarray(gs[perm])
    sg, kc_, _, fdmax, _ = prepare_kernel_inputs(
        sr, gsp, jnp.float32(scale), dmax_mode="fix", dmax=0.1)
    gm = np.asarray(pack_geometry(sg, kc_, sr, fdmax))
    # anchor positions in permuted order
    lat = int(np.sqrt(n))
    rows = np.arange(n) // lat
    cols = np.arange(n) % lat
    ay = ((rows + 0.5) / lat * sr[0])[perm]
    ax = ((cols + 0.5) / lat * sr[1])[perm]

    cx, cy = gm[:, 3], gm[:, 4]
    xlo, xhi, ylo, yhi = gm[:, 5], gm[:, 6], gm[:, 7], gm[:, 8]
    bh = yhi - ylo
    bw = xhi - xlo
    sx, sy = gm[:, 0], gm[:, 1]
    print(f"sigma_px p50={np.percentile(np.concatenate([sx, sy]), 50):.2f} "
          f"p90={np.percentile(np.concatenate([sx, sy]), 90):.2f}")
    print(f"box_h p50={np.percentile(bh, 50):.1f} p90={np.percentile(bh, 90):.1f} "
          f"max={bh.max():.1f}; box_w p50={np.percentile(bw, 50):.1f} "
          f"p90={np.percentile(bw, 90):.1f} max={bw.max():.1f}")
    drift = np.maximum(np.abs(cy - ay), np.abs(cx - ax))
    print(f"|center-anchor| p50={np.percentile(drift, 50):.2f} "
          f"p99={np.percentile(drift, 99):.2f} max={drift.max():.2f}")

    h, w = sr
    th, tw = 8, 128
    n_th, n_tw = -(-h // th), -(-w // tw)
    nt = n_th * n_tw

    # ---- exact per-tile gaussian lists (floor) --------------------------
    fy0 = np.clip(ylo, 0, h - 1).astype(np.int64) // th
    fy1 = np.clip(yhi, 0, h - 1).astype(np.int64) // th
    fx0 = np.clip(xlo, 0, w - 1).astype(np.int64) // tw
    fx1 = np.clip(xhi, 0, w - 1).astype(np.int64) // tw
    vis = (xhi >= 0) & (xlo <= w - 1) & (yhi >= 0) & (ylo <= h - 1)
    exact_total = ((fy1 - fy0 + 1) * (fx1 - fx0 + 1))[vis].sum()
    print(f"\nexact memberships total = {exact_total/1e6:.2f}M "
          f"(avg {exact_total/nt:.0f}/tile)")

    # ---- windowed production (th=32, gc=1024, center-tile runtime sort) --
    TH_W, GC_W = 32, 1024
    n_th_w = -(-h // TH_W)
    key = (np.clip(cy, 0, h - 1).astype(np.int64) // TH_W) * n_tw + \
        (np.clip(cx, 0, w - 1).astype(np.int64) // tw)
    order = np.argsort(key, kind="stable")
    yl_s, yh_s = ylo[order], yhi[order]
    xl_s, xh_s = xlo[order], xhi[order]
    kc = n * 0 + (len(order) + GC_W - 1) // GC_W
    pad = kc * GC_W - n
    yl_s = np.pad(yl_s, (0, pad), constant_values=1e9)
    yh_s = np.pad(yh_s, (0, pad), constant_values=-1e9)
    xl_s = np.pad(xl_s, (0, pad), constant_values=1e9)
    xh_s = np.pad(xh_s, (0, pad), constant_values=-1e9)

    def windowed_volume(yl, yh, xl, xh, gc, th_t, tw_t):
        kcc = len(yl) // gc
        cb = np.stack([
            xl.reshape(kcc, gc).min(1), xh.reshape(kcc, gc).max(1),
            yl.reshape(kcc, gc).min(1), yh.reshape(kcc, gc).max(1)], 0)
        nth_t, ntw_t = -(-h // th_t), -(-w // tw_t)
        total = 0
        # y-range per row-tile + per-chunk bbox test (the actual kernel)
        for ti in range(nth_t):
            y0t, y1t = ti * th_t, ti * th_t + th_t - 1
            ovy = (cb[2] <= y1t) & (cb[3] >= y0t)
            idx = np.where(ovy)[0]
            if len(idx) == 0:
                continue
            lo, hi = idx.min(), idx.max()  # contiguous range walked
            for tj in range(ntw_t):
                x0t, x1t = tj * tw_t, tj * tw_t + tw_t - 1
                rng = slice(lo, hi + 1)
                eng = ((cb[0, rng] <= x1t) & (cb[1, rng] >= x0t)
                       & (cb[2, rng] <= y1t) & (cb[3, rng] >= y0t))
                total += eng.sum() * gc
        return total

    t0 = time.time()
    wv = windowed_volume(yl_s, yh_s, xl_s, xh_s, GC_W, TH_W, tw)
    print(f"windowed(32,1024) engaged volume = {wv/1e6:.2f}M "
          f"({wv/exact_total:.2f}x exact)  [{time.time()-t0:.0f}s]")

    # ---- chunklist under static anchor perm ------------------------------
    def chunklist_volume(order_idx, gc, label, classes=None):
        """order_idx: permutation grouping gaussians into chunks of gc.
        classes: optional (S,) int class ids — each class forms its own
        chunked subarray (partition), modeling a K-pass/classed layout."""
        if classes is None:
            groups = [order_idx]
        else:
            groups = [order_idx[classes[order_idx] == c]
                      for c in range(classes.max() + 1)]
        total = 0
        nchunks = 0
        eng_chunks = 0
        for gidx in groups:
            m = len(gidx)
            if m == 0:
                continue
            kcc = -(-m // gc)
            padn = kcc * gc - m
            xl = np.pad(xlo[gidx], (0, padn), constant_values=1e9)
            xh = np.pad(xhi[gidx], (0, padn), constant_values=-1e9)
            yl = np.pad(ylo[gidx], (0, padn), constant_values=1e9)
            yh = np.pad(yhi[gidx], (0, padn), constant_values=-1e9)
            cb = np.stack([xl.reshape(kcc, gc).min(1),
                           xh.reshape(kcc, gc).max(1),
                           yl.reshape(kcc, gc).min(1),
                           yh.reshape(kcc, gc).max(1)], 0)
            nchunks += kcc
            # engaged = chunks whose bbox overlaps the tile (per tile)
            for ti in range(n_th):
                y0t, y1t = ti * th, ti * th + th - 1
                ovy = (cb[2] <= y1t) & (cb[3] >= y0t)
                for tj in range(n_tw):
                    x0t, x1t = tj * tw, tj * tw + tw - 1
                    eng = ovy & (cb[0] <= x1t) & (cb[1] >= x0t)
                    e = eng.sum()
                    eng_chunks += e
                    total += e * gc
        print(f"{label}: volume={total/1e6:.2f}M ({total/exact_total:.2f}x "
              f"exact), engaged chunk-steps={eng_chunks}, chunks={nchunks}")
        return total, eng_chunks

    # anchor-perm order is identity (gm already permuted); chunk shapes via
    # re-grouping anchors: row-major within tile (2x128), and square-ish
    # blocks (16x16 => reorder by (block_y, block_x))
    ident = np.arange(n)
    for gc in (128, 256, 512):
        chunklist_volume(ident, gc, f"chunklist anchor-major gc={gc}")
    # square blocks: sort anchors by (ay//bs, ax//bs) block id
    for bs in (16, 32):
        bkey = (ay.astype(np.int64) // bs) * 1000 + ax.astype(np.int64) // bs
        bidx = np.argsort(bkey, kind="stable")
        chunklist_volume(bidx, bs * bs, f"chunklist {bs}x{bs} blocks")

    # ---- class partitions -------------------------------------------------
    bmax = np.maximum(bh, bw)
    for thr in ([24], [16, 48], [12, 32, 64]):
        edges = np.array(thr + [1e9])
        cls = np.searchsorted(edges, bmax, side="right").astype(np.int64)
        kcls = len(edges)
        share = [float((cls == c).mean()) for c in range(kcls)]
        print(f"classes thr={thr} shares={[f'{s:.2f}' for s in share]}")
        for gc in (128, 256):
            chunklist_volume(ident, gc, f"  class{kcls} gc={gc}",
                             classes=cls)


if __name__ == "__main__":
    main()
