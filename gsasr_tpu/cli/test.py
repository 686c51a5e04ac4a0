"""Benchmark evaluation CLI — equivalent of `TrainTestGSASR/basicsr/test.py`
+ `GSASRModel.nondist_validation` (`gsasr_model.py:433-504`).

Usage:
  python -m gsasr_tpu.cli.test --gt <GT folder> --lq <LR folder> --scale 4 \
      --enc_ckpt net_g.pth --dec_ckpt net_fea2gs.pth \
      [--tile_size 480 --tile_overlap 8 --crop_size 4] [--save_sr out/]

Protocol: PSNR/SSIM on the Y channel, crop_border = scale if <= 8 else 8
(`README.md:349-355`). LPIPS/DISTS hooks follow the reference protocol
table (`inference_paper_benchmark.py:127-156`, `basicsr/metrics/lpips.py`):
pass --lpips_weights / --dists_weights (official .pth files, user-supplied
in this zero-egress image) to enable them; absent weights -> metric
skipped. Peak device memory is reported when the runtime exposes it
(`jax.local_devices()[0].memory_stats()`).
"""

from __future__ import annotations

import argparse
import os
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True)
    p.add_argument("--lq", required=True)
    p.add_argument("--scale", type=float, default=4.0)
    p.add_argument("--model", default="EDSR",
                   choices=["EDSR", "RDN", "SWIN", "HATL"])
    p.add_argument("--version", default="paper",
                   choices=["paper", "enhanced", "ultra"])
    p.add_argument("--AMP_test", "--bf16", dest="bf16", action="store_true")
    p.add_argument("--enc_ckpt", default=None)
    p.add_argument("--dec_ckpt", default=None)
    p.add_argument("--orbax_ckpt", default=None,
                   help="orbax checkpoint step dir (as written by "
                        "save_checkpoint: <dir>/<step>) holding net_g + "
                        "net_fea2gs")
    p.add_argument("--param_key", default="params_ema",
                   choices=["params", "params_ema"],
                   help="reference param_key_g semantics: eval uses "
                        "params_ema by default")
    p.add_argument("--dmax", type=float, default=0.1)
    p.add_argument("--tile_size", type=int, default=0,
                   help="0 disables tiling")
    p.add_argument("--tile_overlap", type=int, default=8)
    p.add_argument("--crop_size", type=int, default=4)
    p.add_argument("--save_sr", default=None)
    p.add_argument("--limit", type=int, default=0)
    p.add_argument("--lpips_weights", default=None,
                   help="official LPIPS (alex) weights .pth; enables LPIPS")
    p.add_argument("--lpips_net", default="alex",
                   choices=["alex", "vgg"])
    p.add_argument("--dists_weights", default=None,
                   help="official DISTS weights.pt (+VGG16); enables DISTS")
    args = p.parse_args()

    import cv2
    from gsasr_tpu.utils.env import enable_compilation_cache
    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gsasr_tpu.data.datasets import PairedImageDataset
    from gsasr_tpu.metrics import (calculate_psnr, calculate_ssim,
                                   crop_border_for_scale)
    from gsasr_tpu.cli.infer import build_models
    from gsasr_tpu.model import sr_forward
    from gsasr_tpu.tiling import split_and_joint_image
    from gsasr_tpu.utils.checkpoint import load_torch_checkpoint

    enc, dec, enc_kind, dec_kind, denom = build_models(
        args.model, args.version, args.bf16)
    rng = jax.random.PRNGKey(0)
    if args.orbax_ckpt:
        from gsasr_tpu.utils.checkpoint import load_eval_params
        enc_params, dec_params = load_eval_params(args.orbax_ckpt,
                                                  args.param_key)
    elif args.enc_ckpt:
        enc_params = load_torch_checkpoint(args.enc_ckpt, enc_kind)
        dec_params = load_torch_checkpoint(args.dec_ckpt, dec_kind)
    else:
        print("WARNING: random init (smoke mode)")
        enc_params = enc.init(rng, jnp.zeros((1, 12, 12, 3)))["params"]
        dec_params = dec.init(rng, jnp.zeros((1, 12, 12, 64)),
                              jnp.ones((1,)))["params"]

    ds = PairedImageDataset(args.gt, args.lq, args.scale)
    n = len(ds) if not args.limit else min(args.limit, len(ds))
    crop = crop_border_for_scale(args.scale)

    # Perceptual metric hooks (skip-if-absent weights; zero-egress image
    # cannot bundle torchvision/LPIPS checkpoints).
    lpips_params = dists_params = None
    if args.lpips_weights:
        import torch

        from gsasr_tpu.metrics_perceptual import (calculate_lpips,
                                                  convert_lpips)
        sd = torch.load(args.lpips_weights, map_location="cpu",
                        weights_only=True)
        lpips_params = convert_lpips(sd, net=args.lpips_net)
    if args.dists_weights:
        import torch

        from gsasr_tpu.metrics_perceptual import (calculate_dists,
                                                  convert_dists)
        sd = torch.load(args.dists_weights, map_location="cpu",
                        weights_only=True)
        dists_params = convert_dists(sd)
        if not dists_params.get("net"):
            raise SystemExit(
                "--dists_weights must contain the VGG16 backbone convs as "
                "well as alpha/beta (merge torchvision vgg16 features into "
                "the DISTS weights.pt state dict)")

    psnrs, ssims, times, lpipss, distss = [], [], [], [], []
    for i in range(n):
        item = ds[i]
        lq = jnp.asarray(item["lq"])[None]
        gt = item["gt"]
        h, w = lq.shape[1:3]
        want = (gt.shape[0], gt.shape[1])

        t0 = time.perf_counter()
        if args.tile_size and min(h, w) > args.tile_size:
            canvas = split_and_joint_image(
                lq, args.scale, args.tile_size, args.tile_overlap,
                enc, dec, enc_params, dec_params,
                crop_size=args.crop_size, if_dmax=True, dmax=args.dmax)
            sr = canvas[0, :want[0], :want[1]]
        else:
            out = sr_forward(enc, dec, enc_params, dec_params, lq,
                             args.scale, sr_size=want, denominator=denom,
                             dmax=args.dmax)
            sr = np.asarray(out[0])
        times.append(time.perf_counter() - t0)

        sr255 = np.clip(sr, 0, 1) * 255.0
        gt255 = gt * 255.0
        psnrs.append(calculate_psnr(sr255, gt255, crop, test_y_channel=True,
                                    channel_order="rgb"))
        ssims.append(calculate_ssim(sr255, gt255, crop, test_y_channel=True,
                                    channel_order="rgb"))
        extra = ""
        if lpips_params is not None:
            # calculate_lpips expects BGR-ordered inputs (reference
            # `lpips.py:11-63` reads images via cv2).
            lpipss.append(calculate_lpips(
                sr255[..., ::-1], gt255[..., ::-1], crop, lpips_params,
                net=args.lpips_net))
            extra += f" lpips {lpipss[-1]:.4f}"
        if dists_params is not None:
            distss.append(calculate_dists(
                sr255[..., ::-1], gt255[..., ::-1], crop, dists_params))
            extra += f" dists {distss[-1]:.4f}"
        print(f"[{i+1}/{n}] {os.path.basename(item['gt_path'])} "
              f"psnr {psnrs[-1]:.3f} ssim {ssims[-1]:.4f} "
              f"{times[-1]*1e3:.0f} ms{extra}", flush=True)

        if args.save_sr:
            os.makedirs(args.save_sr, exist_ok=True)
            name = os.path.basename(item["gt_path"])
            cv2.imwrite(os.path.join(args.save_sr, name),
                        (np.clip(sr, 0, 1)[:, :, ::-1] * 255).round()
                        .astype(np.uint8))

    # protocol: discard the first 2 timings (inference_paper_benchmark:169)
    avg_t = float(np.mean(times[2:])) if len(times) > 2 else float(
        np.mean(times))
    summary = (f"AVG psnr {np.mean(psnrs):.4f} ssim {np.mean(ssims):.5f} "
               f"time {avg_t*1e3:.1f} ms over {n} images")
    if lpipss:
        summary += f" lpips {np.mean(lpipss):.4f}"
    if distss:
        summary += f" dists {np.mean(distss):.4f}"
    # peak device memory (reference protocol reports max_memory_allocated,
    # `inference_paper_benchmark.py:127-156`); not all runtimes expose it.
    stats = jax.local_devices()[0].memory_stats() or {}
    peak = stats.get("peak_bytes_in_use")
    summary += (f" peak_mem {peak / 2**20:.0f} MiB" if peak
                else " peak_mem n/a")
    print(summary)


if __name__ == "__main__":
    main()
