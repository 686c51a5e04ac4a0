"""Metric CLI — equivalent of `TrainTestGSASR/scripts/metrics/
calculate_psnr_ssim.py` (and the lpips/dists variants, which are gated on
their optional packages).

Usage:
  python -m gsasr_tpu.cli.metrics --gt GT/ --restored SR/ --scale 4 \
      [--test_y_channel] [--suffix _x4]
"""

from __future__ import annotations

import argparse
import os


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt", required=True)
    p.add_argument("--restored", required=True)
    p.add_argument("--scale", type=float, default=4)
    p.add_argument("--suffix", default="")
    p.add_argument("--test_y_channel", action="store_true")
    p.add_argument("--metric", default="psnr_ssim",
                   choices=["psnr_ssim", "lpips", "dists"])
    args = p.parse_args()

    import cv2
    import numpy as np

    from gsasr_tpu.metrics import (calculate_psnr, calculate_ssim,
                                   crop_border_for_scale)

    crop = crop_border_for_scale(args.scale)
    names = sorted(os.listdir(args.gt))

    if args.metric in ("lpips", "dists"):
        pkg = "lpips" if args.metric == "lpips" else "DISTS_pytorch"
        try:
            __import__(pkg)
        except ImportError:
            raise SystemExit(
                f"{args.metric} requires the optional '{pkg}' package, "
                "which is not installed in this environment")

    psnrs, ssims = [], []
    for name in names:
        base, ext = os.path.splitext(name)
        rest_path = os.path.join(args.restored, base + args.suffix + ext)
        if not os.path.exists(rest_path):
            rest_path = os.path.join(args.restored, name)
        gt = cv2.imread(os.path.join(args.gt, name)).astype(np.float64)
        sr = cv2.imread(rest_path).astype(np.float64)
        psnrs.append(calculate_psnr(sr, gt, crop,
                                    test_y_channel=args.test_y_channel))
        ssims.append(calculate_ssim(sr, gt, crop,
                                    test_y_channel=args.test_y_channel))
        print(f"{name}: psnr {psnrs[-1]:.4f} ssim {ssims[-1]:.5f}")

    print(f"Average: psnr {np.mean(psnrs):.4f} ssim {np.mean(ssims):.5f} "
          f"({len(names)} images, crop {crop}, "
          f"y={args.test_y_channel})")


if __name__ == "__main__":
    main()
