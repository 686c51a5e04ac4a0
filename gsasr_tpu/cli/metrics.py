"""Metric CLI — equivalent of `TrainTestGSASR/scripts/metrics/`:
`calculate_psnr_ssim.py`, `calculate_niqe.py`,
`calculate_fid_stats_from_datasets.py`, `calculate_fid_folder.py`
(and the lpips/dists variants, which are gated on their optional packages).

Usage:
  python -m gsasr_tpu.cli.metrics --gt GT/ --restored SR/ --scale 4 \
      [--test_y_channel] [--suffix _x4]
  python -m gsasr_tpu.cli.metrics --metric niqe --restored SR/ [--crop 0]
  python -m gsasr_tpu.cli.metrics --metric fid-stats --restored IMGS/ \
      --inception_params inception.npz --out stats.npz
  python -m gsasr_tpu.cli.metrics --metric fid --restored SR/ \
      --inception_params inception.npz --fid_stats stats.npz
"""

from __future__ import annotations

import argparse
import os


def _niqe_folder(args):
    import cv2
    import numpy as np
    from gsasr_tpu.metrics_niqe import calculate_niqe

    scores = []
    names = sorted(os.listdir(args.restored))
    for i, name in enumerate(names):
        img = cv2.imread(os.path.join(args.restored, name),
                         cv2.IMREAD_UNCHANGED)
        s = calculate_niqe(img, int(args.crop), convert_to="y")
        print(f"{i + 1:3d}: {os.path.splitext(name)[0]:25}\tNIQE: {s:.6f}")
        scores.append(s)
    print(f"Average: NIQE: {np.mean(scores):.6f} ({len(scores)} images)")


def _inception_feature_fn(params_path):
    """Feature extractor from a user-supplied InceptionV3-FID TorchScript
    file (the pytorch-fid artifact). Note the reference's own FID path is
    broken as shipped: `basicsr/metrics/fid.py:7` imports
    `basicsr.archs.inception`, which does not exist in the repo. We accept
    the standard TorchScript module instead (zero-egress gate: no weights
    are bundled)."""
    if not params_path or not os.path.exists(params_path):
        raise SystemExit(
            "FID needs a pretrained InceptionV3-FID network; pass "
            "--inception_params PATH to a TorchScript file "
            "(e.g. pytorch-fid's pt_inception-2015-12-05 export)")
    import numpy as np
    import torch
    mod = torch.jit.load(params_path, map_location="cpu").eval()

    def feature_fn(img_hwc01):
        x = torch.from_numpy(
            np.ascontiguousarray(img_hwc01, dtype=np.float32))
        x = x.permute(2, 0, 1)[None]
        with torch.no_grad():
            out = mod(x)
        out = out[0] if isinstance(out, (tuple, list)) else out
        return out.reshape(-1).numpy()

    return feature_fn


def _fid_stats(args):
    import cv2
    import numpy as np
    from gsasr_tpu.metrics_perceptual import (compute_feature_stats,
                                              extract_features)

    feature_fn = _inception_feature_fn(args.inception_params)
    names = sorted(os.listdir(args.restored))
    imgs = (cv2.imread(os.path.join(args.restored, n))[..., ::-1] / 255.0
            for n in names)
    feats = extract_features(imgs, feature_fn)
    mu, sigma = compute_feature_stats(feats)
    np.savez(args.out, mean=mu, cov=sigma)
    print(f"wrote stats for {len(names)} images to {args.out}")


def _fid_folder(args):
    import cv2
    import numpy as np
    from gsasr_tpu.metrics_perceptual import (calculate_fid,
                                              compute_feature_stats,
                                              extract_features)

    feature_fn = _inception_feature_fn(args.inception_params)
    stats = np.load(args.fid_stats)
    names = sorted(os.listdir(args.restored))
    imgs = (cv2.imread(os.path.join(args.restored, n))[..., ::-1] / 255.0
            for n in names)
    mu, sigma = compute_feature_stats(extract_features(imgs, feature_fn))
    fid = calculate_fid(mu, sigma, stats["mean"], stats["cov"])
    print(f"FID: {fid:.6f} ({len(names)} images)")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--gt")
    p.add_argument("--restored", required=True)
    p.add_argument("--scale", type=float, default=4)
    p.add_argument("--suffix", default="")
    p.add_argument("--test_y_channel", action="store_true")
    p.add_argument("--crop", type=float, default=0,
                   help="crop border (niqe)")
    p.add_argument("--inception_params", default=None)
    p.add_argument("--fid_stats", default=None)
    p.add_argument("--out", default="fid_stats.npz")
    p.add_argument("--metric", default="psnr_ssim",
                   choices=["psnr_ssim", "lpips", "dists", "niqe",
                            "fid-stats", "fid"])
    args = p.parse_args()

    if args.metric == "niqe":
        return _niqe_folder(args)
    if args.metric == "fid-stats":
        return _fid_stats(args)
    if args.metric == "fid":
        return _fid_folder(args)
    if args.gt is None:
        raise SystemExit("--gt is required for paired metrics")

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
