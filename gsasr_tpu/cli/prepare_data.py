"""Dataset preparation CLI — equivalents of
`TrainTestGSASR/scripts/data_preparation/`:

- extract-subimages (`extract_subimages.py`): crop training GTs into
  overlapping sub-images (default 512^2, step 256) with a thread pool.
- generate-lr (`generate_bicubic_img_use_python_matlab.py` +
  `..._float_scale.py`): MATLAB-faithful bicubic LR counterparts for
  integer or float scales.
- test-crops (`test_time_img_generate.py`): random fixed-size GT crops
  (720^2 default) for the compute-cost protocol.
- multiscale (`generate_multiscale_dataset.py`): Lanczos downscale pyramid
  (x0.9...x0.4) plus a shortest-edge-512 rescale per image.
"""

from __future__ import annotations

import argparse
import concurrent.futures as futures
import os
import random
from pathlib import Path

import numpy as np


def _imread(path):
    import cv2
    img = cv2.imread(str(path), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img


def extract_subimages(src: str, dst: str, crop: int = 512, step: int = 256,
                      thresh: int = 48, workers: int = 8):
    os.makedirs(dst, exist_ok=True)
    import cv2

    def one(name):
        img = _imread(Path(src) / name)
        h, w = img.shape[:2]
        base, ext = os.path.splitext(name)
        idx = 0
        ys = list(range(0, h - crop + 1, step))
        xs = list(range(0, w - crop + 1, step))
        if h - (ys[-1] + crop) > thresh:
            ys.append(h - crop)
        if w - (xs[-1] + crop) > thresh:
            xs.append(w - crop)
        for y in ys:
            for x in xs:
                idx += 1
                cv2.imwrite(str(Path(dst) / f"{base}_s{idx:03d}{ext}"),
                            img[y:y + crop, x:x + crop])
        return idx

    names = sorted(os.listdir(src))
    with futures.ThreadPoolExecutor(workers) as pool:
        total = sum(pool.map(one, names))
    print(f"wrote {total} sub-images to {dst}")


def generate_lr(gt: str, dst: str, scale: float, workers: int = 8):
    from gsasr_tpu.data.matlab_resize import imresize_new

    os.makedirs(dst, exist_ok=True)
    import cv2

    def one(name):
        img = _imread(Path(gt) / name).astype(np.float32) / 255.0
        lr = imresize_new(img, 1 / scale, 1 / scale)
        out = (np.clip(lr, 0, 1) * 255.0).round().astype(np.uint8)
        cv2.imwrite(str(Path(dst) / name), out)

    names = sorted(os.listdir(gt))
    with futures.ThreadPoolExecutor(workers) as pool:
        list(pool.map(one, names))
    print(f"wrote {len(names)} LR images (x{scale}) to {dst}")


def test_crops(src: str, dst: str, size: int = 720, seed: int = 0):
    os.makedirs(dst, exist_ok=True)
    import cv2
    rng = random.Random(seed)
    n = 0
    for name in sorted(os.listdir(src)):
        img = _imread(Path(src) / name)
        h, w = img.shape[:2]
        if h < size or w < size:
            continue
        y = rng.randint(0, h - size)
        x = rng.randint(0, w - size)
        cv2.imwrite(str(Path(dst) / name), img[y:y + size, x:x + size])
        n += 1
    print(f"wrote {n} {size}^2 crops to {dst}")


def multiscale(src: str, dst: str = None, shortest_edge: int = 512,
               scales=(0.9, 0.8, 0.7, 0.6, 0.5, 0.4)):
    """Lanczos downscale pyramid + shortest-edge-512 rescale — equivalent of
    `TrainTestGSASR/scripts/data_preparation/generate_multiscale_dataset.py`.
    """
    from PIL import Image

    src = src.rstrip("/")
    if dst is None:
        dst = os.path.join(
            os.path.dirname(src),
            f"{os.path.basename(src)}_multiscaleHR_shortest{shortest_edge}")
    os.makedirs(dst, exist_ok=True)
    n = 0
    for name in sorted(os.listdir(src)):
        base = os.path.splitext(name)[0]
        img = Image.open(Path(src) / name)
        w, h = img.size
        for idx, s in enumerate(scales):
            if min(int(w * s), int(h * s)) >= shortest_edge:
                rlt = img.resize((int(w * s), int(h * s)),
                                 resample=Image.LANCZOS)
                rlt.save(Path(dst) / f"{base}T{idx}.png")
                n += 1
        # smallest variant: shortest edge exactly `shortest_edge`
        if w < h:
            nw, nh = shortest_edge, int(shortest_edge * h / w)
        else:
            nh, nw = shortest_edge, int(shortest_edge * w / h)
        img.resize((nw, nh), resample=Image.LANCZOS).save(
            Path(dst) / f"{base}T{len(scales)}.png")
        n += 1
    print(f"wrote {n} multiscale images to {dst}")


def synthetic(dst: str, n: int = 400, size: int = 256, seed: int = 0,
              palette_src: str = None, workers: int = 2):
    """Dead-leaves synthetic training images (occlusion model with a
    power-law radius distribution) — a standard regularity prior for
    restoration training when natural data is scarce (scale-invariant
    statistics, sharp occlusion edges at all orientations/scales; see
    e.g. Achddou et al., "Synthetic images as a regularity prior for
    image restoration", SSVM 2021).

    Rendered at 2x and Lanczos-downscaled for clean anti-aliased edges
    (matching the mild PSF of the natural HR sources the dataset's
    bicubic-LR pipeline assumes). Colors are drawn from the empirical
    pixel distribution of `palette_src` images when given (keeps the
    synthetic corpus' color statistics natural); else uniform RGB.
    """
    import cv2
    import numpy as np

    os.makedirs(dst, exist_ok=True)
    palette = None
    if palette_src and os.path.isdir(palette_src):
        pix = []
        for name in sorted(os.listdir(palette_src)):
            img = _imread(Path(palette_src) / name)
            if img is not None:
                pix.append(img.reshape(-1, img.shape[-1])[::7])
        if pix:
            palette = np.concatenate(pix, axis=0)

    ss = 2  # supersampling factor
    big = size * ss

    def one(i):
        rng = np.random.default_rng(seed * 100003 + i)
        canvas = np.zeros((big, big, 3), np.uint8)
        covered = np.zeros((big, big), bool)
        # power-law radii r^-3 on [rmin, rmax] via inverse-CDF sampling
        rmin, rmax = 2.0 * ss, 0.4 * big
        n_shapes = 4000
        u = rng.random(n_shapes)
        a = rmin ** -2
        b = rmax ** -2
        radii = (a - u * (a - b)) ** -0.5
        xs = rng.integers(0, big, n_shapes)
        ys = rng.integers(0, big, n_shapes)
        if palette is not None:
            cols = palette[rng.integers(0, len(palette), n_shapes)]
        else:
            cols = rng.integers(0, 256, (n_shapes, 3))
        # front-to-back with an occupancy mask: equivalent to back-to-front
        # painting but lets us stop as soon as the canvas is covered
        yy, xx = np.mgrid[0:big, 0:big]
        for k in range(n_shapes):
            r = radii[k]
            x0, x1 = max(0, int(xs[k] - r) - 1), min(big, int(xs[k] + r) + 2)
            y0, y1 = max(0, int(ys[k] - r) - 1), min(big, int(ys[k] + r) + 2)
            if x0 >= x1 or y0 >= y1:
                continue
            sub = ((xx[y0:y1, x0:x1] - xs[k]) ** 2
                   + (yy[y0:y1, x0:x1] - ys[k]) ** 2) <= r * r
            put = sub & ~covered[y0:y1, x0:x1]
            if put.any():
                canvas[y0:y1, x0:x1][put] = cols[k]
                covered[y0:y1, x0:x1] |= sub
            if k % 256 == 255 and covered.all():
                break
        if not covered.all():
            canvas[~covered] = cols[0]
        out = cv2.resize(canvas, (size, size),
                         interpolation=cv2.INTER_LANCZOS4)
        cv2.imwrite(str(Path(dst) / f"dl{i:05d}.png"), out)

    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=workers) as pool:
        list(pool.map(one, range(n)))
    print(f"wrote {n} dead-leaves {size}^2 images to {dst}")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)

    s = sub.add_parser("extract-subimages")
    s.add_argument("--src", required=True)
    s.add_argument("--dst", required=True)
    s.add_argument("--crop", type=int, default=512)
    s.add_argument("--step", type=int, default=256)
    s.add_argument("--workers", type=int, default=8)

    g = sub.add_parser("generate-lr")
    g.add_argument("--gt", required=True)
    g.add_argument("--dst", required=True)
    g.add_argument("--scale", type=float, required=True)
    g.add_argument("--workers", type=int, default=8)

    t = sub.add_parser("test-crops")
    t.add_argument("--src", required=True)
    t.add_argument("--dst", required=True)
    t.add_argument("--size", type=int, default=720)

    m = sub.add_parser("multiscale")
    m.add_argument("--src", required=True)
    m.add_argument("--dst", default=None)
    m.add_argument("--shortest-edge", type=int, default=512)

    y = sub.add_parser("synthetic")
    y.add_argument("--dst", required=True)
    y.add_argument("--n", type=int, default=400)
    y.add_argument("--size", type=int, default=256)
    y.add_argument("--seed", type=int, default=0)
    y.add_argument("--palette-src", default=None)
    y.add_argument("--workers", type=int, default=2)

    args = p.parse_args()
    if args.cmd == "extract-subimages":
        extract_subimages(args.src, args.dst, args.crop, args.step,
                          workers=args.workers)
    elif args.cmd == "generate-lr":
        generate_lr(args.gt, args.dst, args.scale, args.workers)
    elif args.cmd == "test-crops":
        test_crops(args.src, args.dst, args.size)
    elif args.cmd == "multiscale":
        multiscale(args.src, args.dst, args.shortest_edge)
    elif args.cmd == "synthetic":
        synthetic(args.dst, args.n, args.size, args.seed, args.palette_src,
                  args.workers)


if __name__ == "__main__":
    main()
