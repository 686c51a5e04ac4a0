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


def _load_palette(palette_src):
    palette = None
    if palette_src and os.path.isdir(palette_src):
        pix = []
        for name in sorted(os.listdir(palette_src)):
            img = _imread(Path(palette_src) / name)
            if img is not None:
                pix.append(img.reshape(-1, img.shape[-1])[::7])
        if pix:
            palette = np.concatenate(pix, axis=0)
    return palette


def _pick_colors(rng, palette, n):
    if palette is not None:
        return palette[rng.integers(0, len(palette), n)].astype(np.float32)
    return rng.integers(0, 256, (n, 3)).astype(np.float32)


def _gradient_bg(rng, big, palette):
    """Smooth linear gradient between two palette colors (float32 HxWx3)."""
    c0, c1 = _pick_colors(rng, palette, 2)
    ang = rng.uniform(0, 2 * np.pi)
    yy, xx = np.mgrid[0:big, 0:big].astype(np.float32) / big
    t = (np.cos(ang) * xx + np.sin(ang) * yy)
    t = (t - t.min()) / max(t.max() - t.min(), 1e-6)
    return c0[None, None] * (1 - t[..., None]) + c1[None, None] * t[..., None]


def _luma(c):
    # BGR order (cv2 convention used throughout this module)
    return 0.114 * c[..., 0] + 0.587 * c[..., 1] + 0.299 * c[..., 2]


def _contrast_color(rng, palette, bg_mean):
    """Palette color with |luma - bg| >= 60 (flip to black/white if the
    palette can't provide contrast after a few draws)."""
    for _ in range(8):
        c = _pick_colors(rng, palette, 1)[0]
        if abs(_luma(c) - _luma(bg_mean)) >= 60:
            return c
    return (np.zeros(3, np.float32) if _luma(bg_mean) > 127
            else np.full(3, 255, np.float32))


_FONT_DIR = None


def _font_paths():
    global _FONT_DIR
    if _FONT_DIR is None:
        import matplotlib
        d = Path(matplotlib.get_data_path()) / "fonts" / "ttf"
        _FONT_DIR = sorted(str(p) for p in d.glob("*.ttf"))
    return _FONT_DIR


_CHARSET = ("abcdefghijklmnopqrstuvwxyz" "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
            "0123456789" ".,;:!?-")


def _rand_word(rng, lo=2, hi=10):
    k = int(rng.integers(lo, hi + 1))
    return "".join(_CHARSET[i] for i in rng.integers(0, len(_CHARSET), k))


def _gen_text(rng, big, palette):
    """Rendered text/glyphs: paragraphs, scattered rotated words, or large
    single glyphs on a smooth gradient background. Text is a strong prior
    for the thin-stroke / high-contrast-edge structures natural corpora
    underrepresent (document photos, signage, Manga109-style content)."""
    from PIL import Image, ImageDraw, ImageFont

    bg = _gradient_bg(rng, big, palette)
    canvas = Image.fromarray(np.clip(bg, 0, 255).astype(np.uint8))
    fonts = _font_paths()
    mode = ["paragraph", "words", "glyphs"][int(rng.integers(0, 3))]
    bg_mean = bg.mean(axis=(0, 1))

    if mode == "paragraph":
        fs = int(rng.integers(18, 56))
        font = ImageFont.truetype(fonts[int(rng.integers(0, len(fonts)))], fs)
        col = _contrast_color(rng, palette, bg_mean)
        draw = ImageDraw.Draw(canvas)
        y = int(rng.integers(0, fs))
        while y < big:
            words = " ".join(_rand_word(rng) for _ in range(12))
            draw.text((int(rng.integers(0, fs)), y), words,
                      fill=tuple(int(v) for v in col), font=font)
            y += int(fs * rng.uniform(1.1, 1.8))
    elif mode == "words":
        n_words = int(rng.integers(25, 70))
        for _ in range(n_words):
            fs = int(rng.integers(20, 130))
            font = ImageFont.truetype(
                fonts[int(rng.integers(0, len(fonts)))], fs)
            word = _rand_word(rng, 2, 8)
            col = _contrast_color(rng, palette, bg_mean)
            patch = Image.new("RGBA", (fs * 9, fs * 2), (0, 0, 0, 0))
            ImageDraw.Draw(patch).text(
                (4, 4), word, font=font,
                fill=tuple(int(v) for v in col) + (255,))
            ang = float(rng.choice([0.0, 0.0, 0.0, 90.0, 270.0,
                                    rng.uniform(-35, 35)]))
            if ang:
                patch = patch.rotate(ang, expand=True,
                                     resample=Image.BICUBIC)
            x = int(rng.integers(-fs, big - fs // 2))
            y = int(rng.integers(-fs, big - fs // 2))
            canvas.paste(patch, (x, y), patch)
    else:
        for _ in range(int(rng.integers(4, 14))):
            fs = int(rng.integers(200, 520))
            font = ImageFont.truetype(
                fonts[int(rng.integers(0, len(fonts)))], fs)
            ch = _CHARSET[int(rng.integers(0, 62))]
            col = _pick_colors(rng, palette, 1)[0]
            ImageDraw.Draw(canvas).text(
                (int(rng.integers(-fs // 2, big - fs // 2)),
                 int(rng.integers(-fs // 2, big - fs // 2))),
                ch, font=font, fill=tuple(int(v) for v in col))
    return np.asarray(canvas, np.uint8)


def _colormap(rng, palette, t):
    """Map a [0,1] field through a 3-stop palette-color gradient."""
    stops = _pick_colors(rng, palette, 3)
    t = np.clip(t, 0.0, 1.0)[..., None]
    lo = stops[0] + (stops[1] - stops[0]) * np.minimum(t * 2, 1.0)
    return lo + (stops[2] - stops[1]) * np.maximum(t * 2 - 1.0, 0.0)


def _gen_texture(rng, big, palette):
    """Procedural textures: multi-octave value noise (1/f^beta spectra),
    oriented sinusoid mixtures, or Voronoi mosaics — band-limited and
    quasi-periodic structure (fabric, foliage, masonry) that dead-leaves'
    flat discs lack entirely."""
    import cv2
    kind = ["noise", "waves", "voronoi"][int(rng.integers(0, 3))]
    if kind == "noise":
        beta = rng.uniform(0.7, 1.8)
        field = np.zeros((big, big), np.float32)
        for i, g in enumerate([4, 8, 16, 32, 64, 128]):
            layer = cv2.resize(rng.random((g, g), dtype=np.float32),
                               (big, big), interpolation=cv2.INTER_CUBIC)
            field += layer / (2.0 ** (beta * i))
        field = (field - field.min()) / max(np.ptp(field), 1e-6)
        return np.clip(_colormap(rng, palette, field), 0, 255).astype(
            np.uint8)
    if kind == "waves":
        yy, xx = np.mgrid[0:big, 0:big].astype(np.float32) / big
        field = np.zeros((big, big), np.float32)
        for _ in range(int(rng.integers(3, 7))):
            ang = rng.uniform(0, np.pi)
            freq = rng.uniform(4, 60)
            ph = rng.uniform(0, 2 * np.pi)
            field += rng.uniform(0.3, 1.0) * np.sin(
                2 * np.pi * freq * (np.cos(ang) * xx + np.sin(ang) * yy)
                + ph)
        field = (field - field.min()) / max(np.ptp(field), 1e-6)
        return np.clip(_colormap(rng, palette, field), 0, 255).astype(
            np.uint8)
    # voronoi mosaic
    n_seed = int(rng.integers(40, 400))
    sx = rng.integers(0, big, n_seed).astype(np.float32)
    sy = rng.integers(0, big, n_seed).astype(np.float32)
    cols = _pick_colors(rng, palette, n_seed)
    yy, xx = np.mgrid[0:big, 0:big].astype(np.float32)
    label = np.zeros((big, big), np.int32)
    best = np.full((big, big), np.inf, np.float32)
    for k0 in range(0, n_seed, 64):
        k1 = min(k0 + 64, n_seed)
        d = ((xx[..., None] - sx[None, None, k0:k1]) ** 2
             + (yy[..., None] - sy[None, None, k0:k1]) ** 2)
        kmin = d.argmin(-1)
        dmin = np.take_along_axis(d, kmin[..., None], -1)[..., 0]
        upd = dmin < best
        label[upd] = kmin[upd] + k0
        best[upd] = dmin[upd]
    img = cols[label]
    edge = ((np.diff(label, axis=0, prepend=label[:1]) != 0)
            | (np.diff(label, axis=1, prepend=label[:, :1]) != 0))
    img[edge] *= rng.uniform(0.3, 0.7)
    return np.clip(img, 0, 255).astype(np.uint8)


def _gen_composite(rng, big, palette):
    """Piecewise-smooth composites: occluding polygons/ellipses each filled
    with a linear gradient between palette colors over a gradient
    background — cartoon/illustration-like images whose within-region
    smoothness + sharp boundaries match the piecewise-smooth image model."""
    from PIL import Image, ImageDraw

    canvas = _gradient_bg(rng, big, palette)
    n_shapes = int(rng.integers(10, 28))
    yy, xx = np.mgrid[0:big, 0:big].astype(np.float32) / big
    for _ in range(n_shapes):
        cx, cy = rng.integers(0, big, 2)
        r = rng.uniform(0.06, 0.45) * big
        mask_img = Image.new("L", (big, big), 0)
        d = ImageDraw.Draw(mask_img)
        shape = ["poly", "ellipse"][int(rng.integers(0, 2))]
        if shape == "poly":
            nv = int(rng.integers(3, 9))
            angs = np.sort(rng.uniform(0, 2 * np.pi, nv))
            rad = r * rng.uniform(0.5, 1.0, nv)
            pts = [(float(cx + rad[i] * np.cos(angs[i])),
                    float(cy + rad[i] * np.sin(angs[i])))
                   for i in range(nv)]
            d.polygon(pts, fill=255)
        else:
            ar = rng.uniform(0.4, 1.0)
            d.ellipse([cx - r, cy - r * ar, cx + r, cy + r * ar], fill=255)
        mask = np.asarray(mask_img) > 0
        if not mask.any():
            continue
        c0, c1 = _pick_colors(rng, palette, 2)
        ang = rng.uniform(0, 2 * np.pi)
        t = np.cos(ang) * xx + np.sin(ang) * yy
        t = (t - t.min()) / max(t.max() - t.min(), 1e-6)
        fill = c0[None, None] * (1 - t[..., None]) + c1[None, None] * \
            t[..., None]
        canvas[mask] = fill[mask]
    return np.clip(canvas, 0, 255).astype(np.uint8)


def synthetic(dst: str, n: int = 400, size: int = 256, seed: int = 0,
              palette_src: str = None, workers: int = 2,
              family: str = "dead-leaves"):
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
    palette = _load_palette(palette_src)

    ss = 2  # supersampling factor
    big = size * ss

    if family != "dead-leaves":
        gen = {"text": _gen_text, "texture": _gen_texture,
               "composite": _gen_composite}[family]
        tag = {"text": "tx", "texture": "pt", "composite": "pc"}[family]

        def one_f(i):
            rng = np.random.default_rng(seed * 100003 + i)
            img = gen(rng, big, palette)
            out = cv2.resize(img, (size, size),
                             interpolation=cv2.INTER_LANCZOS4)
            cv2.imwrite(str(Path(dst) / f"{tag}{i:05d}.png"), out)

        from concurrent.futures import ThreadPoolExecutor
        with ThreadPoolExecutor(max_workers=workers) as pool:
            list(pool.map(one_f, range(n)))
        print(f"wrote {n} {family} {size}^2 images to {dst}")
        return

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
    y.add_argument("--family", default="dead-leaves",
                   choices=["dead-leaves", "text", "texture", "composite"])

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
                  args.workers, args.family)


if __name__ == "__main__":
    main()
