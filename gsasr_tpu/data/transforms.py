"""Crop / flip / rotate transforms — equivalent of
`TrainTestGSASR/basicsr/data/transforms.py`:

- `mod_crop` (:9-26), `paired_random_crop` (:29-97),
- `augment` flip-or-rot90 with flow support and status return (:100-164),
- `img_rotate` arbitrary-angle warp (:167-184),
- `my_augment` — the GSASR repo's extended augmentation (flip OR rot90 OR
  any-angle rotation OR MATLAB-bicubic rescale, :206-228).

All functions are numpy, RGB HWC float32 (this repo's data convention;
the reference operates on cv2 BGR — flips/crops are channel-agnostic).
Randomized entries accept an explicit ``rng: random.Random`` so the
dataset's per-position seeding discipline extends here; the reference
uses the global `random` state.
"""

from __future__ import annotations

import random
from typing import List, Optional, Sequence

import numpy as np


def mod_crop(img: np.ndarray, scale: int) -> np.ndarray:
    """Crop H and W to multiples of `scale` (test-time GT alignment)."""
    if img.ndim not in (2, 3):
        raise ValueError(f"Wrong img ndim: {img.ndim}.")
    h, w = img.shape[0], img.shape[1]
    return img[:h - h % scale, :w - w % scale, ...]


def paired_random_crop(img_gts, img_lqs, gt_patch_size: int, scale: int,
                       gt_path: Optional[str] = None,
                       rng: random.Random = None):
    """Crop matching LQ/GT patches at a random location.

    Lists share one crop location; scalars in/out mirror the reference's
    unwrap-single-element behavior.
    """
    rng = rng or random
    single_gt = not isinstance(img_gts, list)
    single_lq = not isinstance(img_lqs, list)
    gts: List[np.ndarray] = [img_gts] if single_gt else list(img_gts)
    lqs: List[np.ndarray] = [img_lqs] if single_lq else list(img_lqs)

    h_lq, w_lq = lqs[0].shape[0], lqs[0].shape[1]
    h_gt, w_gt = gts[0].shape[0], gts[0].shape[1]
    lq_patch_size = gt_patch_size // scale

    if h_gt != h_lq * scale or w_gt != w_lq * scale:
        raise ValueError(
            f"Scale mismatches. GT ({h_gt}, {w_gt}) is not {scale}x "
            f"multiplication of LQ ({h_lq}, {w_lq}).")
    if h_lq < lq_patch_size or w_lq < lq_patch_size:
        raise ValueError(
            f"LQ ({h_lq}, {w_lq}) is smaller than patch size "
            f"({lq_patch_size}, {lq_patch_size}). Please remove {gt_path}.")

    top = rng.randint(0, h_lq - lq_patch_size)
    left = rng.randint(0, w_lq - lq_patch_size)
    lqs = [v[top:top + lq_patch_size, left:left + lq_patch_size, ...]
           for v in lqs]
    top_gt, left_gt = int(top * scale), int(left * scale)
    gts = [v[top_gt:top_gt + gt_patch_size, left_gt:left_gt + gt_patch_size,
             ...] for v in gts]
    return (gts[0] if single_gt and len(gts) == 1 else gts,
            lqs[0] if single_lq and len(lqs) == 1 else lqs)


def augment(imgs, hflip: bool = True, rotation: bool = True, flows=None,
            return_status: bool = False, rng: random.Random = None):
    """Horizontal flip / vertical flip / 90° rotation, one draw shared by
    every image (and flow) in the list. Flow components are negated under
    the flips and swapped under the transpose, exactly as the reference."""
    rng = rng or random
    hflip = hflip and rng.random() < 0.5
    vflip = rotation and rng.random() < 0.5
    rot90 = rotation and rng.random() < 0.5

    def _augment(img):
        if hflip:
            img = img[:, ::-1, ...]
        if vflip:
            img = img[::-1, :, ...]
        if rot90:
            img = img.transpose(1, 0, 2) if img.ndim == 3 else img.T
        return np.ascontiguousarray(img)

    def _augment_flow(flow):
        flow = flow.copy()
        if hflip:
            flow = flow[:, ::-1, :]
            flow[:, :, 0] *= -1
        if vflip:
            flow = flow[::-1, :, :]
            flow[:, :, 1] *= -1
        if rot90:
            flow = flow.transpose(1, 0, 2)
            flow = flow[:, :, [1, 0]]
        return np.ascontiguousarray(flow)

    single = not isinstance(imgs, list)
    out = [_augment(v) for v in ([imgs] if single else imgs)]
    out = out[0] if single and len(out) == 1 else out

    if flows is not None:
        single_f = not isinstance(flows, list)
        fl = [_augment_flow(v) for v in ([flows] if single_f else flows)]
        return out, (fl[0] if single_f and len(fl) == 1 else fl)
    if return_status:
        return out, (hflip, vflip, rot90)
    return out


def img_rotate(img: np.ndarray, angle: float, center=None,
               scale: float = 1.0) -> np.ndarray:
    """Rotate (counter-clockwise for positive angles) about `center`."""
    import cv2

    h, w = img.shape[:2]
    if center is None:
        center = (w // 2, h // 2)
    matrix = cv2.getRotationMatrix2D(center, angle, scale)
    return cv2.warpAffine(img, matrix, (w, h))


def my_augment(imgs, flip: bool = True, flip_prob: float = 0.5,
               rot: bool = True, rot_prob: float = 0.5,
               resize: bool = True, resize_prob: float = 0.5,
               resize_range: Sequence[float] = (0.5, 1.0),
               rng: random.Random = None):
    """The GSASR repo's extended augmentation (`transforms.py:206-263`):
    maybe-flip (h or v), maybe-rotate (axis-aligned 90/180/270 with prob
    0.25, else any angle), maybe MATLAB-bicubic rescale by a random factor.
    One parameter draw shared by every image in the list."""
    from gsasr_tpu.data.matlab_resize import imresize_new

    rng = rng or random
    flip_p = rng.random()
    hflip_prob = rng.random()
    rot_p = rng.random()
    rot90_prob = rng.random()
    rot90_angle = rng.choice([90, 180, 270])
    rot_any_angle = rng.uniform(0, 360)
    resize_p = rng.random()
    resize_scale = float(rng.uniform(resize_range[0], resize_range[1]))

    def _augment(img):
        if flip and flip_p < flip_prob:
            img = (img[:, ::-1, ...] if hflip_prob < 0.5
                   else img[::-1, :, ...])
            img = np.ascontiguousarray(img)
        if rot and rot_p < rot_prob:
            angle = rot90_angle if rot90_prob < 0.25 else rot_any_angle
            img = img_rotate(img, angle=angle)
        if resize and resize_p < resize_prob:
            img = np.ascontiguousarray(
                imresize_new(img, resize_scale, resize_scale))
        return img

    single = not isinstance(imgs, list)
    out = [_augment(v) for v in ([imgs] if single else imgs)]
    return out[0] if single and len(out) == 1 else out
