"""Color-space conversions — equivalent of `basicsr/utils/color_util.py`.

BT.601 YCbCr conversions matching MATLAB rgb2ycbcr/ycbcr2rgb. All functions
take float [0, 1] or uint8-range [0, 255] HWC numpy arrays and return the
same range/type convention as the reference (float in, float out in [0,1]
scaled by the usual BasicSR _convert_*_type_range rules).
"""

from __future__ import annotations

import numpy as np

_RGB2YCBCR = np.array([[65.481, -37.797, 112.0],
                       [128.553, -74.203, -93.786],
                       [24.966, 112.0, -18.214]])
_OFFSET = np.array([16.0, 128.0, 128.0])


def _in01(img):
    img = img.astype(np.float64)
    if img.dtype != np.uint8 and img.max() <= 1.0 + 1e-6:
        return img, True
    return img / 255.0, False


def rgb2ycbcr(img, y_only: bool = False):
    img01, was01 = _in01(np.asarray(img))
    if y_only:
        out = img01 @ np.array([65.481, 128.553, 24.966]) + 16.0
    else:
        out = img01 @ _RGB2YCBCR + _OFFSET
    out = out / 255.0 if was01 else out
    return out.astype(np.float32)


def bgr2ycbcr(img, y_only: bool = False):
    return rgb2ycbcr(np.asarray(img)[..., ::-1], y_only)


def ycbcr2rgb(img):
    img01, was01 = _in01(np.asarray(img))
    img255 = img01 * 255.0
    inv = np.linalg.inv(_RGB2YCBCR) * 255.0
    out = (img255 - _OFFSET) @ inv
    out = out / 255.0 if was01 else out
    return out.astype(np.float32)


def ycbcr2bgr(img):
    return ycbcr2rgb(img)[..., ::-1]


def usm_sharp(img, weight: float = 0.5, radius: int = 50,
              threshold: int = 10):
    """Unsharp masking (`basicsr/utils/img_process_util.py:40-83`)."""
    import cv2

    if radius % 2 == 0:
        radius += 1
    blur = cv2.GaussianBlur(img, (radius, radius), 0)
    residual = img - blur
    mask = (np.abs(residual) * 255 > threshold).astype(np.float32)
    soft_mask = cv2.GaussianBlur(mask, (radius, radius), 0)
    sharp = np.clip(img + weight * residual, 0, 1)
    return soft_mask * sharp + (1 - soft_mask) * img
