"""Optical-flow file IO (.flo + quantized jpeg pair).

Equivalent of the reference `basicsr/utils/flow_util.py:7-170` (itself from
mmcv): `flowread`/`flowwrite` for the Middlebury .flo format ('PIEH' header)
and `quantize_flow`/`dequantize_flow` for lossy uint8 storage. Pure
numpy/cv2 host-side IO — no device compute involved.
"""

from __future__ import annotations

import os

import numpy as np


def quantize(arr, min_val, max_val, levels, dtype=np.int64):
    """Clip to [min_val, max_val] and map to integer levels [0, levels-1]
    (`flow_util.py:126-147`)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be < max_val ({max_val})")
    arr = np.clip(arr, min_val, max_val) - min_val
    return np.minimum(
        np.floor(levels * arr / (max_val - min_val)).astype(dtype),
        levels - 1)


def dequantize(arr, min_val, max_val, levels, dtype=np.float64):
    """Map integer levels back to bin centers (`flow_util.py:150-168`)."""
    if not (isinstance(levels, int) and levels > 1):
        raise ValueError(f"levels must be a positive integer, got {levels}")
    if min_val >= max_val:
        raise ValueError(f"min_val ({min_val}) must be < max_val ({max_val})")
    return (arr + 0.5).astype(dtype) * (max_val - min_val) / levels + min_val


def quantize_flow(flow, max_val=0.02, norm=True):
    """(h, w, 2) flow -> (dx_u8, dy_u8); 255 levels so 0 survives the
    round-trip (`flow_util.py:76-99`)."""
    h, w, _ = flow.shape
    dx, dy = flow[..., 0], flow[..., 1]
    if norm:
        dx = dx / w
        dy = dy / h
    return tuple(quantize(d, -max_val, max_val, 255, np.uint8)
                 for d in (dx, dy))


def dequantize_flow(dx, dy, max_val=0.02, denorm=True):
    """Inverse of quantize_flow (`flow_util.py:102-123`)."""
    assert dx.shape == dy.shape
    assert dx.ndim == 2 or (dx.ndim == 3 and dx.shape[-1] == 1)
    dx, dy = (dequantize(d, -max_val, max_val, 255) for d in (dx, dy))
    if denorm:
        dx = dx * dx.shape[1]
        dy = dy * dy.shape[0]
    return np.dstack((dx, dy))


def flowread(flow_path, quantize_pair=False, concat_axis=0, *args, **kwargs):
    """Read a .flo file, or a quantized dx/dy image pair
    (`flow_util.py:7-43`)."""
    if quantize_pair:
        import cv2
        assert concat_axis in (0, 1)
        cat_flow = cv2.imread(str(flow_path), cv2.IMREAD_UNCHANGED)
        if cat_flow.ndim != 2:
            raise IOError(f"{flow_path} is not a valid quantized flow file "
                          f"(ndim {cat_flow.ndim})")
        assert cat_flow.shape[concat_axis] % 2 == 0
        dx, dy = np.split(cat_flow, 2, axis=concat_axis)
        return dequantize_flow(dx, dy, *args, **kwargs).astype(np.float32)
    with open(flow_path, "rb") as f:
        header = f.read(4).decode("utf-8", errors="replace")
        if header != "PIEH":
            raise IOError(f"Invalid flow file: {flow_path} (no PIEH header)")
        w = int(np.fromfile(f, np.int32, 1).squeeze())
        h = int(np.fromfile(f, np.int32, 1).squeeze())
        flow = np.fromfile(f, np.float32, w * h * 2).reshape((h, w, 2))
    return flow.astype(np.float32)


def flowwrite(flow, filename, quantize_pair=False, concat_axis=0,
              *args, **kwargs):
    """Write flow as .flo, or quantized to a single concatenated uint8
    image (`flow_util.py:45-73`)."""
    if not quantize_pair:
        with open(filename, "wb") as f:
            f.write(b"PIEH")
            np.array([flow.shape[1], flow.shape[0]], dtype=np.int32).tofile(f)
            flow.astype(np.float32).tofile(f)
            f.flush()
        return
    import cv2
    assert concat_axis in (0, 1)
    dx, dy = quantize_flow(flow, *args, **kwargs)
    dxdy = np.concatenate((dx, dy), axis=concat_axis)
    parent = os.path.dirname(filename)
    if parent:
        os.makedirs(parent, exist_ok=True)
    cv2.imwrite(str(filename), dxdy)
