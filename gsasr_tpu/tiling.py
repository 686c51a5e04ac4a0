"""Tiled large-image inference — TPU equivalent of
`/root/reference/utils/split_and_joint_image.py:98-232`.

Tiling math mirrors the reference exactly:
- LR is split into `split_size` tiles with `overlap_size` LR-pixel overlap,
  reflect-padded on the bottom/right to a whole tile count (:113-122);
- each tile is upscaled to ceil(split_size * scale) (:125);
- tiles are pasted at stride (split_sr - ceil(overlap * scale)) with a
  `crop_size`-pixel seam trim on non-leading edges; the fractional-scale
  path clamps trailing-tile writes to the canvas bounds, replicating the
  reference's branch structure (:168-225) including its
  last-column/row asymmetries;
- the caller crops the returned canvas to the target SR size
  (`inference_paper.py:135`).

TPU-first: all tiles share one static LR shape, so the whole tile set runs
as ONE batched encoder/decoder call and one batched render (the reference
loops tiles in Python, :127-151). Host-side pasting is numpy.
"""

from __future__ import annotations

import math
import jax
import jax.numpy as jnp
import numpy as np

from gsasr_tpu.model import _jitted_apply, _jitted_render


def split_and_joint_image(lq, scale_factor: float, split_size: int,
                          overlap_size: int, enc, dec, enc_params, dec_params,
                          *, crop_size: int = 2,
                          default_step_size: float = 1.2,
                          if_dmax: bool = True, dmax_mode: str = "fix",
                          dmax: float = 0.1, tile_batch: int = 8,
                          use_pallas: bool = True):
    """lq: (1, H, W, 3) jnp/np array in [0, 1]. Returns (1, H', W', 3) numpy
    canvas (caller crops to floor(scale * HW))."""
    lq = np.asarray(lq)
    _, h_lq, w_lq, _ = lq.shape
    assert 0 < overlap_size < split_size // 2, "overlap size is wrong"

    stride = split_size - overlap_size
    tiles_h = math.ceil((h_lq - overlap_size) / stride)
    tiles_w = math.ceil((w_lq - overlap_size) / stride)
    pad_h = tiles_h * stride + overlap_size - h_lq
    pad_w = tiles_w * stride + overlap_size - w_lq
    assert pad_h < h_lq and pad_w < w_lq, "decrease split_size"

    lq_pad = np.pad(lq, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)),
                    mode="reflect")

    # gather all tiles -> (T, split, split, 3)
    tiles = []
    for i in range(tiles_h):
        for j in range(tiles_w):
            y, x = i * stride, j * stride
            tiles.append(lq_pad[0, y:y + split_size, x:x + split_size])
    tiles = np.stack(tiles)

    split_sr = math.ceil(split_size * scale_factor)
    overlap_sr = math.ceil(overlap_size * scale_factor)
    stride_sr = split_sr - overlap_sr

    enc_fn = _jitted_apply(enc)
    dec_fn = _jitted_apply(dec)
    render = _jitted_render(float(scale_factor), dmax_mode, float(dmax),
                            use_pallas)

    outs = []
    t = tiles.shape[0]
    for start in range(0, t, tile_batch):
        chunk = tiles[start:start + tile_batch]
        n = chunk.shape[0]
        if n < tile_batch:  # pad batch to keep one compiled shape
            chunk = np.concatenate(
                [chunk, np.zeros((tile_batch - n,) + chunk.shape[1:],
                                 chunk.dtype)])
        feat = enc_fn(enc_params, jnp.asarray(chunk))
        gs = dec_fn(dec_params, feat,
                    jnp.full((tile_batch,), scale_factor, jnp.float32))
        sr = render(gs, (split_sr, split_sr))  # (B, 3, hs, ws)
        outs.append(np.asarray(sr.transpose(0, 2, 3, 1))[:n])
    sr_tiles = np.concatenate(outs)  # (T, split_sr, split_sr, 3)

    return paste_tiles(sr_tiles, tiles_h, tiles_w, stride_sr, split_sr,
                       crop_size, fractional=scale_factor
                       != int(scale_factor))


def paste_tiles(sr_tiles, tiles_h: int, tiles_w: int, stride_sr: int,
                split_sr: int, crop_size: int, *, fractional: bool):
    """Seam-trimmed tile pasting — the reference's canvas-assembly branch
    structure (`utils/split_and_joint_image.py:168-225`), separated for
    direct unit testing. sr_tiles: (tiles_h*tiles_w, split_sr, split_sr, C),
    row-major. Returns (1, canvas_h, canvas_w, C)."""
    canvas_h = (tiles_h - 1) * stride_sr + split_sr
    canvas_w = (tiles_w - 1) * stride_sr + split_sr
    canvas = np.zeros((1, canvas_h, canvas_w, sr_tiles.shape[-1]),
                      np.float32)
    idx = 0
    for i in range(tiles_h):
        for j in range(tiles_w):
            y, x = i * stride_sr, j * stride_sr
            tile = sr_tiles[idx]
            cy = 0 if i == 0 else crop_size
            cx = 0 if j == 0 else crop_size
            y0, x0 = y + cy, x + cx
            y1, x1 = y + split_sr, x + split_sr
            if fractional:
                # trailing tiles clamp to canvas bounds (reference
                # :178-204); interior writes are unchanged.
                last_i = i == tiles_h - 1
                last_j = j == tiles_w - 1
                if last_j and i != 0 and not last_i:
                    # reference quirk (:196-198): last-column interior rows
                    # write without the vertical seam trim.
                    y0, cy = y, 0
                y1 = min(y1, canvas_h)
                x1 = min(x1, canvas_w)
            canvas[0, y0:y1, x0:x1] = tile[cy:cy + (y1 - y0),
                                           cx:cx + (x1 - x0)]
            idx += 1
    return canvas
