"""TPU-native 2D Gaussian splatting rasterizer (Pallas kernels + custom VJP).

Replaces the reference CUDA extensions (`/root/reference/utils/gs_cuda/gs.cu`,
`/root/reference/utils/gs_cuda_dmax/gs.cu`) with a tile-based TPU design.

Core design (pixel-unit formulation)
------------------------------------
The CUDA kernel works in normalized [-1, 1] coordinates with a global `dmax`
box cull. The Gaussian kernel value is invariant under a common rescaling of
distances and sigmas, so we instead rasterize in **pixel units** with
**per-Gaussian absolute cull boxes** [xlo, xhi] x [ylo, yhi]:

- one compilation serves *any* effective output size: arbitrary-scale SR
  renders (h_eff, w_eff) as traced values folded into the per-Gaussian
  parameters on the host, with a fixed canvas;
- a batch renders as vertically stacked slots on one canvas, each Gaussian's
  cull box clamped to its sample's row range (no cross-sample bleed);
- the box cull is strictly more expressive than CUDA's global dmax
  (gs.cu:41-50) — the normalized-unit wrapper `gs_render` reproduces the
  reference semantics exactly by setting box = center +- dmax.

Kernel structure
----------------
- Grid (tiles x chunks) forward, (chunks x tiles) backward; each pass
  accumulates into a VMEM-resident output block => *deterministic* summation
  (the reference forward uses `atomicAdd`, gs.cu:58-60, and is not).
- Per (tile, chunk): build the (chunk, pixels) weight matrix on the VPU
  (exp of the quadratic form, gs.cu:52-56), contract with colors on the MXU.
- Whole (tile, chunk) pairs are skipped when the chunk's bounding box (the
  union of its Gaussians' cull boxes) misses the tile; with spatially sorted
  Gaussians the chunk boxes are tight, matching the CUDA dmax scan's
  asymptotics without atomics or variable-length lists.
- Backward implements the analytic gradients of gs.cu:139-159, accumulating
  per-Gaussian grads in chunk-owned VMEM blocks (race-free by construction).

Geometry packing: (S, 16) float32 rows
  [sigma_x, sigma_y, rho, cx, cy, xlo, xhi, ylo, yhi, 0...0]
where sigma/center/bounds are all in pixels of the target canvas, and
sigma_x pairs with the x (width) axis.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# geometry column indices
G_SX, G_SY, G_RHO, G_CX, G_CY, G_XLO, G_XHI, G_YLO, G_YHI = range(9)
GEOM_COLS = 16
# Far-away sentinel for padded Gaussians (cull box is empty).
_PAD = 1e9

# Default tile/chunk geometry: TH*TW pixels per tile, GC Gaussians per chunk.
# Grid overhead scales as (HW/(TH*TW)) * (S/GC); the fwd optimum maximizes
# GC * TH * TW against the ~16MB VMEM budget (measured sweep: th=32/gc=1024
# is ~1.6x faster than th=16/gc=256 at 720^2/518k Gaussians). The backward
# holds ~8 (gc, th*tw) temporaries so it uses a smaller chunk.
_DEF_TH = 32
_DEF_TW = 128
_DEF_GC = 1024
# backward holds ~8 (th_bwd*tw, gc_bwd) f32 temporaries; gc_bwd is the lane
# dim in the transposed layout so it must be a multiple of 128.
_DEF_TH_BWD = 8
_DEF_GC_BWD = 512
# Exact-list forward tile height: short (8, 128) tiles so a small Gaussian
# is evaluated against ~1k pixels instead of 4k; see _raster_fwd_call_exact.
_DEF_TH_BIN = 8


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _load_rows(geom_ref):
    """Geometry rows as (1, gc) vectors (transposed (16, gc) block)."""
    sx = geom_ref[G_SX:G_SX + 1, :]
    sy = geom_ref[G_SY:G_SY + 1, :]
    rho = geom_ref[G_RHO:G_RHO + 1, :]
    cx = geom_ref[G_CX:G_CX + 1, :]
    cy = geom_ref[G_CY:G_CY + 1, :]
    xlo = geom_ref[G_XLO:G_XLO + 1, :]
    xhi = geom_ref[G_XHI:G_XHI + 1, :]
    ylo = geom_ref[G_YLO:G_YLO + 1, :]
    yhi = geom_ref[G_YHI:G_YHI + 1, :]
    return sx, sy, rho, cx, cy, xlo, xhi, ylo, yhi


def _pixel_xy(tile_i, tile_j, th, tw):
    """Absolute pixel coordinates of the tile's pixels, flat (th*tw, 1)."""
    p = th * tw
    pidx = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)
    prow = pidx // tw
    pcol = pidx - prow * tw
    ypix = (tile_i * th + prow).astype(jnp.float32)
    xpix = (tile_j * tw + pcol).astype(jnp.float32)
    return xpix, ypix


def _overlap(bbox_ref, k, tile_i, tile_j, th, tw):
    x0 = (tile_j * tw).astype(jnp.float32)
    x1 = x0 + (tw - 1)
    y0 = (tile_i * th).astype(jnp.float32)
    y1 = y0 + (th - 1)
    return (
        (bbox_ref[0, k] <= x1)
        & (bbox_ref[1, k] >= x0)
        & (bbox_ref[2, k] <= y1)
        & (bbox_ref[3, k] >= y0)
    )


def _fwd_kernel(bbox_ref, geom_ref, col_ref, out_ref, *, th, tw, n_tw, nc):
    t = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    tile_i = t // n_tw
    tile_j = t - tile_i * n_tw

    @pl.when(_overlap(bbox_ref, k, tile_i, tile_j, th, tw))
    def _():
        xpix, ypix = _pixel_xy(tile_i, tile_j, th, tw)
        sx, sy, rho, cx, cy, xlo, xhi, ylo, yhi = _load_rows(geom_ref)

        dx = xpix - cx  # (p, gc)
        dy = ypix - cy

        inv_sx = 1.0 / sx
        inv_sy = 1.0 / sy
        w2 = inv_sx * inv_sx
        w3 = inv_sx * inv_sy
        w4 = inv_sy * inv_sy
        w1 = -0.5 / (1.0 - rho * rho)

        quad = w2 * (dx * dx) - (2.0 * rho * w3) * (dx * dy) + w4 * (dy * dy)
        v = jnp.exp(w1 * quad)
        mask = (xpix >= xlo) & (xpix <= xhi) & (ypix >= ylo) & (ypix <= yhi)
        v = jnp.where(mask, v, 0.0)

        # (p, gc) x (nc, gc) -> (p, nc) on the MXU.
        contrib = jax.lax.dot_general(
            v, col_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, :] += contrib


def _bwd_body(geom_ref, col_ref, gt, tile_i, tile_j, th, tw, dgeom_ref,
              dcol_ref):
    """Shared analytic-gradient body (gs.cu:139-159) for one (chunk, tile).

    The per-pixel factors of each gradient are moments of a_tilde = gw * v
    against {dx, dy, dx^2, dy^2, dx*dy}; the per-Gaussian coefficients
    (w1..w4, rho, inv_sigma) are applied AFTER the pixel reduction on (1, gc)
    rows — ~2x fewer VPU ops on the (p, gc) blocks than evaluating each
    gradient's integrand separately.
    """
    xpix, ypix = _pixel_xy(tile_i, tile_j, th, tw)
    sx, sy, rho, cx, cy, xlo, xhi, ylo, yhi = _load_rows(geom_ref)

    dx = xpix - cx  # (p, gc)
    dy = ypix - cy

    inv_sx = 1.0 / sx
    inv_sy = 1.0 / sy
    w2 = inv_sx * inv_sx
    w3 = inv_sx * inv_sy
    w4 = inv_sy * inv_sy
    w1 = -0.5 / (1.0 - rho * rho)

    dx2 = dx * dx
    dy2 = dy * dy
    dxdy = dx * dy
    quad = w2 * dx2 - (2.0 * rho * w3) * dxdy + w4 * dy2
    v = jnp.exp(w1 * quad)
    mask = (xpix >= xlo) & (xpix <= xhi) & (ypix >= ylo) & (ypix <= yhi)
    v = jnp.where(mask, v, 0.0)

    # grad colors: sum_p g * v -> (nc, gc), MXU.
    dcol_ref[...] += jax.lax.dot_general(
        gt, v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    # gw[p, g] = sum_c g[c, p] * colors[c, g]
    gw = jax.lax.dot_general(
        gt, col_ref[...],
        dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    at = gw * v  # (p, gc); the 2*w1 factor is applied post-reduction

    def mom(m):
        return jnp.sum(at * m, axis=0, keepdims=True)  # (1, gc)

    s_x, s_y = mom(dx), mom(dy)
    s_xx, s_yy, s_xy = mom(dx2), mom(dy2), mom(dxdy)

    c1 = 2.0 * w1
    rw3 = rho * w3
    d_cx = c1 * (rw3 * s_y - w2 * s_x)
    d_cy = c1 * (rw3 * s_x - w4 * s_y)
    d_sx = c1 * inv_sx * (rw3 * s_xy - w2 * s_xx)
    d_sy = c1 * inv_sy * (rw3 * s_xy - w4 * s_yy)
    s_q = w2 * s_xx - 2.0 * rw3 * s_xy + w4 * s_yy
    d_rho = -c1 * (2.0 * w1 * rho * s_q + w3 * s_xy)

    zeros = jnp.zeros((GEOM_COLS - 5, d_sx.shape[1]), jnp.float32)
    upd = jnp.concatenate([d_sx, d_sy, d_rho, d_cx, d_cy, zeros], axis=0)
    dgeom_ref[...] += upd


def _bwd_kernel(bbox_ref, geom_ref, col_ref, g_ref, dgeom_ref, dcol_ref, *,
                th, tw, n_tw, nc):
    k = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        dgeom_ref[...] = jnp.zeros_like(dgeom_ref)
        dcol_ref[...] = jnp.zeros_like(dcol_ref)

    tile_i = t // n_tw
    tile_j = t - tile_i * n_tw

    @pl.when(_overlap(bbox_ref, k, tile_i, tile_j, th, tw))
    def _():
        # (nc, p) gradient tile: nc along sublanes so the per-step DMA is
        # O(p) bytes (a (p, nc) block lane-pads nc -> 128 and costs ~1MB
        # per grid step).
        _bwd_body(geom_ref, col_ref, g_ref[0, :, :], tile_i, tile_j, th, tw,
                  dgeom_ref, dcol_ref)


def _fwd_kernel_windowed(ranges_ref, bbox_ref, geom_ref, col_ref, out_ref,
                         *, th, tw, n_tw, nc, kc):
    """Forward over a per-tile chunk window: grid (nt, W); the k-th step of
    tile t processes chunk `ranges[0, t] + k`, masked beyond `ranges[1, t]`.
    `ranges` is a scalar-prefetch arg so block index_maps can use it."""
    t = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    tile_i = t // n_tw
    tile_j = t - tile_i * n_tw
    chunk = jnp.minimum(ranges_ref[0, t] + k, kc - 1)
    valid = k < ranges_ref[1, t]

    @pl.when(valid & _overlap(bbox_ref, chunk, tile_i, tile_j, th, tw))
    def _():
        xpix, ypix = _pixel_xy(tile_i, tile_j, th, tw)
        sx, sy, rho, cx, cy, xlo, xhi, ylo, yhi = _load_rows(geom_ref)

        dx = xpix - cx
        dy = ypix - cy
        inv_sx = 1.0 / sx
        inv_sy = 1.0 / sy
        w2 = inv_sx * inv_sx
        w3 = inv_sx * inv_sy
        w4 = inv_sy * inv_sy
        w1 = -0.5 / (1.0 - rho * rho)
        quad = w2 * (dx * dx) - (2.0 * rho * w3) * (dx * dy) + w4 * (dy * dy)
        v = jnp.exp(w1 * quad)
        mask = (xpix >= xlo) & (xpix <= xhi) & (ypix >= ylo) & (ypix <= yhi)
        v = jnp.where(mask, v, 0.0)
        contrib = jax.lax.dot_general(
            v, col_ref[...],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, :] += contrib


def _bwd_tile(rect_ref, k, j, n_tw, nt):
    """Tile id of the j-th step of chunk k's rectangle walk.

    rect rows: [row0, col0, ncols, count]; step j maps to
    (row0 + j // ncols, col0 + j % ncols), clamped into the grid."""
    cw = jnp.maximum(rect_ref[2, k], 1)
    r = j // cw
    c = j - r * cw
    t = (rect_ref[0, k] + r) * n_tw + rect_ref[1, k] + c
    return jnp.clip(t, 0, nt - 1)


def _bwd_kernel_windowed(rect_ref, bbox_ref, geom_ref, col_ref, g_ref,
                         dgeom_ref, dcol_ref, *, th, tw, n_tw, nt, nc):
    """Backward over per-chunk tile rectangles (scalar prefetch): the j-th
    step of chunk k visits the j-th tile of the chunk's bbox-overlap
    rectangle, masked past its true tile count. Analytic gradient body is
    identical to `_bwd_kernel`; the bbox test stays to null rectangle tiles
    the chunk union-box doesn't actually reach."""
    k = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        dgeom_ref[...] = jnp.zeros_like(dgeom_ref)
        dcol_ref[...] = jnp.zeros_like(dcol_ref)

    t = _bwd_tile(rect_ref, k, j, n_tw, nt)
    tile_i = t // n_tw
    tile_j = t - tile_i * n_tw

    @pl.when((j < rect_ref[3, k])
             & _overlap(bbox_ref, k, tile_i, tile_j, th, tw))
    def _():
        _bwd_body(geom_ref, col_ref, g_ref[0, :, :], tile_i, tile_j, th, tw,
                  dgeom_ref, dcol_ref)


def _fwd_kernel_list(tab_ref, geom_ref, col_ref, out_ref, *, th, tw, n_tw,
                     nc):
    """Forward over per-tile Gaussian-chunk lists: grid step k processes
    one chunk; tab row 0 is packed `tile*4 + (flag+1)` with flag
    1 = first chunk of its tile (zero the block then walk), 0 =
    continuation, 2 = zero-only (empty tile), -1 = unused trailing
    capacity (skip). Serves both the exact-list path (gathered list
    array, consecutive chunk blocks) and the engaged-chunk-list path
    (tab row 1 holds the source chunk id the block index maps follow).
    There is no chunk bbox test; any stray/pad Gaussian is nulled by the
    per-pixel cull-box mask.

    The output tile is (1, nc, p) — colors along sublanes — because this
    kernel's out block index changes with the 1D grid step, so Mosaic
    flushes/refetches across tile boundaries; a (1, p, nc) layout would
    lane-pad nc -> 128 and move ~1 MB per boundary."""
    k = pl.program_id(0)
    code = tab_ref[0, k]
    t = code // 4
    flag = code - 4 * t - 1

    @pl.when((flag == 1) | (flag == 2))
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when((flag == 0) | (flag == 1))
    def _():
        tile_i = t // n_tw
        tile_j = t - tile_i * n_tw
        xpix, ypix = _pixel_xy(tile_i, tile_j, th, tw)
        sx, sy, rho, cx, cy, xlo, xhi, ylo, yhi = _load_rows(geom_ref)

        dx = xpix - cx
        dy = ypix - cy
        inv_sx = 1.0 / sx
        inv_sy = 1.0 / sy
        w2 = inv_sx * inv_sx
        w3 = inv_sx * inv_sy
        w4 = inv_sy * inv_sy
        w1 = -0.5 / (1.0 - rho * rho)
        quad = w2 * (dx * dx) - (2.0 * rho * w3) * (dx * dy) + w4 * (dy * dy)
        v = jnp.exp(w1 * quad)
        mask = (xpix >= xlo) & (xpix <= xhi) & (ypix >= ylo) & (ypix <= yhi)
        v = jnp.where(mask, v, 0.0)
        # (nc, gc) x (p, gc) -> (nc, p) on the MXU.
        contrib = jax.lax.dot_general(
            col_ref[...], v,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out_ref[0, :, :] += contrib


# ---------------------------------------------------------------------------
# Pallas call wrappers
# ---------------------------------------------------------------------------


def _chunk_bboxes(geom_t, gc):
    """Per-chunk cull-box unions, laid out (4, kc): [xlo, xhi, ylo, yhi].

    (4, kc) keeps the SMEM buffer's lane padding O(kc) bytes — a (kc, 4)
    layout pads the 4-lane axis to 128 and overflows SMEM for large kc.
    Culling hint only: no gradient.
    """
    g = jax.lax.stop_gradient(geom_t)
    xlo = g[G_XLO].reshape(-1, gc)
    xhi = g[G_XHI].reshape(-1, gc)
    ylo = g[G_YLO].reshape(-1, gc)
    yhi = g[G_YHI].reshape(-1, gc)
    return jnp.stack(
        [xlo.min(axis=1), xhi.max(axis=1), ylo.min(axis=1), yhi.max(axis=1)],
        axis=0)


def _tile_chunk_ranges(bbox, h, th, n_th, n_tw, window):
    """Per-tile [start, count] over chunks whose y-interval can overlap the
    tile's rows. A correct superset for any chunk order (the kernel still
    bbox-tests each chunk); `count` is clamped to `window` only AFTER the
    overflow check in the caller."""
    kc = bbox.shape[1]
    tile_ids = jnp.arange(n_th)
    y0 = (tile_ids * th).astype(jnp.float32)
    y1 = y0 + (th - 1)
    # overlap_y[k, ti] for row-tiles; all tiles in a row share the range
    ylo = bbox[2][:, None]
    yhi = bbox[3][:, None]
    ov = (ylo <= y1[None, :]) & (yhi >= y0[None, :])  # (kc, n_th)
    first = jnp.argmax(ov, axis=0)
    last = kc - 1 - jnp.argmax(ov[::-1], axis=0)
    any_ov = jnp.any(ov, axis=0)
    start = jnp.where(any_ov, first, 0).astype(jnp.int32)
    cnt = jnp.where(any_ov, last - first + 1, 0).astype(jnp.int32)
    # broadcast per row-tile to all tiles in the row: (nt,)
    start = jnp.repeat(start, n_tw)
    cnt = jnp.repeat(cnt, n_tw)
    return start, cnt


@functools.partial(
    jax.jit, static_argnames=("h", "w", "th", "tw", "gc", "window"))
def _raster_fwd_call_windowed(geom_t, col_t, *, h, w, th, tw, gc, window):
    """Forward with per-tile chunk windows (scalar prefetch). Falls back to
    the dense grid when any tile's candidate range exceeds `window`."""
    sp = geom_t.shape[1]
    nc = col_t.shape[0]
    kc = sp // gc
    n_th = _cdiv(h, th)
    n_tw = _cdiv(w, tw)
    nt = n_th * n_tw
    p = th * tw

    bbox = _chunk_bboxes(geom_t, gc)
    start, cnt = _tile_chunk_ranges(bbox, h, th, n_th, n_tw, window)
    overflow = jnp.any(cnt > window)
    ranges = jnp.stack([start, jnp.minimum(cnt, window)], axis=0)

    kernel = functools.partial(_fwd_kernel_windowed, th=th, tw=tw,
                               n_tw=n_tw, nc=nc, kc=kc)

    def windowed(args):
        geom_t, col_t, bbox, ranges = args
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, window),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # bbox (4, kc)
                pl.BlockSpec(
                    (GEOM_COLS, gc),
                    lambda t, k, ranges_ref: (
                        0, jnp.minimum(ranges_ref[0, t] + k, kc - 1))),
                pl.BlockSpec(
                    (nc, gc),
                    lambda t, k, ranges_ref: (
                        0, jnp.minimum(ranges_ref[0, t] + k, kc - 1))),
            ],
            out_specs=pl.BlockSpec((1, p, nc), lambda t, k, ranges_ref:
                                   (t, 0, 0)),
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, p, nc), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=_interpret(),
        )(ranges, bbox, geom_t, col_t)

    def dense(args):
        geom_t, col_t, _, _ = args
        return _raster_fwd_tiles(geom_t, col_t, h=h, w=w, th=th, tw=tw,
                                 gc=gc)

    out = jax.lax.cond(overflow, dense, windowed,
                       (geom_t, col_t, bbox, ranges))
    img = out.reshape(n_th, n_tw, th, tw, nc)
    img = img.transpose(0, 2, 1, 3, 4).reshape(n_th * th, n_tw * tw, nc)
    return img[:h, :w]


@functools.partial(
    jax.jit, static_argnames=("h", "w", "th", "tw", "gc", "cap_chunks"))
def _raster_fwd_call_chunklist(geom_t, col_t, *, h, w, th, tw, gc,
                               cap_chunks):
    """Engaged-chunk-list forward: a 1D grid over exactly the (tile, chunk)
    pairs whose chunk bbox overlaps the tile — the windowed path's engaged
    set without its skipped grid steps (the per-tile window is a
    contiguous chunk RANGE, so at trained box statistics ~3/4 of its steps
    fail the bbox test yet still pay the grid-step cost; r5 walk-volume
    analysis, scripts/analyze_walk_volume.py). Walk order per tile is
    ascending chunk id — identical to the windowed path's accumulation
    order, so outputs are bitwise equal.

    The list build is a (nt, kc) overlap matrix + cumsum + one small
    scatter (~1e5 elements at production shapes — host-measured orders of
    magnitude below the 518k-element argsort/gather builds that sank the
    r4 exact path). Falls back to the windowed path when the engaged
    count exceeds `cap_chunks` (e.g. init-saturated boxes, where every
    chunk engages everywhere and a list buys nothing).

    TPU counterpart of the CUDA per-Gaussian dmax scan
    (`/root/reference/utils/gs_cuda_dmax/gs.cu:38-62`): same engaged-work
    asymptotics, deterministic accumulation, no atomics."""
    sp = geom_t.shape[1]
    nc = col_t.shape[0]
    kc = sp // gc
    n_th = _cdiv(h, th)
    n_tw = _cdiv(w, tw)
    nt = n_th * n_tw
    p = th * tw

    bbox = _chunk_bboxes(geom_t, gc)
    x0 = (jnp.arange(n_tw, dtype=jnp.float32) * tw)
    y0 = (jnp.arange(n_th, dtype=jnp.float32) * th)
    ov_y = (bbox[2][None, :] <= y0[:, None] + (th - 1)) & \
        (bbox[3][None, :] >= y0[:, None])                    # (n_th, kc)
    ov_x = (bbox[0][None, :] <= x0[:, None] + (tw - 1)) & \
        (bbox[1][None, :] >= x0[:, None])                    # (n_tw, kc)
    ov = (ov_y[:, None, :] & ov_x[None, :, :]).reshape(nt, kc)

    cnt = jnp.sum(ov, axis=1, dtype=jnp.int32)               # (nt,)
    cnt1 = jnp.maximum(cnt, 1)  # empty tiles still need a zero-only slot
    base = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                            jnp.cumsum(cnt1)[:-1].astype(jnp.int32)])
    total = base[-1] + cnt1[-1]
    ok = total <= cap_chunks

    rank = jnp.cumsum(ov, axis=1, dtype=jnp.int32) - ov      # exclusive
    dest = jnp.where(ov, base[:, None] + rank, cap_chunks)
    tiles = jnp.arange(nt, dtype=jnp.int32)
    code_val = tiles[:, None] * 4 + jnp.where(rank == 0, 2, 1)
    chunk_ids = jnp.broadcast_to(jnp.arange(kc, dtype=jnp.int32)[None, :],
                                 (nt, kc))
    codes = jnp.full((cap_chunks,), (nt - 1) * 4, jnp.int32)  # flag -1
    codes = codes.at[dest.reshape(-1)].set(code_val.reshape(-1),
                                           mode="drop")
    srcs = jnp.full((cap_chunks,), kc - 1, jnp.int32)
    srcs = srcs.at[dest.reshape(-1)].set(chunk_ids.reshape(-1), mode="drop")
    # zero-only slots for empty tiles (flag 2)
    empty_dest = jnp.where(cnt == 0, base, cap_chunks)
    codes = codes.at[empty_dest].set(tiles * 4 + 3, mode="drop")
    tab = jnp.stack([codes, srcs], axis=0)

    def chunklist(args):
        geom_t, col_t, tab = args
        kernel = functools.partial(_fwd_kernel_list, th=th, tw=tw,
                                   n_tw=n_tw, nc=nc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(cap_chunks,),
            in_specs=[
                pl.BlockSpec((GEOM_COLS, gc),
                             lambda k, tab_ref: (0, tab_ref[1, k])),
                pl.BlockSpec((nc, gc), lambda k, tab_ref: (0, tab_ref[1, k])),
            ],
            out_specs=pl.BlockSpec(
                (1, nc, p), lambda k, tab_ref: (tab_ref[0, k] // 4, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, nc, p), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interpret(),
        )(tab, geom_t, col_t)
        img = out.reshape(n_th, n_tw, nc, th, tw)
        img = img.transpose(0, 3, 1, 4, 2).reshape(n_th * th, n_tw * tw, nc)
        return img[:h, :w]

    def fallback(args):
        geom_t, col_t, _ = args
        if kc >= 16:
            win = int(min(kc, max(64, -(-kc // 4))))
            return _raster_fwd_call_windowed(geom_t, col_t, h=h, w=w, th=th,
                                             tw=tw, gc=gc, window=win)
        return _raster_fwd_call(geom_t, col_t, h=h, w=w, th=th, tw=tw, gc=gc)

    return jax.lax.cond(ok, chunklist, fallback, (geom_t, col_t, tab))


# Chunk size of the exact-list forward: per-tile segments are padded to
# multiples of _DEF_GC_LIST and the packed chunk->tile table rides scalar
# prefetch (one int32 per chunk, so SMEM stays ~cap/gc * 4 bytes).
_DEF_GC_LIST = 256


def _corner_tiles(g, *, h, w, th, tw):
    """Clipped corner tile coordinates and tile extents of each cull box.

    Returns (fy0, fx0, nrows, ncols, vis); invisible boxes are forced to
    corner (n_th, 0) — one row past the canvas — so they sort after every
    visible Gaussian under the y-major corner key `fy0 * n_tw + fx0`."""
    n_th = _cdiv(h, th)
    xlo, xhi, ylo, yhi = g[G_XLO], g[G_XHI], g[G_YLO], g[G_YHI]
    vis = ((xhi >= 0) & (xlo <= w - 1) & (yhi >= 0) & (ylo <= h - 1)
           & (xhi >= xlo) & (yhi >= ylo))
    fx0 = (jnp.clip(xlo, 0, w - 1) // tw).astype(jnp.int32)
    fx1 = (jnp.clip(xhi, 0, w - 1) // tw).astype(jnp.int32)
    fy0 = (jnp.clip(ylo, 0, h - 1) // th).astype(jnp.int32)
    fy1 = (jnp.clip(yhi, 0, h - 1) // th).astype(jnp.int32)
    nrows = jnp.where(vis, fy1 - fy0 + 1, 0).astype(jnp.int32)
    ncols = jnp.where(vis, fx1 - fx0 + 1, 0).astype(jnp.int32)
    fy0 = jnp.where(vis, fy0, n_th)
    fx0 = jnp.where(vis, fx0, 0)
    return fy0, fx0, nrows, ncols, vis


def _exact_tables(geom_t, *, h, w, th, tw, gc, mr, mc, cap):
    """Per-tile EXACT Gaussian lists without a global membership sort.

    For Gaussians sorted by the y-major corner key, the memberships at a
    fixed tile offset q = (r, c) — Gaussian i covering tile
    (fy0_i + r, fx0_i + c) — are themselves nondecreasing in tile id, so
    each membership's destination slot is computed analytically:

        dest(i, q) = seg_start[t]*gc + offset_q[t] + rank_q(i)

    with per-(q, tile) counts from `searchsorted` on the sorted per-q keys
    and run-local ranks from prefix sums (a 541-entry delta scatter + one
    cumsum per table — no sort of the ~spans*S expanded array). A final
    flat scatter writes the source indices into their slots. NOTE: hard-
    synced measurements put these XLA primitives ~100x off HBM speed on
    the current chip (see gs_render_px), which is why the exact path is
    opt-in.

    This is the TPU replacement for the CUDA per-Gaussian atomic scan
    (`/root/reference/utils/gs_cuda_dmax/gs.cu:38-62`): identical
    asymptotics (each Gaussian touches only its own footprint) but
    gather-based and deterministic.

    Returns (list_idx (cap,) int32 indices into the sorted array — sp
    denotes the pad slot, tab (1, cap//gc) int32 packed `tile*4+(flag+1)`
    with flag 1 = first chunk of its tile, 0 = continuation, -1 = unused
    trailing capacity, ok bool). ok is False when a box spans more than
    (mr, mc) tiles or the chunk-padded total exceeds cap; every tile owns
    >= 1 chunk so empty tiles still get their output block zeroed.
    """
    g = jax.lax.stop_gradient(geom_t)
    sp = g.shape[1]
    n_th, n_tw = _cdiv(h, th), _cdiv(w, tw)
    nt = n_th * n_tw
    nchunks = cap // gc
    q_n = mr * mc
    fy0, fx0, nrows, ncols, vis = _corner_tiles(g, h=h, w=w, th=th, tw=tw)
    ok_span = jnp.all(nrows <= mr) & jnp.all(ncols <= mc)

    # (Q, sp) membership lattice; each key row is nondecreasing: the input
    # is (fy0, fx0)-lexicographic and adding a constant (r, c) offset with
    # the column clamped to the row end preserves y-major order.
    rr = jnp.repeat(jnp.arange(mr, dtype=jnp.int32), mc)[:, None]
    cc = jnp.tile(jnp.arange(mc, dtype=jnp.int32), mr)[:, None]
    key = (fy0[None, :] + rr) * n_tw + jnp.minimum(fx0[None, :] + cc,
                                                   n_tw - 1)
    valid = vis[None, :] & (rr < nrows[None, :]) & (cc < ncols[None, :])

    cvx = jnp.concatenate(  # (Q, sp+1) exclusive valid-count prefix
        [jnp.zeros((q_n, 1), jnp.int32),
         jnp.cumsum(valid.astype(jnp.int32), axis=1)], axis=1)
    t_edges = jnp.arange(nt + 1, dtype=jnp.int32)
    pos = jax.vmap(
        lambda k: jnp.searchsorted(k, t_edges, method="scan_unrolled"))(
            key).astype(jnp.int32)                 # (Q, nt+1) run starts
    cv_at = jnp.take_along_axis(cvx, pos, axis=1)  # valid count at starts
    vcnt = cv_at[:, 1:] - cv_at[:, :-1]            # (Q, nt) per-tile counts

    counts = vcnt.sum(axis=0)                      # (nt,)
    seg_chunks = jnp.maximum(-(-counts // gc), 1)
    seg_start_c = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32),
         jnp.cumsum(seg_chunks)]).astype(jnp.int32)  # (nt+1,) chunk starts
    used_chunks = seg_start_c[nt]
    ok = ok_span & (used_chunks <= nchunks)

    # element offset of sequence q inside tile t's segment
    off_q = jnp.concatenate(
        [jnp.zeros((1, nt), jnp.int32),
         jnp.cumsum(vcnt, axis=0)[:-1]], axis=0)
    base = seg_start_c[:-1][None, :] * gc + off_q  # (Q, nt)

    def pcw(table):
        """Piecewise-constant expansion table[q, key_q(i)] -> (Q, sp):
        delta scatter at the run-start positions, then a prefix sum."""
        prev = jnp.concatenate(
            [jnp.zeros((q_n, 1), table.dtype), table[:, :-1]], axis=1)
        qi = jnp.broadcast_to(
            jnp.arange(q_n, dtype=jnp.int32)[:, None], (q_n, nt))
        arr = jnp.zeros((q_n, sp + 1), jnp.int32)
        arr = arr.at[qi, pos[:, :-1]].add(table - prev, mode="drop")
        return jnp.cumsum(arr, axis=1)[:, :sp]

    rank = cvx[:, :sp] - pcw(cv_at[:, :-1])        # index within (q, tile)
    dest = jnp.where(valid, pcw(base) + rank, cap)

    src = jnp.broadcast_to(jnp.arange(sp, dtype=jnp.int32)[None, :],
                           dest.shape)
    list_idx = jnp.full((cap,), sp, jnp.int32)
    list_idx = list_idx.at[dest.reshape(-1)].set(src.reshape(-1),
                                                mode="drop")

    ck = jnp.arange(nchunks, dtype=jnp.int32)
    tile_of = jnp.clip(
        jnp.searchsorted(seg_start_c, ck, side="right").astype(jnp.int32) - 1,
        0, nt - 1)
    is_start = jnp.zeros((nchunks + 1,), jnp.bool_).at[
        seg_start_c[:-1]].set(True, mode="drop")[:nchunks]
    unused = ck >= used_chunks
    flag = jnp.where(unused, -1, jnp.where(is_start, 1, 0))
    tile_of = jnp.where(unused, nt - 1, tile_of)
    tab = ((tile_of * 4 + (flag + 1)).astype(jnp.int32)[None, :])
    return list_idx, tab, ok


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "th", "tw", "gc", "mr", "mc", "cap", "presorted", "fb_th",
    "fb_tw", "fb_gc"))
def _raster_fwd_call_exact(geom_t, col_t, *, h, w, th, tw, gc, mr, mc, cap,
                           presorted, fb_th, fb_tw, fb_gc):
    """Exact-list forward: each tile walks precisely the Gaussians whose
    cull boxes overlap it (per-tile segments chunk-padded to `gc`). This
    replaces the windowed path's y-range superset walk, which at trained
    box statistics visits ~3.5x the exact volume (BENCH_NOTES round 4).
    Falls back to the windowed path at runtime on span/capacity overflow
    (e.g. init-saturated sigmas, where the expansion would not fit)."""
    sp = geom_t.shape[1]
    nc = col_t.shape[0]
    n_th, n_tw = _cdiv(h, th), _cdiv(w, tw)
    nt = n_th * n_tw
    p = th * tw
    nchunks = cap // gc

    if not presorted:
        fy0, fx0, _, _, _ = _corner_tiles(
            jax.lax.stop_gradient(geom_t), h=h, w=w, th=th, tw=tw)
        perm = jnp.argsort(fy0 * n_tw + fx0, stable=True)
        geom_t = jnp.take(geom_t, perm, axis=1)
        col_t = jnp.take(col_t, perm, axis=1)

    list_idx, tab, ok = _exact_tables(geom_t, h=h, w=w, th=th, tw=tw, gc=gc,
                                      mr=mr, mc=mc, cap=cap)

    def exact(args):
        geom_t, col_t, list_idx, tab = args
        pad_col = jnp.zeros((GEOM_COLS, 1), jnp.float32)
        pad_col = pad_col.at[G_SX, 0].set(1.0)
        pad_col = pad_col.at[G_SY, 0].set(1.0)
        pad_col = pad_col.at[G_XLO, 0].set(_PAD)
        pad_col = pad_col.at[G_YLO, 0].set(_PAD)
        pad_col = pad_col.at[G_XHI, 0].set(-_PAD)
        pad_col = pad_col.at[G_YHI, 0].set(-_PAD)
        glist = jnp.take(jnp.concatenate([geom_t, pad_col], axis=1),
                         list_idx, axis=1)
        clist = jnp.take(jnp.concatenate(
            [col_t, jnp.zeros((nc, 1), jnp.float32)], axis=1),
            list_idx, axis=1)
        kernel = functools.partial(_fwd_kernel_list, th=th, tw=tw,
                                   n_tw=n_tw, nc=nc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nchunks,),
            in_specs=[
                pl.BlockSpec((GEOM_COLS, gc), lambda k, tab_ref: (0, k)),
                pl.BlockSpec((nc, gc), lambda k, tab_ref: (0, k)),
            ],
            out_specs=pl.BlockSpec(
                (1, nc, p), lambda k, tab_ref: (tab_ref[0, k] // 4, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, nc, p), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
            ),
            interpret=_interpret(),
        )(tab, glist, clist)
        img = out.reshape(n_th, n_tw, nc, th, tw)
        img = img.transpose(0, 3, 1, 4, 2).reshape(n_th * th, n_tw * tw, nc)
        return img[:h, :w]

    def fallback(args):
        geom_t, col_t, _, _ = args
        kc_fb = sp // fb_gc
        if kc_fb >= 16:
            win = int(min(kc_fb, max(64, -(-kc_fb // 4))))
            return _raster_fwd_call_windowed(
                geom_t, col_t, h=h, w=w, th=fb_th, tw=fb_tw, gc=fb_gc,
                window=win)
        return _raster_fwd_call(geom_t, col_t, h=h, w=w, th=fb_th,
                                tw=fb_tw, gc=fb_gc)

    return jax.lax.cond(ok, exact, fallback, (geom_t, col_t, list_idx, tab))


def _raster_fwd_tiles(geom_t, col_t, *, h, w, th, tw, gc):
    """Dense-grid forward returning raw (nt, p, nc) tiles."""
    sp = geom_t.shape[1]
    nc = col_t.shape[0]
    kc = sp // gc
    n_th = _cdiv(h, th)
    n_tw = _cdiv(w, tw)
    nt = n_th * n_tw
    p = th * tw

    bbox = _chunk_bboxes(geom_t, gc)
    kernel = functools.partial(_fwd_kernel, th=th, tw=tw, n_tw=n_tw, nc=nc)
    return pl.pallas_call(
        kernel,
        grid=(nt, kc),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # bbox (4, kc)
            pl.BlockSpec((GEOM_COLS, gc), lambda t, k: (0, k)),
            pl.BlockSpec((nc, gc), lambda t, k: (0, k)),
        ],
        out_specs=pl.BlockSpec((1, p, nc), lambda t, k: (t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((nt, p, nc), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        interpret=_interpret(),
    )(bbox, geom_t, col_t)


@functools.partial(jax.jit, static_argnames=("h", "w", "th", "tw", "gc"))
def _raster_fwd_call(geom_t, col_t, *, h, w, th, tw, gc):
    # geom_t: (16, sp), col_t: (nc, sp) — gaussians along lanes so block
    # DMAs move O(gc) bytes (an (sp, 16) layout lane-pads 16 -> 128 and
    # multiplies HBM traffic ~8x).
    sp = geom_t.shape[1]
    nc = col_t.shape[0]
    kc = sp // gc
    n_th = _cdiv(h, th)
    n_tw = _cdiv(w, tw)
    nt = n_th * n_tw
    p = th * tw

    out = _raster_fwd_tiles(geom_t, col_t, h=h, w=w, th=th, tw=tw, gc=gc)
    img = out.reshape(n_th, n_tw, th, tw, nc)
    img = img.transpose(0, 2, 1, 3, 4).reshape(n_th * th, n_tw * tw, nc)
    return img[:h, :w]


def _chunk_tile_rects(bbox, *, h, w, th, tw, n_th, n_tw):
    """Per-chunk tile rectangles (4, kc) int32 [row0, col0, ncols, count].

    The rectangle of compute tiles a chunk's union cull box overlaps; `count`
    = nrows * ncols is the walk length of `_bwd_kernel_windowed`. Chunks
    whose box misses the canvas get count 0."""
    xlo = jnp.clip(bbox[0], 0.0, float(w - 1))
    xhi = jnp.clip(bbox[1], 0.0, float(w - 1))
    ylo = jnp.clip(bbox[2], 0.0, float(h - 1))
    yhi = jnp.clip(bbox[3], 0.0, float(h - 1))
    vis = (bbox[0] <= w - 1) & (bbox[1] >= 0) & (bbox[2] <= h - 1) \
        & (bbox[3] >= 0) & (bbox[1] >= bbox[0]) & (bbox[3] >= bbox[2])
    row0 = (ylo // th).astype(jnp.int32)
    row1 = (yhi // th).astype(jnp.int32)
    col0 = (xlo // tw).astype(jnp.int32)
    col1 = (xhi // tw).astype(jnp.int32)
    nrows = row1 - row0 + 1
    ncols = col1 - col0 + 1
    cnt = jnp.where(vis, nrows * ncols, 0).astype(jnp.int32)
    return jnp.stack(
        [jnp.where(vis, row0, 0), jnp.where(vis, col0, 0),
         jnp.maximum(ncols, 1), cnt], axis=0)


def _bwd_gtile(g_img, *, h, w, th, tw, n_th, n_tw, nc):
    """Output cotangent -> per-tile (nt, nc, p) blocks (nc along sublanes so
    the per-step DMA is O(p) bytes)."""
    p = th * tw
    gpad = jnp.zeros((n_th * th, n_tw * tw, nc), jnp.float32)
    gpad = gpad.at[:h, :w].set(g_img)
    gtile = gpad.reshape(n_th, th, n_tw, tw, nc).transpose(0, 2, 4, 1, 3)
    return gtile.reshape(n_th * n_tw, nc, p)


@functools.partial(
    jax.jit, static_argnames=("h", "w", "th", "tw", "gc", "window"))
def _raster_bwd_call(geom_t, col_t, g_img, *, h, w, th, tw, gc, window=0):
    sp = geom_t.shape[1]
    nc = col_t.shape[0]
    kc = sp // gc
    n_th = _cdiv(h, th)
    n_tw = _cdiv(w, tw)
    nt = n_th * n_tw
    p = th * tw

    gtile = _bwd_gtile(g_img, h=h, w=w, th=th, tw=tw, n_th=n_th, n_tw=n_tw,
                       nc=nc)
    bbox = _chunk_bboxes(geom_t, gc)
    out_shape = [
        jax.ShapeDtypeStruct((GEOM_COLS, sp), jnp.float32),
        jax.ShapeDtypeStruct((nc, sp), jnp.float32),
    ]

    def dense(args):
        geom_t, col_t, gtile, bbox, _ = args
        kernel = functools.partial(_bwd_kernel, th=th, tw=tw, n_tw=n_tw,
                                   nc=nc)
        return pl.pallas_call(
            kernel,
            grid=(kc, nt),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # bbox (4, kc)
                pl.BlockSpec((GEOM_COLS, gc), lambda k, t: (0, k)),
                pl.BlockSpec((nc, gc), lambda k, t: (0, k)),
                pl.BlockSpec((1, nc, p), lambda k, t: (t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((GEOM_COLS, gc), lambda k, t: (0, k)),
                pl.BlockSpec((nc, gc), lambda k, t: (0, k)),
            ],
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=_interpret(),
        )(bbox, geom_t, col_t, gtile)

    if window <= 0 or window >= nt:
        return dense((geom_t, col_t, gtile, bbox, None))

    rect = _chunk_tile_rects(bbox, h=h, w=w, th=th, tw=tw, n_th=n_th,
                             n_tw=n_tw)
    overflow = jnp.any(rect[3] > window)

    def windowed(args):
        geom_t, col_t, gtile, bbox, rect = args
        kernel = functools.partial(_bwd_kernel_windowed, th=th, tw=tw,
                                   n_tw=n_tw, nt=nt, nc=nc)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(kc, window),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),  # bbox (4, kc)
                pl.BlockSpec((GEOM_COLS, gc),
                             lambda k, j, rect_ref: (0, k)),
                pl.BlockSpec((nc, gc), lambda k, j, rect_ref: (0, k)),
                pl.BlockSpec(
                    (1, nc, p),
                    lambda k, j, rect_ref: (
                        _bwd_tile(rect_ref, k, j, n_tw, nt), 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((GEOM_COLS, gc), lambda k, j, rect_ref: (0, k)),
                pl.BlockSpec((nc, gc), lambda k, j, rect_ref: (0, k)),
            ],
        )
        return pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=_interpret(),
        )(rect, bbox, geom_t, col_t, gtile)

    return jax.lax.cond(overflow, dense, windowed,
                        (geom_t, col_t, gtile, bbox, rect))


# ---------------------------------------------------------------------------
# Differentiable core (custom VJP over the packed pixel-unit representation)
# ---------------------------------------------------------------------------


def _fwd_dispatch(geom, col, h, w, th, tw, gc, cap_chunks, exact_spec):
    """Forward dispatch. exact_spec = (mr, mc, cap, presorted) with cap > 0
    selects the exact-list forward; cap_chunks > 0 the engaged-chunk-list
    forward (runtime fallback to windowed on overflow); otherwise the
    windowed forward when the chunk count is large enough for per-tile
    ranges to pay off, else the dense grid."""
    kc = geom.shape[1] // gc
    if exact_spec is not None and exact_spec[2] > 0:
        mr, mc, cap, presorted = exact_spec
        return _raster_fwd_call_exact(
            geom, col, h=h, w=w, th=_DEF_TH_BIN, tw=tw, gc=_DEF_GC_LIST,
            mr=mr, mc=mc, cap=cap, presorted=bool(presorted), fb_th=th,
            fb_tw=tw, fb_gc=gc)
    if cap_chunks > 0:
        return _raster_fwd_call_chunklist(geom, col, h=h, w=w, th=th, tw=tw,
                                          gc=gc, cap_chunks=cap_chunks)
    if kc >= 16:
        window = int(min(kc, max(64, -(-kc // 4))))
        return _raster_fwd_call_windowed(geom, col, h=h, w=w, th=th, tw=tw,
                                         gc=gc, window=window)
    return _raster_fwd_call(geom, col, h=h, w=w, th=th, tw=tw, gc=gc)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def _raster_core(geom, col, h, w, th, tw, gc, gc_bwd, cap_chunks, window_bwd,
                 exact_spec):
    return _fwd_dispatch(geom, col, h, w, th, tw, gc, cap_chunks, exact_spec)


def _raster_core_fwd(geom, col, h, w, th, tw, gc, gc_bwd, cap_chunks,
                     window_bwd, exact_spec):
    out = _fwd_dispatch(geom, col, h, w, th, tw, gc, cap_chunks, exact_spec)
    return out, (geom, col)


def _raster_core_bwd(h, w, th, tw, gc, gc_bwd, cap_chunks, window_bwd,
                     exact_spec, res, g):
    # Backward runs with its own smaller tile/chunk so its ~8 concurrent
    # (th_bwd*tw, gc_bwd) f32 temporaries fit the ~16MB VMEM budget.
    geom, col = res
    dgeom, dcol = _raster_bwd_call(geom, col, g, h=h, w=w, th=_DEF_TH_BWD,
                                   tw=tw, gc=gc_bwd, window=window_bwd)
    return dgeom, dcol


_raster_core.defvjp(_raster_core_fwd, _raster_core_bwd)


# ---------------------------------------------------------------------------
# Public APIs
# ---------------------------------------------------------------------------


def gs_render_px(geom, colors, canvas_hw: Sequence[int], *,
                 spatial_sort: bool = True, th: int = _DEF_TH,
                 tw: int = _DEF_TW, gc: int = _DEF_GC,
                 gc_bwd: int = _DEF_GC_BWD, binning: str = "auto",
                 max_box_px=None):
    """Rasterize Gaussians given in pixel units onto a (H, W) canvas.

    Args:
      geom: (S, 16) packed rows [sigma_x, sigma_y, rho, cx, cy, xlo, xhi,
        ylo, yhi, 0...]; sigmas/centers/bounds in canvas pixels. The cull
        box is inclusive.
      colors: (S, C) alpha-premultiplied colors.
      canvas_hw: static (H, W).
      binning: forward-path selection for large renders.
        "auto" (default): the engaged-chunk-list forward — a 1D grid over
          exactly the (tile, chunk) pairs whose chunk bbox overlaps the
          tile, bitwise-identical accumulation order to the windowed path,
          with a runtime fallback to the windowed path when the engaged
          count overflows the static capacity (e.g. init-saturated boxes).
        "on": same, forced even for small renders.
        "off": the windowed per-tile chunk-range walk (dense grid for
          small chunk counts).
        "exact": opt-in per-tile EXACT Gaussian lists (sort-free analytic
          slot assignment; runtime fallback to the windowed path on
          span/capacity overflow). Exactness at Gaussian granularity is
          the structural walk floor, but its XLA list build (argsort +
          multi-million-row gather/scatter) measures ~100x off HBM speed
          on this part, so it loses end-to-end at production shapes
          (BENCH_NOTES r4) — kept as the correctness scaffold. Requires
          max_box_px (or a small canvas): without a static box bound the
          (mr*mc, S) build lattices can reach HBM-OOM scale, so spans
          over 64 tiles route to the windowed path at trace time.
      max_box_px: optional static (box_h, box_w) upper bound on any cull-box
        extent in pixels (e.g. dmax-derived); sizes the exact path's
        offset lattice, the chunk-list capacity and the backward window.
    Returns: (H, W, C) float32.
    """
    h, w = int(canvas_hw[0]), int(canvas_hw[1])
    s = geom.shape[0]
    geom = geom.astype(jnp.float32)
    colors = colors.astype(jnp.float32)

    import math as _m
    n_th_e, n_tw_e = _cdiv(h, _DEF_TH_BIN), _cdiv(w, tw)
    if max_box_px is not None:
        mbh_i = int(_m.ceil(float(max_box_px[0])))
        mbw_i = int(_m.ceil(float(max_box_px[1])))
        mr = min(n_th_e, _cdiv(max(mbh_i - 1, 1), _DEF_TH_BIN) + 1)
        mc = min(n_tw_e, _cdiv(max(mbw_i - 1, 1), tw) + 1)
    else:
        mr, mc = n_th_e, n_tw_e
    # ADVICE r4: without a static box bound the exact build would allocate
    # (mr*mc, S) lattices at canvas scale (HBM-OOM risk before the runtime
    # fallback can engage) — refuse the exact path at trace time instead.
    use_exact = binning == "exact" and mr * mc <= 64

    presorted = False
    if spatial_sort and s > gc:
        g = jax.lax.stop_gradient(geom)
        if use_exact:
            # The exact path's own sort order; marking it presorted skips
            # a second argsort inside the call.
            fy0, fx0, _, _, _ = _corner_tiles(g.T, h=h, w=w,
                                              th=_DEF_TH_BIN, tw=tw)
            key = fy0 * n_tw_e + fx0
            presorted = True
        else:
            cyx = jnp.clip(g[:, G_CY], 0, h - 1).astype(jnp.int32) // th
            cxx = jnp.clip(g[:, G_CX], 0, w - 1).astype(jnp.int32) // tw
            key = (cyx * _cdiv(w, tw) + cxx).astype(jnp.int32)
        perm = jnp.argsort(key, stable=True)
        geom = jnp.take(geom, perm, axis=0)
        colors = jnp.take(colors, perm, axis=0)

    align = max(gc, gc_bwd)
    assert align % min(gc, gc_bwd) == 0, (gc, gc_bwd)
    sp = _cdiv(s, align) * align
    pad = sp - s
    if pad:
        pad_geom = jnp.zeros((1, GEOM_COLS), jnp.float32)
        pad_geom = pad_geom.at[0, G_SX].set(1.0)
        pad_geom = pad_geom.at[0, G_SY].set(1.0)
        for col_i in (G_CX, G_CY):
            pad_geom = pad_geom.at[0, col_i].set(_PAD)
        # INVERTED cull boxes (lo=+PAD, hi=-PAD): empty for the per-pixel
        # mask and the overlap test, AND neutral in chunk-bbox unions —
        # far-away +PAD boxes would inflate the last chunk's union and
        # trip the windowed backward's overflow fallback.
        for col_i in (G_XLO, G_YLO):
            pad_geom = pad_geom.at[0, col_i].set(_PAD)
        for col_i in (G_XHI, G_YHI):
            pad_geom = pad_geom.at[0, col_i].set(-_PAD)
        geom = jnp.concatenate([geom, jnp.tile(pad_geom, (pad, 1))], axis=0)
        colors = jnp.pad(colors, ((0, pad), (0, 0)))

    # Backward tile-rectangle window (0 = dense (kc, nt) walk): sized so a
    # sorted chunk's union bbox — cull-box extent plus up to two corner
    # bins / key tiles of sort locality — fits; a runtime overflow check
    # falls back to the dense walk, so the bound only affects speed.
    window_bwd = 0
    sp = geom.shape[0]
    if max_box_px is not None and sp // gc_bwd >= 8:
        import math as _m
        mbh_i = int(_m.ceil(float(max_box_px[0])))
        mbw_i = int(_m.ceil(float(max_box_px[1])))
        bw_nth = _cdiv(h, _DEF_TH_BWD)
        bw_ntw = _cdiv(w, tw)
        rows = min(bw_nth, 3 * _cdiv(mbh_i, _DEF_TH_BWD) + 6)
        cols = min(bw_ntw, 3 * _cdiv(mbw_i, tw) + 4)
        if rows * cols <= (bw_nth * bw_ntw) // 2:
            window_bwd = rows * cols

    # Engaged-chunk-list capacity (static): expected engaged chunks/tile =
    # (box-dilated tile area / tile area) x (avg chunks per tile's anchor
    # population), with a 2.2x slack for chunk-extent spread under the
    # spatial sort; overflow falls back to the windowed path at runtime.
    cap_chunks = 0
    sp_pre = _cdiv(s, align) * align
    if binning in ("auto", "on") and not use_exact and \
            sp_pre // gc >= (16 if binning == "auto" else 1):
        nt_c = _cdiv(h, th) * _cdiv(w, tw)
        kc_c = sp_pre // gc
        if max_box_px is not None:
            area_ratio = ((th + mbh_i) * (tw + mbw_i)) / float(th * tw)
        else:
            area_ratio = 4.0
        cpt = int(2.2 * area_ratio * max(sp_pre / (nt_c * gc), 1.0)) + 8
        # +1/tile for zero-only slots; 24576-step hard cap bounds SMEM and
        # pad-step waste (larger canvases route to the windowed fallback)
        cap_chunks = int(min(nt_c * (min(cpt, kc_c) + 1), 24576))

    exact_spec = (0, 0, 0, False)
    if use_exact:
        sp = geom.shape[0]
        nt_e = n_th_e * n_tw_e
        # Capacity: every tile owns >= 1 chunk plus the membership budget.
        # When mr*mc <= the budget multiplier the expansion can never
        # overflow (a box contributes at most mr*mc memberships) and the
        # exact path runs unconditionally; larger spans (e.g. saturated
        # init sigmas) trip the runtime check and fall back.
        cap_mult = min(mr * mc, 10)
        cap = _cdiv(nt_e * _DEF_GC_LIST + cap_mult * sp,
                    _DEF_GC_LIST) * _DEF_GC_LIST
        exact_spec = (mr, mc, cap, presorted)

    # Transpose to gaussians-along-lanes; autodiff maps grads back.
    return _raster_core(geom.T, colors.T, h, w, th, tw, gc, gc_bwd,
                        cap_chunks, window_bwd, exact_spec)


def pack_geometry(sigmas, coords, image_size, dmax, y_offset=None,
                  y_slot=None, x_slot=None):
    """Normalized-unit parameters -> pixel-unit packed geometry.

    Maps the reference convention (pixel (hi, wi) at ``2*i/(n-1)-1``,
    gs.cu:39,46) into pixel units: the kernel value is invariant under the
    common rescaling of distances and sigmas by (n-1)/2 per axis.

    Args:
      sigmas: (S, 3) [sigma_x, sigma_y, rho] in normalized kernel units.
      coords: (S, 2) [x, y] centers in [-1, 1].
      image_size: effective (h, w) — python ints or traced scalars.
      dmax: scalar cull radius in normalized units.
      y_offset: optional scalar row offset (batch slot stacking).
      y_slot: optional (row_lo, row_hi) inclusive clamp for the cull box,
        applied *after* y_offset.
      x_slot: optional (col_lo, col_hi) inclusive clamp for the cull box.

    Returns: (S, 16) packed geometry.
    """
    h, w = image_size[0], image_size[1]
    half_w = (jnp.asarray(w, jnp.float32) - 1.0) * 0.5
    half_h = (jnp.asarray(h, jnp.float32) - 1.0) * 0.5
    sx = sigmas[:, 0] * half_w
    sy = sigmas[:, 1] * half_h
    rho = sigmas[:, 2]
    cx = (coords[:, 0] + 1.0) * half_w
    cy = (coords[:, 1] + 1.0) * half_h
    dmx = jnp.asarray(dmax, jnp.float32) * half_w
    dmy = jnp.asarray(dmax, jnp.float32) * half_h
    # Exact sigma-based tightening: for any rho, the kernel value is bounded
    # by exp(-0.5 (dx/sigma_x)^2) (minimize the quadratic over dy), which
    # underflows to f32 zero beyond ~14.4 sigma (exp(-104) < min subnormal).
    # Clamping the cull box to 14.5 sigma therefore changes nothing in the
    # f32 output while shrinking each Gaussian's footprint to its true
    # support — typically a large speedup over the reference's fixed dmax
    # scan (gs.cu:41-50).
    k_zero = 14.5
    dmx = jnp.minimum(dmx, k_zero * sx)
    dmy = jnp.minimum(dmy, k_zero * sy)
    xlo, xhi = cx - dmx, cx + dmx
    ylo, yhi = cy - dmy, cy + dmy
    if y_offset is not None:
        off = jnp.asarray(y_offset, jnp.float32)
        cy, ylo, yhi = cy + off, ylo + off, yhi + off
    if y_slot is not None:
        ylo = jnp.maximum(ylo, jnp.asarray(y_slot[0], jnp.float32))
        yhi = jnp.minimum(yhi, jnp.asarray(y_slot[1], jnp.float32))
    if x_slot is not None:
        xlo = jnp.maximum(xlo, jnp.asarray(x_slot[0], jnp.float32))
        xhi = jnp.minimum(xhi, jnp.asarray(x_slot[1], jnp.float32))
    s = sigmas.shape[0]
    zeros = jnp.zeros((s, GEOM_COLS - 9), jnp.float32)
    return jnp.concatenate(
        [jnp.stack([sx, sy, rho, cx, cy, xlo, xhi, ylo, yhi], axis=1), zeros],
        axis=1)


def gs_render(sigmas, coords, colors, image_size: Sequence[int], dmax=100.0,
              *, spatial_sort: bool = True, th: int = _DEF_TH,
              tw: int = _DEF_TW, gc: int = _DEF_GC,
              gc_bwd: int = _DEF_GC_BWD, binning: str = "auto"):
    """Render S Gaussians in the reference's normalized convention.

    Drop-in equivalent of the reference `gaussiansplatting_render`
    (`/root/reference/utils/gs_cuda_dmax/gswrapper.py:44-53`): same parameter
    conventions, differentiable w.r.t. sigmas/coords/colors.

    Args:
      sigmas: (S, 3) [sigma_x, sigma_y, rho] in normalized kernel units.
      coords: (S, 2) [x, y] centers in [-1, 1].
      colors: (S, C) alpha-premultiplied colors.
      image_size: static (h, w).
      dmax: scalar box-cull radius in normalized units.
    Returns: (h, w, C) float32 image.
    """
    h, w = int(image_size[0]), int(image_size[1])
    geom = pack_geometry(sigmas.astype(jnp.float32),
                         coords.astype(jnp.float32), (h, w), dmax)
    # With a static dmax the cull-box extents are bounded by 2*dmax*half
    # per axis — sizes the exact-path offset lattice and list capacities.
    max_box_px = None
    if isinstance(dmax, (int, float)):
        max_box_px = (min(h, dmax * (h - 1) + 1), min(w, dmax * (w - 1) + 1))
    return gs_render_px(geom, colors, (h, w), spatial_sort=spatial_sort,
                        th=th, tw=tw, gc=gc, gc_bwd=gc_bwd, binning=binning,
                        max_box_px=max_box_px)
