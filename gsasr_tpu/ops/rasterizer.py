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
# Segment-binned forward: per-tile corner-neighborhood walks on short
# (8, 128) tiles so a small Gaussian is evaluated against ~1k pixels instead
# of 4k; see _raster_fwd_call_binned.
_DEF_TH_BIN = 8
_DEF_GC_BIN = 256


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


def _seg_chunk(tab_ref, t, k, kc, n_ranges):
    """Piecewise chunk selection over tile t's ranges; tab rows
    [0, n_ranges) are range chunk starts, rows [n_ranges, 2*n_ranges) the
    cumulative chunk counts."""
    n = n_ranges
    c = tab_ref[n - 1, t] + (k - tab_ref[2 * n - 2, t])
    for i in range(n - 2, -1, -1):
        prev = tab_ref[n + i - 1, t] if i > 0 else 0
        c = jnp.where(k < tab_ref[n + i, t],
                      tab_ref[i, t] + (k - prev), c)
    return jnp.clip(c, 0, kc - 1)


def _fwd_kernel_seg(tab_ref, geom_ref, col_ref, out_ref, *, th, tw, n_tw,
                    nc, kc, n_ranges):
    """Forward over per-tile segment ranges of the class-sorted Gaussian
    array (see `_raster_fwd_call_binned`): the k-th step of tile t walks the
    concatenation of its chunk ranges, masked past the total. No bbox
    test — a range is a superset of the exact per-tile list only through
    chunk-boundary rounding and bin granularity, and every extra Gaussian
    is nulled by the per-pixel cull-box mask."""
    t = pl.program_id(0)
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    tile_i = t // n_tw
    tile_j = t - tile_i * n_tw

    @pl.when(k < tab_ref[2 * n_ranges - 1, t])
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


def _fwd_kernel_list(tab_ref, geom_ref, col_ref, out_ref, *, th, tw, n_tw,
                     nc):
    """Forward over per-tile EXACT Gaussian lists: grid step k processes the
    k-th chunk of the gathered list array; tab rows are [tile, flag] with
    flag 1 = first chunk of its tile (zero the block), 0 = continuation,
    -1 = unused trailing capacity (skip). Every listed Gaussian's cull box
    overlaps its tile by construction, so there is no chunk bbox test; pad
    slots carry inverted boxes and are nulled by the per-pixel mask. tab is
    packed `tile*4 + (flag+1)` (one int32/chunk keeps SMEM small).

    The output tile is (1, nc, p) — colors along sublanes — because this
    kernel's out block index changes with the 1D grid step, so Mosaic
    flushes/refetches across tile boundaries; a (1, p, nc) layout would
    lane-pad nc -> 128 and move ~1 MB per boundary."""
    k = pl.program_id(0)
    code = tab_ref[0, k]
    t = code // 4
    flag = code - 4 * t - 1

    @pl.when(flag == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(flag >= 0)
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


def _class_list(rmax: int):
    """Ascending power-of-two row-capacity classes covering rmax (in
    compute-tile units), capped at 7 classes; the last class capacity is
    exactly rmax when rmax is not itself a power of two."""
    rs = []
    r = 2
    while r < rmax and len(rs) < 6:
        rs.append(r)
        r *= 2
    rs.append(max(int(rmax), 2))
    return tuple(rs)


def _class_key(geom_t, *, h, w, th, tw, rmax):
    """Sort/walk key for the size-classed segment forward.

    Every visible Gaussian is assigned to the smallest size class whose
    row capacity R (in compute tiles) covers its clipped cull box
    (col span <= 2 tiles for all classes); within a class the key is the
    (row-bin = fy0 // R, corner col-tile) cell. A box spanning more than
    2 col-tiles or taller than the largest class lands in a single 'wide'
    bucket that every tile walks. Unlike the r2-r3 fine/coarse scheme
    (fine = 2x2 tiles, one coarse bin size from the dmax bound), the walk
    volume contracts WITH the box-size distribution: each class is walked
    over ~2R rows instead of the worst-case dmax extent — this is what
    closes the "0.27 of the exact-list bound at trained sigmas" gap
    BENCH_NOTES round 4 measured for the old scheme.

    Returns (key, composite, n_keys): composite refines the key by the
    corner's fine tile (y-major) so backward chunk bboxes stay ~box-sized;
    composite // nt == relation is not needed — searchsorted runs on
    `key` recomputed from the composite-sorted array. n_keys is static.
    """
    g = jax.lax.stop_gradient(geom_t)
    xlo, xhi = g[G_XLO], g[G_XHI]
    ylo, yhi = g[G_YLO], g[G_YHI]
    n_th, n_tw = _cdiv(h, th), _cdiv(w, tw)
    nt = n_th * n_tw
    rs = _class_list(min(rmax, n_th))

    vis = ((xhi >= 0) & (xlo <= w - 1) & (yhi >= 0) & (ylo <= h - 1)
           & (xhi >= xlo) & (yhi >= ylo))
    fx0 = (jnp.clip(xlo, 0, w - 1) // tw).astype(jnp.int32)
    fx1 = (jnp.clip(xhi, 0, w - 1) // tw).astype(jnp.int32)
    fy0 = (jnp.clip(ylo, 0, h - 1) // th).astype(jnp.int32)
    fy1 = (jnp.clip(yhi, 0, h - 1) // th).astype(jnp.int32)
    srows = fy1 - fy0 + 1
    scols = fx1 - fx0 + 1

    key = jnp.full(fy0.shape, -1, jnp.int32)
    base = 0
    for r in rs:
        k_c = base + (fy0 // r) * n_tw + fx0
        fit = vis & (key < 0) & (srows <= r) & (scols <= 2)
        key = jnp.where(fit, k_c, key)
        base += _cdiv(n_th, r) * n_tw
    wide_base = base
    key = jnp.where(vis & (key < 0), wide_base, key)
    n_keys = wide_base + 1
    key = jnp.where(vis, key, n_keys)  # invisible sort last

    if (n_keys + 1) * nt < 2**31:
        sub = fy0 * n_tw + fx0
        composite = key * nt + jnp.where(vis, sub, 0)
    else:  # int32 overflow guard for huge canvases: plain walk-key order
        composite = key
    return key.astype(jnp.int32), composite.astype(jnp.int32), n_keys


def _class_tables(bounds, *, n_th, n_tw, rmax, gc, kc):
    """Per-tile chunk-range table (2*n_ranges, nt) int32 for
    `_fwd_kernel_seg`, n_ranges = 2 * n_classes + 1.

    For class capacity R, a Gaussian covers tile row ti iff its corner row
    fy0 is in [ti - R + 1, ti] — an interval of length R spanning at most
    2 consecutive R-row bins; per bin the needed corner col-tiles
    {tj-1, tj} are adjacent keys, so each (class, bin-row) contributes ONE
    contiguous key range. Plus one range for the wide bucket. Ranges are
    rounded to chunk boundaries (the kernel's per-pixel box mask nulls the
    strays) and each range's chunk end is clamped to the next range's
    start so rounding can never double-count.

    rows [0, n): range chunk starts; rows [n, 2n): cumulative counts.
    """
    nt = n_th * n_tw
    rs = _class_list(min(rmax, n_th))
    t = jnp.arange(nt, dtype=jnp.int32)
    ti = t // n_tw
    tj = t - ti * n_tw
    n_keys = bounds.shape[0] - 1

    los, his = [], []
    base = 0
    for r in rs:
        b1 = ti // r
        b0 = jnp.maximum(ti - r + 1, 0) // r
        for brow in (b0, b1):
            lo_key = base + brow * n_tw + jnp.maximum(tj - 1, 0)
            hi_key = base + brow * n_tw + tj + 1
            lo = bounds[jnp.clip(lo_key, 0, n_keys)]
            hi = bounds[jnp.clip(hi_key, 0, n_keys)]
            los.append(lo)
            his.append(jnp.maximum(hi, lo))
        base += _cdiv(n_th, r) * n_tw
    # wide bucket: every tile walks it
    los.append(jnp.broadcast_to(bounds[base], (nt,)))
    his.append(jnp.broadcast_to(jnp.maximum(bounds[base + 1], bounds[base]),
                                (nt,)))

    n = len(los)
    clo = [lo // gc for lo in los]
    chi = [-(-hi // gc) for hi in his]
    for i in range(n - 1):
        chi[i] = jnp.minimum(chi[i], clo[i + 1])
    lens = [jnp.maximum(chi[i] - jnp.minimum(clo[i], chi[i]), 0)
            for i in range(n)]
    cum = []
    acc = jnp.zeros((nt,), jnp.int32)
    for i in range(n):
        acc = acc + lens[i]
        cum.append(acc)
    tab = jnp.stack(
        [jnp.clip(c, 0, kc - 1) for c in clo] + cum, axis=0).astype(jnp.int32)
    return tab, acc


@functools.partial(jax.jit, static_argnames=(
    "h", "w", "th", "tw", "gc", "rmax", "window", "fb_th", "fb_tw",
    "fb_gc"))
def _raster_fwd_call_binned(geom_t, col_t, *, h, w, th, tw, gc, rmax,
                            window, fb_th, fb_tw, fb_gc):
    """Size-classed segment forward: every tile walks only the chunks of
    the class-sorted Gaussian array whose (class, row-bin, corner-col)
    cells its pixels can see. Work per tile contracts with the actual
    box-size distribution (each class walked over ~2R rows) instead of the
    static dmax extent — the r2-r3 fine/coarse scheme walked ~3.7x the
    exact-list bound at trained sigmas (BENCH_NOTES round 4). The input
    must already be sorted by `_class_key` (the caller's spatial sort).
    Falls back to the windowed path at runtime when a tile's walk exceeds
    `window`."""
    sp = geom_t.shape[1]
    nc = col_t.shape[0]
    n_th, n_tw = _cdiv(h, th), _cdiv(w, tw)
    nt = n_th * n_tw
    kc = sp // gc
    p = th * tw

    key, _, n_keys = _class_key(geom_t, h=h, w=w, th=th, tw=tw, rmax=rmax)
    bounds = jnp.searchsorted(
        key, jnp.arange(n_keys + 1, dtype=jnp.int32)).astype(jnp.int32)
    tab, total = _class_tables(bounds, n_th=n_th, n_tw=n_tw, rmax=rmax,
                               gc=gc, kc=kc)
    n_ranges = tab.shape[0] // 2
    ok = jnp.max(total) <= window

    def binned(args):
        geom_t, col_t, tab = args
        kernel = functools.partial(_fwd_kernel_seg, th=th, tw=tw, n_tw=n_tw,
                                   nc=nc, kc=kc, n_ranges=n_ranges)
        sel = functools.partial(_seg_chunk, kc=kc, n_ranges=n_ranges)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nt, window),
            in_specs=[
                pl.BlockSpec(
                    (GEOM_COLS, gc),
                    lambda t, k, tab_ref: (0, sel(tab_ref, t, k))),
                pl.BlockSpec(
                    (nc, gc),
                    lambda t, k, tab_ref: (0, sel(tab_ref, t, k))),
            ],
            out_specs=pl.BlockSpec((1, p, nc),
                                   lambda t, k, tab_ref: (t, 0, 0)),
        )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nt, p, nc), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            interpret=_interpret(),
        )(tab, geom_t, col_t)
        img = out.reshape(n_th, n_tw, th, tw, nc)
        img = img.transpose(0, 2, 1, 3, 4).reshape(n_th * th, n_tw * tw, nc)
        return img[:h, :w]

    def fallback(args):
        geom_t, col_t, _ = args
        kc_fb = sp // fb_gc
        if kc_fb >= 16:
            win = int(min(kc_fb, max(64, -(-kc_fb // 4))))
            return _raster_fwd_call_windowed(
                geom_t, col_t, h=h, w=w, th=fb_th, tw=fb_tw, gc=fb_gc,
                window=win)
        return _raster_fwd_call(geom_t, col_t, h=h, w=w, th=fb_th, tw=fb_tw,
                                gc=fb_gc)

    return jax.lax.cond(ok, binned, fallback, (geom_t, col_t, tab))


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


def _fwd_dispatch(geom, col, h, w, th, tw, gc, rmax, exact_spec):
    """Forward dispatch. exact_spec = (mr, mc, cap, presorted) with cap > 0
    selects the exact-list forward; rmax > 0 the size-classed segment
    forward (rmax = the largest cull-box row extent in fine-tile units);
    otherwise the windowed forward when the chunk count is large enough for
    per-tile ranges to pay off, else the dense grid."""
    kc = geom.shape[1] // gc
    if exact_spec is not None and exact_spec[2] > 0:
        mr, mc, cap, presorted = exact_spec
        return _raster_fwd_call_exact(
            geom, col, h=h, w=w, th=_DEF_TH_BIN, tw=tw, gc=_DEF_GC_LIST,
            mr=mr, mc=mc, cap=cap, presorted=bool(presorted), fb_th=th,
            fb_tw=tw, fb_gc=gc)
    if rmax > 0:
        sp = geom.shape[1]
        n_th = _cdiv(h, _DEF_TH_BIN)
        nt = n_th * _cdiv(w, tw)
        n_ranges = 2 * len(_class_list(min(rmax, n_th))) + 1
        window = max(32, _cdiv(8 * sp, nt * _DEF_GC_BIN) + 2 * n_ranges)
        return _raster_fwd_call_binned(
            geom, col, h=h, w=w, th=_DEF_TH_BIN, tw=tw, gc=_DEF_GC_BIN,
            rmax=rmax, window=window, fb_th=th, fb_tw=tw, fb_gc=gc)
    if kc >= 16:
        window = int(min(kc, max(64, -(-kc // 4))))
        return _raster_fwd_call_windowed(geom, col, h=h, w=w, th=th, tw=tw,
                                         gc=gc, window=window)
    return _raster_fwd_call(geom, col, h=h, w=w, th=th, tw=tw, gc=gc)


@functools.partial(jax.custom_vjp,
                   nondiff_argnums=(2, 3, 4, 5, 6, 7, 8, 9, 10))
def _raster_core(geom, col, h, w, th, tw, gc, gc_bwd, rmax, window_bwd,
                 exact_spec):
    return _fwd_dispatch(geom, col, h, w, th, tw, gc, rmax, exact_spec)


def _raster_core_fwd(geom, col, h, w, th, tw, gc, gc_bwd, rmax, window_bwd,
                     exact_spec):
    out = _fwd_dispatch(geom, col, h, w, th, tw, gc, rmax, exact_spec)
    return out, (geom, col)


def _raster_core_bwd(h, w, th, tw, gc, gc_bwd, rmax, window_bwd, exact_spec,
                     res, g):
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
      binning: "auto" uses the exact-binned forward for large renders (with
        a runtime fallback to the chunk-bbox path), "on" forces it, "off"
        disables it.
      max_box_px: optional static (box_h, box_w) upper bound on any cull-box
        extent in pixels (e.g. dmax-derived); sizes the coarse bins. Without
        it coarse bins cover the whole canvas, which is correct but slower
        when many Gaussians are coarse-class.
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
    # Exact-list forward: opt-in only. The walk volume IS the structural
    # floor (~3.5x below the windowed path at trained box statistics), but
    # on this chip the XLA build primitives it needs run ~100x off HBM
    # speed (measured with hard syncs: argsort 518k = 43 ms, 5.3M-row
    # gather = 70 ms, 10M scatter = 101 ms, (20, 518k) cumsum = 36 ms), so
    # the ~220 ms prep swamps the ~70 ms kernel saving. Opt in with
    # binning="exact"; revisit if the build moves into Pallas.
    use_exact = binning == "exact"

    # The size-classed segment forward requires the class-key sort below,
    # so it only engages when the spatial sort runs.
    rmax = 0
    if (not use_exact and spatial_sort and s > gc
            and (binning == "on" or (binning == "auto" and s // gc >= 16))):
        mbh = max_box_px[0] if max_box_px is not None else h
        rmax = min(_cdiv(h, _DEF_TH_BIN), _cdiv(int(mbh) + 2, _DEF_TH_BIN))

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
        elif rmax > 0:
            _, key, _ = _class_key(g.T, h=h, w=w, th=_DEF_TH_BIN, tw=tw,
                                   rmax=rmax)
        else:
            cyx = jnp.clip(g[:, G_CY], 0, h - 1).astype(jnp.int32) // th
            cxx = jnp.clip(g[:, G_CX], 0, w - 1).astype(jnp.int32) // tw
            key = (cyx * _cdiv(w, tw) + cxx).astype(jnp.int32)
        perm = jnp.argsort(key, stable=True)
        geom = jnp.take(geom, perm, axis=0)
        colors = jnp.take(colors, perm, axis=0)

    align = max(gc, gc_bwd)
    if rmax > 0:
        align = max(align, _DEF_GC_BIN)
        assert align % _DEF_GC_BIN == 0, (align, _DEF_GC_BIN)
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
        if rmax > 0:
            # Class-key sort with within-bin fine subkey: a chunk's bbox
            # spans at most its class's cull-box extent plus one row bin
            # of that class (<= rmax fine tiles each).
            rows = min(bw_nth,
                       2 * rmax * _DEF_TH_BIN // _DEF_TH_BWD + 6)
            cols = min(bw_ntw, _cdiv(mbw_i, tw) + 3)
        else:
            rows = min(bw_nth, 3 * _cdiv(mbh_i, _DEF_TH_BWD) + 6)
            cols = min(bw_ntw, 3 * _cdiv(mbw_i, tw) + 4)
        if rows * cols <= (bw_nth * bw_ntw) // 2:
            window_bwd = rows * cols

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
    return _raster_core(geom.T, colors.T, h, w, th, tw, gc, gc_bwd, rmax,
                        window_bwd, exact_spec)


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
    # per axis — size the binned forward's coarse bins to that.
    max_box_px = None
    if isinstance(dmax, (int, float)):
        max_box_px = (min(h, dmax * (h - 1) + 1), min(w, dmax * (w - 1) + 1))
    return gs_render_px(geom, colors, (h, w), spatial_sort=spatial_sort,
                        th=th, tw=tw, gc=gc, gc_bwd=gc_bwd, binning=binning,
                        max_box_px=max_box_px)
