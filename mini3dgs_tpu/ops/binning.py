"""Tile binning: (tile, depth)-key instance generation, sort, and ranges.

Reference semantics: `/root/reference/src/core/renderer.py:222-239` (global
ascending depth sort of the visible set) + `:263-298` (per-Gaussian AABB ->
overlapped 16x16 tiles, Python bucket lists).  The reference sorts Gaussians
once globally and then bins; the canonical high-performance formulation — and
ours — duplicates each Gaussian into one *instance per overlapped tile* and
sorts instances by a composite (tile, depth) key, which makes every tile's
working set a contiguous depth-ordered slice.

TPU-first design (all static shapes, and **scatter-free**: XLA scatters
lower to serial loops on TPU, so every placement step below is expressed as
sort + gather):
  1. Gaussians are depth-sorted once (C elements), so a Gaussian's row index
     IS its depth rank — exactly the reference's stable global depth order.
  2. Each sorted Gaussian emits up to MAX_DUP tile candidates (MAX_DUP is
     bounded by the radius_max clamp, renderer.py:24-27) with a single int32
     key  tile_id * C + depth_rank  (invalid -> INT32_MAX).
  3. ONE `lax.sort` over the [C * MAX_DUP] candidates compacts and orders
     them: the first n_live slots are the instance buffer, tile-major and
     front-to-back within each tile.
  4. The stream stays COMPACT (tile starts unaligned): the raster kernels
     mask boundary-chunk lanes, and their backward resolves the boundary
     write-sharing with a per-tile head side-buffer.  (An earlier
     chunk-padded layout was race-free by construction but moved 8x phantom
     bytes: TPU lane-pads [N,16] f32 arrays to [N,128], so its expansion
     gather alone cost ~9 ms at the bench size.)

This sort is the component that becomes a sharded multi-chip sort over ICI in
the parallel path (each tile-band device sorts only its band's instances).
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as jax_dtypes

from .projection import Projected


class Binning(NamedTuple):
    """Compact binning result.  The instance stream is the first `n_live`
    rows of the depth-rank array `s_rank`; tile t's instances are rows
    [tile_start[t], tile_start[t] + tile_count[t]) — tile starts are NOT
    chunk-aligned (the raster kernels mask boundary-chunk lanes instead;
    a TPU [N,16] array is physically lane-padded to 128, so the former
    chunk-padded layout moved 8x phantom bytes through every gather)."""

    s_rank: jnp.ndarray        # [K] depth rank of each compact sorted instance
    order: jnp.ndarray         # [C] gaussian id at each depth rank
    inv_order: jnp.ndarray     # [C] depth rank of each gaussian id
    rank_counts: jnp.ndarray   # [C] instances emitted per depth rank
    seg_start_gid: jnp.ndarray  # [C] rank-sorted segment start per gaussian id
    counts_gid: jnp.ndarray    # [C] instances emitted per gaussian id
    tile_start: jnp.ndarray    # [T] compact start row of each tile
    tile_count: jnp.ndarray    # [T] instance count per tile
    n_live: jnp.ndarray        # scalar: rows [0, n_live) hold real instances
    n_dropped: jnp.ndarray     # instances lost to capacity overflow (TOTAL,
                               # incl. the large-pool share below)
    # Rank-sorted permutation of the stream, precomputed at binning time so
    # the pack BACKWARD applies it as one lane gather instead of re-sorting
    # with GRAD_ROWS payload operands (sort cost is linear in operands: the
    # former 11-op sort cost ~2.3 ms vs ~0.8 for this 2-op one + gather).
    rank_perm: jnp.ndarray     # [K] stream position of rank-sorted slot i
    rank_key: jnp.ndarray      # [K] the sorted keys (s_rank; dead tail = C)
    # large-pool (two-level emission C_L compaction) share of n_dropped:
    # a DIFFERENT capacity knob than the stream (large_capacity vs
    # max_instances) — the auto-sizer must grow the right one
    n_dropped_large: jnp.ndarray = 0
    # large-pool OCCUPANCY: gaussians classified large (span > _SMALL_SPAN)
    # this render, i.e. how many of the C_L compaction slots are needed.
    # Lets the auto-sizer SHRINK large_capacity (drops alone can only say
    # "grow"); 0 when emission is single-level.
    n_large: jnp.ndarray = 0

    @property
    def live(self) -> jnp.ndarray:
        """[K] bool: row holds a real instance (debug/tests)."""
        K = self.s_rank.shape[0]
        return jnp.arange(K, dtype=jnp.int32) < self.n_live

    @property
    def gauss_id(self) -> jnp.ndarray:
        """[K] source Gaussian per compact row (debug/tests)."""
        return jnp.where(self.live, self.order[self.s_rank], 0)


# Packed-instance row layout (shared with the Pallas kernels):
ROW_X, ROW_Y, ROW_QA, ROW_QB, ROW_QC, ROW_OP = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_DEPTH, ROW_ONE = 6, 7, 8, 9, 10
N_ROWS = 16  # legacy wide stream: padded for sublane tiling; rows 11..15 unused
GRAD_ROWS = 10  # rows 0..9 are differentiable caller data; ROW_ONE and up
#                 are constants by the pack_instances contract (see _pack_bwd)
# Packed-stream row count: only the GRAD_ROWS data rows ride the pack
# gathers — ROW_ONE (constant 1) and the zero pads are synthesized inside
# the raster kernels instead of being gathered and streamed (the pack
# lane gathers are the step's largest non-floor cost and scale with row
# count; 10/16 of the work for the same kernels).  The legacy 16-row
# layout still works end to end (raster_pallas.WIDE_STREAM A/B toggle).
STREAM_ROWS = GRAD_ROWS

_INT32_MAX = jnp.iinfo(jnp.int32).max


def _cumsum_doubling_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative sum along the last axis via log2(n) shifted adds
    (full-bandwidth VPU passes; avoids XLA's serial cumsum lowering)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[..., :k]), x[..., :-k]], axis=-1)
        x = x + shifted
        k *= 2
    return x


def _cumsum_blocked_last(x: jnp.ndarray, block: int = 512) -> jnp.ndarray:
    """Two-level inclusive cumsum along the last axis: doubling within
    `block`-wide tiles (log2(block) full passes) plus a tiny scan over block
    totals — ~2x fewer full-bandwidth passes than flat doubling for
    megascale axes."""
    n = x.shape[-1]
    if n <= block:
        return _cumsum_doubling_last(x)
    pad = (-n) % block
    xp = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    nb = (n + pad) // block
    xb = xp.reshape(x.shape[:-1] + (nb, block))
    within = _cumsum_doubling_last(xb)
    totals = within[..., -1]
    # exclusive block offsets by SHIFT, not inclusive-minus-self: the kernel's
    # unwritten d_inst tail can hold NaN garbage, and NaN - NaN = NaN would
    # poison block 0 (clean prefixes must stay clean).
    inc = _cumsum_doubling_last(totals)
    offsets = jnp.concatenate(
        [jnp.zeros_like(inc[..., :1]), inc[..., :-1]], axis=-1)
    out = (within + offsets[..., None]).reshape(x.shape[:-1] + (n + pad,))
    return out[..., :n]


def max_dup_for(radius_max: float, tile_size: int) -> int:
    """Static bound on tiles one Gaussian can overlap (AABB of side
    2*radius+1 px, radius clamped by radius_max)."""
    per_axis = (2 * math.ceil(radius_max) + 1 + tile_size - 1) // tile_size + 1
    return per_axis * per_axis


def _tile_bounds(means2d, radius, H, W, tile_size, ext_x=None, ext_y=None):
    """Integer AABB -> inclusive tile bounds (reference renderer.py:279-293).
    int() in the reference truncates toward zero, not floor.  Optional
    `ext_x`/`ext_y` (projection's exact-cull half-extents) INTERSECT the
    reference box with the per-axis box |px - cx| <= ext: pixels outside it
    have w < W_EPS, which the reference's skip threshold zeroes exactly, so
    the output (forward and backward) is identical with fewer instances."""
    r = jnp.trunc(radius).astype(jnp.int32)
    cx = jnp.trunc(means2d[:, 0]).astype(jnp.int32)
    cy = jnp.trunc(means2d[:, 1]).astype(jnp.int32)
    x0 = cx - r
    x1 = cx + 1 + r
    y0 = cy - r
    y1 = cy + 1 + r
    if ext_x is not None:
        mx, my = means2d[:, 0], means2d[:, 1]
        x0 = jnp.maximum(x0, jnp.floor(mx - ext_x).astype(jnp.int32))
        x1 = jnp.minimum(x1, jnp.floor(mx + ext_x).astype(jnp.int32) + 1)
        y0 = jnp.maximum(y0, jnp.floor(my - ext_y).astype(jnp.int32))
        y1 = jnp.minimum(y1, jnp.floor(my + ext_y).astype(jnp.int32) + 1)
    x0 = jnp.clip(x0, 0, W)
    x1 = jnp.clip(x1, 0, W)
    y0 = jnp.clip(y0, 0, H)
    y1 = jnp.clip(y1, 0, H)
    degenerate = (x0 >= x1) | (y0 >= y1)
    tx0 = x0 // tile_size
    tx1 = (x1 - 1) // tile_size
    ty0 = y0 // tile_size
    ty1 = (y1 - 1) // tile_size
    return tx0, tx1, ty0, ty1, degenerate


def _per_axis_bound(radius_max, tile_size, max_dup_per_axis, tiles_x,
                    tiles_y) -> int:
    """Static per-axis duplication bound: from the projection radius clamp by
    default (exact for any scene), or the user's tighter `max_dup_per_axis`
    (candidate-grid and sort cost scale with its square; AABBs wider than
    the bound get clamped and the loss is counted in n_dropped)."""
    per_axis = (2 * math.ceil(radius_max) + 1 + tile_size - 1) // tile_size + 1
    if max_dup_per_axis > 0:
        per_axis = min(per_axis, max_dup_per_axis)
    return min(per_axis, max(tiles_x, tiles_y))


def _stream_len(max_instances: int, n_cand: int, chunk: int) -> int:
    """Static instance-stream length: min(capacity, candidates) rounded up
    to a whole number of raster-kernel chunks."""
    L = min(max_instances, n_cand)
    return ((L + chunk - 1) // chunk) * chunk


def _pad_to(x: jnp.ndarray, L: int, fill=_INT32_MAX) -> jnp.ndarray:
    """Slice or INT32_MAX-pad a sorted 1-D stream to static length L."""
    if x.shape[0] >= L:
        return x[:L]
    return jnp.concatenate(
        [x, jnp.full((L - x.shape[0],), fill, x.dtype)])


def _depth_order(proj: Projected, counts_gid: jnp.ndarray):
    """Global depth sort of the Gaussians (stable ranks).  `counts_gid`
    rides along as a payload operand — at [C] scale a sort payload is ~3x
    cheaper than a separate permutation gather (TPU scalar gathers read a
    ~4KB tile per element).  Returns (order, counts in rank space)."""
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    C = depth_key.shape[0]
    _, order, counts_rank = jax.lax.sort(
        (depth_key, jnp.arange(C, dtype=jnp.int32), counts_gid), num_keys=1)
    return order, counts_rank


def _inverse_permutation(order: jnp.ndarray, *payload):
    """Rank of each gaussian id — inverse of `order`, computed by a small
    sort (never a scatter; XLA scatters lower serially on TPU).  Extra
    rank-space `payload` operands come back permuted into gid space for
    the cost of ~nothing (see _depth_order)."""
    C = order.shape[0]
    outs = jax.lax.sort(
        (order.astype(jnp.int32), jnp.arange(C, dtype=jnp.int32)) + payload,
        num_keys=1)
    return outs[1:] if payload else outs[1]


def _segment_layout(proj, counts_gid):
    """Depth order + the rank-sorted stream's per-Gaussian segment layout:
    rank r's instances occupy rows [end[r]-counts[r], end[r]) of the
    rank-sorted stream, end = inclusive cumsum of rank-space counts (the
    pack backward's analytic segment boundaries).  Returns
    (order, inv_order, rank_counts, seg_start_gid)."""
    order, rank_counts = _depth_order(proj, counts_gid)
    end_rank = _cumsum_blocked_last(rank_counts)
    start_rank = end_rank - rank_counts
    inv_order, seg_start_gid = _inverse_permutation(order, start_rank)
    return order, inv_order, rank_counts, seg_start_gid


def _viewport_spans(proj, H, W, tile_size, per_axis, row0, col0,
                    full_height, full_width):
    """Viewport-local tile origins + per_axis-clamped tile spans.  AABBs are
    computed and clamped in GLOBAL coordinates (exactly like the unsharded
    reference, including the toward-zero int truncation) and only then
    converted to viewport tiles, so band-sharded rendering is bit-identical
    to single-device.  Returns (tx0, ty0, sx, sy, ok, lost): gaussian g
    emits tiles [tx0, tx0+sx) x [ty0, ty0+sy) (sx = sy = 0 when culled);
    `lost` counts instances clamped away by the per_axis bound."""
    fh = full_height if full_height is not None else H
    fw = full_width if full_width is not None else W
    row0 = jnp.asarray(row0, jnp.int32)
    col0 = jnp.asarray(col0, jnp.int32)
    tiles_x = -(-W // tile_size)
    tiles_y = -(-H // tile_size)

    gx0, gx1, gy0, gy1, degen = _tile_bounds(proj.means2d, proj.radius,
                                             fh, fw, tile_size, proj.ext_x,
                                             proj.ext_y)
    # global tile bounds -> viewport-local
    tx0 = gx0 - col0 // tile_size
    tx1 = gx1 - col0 // tile_size
    ty0 = gy0 - row0 // tile_size
    ty1 = gy1 - row0 // tile_size
    in_band = ((tx1 >= 0) & (tx0 <= tiles_x - 1)
               & (ty1 >= 0) & (ty0 <= tiles_y - 1))
    tx0 = jnp.clip(tx0, 0, tiles_x - 1)
    tx1 = jnp.clip(tx1, 0, tiles_x - 1)
    ty0 = jnp.clip(ty0, 0, tiles_y - 1)
    ty1 = jnp.clip(ty1, 0, tiles_y - 1)
    ok = proj.visible & ~degen & in_band

    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    sx = jnp.minimum(span_x, per_axis)
    sy = jnp.minimum(span_y, per_axis)
    lost = jnp.where(ok, span_x * span_y - sx * sy, 0)
    sx = jnp.where(ok, sx, 0)
    sy = jnp.where(ok, sy, 0)
    return tx0, ty0, sx, sy, ok, lost


# Reference cutoff in quadratic-form units: w = exp(-0.5 s) >= W_EPS (the
# skip threshold at raster_ref.W_EPS = 1e-5) iff s <= _SMAX.  A candidate
# tile whose MINIMUM s over the whole (margin-inflated) tile rect exceeds
# _SMAX contributes exactly zero to the reference output — every pixel is
# zeroed by the skip — so culling it is output- and gradient-identical.
_SMAX = 2.0 * math.log(1.0 / 1e-5)
# Rect inflation in pixels: absorbs f32 rounding differences between this
# test and the kernels' per-pixel quadratic form (same style as the
# projection exact-cull extents' +1 px margin).
_EXACT_MARGIN = 1.0


def _exact_tile_keep(tx, ty, ex, tile_size):
    """Exact ellipse-vs-tile test (conic metric).  tx/ty: candidate tile
    indices (viewport-local, broadcastable); ex = (mx, my, qa, qb, qc):
    viewport-relative pixel means + conic rows, broadcast against tx.
    Returns bool: True when the tile may contain a pixel with w >= W_EPS.

    min over the rect [x0,x1]x[y0,y1] (coords relative to the mean) of
    s(p) = qa x^2 + 2 qb x y + qc y^2: zero if the mean lies inside;
    otherwise the minimum lies on one of the four edges, where the 1-D
    quadratic minimizes at the clamped stationary point (qa,qc > 0 by the
    +1e-6 diagonal stabilizer in projection)."""
    mx, my, qa, qb, qc = ex
    # stationary-point slopes hoisted to ONE per-Gaussian reciprocal each
    # (a per-candidate divide costs ~10x a multiply on the VPU)
    byc = -qb / jnp.maximum(qc, 1e-12)
    bya = -qb / jnp.maximum(qa, 1e-12)
    x0 = tx * tile_size - _EXACT_MARGIN - mx
    x1 = tx * tile_size + (tile_size - 1) + _EXACT_MARGIN - mx
    y0 = ty * tile_size - _EXACT_MARGIN - my
    y1 = ty * tile_size + (tile_size - 1) + _EXACT_MARGIN - my
    inside = (x0 <= 0) & (0 <= x1) & (y0 <= 0) & (0 <= y1)

    def edge_x(ex_):
        ys = jnp.clip(byc * ex_, y0, y1)
        return qa * ex_ * ex_ + 2.0 * qb * ex_ * ys + qc * ys * ys

    def edge_y(ey_):
        xs = jnp.clip(bya * ey_, x0, x1)
        return qa * xs * xs + 2.0 * qb * ey_ * xs + qc * ey_ * ey_

    smin = jnp.minimum(jnp.minimum(edge_x(x0), edge_x(x1)),
                       jnp.minimum(edge_y(y0), edge_y(y1)))
    return inside | (smin <= _SMAX)


def _grid_counts(tx0, ty0, sx, sy, ex, per_axis, tile_size,
                 band_lo=None, band_hi=None):
    """Exact per-Gaussian emitted-candidate counts: enumerate the clamped
    [per_axis**2] tile grid and count slots passing the span window AND the
    exact ellipse test — must match the emission paths' validity bitwise
    (same formula, same f32 inputs).  Optional [band_lo, band_hi) tile-row
    window restricts to one image band (the gauss-sharded path).

    LAYOUT: all [dup, N] temporaries keep N on the LANE axis — a [N, 9]
    f32 array is physically lane-padded to [N, 128] (14x phantom bytes per
    temporary; measured +3 ms/step at the bench shape), while [9, N] only
    pads sublanes 9 -> 16."""
    MAX_DUP = per_axis * per_axis
    d = jnp.arange(MAX_DUP, dtype=jnp.int32)
    ddx = (d % per_axis)[:, None]
    ddy = (d // per_axis)[:, None]
    valid = (ddx < sx[None, :]) & (ddy < sy[None, :])
    tx = tx0[None, :] + ddx
    ty = ty0[None, :] + ddy
    if band_lo is not None:
        valid &= (ty >= band_lo) & (ty < band_hi)
    exb = tuple(e[None, :] for e in ex)
    valid &= _exact_tile_keep(tx, ty, exb, tile_size)
    return jnp.sum(valid, axis=0).astype(jnp.int32)


def _emit_grid(tx0, ty0, sx, sy, rank, C, tiles_x, per_axis,
               ex=None, tile_size=None):
    """Packed candidate keys [per_axis**2, N] (dup-major; lane-dense over
    N — see _grid_counts layout note): the row-major tile grid from each
    (tx0, ty0) with validity (ddx < sx) & (ddy < sy); key = tile * C +
    depth rank, invalid slots INT32_MAX.  Emission order is free (the key
    embeds the rank), so callers flatten in any order.  With `ex`
    (viewport-relative means + conic rows), candidates additionally pass
    the exact ellipse-vs-tile test (_exact_tile_keep)."""
    MAX_DUP = per_axis * per_axis
    d = jnp.arange(MAX_DUP, dtype=jnp.int32)
    ddx = (d % per_axis)[:, None]
    ddy = (d // per_axis)[:, None]
    tx = tx0[None, :] + ddx
    ty = ty0[None, :] + ddy
    tile = ty * tiles_x + tx
    valid = (ddx < sx[None, :]) & (ddy < sy[None, :])
    if ex is not None:
        valid &= _exact_tile_keep(tx, ty, tuple(e[None, :] for e in ex),
                                  tile_size)
    return jnp.where(valid, tile * C + rank[None, :], _INT32_MAX)


# Span bound of the "small" class in the two-level candidate emission.
_SMALL_SPAN = 2


def _emit_two_level(tx0, ty0, sx, sy, ok, rank, C_key, tiles_x, per_axis,
                    C_L, ex=None, tile_size=None, counts=None):
    """Two-level candidate emission (see bin_gaussians docstring): gaussians
    spanning <= _SMALL_SPAN per axis emit a [N,4] grid; the rest are
    compacted by one [N] sort into C_L slots emitting the full per_axis**2
    grid.  `C_key` is the key modulus (the GLOBAL capacity — ranks are
    global even when emitting a gid shard).  `ex`/`counts`: exact-cull
    attributes and the matching per-Gaussian emitted counts (defaults to
    the span product).  Returns (cand_flat [N*4 + C_L*per_axis**2],
    drop_large: instances of large gaussians beyond the C_L compaction
    capacity, n_large: count of gaussians classified large — the C_L
    occupancy the auto-sizer reads)."""
    N = tx0.shape[0]
    small = ok & (sx <= _SMALL_SPAN) & (sy <= _SMALL_SPAN)
    large = ok & ~small
    if counts is None:
        counts = sx * sy
    k_small = _emit_grid(tx0, ty0,
                         jnp.where(small, sx, 0),
                         jnp.where(small, sy, 0),
                         rank, C_key, tiles_x, _SMALL_SPAN,
                         ex=ex, tile_size=tile_size)
    # Compact the large gaussians to C_L slots with one [N] sort; their
    # per-gaussian data rides as two packed payload words (exact-cull
    # attrs are re-read by lane gather on the compacted gid instead of
    # riding as 5 more payload operands).
    iota = jnp.arange(N, dtype=jnp.int32)
    lkey = jnp.where(large, iota, _INT32_MAX)
    pos = tx0 + ty0 * 8192
    spn = sx + sy * 32
    skey, lpos, lspn, lrank = jax.lax.sort((lkey, pos, spn, rank),
                                           num_keys=1)
    lvalid = skey[:C_L] != _INT32_MAX
    lsx = jnp.where(lvalid, lspn[:C_L] % 32, 0)
    lsy = jnp.where(lvalid, lspn[:C_L] // 32, 0)
    ex_l = None
    if ex is not None:
        gid = jnp.clip(skey[:C_L], 0, N - 1)
        ex_l = tuple(jnp.take(e, gid) for e in ex)
    k_large = _emit_grid(lpos[:C_L] % 8192, lpos[:C_L] // 8192,
                         lsx, lsy, lrank[:C_L], C_key, tiles_x, per_axis,
                         ex=ex_l, tile_size=tile_size)
    emitted_large = jnp.sum((k_large != _INT32_MAX).astype(jnp.int32))
    drop_large = jnp.sum(jnp.where(large, counts, 0)) - emitted_large
    cand_flat = jnp.concatenate([k_small.reshape(-1), k_large.reshape(-1)])
    n_large = jnp.sum(large.astype(jnp.int32))
    return cand_flat, drop_large, n_large


def _emission_plan(C, per_axis, tiles_x, num_tiles, large_capacity):
    """Static two-level emission decision, shared by the replicated and the
    gauss-sharded paths (the sharded path emits a single grid but mirrors
    the stream length for shape parity with the replicated band call).
    Returns (two_level, C_L, n_cand): two-level is used only when the packed
    key fits, the pos/span payload packing fits (per_axis < 32, tiles_x <
    8192), and it actually shrinks the candidate total."""
    packed = (num_tiles + 1) * C < 2 ** 31
    C_L = large_capacity if large_capacity > 0 else max(C // 8, 256)
    C_L = min(-(-C_L // 128) * 128, C)
    S = _SMALL_SPAN
    MAX_DUP = per_axis * per_axis
    two_level = (packed and per_axis > S and per_axis < 32
                 and tiles_x < 8192
                 and C * S * S + C_L * MAX_DUP < C * MAX_DUP)
    n_cand = C * S * S + C_L * MAX_DUP if two_level else C * MAX_DUP
    return two_level, C_L, n_cand


def plan_two_level(C, H, W, tile_size, radius_max=50.0, max_dup_per_axis=0,
                   large_capacity=0):
    """Host-side view of the static two-level emission decision for a
    single-device [H, W] render: returns (two_level, C_L, n_cand) exactly
    as `bin_gaussians` will see them.  The trainer's auto large_capacity
    sizer uses this to know the EFFECTIVE pool size (large_capacity=0 means
    the C/8 default) and whether the pool exists at all (no pointless
    shrink/recompile cycles when emission is single-level)."""
    tiles_x = -(-W // tile_size)
    tiles_y = -(-H // tile_size)
    per_axis = _per_axis_bound(radius_max, tile_size, max_dup_per_axis,
                               tiles_x, tiles_y)
    return _emission_plan(C, per_axis, tiles_x, tiles_x * tiles_y,
                          large_capacity)


@partial(jax.jit, static_argnames=("H", "W", "tile_size", "max_instances",
                                   "chunk", "radius_max", "full_height",
                                   "full_width", "max_dup_per_axis",
                                   "large_capacity", "exact_cull"))
def bin_gaussians(proj: Projected, H: int, W: int, tile_size: int,
                  max_instances: int, chunk: int,
                  radius_max: float = 50.0,
                  row0=0, col0=0,
                  full_height: int = None, full_width: int = None,
                  max_dup_per_axis: int = 0,
                  large_capacity: int = 0,
                  exact_cull: bool = True) -> Binning:
    """Bin into the [H, W] viewport whose top-left pixel sits at (row0, col0)
    of a full_height x full_width image.  row0/col0 may be traced
    (lax.axis_index) values but must be tile_size multiples.

    TWO-LEVEL EMISSION: the candidate sort is the binning's dominant cost
    and its operand is the static grid, not the live instances.  Gaussians
    spanning <= 2x2 tiles (the vast majority at any healthy tile size) emit
    into a [C, 4] grid; the few larger ones are compacted by one cheap [C]
    sort into `large_capacity` slots (default C/8, drops counted) that emit
    the full [C_L, per_axis**2] grid — at the bench shape this shrinks the
    sorted key count ~5x versus the single [C, per_axis**2] grid.  Both
    grids produce the same packed (tile*C + rank) keys, and the final sort
    output is a multiset — identical to single-grid emission.

    EXACT CULL (`exact_cull=True`): candidate tiles whose minimum conic
    quadratic form over the (margin-inflated) tile rect exceeds the
    reference's own skip cutoff (w < W_EPS) are not emitted — output- and
    gradient-identical (the reference zeroes those pixels exactly), but
    anisotropic/rotated splats stop emitting corner tiles their AABB
    covers and their ellipse misses.  For isotropic splats whose AABB
    comes from the 3-sigma radius the test never fires (corner s <= 18 <
    _SMAX ~ 23), so it is a no-op on such scenes by construction."""
    C = proj.means2d.shape[0]
    tiles_x = -(-W // tile_size)
    tiles_y = -(-H // tile_size)
    num_tiles = tiles_x * tiles_y
    per_axis = _per_axis_bound(radius_max, tile_size, max_dup_per_axis,
                               tiles_x, tiles_y)
    MAX_DUP = per_axis * per_axis
    # Key packing: tile * C + depth_rank fits int32 for typical configs; for
    # very large capacity x tile products fall back to a two-operand
    # lexicographic sort (same ordering, ~2x sort cost).
    packed_key = (num_tiles + 1) * C < 2 ** 31
    two_level, C_L, n_cand = _emission_plan(C, per_axis, tiles_x, num_tiles,
                                            large_capacity)

    tx0, ty0, sx, sy, ok, lost = _viewport_spans(
        proj, H, W, tile_size, per_axis, row0, col0,
        full_height, full_width)
    ex = None
    if exact_cull:
        # viewport-relative pixel means: local_tile*ts - (mx - col0) is the
        # global rect offset from the global mean, so the keep test matches
        # the kernels' global pixel coordinates exactly.
        ex = (proj.means2d[:, 0] - jnp.float32(col0),
              proj.means2d[:, 1] - jnp.float32(row0),
              proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2])
        counts_gid = _grid_counts(tx0, ty0, sx, sy, ex, per_axis, tile_size)
    else:
        counts_gid = sx * sy
    order, inv_order, rank_counts, seg_start_gid = _segment_layout(
        proj, counts_gid)
    rank = inv_order                       # depth rank of each gaussian id

    # ---- candidate emission + one sort = compaction + (tile, rank) order --
    # The key embeds the depth rank, and rank indexes the depth-sorted
    # order, so the source Gaussian id is recoverable AFTER the sort
    # (gid = order[key % C]) — no payload operand: minimum sort bandwidth.
    drop_large = jnp.int32(0)
    n_large = jnp.int32(0)
    if two_level:
        cand_flat, drop_large, n_large = _emit_two_level(
            tx0, ty0, sx, sy, ok, rank, C, tiles_x, per_axis, C_L,
            ex=ex, tile_size=tile_size, counts=counts_gid)
    elif packed_key:
        cand_flat = _emit_grid(tx0, ty0, sx, sy, rank, C, tiles_x,
                               per_axis, ex=ex,
                               tile_size=tile_size).reshape(-1)

    # The stream length is min(capacity, #candidates) rounded up to a whole
    # number of kernel chunks (the raster op views it as [K//G, 16, G]).
    K = _stream_len(max_instances, n_cand, chunk)
    n_valid = counts_gid.sum() - drop_large
    n_dropped = jnp.maximum(n_valid - K, 0) + lost.sum() + drop_large
    if packed_key:
        s_key = _pad_to(jax.lax.sort(cand_flat), K)
        invalid = s_key == _INT32_MAX
        s_tile = jnp.where(invalid, num_tiles, s_key // C)
        s_rank = s_key % C
    else:
        # lexicographic (tile, rank) two-operand sort (lane-dense [dup, C]
        # layout — see _grid_counts)
        d = jnp.arange(MAX_DUP, dtype=jnp.int32)
        ddx = (d % per_axis)[:, None]
        ddy = (d // per_axis)[:, None]
        cand_valid = (ddx < sx[None, :]) & (ddy < sy[None, :])
        if ex is not None:
            cand_valid &= _exact_tile_keep(
                tx0[None, :] + ddx, ty0[None, :] + ddy,
                tuple(e[None, :] for e in ex), tile_size)
        cand_tile = (ty0[None, :] + ddy) * tiles_x + tx0[None, :] + ddx
        cand_t = jnp.where(cand_valid, cand_tile, _INT32_MAX)
        cand_r = jnp.broadcast_to(rank[None, :], (MAX_DUP, C))
        s_tile, s_rank = jax.lax.sort(
            (cand_t.reshape(-1), cand_r.reshape(-1)), num_keys=2)
        s_tile = _pad_to(s_tile, K)
        s_rank = _pad_to(s_rank, K, 0)
        invalid = s_tile == _INT32_MAX
        s_tile = jnp.where(invalid, num_tiles, s_tile)
    s_rank = jnp.where(invalid, 0, s_rank).astype(jnp.int32)

    return _layout(s_tile, s_rank, order, inv_order, rank_counts,
                   seg_start_gid, counts_gid, num_tiles, n_dropped,
                   n_dropped_large=drop_large, n_large=n_large)


def bin_gaussians_sharded(proj: Projected, H: int, W: int, tile_size: int,
                          max_instances: int, chunk: int, axis_name: str,
                          n_shards: int, radius_max: float = 50.0,
                          full_height: int = None, full_width: int = None,
                          max_dup_per_axis: int = 0,
                          large_capacity: int = 0,
                          route_capacity: int = None,
                          exact_cull: bool = True) -> Binning:
    """Gauss-sharded binning: the distributed (tile‖rank)-key sort over the
    mesh (SURVEY §2.5's sharded-sort obligation).  Must be called inside
    shard_map with `axis_name` of size `n_shards`; device i owns image band
    i (rows [i*H, (i+1)*H) of the full image) AND depth-rank shard i.

    Each device sorts only its 1/n of the candidate keys (global tile ids),
    slices the per-band segments of its sorted stream (bands are contiguous
    key ranges), routes them with ONE all_to_all over ICI, and merges the n
    received depth-ordered segments with a local sort.  Results are
    identical to the replicated `bin_gaussians` of the same band whenever
    nothing is dropped (tests enforce this); under per-pair route-capacity
    overflow drops are counted in n_dropped.

    The replicated path sorts C*MAX_DUP keys on EVERY device (an Amdahl
    floor as tile devices grow); here each device sorts C*MAX_DUP/n + ~2K.
    """
    C = proj.means2d.shape[0]
    assert C % n_shards == 0, "capacity must divide over the gauss shards"
    Cs = C // n_shards
    fh = full_height if full_height is not None else H * n_shards
    fw = full_width if full_width is not None else W
    assert fh == H * n_shards, "bands must tile the full image height"
    gtx = -(-fw // tile_size)
    gty = -(-fh // tile_size)
    num_tiles_band = (H // tile_size) * gtx
    total_tiles = gtx * gty
    per_axis = _per_axis_bound(radius_max, tile_size, max_dup_per_axis,
                               gtx, gty)
    MAX_DUP = per_axis * per_axis
    assert (total_tiles + 1) * C < 2 ** 31, (
        "sharded binning requires packed (tile*C + rank) int32 keys")
    K = max_instances
    G = chunk
    Q = route_capacity if route_capacity else max(2 * (K // n_shards), G)

    i = jax.lax.axis_index(axis_name)
    # Spans with GLOBAL tile ids (full-image viewport), in gid order
    # (the key embeds the rank, so any fixed partition of the candidate
    # set over devices works — device i emits and sorts gid shard i).
    tx0, ty0, sx, sy, ok, lost = _viewport_spans(
        proj, fh, fw, tile_size, per_axis, 0, 0, fh, fw)
    # band-restricted per-Gaussian counts (exact wrt the emitted set):
    # this device's stream only holds instances of its own image band,
    # i.e. tile rows [i*band_ty, (i+1)*band_ty) of each gaussian's grid
    band_ty = H // tile_size
    ex = None
    if exact_cull:
        ex = (proj.means2d[:, 0], proj.means2d[:, 1],
              proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2])
        counts_gid = _grid_counts(tx0, ty0, sx, sy, ex, per_axis, tile_size,
                                  band_lo=i * band_ty,
                                  band_hi=(i + 1) * band_ty)
    else:
        oy = (jnp.minimum(ty0 + sy, (i + 1) * band_ty)
              - jnp.maximum(ty0, i * band_ty))
        counts_gid = sx * jnp.clip(oy, 0, None)
    order, inv_order, rank_counts, seg_start_gid = _segment_layout(
        proj, counts_gid)
    rank = inv_order

    # ---- local candidate emission + sort of this device's gid shard ----
    # (two-level exactly like the replicated path, sized to the shard)
    two_level_l, C_L_l, _ = _emission_plan(Cs, per_axis, gtx, total_tiles,
                                           large_capacity)
    sl = lambda a: jax.lax.dynamic_slice(a, (i * Cs,), (Cs,))
    ex_sl = None if ex is None else tuple(sl(e) for e in ex)
    if two_level_l:
        # drop accounting needs the shard's FULL-image exact counts (the
        # band-restricted counts_gid only covers this device's band).
        counts_sl = None
        if ex is not None:
            counts_sl = _grid_counts(sl(tx0), sl(ty0), sl(sx), sl(sy),
                                     ex_sl, per_axis, tile_size)
        cand_flat, drop_large, n_large = _emit_two_level(
            sl(tx0), sl(ty0), sl(sx), sl(sy), sl(ok), sl(rank), C,
            gtx, per_axis, C_L_l, ex=ex_sl, tile_size=tile_size,
            counts=counts_sl)
        drop_large = jax.lax.psum(drop_large, axis_name)
        # gid-shard emission: each shard compacts its OWN larges into its
        # own C_L_l slots, so the sizing-relevant occupancy is the max
        # over shards, not the sum (all_gather of one int; lax.pmax of a
        # 0-d operand breaks inside shard_map on this jax version)
        n_large = jnp.max(jax.lax.all_gather(n_large, axis_name))
    else:
        cand_flat = _emit_grid(sl(tx0), sl(ty0), sl(sx), sl(sy), sl(rank),
                               C, gtx, per_axis, ex=ex_sl,
                               tile_size=tile_size).reshape(-1)
        drop_large = jnp.int32(0)
        n_large = jnp.int32(0)
    s_local = jax.lax.sort(cand_flat)

    # ---- per-band segments (bands are contiguous global-tile-id ranges) --
    bkeys = (jnp.arange(n_shards + 1, dtype=jnp.int32)
             * (num_tiles_band * C))
    bounds = jnp.searchsorted(s_local, bkeys, side="left").astype(jnp.int32)
    pad = jnp.full((Q,), _INT32_MAX, jnp.int32)
    s_pad = jnp.concatenate([s_local, pad])
    segs = []
    drops = []
    for b in range(n_shards):
        seg = jax.lax.dynamic_slice(s_pad, (bounds[b],), (Q,))
        idx = bounds[b] + jnp.arange(Q, dtype=jnp.int32)
        segs.append(jnp.where(idx < bounds[b + 1], seg, _INT32_MAX))
        drops.append(jnp.maximum(bounds[b + 1] - bounds[b] - Q, 0))
    send = jnp.stack(segs)                              # [n, Q]
    send_drops = jnp.stack(drops)                       # [n]

    # ---- ONE all_to_all over ICI routes every band's instances home ----
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0, concat_axis=0,
                              tiled=True)               # [n, Q]
    route_drops = jnp.sum(jax.lax.all_to_all(
        send_drops, axis_name, split_axis=0, concat_axis=0, tiled=True))

    # ---- merge the n sorted segments (single local sort of n*Q keys) ----
    merged = jax.lax.sort(recv.reshape(-1))
    # same static length as the replicated band call: min(K, the two-level
    # plan's candidate total), rounded up to whole kernel chunks — shape
    # parity with bin_gaussians of one band (assuming the band call derives
    # the same per_axis, as always when the per-axis bound binds)
    _, _, n_cand = _emission_plan(C, per_axis, gtx, num_tiles_band,
                                  large_capacity)
    L = _stream_len(K, n_cand, G)
    s_key = _pad_to(merged, L)
    invalid = s_key == _INT32_MAX
    s_tile = jnp.where(invalid, num_tiles_band,
                       s_key // C - i * num_tiles_band)
    s_rank = jnp.where(invalid, 0, s_key % C).astype(jnp.int32)

    n_valid_band = rank_counts.sum()
    n_dropped = (jnp.maximum(n_valid_band - L, 0) + route_drops
                 + lost.sum() + drop_large)

    return _layout(s_tile, s_rank, order, inv_order, rank_counts,
                   seg_start_gid, counts_gid, num_tiles_band, n_dropped,
                   n_dropped_large=drop_large, n_large=n_large)


class RingBinning(NamedTuple):
    """Origin-side binning for the ring-exchange raster (parallel/ring.py).

    The calling device owns depth-rank range [i*C/n, (i+1)*C/n) and emits,
    sorts, and lays out ONLY that range's instances — for every image band.
    The stream is the concatenation of n_bands fixed-capacity segments
    (each `seg_capacity` rows, chunk-aligned, live prefix); segment b holds
    band b's instances of this rank range in (tile, rank) order, ready to be
    routed to band owners and composited strictly behind ranges < i."""

    flat_rank: jnp.ndarray     # [n_bands * Q] depth rank per slot (dead: 0)
    live: jnp.ndarray          # [n_bands * Q] bool
    rank_perm: jnp.ndarray     # [n_bands * Q] rank-sorted stream permutation
    rank_key: jnp.ndarray      # [n_bands * Q] sorted keys (dead tail = C)
    order: jnp.ndarray         # [C] gaussian id at each depth rank
    seg_start_gid: jnp.ndarray  # [C] rank-sorted segment start per gid
    counts_gid: jnp.ndarray    # [C] instances emitted per gid (this range)
    n_live: jnp.ndarray        # scalar: live slots across all segments
    tile_start: jnp.ndarray    # [n_bands, T_band] segment-local tile starts
    tile_count: jnp.ndarray    # [n_bands, T_band]
    n_dropped: jnp.ndarray     # capacity-overflow instances (this origin)


def bin_gaussians_ring_origin(proj: Projected, full_h: int, full_w: int,
                              tile_size: int, seg_capacity: int, chunk: int,
                              axis_name: str, n_shards: int,
                              radius_max: float = 50.0,
                              max_dup_per_axis: int = 0,
                              large_capacity: int = 0,
                              exact_cull: bool = True) -> RingBinning:
    """Ring-exchange origin binning (SURVEY §2.5's ring-attention analog).

    Must run inside shard_map with `axis_name` of size `n_shards`; device i
    is both image-band owner i AND depth-rank-range owner i.  Unlike
    `bin_gaussians_sharded` (gid-shard emission + one all_to_all home
    routing), instances here are partitioned by DEPTH-RANK RANGE, the only
    partition under which a receiving band can composite exchange-step by
    exchange-step: front-to-back "over" is associative but not commutative,
    and rank range r is strictly behind ranges < r everywhere.  Each origin
    sorts only its range's candidates (keys identical to the replicated
    path: tile*C + rank over GLOBAL tiles), so the union over origins of
    segment b is exactly the replicated band stream as a multiset; the ring
    consumer composites them in ascending-range order with transmittance
    carried (kernel t0 chaining), reproducing single-pass output up to f32
    chunk-boundary association.

    `seg_capacity` rows per (band, range) segment (chunk-aligned, static);
    overflow is counted in n_dropped (drops never rendered => approximate
    gradients, same caveat as pack_instances under overflow)."""
    C = proj.means2d.shape[0]
    assert C % n_shards == 0, "capacity must divide over the ring devices"
    Cs = C // n_shards
    gtx = -(-full_w // tile_size)
    gty = -(-full_h // tile_size)
    total_tiles = gtx * gty
    assert gty % n_shards == 0, "tile rows must divide into bands"
    band_ty = gty // n_shards
    ntb = band_ty * gtx                       # tiles per band
    per_axis = _per_axis_bound(radius_max, tile_size, max_dup_per_axis,
                               gtx, gty)
    assert (total_tiles + 1) * C < 2 ** 31, (
        "ring binning requires packed (tile*C + rank) int32 keys")
    G = chunk
    Q = ((seg_capacity + G - 1) // G) * G

    i = jax.lax.axis_index(axis_name)
    tx0, ty0, sx, sy, ok, lost = _viewport_spans(
        proj, full_h, full_w, tile_size, per_axis, 0, 0, full_h, full_w)
    ex = None
    if exact_cull:
        ex = (proj.means2d[:, 0], proj.means2d[:, 1],
              proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2])
        counts_all = _grid_counts(tx0, ty0, sx, sy, ex, per_axis, tile_size)
    else:
        counts_all = sx * sy
    # Depth ranks over the FULL set (replicated [C] sorts), then restrict
    # everything to this device's rank range: the stream must contain
    # exactly the instances of ranks [i*Cs, (i+1)*Cs).
    order0, rank_counts0 = _depth_order(proj, counts_all)
    rank = _inverse_permutation(order0)
    in_range = (rank >= i * Cs) & (rank < (i + 1) * Cs)
    counts_gid = jnp.where(in_range, counts_all, 0)
    order, inv_order, rank_counts, seg_start_gid = _segment_layout(
        proj, counts_gid)
    ok = ok & in_range
    lost = jnp.where(in_range, lost, 0)

    # ---- emission + local sort of this range's candidates ----
    two_level, C_L, n_cand = _emission_plan(C, per_axis, gtx, total_tiles,
                                            large_capacity)
    if two_level:
        cand_flat, drop_large, _ = _emit_two_level(
            tx0, ty0, sx, sy, ok, rank, C, gtx, per_axis, C_L,
            ex=ex, tile_size=tile_size, counts=counts_gid)
    else:
        cand_flat = _emit_grid(tx0, ty0, jnp.where(ok, sx, 0),
                               jnp.where(ok, sy, 0), rank, C, gtx,
                               per_axis, ex=ex,
                               tile_size=tile_size).reshape(-1)
        drop_large = jnp.int32(0)
    s_local = jax.lax.sort(cand_flat)

    # ---- fixed-capacity per-band segments (contiguous key ranges) ----
    bkeys = (jnp.arange(n_shards + 1, dtype=jnp.int32) * (ntb * C))
    bounds = jnp.searchsorted(s_local, bkeys, side="left").astype(jnp.int32)
    pad = jnp.full((Q,), _INT32_MAX, jnp.int32)
    s_pad = jnp.concatenate([s_local, pad])
    segs, drops, starts, counts_t = [], [], [], []
    tid_hi = jnp.arange(1, ntb + 1, dtype=jnp.int32)
    for b in range(n_shards):
        seg = jax.lax.dynamic_slice(s_pad, (bounds[b],), (Q,))
        idx = bounds[b] + jnp.arange(Q, dtype=jnp.int32)
        seg = jnp.where(idx < bounds[b + 1], seg, _INT32_MAX)
        segs.append(seg)
        drops.append(jnp.maximum(bounds[b + 1] - bounds[b] - Q, 0))
        # segment-local tile ranges from global-key boundaries
        end = jnp.searchsorted(
            seg, (b * ntb + tid_hi) * C, side="left").astype(jnp.int32)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), end[:-1]])
        starts.append(start)
        counts_t.append(end - start)
    seg_keys = jnp.stack(segs)                     # [n, Q]
    live = seg_keys != _INT32_MAX
    flat_rank = jnp.where(live, seg_keys % C, 0).astype(jnp.int32)
    live_flat = live.reshape(-1)
    fr = flat_rank.reshape(-1)

    # rank-sorted permutation of the flat stream for the pack backward
    # (_pack_bwd): dead slots key C -> back; stable sort keeps runs intact.
    K = fr.shape[0]
    iota = jnp.arange(K, dtype=jnp.int32)
    rank_key, rank_perm = jax.lax.sort(
        (jnp.where(live_flat, fr, C), iota), num_keys=1)

    n_live = live_flat.sum().astype(jnp.int32)
    n_dropped = (jnp.stack(drops).sum() + lost.sum() + drop_large)
    return RingBinning(flat_rank=fr, live=live_flat, rank_perm=rank_perm,
                       rank_key=rank_key, order=order.astype(jnp.int32),
                       seg_start_gid=seg_start_gid, counts_gid=counts_gid,
                       n_live=n_live,
                       tile_start=jnp.stack(starts),
                       tile_count=jnp.stack(counts_t),
                       n_dropped=n_dropped)


# ---------------------------------------------------------------------------
# Ring v2: rank-resharded origin (parallel/ring.py `reshard=True`).
#
# v1 keeps the full [C] projected set on every device and each origin merely
# RESTRICTS emission to its depth-rank range — all per-Gaussian stages stay
# O(C).  v2 first routes each projected row to its rank-range owner with one
# all_to_all (fixed [n, C/n] send layout: slot d carries the rows whose rank
# lands in range d, masked elsewhere), then compacts the received slots by a
# rank sort — after which local row j IS global rank rank_base + j, so the
# origin's emission grids, candidate sort, and pack all run on C/n rows.
# The compaction gather's transpose would be a serial TPU scatter, so it is
# a custom-VJP row gather whose backward is ANOTHER row gather by the
# inverse permutation (positions < Cs read the cotangent, the rest read a
# zero pad row) — scatter-free both ways.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(3,))
def _take_rows(mat, idx, pos, m):
    """mat[idx[:m]] ([S, R] -> [m, R] row gather) with a scatter-free VJP.
    `pos` must be the inverse permutation of `idx` (pos[s] = position of
    slot s in the sorted order); rows whose pos >= m get zero cotangent."""
    return jnp.take(mat, idx[:m], axis=0)


def _take_rows_fwd(mat, idx, pos, m):
    return jnp.take(mat, idx[:m], axis=0), (pos,)


def _take_rows_bwd(m, res, g):
    (pos,) = res
    gp = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    sidx = jnp.where(pos < m, pos, m)          # >= m -> the zero pad row
    d_mat = jnp.take(gp, sidx, axis=0)
    f0 = lambda shape: np.zeros(shape, jax_dtypes.float0)
    return (d_mat, f0(pos.shape), f0(pos.shape))


_take_rows.defvjp(_take_rows_fwd, _take_rows_bwd)


def rank_reshard_rows(mat: jnp.ndarray, rank_local: jnp.ndarray,
                      axis_name: str, n_shards: int) -> jnp.ndarray:
    """Route gid-sharded rows to their depth-rank-range owners.

    `mat` [Cs, R]: this device's gid-contiguous rows (global gids
    [i*Cs, (i+1)*Cs)); `rank_local` [Cs]: each row's GLOBAL depth rank.
    Returns [Cs, R]: the rows of ranks [i*Cs, (i+1)*Cs) in rank order
    (local row j = global rank i*Cs + j).  Differentiable w.r.t. `mat`:
    the masked-select and all_to_all transpose route cotangents back to
    gid owners; the compaction is `_take_rows` (scatter-free VJP)."""
    Cs, R = mat.shape
    dest = rank_local // Cs                     # rank-range owner per row
    lanes = jnp.arange(n_shards, dtype=jnp.int32)
    dsel = dest[None, :] == lanes[:, None]      # [n, Cs]
    send = jnp.where(dsel[:, :, None], mat[None], 0.0)
    skey = jnp.where(dsel, rank_local[None, :], _INT32_MAX)
    recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    rkey = jax.lax.all_to_all(skey, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    recv = recv.reshape(n_shards * Cs, R)
    rkey = rkey.reshape(-1)
    # exactly Cs slots carry a key (< INT32_MAX): my range's ranks, each
    # once (ranks are a permutation) — the stable sort fronts them ascending
    idx = jax.lax.sort(
        (rkey, jnp.arange(n_shards * Cs, dtype=jnp.int32)), num_keys=1)[1]
    pos = _inverse_permutation(idx)
    return _take_rows(recv, idx, pos, Cs)


def rank_reshard_rows_compact(mat: jnp.ndarray, rank_local: jnp.ndarray,
                              axis_name: str, n_shards: int, cap: int):
    """`rank_reshard_rows` with an O(cap * n) send buffer (VERDICT r3
    missing #3 / ADVICE r3: the dense [n, Cs, R] masked send buffer is
    C*R floats per device — O(C) activation memory defeating the C/n goal).

    Local rows are bucket-compacted by destination first (dest ranges are
    CONTIGUOUS rank ranges, so one [Cs] sort by rank groups them), then each
    destination gets a fixed `cap`-row window of the sorted matrix.  Bucket
    overflow beyond `cap` is dropped and counted (rows, not instances).
    Returns (rows [Cs, R] of MY rank range in rank order — missing ranks
    hold zero rows, so `visible` is False and they emit nothing — and the
    local dropped-row count; psum over the axis for the global total).

    Reassembly is scatter-free: received keys are unique ranks of my range;
    a sentinel row per target position rides one (key, payload) sort so
    every position has >= 1 entry, run starts select the real slot when
    present (real payloads sort before the sentinel), and one more stable
    binary-key sort compacts the Cs selectors to the front in rank order.

    Per-device memory: [Cs, R] in/out + 2x [n*cap, R] buffers + [C]-free.
    With cap ~ f * Cs/n (f = overflow headroom over the uniform mean) the
    buffers are ~2f/n of the dense variant's C*R."""
    Cs, R = mat.shape
    i = jax.lax.axis_index(axis_name)
    base = i * Cs

    # ---- bucket-compact by destination (= contiguous rank ranges) ----
    srank, perm = jax.lax.sort(
        (rank_local, jnp.arange(Cs, dtype=jnp.int32)), num_keys=1)
    smat = _take_rows(mat, perm, _inverse_permutation(perm), Cs)
    bkeys = jnp.arange(n_shards + 1, dtype=jnp.int32) * Cs
    bounds = jnp.searchsorted(srank, bkeys, side="left").astype(jnp.int32)
    smat_pad = jnp.concatenate([smat, jnp.zeros((cap, R), mat.dtype)])
    srank_pad = jnp.concatenate(
        [srank, jnp.full((cap,), _INT32_MAX, jnp.int32)])
    rows_d, keys_d, drops = [], [], []
    ar = jnp.arange(cap, dtype=jnp.int32)
    for d in range(n_shards):
        rows_d.append(jax.lax.dynamic_slice(
            smat_pad, (bounds[d], 0), (cap, R)))
        k = jax.lax.dynamic_slice(srank_pad, (bounds[d],), (cap,))
        keys_d.append(jnp.where(bounds[d] + ar < bounds[d + 1], k,
                                _INT32_MAX))
        drops.append(jnp.maximum(bounds[d + 1] - bounds[d] - cap, 0))
    send = jnp.stack(rows_d)                        # [n, cap, R]
    skeys = jnp.stack(keys_d)                       # [n, cap]
    n_drop = jnp.stack(drops).sum()

    recv = jax.lax.all_to_all(send, axis_name, split_axis=0,
                              concat_axis=0, tiled=True)
    rkey = jax.lax.all_to_all(skeys, axis_name, split_axis=0,
                              concat_axis=0, tiled=True).reshape(-1)
    S = n_shards * cap
    recv = recv.reshape(S, R)

    # ---- scatter-free placement at exact rank rows ----
    live = rkey != _INT32_MAX                     # all live keys in my range
    key_all = jnp.concatenate(
        [jnp.where(live, rkey - base, 2 * Cs),
         jnp.arange(Cs, dtype=jnp.int32)])        # sentinel per position
    pay_all = jnp.concatenate(
        [jnp.arange(S, dtype=jnp.int32), jnp.full((Cs,), S, jnp.int32)])
    k1, p1 = jax.lax.sort((key_all, pay_all), num_keys=2)
    runstart = jnp.concatenate(
        [jnp.ones((1,), bool), k1[1:] != k1[:-1]])
    ck = jnp.where(runstart & (k1 < Cs), 0, 1).astype(jnp.int32)
    _, sel = jax.lax.sort((ck, p1), num_keys=1)   # stable: rank order kept
    sel = jnp.minimum(sel[:Cs], S)                # missing -> zero pad row
    mat_pad = jnp.concatenate([recv, jnp.zeros((1, R), mat.dtype)])
    pos = jnp.concatenate(
        [jnp.where(live, rkey - base, Cs), jnp.full((1,), Cs, jnp.int32)])
    return _take_rows(mat_pad, sel, pos, Cs), n_drop


def distributed_ranks(depth_local: jnp.ndarray, visible: jnp.ndarray,
                      axis_name: str, n_shards: int) -> jnp.ndarray:
    """Global depth ranks of this device's gid block with O(C/n) per-device
    memory — no array with leading dim C anywhere (VERDICT r4 next #3: the
    last O(C) term in ring v3 was the replicated depth-key gather + two [C]
    rank sorts).

    Semantics match the replicated computation exactly for VISIBLE rows:
    rank = position in the global stable sort of (visible ? depth : +inf)
    keyed ties broken by ascending global gid (the stable sort's iota
    payload).  INVISIBLE rows return _INT32_MAX instead of their
    back-of-order ranks, which (a) costs nothing — they emit no instances —
    and (b) keeps them out of the rank reshard's buckets entirely, so a
    high-cull device can no longer false-alarm the n_dropped==0 invariant
    by flooding 1-2 back-of-order buckets with dead rows (ADVICE r4 medium).

    Algorithm (exact sample-free counting ranks): each device sorts its Cs
    local keys once; the sorted [Cs] blocks rotate around the ring (n-1
    ppermute hops — same total bytes as an all_gather, but peak memory one
    block).  A row's global rank = its local stable-sort position (gid
    tie-break within the block is the iota payload) + per-remote-block
    searchsorted counts: side='left' (< only) for blocks of HIGHER gid
    ranges, side='right' (<=, i.e. ties too) for LOWER gid ranges — ties
    across devices break by gid because gid ranges are device-contiguous.
    Ranking is routing metadata, not a differentiable quantity: keys are
    stop_gradient'ed so the hops add no backward collectives."""
    Cs = depth_local.shape[0]
    i = jax.lax.axis_index(axis_name)
    key = jax.lax.stop_gradient(
        jnp.where(visible, depth_local, jnp.inf).astype(jnp.float32))
    _, perm = jax.lax.sort(
        (key, jnp.arange(Cs, dtype=jnp.int32)), num_keys=1)
    total = _inverse_permutation(perm)             # my own block's counts
    blk = jax.lax.sort(key)
    ring = [(j, (j - 1) % n_shards) for j in range(n_shards)]
    for s in range(1, n_shards):
        blk = jax.lax.ppermute(blk, axis_name, ring)
        d = (i + s) % n_shards                     # origin of blk
        lt = jnp.searchsorted(blk, key, side="left", method="sort")
        le = jnp.searchsorted(blk, key, side="right", method="sort")
        total = total + jnp.where(d < i, le, lt).astype(jnp.int32)
    return jnp.where(visible, total, _INT32_MAX)


def bin_gaussians_ring_origin_resharded(
        proj_local: Projected, rank_base: jnp.ndarray, C: int,
        full_h: int, full_w: int, tile_size: int, seg_capacity: int,
        chunk: int, n_shards: int, radius_max: float = 50.0,
        max_dup_per_axis: int = 0, large_capacity: int = 0,
        exact_cull: bool = True) -> RingBinning:
    """Origin binning on RANK-LOCAL rows (ring v2): `proj_local` holds the
    Cs = C/n rows of global ranks [rank_base, rank_base + Cs) in rank order
    (from `rank_reshard_rows`).  Emits the identical candidate multiset and
    keys as `bin_gaussians_ring_origin` restricted to this range — key =
    tile * C + GLOBAL rank — so segments, and therefore ring output, are
    bit-identical to v1 whenever nothing overflows (the large-splat budget
    is sized from v1's full-capacity plan below, so drop behavior matches
    too unless the two paths make different two-level decisions while
    overflowing); only the per-Gaussian working set shrinks to Cs.

    Returned gid-space fields (`seg_start_gid`, `counts_gid`, `order`) and
    the stream's `flat_rank` are in LOCAL row space (rank - rank_base), the
    coordinate system of the caller's [Cs, 16] attrs; dead-slot sentinel in
    `rank_key` is Cs accordingly."""
    Cs = proj_local.means2d.shape[0]
    gtx = -(-full_w // tile_size)
    gty = -(-full_h // tile_size)
    total_tiles = gtx * gty
    assert gty % n_shards == 0, "tile rows must divide into bands"
    band_ty = gty // n_shards
    ntb = band_ty * gtx
    per_axis = _per_axis_bound(radius_max, tile_size, max_dup_per_axis,
                               gtx, gty)
    assert (total_tiles + 1) * C < 2 ** 31, (
        "ring binning requires packed (tile*C + rank) int32 keys")
    G = chunk
    Q = ((seg_capacity + G - 1) // G) * G

    tx0, ty0, sx, sy, ok, lost = _viewport_spans(
        proj_local, full_h, full_w, tile_size, per_axis, 0, 0,
        full_h, full_w)
    ex = None
    if exact_cull:
        ex = (proj_local.means2d[:, 0], proj_local.means2d[:, 1],
              proj_local.conic[:, 0], proj_local.conic[:, 1],
              proj_local.conic[:, 2])
        counts = _grid_counts(tx0, ty0, sx, sy, ex, per_axis, tile_size)
    else:
        counts = sx * sy
    rank_arr = rank_base + jnp.arange(Cs, dtype=jnp.int32)

    # Size the large-splat pool from v1's FULL-capacity plan, not from Cs
    # (ADVICE r3: a per-Cs default max(Cs//8, 256) gave v2 a smaller budget
    # than v1's per-origin max(C//8, 256), so overflowing rank ranges
    # dropped instances v1 kept).  With the budget matched, segments are
    # bit-identical to v1 whenever both paths make the same two-level
    # decision (always when nothing drops: single-grid and two-level emit
    # the same multiset below capacity).
    _, C_L_v1, _ = _emission_plan(C, per_axis, gtx, total_tiles,
                                  large_capacity)
    two_level, C_L, n_cand = _emission_plan(Cs, per_axis, gtx, total_tiles,
                                            C_L_v1)
    if two_level:
        cand_flat, drop_large, _ = _emit_two_level(
            tx0, ty0, sx, sy, ok, rank_arr, C, gtx, per_axis, C_L,
            ex=ex, tile_size=tile_size, counts=counts)
    else:
        cand_flat = _emit_grid(tx0, ty0, jnp.where(ok, sx, 0),
                               jnp.where(ok, sy, 0), rank_arr, C, gtx,
                               per_axis, ex=ex,
                               tile_size=tile_size).reshape(-1)
        drop_large = jnp.int32(0)
    s_local = jax.lax.sort(cand_flat)

    # ---- fixed-capacity per-band segments (identical to v1) ----
    bkeys = (jnp.arange(n_shards + 1, dtype=jnp.int32) * (ntb * C))
    bounds = jnp.searchsorted(s_local, bkeys, side="left").astype(jnp.int32)
    pad = jnp.full((Q,), _INT32_MAX, jnp.int32)
    s_pad = jnp.concatenate([s_local, pad])
    segs, drops, starts, counts_t = [], [], [], []
    tid_hi = jnp.arange(1, ntb + 1, dtype=jnp.int32)
    for b in range(n_shards):
        seg = jax.lax.dynamic_slice(s_pad, (bounds[b],), (Q,))
        idx = bounds[b] + jnp.arange(Q, dtype=jnp.int32)
        seg = jnp.where(idx < bounds[b + 1], seg, _INT32_MAX)
        segs.append(seg)
        drops.append(jnp.maximum(bounds[b + 1] - bounds[b] - Q, 0))
        end = jnp.searchsorted(
            seg, (b * ntb + tid_hi) * C, side="left").astype(jnp.int32)
        start = jnp.concatenate([jnp.zeros((1,), jnp.int32), end[:-1]])
        starts.append(start)
        counts_t.append(end - start)
    seg_keys = jnp.stack(segs)
    live = seg_keys != _INT32_MAX
    # LOCAL attr-row index per live slot (global rank - rank_base)
    flat_rank = jnp.where(live, seg_keys % C - rank_base, 0).astype(jnp.int32)
    live_flat = live.reshape(-1)
    fr = flat_rank.reshape(-1)

    K = fr.shape[0]
    iota = jnp.arange(K, dtype=jnp.int32)
    rank_key, rank_perm = jax.lax.sort(
        (jnp.where(live_flat, fr, Cs), iota), num_keys=1)

    # local rows ARE rank-ordered, so the rank-sorted stream's per-row
    # segment starts are the exclusive cumsum of local counts
    end_rank = _cumsum_blocked_last(counts)
    seg_start_local = end_rank - counts
    order_local = jnp.arange(Cs, dtype=jnp.int32)

    n_live = live_flat.sum().astype(jnp.int32)
    n_dropped = (jnp.stack(drops).sum() + lost.sum() + drop_large)
    return RingBinning(flat_rank=fr, live=live_flat, rank_perm=rank_perm,
                       rank_key=rank_key, order=order_local,
                       seg_start_gid=seg_start_local, counts_gid=counts,
                       n_live=n_live,
                       tile_start=jnp.stack(starts),
                       tile_count=jnp.stack(counts_t),
                       n_dropped=n_dropped)


def _layout(s_tile, s_rank, order, inv_order, rank_counts, seg_start_gid,
            counts_gid, num_tiles, n_dropped, n_dropped_large=0,
            n_large=0) -> Binning:
    """Per-tile ranges of the sorted (tile, rank) compact instance stream.
    Shared by the replicated and the gauss-sharded binning paths.  Invalid
    (INT32_MAX-key) slots carry tile sentinel `num_tiles` and sort to the
    contiguous tail, so end[last] == n_live."""
    # method="scan" (binary search): 2500 queries x ~21 rounds of scalar
    # gathers is ~0.3 ms on chip; method="sort" re-sorts keys+queries and
    # measured 20x slower at this query count.
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    end = jnp.searchsorted(s_tile, tids, side="right").astype(jnp.int32)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), end[:-1]])
    count = end - start
    n_live = end[num_tiles - 1]

    # Rank-sorted stream permutation for the pack backward (see Binning).
    # Dead tail rows get sentinel key C so they group at the back, exactly
    # like the former in-backward sort; lax.sort is stable, preserving
    # stream order within a rank.
    K = s_rank.shape[0]
    C = order.shape[0]
    iota = jnp.arange(K, dtype=jnp.int32)
    key = jnp.where(iota < n_live, s_rank, C)
    rank_key, rank_perm = jax.lax.sort((key, iota), num_keys=1)

    return Binning(s_rank=s_rank, order=order.astype(jnp.int32),
                   inv_order=inv_order, rank_counts=rank_counts,
                   seg_start_gid=seg_start_gid, counts_gid=counts_gid,
                   tile_start=start, tile_count=count, n_live=n_live,
                   n_dropped=n_dropped,
                   n_dropped_large=jnp.asarray(n_dropped_large, jnp.int32),
                   n_large=jnp.asarray(n_large, jnp.int32),
                   rank_perm=rank_perm,
                   rank_key=rank_key)


# ---------------------------------------------------------------------------
# Instance packing with a scatter-free hand-written VJP, in depth-rank space.
#
# Forward: attrs are re-sorted once into depth order and compacted by
# `s_rank`, both as LANE gathers on a [16, *] layout, then relaid out as the
# raster kernels' chunked [K//G, 16, G] stream.  There is no padded
# expansion: tile starts are unaligned in the compact stream and the kernels
# mask boundary-chunk lanes (a TPU [N,16] f32 array is physically lane-padded
# to [N,128], so the old run-structured padded ROW gather moved ~700MB for
# 64MB of payload; lane gathers run at full bandwidth).
#
# Backward: XLA's automatic transpose of a gather is a scatter-add, which
# lowers to a SERIAL loop on TPU, hence hand-written — and GATHER-FREE on
# the megascale axis: a [K,16] row gather reads a ~4KB tile per row (~6.6ms
# at K=2^20 measured), while payload operands on an XLA TPU sort are far
# cheaper than gathers (though not free: sort cost grows with operand
# count, so only the GRAD_ROWS differentiable rows ride).  The gradient
# rows go through ONE (rank-key + GRAD_ROWS payload) sort as lane-dense
# [K] vectors;
# each rank's contributions are then contiguous runs of length <= max_seg
# (the candidate-duplication bound), segment-summed by ceil(log2(max_seg))
# masked Hillis-Steele passes, and read out at the analytically-known
# segment starts (cumsum of rank counts, carried into gid space as sort
# payload at binning time) with one [16,K] lane-gather — no transposes, no
# full-length prefix scan, no prefix-difference cancellation.
# Boundaries are exact whenever n_dropped == 0; under capacity overflow the
# dropped instances never rendered (zero true gradient) but the segment
# boundaries shift, so gradients of overflowing scenes are approximate —
# size max_instances to the scene (Binning.n_dropped is observable).
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def pack_instances(attrs: jnp.ndarray, s_rank: jnp.ndarray,
                   rank_perm: jnp.ndarray, rank_key: jnp.ndarray,
                   seg_start_gid: jnp.ndarray, counts_gid: jnp.ndarray,
                   order: jnp.ndarray, n_live: jnp.ndarray,
                   chunk: int, max_seg: int) -> jnp.ndarray:
    """attrs [C, R] per-Gaussian attributes (R = STREAM_ROWS data rows, or
    the legacy 16-row layout) -> inst [K//chunk, R, chunk] (the raster
    kernels' chunk-major stream).  `max_seg` is the static per-Gaussian
    duplication bound (binning per_axis**2); rank_perm/rank_key are
    Binning's precomputed rank-sorted stream permutation (the backward's
    sort, hoisted to binning time)."""
    return _pack_run(attrs, s_rank, order, chunk)


def _pack_run(attrs, s_rank, order, G):
    K = s_rank.shape[0]
    R = attrs.shape[1]
    # All gathers LANE-DENSE along a [R, *] layout: a [K,R] row gather
    # reads a ~4KB lane-padded tile per row, while lane gathers run at
    # full bandwidth; this also deletes the [K,R] -> [R,K] transpose.
    tab = jnp.take(attrs.T, order, axis=1)         # [R, C] depth order
    compact = jnp.take(tab, s_rank, axis=1)        # [R, K]
    # kernels index instances as [n_chunks, R, G]: the dynamically-indexed
    # chunk dim must be the major (untiled) one for Mosaic
    return compact.reshape(R, K // G, G).transpose(1, 0, 2)


def _pack_fwd(attrs, s_rank, rank_perm, rank_key, seg_start_gid, counts_gid,
              order, n_live, chunk, max_seg):
    out = _pack_run(attrs, s_rank, order, chunk)
    return out, (rank_perm, rank_key, seg_start_gid, counts_gid, n_live)


def _pack_bwd(chunk, max_seg, res, g):
    rank_perm, rank_key, seg_start_gid, counts_gid, n_live = res
    C = seg_start_gid.shape[0]
    K = rank_perm.shape[0]
    # Lane-dense [GRAD_ROWS, K] gradient rows (one fused strided read of g)
    # — only the differentiable rows: by contract the caller
    # (rasterize_tiles) fills ROW_ONE and the rows above it with constants
    # (ones / zero padding), so their cotangents are dead.  The rank-sorted
    # order comes from Binning's PRECOMPUTED permutation as ONE lane gather
    # (the former in-backward 11-operand sort cost ~2.3 ms; the 2-op
    # permutation sort rides binning at ~0.8 ms and lane gathers run at
    # full bandwidth).  Dead tail rows carry sentinel key C: they group at
    # the back, only combine with each other in the masked passes, and the
    # readout masks them.
    R = g.shape[1]
    rows = jnp.stack([g[:, r, :].reshape(K) for r in range(GRAD_ROWS)])
    acc = jnp.take(rows, rank_perm, axis=1)        # [GRAD_ROWS, K]
    skey = rank_key
    # Bounded segmented Hillis-Steele: after passes 1,2,..,2^(p-1) with
    # 2^p >= max_seg, acc[:, j] holds the sum of j's full segment whenever
    # j is the segment's first row (the same-key mask keeps every partial
    # sum inside its own segment, so boundaries compose exactly).
    sh = 1
    while sh < max_seg:
        kshift = jnp.concatenate([skey[sh:],
                                  jnp.full((sh,), -1, skey.dtype)])
        same = (kshift == skey)[None, :]
        vsh = jnp.concatenate(
            [acc[:, sh:], jnp.zeros((GRAD_ROWS, sh), acc.dtype)], axis=1)
        acc = acc + jnp.where(same, vsh, 0.0)
        sh *= 2
    sidx = jnp.clip(seg_start_gid, 0, K - 1)
    dT = jnp.take(acc, sidx, axis=1)               # [GRAD_ROWS, C] lane gather
    valid = (counts_gid > 0) & (seg_start_gid < n_live)
    dT = jnp.where(valid[None, :], dT, 0.0)
    # rows GRAD_ROWS.. (if any) are constants at the caller: zero cotangent
    d_attrs = (dT.T if R == GRAD_ROWS else jnp.concatenate(
        [dT.T, jnp.zeros((C, R - GRAD_ROWS), dT.dtype)], axis=1))
    f0 = lambda shape: np.zeros(shape, jax_dtypes.float0)
    return (d_attrs, f0((K,)), f0((K,)), f0((K,)), f0((C,)), f0((C,)),
            f0((C,)), f0(()))


pack_instances.defvjp(_pack_fwd, _pack_bwd)
