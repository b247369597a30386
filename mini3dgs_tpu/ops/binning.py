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
     them: the first K slots are the instance buffer, tile-major and
     front-to-back within each tile.
  4. The chunk-aligned padded layout (tile t starts at a multiple of the
     kernel chunk G, so raster DMAs never cross tiles — what makes the
     hand-written backward race-free) is a pure gather: each padded slot
     computes which sorted instance it holds via searchsorted on the padded
     starts.

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
    s_rank: jnp.ndarray        # [K] depth rank of each COMPACT sorted instance
    src_row: jnp.ndarray       # [K_pad] compact row each padded slot copies
    order: jnp.ndarray         # [C] gaussian id at each depth rank
    inv_order: jnp.ndarray     # [C] depth rank of each gaussian id
    live: jnp.ndarray          # [K_pad] bool: slot holds a real instance
    rank_counts: jnp.ndarray   # [C] instances emitted per depth rank
    tile_start: jnp.ndarray    # [T] chunk-aligned start into padded layout
    tile_count: jnp.ndarray    # [T] real instance count per tile
    padded_total: jnp.ndarray  # scalar: #padded slots actually written
    n_dropped: jnp.ndarray     # instances lost to capacity overflow

    @property
    def slot_rank(self) -> jnp.ndarray:
        """[K_pad] depth rank per padded slot (debug/tests only: per-element
        scalar gathers — the hot path carries the rank as a packed attribute
        row instead, see pack_instances)."""
        return jnp.where(self.live, self.s_rank[self.src_row], 0)

    @property
    def gauss_id(self) -> jnp.ndarray:
        """[K_pad] source Gaussian per slot (debug/tests)."""
        return jnp.where(self.live, self.order[self.slot_rank], 0)


# Packed-instance row layout (shared with the Pallas kernels):
ROW_X, ROW_Y, ROW_QA, ROW_QB, ROW_QC, ROW_OP = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_DEPTH, ROW_ONE = 6, 7, 8, 9, 10
ROW_RANK = 11  # depth rank as f32, set by pack_instances (bwd sort key)
N_ROWS = 16  # padded for clean sublane tiling; rows 12..15 unused

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


def _tile_bounds(means2d, radius, H, W, tile_size):
    """Integer AABB -> inclusive tile bounds (reference renderer.py:279-293).
    int() in the reference truncates toward zero, not floor."""
    r = jnp.trunc(radius).astype(jnp.int32)
    cx = jnp.trunc(means2d[:, 0]).astype(jnp.int32)
    cy = jnp.trunc(means2d[:, 1]).astype(jnp.int32)
    x0 = jnp.clip(cx - r, 0, W)
    x1 = jnp.clip(cx + 1 + r, 0, W)
    y0 = jnp.clip(cy - r, 0, H)
    y1 = jnp.clip(cy + 1 + r, 0, H)
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


def _depth_order(proj: Projected) -> jnp.ndarray:
    """Global depth sort of the Gaussians (stable ranks)."""
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    return jnp.argsort(depth_key)  # [C] gaussian ids in depth order


def _candidates(proj, order, H, W, tile_size, per_axis, row0, col0,
                full_height, full_width):
    """Candidate tiles [C, MAX_DUP] for the [H, W] viewport at (row0, col0)
    of the full image, in depth-rank order.  AABBs are computed and clamped
    in GLOBAL coordinates (exactly like the unsharded reference, including
    the toward-zero int truncation) and only then converted to viewport
    tiles, so band-sharded rendering is bit-identical to single-device.
    Returns (cand_tile [C,D] viewport-local, cand_valid [C,D],
    lost [C] per-rank instances clamped away by the per_axis bound)."""
    fh = full_height if full_height is not None else H
    fw = full_width if full_width is not None else W
    row0 = jnp.asarray(row0, jnp.int32)
    col0 = jnp.asarray(col0, jnp.int32)
    tiles_x = -(-W // tile_size)
    tiles_y = -(-H // tile_size)
    MAX_DUP = per_axis * per_axis

    means2d = proj.means2d[order]
    radius = proj.radius[order]
    visible = proj.visible[order]

    gx0, gx1, gy0, gy1, degen = _tile_bounds(means2d, radius, fh, fw,
                                             tile_size)
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
    ok = visible & ~degen & in_band

    d = jnp.arange(MAX_DUP, dtype=jnp.int32)
    ddx = (d % per_axis)[None, :]
    ddy = (d // per_axis)[None, :]
    cand_tx = tx0[:, None] + ddx
    cand_ty = ty0[:, None] + ddy
    cand_valid = (ok[:, None] & (cand_tx <= tx1[:, None])
                  & (cand_ty <= ty1[:, None]))
    cand_tile = cand_ty * tiles_x + cand_tx

    # instances lost because an AABB exceeds the per-axis duplication bound
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    lost = jnp.where(ok, span_x * span_y
                     - jnp.minimum(span_x, per_axis)
                     * jnp.minimum(span_y, per_axis), 0)
    return cand_tile, cand_valid, lost


@partial(jax.jit, static_argnames=("H", "W", "tile_size", "max_instances",
                                   "chunk", "radius_max", "full_height",
                                   "full_width", "max_dup_per_axis"))
def bin_gaussians(proj: Projected, H: int, W: int, tile_size: int,
                  max_instances: int, chunk: int,
                  radius_max: float = 50.0,
                  row0=0, col0=0,
                  full_height: int = None, full_width: int = None,
                  max_dup_per_axis: int = 0) -> Binning:
    """Bin into the [H, W] viewport whose top-left pixel sits at (row0, col0)
    of a full_height x full_width image.  AABBs are computed and clamped in
    GLOBAL coordinates (exactly like the unsharded reference, including the
    toward-zero int truncation) and only then converted to band-local tiles,
    so band-sharded rendering is bit-identical to single-device.  row0/col0
    may be traced (lax.axis_index) values but must be tile_size multiples."""
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

    order = _depth_order(proj)
    (cand_tile, cand_valid, lost) = _candidates(
        proj, order, H, W, tile_size, per_axis, row0, col0,
        full_height, full_width)
    rank = jnp.arange(C, dtype=jnp.int32)[:, None]

    # ---- one sort = compaction + (tile, rank) ordering ----
    K = max_instances
    n_valid = jnp.sum(cand_valid.astype(jnp.int32))
    n_dropped = jnp.maximum(n_valid - K, 0) + lost.sum()
    if packed_key:
        # The key embeds the depth rank, and rank indexes the depth-sorted
        # order, so the source Gaussian id is recoverable AFTER the sort
        # (gid = order[key % C]) — no payload operand: minimum sort bandwidth.
        cand_key = jnp.where(cand_valid, cand_tile * C + rank, _INT32_MAX)
        s_key = jax.lax.sort(cand_key.reshape(-1))[:K]
        invalid = s_key == _INT32_MAX
        s_tile = jnp.where(invalid, num_tiles, s_key // C)
        s_rank = s_key % C
    else:
        # lexicographic (tile, rank) two-operand sort
        cand_t = jnp.where(cand_valid, cand_tile, _INT32_MAX)
        cand_r = jnp.broadcast_to(rank, (C, MAX_DUP))
        s_tile, s_rank = jax.lax.sort(
            (cand_t.reshape(-1), cand_r.reshape(-1)), num_keys=2)
        s_tile = s_tile[:K]
        s_rank = s_rank[:K]
        invalid = s_tile == _INT32_MAX
        s_tile = jnp.where(invalid, num_tiles, s_tile)
    s_rank = jnp.where(invalid, 0, s_rank).astype(jnp.int32)

    rank_counts = jnp.sum(cand_valid.astype(jnp.int32), axis=1)
    return _layout(s_tile, s_rank, order, rank_counts, num_tiles, K, chunk,
                   C, n_dropped)


def bin_gaussians_sharded(proj: Projected, H: int, W: int, tile_size: int,
                          max_instances: int, chunk: int, axis_name: str,
                          n_shards: int, radius_max: float = 50.0,
                          full_height: int = None, full_width: int = None,
                          max_dup_per_axis: int = 0,
                          route_capacity: int = None) -> Binning:
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
    order = _depth_order(proj)
    # Candidates with GLOBAL tile ids (full-image viewport).
    cand_tile, cand_valid, lost = _candidates(
        proj, order, fh, fw, tile_size, per_axis, 0, 0, fh, fw)
    rank = jnp.arange(C, dtype=jnp.int32)[:, None]
    cand_key = jnp.where(cand_valid, cand_tile * C + rank, _INT32_MAX)

    # ---- local sort of this device's rank shard ----
    local = jax.lax.dynamic_slice(cand_key, (i * Cs, 0), (Cs, MAX_DUP))
    s_local = jax.lax.sort(local.reshape(-1))          # [Cs * MAX_DUP]

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
    nQ = merged.shape[0]
    # same static length as the replicated path: min(K, total candidates)
    L = min(K, C * MAX_DUP)
    if nQ < L:
        merged = jnp.concatenate(
            [merged, jnp.full((L - nQ,), _INT32_MAX, jnp.int32)])
    s_key = merged[:L]
    invalid = s_key == _INT32_MAX
    s_tile = jnp.where(invalid, num_tiles_band,
                       s_key // C - i * num_tiles_band)
    s_rank = jnp.where(invalid, 0, s_key % C).astype(jnp.int32)

    # ---- band-restricted per-rank counts (exact wrt the emitted set) ----
    band_lo = i * num_tiles_band
    in_my_band = (cand_valid & (cand_tile >= band_lo)
                  & (cand_tile < band_lo + num_tiles_band))
    rank_counts = jnp.sum(in_my_band.astype(jnp.int32), axis=1)
    n_valid_band = rank_counts.sum()
    n_dropped = (jnp.maximum(n_valid_band - K, 0) + route_drops
                 + lost.sum())

    return _layout(s_tile, s_rank, order, rank_counts, num_tiles_band, K, G,
                   C, n_dropped)


def _layout(s_tile, s_rank, order, rank_counts, num_tiles, K, G, C,
            n_dropped) -> Binning:
    """Per-tile ranges + chunk-aligned padded layout from the sorted
    (tile, rank) instance stream.  Shared by the replicated and the
    gauss-sharded binning paths."""
    # method="scan" (binary search): 2500 queries x ~21 rounds of scalar
    # gathers is ~0.3 ms on chip; method="sort" re-sorts keys+queries and
    # measured 20x slower at this query count.
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    end = jnp.searchsorted(s_tile, tids, side="right").astype(jnp.int32)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), end[:-1]])
    count = end - start

    # ---- chunk-aligned padded layout, as pure arithmetic ----
    padded_count = ((count + G - 1) // G) * G
    padded_start = (jnp.cumsum(padded_count) - padded_count).astype(jnp.int32)
    padded_total = padded_start[-1] + padded_count[-1]
    K_pad = K + num_tiles * (G - 1) + G
    K_pad = ((K_pad + G - 1) // G) * G  # whole number of kernel chunks

    # Padded starts are G-aligned, so all slot bookkeeping factors through
    # chunk granularity: per-chunk scalars broadcast over [NC, G] instead of
    # per-slot scalar gathers (a TPU scalar gather reads a whole tile per
    # element — the difference is tens of GB of traffic).
    NC = K_pad // G
    chunk_ids = jnp.arange(NC, dtype=jnp.int32)
    chunk_tile = jnp.clip(
        jnp.searchsorted(padded_start // G, chunk_ids,
                         side="right").astype(jnp.int32) - 1,
        0, num_tiles - 1)                                  # [NC]
    c_pstart = padded_start[chunk_tile]                    # [NC] small gathers
    c_count = count[chunk_tile]
    c_start = start[chunk_tile]
    slot = jnp.arange(K_pad, dtype=jnp.int32).reshape(NC, G)
    offset_in_tile = slot - c_pstart[:, None]              # [NC, G]
    live = (offset_in_tile < c_count[:, None]) & (slot < padded_total)
    # Compact source row per padded slot — pure arithmetic, no gathers.
    # Within a tile the padded slots copy consecutive compact rows, so the
    # whole padded layout is ONE [K_pad,16] row gather in pack_instances
    # (a TPU scalar gather reads a whole ~4KB tile per element; 16-float
    # row gathers are fast).
    src_row = jnp.clip(c_start[:, None] + offset_in_tile, 0, K - 1)
    live = live.reshape(-1)
    src_row = src_row.reshape(-1)

    # inverse permutation of the depth order (rank of each gaussian id),
    # computed by a small sort — never a scatter.
    _, inv_order = jax.lax.sort(
        (order.astype(jnp.int32), jnp.arange(C, dtype=jnp.int32)), num_keys=1)

    return Binning(s_rank=s_rank, src_row=src_row,
                   order=order.astype(jnp.int32),
                   inv_order=inv_order, live=live, rank_counts=rank_counts,
                   tile_start=padded_start,
                   tile_count=count, padded_total=padded_total,
                   n_dropped=n_dropped)


# ---------------------------------------------------------------------------
# Instance packing with a scatter-free hand-written VJP, in depth-rank space.
#
# Forward: attrs are re-sorted once into depth order and stamped with their
# depth rank in ROW_RANK ([C,16] row gather), compacted by `s_rank`
# ([K,16] row gather), and expanded to the chunk-aligned padded layout by
# `src_row` ([K_pad,16] row gather) — no per-element scalar gathers anywhere
# (a TPU scalar gather reads a whole ~4KB tile per element).
#
# Backward: XLA's automatic transpose of a gather is a scatter-add, which
# lowers to a SERIAL loop on TPU, hence hand-written: sort slots by the
# ROW_RANK value saved in the forward output (2-op int sort), segment-sum
# each rank's contributions via a blocked prefix scan + boundary row gathers
# at analytically-known boundaries (cumsum of `rank_counts` — no
# searchsorted), and un-permute with `inv_order`.  Boundaries are exact
# whenever n_dropped == 0; under capacity overflow the dropped instances
# never rendered (zero true gradient) but the segment boundaries shift, so
# gradients of overflowing scenes are approximate — size max_instances to
# the scene (Binning.n_dropped is observable).
# ---------------------------------------------------------------------------

@jax.custom_vjp
def pack_instances(attrs: jnp.ndarray, s_rank: jnp.ndarray,
                   src_row: jnp.ndarray, live: jnp.ndarray,
                   rank_counts: jnp.ndarray, order: jnp.ndarray,
                   inv_order: jnp.ndarray) -> jnp.ndarray:
    """attrs [C, N_ROWS] per-Gaussian attributes -> inst [N_ROWS, K_pad]."""
    return _pack_run(attrs, s_rank, src_row, live, order)


def _pack_run(attrs, s_rank, src_row, live, order):
    C = attrs.shape[0]
    attrs_sorted = attrs[order]
    ranks = jnp.arange(C, dtype=jnp.float32)[:, None]
    attrs_sorted = jnp.concatenate(
        [attrs_sorted[:, :ROW_RANK], ranks, attrs_sorted[:, ROW_RANK + 1:]],
        axis=1)
    compact = attrs_sorted[s_rank]                 # [K, 16]
    padded = compact[src_row] * live[:, None].astype(attrs.dtype)
    return padded.T                                # [16, K_pad]


def _pack_fwd(attrs, s_rank, src_row, live, rank_counts, order, inv_order):
    out = _pack_run(attrs, s_rank, src_row, live, order)
    C = attrs.shape[0]
    rank_padded = jnp.where(live, out[ROW_RANK].astype(jnp.int32), C)
    return out, (rank_padded, rank_counts, inv_order, s_rank.shape[0])


def _pack_bwd(res, g):
    rank_padded, rank_counts, inv_order, K = res
    C = inv_order.shape[0]
    K_pad = rank_padded.shape[0]
    iota = jnp.arange(K_pad, dtype=jnp.int32)
    sorted_key, perm = jax.lax.sort((rank_padded, iota), num_keys=1)
    # At most K live slots exist, and they sort to the front (dead slots
    # carry key C): the gather and the prefix scan only need the first K
    # sorted positions.
    perm = perm[:K]
    sorted_key = sorted_key[:K]
    gT = jax.lax.optimization_barrier(g.T)         # materialize [K_pad, 16]
    sorted_vals = gT[perm]                         # one row gather [K, 16]
    # Dead slots may hold garbage/NaN from d_inst chunks the kernel never
    # wrote (e.g. under capacity overflow, where count-derived boundaries
    # can reach the tail): hard-mask them so the prefix sums stay clean
    # (where, not multiply — NaN * 0 = NaN).
    sorted_vals = jnp.where((sorted_key < C)[:, None], sorted_vals, 0.0)
    # inclusive prefix sums per attribute row (lane-direction blocked scan:
    # jnp.cumsum on a megasized axis lowers serially), then one relayout to
    # row-gatherable [K+1, 16]
    csum = _cumsum_blocked_last(sorted_vals.T).T   # [K, 16]
    csum = jnp.concatenate([jnp.zeros((1, csum.shape[1]), csum.dtype), csum],
                           axis=0)
    # Segment boundaries are analytic: slots sorted by rank put rank r's
    # instances at [end[r]-counts[r], end[r]) with end = inclusive cumsum of
    # rank_counts (dead slots sort to the tail with key C) — no searchsorted.
    end = jnp.clip(_cumsum_blocked_last(rank_counts.astype(jnp.int32)),
                   0, K)
    start = jnp.clip(end - rank_counts, 0, K)
    # Segment sum = prefix difference.  Segments hold at most MAX_DUP (<=64)
    # terms, so cancellation error is ~eps * |global prefix| — acceptable at
    # float32 for gradient use (validated against autodiff in tests).
    d_rank = csum[end] - csum[start]               # [C, 16], rank space
    # ROW_RANK carries the (non-differentiable) rank stamp, not caller data.
    d_rank = d_rank * (jnp.arange(N_ROWS) != ROW_RANK)[None, :].astype(
        d_rank.dtype)
    d_attrs = d_rank[inv_order]                    # back to gaussian-id space
    f0 = lambda shape: np.zeros(shape, jax_dtypes.float0)
    return (d_attrs, f0((K,)), f0((K_pad,)), f0((K_pad,)), f0((C,)),
            f0((C,)), f0((C,)))


pack_instances.defvjp(_pack_fwd, _pack_bwd)
