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
    slot_rank: jnp.ndarray     # [K_pad] depth rank of the instance per slot
    order: jnp.ndarray         # [C] gaussian id at each depth rank
    inv_order: jnp.ndarray     # [C] depth rank of each gaussian id
    live: jnp.ndarray          # [K_pad] bool: slot holds a real instance
    tile_start: jnp.ndarray    # [T] chunk-aligned start into padded layout
    tile_count: jnp.ndarray    # [T] real instance count per tile
    padded_total: jnp.ndarray  # scalar: #padded slots actually written
    n_dropped: jnp.ndarray     # instances lost to capacity overflow

    @property
    def gauss_id(self) -> jnp.ndarray:
        """[K_pad] source Gaussian per slot (debug/tests; involves a scalar
        gather — the hot path works purely in depth-rank space)."""
        return jnp.where(self.live, self.order[self.slot_rank], 0)


# Packed-instance row layout (shared with the Pallas kernels):
ROW_X, ROW_Y, ROW_QA, ROW_QB, ROW_QC, ROW_OP = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_DEPTH, ROW_ONE = 6, 7, 8, 9, 10
N_ROWS = 16  # padded for clean sublane tiling; rows 11..15 unused

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
    fh = full_height if full_height is not None else H
    fw = full_width if full_width is not None else W
    row0 = jnp.asarray(row0, jnp.int32)
    col0 = jnp.asarray(col0, jnp.int32)
    tiles_x = -(-W // tile_size)
    tiles_y = -(-H // tile_size)
    num_tiles = tiles_x * tiles_y
    # Static per-axis duplication bound: from the projection radius clamp by
    # default (exact for any scene), or the user's tighter `max_dup_per_axis`
    # (candidate-grid and sort cost scale with its square; AABBs wider than
    # the bound get clamped and the loss is counted in n_dropped).
    per_axis = (2 * math.ceil(radius_max) + 1 + tile_size - 1) // tile_size + 1
    if max_dup_per_axis > 0:
        per_axis = min(per_axis, max_dup_per_axis)
    per_axis = min(per_axis, max(tiles_x, tiles_y))
    MAX_DUP = per_axis * per_axis
    # Key packing: tile * C + depth_rank fits int32 for typical configs; for
    # very large capacity x tile products fall back to a two-operand
    # lexicographic sort (same ordering, ~2x sort cost).
    packed_key = (num_tiles + 1) * C < 2 ** 31

    # ---- 1. global depth sort of the Gaussians (stable ranks) ----
    depth_key = jnp.where(proj.visible, proj.depth, jnp.inf)
    order = jnp.argsort(depth_key)  # [C] gaussian ids in depth order
    means2d = proj.means2d[order]
    radius = proj.radius[order]
    visible = proj.visible[order]

    gx0, gx1, gy0, gy1, degen = _tile_bounds(means2d, radius, fh, fw,
                                             tile_size)
    # global tile bounds -> band-local
    tx0 = gx0 - col0 // tile_size
    tx1 = gx1 - col0 // tile_size
    ty0 = gy0 - row0 // tile_size
    ty1 = gy1 - row0 // tile_size
    in_band = (tx1 >= 0) & (tx0 <= tiles_x - 1) & (ty1 >= 0) & (ty0 <= tiles_y - 1)
    tx0 = jnp.clip(tx0, 0, tiles_x - 1)
    tx1 = jnp.clip(tx1, 0, tiles_x - 1)
    ty0 = jnp.clip(ty0, 0, tiles_y - 1)
    ty1 = jnp.clip(ty1, 0, tiles_y - 1)
    ok = visible & ~degen & in_band

    # ---- 2. candidate instances [C, MAX_DUP] with composite int32 keys ----
    d = jnp.arange(MAX_DUP, dtype=jnp.int32)
    ddx = (d % per_axis)[None, :]
    ddy = (d // per_axis)[None, :]
    cand_tx = tx0[:, None] + ddx
    cand_ty = ty0[:, None] + ddy
    cand_valid = (ok[:, None] & (cand_tx <= tx1[:, None])
                  & (cand_ty <= ty1[:, None]))
    cand_tile = cand_ty * tiles_x + cand_tx
    rank = jnp.arange(C, dtype=jnp.int32)[:, None]

    # ---- 3. one sort = compaction + (tile, rank) ordering ----
    K = max_instances
    n_valid = jnp.sum(cand_valid.astype(jnp.int32))
    # instances lost because an AABB exceeds the per-axis duplication bound
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1
    lost = jnp.where(ok, span_x * span_y
                     - jnp.minimum(span_x, per_axis)
                     * jnp.minimum(span_y, per_axis), 0)
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

    # ---- per-tile ranges in the sorted buffer ----
    # (consecutive integer queries over sorted integer keys: one merge-style
    # searchsorted yields both boundaries, see _pack_bwd)
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    end = jnp.searchsorted(s_tile, tids, side="right",
                           method="sort").astype(jnp.int32)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), end[:-1]])
    count = end - start

    # ---- 4. chunk-aligned padded layout, as a pure gather ----
    G = chunk
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
    # Source instances are contiguous per chunk: one sliced gather of G-wide
    # rows from the sorted buffer instead of K_pad random lookups.
    src_start = jnp.clip(c_start + (slot[:, 0] - c_pstart), 0, K - 1)
    s_rank_pad = jnp.concatenate([s_rank, jnp.zeros((G,), jnp.int32)])
    chunk_ranks = jax.vmap(
        lambda s: jax.lax.dynamic_slice(s_rank_pad, (s,), (G,)))(src_start)
    slot_rank = jnp.where(live, chunk_ranks, 0).reshape(-1)
    live = live.reshape(-1)

    # inverse permutation of the depth order (rank of each gaussian id),
    # computed by a small sort — never a scatter.
    _, inv_order = jax.lax.sort(
        (order.astype(jnp.int32), jnp.arange(C, dtype=jnp.int32)), num_keys=1)

    return Binning(slot_rank=slot_rank, order=order.astype(jnp.int32),
                   inv_order=inv_order, live=live, tile_start=padded_start,
                   tile_count=count, padded_total=padded_total,
                   n_dropped=n_dropped)


# ---------------------------------------------------------------------------
# Instance packing with a scatter-free hand-written VJP, in depth-rank space.
#
# Forward: attrs are re-sorted once into depth order ([C,16] row gather),
# then one [K_pad,16] row gather by `slot_rank` packs instances — no
# per-element gathers anywhere (a TPU scalar gather reads a whole ~4KB tile
# per element).  XLA's automatic transpose of a gather is a scatter-add,
# which lowers to a SERIAL loop on TPU, hence the hand-written backward:
# sort slots by rank, segment-sum each rank's (<= MAX_DUP) contributions via
# a blocked prefix scan + boundary row gathers, and un-permute with
# `inv_order`.
# ---------------------------------------------------------------------------

@partial(jax.custom_vjp, nondiff_argnums=(5,))
def pack_instances(attrs: jnp.ndarray, slot_rank: jnp.ndarray,
                   live: jnp.ndarray, order: jnp.ndarray,
                   inv_order: jnp.ndarray, max_dup: int) -> jnp.ndarray:
    """attrs [C, N_ROWS] per-Gaussian attributes -> inst [N_ROWS, K_pad]."""
    attrs_sorted = attrs[order]
    return (attrs_sorted[slot_rank] * live[:, None].astype(attrs.dtype)).T


def _pack_fwd(attrs, slot_rank, live, order, inv_order, max_dup):
    out = pack_instances(attrs, slot_rank, live, order, inv_order, max_dup)
    return out, (slot_rank, live, inv_order, attrs.shape[0])


def _pack_bwd(max_dup, res, g):
    slot_rank, live, inv_order, C = res
    K_pad = slot_rank.shape[0]
    key = jnp.where(live, slot_rank, C)
    iota = jnp.arange(K_pad, dtype=jnp.int32)
    sorted_key, perm = jax.lax.sort((key, iota), num_keys=1)
    gT = jax.lax.optimization_barrier(g.T)         # materialize [K_pad, 16]
    sorted_vals = gT[perm]                         # one row gather
    # inclusive prefix sums per attribute row (lane-direction blocked scan:
    # jnp.cumsum on a megasized axis lowers serially), then one relayout to
    # row-gatherable [K_pad+1, 16]
    csum = _cumsum_blocked_last(sorted_vals.T).T   # [K_pad, 16]
    csum = jnp.concatenate([jnp.zeros((1, csum.shape[1]), csum.dtype), csum],
                           axis=0)
    qs = jnp.arange(C, dtype=jnp.int32)
    # method="sort" turns the binary search into one merge-sort pass (the
    # default scan method does 21 rounds of [C]-wide scalar gathers from the
    # 1.25M key array — ~4KB tile read per element, tens of GB); and since
    # queries are the consecutive integers 0..C-1 over integer keys,
    # start[c] = end[c-1], so one call yields both boundaries.
    end = jnp.searchsorted(sorted_key, qs, side="right",
                           method="sort").astype(jnp.int32)
    start = jnp.concatenate([jnp.zeros((1,), jnp.int32), end[:-1]])
    # Segment sum = prefix difference.  Segments hold at most MAX_DUP (<=64)
    # terms, so cancellation error is ~eps * |global prefix| — acceptable at
    # float32 for gradient use (validated against autodiff in tests).
    d_rank = csum[end] - csum[start]               # [C, 16], rank space
    d_attrs = d_rank[inv_order]                    # back to gaussian-id space
    f0 = lambda a: np.zeros(a.shape, jax_dtypes.float0)
    return (d_attrs, f0(slot_rank), f0(live), f0(inv_order), f0(inv_order))


pack_instances.defvjp(_pack_fwd, _pack_bwd)
