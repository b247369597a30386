"""Tile binning: (tile, depth)-key instance generation, sort, and ranges.

Reference semantics: `/root/reference/src/core/renderer.py:222-239` (global
ascending depth sort of the visible set) + `:263-298` (per-Gaussian AABB ->
overlapped 16x16 tiles, Python bucket lists).  The reference sorts Gaussians
once globally and then bins; the canonical high-performance formulation — and
ours — duplicates each Gaussian into one *instance per overlapped tile* and
sorts instances by the composite (tile_id, depth) key, which makes every
tile's working set a contiguous depth-ordered slice.

TPU-first design (all static shapes):
  * candidate instances are a dense [C, MAX_DUP] grid (MAX_DUP bounds tiles
    per Gaussian via the radius_max clamp, renderer.py:24-27);
  * compaction into the fixed-capacity instance buffer is an exclusive-scan
    scatter (no host sync, overflow drops are counted);
  * the lexicographic sort is one `lax.sort` with two keys (XLA's optimized
    multi-operand sort — runs on-chip, and is the piece that becomes a sharded
    radix sort over ICI in the multi-chip path);
  * instances are re-scattered into a *chunk-aligned padded layout*: tile t's
    slice starts at a multiple of the kernel chunk G, so the raster kernel's
    fixed-size DMAs never touch another tile's instances — this is what makes
    the hand-written backward race-free without atomics.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import Projected


class Binning(NamedTuple):
    inst: jnp.ndarray          # [16, K_pad] packed per-instance attributes
    gauss_id: jnp.ndarray      # [K_pad] source Gaussian per padded slot
    tile_start: jnp.ndarray    # [T] chunk-aligned start into padded layout
    tile_count: jnp.ndarray    # [T] real instance count per tile
    padded_total: jnp.ndarray  # scalar: #padded slots actually written
    n_dropped: jnp.ndarray     # instances lost to capacity overflow


# Packed-instance row layout (shared with the Pallas kernels):
ROW_X, ROW_Y, ROW_QA, ROW_QB, ROW_QC, ROW_OP = 0, 1, 2, 3, 4, 5
ROW_R, ROW_G, ROW_B, ROW_DEPTH, ROW_ONE = 6, 7, 8, 9, 10
N_ROWS = 16  # padded for clean sublane tiling; rows 11..15 unused


def max_dup_for(radius_max: float, tile_size: int) -> int:
    """Static bound on tiles one Gaussian can overlap (AABB of side
    2*radius+1 px, radius clamped by radius_max)."""
    per_axis = (2 * math.ceil(radius_max) + 1 + tile_size - 1) // tile_size + 1
    return per_axis * per_axis


def _tile_bounds(means2d, radius, H, W, tile_size):
    """Integer AABB -> inclusive tile bounds (reference renderer.py:279-293)."""
    # int() in the reference truncates toward zero, not floor.
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
                                   "full_width"))
def bin_gaussians(proj: Projected, H: int, W: int, tile_size: int,
                  max_instances: int, chunk: int,
                  radius_max: float = 50.0,
                  row0=0, col0=0,
                  full_height: int = None, full_width: int = None) -> Binning:
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
    # Static per-axis duplication bound from the projection radius clamp.
    per_axis = (2 * math.ceil(radius_max) + 1 + tile_size - 1) // tile_size + 1
    per_axis = min(per_axis, max(tiles_x, tiles_y))
    MAX_DUP = per_axis * per_axis

    gx0, gx1, gy0, gy1, degen = _tile_bounds(proj.means2d, proj.radius,
                                             fh, fw, tile_size)
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
    ok = proj.visible & ~degen & in_band

    # Candidate grid [C, MAX_DUP] -> tile ids.
    d = jnp.arange(MAX_DUP, dtype=jnp.int32)
    ddx = (d % per_axis)[None, :]
    ddy = (d // per_axis)[None, :]
    cand_tx = tx0[:, None] + ddx
    cand_ty = ty0[:, None] + ddy
    cand_valid = (ok[:, None] & (cand_tx <= tx1[:, None])
                  & (cand_ty <= ty1[:, None]))
    cand_tile = jnp.where(cand_valid, cand_ty * tiles_x + cand_tx, num_tiles)

    # Exclusive-scan compaction into the K-capacity instance buffer.
    K = max_instances
    flat_valid = cand_valid.reshape(-1)
    flat_tile = cand_tile.reshape(-1)
    flat_gid = jnp.broadcast_to(jnp.arange(C, dtype=jnp.int32)[:, None],
                                (C, MAX_DUP)).reshape(-1)
    pos = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    n_wanted = pos[-1] + 1
    dst = jnp.where(flat_valid & (pos < K), pos, K)
    buf_tile = jnp.full((K,), num_tiles, jnp.int32).at[dst].set(flat_tile, mode="drop")
    buf_gid = jnp.zeros((K,), jnp.int32).at[dst].set(flat_gid, mode="drop")
    buf_depth = jnp.full((K,), jnp.inf, jnp.float32).at[dst].set(
        jnp.broadcast_to(proj.depth[:, None], (C, MAX_DUP)).reshape(-1),
        mode="drop")
    n_dropped = jnp.maximum(n_wanted - K, 0)

    # Lexicographic (tile, depth) sort; sentinel tile = num_tiles sorts last.
    s_tile, s_depth, s_gid = jax.lax.sort(
        (buf_tile, buf_depth, buf_gid), num_keys=2)

    # Per-tile ranges in the sorted buffer.
    tids = jnp.arange(num_tiles, dtype=jnp.int32)
    start = jnp.searchsorted(s_tile, tids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(s_tile, tids, side="right").astype(jnp.int32)
    count = end - start

    # Chunk-aligned padded layout.
    G = chunk
    padded_count = ((count + G - 1) // G) * G
    padded_start = (jnp.cumsum(padded_count) - padded_count).astype(jnp.int32)
    padded_total = padded_start[-1] + padded_count[-1] if num_tiles > 0 else jnp.int32(0)
    # static capacity of padded layout, rounded to a whole number of chunks
    # (the raster kernels index instances as [16, K_pad//G, G])
    K_pad = K + num_tiles * (G - 1) + G
    K_pad = ((K_pad + G - 1) // G) * G

    pos_in_tile = jnp.arange(K, dtype=jnp.int32) - start[jnp.clip(s_tile, 0, num_tiles - 1)]
    new_pos = jnp.where(s_tile < num_tiles,
                        padded_start[jnp.clip(s_tile, 0, num_tiles - 1)] + pos_in_tile,
                        K_pad)
    pad_gid = jnp.zeros((K_pad,), jnp.int32).at[new_pos].set(s_gid, mode="drop")
    pad_live = jnp.zeros((K_pad,), bool).at[new_pos].set(
        s_tile < num_tiles, mode="drop")

    # Pack per-instance attributes [16, K_pad] via differentiable gathers.
    gid = pad_gid
    live = pad_live.astype(jnp.float32)
    rows = jnp.zeros((N_ROWS, K_pad), jnp.float32)
    rows = rows.at[ROW_X].set((proj.means2d[gid, 0] - col0) * live)
    rows = rows.at[ROW_Y].set((proj.means2d[gid, 1] - row0) * live)
    rows = rows.at[ROW_QA].set(proj.conic[gid, 0] * live)
    rows = rows.at[ROW_QB].set(proj.conic[gid, 1] * live)
    rows = rows.at[ROW_QC].set(proj.conic[gid, 2] * live)
    rows = rows.at[ROW_OP].set(proj.opacity[gid] * live)
    rows = rows.at[ROW_R].set(proj.color[gid, 0] * live)
    rows = rows.at[ROW_G].set(proj.color[gid, 1] * live)
    rows = rows.at[ROW_B].set(proj.color[gid, 2] * live)
    rows = rows.at[ROW_DEPTH].set(proj.depth[gid] * live)
    rows = rows.at[ROW_ONE].set(live)

    return Binning(inst=rows, gauss_id=pad_gid, tile_start=padded_start,
                   tile_count=count, padded_total=padded_total,
                   n_dropped=n_dropped)
