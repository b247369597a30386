"""Fused Pallas TPU tile-rasterization kernels with a hand-written VJP.

This is the TPU-native replacement for the reference's Python triple loop
(`/root/reference/src/core/renderer.py:300-362`) — the component that is the
CUDA extension `diff-gaussian-rasterization` in the canonical 3DGS ecosystem
(SURVEY §2.4).

Design (one grid cell per 16x16 image tile):
  * the tile's depth-sorted instance slice of the COMPACT sorted stream
    (ops/binning.py) is streamed from HBM into VMEM in fixed-size chunks;
    tile starts are unaligned, so boundary chunks are shared with neighbor
    tiles and masked per lane (a chunk-padded layout would be race-free by
    construction but moves 8x phantom bytes: TPU lane-pads [N,16] arrays);
  * per chunk, the [P pixels x G gaussians] quadratic form / exp / alpha math
    runs on the VPU; the per-chunk transmittance is an exact Hillis-Steele
    cumulative product (the vectorized equivalent of the sequential
    front-to-back loop — see ops/raster_ref.py for the equivalence argument);
  * the weighted accumulation of [r,g,b,depth,alpha] is ONE [8,G]x[G,P]
    `dot_general` on the MXU;
  * a `while_loop` over chunks stops early once every pixel in the tile is
    saturated (A >= 0.995, reference renderer.py:316-353).

Backward (custom VJP, original-3DGS style but replayed *front-to-back*):
  dL/dalpha_j = u_j*T_j*gate_j - S_j/(1-alpha_j), where u_j = <dOut, c_j> is
  one MXU matmul and the suffix sum S_j = <dOut, O_total> - prefix(u*w) needs
  only the saved forward output and a running prefix — no back-to-front pass,
  no atomics: each stream chunk has a unique primary tile that writes it;
  shared boundary-chunk contributions go to a per-tile side buffer merged by
  one XLA segment-sum, and per-rank gradients flow back to Gaussians through
  the hand-written pack backward (binning.pack_instances).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import dtypes as jax_dtypes
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import binning as B
from .projection import Projected
from .raster_ref import EARLY_STOP_A, W_EPS

N_ROWS = B.N_ROWS  # 16 (legacy wide stream)
STREAM_ROWS = B.STREAM_ROWS  # 10 data rows; constants synthesized in-kernel
N_ACC = 8          # accumulator channels: r, g, b, depth, alpha, 3 pad

# Rows of each instance chunk actually DMA'd from HBM (normally all).
# scripts/ablate_kernel.py sets 8 to measure the upper bound of ANY
# stream-bandwidth optimization (e.g. a bf16 attribute substream): if
# halving the streamed bytes does not move the step, the kernels' chunk
# DMAs are fully overlapped with compute and byte-shrinking levers are
# dead.  Numerically wrong when < rows (stale scratch rows) — ablation only.
DMA_ROWS = N_ROWS

# A/B toggle (pack-cost measurement): build the stream in the legacy
# 16-row layout (ROW_ONE + zero pads gathered and streamed) instead of
# the 10-row data-only layout.  Read at trace time.
WIDE_STREAM = False


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# A/B toggle (scripts/ab_t0.py): force the single-pass path to build its
# kernels WITH the t0 operand — the round-3 configuration — so the
# t0-specialization delta is measurable inside one tunnel session
# (VERDICT r3 next #2).  Never set outside that script.
FORCE_T0 = False


def _cumprod_last(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive cumulative product along the last axis via Hillis-Steele
    doubling (log2(n) VPU steps; static slices only, Mosaic-friendly)."""
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.ones_like(x[..., :k]), x[..., :-k]], axis=-1)
        x = x * shifted
        k *= 2
    return x


# Lane-block width of the in-chunk prefix matmuls.  The [G,G] triangular
# matmul is the kernels' dominant MXU cost and is quadratic in the block:
# two chained [P,B]x[B,B] matmuls cost half the flops of one [P,2B]x[2B,2B]
# (the inter-block carry is a [P,1] broadcast add).  128 = one full lane
# vreg; G <= 128 keeps the single-matmul path.
PREFIX_BLOCK = 128


def _prefix_blocked(x: jnp.ndarray, strict: bool) -> jnp.ndarray:
    """Per-row prefix sum along lanes as block-triangular MXU matmuls:
    within each PREFIX_BLOCK-wide lane block one [P,B]x[B,B] matmul, with
    the running block total carried as a [P,1] broadcast add (blocks chain
    serially, but nb = G/128 is tiny).  strict=True -> exclusive prefix.

    PRECISION: on real TPUs a default-precision f32 matmul rounds operands
    to bf16 (1 pass) — measured 4e-3 image / 0.24 normalized-gradient error
    vs golden on chip.  The triangular matrix is 0/1 (exact in bf16), so a
    manual hi/lo operand split buys HIGH-precision accuracy (~2^-16
    relative) in TWO default passes — the hi*lo cross term of the 3-pass
    scheme vanishes against an exact RHS."""
    G = x.shape[-1]
    B = min(PREFIX_BLOCK, G)
    ii = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    tri = ((ii < jj) if strict else (ii <= jj)).astype(jnp.float32)
    outs = []
    carry = None
    for b in range(G // B):
        xb = x[:, b * B:(b + 1) * B]
        hi = (xb.astype(jnp.bfloat16)).astype(jnp.float32)
        lo = xb - hi
        dot = functools.partial(jax.lax.dot_general,
                                dimension_numbers=(((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        pre = dot(hi, tri) + dot(lo, tri)
        if carry is not None:
            pre = pre + carry
        outs.append(pre)
        carry = pre[:, -1:] + (xb[:, -1:] if strict else 0.0)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=1)


def _transmittance(one_minus: jnp.ndarray, T: jnp.ndarray):
    """Per-chunk transmittance in log space with the prefix as block-wise
    MXU matmuls against a strict upper-triangular ones matrix (the VPU
    doubling cumprod was log2(G) full [P,G] passes competing with the alpha
    math; the MXU is otherwise idle in the forward).  Returns
    (T_before [P,G] — transmittance BEFORE each instance, T_new [P,1],
    lg = log(1-alpha) [P,G] — the bwd reuses it as exp(-lg) = 1/(1-alpha),
    cheaper than a [P,G] divide).  The 1e-30 floor keeps log finite for
    alpha == 1; the prefix then underflows exp to exactly 0, matching the
    product semantics."""
    lg = jnp.log(jnp.maximum(one_minus, 1e-30))
    pre = _prefix_blocked(lg, strict=True)         # [P,G]
    T_before = T * jnp.exp(pre)
    T_new = T * jnp.exp(pre[:, -1:] + lg[:, -1:])
    return T_before, T_new, lg


def _cumsum_last(x: jnp.ndarray) -> jnp.ndarray:
    n = x.shape[-1]
    k = 1
    while k < n:
        shifted = jnp.concatenate(
            [jnp.zeros_like(x[..., :k]), x[..., :-k]], axis=-1)
        x = x + shifted
        k *= 2
    return x


def _uw_prefix(uw: jnp.ndarray) -> jnp.ndarray:
    """Inclusive prefix of u*w along G as block-wise MXU matmuls with the
    upper-triangular ones matrix (measured: the VPU doubling scan here costs
    ~5 ms/step — 8 full [P,G] lane-shifted passes of VMEM traffic lose to
    the MXU even though the MXU also runs the transmittance prefix and the
    moment matmul)."""
    return _prefix_blocked(uw, strict=False)


def _d_alpha_term(u, T_before, gate, S, lg):
    """dL/dalpha_j = u_j*T_j*gate_j - S_j/(1-alpha_j) (original-3DGS form;
    the suffix term redistributes the occluded contribution).  1/(1-alpha)
    is exp(-lg) with lg = log(1-alpha) from _transmittance — the hardware
    exp is cheaper than a [P,G] divide (measured ~0.9 ms/step).  At
    alpha == 1 exactly, exp(-lg) = exp(69) is large-but-finite and the
    caller's (a_raw < 1) mask zeroes the lane."""
    return u * T_before * gate - S * jnp.exp(-lg)


def _dot3(a, b, dims):
    """~f32-accurate matmul as three DEFAULT-precision passes (hi*hi +
    lo*hi + hi*lo; the lo*lo term is below 2^-16 relative).  Mosaic rounds
    f32 dot operands to bf16 at DEFAULT (measured 4e-3 image / 0.24
    normalized-gradient error vs golden on chip) and does not implement
    Precision.HIGH; HIGHEST measured ~2x the default's cost."""
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=jnp.float32)
    ah = a.astype(jnp.bfloat16).astype(jnp.float32)
    bh = b.astype(jnp.bfloat16).astype(jnp.float32)
    return d(ah, bh) + d(a - ah, bh) + d(ah, b - bh)


# PRECISION policy (measured on chip, scripts/precision_matrix.py): the
# bulk gradient deviation vs golden is NOT matmul precision — it is
# early-stop/W_EPS gate flips between Mosaic's and XLA's exp
# implementations (every precision variant, 3-pass included, shows the
# same ~9e-2 xyz rel-L2 on a deeply-stacked scene, while the same compare
# on CPU agrees to 7e-5).  Upgrading u/acc/moments to 3-pass cost
# +4.4 ms/step and bought nothing; they run at DEFAULT.  Only the
# transmittance prefix keeps the 2-pass hi/lo split: it is nearly free
# (exact 0/1 RHS needs no cross term) and improves on-chip alpha parity
# 9.98e-4 -> 2.73e-5.


def _u_matmul(gout, cmat):
    """u[p,i] = <dOut_p, c_i> — one [P,8]x[8,G]-shaped MXU contraction."""
    return jax.lax.dot_general(gout, cmat, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _acc_matmul(cmat, contrib):
    """Weighted [r,g,b,depth,alpha] accumulation."""
    return jax.lax.dot_general(cmat, contrib, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _bwd_moments(gout, Mpix, ones_row, wgt, d_lw, d_op_pix):
    """Three pixel-reduction MXU matmuls: d_cmat (gout x wgt, color/depth
    gradients), the six pixel moments (Mpix x d_lw), and the opacity column
    sum (ones x d_op_pix).  d_op_pix must stay its own (ungated) operand:
    golden clip autodiff keeps the full opacity gradient at w == 1 pixels
    while the d_lw path is (w < 1)-gated, so S0/op is NOT exact there.

    All three run at DEFAULT precision — see the precision-policy note
    above _u_matmul (3-pass splits measured no parity gain; the bulk
    deviation vs golden is exp-implementation gate flips, not rounding)."""
    dims = (((1,), (0,)), ((), ()))
    d = lambda a, b: jax.lax.dot_general(a, b, dims,
                                         preferred_element_type=jnp.float32)
    return d(gout, wgt), d(Mpix, d_lw), d(ones_row, d_op_pix)


def _pixel_coords(t, tile_size, tiles_x, row0, col0, P):
    """Pixel coordinates of tile id `t` (callers pass the GLOBAL tile id via
    the tile_gid prefetch operand, so a band segment addresses full-image
    coordinates while its start/count tables stay buffer-local)."""
    ty = t // tiles_x
    tx = t % tiles_x
    pix = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    px = (tx * tile_size + pix % tile_size + col0).astype(jnp.float32)
    py = (ty * tile_size + pix // tile_size + row0).astype(jnp.float32)
    return px, py


def _chunk_alpha(ch, px, py, head, count, ci, G):
    """Shared fwd/bwd per-chunk alpha math.  ch: [16,G] VMEM chunk.
    `head` = start % G: the tile's instances occupy stream rows
    [head, head + count) relative to its first (unaligned) chunk — lanes
    outside that window belong to neighboring tiles and are masked.
    The conic rows are PRE-SCALED at pack time (qa,qc by -0.5, qb by -1,
    see rasterize_tiles) so the quadratic form IS log w — saving two [P,G]
    multiplies per pair versus s-then-(-0.5s); exp >= 0 and op*w >= 0
    always, so only the upper clamps survive (reference renderer.py:334,339
    semantics unchanged)."""
    x = ch[B.ROW_X:B.ROW_X + 1, :]
    y = ch[B.ROW_Y:B.ROW_Y + 1, :]
    qa = ch[B.ROW_QA:B.ROW_QA + 1, :]
    qb = ch[B.ROW_QB:B.ROW_QB + 1, :]
    qc = ch[B.ROW_QC:B.ROW_QC + 1, :]
    op = ch[B.ROW_OP:B.ROW_OP + 1, :]
    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) + ci * G
    valid = (lidx >= head) & (lidx < head + count)   # [1,G] bool
    dx = px - x                                   # [P, G]
    dy = py - y
    lw = dx * dx * qa + dx * dy * qb + dy * dy * qc  # = -0.5 s
    w = jnp.minimum(jnp.exp(lw), 1.0)
    a_raw = op * w
    alpha = jnp.where((w >= W_EPS) & valid,
                      jnp.minimum(a_raw, 1.0), 0.0)
    return dict(x=x, y=y, qa=qa, qb=qb, qc=qc, op=op, w=w,
                a_raw=a_raw, alpha=alpha, valid=valid)


# ======================== forward kernel ========================

def _cmat_of(ch, rows, G):
    """[8, G] accumulation matrix [r, g, b, depth, 1, 0, 0, 0].  The wide
    legacy stream carries the constant rows; the 10-row stream synthesizes
    them here instead of paying the pack gathers for constants."""
    if rows >= B.ROW_R + N_ACC:
        return ch[B.ROW_R:B.ROW_R + N_ACC, :]
    return jnp.concatenate(
        [ch[B.ROW_R:rows, :], jnp.ones((1, G), jnp.float32),
         jnp.zeros((B.ROW_R + N_ACC - rows - 1, G), jnp.float32)], axis=0)


def _fwd_kernel(tile_start_ref, tile_count_ref, tile_gid_ref, inst_hbm,
                *refs, tile_size, tiles_x, G, row0, col0, has_t0, rows):
    # t0_ref [1,1,P]: per-pixel transmittance ENTERING this raster call.
    # Only the ring-exchange path (parallel/ring.py) feeds it — it chains the
    # previous depth-rank segment's output transmittance through it, so
    # compositing resumes mid-stream with reference semantics (including the
    # A >= 0.995 early-stop, which sees the GLOBAL accumulated alpha).  The
    # single-pass path builds the op with has_t0=False: t0 is the constant
    # ones SPECIALIZED AT TRACE TIME — no t0 VMEM operand, no per-tile t0
    # block DMA, and no row-5 transmittance write-out (VERDICT r3 weak #1:
    # the ring chaining additions must not tax the single-device path).
    if has_t0:
        t0_ref, out_ref, chunk_ref, sem = refs
    else:
        out_ref, chunk_ref, sem = refs
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    P = tile_size * tile_size
    px, py = _pixel_coords(tile_gid_ref[t], tile_size, tiles_x, row0, col0, P)
    chunk0 = start // G          # first (possibly shared) stream chunk
    head = start - chunk0 * G    # unaligned offset within it
    n_chunks = jnp.where(count > 0, (head + count + G - 1) // G, 0)

    def dma(ci):
        # inst_hbm is [K//G, rows, G]: dynamic index on the MAJOR dim only —
        # Mosaic requires dynamically-sliced dims to be untiled (the last two
        # dims carry the (8,128) tiling).  Slot ci%2 double-buffers.
        slot = jax.lax.rem(ci, 2)
        idx = jnp.minimum(chunk0 + ci, inst_hbm.shape[0] - 1)
        nr = min(DMA_ROWS, rows)
        if nr == rows:
            # full-block copy: Mosaic requires sublane-dim slices to be
            # 8-aligned (a 0:10 slice fails to compile on chip), and the
            # full [rows, G] block needs no dim-1 slice at all
            return pltpu.make_async_copy(
                inst_hbm.at[idx], chunk_ref.at[slot], sem.at[slot])
        return pltpu.make_async_copy(
            inst_hbm.at[idx, 0:nr],
            chunk_ref.at[slot, 0:nr], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(jnp.int32(0)).start()

    def body(carry):
        ci, T, acc = carry
        # prefetch next chunk while computing this one
        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(ci + 1).start()

        dma(ci).wait()
        ch = chunk_ref[jax.lax.rem(ci, 2)]
        m = _chunk_alpha(ch, px, py, head, count, ci, G)
        one_minus = 1.0 - m["alpha"]
        T_before, T, _ = _transmittance(one_minus, T)
        gate = ((1.0 - T_before) < EARLY_STOP_A).astype(jnp.float32)
        contrib = T_before * m["alpha"] * gate     # [P, G]
        cmat = _cmat_of(ch, rows, G)               # [8, G]
        acc = acc + _acc_matmul(cmat, contrib)     # [8, P]
        return ci + 1, T, acc

    def cond(carry):
        ci, T, _ = carry
        return jnp.logical_and(ci < n_chunks,
                               jnp.max(T) > (1.0 - EARLY_STOP_A))

    T0 = (jnp.swapaxes(t0_ref[0], 0, 1) if has_t0
          else jnp.ones((P, 1), jnp.float32))
    init = (jnp.int32(0), T0, jnp.zeros((N_ACC, P), jnp.float32))
    stop_ci, T_fin, acc = jax.lax.while_loop(cond, body, init)
    if has_t0:
        # acc row 5 is structurally zero (instance rows 11.. are zero
        # padding) — repurpose it to report the tile's outgoing per-pixel
        # transmittance, which the ring path chains into the next t0.
        out_ref[0] = jnp.concatenate(
            [acc[0:5], jnp.swapaxes(T_fin, 0, 1), acc[6:8]], axis=0)
    else:
        out_ref[0] = acc
    # If the loop exited early (or at the boundary), a prefetched DMA may be
    # in flight: consume its semaphore so the next grid step starts clean.
    @pl.when(stop_ci < n_chunks)
    def _():
        dma(stop_ci).wait()


# ======================== backward kernel ========================

def _bwd_kernel(tile_start_ref, tile_count_ref, tile_gid_ref, inst_hbm,
                gout_ref, oraw_ref, *refs, tile_size, tiles_x, G, row0,
                col0, has_t0, rows):
    # has_t0=False (single-pass path): t0 is the constant ones — no t0
    # operand, no dt0 output (see _fwd_kernel).
    if has_t0:
        (t0_ref, dmain_init, dhead_init, dinst_hbm, dhead_hbm, dt0_ref,
         chunk_ref, dchunk_ref, sem, wsem) = refs
    else:
        (dmain_init, dhead_init, dinst_hbm, dhead_hbm,
         chunk_ref, dchunk_ref, sem, wsem) = refs
    # dchunk_ref/wsem are double-buffered [2, ...]: the write DMA of chunk i
    # overlaps the compute of chunk i+1 (waiting per chunk serialized the
    # whole backward sweep on DMA latency).
    #
    # Write routing (race-free without padded chunk alignment): stream chunk
    # c's PRIMARY tile is the one containing row c*G; primaries partition
    # the chunks, and tile t is primary for exactly its local chunks
    # ci >= 1 (plus ci == 0 when start is aligned).  The unaligned head
    # chunk (ci == 0, head > 0) is primary to the PREVIOUS tile, so its
    # gradient block goes to the per-tile side buffer dhead_hbm[t] instead;
    # XLA merges heads into the main stream with one segment-sum
    # (raster_bwd epilogue).  Every tile writes dhead_hbm[t] (zeros when it
    # has no unaligned head), so the merge may sum unconditionally.
    t = pl.program_id(0)
    start = tile_start_ref[t]
    count = tile_count_ref[t]
    gid = tile_gid_ref[t]
    P = tile_size * tile_size
    px, py = _pixel_coords(gid, tile_size, tiles_x, row0, col0, P)
    chunk0 = start // G
    head = start - chunk0 * G
    n_chunks = jnp.where(count > 0, (head + count + G - 1) // G, 0)

    gout = gout_ref[0]                 # [8, P] cotangent of raw accumulators
    oraw = oraw_ref[0]                 # [8, P] saved forward accumulators
    # total_p = <dOut, O_total> per pixel, as a [P,1] column.  Row 5 carries
    # (gT, T_end): every forward contribution AND T_end scale linearly in the
    # incoming transmittance t0, so `total` doubles as both the suffix-sum
    # seed (S_j = total - incl_j then includes the cross-segment term
    # gT * T_end exactly) and the t0 cotangent: dL/dt0 = total / t0.
    total = jnp.swapaxes(jnp.sum(gout * oraw, axis=0, keepdims=True), 0, 1)
    if has_t0:
        T0 = jnp.swapaxes(t0_ref[0], 0, 1)        # [P, 1]
        dt0_ref[0] = jnp.swapaxes(total / jnp.maximum(T0, 1e-30), 0, 1)
    else:
        T0 = jnp.ones((P, 1), jnp.float32)

    # Tile-local pixel-moment rows [1, px, py, px^2, px*py, py^2] for the
    # moment matmul in the body (see d_s comments); built once per tile.
    cx0 = ((gid % tiles_x) * tile_size + col0).astype(jnp.float32) \
        + 0.5 * tile_size
    cy0 = ((gid // tiles_x) * tile_size + row0).astype(jnp.float32) \
        + 0.5 * tile_size
    pxl = px - cx0                     # [P,1]
    pyl = py - cy0
    onesP = jnp.ones_like(pxl)
    Mpix = jnp.concatenate(
        [onesP, pxl, pyl, pxl * pxl, pxl * pyl, pyl * pyl],
        axis=1).T                      # [6, P] — built once per tile
    ones_row = jnp.swapaxes(onesP, 0, 1)  # [1, P]

    def dma(ci):
        slot = jax.lax.rem(ci, 2)
        idx = jnp.minimum(chunk0 + ci, inst_hbm.shape[0] - 1)
        nr = min(DMA_ROWS, rows)
        if nr == rows:
            # full-block copy: Mosaic requires sublane-dim slices to be
            # 8-aligned (a 0:10 slice fails to compile on chip), and the
            # full [rows, G] block needs no dim-1 slice at all
            return pltpu.make_async_copy(
                inst_hbm.at[idx], chunk_ref.at[slot], sem.at[slot])
        return pltpu.make_async_copy(
            inst_hbm.at[idx, 0:nr],
            chunk_ref.at[slot, 0:nr], sem.at[slot])

    def wcopy_head(slot):
        return pltpu.make_async_copy(dchunk_ref.at[slot], dhead_hbm.at[t],
                                     wsem.at[slot])

    def wcopy_main(slot, ci):
        return pltpu.make_async_copy(
            dchunk_ref.at[slot],
            dinst_hbm.at[jnp.minimum(chunk0 + ci, dinst_hbm.shape[0] - 1)],
            wsem.at[slot])

    def wstart(ci):
        slot = jax.lax.rem(ci, 2)

        @pl.when((ci == 0) & (head > 0))
        def _():
            wcopy_head(slot).start()

        @pl.when((ci > 0) | (head == 0))
        def _():
            wcopy_main(slot, ci).start()

    def wwait(ci):
        slot = jax.lax.rem(ci, 2)

        @pl.when((ci == 0) & (head > 0))
        def _():
            wcopy_head(slot).wait()

        @pl.when((ci > 0) | (head == 0))
        def _():
            wcopy_main(slot, ci).wait()

    @pl.when(n_chunks > 0)
    def _():
        dma(jnp.int32(0)).start()

    def body(carry):
        ci, T, prefix = carry

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(ci + 1).start()

        dma(ci).wait()
        ch = chunk_ref[jax.lax.rem(ci, 2)]
        m = _chunk_alpha(ch, px, py, head, count, ci, G)
        alpha = m["alpha"]
        one_minus = 1.0 - alpha
        T_before, T_new, lg = _transmittance(one_minus, T)
        gate = ((1.0 - T_before) < EARLY_STOP_A).astype(jnp.float32)
        wgt = T_before * alpha * gate              # [P, G] contribution weights

        cmat = _cmat_of(ch, rows, G)               # [8, G]
        u = _u_matmul(gout, cmat)                  # [P, G]
        uw = u * wgt
        incl = _uw_prefix(uw) + prefix
        S = total - incl                           # suffix sum over i > j
        d_alpha = _d_alpha_term(u, T_before, gate, S, lg)

        # chain through alpha = clip(op*w,0,1)*(w>=eps)*valid
        w = m["w"]
        mask = ((m["a_raw"] < 1.0) & (m["a_raw"] > 0.0)
                & (w >= W_EPS) & m["valid"]).astype(jnp.float32)
        d_aw = d_alpha * mask                      # d(op*w)
        d_op_pix = d_aw * w
        d_w = d_aw * m["op"]
        # w = min(exp(lw), 1); lw <= 0 so only the upper clamp can bind
        d_lw = w * d_w * (w < 1.0).astype(jnp.float32)

        # Conic/mean gradients via pixel MOMENTS: dx = px - x is separable,
        # so e.g. colsum(d_lw*dx^2) = Sxx - 2x*Sx + x^2*S0 with
        # S* = sum_p d_lw * [1, px, py, px^2, px*py, py^2] — ONE [6,P]x[P,G]
        # MXU matmul replaces five [P,G] elementwise chains and six
        # cross-sublane column reductions (the bwd kernel was VPU-bound).
        # Pixel coords are TILE-LOCAL (Mpix/xl below) so the expansion's
        # cancellation stays at the footprint scale, not the image scale.
        d_cmat, mom, d_op_row = _bwd_moments(gout, Mpix, ones_row, wgt,
                                             d_lw, d_op_pix)
        S0 = mom[0:1, :]
        Sx = mom[1:2, :]
        Sy = mom[2:3, :]
        Sxx = mom[3:4, :]
        Sxy = mom[4:5, :]
        Syy = mom[5:6, :]
        xl = m["x"] - cx0                          # [1,G] tile-local centers
        yl = m["y"] - cy0
        qa, qb, qc = m["qa"], m["qb"], m["qc"]     # pre-scaled rows
        cx_ = Sx - xl * S0                         # colsum(d_lw * dx)
        cy_ = Sy - yl * S0
        # lw = dx^2 qa + dx dy qb + dy^2 qc; d/dx = -(2 dx qa + dy qb)
        d_x_row = -(2.0 * qa * cx_ + qb * cy_)
        d_y_row = -(2.0 * qc * cy_ + qb * cx_)
        d_qa_row = Sxx - xl * (2.0 * Sx - xl * S0)
        d_qb_row = Sxy - xl * Sy - yl * Sx + xl * yl * S0
        d_qc_row = Syy - yl * (2.0 * Sy - yl * S0)
        d_chunk = jnp.concatenate([
            d_x_row,                               # ROW_X
            d_y_row,                               # ROW_Y
            d_qa_row,                              # ROW_QA
            d_qb_row,                              # ROW_QB
            d_qc_row,                              # ROW_QC
            d_op_row,                              # ROW_OP
            d_cmat[0:4, :],                        # ROW_R..ROW_DEPTH
        ] + ([jnp.zeros((rows - 10, G), jnp.float32)] if rows > 10 else []),
            axis=0)
        slot = jax.lax.rem(ci, 2)
        # reuse of this slot: its write from chunk ci-2 must have landed
        @pl.when(ci >= 2)
        def _():
            wwait(ci - 2)
        dchunk_ref[slot] = d_chunk
        wstart(ci)

        T = T_new
        prefix = incl[:, -1:]
        return ci + 1, T, prefix

    def cond(carry):
        ci, T, _ = carry
        return jnp.logical_and(ci < n_chunks,
                               jnp.max(T) > (1.0 - EARLY_STOP_A))

    init = (jnp.int32(0), T0, jnp.zeros((P, 1), jnp.float32))
    stop_ci, _, _ = jax.lax.while_loop(cond, body, init)

    # Chunks skipped by early exit, stream-tail chunks, and head rows of
    # tiles with an aligned/empty head are never written: the gradient
    # outputs are ALIASED to caller-provided zero buffers (dmain_init /
    # dhead_init via input_output_aliases), so unwritten slots are exact
    # zeros — the former in-kernel serial per-chunk zero-fill DMA loop
    # cost real milliseconds.

    # Drain any in-flight prefetch after an early exit.
    @pl.when(stop_ci < n_chunks)
    def _():
        dma(stop_ci).wait()

    # Drain the (up to two) in-flight gradient writes.
    @pl.when(stop_ci >= 1)
    def _():
        wwait(stop_ci - 1)

    @pl.when(stop_ci >= 2)
    def _():
        wwait(stop_ci - 2)


# ======================== pallas_call wrappers ========================

@functools.lru_cache(maxsize=64)
def _make_raster_op(num_tiles: int, tiles_x: int, tile_size: int, G: int,
                    K: int, row0: int, col0: int, interpret: bool,
                    has_t0: bool = True, rows: int = N_ROWS):
    """has_t0=False builds the single-pass specialization: t0 == ones is
    folded at trace time, dropping the per-tile t0 VMEM block (fwd+bwd),
    the fwd row-5 transmittance write-out, and the bwd dt0 output; the
    returned op then takes (inst, tile_start, tile_count, tile_gid).  With
    has_t0=True (the ring path) the op additionally takes t0 [T,1,P]."""
    P = tile_size * tile_size
    kern_fwd = functools.partial(_fwd_kernel, tile_size=tile_size,
                                 tiles_x=tiles_x, G=G, row0=row0, col0=col0,
                                 has_t0=has_t0, rows=rows)
    kern_bwd = functools.partial(_bwd_kernel, tile_size=tile_size,
                                 tiles_x=tiles_x, G=G, row0=row0, col0=col0,
                                 has_t0=has_t0, rows=rows)

    t0_spec = [pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)] if has_t0 else []
    fwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)] + t0_spec,
        out_specs=pl.BlockSpec((1, N_ACC, P), lambda i, *_: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((2, rows, G), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )

    def fwd_call(inst, tile_start, tile_count, tile_gid, t0):
        args = (tile_start, tile_count, tile_gid, inst)
        if has_t0:
            args += (t0,)
        return pl.pallas_call(
            kern_fwd,
            out_shape=jax.ShapeDtypeStruct((num_tiles, N_ACC, P), jnp.float32),
            grid_spec=fwd_grid,
            interpret=interpret,
            # tiles are independent: megacore chips may split the grid.
            # The default 16MB scoped-vmem limit is what the kernels press
            # against (the bwd at G=512 exceeds it outright); raising it
            # gives Mosaic room to keep the [P,G] live set on stack.
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 2 ** 20),
        )(*args)

    acc_spec = pl.BlockSpec((1, N_ACC, P), lambda i, *_: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    bwd_grid = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY), acc_spec, acc_spec]
                 + t0_spec
                 + [pl.BlockSpec(memory_space=pl.ANY),
                    pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY))
                  + ((pl.BlockSpec((1, 1, P), lambda i, *_: (i, 0, 0),
                                   memory_space=pltpu.VMEM),) if has_t0
                     else ()),
        scratch_shapes=[pltpu.VMEM((2, rows, G), jnp.float32),
                        pltpu.VMEM((2, rows, G), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,)),
                        pltpu.SemaphoreType.DMA((2,))],
    )

    def bwd_call(inst, tile_start, tile_count, tile_gid, t0, gout, oraw):
        # The gradient outputs are aliased to zero-filled inputs: unwritten
        # slots (early-exit-skipped chunks, stream-tail chunks, aligned/empty
        # head rows) then hold exact zeros with no in-kernel zero-fill and no
        # epilogue masking.  Alias indices count the scalar-prefetch operands.
        zmain = jnp.zeros((K // G, rows, G), jnp.float32)
        zhead = jnp.zeros((num_tiles, rows, G), jnp.float32)
        args = (tile_start, tile_count, tile_gid, inst, gout, oraw)
        out_shapes = (jax.ShapeDtypeStruct((K // G, rows, G), jnp.float32),
                      jax.ShapeDtypeStruct((num_tiles, rows, G),
                                           jnp.float32))
        if has_t0:
            args += (t0,)
            out_shapes += (jax.ShapeDtypeStruct((num_tiles, 1, P),
                                                jnp.float32),)
        args += (zmain, zhead)
        z = 7 if has_t0 else 6   # operand index of zmain (prefetch counts)
        return pl.pallas_call(
            kern_bwd,
            out_shape=out_shapes,
            grid_spec=bwd_grid,
            interpret=interpret,
            input_output_aliases={z: 0, z + 1: 1},
            # chunk-primary d_inst slices and per-tile d_head rows are
            # disjoint across tiles, so the grid is parallel
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True, dimension_semantics=("parallel",),
                vmem_limit_bytes=100 * 2 ** 20),
        )(*args)

    def _merge_head(tile_start, d_main, d_head):
        NC = K // G
        cid = jnp.arange(NC, dtype=jnp.int32)
        # Unwritten slots (early-exit-skipped chunks, stream tail, unused
        # head rows) hold exact zeros via the output aliasing in bwd_call —
        # no masking needed here.
        # Merge unaligned-head contributions: tile starts ascend, so
        # head_chunk is nondecreasing — a segment sum by prefix difference.
        head_chunk = tile_start // G                       # [num_tiles]
        flat = d_head.reshape(num_tiles, rows * G)
        csum = B._cumsum_blocked_last(flat.T).T            # [T, 16*G]
        csum = jnp.concatenate(
            [jnp.zeros((1, csum.shape[1]), csum.dtype), csum], axis=0)
        lo = jnp.searchsorted(head_chunk, cid, side="left").astype(jnp.int32)
        hi = jnp.searchsorted(head_chunk, cid, side="right").astype(jnp.int32)
        merged = (csum[hi] - csum[lo]).reshape(NC, rows, G)
        return d_main + merged

    if has_t0:
        @jax.custom_vjp
        def raster_op(inst, tile_start, tile_count, tile_gid, t0):
            return fwd_call(inst, tile_start, tile_count, tile_gid, t0)

        def raster_fwd(inst, tile_start, tile_count, tile_gid, t0):
            out = fwd_call(inst, tile_start, tile_count, tile_gid, t0)
            return out, (inst, tile_start, tile_count, tile_gid, t0, out)

        def raster_bwd(res, gout):
            inst, tile_start, tile_count, tile_gid, t0, oraw = res
            d_main, d_head, d_t0 = bwd_call(inst, tile_start, tile_count,
                                            tile_gid, t0, gout, oraw)
            d_inst = _merge_head(tile_start, d_main, d_head)
            zero_i = np.zeros(tile_start.shape, jax_dtypes.float0)
            return d_inst, zero_i, zero_i, zero_i, d_t0
    else:
        @jax.custom_vjp
        def raster_op(inst, tile_start, tile_count, tile_gid):
            return fwd_call(inst, tile_start, tile_count, tile_gid, None)

        def raster_fwd(inst, tile_start, tile_count, tile_gid):
            out = fwd_call(inst, tile_start, tile_count, tile_gid, None)
            return out, (inst, tile_start, tile_count, tile_gid, out)

        def raster_bwd(res, gout):
            inst, tile_start, tile_count, tile_gid, oraw = res
            d_main, d_head = bwd_call(inst, tile_start, tile_count,
                                      tile_gid, None, gout, oraw)
            d_inst = _merge_head(tile_start, d_main, d_head)
            zero_i = np.zeros(tile_start.shape, jax_dtypes.float0)
            return d_inst, zero_i, zero_i, zero_i

    raster_op.defvjp(raster_fwd, raster_bwd)
    return raster_op


def instance_attrs(proj: Projected, row0=0, col0=0,
                   rows: int = None) -> jnp.ndarray:
    """[C, rows] per-Gaussian attribute matrix in the kernels' row layout
    (binning.ROW_*), coordinates rebased to (row0, col0).  The conic rows
    are pre-scaled (qa,qc by -0.5, qb by -1) so the kernel's quadratic form
    IS log w (see _chunk_alpha); the pack VJP chains the scale back.

    Default rows = STREAM_ROWS (10): only the differentiable data rides the
    pack gathers; the kernels synthesize ROW_ONE and the zero pads
    (_cmat_of).  rows = N_ROWS builds the legacy wide layout."""
    if rows is None:
        rows = N_ROWS if WIDE_STREAM else STREAM_ROWS
    data = [
        proj.means2d[:, 0] - jnp.float32(col0),    # ROW_X
        proj.means2d[:, 1] - jnp.float32(row0),    # ROW_Y
        -0.5 * proj.conic[:, 0],
        -proj.conic[:, 1],
        -0.5 * proj.conic[:, 2],
        proj.opacity,
        proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
        proj.depth,
    ]
    if rows > B.GRAD_ROWS:
        zeros = jnp.zeros_like(proj.depth)
        data = (data + [jnp.ones_like(proj.depth)]   # ROW_ONE
                + [zeros] * (rows - 11))
    return jnp.stack(data, axis=1)


def _widen_stream(inst: jnp.ndarray) -> jnp.ndarray:
    """[NC, GRAD_ROWS, G] packed data stream -> [NC, N_ROWS, G] kernel
    stream: append ROW_ONE (constant 1) and the zero pad rows as one cheap
    broadcast-concat instead of gathering them per instance (the pack lane
    gathers are the step's largest non-floor cost and scale with row
    count — 10/16 of the work; concat's autodiff slices the cotangent
    straight back to the data rows).  The HBM stream keeps the 16-row
    sublane-aligned layout Mosaic's DMA slicing requires (a [*,10,*]
    window is not 8-aligned and fails to compile on chip)."""
    NC, R, G = inst.shape
    if R >= N_ROWS:
        return inst
    return jnp.concatenate(
        [inst, jnp.ones((NC, 1, G), inst.dtype),
         jnp.zeros((NC, N_ROWS - R - 1, G), inst.dtype)], axis=1)


def rasterize_tiles(proj: Projected, H: int, W: int, bg: jnp.ndarray, *,
                    tile_size: int = 16, max_instances: int = 2 ** 18,
                    gaussian_chunk: int = 256, row0=0, col0=0,
                    full_height: int = None, full_width: int = None,
                    radius_max: float = 50.0, max_dup_per_axis: int = 0,
                    large_capacity: int = 0,
                    shard_axis: str = None, n_shards: int = 1,
                    exact_cull: bool = True,
                    interpret=None) -> dict:
    """Full Pallas raster path: binning -> fused tile kernel -> epilogue.
    Differentiable w.r.t. `proj` fields (instance packing is an XLA gather,
    whose transpose scatter-adds the kernel's per-instance gradients).

    row0/col0 (traced OK, tile_size multiples) select a band of a
    full_height x full_width image — the tile-sharded path.  With
    `shard_axis`/`n_shards` (inside shard_map, horizontal bands, col0=0)
    the candidate sort itself is sharded over the mesh and instances are
    routed home with one all_to_all (binning.bin_gaussians_sharded)."""
    if interpret is None:
        interpret = _interpret()
    tiles_x = -(-W // tile_size)
    tiles_y = -(-H // tile_size)
    num_tiles = tiles_x * tiles_y
    G = gaussian_chunk
    C = proj.means2d.shape[0]
    fh = full_height if full_height is not None else H
    fw = full_width if full_width is not None else W
    gtiles = (-(-fh // tile_size)) * (-(-fw // tile_size))
    use_sharded = (shard_axis is not None and n_shards > 1
                   and C % n_shards == 0 and (gtiles + 1) * C < 2 ** 31
                   and fh == H * n_shards)
    if use_sharded:
        b = B.bin_gaussians_sharded(proj, H, W, tile_size, max_instances, G,
                                    shard_axis, n_shards,
                                    radius_max=radius_max,
                                    full_height=fh, full_width=fw,
                                    max_dup_per_axis=max_dup_per_axis,
                                    large_capacity=large_capacity,
                                    exact_cull=exact_cull)
    else:
        b = B.bin_gaussians(proj, H, W, tile_size, max_instances, G,
                            radius_max=radius_max, row0=row0, col0=col0,
                            full_height=full_height, full_width=full_width,
                            max_dup_per_axis=max_dup_per_axis,
                            large_capacity=large_capacity,
                            exact_cull=exact_cull)
    K = b.s_rank.shape[0]
    assert K % G == 0, "binning pads the stream to whole kernel chunks"
    # binning rebases instance coordinates to the band, so the kernel always
    # rasterizes at local origin.
    # Per-Gaussian attribute matrix -> compact chunked instance stream via
    # the scatter-free custom-VJP gather (binning.pack_instances).  Stream
    # rows past n_live hold garbage copies but no tile's [start, start+count)
    # window reaches them, and the raster backward hard-zeros their
    # gradient chunks before the pack backward runs.
    attrs = instance_attrs(proj, row0, col0)       # [C, rows]
    # single-pass specialization: t0 == ones folded at trace time (no t0
    # operand, no row-5 transmittance write-out, no dt0 output)
    op = _make_raster_op(num_tiles, tiles_x, tile_size, G, K,
                         0, 0, interpret, has_t0=FORCE_T0)
    # static duplication bound = the binning path's per_axis**2 (pack bwd
    # sizes its masked doubling passes by it)
    if use_sharded:
        per_axis = B._per_axis_bound(radius_max, tile_size, max_dup_per_axis,
                                     -(-fw // tile_size), -(-fh // tile_size))
    else:
        per_axis = B._per_axis_bound(radius_max, tile_size, max_dup_per_axis,
                                     tiles_x, tiles_y)
    inst = _widen_stream(
        B.pack_instances(attrs, b.s_rank, b.rank_perm, b.rank_key,
                         b.seg_start_gid, b.counts_gid,
                         b.order, b.n_live, G,
                         per_axis * per_axis))     # [K//G, 16, G]
    tile_gid = jnp.arange(num_tiles, dtype=jnp.int32)
    if FORCE_T0:
        t0 = jnp.ones((num_tiles, 1, tile_size * tile_size), jnp.float32)
        acc = op(inst, b.tile_start, b.tile_count, tile_gid, t0)
    else:
        acc = op(inst, b.tile_start, b.tile_count, tile_gid)  # [T, 8, P]

    img = acc.reshape(tiles_y, tiles_x, N_ACC, tile_size, tile_size)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        N_ACC, tiles_y * tile_size, tiles_x * tile_size)[:, :H, :W]
    rgb, D, A = img[0:3], img[3], img[4]
    image = jnp.clip(rgb + (1.0 - A)[None] * bg[:, None, None], 0.0, 1.0)
    alpha = jnp.clip(A, 0.0, 1.0)[None]
    depth = (D / (A + 1e-6))[None]
    # instances lost to stream-capacity overflow: nonzero means the render
    # (and its gradients) silently miss instances — observable so trainers
    # can warn/log instead of degrading quietly (size max_instances up).
    # n_live (the live stream occupancy) drives the trainer's automatic
    # max_instances sizing: pack cost is linear in the STATIC stream
    # length, so an oversized hand-set ceiling taxes every step.
    return {"image": image, "alpha": alpha, "depth": depth,
            "n_dropped": jax.lax.stop_gradient(b.n_dropped),
            "n_dropped_large": jax.lax.stop_gradient(b.n_dropped_large),
            "n_large": jax.lax.stop_gradient(b.n_large),
            "n_live": jax.lax.stop_gradient(b.n_live)}
