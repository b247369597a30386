"""Cost map of the raster kernel internals at the bench config: slope-measure
the full fwd+bwd step with individual kernel stages monkeypatched to no-ops
(numerics intentionally wrong — this measures WHERE the time goes, the
difference vs baseline is each stage's cost)."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from mini3dgs_tpu.ops import raster_pallas as R


def slope(body_of_scalar, name, k1=2, k2=12, reps=3):
    @partial(jax.jit, static_argnames="iters")
    def run(s, iters):
        return jax.lax.fori_loop(0, iters, lambda i, c: body_of_scalar(c, i),
                                 s)

    for iters in (k1, k2):
        float(run(jnp.float32(0.5), iters))
    pers = []
    for j in range(reps):
        s1 = jnp.float32(0.1 + 0.01 * j)
        s2 = jnp.float32(0.2 + 0.01 * j)
        t0 = time.perf_counter()
        float(run(s1, k1))
        t1 = time.perf_counter()
        float(run(s2, k2))
        t2 = time.perf_counter()
        pers.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    per = float(np.median(pers))
    print(f"{name:40s} {per * 1e3:8.2f} ms", flush=True)
    return per


def _transmittance_free(one_minus, T):
    return (jnp.broadcast_to(T, one_minus.shape), T * one_minus[:, -1:],
            one_minus)


def _uw_prefix_free(uw):
    return uw


def _bwd_moments_free(gout, Mpix, ones_row, wgt, d_lw, d_op_pix):
    # keep legally-shaped expressions with a data dependency but no matmul
    G = wgt.shape[1]
    s = wgt[0, 0] + d_lw[0, 0] + d_op_pix[0, 0]
    NA = gout.shape[0]
    return (jnp.zeros((NA, G), jnp.float32) + s,
            jnp.zeros((6, G), jnp.float32) + s, d_op_pix[:1, :])


def _bwd_moments_default(gout, Mpix, ones_row, wgt, d_lw, d_op_pix):
    # everything at DEFAULT (bf16 operand) precision — fails on-chip grad
    # parity (23% xyz) but measures the _dot3 cost of the precise version
    dims = (((1,), (0,)), ((), ()))
    d = lambda a, b: jax.lax.dot_general(
        a, b, dims, preferred_element_type=jnp.float32)
    return d(gout, wgt), d(Mpix, d_lw), d(ones_row, d_op_pix)


def _bwd_moments_fused3(gout, Mpix, ones_row, wgt, d_lw, d_op_pix):
    """All three pixel reductions as ONE block-diagonal [15,3P]x[3P,G]
    matmul.  Numerically CORRECT (zero off-blocks) — a production candidate
    if the per-matmul pipeline fill dominates (v15 measured the moment
    matmul fill-bound at ~11% MXU utilization); the original fused form
    failed to compile under the old 16MB scoped-vmem limit, now 100MB."""
    NA, P = gout.shape
    z = lambda r, c: jnp.zeros((r, c), jnp.float32)
    A = jnp.concatenate([
        jnp.concatenate([gout, z(NA, 2 * P)], axis=1),
        jnp.concatenate([z(6, P), Mpix, z(6, P)], axis=1),
        jnp.concatenate([z(1, 2 * P), ones_row], axis=1)], axis=0)
    R = jnp.concatenate([wgt, d_lw, d_op_pix], axis=0)
    out = jax.lax.dot_general(A, R, (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    return out[:NA], out[NA:NA + 6], out[NA + 6:]


def _d_alpha_mult(u, T_before, gate, S, lg):
    # exp replaced by a multiply (wrong numerics, same shapes/ops count-1)
    return u * T_before * gate - S * (2.0 - lg)


def _chunk_alpha_poly(ch, px, py, head, count, ci, G):
    """_chunk_alpha with exp replaced by a 3-multiply polynomial (wrong
    numerics; measures the [P,G] exp cost in fwd AND bwd)."""
    B = R.B
    x = ch[B.ROW_X:B.ROW_X + 1, :]
    y = ch[B.ROW_Y:B.ROW_Y + 1, :]
    qa = ch[B.ROW_QA:B.ROW_QA + 1, :]
    qb = ch[B.ROW_QB:B.ROW_QB + 1, :]
    qc = ch[B.ROW_QC:B.ROW_QC + 1, :]
    op = ch[B.ROW_OP:B.ROW_OP + 1, :]
    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) + ci * G
    valid = (lidx >= head) & (lidx < head + count)
    dx = px - x
    dy = py - y
    lw = dx * dx * qa + dx * dy * qb + dy * dy * qc
    t = jnp.maximum(1.0 + lw * 0.125, 0.0)
    t2 = t * t
    t4 = t2 * t2
    w = jnp.minimum(t4 * t4, 1.0)          # ~exp(lw), 4 mults
    a_raw = op * w
    alpha = jnp.where((w >= R.W_EPS) & valid, jnp.minimum(a_raw, 1.0), 0.0)
    return dict(x=x, y=y, qa=qa, qb=qb, qc=qc, op=op, w=w,
                a_raw=a_raw, alpha=alpha, valid=valid)


_LOG2E = 1.4426950408889634


def _chunk_alpha_exp2(ch, px, py, head, count, ci, G):
    """exp -> exp2 (the ablation pays one extra [P,G] multiply for the
    log2(e) fold that production would bake into the packed conic rows)."""
    B = R.B
    x = ch[B.ROW_X:B.ROW_X + 1, :]
    y = ch[B.ROW_Y:B.ROW_Y + 1, :]
    qa = ch[B.ROW_QA:B.ROW_QA + 1, :]
    qb = ch[B.ROW_QB:B.ROW_QB + 1, :]
    qc = ch[B.ROW_QC:B.ROW_QC + 1, :]
    op = ch[B.ROW_OP:B.ROW_OP + 1, :]
    lidx = jax.lax.broadcasted_iota(jnp.int32, (1, G), 1) + ci * G
    valid = (lidx >= head) & (lidx < head + count)
    dx = px - x
    dy = py - y
    lw = dx * dx * qa + dx * dy * qb + dy * dy * qc
    w = jnp.minimum(jnp.exp2(lw * _LOG2E), 1.0)
    a_raw = op * w
    alpha = jnp.where((w >= R.W_EPS) & valid, jnp.minimum(a_raw, 1.0), 0.0)
    return dict(x=x, y=y, qa=qa, qb=qb, qc=qc, op=op, w=w,
                a_raw=a_raw, alpha=alpha, valid=valid)


def _transmittance_exp2(one_minus, T):
    lg = jnp.log2(jnp.maximum(one_minus, 1e-30))
    pre = R._prefix_blocked(lg, strict=True)
    T_before = T * jnp.exp2(pre)
    T_new = T * jnp.exp2(pre[:, -1:] + lg[:, -1:])
    return T_before, T_new, lg


def _d_alpha_exp2(u, T_before, gate, S, lg):
    return u * T_before * gate - S * jnp.exp2(-lg)


# Measured 2026-08-19 (bench config, deltas vs same-run baseline):
#   moment matmul free        -2.4 ms   (concat suspected, not flops)
#   moments bf16 inputs       +0.5      (casts cost more than they save)
#   moments precision HIGHEST +2.6      (default is already the fast path)
#   d_alpha exp -> multiply   -0.9..0   (reciprocal-exp ~free to ~1ms)
#   exp -> exp2 everywhere    +0.6      (hardware exp is already exp2-fast)
#   early stop off            +0.6..1.5 (keep early stop)
#   transmittance prefix free -0.2, uw prefix free -0.15 (MXU prefixes free)
ABLATIONS = [
    ("baseline", {}),
    # Upper bound of ANY stream-byte-shrinking lever (bf16 substream, row
    # packing): halve the chunk DMA bytes.  Numerically wrong (stale
    # scratch rows) — if the step doesn't move, the DMAs are fully
    # overlapped and ROADMAP item 5 (bf16 stream) is dead by measurement.
    ("chunk DMA halved (8/16 rows)", {"DMA_ROWS": 8}),
    # Numerically-correct production candidate: one fused block-diagonal
    # matmul for all three bwd pixel reductions (fill-bound hypothesis).
    ("bwd moments fused 1-matmul", {"_bwd_moments": _bwd_moments_fused3}),
    # (the v15-era "moment matmul -> free" degenerate variant now trips a
    # Mosaic vector_extract_slice check under the round-3 kernels — it is
    # an intentionally-wrong shape probe, dropped rather than chased)
]


def main():
    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    W = H = 800
    g, cam = _scene(capacity=2 ** 17, n=100_000, width=W, height=H)
    settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                              max_instances=2 ** 19, gaussian_chunk=256,
                              tile_size=32, max_dup_per_axis=3)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    def full_loss(params):
        out = render(g.with_params(params), cam, settings)
        return jnp.abs(out["image"] - target).mean()

    gfull = jax.grad(full_loss)

    def pf(s, i):
        d = gfull({**params0, "xyz": params0["xyz"] * (1.0 + s * 1e-9)})
        return jnp.sum(d["xyz"]) * 1e-12 + s

    saved = {}
    for name, patches in ABLATIONS:
        for attr, fn in patches.items():
            saved[attr] = getattr(R, attr)
            setattr(R, attr, fn)
        R._make_raster_op.cache_clear()
        try:
            slope(pf, name)
        finally:
            for attr in patches:
                setattr(R, attr, saved[attr])


if __name__ == "__main__":
    main()
