"""Golden rasterizer: exact reference compositing semantics in pure jnp.

This is the numerical oracle for the Pallas kernels (BASELINE.md requires the
TPU kernels' forward image *and* pixel gradients to be allclose to it), and the
fallback compute path (`use_pallas=False`).

Reference semantics: `/root/reference/src/core/renderer.py:300-362` — per
pixel, in ascending-depth order: s = d^T Q d, w = clamp(exp(-0.5 s), 0, 1),
skip w < 1e-5, alpha = clamp(op*w, 0, 1), contrib = (1-A)*alpha, accumulate
rgb/alpha/depth, stop once A >= 0.995; then background composited *once*
(reference bug B6 fixed: init to zero, add (1-A)*bg at the end) and expected
depth = D/(A+1e-6) (renderer.py:357-362).

Vectorization: the sequential front-to-back loop is reformulated exactly with
an exclusive cumulative product of (1 - alpha) along the sorted Gaussian axis.
The early-stop `break` is the gate [A_before < 0.995]: since alphas are only
ever zeroed *after* the first crossing, the gated and ungated accumulated
alphas agree everywhere the gate can fire, so using the ungated transmittance
inside the gate reproduces the loop bit-for-bit.  A `lax.scan` over Gaussian
chunks keeps memory at O(pixels * chunk).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

EARLY_STOP_A = 0.995
W_EPS = 1e-5


def composite_chunk(px: jnp.ndarray, py: jnp.ndarray,
                    x: jnp.ndarray, y: jnp.ndarray,
                    qa: jnp.ndarray, qb: jnp.ndarray, qc: jnp.ndarray,
                    op: jnp.ndarray, valid: jnp.ndarray,
                    T_in: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared per-chunk compositing math.

    px/py: [P] pixel coords; gaussian attrs: [G]; T_in: [P] carry transmittance.
    Returns (contrib [P,G], T_out [P]).
    """
    dx = px[:, None] - x[None, :]
    dy = py[:, None] - y[None, :]
    s = dx * dx * qa[None, :] + 2.0 * dx * dy * qb[None, :] + dy * dy * qc[None, :]
    w = jnp.clip(jnp.exp(-0.5 * s), 0.0, 1.0)
    alpha = jnp.clip(op[None, :] * w, 0.0, 1.0)
    alpha = jnp.where((w >= W_EPS) & valid[None, :], alpha, 0.0)
    # exclusive cumprod of (1 - alpha) within the chunk
    one_minus = 1.0 - alpha
    cp = jnp.cumprod(one_minus, axis=-1)
    T_excl = jnp.concatenate([jnp.ones_like(cp[:, :1]), cp[:, :-1]], axis=-1)
    T_before = T_in[:, None] * T_excl
    gate = (1.0 - T_before) < EARLY_STOP_A
    contrib = T_before * alpha * gate
    T_out = T_in * cp[:, -1]
    return contrib, T_out


def rasterize_pixels(px: jnp.ndarray, py: jnp.ndarray,
                     means2d: jnp.ndarray, conic: jnp.ndarray,
                     depth: jnp.ndarray, color: jnp.ndarray,
                     opacity: jnp.ndarray, visible: jnp.ndarray,
                     chunk: int = 512):
    """Composite all Gaussians (depth-sorted internally) onto pixels [P].

    Returns (rgb [P,3], alpha [P], depth_accum [P]) — pre-background,
    pre-normalization.
    """
    C = means2d.shape[0]
    # Depth sort with invisible points pushed to the back and zeroed.
    sort_key = jnp.where(visible, depth, jnp.inf)
    order = jnp.argsort(sort_key)
    x = means2d[order, 0]
    y = means2d[order, 1]
    qa, qb, qc = conic[order, 0], conic[order, 1], conic[order, 2]
    op = opacity[order]
    col = color[order]
    dep = depth[order]
    val = visible[order]

    pad = (-C) % chunk
    if pad:
        x = jnp.pad(x, (0, pad))
        y = jnp.pad(y, (0, pad))
        qa = jnp.pad(qa, (0, pad))
        qb = jnp.pad(qb, (0, pad))
        qc = jnp.pad(qc, (0, pad))
        op = jnp.pad(op, (0, pad))
        col = jnp.pad(col, ((0, pad), (0, 0)))
        dep = jnp.pad(dep, (0, pad))
        val = jnp.pad(val, (0, pad))
    n_chunks = (C + pad) // chunk

    def body(carry, chunk_data):
        T, rgb, A, D = carry
        cx, cy_, cqa, cqb, cqc, cop, ccol, cdep, cval = chunk_data
        contrib, T = composite_chunk(px, py, cx, cy_, cqa, cqb, cqc, cop, cval, T)
        rgb = rgb + contrib @ ccol
        A = A + contrib.sum(-1)
        D = D + contrib @ cdep
        return (T, rgb, A, D), None

    P = px.shape[0]
    init = (jnp.ones((P,)), jnp.zeros((P, 3)), jnp.zeros((P,)), jnp.zeros((P,)))
    chunked = lambda a: a.reshape((n_chunks, chunk) + a.shape[1:])
    (T, rgb, A, D), _ = jax.lax.scan(
        body, init, (chunked(x), chunked(y), chunked(qa), chunked(qb),
                     chunked(qc), chunked(op), chunked(col), chunked(dep),
                     chunked(val)))
    return rgb, A, D


def rasterize_image(means2d, conic, depth, color, opacity, visible,
                    height: int, width: int, bg: jnp.ndarray,
                    row0: int = 0, col0: int = 0, chunk: int = 512):
    """Full-image golden raster. Returns dict(image [3,H,W], alpha [1,H,W],
    depth [1,H,W]).  row0/col0 offset pixel coordinates for tile-sharded
    sub-images."""
    ys, xs = jnp.meshgrid(jnp.arange(height, dtype=jnp.float32) + row0,
                          jnp.arange(width, dtype=jnp.float32) + col0,
                          indexing="ij")
    px = xs.reshape(-1)
    py = ys.reshape(-1)
    rgb, A, D = rasterize_pixels(px, py, means2d, conic, depth, color,
                                 opacity, visible, chunk=chunk)
    image = rgb + (1.0 - A)[:, None] * bg[None, :]
    image = jnp.clip(image, 0.0, 1.0).reshape(height, width, 3).transpose(2, 0, 1)
    alpha = jnp.clip(A, 0.0, 1.0).reshape(1, height, width)
    depth_out = (D / (A + 1e-6)).reshape(1, height, width)
    return {"image": image, "alpha": alpha, "depth": depth_out}
