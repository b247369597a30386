"""Loss tests: SSIM identity/symmetry properties and the combined loss
(reference `/root/reference/src/core/loss.py`, with B11 — the missing
return — fixed: dssim must be a real scalar loss)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini3dgs_tpu.core.loss import dssim, gaussian_loss, ssim


def test_ssim_identical_images_is_one():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)).astype(np.float32))
    assert float(ssim(img, img)) > 0.9999
    assert abs(float(dssim(img, img))) < 1e-4


def test_ssim_decreases_with_noise():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (3, 64, 64)).astype(np.float32))
    noisy1 = img + 0.05 * jnp.asarray(rng.standard_normal((3, 64, 64)).astype(np.float32))
    noisy2 = img + 0.3 * jnp.asarray(rng.standard_normal((3, 64, 64)).astype(np.float32))
    s1, s2 = float(ssim(img, noisy1)), float(ssim(img, noisy2))
    assert 1.0 > s1 > s2 > 0.0


def _ssim_numpy_oracle(a: np.ndarray, b: np.ndarray, K: int = 11) -> float:
    """Independent float64 NumPy SSIM: explicit per-pixel window loops, same
    definition as core/loss.py (Gaussian window sigma=K/6, zero 'same'
    padding, C1=0.01^2, C2=0.03^2, map clamped to [0,1]).  Slow but it
    shares no code with the JAX implementation, replacing the skimage
    cross-check (scikit-image is not installable here)."""
    x = np.arange(K, dtype=np.float64) - (K - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * (K / 6.0) ** 2))
    g /= g.sum()
    w = np.outer(g, g)
    pad = K // 2
    ap = np.pad(a.astype(np.float64), pad)
    bp = np.pad(b.astype(np.float64), pad)
    H, W = a.shape
    total = 0.0
    for i in range(H):
        for j in range(W):
            wa = ap[i:i + K, j:j + K]
            wb = bp[i:i + K, j:j + K]
            mx, my = (w * wa).sum(), (w * wb).sum()
            sx = (w * wa * wa).sum() - mx * mx
            sy = (w * wb * wb).sum() - my * my
            sxy = (w * wa * wb).sum() - mx * my
            val = ((2 * mx * my + 0.01 ** 2) * (2 * sxy + 0.03 ** 2)) / (
                (mx * mx + my * my + 0.01 ** 2) * (sx + sy + 0.03 ** 2))
            total += min(max(val, 0.0), 1.0)
    return total / (H * W)


def test_ssim_matches_independent_oracle():
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (24, 24)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((24, 24)).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a)[None], jnp.asarray(b)[None]))
    oracle = _ssim_numpy_oracle(a, b)
    assert abs(ours - oracle) < 2e-5, (ours, oracle)


def test_gaussian_loss_combination():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    total, parts = gaussian_loss(pred, target, lambda_dssim=0.2)
    np.testing.assert_allclose(
        float(total), 0.8 * float(parts["l1"]) + 0.2 * float(parts["dssim"]),
        rtol=1e-6)
    assert float(gaussian_loss(pred, pred)[0]) < 1e-4


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_banded_loss_matches_global():
    """gaussian_loss_banded (5-row SSIM halo exchange over a tile mesh) must
    equal gaussian_loss on the full image — values AND gradients."""
    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    from mini3dgs_tpu.core.loss import gaussian_loss, gaussian_loss_banded

    rng = np.random.default_rng(7)
    H = W = 64
    pred = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (3, H, W)).astype(np.float32))

    mesh = Mesh(np.asarray(jax.devices()[:4]), axis_names=("tile",))
    bh = H // 4

    def banded(p, t):
        total, parts = gaussian_loss_banded(p, t, H, "tile")
        return total, parts

    f = shard_map(banded, mesh=mesh, in_specs=(P(None, "tile"), P(None, "tile")),
                  out_specs=(P(), P()), check_vma=False)

    total_b, parts_b = jax.jit(f)(pred, target)
    total_g, parts_g = gaussian_loss(pred, target)
    np.testing.assert_allclose(float(total_b), float(total_g), rtol=1e-6)
    np.testing.assert_allclose(float(parts_b["dssim"]), float(parts_g["dssim"]),
                               rtol=1e-6)
    np.testing.assert_allclose(float(parts_b["l1"]), float(parts_g["l1"]),
                               rtol=1e-6)

    # gradients w.r.t. the prediction
    g_b = jax.jit(jax.grad(lambda p: f(p, target)[0]))(pred)
    g_g = jax.grad(lambda p: gaussian_loss(p, target)[0])(pred)
    np.testing.assert_allclose(np.asarray(g_b), np.asarray(g_g),
                               atol=1e-7, rtol=1e-4)
