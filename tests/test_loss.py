"""Loss tests: SSIM identity/symmetry properties and the combined loss
(reference `/root/reference/src/core/loss.py`, with B11 — the missing
return — fixed: dssim must be a real scalar loss)."""

import jax.numpy as jnp
import numpy as np

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


def test_ssim_matches_skimage_when_available():
    try:
        from skimage.metrics import structural_similarity
    except ImportError:
        import pytest
        pytest.skip("scikit-image not installed")
    rng = np.random.default_rng(1)
    a = rng.uniform(0, 1, (64, 64)).astype(np.float32)
    b = np.clip(a + 0.1 * rng.standard_normal((64, 64)).astype(np.float32), 0, 1)
    ours = float(ssim(jnp.asarray(a)[None], jnp.asarray(b)[None]))
    theirs = structural_similarity(a, b, data_range=1.0, gaussian_weights=True,
                                   win_size=11, sigma=11 / 6,
                                   use_sample_covariance=False)
    # Different padding at borders (zero-pad vs reflect); interior dominates.
    assert abs(ours - theirs) < 0.03


def test_gaussian_loss_combination():
    rng = np.random.default_rng(0)
    pred = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    target = jnp.asarray(rng.uniform(0, 1, (3, 32, 32)).astype(np.float32))
    total, parts = gaussian_loss(pred, target, lambda_dssim=0.2)
    np.testing.assert_allclose(
        float(total), 0.8 * float(parts["l1"]) + 0.2 * float(parts["dssim"]),
        rtol=1e-6)
    assert float(gaussian_loss(pred, pred)[0]) < 1e-4
