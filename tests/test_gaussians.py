"""Gaussian model property tests (reference `tests/test_gaussian_model.py`):
shapes, activation ranges, covariance PSD + R diag(s^2) R^T, SH evaluation."""

import jax
import jax.numpy as jnp
import numpy as np

from mini3dgs_tpu.core import sh as sh_lib
from mini3dgs_tpu.core.gaussians import (Gaussians, create_from_random,
                                         reset_opacity, scene_extent_of)
from mini3dgs_tpu.core.transforms import build_covariance_3d, quat_to_rotmat


def quat_to_rot_oracle(q):
    """Independent quaternion->rotation re-implementation (oracle), as in
    reference tests/test_gaussian_model.py:12-24."""
    q = np.asarray(q, np.float64)
    q = q / np.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = np.empty(q.shape[:-1] + (3, 3))
    R[..., 0, 0] = 1 - 2 * (y * y + z * z)
    R[..., 0, 1] = 2 * (x * y - w * z)
    R[..., 0, 2] = 2 * (x * z + w * y)
    R[..., 1, 0] = 2 * (x * y + w * z)
    R[..., 1, 1] = 1 - 2 * (x * x + z * z)
    R[..., 1, 2] = 2 * (y * z - w * x)
    R[..., 2, 0] = 2 * (x * z - w * y)
    R[..., 2, 1] = 2 * (y * z + w * x)
    R[..., 2, 2] = 1 - 2 * (x * x + y * y)
    return R


def make_model(n=32, capacity=64):
    return create_from_random(jax.random.PRNGKey(0), n, scene_extent=2.0,
                              capacity=capacity)


def test_shapes_and_capacity():
    g = make_model(32, 64)
    assert g.xyz.shape == (64, 3)
    assert g.features_dc.shape == (64, 1, 3)
    assert g.features_rest.shape == (64, 15, 3)
    assert g.scaling.shape == (64, 3)
    assert g.rotation.shape == (64, 4)
    assert g.opacity.shape == (64, 1)
    assert g.alive.dtype == bool
    assert int(g.num_alive()) == 32
    assert g.get_features.shape == (64, 16, 3)


def test_activation_ranges():
    g = make_model()
    alive = np.asarray(g.alive)
    sigma = np.asarray(g.get_scaling)[alive]
    assert np.all(sigma > 0)
    q = np.asarray(g.get_rotation)[alive]
    np.testing.assert_allclose(np.linalg.norm(q, axis=-1), 1.0, atol=1e-5)
    op = np.asarray(g.get_opacity)[alive]
    assert np.all((op > 0) & (op < 1))


def test_quat_to_rotmat_matches_oracle():
    rng = np.random.default_rng(0)
    q = rng.standard_normal((100, 4)).astype(np.float32)
    R = np.asarray(quat_to_rotmat(jnp.asarray(q)))
    R_ref = quat_to_rot_oracle(q)
    np.testing.assert_allclose(R, R_ref, atol=1e-5)
    # orthonormality
    eye = np.einsum("nij,nkj->nik", R, R)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (100, 1, 1)), atol=1e-5)


def test_covariance_psd_and_structure():
    g = make_model()
    cov = np.asarray(g.get_covariance)
    alive = np.asarray(g.alive)
    cov = cov[alive]
    np.testing.assert_allclose(cov, np.swapaxes(cov, -1, -2), atol=1e-5)
    eigs = np.linalg.eigvalsh(cov)
    assert np.all(eigs > -1e-8)
    # explicit R diag(s^2) R^T check
    sigma = np.asarray(g.get_scaling)[alive]
    R = quat_to_rot_oracle(np.asarray(g.rotation)[alive])
    expected = np.einsum("nij,nj,nkj->nik", R, sigma ** 2, R)
    np.testing.assert_allclose(cov, expected, atol=1e-5)


def test_reset_opacity():
    g = make_model()
    g2 = reset_opacity(g, 0.01)
    op = np.asarray(g2.get_opacity)[np.asarray(g2.alive)]
    np.testing.assert_allclose(op, 0.01, atol=1e-6)


def test_scene_extent():
    g = make_model()
    ext = float(scene_extent_of(g))
    xyz = np.asarray(g.xyz)[np.asarray(g.alive)]
    np.testing.assert_allclose(ext, (xyz.max(0) - xyz.min(0)).mean(), rtol=1e-6)


def test_sh_degree0_matches_dc():
    rng = np.random.default_rng(0)
    coeffs = jnp.asarray(rng.standard_normal((10, 16, 3)).astype(np.float32))
    dirs = jnp.asarray(rng.standard_normal((10, 3)).astype(np.float32))
    out = sh_lib.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(np.asarray(out),
                               sh_lib.C0 * np.asarray(coeffs)[:, 0, :], atol=1e-6)


def test_sh_orthogonality_integrals():
    """Monte-Carlo check that the implemented basis is orthonormal on S^2
    (validates every hard-coded constant through degree 3)."""
    rng = np.random.default_rng(0)
    v = rng.standard_normal((50000, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    dirs = jnp.asarray(v.astype(np.float32))
    basis = []
    for k in range(16):
        coeffs = jnp.zeros((1, 16, 3)).at[0, k, 0].set(1.0)
        coeffs = jnp.broadcast_to(coeffs, (v.shape[0], 16, 3))
        basis.append(np.asarray(sh_lib.eval_sh(3, coeffs, dirs))[:, 0])
    B = np.stack(basis, axis=1)  # [S, 16]
    gram = (B.T @ B) / v.shape[0] * 4 * np.pi
    np.testing.assert_allclose(gram, np.eye(16), atol=0.25)


def test_project_covariance_2d_matches_manual():
    from mini3dgs_tpu.core.transforms import project_covariance_2d
    rng = np.random.default_rng(0)
    cov = rng.standard_normal((5, 3, 3)).astype(np.float32)
    cov = cov @ np.swapaxes(cov, -1, -2)
    Rv = np.linalg.qr(rng.standard_normal((3, 3)))[0].astype(np.float32)
    J = rng.standard_normal((5, 2, 3)).astype(np.float32)
    out = np.asarray(project_covariance_2d(jnp.asarray(cov), jnp.asarray(Rv),
                                           jnp.asarray(J)))
    expected = np.einsum("nij,jk,nkl,ml,nom->nio".replace("o","p"),
                         J, Rv, cov, Rv, J) if False else \
        np.stack([J[i] @ Rv @ cov[i] @ Rv.T @ J[i].T for i in range(5)])
    np.testing.assert_allclose(out, expected, atol=1e-4)


def test_size_mask_quantile():
    from mini3dgs_tpu.train.density import size_mask_quantile
    g = make_model(32, 64)
    rng = np.random.default_rng(0)
    # varied sizes (random init gives uniform sigma -> nothing beats median)
    scal = np.array(g.scaling)
    scal[:32] = rng.uniform(-4, -1, (32, 3))
    g = g.replace(scaling=jnp.asarray(scal))
    mask = np.asarray(size_mask_quantile(g, 0.5))
    alive = np.asarray(g.alive)
    assert not np.any(mask[~alive])
    # roughly half the alive gaussians exceed the median size
    frac = mask[alive].mean()
    assert 0.2 <= frac <= 0.8


def test_compact_preserves_render_and_shrinks():
    """compact() packs alive slots to the front and shrinks the pool; the
    rendered image must be IDENTICAL (dead slots emit nothing) — the
    load-time answer to checkpoints written mid-growth at low occupancy
    (per-Gaussian stage cost scales with capacity, not live count)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from mini3dgs_tpu.core.gaussians import compact
    from mini3dgs_tpu.ops.renderer import RenderSettings, render
    from tests.test_raster_pallas import random_scene
    from tests.test_render_golden import identity_camera

    g = random_scene(60, seed=4)
    alive = np.array(np.asarray(g.alive))
    alive[::3] = False          # fragmented pool
    g = g.replace(alive=jnp.asarray(alive))
    gc = compact(g)
    assert int(gc.num_alive()) == int(alive.sum())
    assert gc.capacity == 64    # next pow2 over 40 * 1.25
    assert bool(np.all(np.asarray(gc.alive)[:int(alive.sum())]))
    cam = identity_camera(64, 64, 70.0)
    s = RenderSettings(image_height=64, image_width=64, use_pallas=True,
                       max_instances=4096, gaussian_chunk=32)
    a = np.asarray(render(g, cam, s)["image"])
    b = np.asarray(render(gc, cam, s)["image"])
    np.testing.assert_array_equal(a, b)
    # stat buffers ride along with their slots
    np.testing.assert_array_equal(
        np.asarray(gc.max_radii2D)[:int(alive.sum())],
        np.asarray(g.max_radii2D)[np.flatnonzero(alive)])
