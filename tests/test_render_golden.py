"""Golden renderer tests.

Ports the reference's analytic compositing oracle
(`/root/reference/tests/test_renderer.py:127-161`) and adds a brute-force
sequential Python oracle that replicates the reference raster loop
(renderer.py:300-362, with bug B6's double background fixed) to validate the
vectorized cumprod reformulation on random scenes.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mini3dgs_tpu.core.camera import Camera
from mini3dgs_tpu.core.gaussians import Gaussians, create_from_random
from mini3dgs_tpu.ops.projection import project_gaussians
from mini3dgs_tpu.ops.renderer import RenderSettings, render


def make_gaussians(xyz, sigmas, colors_dc, opacities, capacity=None):
    """Dummy-Gaussian equivalent (reference tests/test_renderer.py:17-53):
    diagonal covariance (identity rotation), DC-only color logits, explicit
    opacities (stored as logits)."""
    xyz = np.asarray(xyz, np.float32)
    n = xyz.shape[0]
    capacity = capacity or n
    sigmas = np.asarray(sigmas, np.float32)
    colors = np.asarray(colors_dc, np.float32)
    op = np.clip(np.asarray(opacities, np.float32).reshape(n, 1), 1e-6, 1 - 1e-6)
    base = Gaussians(
        xyz=jnp.zeros((capacity, 3)),
        features_dc=jnp.zeros((capacity, 1, 3)),
        features_rest=jnp.zeros((capacity, 15, 3)),
        scaling=jnp.full((capacity, 3), -10.0),
        rotation=jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (capacity, 1)),
        opacity=jnp.full((capacity, 1), -10.0),
        alive=jnp.zeros((capacity,), bool),
        xyz_gradient_accum=jnp.zeros((capacity,)),
        denom=jnp.zeros((capacity,)),
        max_radii2D=jnp.zeros((capacity,)),
    )
    return base.replace(
        xyz=base.xyz.at[:n].set(xyz),
        features_dc=base.features_dc.at[:n, 0].set(colors),
        scaling=base.scaling.at[:n].set(np.log(sigmas)),
        opacity=base.opacity.at[:n].set(np.log(op / (1 - op))),
        alive=base.alive.at[:n].set(True),
    )


def identity_camera(w=64, h=64, fov_deg=60.0):
    return Camera.create(0, np.eye(3), np.zeros(3), math.radians(fov_deg),
                         math.radians(fov_deg), width=w, height=h)


def settings_for(cam, **kw):
    return RenderSettings(image_height=cam.height, image_width=cam.width, **kw)


class TestGoldenRenderer:
    def test_shapes_and_types(self):
        cam = identity_camera()
        gs = make_gaussians([[0, 0, 1.0]], [[0.01] * 3], [[1.0] * 3], [0.8])
        out = render(gs, cam, settings_for(cam))
        H = W = 64
        assert out["image"].shape == (3, H, W)
        assert out["alpha"].shape == (1, H, W)
        assert out["depth"].shape == (1, H, W)
        assert out["viewspace_points"].shape[1] == 2
        assert out["visibility_filter"].dtype == jnp.bool_
        assert out["radii"].ndim == 1
        assert out["conics"].shape[-1] == 3

    def test_culling_all_behind(self):
        cam = identity_camera()
        gs = make_gaussians([[0, 0, -1.0], [0, 0, -2.0]], [[0.01] * 3] * 2,
                            [[1, 0, 0], [0, 1, 0]], [0.5, 0.5])
        out = render(gs, cam, settings_for(cam))
        assert np.count_nonzero(np.asarray(out["alpha"])) == 0
        np.testing.assert_allclose(np.asarray(out["image"]), 0.0)
        assert not np.any(np.asarray(out["visibility_filter"]))

    def test_front_to_back_blending_center_pixel(self):
        """Analytic oracle (reference tests/test_renderer.py:127-161):
        two co-centered Gaussians, near red at Z=1 and far green at Z=2,
        opacity 0.5 each -> alpha=0.75, rgb=0.5*sig(c0)+0.25*sig(c1),
        depth=4/3."""
        cam = identity_camera()
        gs = make_gaussians([[0, 0, 1.0], [0, 0, 2.0]], [[0.01] * 3] * 2,
                            [[1, 0, 0], [0, 1, 0]], [0.5, 0.5])
        # note: make_gaussians stores opacity as logit(0.5)=0 -> sigmoid=0.5 ✓
        out = render(gs, cam, settings_for(cam))
        cx = cy = 32
        a = float(out["alpha"][0, cy, cx])
        rgb = np.asarray(out["image"][:, cy, cx])
        d = float(out["depth"][0, cy, cx])
        np.testing.assert_allclose(a, 0.75, atol=1e-3)
        s0 = 1 / (1 + np.exp(-np.array([1.0, 0, 0])))
        s1 = 1 / (1 + np.exp(-np.array([0, 1.0, 0])))
        np.testing.assert_allclose(rgb, 0.5 * s0 + 0.25 * s1, atol=1e-3)
        np.testing.assert_allclose(d, 4 / 3, atol=2e-2)

    def test_background_composited_once(self):
        """Reference bug B6 fixed: with a non-zero bg and an empty foreground,
        the image must equal bg exactly (not 2*bg)."""
        cam = identity_camera(32, 32)
        gs = make_gaussians([[0, 0, -1.0]], [[0.01] * 3], [[1, 1, 1]], [0.9])
        st = settings_for(cam, bg_color=jnp.array([0.25, 0.5, 0.75]))
        out = render(gs, cam, st)
        img = np.asarray(out["image"])
        np.testing.assert_allclose(img[0], 0.25, atol=1e-6)
        np.testing.assert_allclose(img[1], 0.5, atol=1e-6)
        np.testing.assert_allclose(img[2], 0.75, atol=1e-6)


def brute_force_raster(proj, H, W, bg):
    """Direct Python re-implementation of the reference compositing loop
    (renderer.py:300-362), as the independent sequential oracle."""
    means2d = np.asarray(proj.means2d)
    conic = np.asarray(proj.conic)
    depth = np.asarray(proj.depth)
    color = np.asarray(proj.color)
    op = np.asarray(proj.opacity)
    vis = np.asarray(proj.visible)
    radius = np.asarray(proj.radius)
    idx = np.nonzero(vis)[0]
    idx = idx[np.argsort(depth[idx], kind="stable")]
    # reference tile binning (renderer.py:277-298): gaussian i composites on
    # pixel (xx,yy) iff that pixel's tile is inside i's clamped tile AABB.
    T = 16
    bounds = {}
    for i in idx:
        r = int(radius[i])
        x0 = max(int(means2d[i, 0]) - r, 0)
        x1 = min(int(means2d[i, 0]) + 1 + r, W)
        y0 = max(int(means2d[i, 1]) - r, 0)
        y1 = min(int(means2d[i, 1]) + 1 + r, H)
        if x0 >= x1 or y0 >= y1:
            bounds[i] = None
        else:
            bounds[i] = (x0 // T, (x1 - 1) // T, y0 // T, (y1 - 1) // T)
    rgb = np.zeros((H, W, 3))
    A = np.zeros((H, W))
    D = np.zeros((H, W))
    for yy in range(H):
        for xx in range(W):
            a_acc = 0.0
            for i in idx:
                b = bounds[i]
                if b is None or not (b[0] <= xx // T <= b[1]
                                     and b[2] <= yy // T <= b[3]):
                    continue
                dx = xx - means2d[i, 0]
                dy = yy - means2d[i, 1]
                s = dx * dx * conic[i, 0] + 2 * dx * dy * conic[i, 1] + dy * dy * conic[i, 2]
                w = min(max(math.exp(-0.5 * s), 0.0), 1.0)
                if w < 1e-5:
                    continue
                a_i = min(max(op[i] * w, 0.0), 1.0)
                if a_i <= 0:
                    continue
                contrib = (1.0 - a_acc) * a_i
                if contrib <= 0:
                    continue
                rgb[yy, xx] += contrib * color[i]
                a_acc += contrib
                D[yy, xx] += contrib * depth[i]
                if a_acc >= 0.995:
                    break
            A[yy, xx] = a_acc
    image = np.clip(rgb + (1 - A)[..., None] * bg[None, None, :], 0, 1)
    return image.transpose(2, 0, 1), A, D / (A + 1e-6)


def test_vectorized_matches_sequential_oracle():
    """The cumprod/gating reformulation must match the reference's sequential
    loop on a dense random scene that actually exercises early stopping."""
    cam = identity_camera(24, 24, 70.0)
    rng = np.random.default_rng(3)
    n = 60
    xyz = np.concatenate([rng.uniform(-0.4, 0.4, (n, 2)),
                          rng.uniform(0.5, 3.0, (n, 1))], axis=1)
    sig = rng.uniform(0.02, 0.15, (n, 3))
    col = rng.uniform(0, 1, (n, 3))
    op = rng.uniform(0.3, 0.98, n)
    gs = make_gaussians(xyz, sig, col, op)
    proj = project_gaussians(gs, cam)
    bg = np.array([0.1, 0.2, 0.3], np.float32)
    out = render(gs, cam, settings_for(cam, bg_color=jnp.asarray(bg)))
    img_ref, A_ref, D_ref = brute_force_raster(proj, 24, 24, bg)
    np.testing.assert_allclose(np.asarray(out["image"]), img_ref, atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["alpha"][0]), np.clip(A_ref, 0, 1), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["depth"][0]), D_ref, atol=1e-3)


def test_render_is_differentiable():
    cam = identity_camera(16, 16)
    gs = make_gaussians([[0, 0, 1.0], [0.1, 0.1, 1.5]], [[0.05] * 3] * 2,
                        [[0.9, 0.1, 0.2], [0.2, 0.8, 0.3]], [0.7, 0.6])
    target = jnp.zeros((3, 16, 16))

    def loss_fn(params):
        g = gs.with_params(params)
        out = render(g, cam, settings_for(cam))
        return jnp.mean((out["image"] - target) ** 2)

    grads = jax.grad(loss_fn)(gs.params())
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        arr = np.asarray(grads[name])
        assert np.all(np.isfinite(arr)), name
    assert np.any(np.asarray(grads["xyz"])[:2] != 0)
    assert np.any(np.asarray(grads["opacity"])[:2] != 0)


class TestAntialias:
    """Mip-splatting antialiasing (opt-in flag, beyond reference parity)."""

    def test_opacity_compensation_small_gaussian(self):
        # A sub-pixel Gaussian: dilation dominates, compensation ~ det
        # ratio << 1; total integrated contribution is preserved, so the
        # alpha at the center drops while the footprint grows.
        g = make_gaussians([[0.0, 0.0, 2.0]], [[1e-3, 1e-3, 1e-3]],
                           [[4.0, -4.0, -4.0]], [0.99])
        cam = identity_camera()
        p_off = project_gaussians(g, cam)
        p_on = project_gaussians(g, cam, antialias=True)
        # dilated covariance -> smaller conic diagonal, larger radius
        assert float(p_on.conic[0, 0]) < float(p_off.conic[0, 0])
        assert float(p_on.radius[0]) > float(p_off.radius[0])
        # compensation shrinks opacity hard for a sub-pixel splat
        assert float(p_on.opacity[0]) < 0.2 * float(p_off.opacity[0])

    def test_large_gaussian_nearly_unchanged(self):
        g = make_gaussians([[0.0, 0.0, 2.0]], [[0.5, 0.5, 0.5]],
                           [[4.0, -4.0, -4.0]], [0.8])
        cam = identity_camera()
        p_off = project_gaussians(g, cam)
        p_on = project_gaussians(g, cam, antialias=True)
        # a many-pixel splat: 0.3px^2 dilation is negligible
        assert float(p_on.opacity[0]) > 0.99 * float(p_off.opacity[0])
        np.testing.assert_allclose(np.asarray(p_on.conic[0]),
                                   np.asarray(p_off.conic[0]), rtol=0.05)

    def test_render_paths_agree_and_differentiable(self):
        rng = np.random.default_rng(3)
        n = 40
        g = make_gaussians(
            np.c_[rng.uniform(-1, 1, (n, 2)), rng.uniform(1.5, 4.0, n)],
            rng.uniform(0.02, 0.3, (n, 3)),
            rng.normal(0, 2, (n, 3)), rng.uniform(0.2, 0.9, n),
            capacity=64)
        cam = identity_camera()
        s_gold = settings_for(cam, antialias=True)
        s_pal = settings_for(cam, antialias=True, use_pallas=True,
                             max_instances=2 ** 13, gaussian_chunk=32)
        out_g = render(g, cam, s_gold)
        out_p = render(g, cam, s_pal)
        np.testing.assert_allclose(np.asarray(out_p["image"]),
                                   np.asarray(out_g["image"]), atol=2e-5)

        def loss(params):
            return render(g.with_params(params), cam, s_gold)["image"].sum()

        grads = jax.grad(loss)(g.params())
        assert np.isfinite(np.asarray(grads["scaling"])).all()
        assert float(jnp.abs(grads["scaling"]).sum()) > 0.0
