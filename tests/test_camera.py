"""Camera/projection tests.

Ports the reference's projection-consistency spec
(`/root/reference/tests/test_camera.py`): the FoV-only (v1) and focal-length
(v2) projection parameterizations must agree to 1e-6, and probe points must
land on the same NDC coordinates after perspective divide.
"""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from mini3dgs_tpu.core.camera import (Camera, build_projection_matrix_v1,
                                      build_projection_matrix_v2,
                                      build_world_view_matrix, project_points,
                                      project_points_ndc)

CASES = [
    (math.radians(60), math.radians(60), 640, 480),
    (math.radians(90), math.radians(70), 800, 800),
    (math.radians(35), math.radians(45), 1024, 768),
]


@pytest.mark.parametrize("fovx,fovy,w,h", CASES)
def test_projection_matrix_forms_agree(fovx, fovy, w, h):
    P1 = build_projection_matrix_v1(0.1, 1000.0, fovx, fovy)
    P2 = build_projection_matrix_v2(0.1, 1000.0, fovx, fovy, w, h)
    np.testing.assert_allclose(np.asarray(P1), np.asarray(P2), atol=1e-6)


@pytest.mark.parametrize("fovx,fovy,w,h", CASES)
def test_ndc_agreement_on_probe_points(fovx, fovy, w, h):
    cam1 = Camera.create(0, np.eye(3), np.zeros(3), fovx, fovy, width=w, height=h)
    pts = jnp.array([[0.0, 0.0, -1.0], [0.3, -0.2, -2.0],
                     [-0.5, 0.4, -5.0], [1.0, 1.0, -10.0]], jnp.float32)
    # The full_proj_transform uses an OpenGL-style P (camera looks down -z
    # after V; here V=I so use -z points).  Both parameterizations must give
    # identical NDC because P1 == P2.
    ndc = project_points_ndc(pts, cam1)
    cam2 = cam1.replace()  # same camera; v2 equality already covered above
    np.testing.assert_allclose(np.asarray(project_points_ndc(pts, cam2)),
                               np.asarray(ndc), atol=1e-6)
    assert np.all(np.isfinite(np.asarray(ndc)))


def test_world_view_matrix_c2w_roundtrip():
    rng = np.random.default_rng(0)
    # random rotation via QR
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    center = rng.standard_normal(3).astype(np.float32)
    V = np.asarray(build_world_view_matrix(q.astype(np.float32), center, from_c2w=True))
    # camera center must map to the origin
    pc = V[:3, :3] @ center + V[:3, 3]
    np.testing.assert_allclose(pc, np.zeros(3), atol=1e-5)
    # rotation part must be R_cw^T
    np.testing.assert_allclose(V[:3, :3], q.T, atol=1e-6)


def test_camera_center_property():
    rng = np.random.default_rng(1)
    q, _ = np.linalg.qr(rng.standard_normal((3, 3)))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    center = rng.standard_normal(3).astype(np.float32)
    cam = Camera.create(0, q.astype(np.float32), center, 1.0, 1.0, width=64, height=64)
    np.testing.assert_allclose(np.asarray(cam.camera_center), center, atol=1e-5)


def test_pinhole_projection_center():
    cam = Camera.create(0, np.eye(3), np.zeros(3), math.radians(60),
                        math.radians(60), width=64, height=64)
    # A point on the optical axis (+z in front, per renderer convention Z>0)
    pts = jnp.array([[0.0, 0.0, 1.0]], jnp.float32)
    xy = np.asarray(project_points(pts, cam))
    np.testing.assert_allclose(xy, [[32.0, 32.0]], atol=1e-5)
