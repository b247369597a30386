"""Data-layer tests: COLMAP text/binary parser round-trips, point-cloud IO
formats (reference io_utils.py:33-85 semantics), Blender transforms.json,
dataset dispatch, image IO."""

import json
import math
from pathlib import Path

import numpy as np
import pytest

from mini3dgs_tpu.data import colmap
from mini3dgs_tpu.data.dataset import (BlenderDataset, COLMAPDataset,
                                       RandomDataset, load_dataset)
from mini3dgs_tpu.utils.io import (load_image, load_point_cloud, save_image,
                                   save_point_cloud)


def _make_colmap_model(tmp_path: Path, binary: bool):
    sp = tmp_path / "sparse" / "0"
    sp.mkdir(parents=True)
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 64, 48,
                                   np.array([60.0, 60.0, 32.0, 24.0]))}
    rng = np.random.default_rng(0)
    imgs = {}
    for i in range(1, 4):
        q = rng.standard_normal(4)
        q /= np.linalg.norm(q)
        imgs[i] = colmap.ColmapImage(i, q, rng.standard_normal(3), 1,
                                     f"im_{i}.png")
    pts = rng.standard_normal((10, 3)).astype(np.float32)
    cols = rng.random((10, 3)).astype(np.float32)
    if binary:
        colmap.write_cameras_binary(cams, str(sp / "cameras.bin"))
        colmap.write_images_binary(imgs, str(sp / "images.bin"))
        colmap.write_points3d_binary(pts, cols, str(sp / "points3D.bin"))
    else:
        with open(sp / "cameras.txt", "w") as f:
            f.write("# comment\n")
            for c in cams.values():
                f.write(f"{c.id} {c.model} {c.width} {c.height} "
                        + " ".join(str(v) for v in c.params) + "\n")
        with open(sp / "images.txt", "w") as f:
            f.write("# comment\n")
            for im in imgs.values():
                f.write(f"{im.id} " + " ".join(f"{v}" for v in im.qvec)
                        + " " + " ".join(f"{v}" for v in im.tvec)
                        + f" {im.camera_id} {im.name}\n")
                f.write("\n")  # empty 2D-points line
        with open(sp / "points3D.txt", "w") as f:
            f.write("# comment\n")
            for j in range(len(pts)):
                rgb = (cols[j] * 255).astype(int)
                f.write(f"{j} {pts[j, 0]} {pts[j, 1]} {pts[j, 2]} "
                        f"{rgb[0]} {rgb[1]} {rgb[2]} 0.5 1 2\n")
    return cams, imgs, pts, cols


@pytest.mark.parametrize("binary", [False, True])
def test_colmap_model_roundtrip(tmp_path, binary):
    cams, imgs, pts, cols = _make_colmap_model(tmp_path, binary)
    sp = tmp_path / "sparse" / "0"
    if binary:
        rc = colmap.read_cameras_binary(str(sp / "cameras.bin"))
        ri = colmap.read_images_binary(str(sp / "images.bin"))
        rp, rcol = colmap.read_points3d_binary(str(sp / "points3D.bin"))
    else:
        rc = colmap.read_cameras_text(str(sp / "cameras.txt"))
        ri = colmap.read_images_text(str(sp / "images.txt"))
        rp, rcol = colmap.read_points3d_text(str(sp / "points3D.txt"))
    assert rc[1].model == "PINHOLE" and rc[1].width == 64
    np.testing.assert_allclose(rc[1].focal(), (60.0, 60.0))
    assert len(ri) == 3
    for i in imgs:
        np.testing.assert_allclose(ri[i].qvec, imgs[i].qvec, atol=1e-6)
        np.testing.assert_allclose(ri[i].tvec, imgs[i].tvec, atol=1e-6)
        assert ri[i].name == imgs[i].name
    np.testing.assert_allclose(rp, pts, atol=1e-5)
    np.testing.assert_allclose(rcol, cols, atol=1 / 255 + 1e-6)


@pytest.mark.parametrize("binary", [False, True])
def test_colmap_dataset(tmp_path, binary):
    _make_colmap_model(tmp_path, binary)
    ds = COLMAPDataset(str(tmp_path), llff_hold=2)
    ds.load_cameras()
    assert len(ds.cameras) == 3
    assert len(ds.get_train_cameras()) + len(ds.get_test_cameras()) == 3
    pts, cols = ds.get_point_cloud()
    assert pts.shape == (10, 3)
    info = ds.get_scene_info()
    assert info["num_cameras"] == 3
    # W2C -> C2W conversion must put the camera center where COLMAP says
    cam = ds.cameras[0]
    assert np.isfinite(np.asarray(cam.camera_center)).all()


def test_colmap_pose_convention():
    """C = -R(q)^T t and our Camera must map C to the origin in view space."""
    rng = np.random.default_rng(1)
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    t = rng.standard_normal(3)
    img = colmap.ColmapImage(0, q, t, 0, "x")
    R_c2w, center = colmap.image_c2w(img)
    R_wc = colmap.qvec_to_rotmat(q)
    np.testing.assert_allclose(R_wc @ center + t, np.zeros(3), atol=1e-6)
    from mini3dgs_tpu.core.camera import Camera
    cam = Camera.create(0, R_c2w, center, 1.0, 1.0, width=8, height=8)
    V = np.asarray(cam.view_matrix)
    np.testing.assert_allclose(V[:3, :3] @ center + V[:3, 3], np.zeros(3),
                               atol=1e-5)
    np.testing.assert_allclose(V[:3, :3], R_wc, atol=1e-5)


def test_point_cloud_formats(tmp_path):
    rng = np.random.default_rng(0)
    pts = rng.standard_normal((20, 3)).astype(np.float32)
    cols = rng.random((20, 3)).astype(np.float32)
    for name in ("a.npz", "b.npy", "c.ply", "d.txt"):
        p = str(tmp_path / name)
        save_point_cloud(pts, cols, p)
        rp, rc = load_point_cloud(p)
        np.testing.assert_allclose(rp, pts, atol=1e-5)
        assert rc is not None
        atol = 1 / 255 + 1e-6 if name.endswith("ply") else 1e-5
        np.testing.assert_allclose(rc, cols, atol=atol)


def test_image_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.random((3, 16, 24)).astype(np.float32)
    p = str(tmp_path / "img.png")
    save_image(img, p)
    back = load_image(p)
    assert back.shape == (3, 16, 24)
    np.testing.assert_allclose(back, img, atol=1 / 255 + 1e-6)


def test_blender_dataset(tmp_path):
    frames = []
    for i in range(3):
        c2w = np.eye(4)
        c2w[2, 3] = -4.0 + i
        frames.append({"file_path": f"./train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    meta = {"camera_angle_x": math.radians(60), "frames": frames}
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))
    ds = BlenderDataset(str(tmp_path))
    ds.load_cameras()
    assert len(ds.get_train_cameras()) == 3
    cam = ds.get_train_cameras()[0]
    # blender -z forward flipped to +z forward: forward axis = -world z ... the
    # camera looks along R[:,2]; with identity c2w it must be (0,0,-1)
    np.testing.assert_allclose(np.asarray(cam.R)[:, 2], [0, 0, -1], atol=1e-6)
    pts, cols = ds.get_point_cloud()
    assert len(pts) > 0


def test_dataset_dispatch_random(tmp_path):
    from mini3dgs_tpu.config import TrainingConfig
    cfg = TrainingConfig(data_path=str(tmp_path / "nonexistent"),
                         image_height=32, image_width=32)
    ds = load_dataset(cfg)
    assert isinstance(ds, RandomDataset)
    assert len(ds.get_train_cameras()) > 0


def test_gaussian_ply_roundtrip(tmp_path):
    import jax
    from mini3dgs_tpu.core.gaussians import create_from_random
    from mini3dgs_tpu.utils.gaussian_ply import (export_gaussians_ply,
                                                 import_gaussians_ply)
    g = create_from_random(jax.random.PRNGKey(0), 20, scene_extent=1.0,
                           capacity=32)
    p = str(tmp_path / "model.ply")
    n = export_gaussians_ply(g, p)
    assert n == 20
    g2 = import_gaussians_ply(p, capacity=32)
    alive = np.asarray(g.alive)
    for field in ("xyz", "features_dc", "features_rest", "scaling",
                  "rotation", "opacity"):
        np.testing.assert_allclose(np.asarray(getattr(g2, field))[alive],
                                   np.asarray(getattr(g, field))[alive],
                                   atol=1e-6, err_msg=field)
    assert int(g2.num_alive()) == 20


def test_colmap_distortion_models():
    """Distortion accessors + undistortion resampler (ROADMAP: COLMAP
    distortion models beyond the pinhole family)."""
    from mini3dgs_tpu.data import colmap as cm

    pin = cm.ColmapCamera(0, "PINHOLE", 64, 48,
                          np.array([60.0, 60.0, 32.0, 24.0]))
    assert not pin.has_distortion
    rad = cm.ColmapCamera(1, "SIMPLE_RADIAL", 64, 48,
                          np.array([60.0, 32.0, 24.0, 0.08]))
    assert rad.has_distortion
    np.testing.assert_allclose(rad.distortion(), [0.08, 0, 0, 0])
    ocv = cm.ColmapCamera(2, "OPENCV", 64, 48,
                          np.array([60.0, 61.0, 32.0, 24.0,
                                    0.1, -0.01, 1e-3, -2e-3]))
    np.testing.assert_allclose(ocv.distortion(), [0.1, -0.01, 1e-3, -2e-3])

    # distort_normalized matches the COLMAP radial+tangential formula
    xy = np.array([[0.1, -0.2], [0.0, 0.0], [-0.3, 0.25]])
    k1, k2, p1, p2 = ocv.distortion()
    x, y = xy[:, 0], xy[:, 1]
    r2 = x * x + y * y
    ex = x * (1 + k1 * r2 + k2 * r2 ** 2) + 2 * p1 * x * y + p2 * (r2 + 2 * x * x)
    ey = y * (1 + k1 * r2 + k2 * r2 ** 2) + p1 * (r2 + 2 * y * y) + 2 * p2 * x * y
    got = cm.distort_normalized(ocv, xy)
    np.testing.assert_allclose(got, np.stack([ex, ey], -1), rtol=1e-12)

    # zero-distortion camera: undistort is the identity (and returns PINHOLE)
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (48, 64, 3)).astype(np.float32)
    zero = cm.ColmapCamera(3, "RADIAL", 64, 48,
                           np.array([60.0, 32.0, 24.0, 0.0, 0.0]))
    out, newcam = cm.undistort_image(img, zero)
    np.testing.assert_allclose(out, img)
    assert newcam.model == "PINHOLE"

    # resampling correctness on a smooth analytic image: the undistorted
    # pixel p must sample the source at f*distort((p-c)/f)+c
    H, W = 48, 64
    def g(px, py):
        return np.sin(px * 0.2) + np.cos(py * 0.3)
    ys, xs = np.mgrid[0:H, 0:W]
    src = g(xs + 0.0, ys + 0.0).astype(np.float64)
    out, _ = cm.undistort_image(src, rad)
    fx, fy = rad.focal()
    cx, cy = rad.principal_point()
    xn = (xs + 0.5 - cx) / fx
    yn = (ys + 0.5 - cy) / fy
    d = cm.distort_normalized(rad, np.stack([xn.ravel(), yn.ravel()], -1))
    sx = (d[:, 0] * fx + cx - 0.5).reshape(H, W)
    sy = (d[:, 1] * fy + cy - 0.5).reshape(H, W)
    inside = (sx >= 1) & (sx < W - 2) & (sy >= 1) & (sy < H - 2)
    expected = g(sx, sy)
    err = np.abs(out - expected)[inside]
    assert err.max() < 2e-2  # bilinear error bound ~h^2/8*max|f""| ~ 0.011 here


def test_blender_white_background_consistency(tmp_path):
    """GT compositing must match the render background both ways (RGBA
    alpha=0 pixels -> white when white_background, black otherwise), and the
    dataset advertises the matching bg_color for the trainer."""
    from PIL import Image
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[:4, :, :3] = 200       # top half: opaque gray
    rgba[:4, :, 3] = 255
    # bottom half: alpha = 0 (background)
    (tmp_path / "train").mkdir()
    Image.fromarray(rgba).save(tmp_path / "train" / "r_0.png")
    c2w = np.eye(4)
    meta = {"camera_angle_x": math.radians(60),
            "frames": [{"file_path": "./train/r_0",
                        "transform_matrix": c2w.tolist()}]}
    (tmp_path / "transforms_train.json").write_text(json.dumps(meta))

    ds_w = BlenderDataset(str(tmp_path), white_background=True)
    ds_w.load_cameras()
    img_w = np.asarray(ds_w.get_train_cameras()[0].image)
    np.testing.assert_allclose(img_w[:, 6, 4], 1.0)      # bg pixel -> white
    np.testing.assert_allclose(img_w[:, 1, 4], 200 / 255, atol=1e-6)
    assert ds_w.bg_color == [1.0, 1.0, 1.0]

    ds_b = BlenderDataset(str(tmp_path), white_background=False)
    ds_b.load_cameras()
    img_b = np.asarray(ds_b.get_train_cameras()[0].image)
    np.testing.assert_allclose(img_b[:, 6, 4], 0.0)      # bg pixel -> black
    assert ds_b.bg_color == [0.0, 0.0, 0.0]

    # load_dataset honors a configured black background
    from mini3dgs_tpu.config import TrainingConfig
    ds = load_dataset(TrainingConfig(data_path=str(tmp_path),
                                     background_color=[0.0, 0.0, 0.0]))
    assert ds.bg_color == [0.0, 0.0, 0.0]
    ds2 = load_dataset(TrainingConfig(data_path=str(tmp_path),
                                      background_color=[1.0, 1.0, 1.0]))
    assert ds2.bg_color == [1.0, 1.0, 1.0]


def test_sdf_scene_generator_roundtrip(tmp_path):
    """scripts/make_synthetic_scene.py writes a NeRF-synthetic-format scene
    whose camera model matches the renderer exactly: a splat placed at a
    known SDF surface point must land on that object in the GT image."""
    import jax
    import jax.numpy as jnp
    from scripts.make_synthetic_scene import main as gen_main
    gen_main(["--out", str(tmp_path), "--n-train", "2", "--n-test", "1",
              "--size", "48", "--spp", "1"])
    gen_main(["--out", str(tmp_path), "--points-only"])

    ds = BlenderDataset(str(tmp_path), white_background=True)
    ds.load_cameras()
    assert len(ds.get_train_cameras()) == 2
    assert len(ds.get_test_cameras()) == 1
    pts, cols = ds.get_point_cloud()
    assert len(pts) == 30000 and cols is not None

    from mini3dgs_tpu.core.gaussians import create_from_random, Gaussians
    from mini3dgs_tpu.ops.renderer import RenderSettings, render
    cam = ds.get_train_cameras()[0]
    # camera looks at the origin
    np.testing.assert_allclose(np.asarray(cam.R)[:, 2],
                               -np.asarray(cam.T) / np.linalg.norm(cam.T),
                               atol=1e-5)
    # single opaque splat at the checker-sphere center
    C = 8
    g = create_from_random(jax.random.PRNGKey(0), 1, capacity=C)
    g = g.replace(
        xyz=g.xyz.at[0].set(jnp.array([0.45, 0.38, -0.25])),
        scaling=g.scaling.at[0].set(math.log(0.02)),
        opacity=g.opacity.at[0].set(6.0))
    st = RenderSettings(image_height=48, image_width=48, use_pallas=False)
    out = render(g, cam, st)
    a = np.asarray(out["alpha"][0])
    iy, ix = np.unravel_index(a.argmax(), a.shape)
    gt = np.asarray(cam.image)[:, iy, ix]
    # checker sphere albedo families: [0.15,0.35,0.8] or [0.25,0.8,0.5]
    # (x shading); at minimum it must not be background white
    assert not np.all(gt > 0.97), (iy, ix, gt)
    assert gt[2] > 0.25, (iy, ix, gt)  # blue component present either way


def test_distortion_model_family():
    """distort_normalized implements the full COLMAP camera-model family:
    identity at the principal axis, correct polynomial/rational/fisheye/FOV
    values at a probe point, and undistort_image resamples consistently."""
    from mini3dgs_tpu.data.colmap import (ColmapCamera, distort_normalized,
                                          undistort_image)

    probe = np.array([[0.0, 0.0], [0.2, -0.1]])

    def mk(model, params):
        return ColmapCamera(1, model, 64, 48, np.asarray(params, np.float64))

    # center is a fixed point for every model
    for cam in (mk("SIMPLE_RADIAL", [60, 32, 24, 0.1]),
                mk("RADIAL", [60, 32, 24, 0.1, -0.05]),
                mk("OPENCV", [60, 60, 32, 24, 0.1, -0.05, 0.01, -0.02]),
                mk("FULL_OPENCV", [60, 60, 32, 24, 0.1, -0.05, 0.01, -0.02,
                                   0.001, 0.01, -0.001, 0.0005]),
                mk("OPENCV_FISHEYE", [60, 60, 32, 24, 0.1, -0.05, 0.01, 0.0]),
                mk("SIMPLE_RADIAL_FISHEYE", [60, 32, 24, 0.1]),
                mk("RADIAL_FISHEYE", [60, 32, 24, 0.1, -0.02]),
                mk("FOV", [60, 32, 24, 0.9])):
        out = distort_normalized(cam, probe)
        np.testing.assert_allclose(out[0], [0.0, 0.0], atol=1e-12)
        assert np.all(np.isfinite(out))

    # polynomial radial: hand-computed
    cam = mk("SIMPLE_RADIAL", [60, 32, 24, 0.1])
    x, y = 0.2, -0.1
    r2 = x * x + y * y
    out = distort_normalized(cam, probe)[1]
    np.testing.assert_allclose(out, [x * (1 + 0.1 * r2), y * (1 + 0.1 * r2)],
                               rtol=1e-12)

    # rational FULL_OPENCV with only k4 set = pure denominator
    cam = mk("FULL_OPENCV", [60, 60, 32, 24, 0, 0, 0, 0, 0, 0.2, 0, 0])
    out = distort_normalized(cam, probe)[1]
    np.testing.assert_allclose(out, [x / (1 + 0.2 * r2), y / (1 + 0.2 * r2)],
                               rtol=1e-12)

    # fisheye with zero ks = equidistant atan mapping
    cam = mk("OPENCV_FISHEYE", [60, 60, 32, 24, 0, 0, 0, 0])
    out = distort_normalized(cam, probe)[1]
    r = math.sqrt(r2)
    s = math.atan(r) / r
    np.testing.assert_allclose(out, [x * s, y * s], rtol=1e-12)
    assert cam.has_distortion  # atan warp remaps even with k=0

    # FOV model formula
    cam = mk("FOV", [60, 32, 24, 0.9])
    out = distort_normalized(cam, probe)[1]
    rd = math.atan(2 * r * math.tan(0.45)) / 0.9
    np.testing.assert_allclose(out, [x * rd / r, y * rd / r], rtol=1e-12)

    # undistort_image on a fisheye camera: finite, shape-preserving, and the
    # center pixel (fixed point) keeps its value
    img = np.zeros((48, 64), np.float32)
    img[20:28, 28:36] = 1.0
    cam = mk("OPENCV_FISHEYE", [60, 60, 32, 24, 0.05, 0.0, 0.0, 0.0])
    out, pin = undistort_image(img, cam)
    assert out.shape == img.shape and pin.model == "PINHOLE"
    assert np.isfinite(out).all()
    assert out[24, 32] > 0.9
