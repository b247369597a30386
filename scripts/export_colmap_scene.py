"""Export a Blender/NeRF-synthetic-format scene as a COLMAP sparse model.

Closes the BASELINE "train a COLMAP-format scene" obligation with zero
dataset risk (no network egress): the procedural SDF benchmark scene
(scripts/make_synthetic_scene.py) is rewritten in the exact on-disk layout
COLMAP produces — `images/*.png` + `sparse/0/{cameras,images,points3D}.bin`
— and then loaded by the standard `COLMAPDataset` path
(mini3dgs_tpu/data/dataset.py), exercising the binary parsers, the
every-8th llff_hold split, and the points3D seed-cloud init end to end.
The reference documents exactly this pipeline but stubs all of it
(`/root/reference/src/data/dataset.py:30-61`, `colmap_utils.py` empty).

Conversions:
  * Blender c2w -> our (R, T): R = c2w[:3,:3] @ diag(1,-1,-1) (BlenderDataset
    convention flip), T = c2w[:3,3].
  * ours -> COLMAP world->camera: R_wc = R^T, tvec = -R^T T, qvec wxyz.
  * PINHOLE intrinsics from camera_angle_x: fx = fy = 0.5*W/tan(fovx/2).
  * RGBA PNGs composited onto white (COLMAP images carry no alpha); the
    training config must keep background_color [1,1,1] to match.

Usage:
    python scripts/export_colmap_scene.py [--src data/sdf_scene] \
        [--out data/sdf_colmap]
"""

from __future__ import annotations

import argparse
import json
import math
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from mini3dgs_tpu.data import colmap
from mini3dgs_tpu.utils.io import load_point_cloud


def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """Rotation matrix -> wxyz quaternion (Shepperd's method: pick the
    largest-trace branch for numerical stability)."""
    m00, m01, m02 = R[0]
    m10, m11, m12 = R[1]
    m20, m21, m22 = R[2]
    tr = m00 + m11 + m22
    if tr > 0:
        s = math.sqrt(tr + 1.0) * 2
        q = [0.25 * s, (m21 - m12) / s, (m02 - m20) / s, (m10 - m01) / s]
    elif m00 > m11 and m00 > m22:
        s = math.sqrt(1.0 + m00 - m11 - m22) * 2
        q = [(m21 - m12) / s, 0.25 * s, (m01 + m10) / s, (m02 + m20) / s]
    elif m11 > m22:
        s = math.sqrt(1.0 + m11 - m00 - m22) * 2
        q = [(m02 - m20) / s, (m01 + m10) / s, 0.25 * s, (m12 + m21) / s]
    else:
        s = math.sqrt(1.0 + m22 - m00 - m11) * 2
        q = [(m10 - m01) / s, (m02 + m20) / s, (m12 + m21) / s, 0.25 * s]
    q = np.asarray(q, np.float64)
    return q / np.linalg.norm(q)


def main(argv=None) -> int:
    from PIL import Image

    ap = argparse.ArgumentParser()
    ap.add_argument("--src", type=str, default="data/sdf_scene")
    ap.add_argument("--out", type=str, default="data/sdf_colmap")
    args = ap.parse_args(argv)

    src, out = Path(args.src), Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    (out / "sparse" / "0").mkdir(parents=True, exist_ok=True)

    # one list over both splits; COLMAPDataset re-splits with llff_hold=8
    frames = []
    for split in ("train", "test"):
        with open(src / f"transforms_{split}.json") as f:
            meta = json.load(f)
        fovx = float(meta["camera_angle_x"])
        frames += [(split, fr) for fr in meta["frames"]]

    # probe one image for dimensions
    probe = np.asarray(Image.open(src / (frames[0][1]["file_path"] + ".png")))
    H, W = probe.shape[:2]
    fx = 0.5 * W / math.tan(fovx / 2)

    cams = {1: colmap.ColmapCamera(
        1, "PINHOLE", W, H, np.array([fx, fx, W / 2.0, H / 2.0]))}
    imgs = {}
    for i, (split, fr) in enumerate(frames):
        c2w = np.array(fr["transform_matrix"], np.float64)
        R = c2w[:3, :3] @ np.diag([1.0, -1.0, -1.0])
        T = c2w[:3, 3]
        qvec = rotmat_to_qvec(R.T)
        tvec = -R.T @ T
        name = f"im_{i:04d}.png"
        rgba = np.asarray(
            Image.open(src / (fr["file_path"] + ".png"))).astype(np.float64)
        rgba /= 255.0
        if rgba.shape[-1] == 4:
            rgb = rgba[..., :3] * rgba[..., 3:] + (1.0 - rgba[..., 3:])
        else:
            rgb = rgba[..., :3]
        Image.fromarray((np.clip(rgb, 0, 1) * 255).astype(np.uint8)).save(
            out / "images" / name)
        imgs[i + 1] = colmap.ColmapImage(i + 1, qvec, tvec, 1, name)

    colmap.write_cameras_binary(cams, str(out / "sparse/0/cameras.bin"))
    colmap.write_images_binary(imgs, str(out / "sparse/0/images.bin"))
    pts, cols = load_point_cloud(str(src / "points3d.ply"))
    colmap.write_points3d_binary(pts, cols, str(out / "sparse/0/points3D.bin"))
    print(f"wrote {len(imgs)} images + {len(pts)} points to {out}")

    # round-trip sanity: poses reconstruct our (R, T) exactly
    for iid, im in list(imgs.items())[:3]:
        Rb, Tb = colmap.image_c2w(im)
        c2w = np.array(frames[iid - 1][1]["transform_matrix"], np.float64)
        R0 = c2w[:3, :3] @ np.diag([1.0, -1.0, -1.0])
        assert np.allclose(Rb, R0, atol=1e-6), "rotation round trip"
        assert np.allclose(Tb, c2w[:3, 3], atol=1e-6), "center round trip"
    print("pose round-trip OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
