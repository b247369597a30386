"""Visualization utilities (reference `src/utils/vis_utils.py` — all stubs
there: visualize_cameras / visualize_gaussians / create_video_from_cameras)."""

from __future__ import annotations

import math
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from ..core.camera import Camera
from .io import save_image


def visualize_cameras(cameras: Sequence[Camera], path: Optional[str] = None):
    """Scatter the camera rig (positions + view directions) to a PNG."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    centers = np.stack([np.asarray(c.camera_center) for c in cameras])
    dirs = np.stack([np.asarray(c.R)[:, 2] for c in cameras])  # +z forward
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(centers[:, 0], centers[:, 1], centers[:, 2], c="tab:blue", s=12)
    ax.quiver(centers[:, 0], centers[:, 1], centers[:, 2],
              dirs[:, 0], dirs[:, 1], dirs[:, 2], length=0.3, color="tab:red")
    ax.set_title(f"{len(cameras)} cameras")
    if path:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


def visualize_gaussians(gaussians, path: Optional[str] = None,
                        max_points: int = 20000):
    """Scatter alive Gaussian centers colored by DC color."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    alive = np.asarray(gaussians.alive)
    xyz = np.asarray(gaussians.xyz)[alive]
    col = 1.0 / (1.0 + np.exp(-np.asarray(gaussians.features_dc)[alive, 0]))
    if len(xyz) > max_points:
        sel = np.random.default_rng(0).choice(len(xyz), max_points, replace=False)
        xyz, col = xyz[sel], col[sel]
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=np.clip(col, 0, 1), s=2)
    ax.set_title(f"{alive.sum()} gaussians")
    if path:
        Path(path).parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(path, dpi=120)
        plt.close(fig)
    return fig


def turntable_cameras(n: int, radius: float = 4.0, height: float = 0.0,
                      width: int = 512, image_height: int = 512,
                      fov_deg: float = 60.0) -> List[Camera]:
    """A circular orbit of cameras looking at the origin (for novel-view
    videos, reference `create_video_from_cameras` intent)."""
    cams = []
    fov = math.radians(fov_deg)
    for i in range(n):
        theta = 2 * math.pi * i / n
        center = np.array([radius * math.sin(theta), height,
                           -radius * math.cos(theta)], np.float32)
        fwd = -center
        fwd = fwd / np.linalg.norm(fwd)
        up = np.array([0.0, 1.0, 0.0], np.float32)
        right = np.cross(up, fwd)
        right = right / np.linalg.norm(right)
        upv = np.cross(fwd, right)
        R = np.stack([right, upv, fwd], axis=1)
        cams.append(Camera.create(uid=i, R=R, T=center, FoVx=fov, FoVy=fov,
                                  width=width, height=image_height))
    return cams


def create_video_from_cameras(render_fn, cameras: Sequence[Camera],
                              out_dir: str, fps: int = 30,
                              video_path: Optional[str] = None):
    """Render every camera to PNG frames; assemble an mp4 when imageio/ffmpeg
    is available, else leave the frame directory."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    frames = []
    for i, cam in enumerate(cameras):
        img = render_fn(cam)
        p = out / f"frame_{i:04d}.png"
        save_image(img, str(p))
        frames.append(p)
    if video_path:
        try:
            import imageio.v2 as imageio
            with imageio.get_writer(video_path, fps=fps) as w:
                for p in frames:
                    w.append_data(imageio.imread(p))
        except Exception:
            pass
    return frames
