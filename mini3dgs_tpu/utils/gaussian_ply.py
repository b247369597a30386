"""Canonical 3DGS PLY interchange: export/import trained Gaussians.

The standard layout used by the original 3DGS tooling and every public viewer:
vertex properties x,y,z, nx,ny,nz, f_dc_0..2, f_rest_0..44, opacity,
scale_0..2 (log sigma), rot_0..3 (wxyz quaternion).  f_rest is stored
channel-major: all 15 coefficients of R, then G, then B.

This is the bridge that lets models trained here load in reference-ecosystem
viewers (and vice versa).
"""

from __future__ import annotations

from pathlib import Path
from typing import Optional

import numpy as np

from ..core.gaussians import Gaussians, SH_REST


def export_gaussians_ply(g: Gaussians, path: str) -> int:
    """Write alive Gaussians to a canonical 3DGS PLY.  Returns point count."""
    alive = np.asarray(g.alive)
    xyz = np.asarray(g.xyz)[alive].astype(np.float32)
    n = len(xyz)
    f_dc = np.asarray(g.features_dc)[alive].reshape(n, 3)
    # [N,15,3] -> channel-major [N,45]
    f_rest = np.asarray(g.features_rest)[alive].transpose(0, 2, 1).reshape(n, 45)
    opacity = np.asarray(g.opacity)[alive].reshape(n, 1)
    scale = np.asarray(g.scaling)[alive]
    rot = np.asarray(g.rotation)[alive]

    names = (["x", "y", "z", "nx", "ny", "nz"]
             + [f"f_dc_{i}" for i in range(3)]
             + [f"f_rest_{i}" for i in range(45)]
             + ["opacity"]
             + [f"scale_{i}" for i in range(3)]
             + [f"rot_{i}" for i in range(4)])
    rec = np.zeros(n, dtype=[(nm, "<f4") for nm in names])
    data = np.concatenate([xyz, np.zeros((n, 3), np.float32), f_dc, f_rest,
                           opacity, scale, rot], axis=1)
    for j, nm in enumerate(names):
        rec[nm] = data[:, j]

    Path(path).parent.mkdir(parents=True, exist_ok=True)
    header = ("ply\nformat binary_little_endian 1.0\n"
              f"element vertex {n}\n"
              + "".join(f"property float {nm}\n" for nm in names)
              + "end_header\n").encode()
    with open(path, "wb") as f:
        f.write(header)
        f.write(rec.tobytes())
    return n


def import_gaussians_ply(path: str, capacity: Optional[int] = None) -> Gaussians:
    """Read a canonical 3DGS PLY into a slot pool."""
    import jax.numpy as jnp

    with open(path, "rb") as f:
        header = b""
        while not header.endswith(b"end_header\n"):
            header += f.readline()
        lines = header.decode().splitlines()
        n = next(int(l.split()[-1]) for l in lines
                 if l.startswith("element vertex"))
        names = [l.split()[2] for l in lines if l.startswith("property")]
        rec = np.frombuffer(f.read(n * 4 * len(names)),
                            dtype=[(nm, "<f4") for nm in names], count=n)

    def cols(prefix, k):
        return np.stack([rec[f"{prefix}_{i}"] for i in range(k)], axis=1)

    xyz = np.stack([rec["x"], rec["y"], rec["z"]], axis=1)
    f_dc = cols("f_dc", 3).reshape(n, 1, 3)
    n_rest = sum(1 for nm in names if nm.startswith("f_rest_"))
    if n_rest:
        f_rest = cols("f_rest", n_rest).reshape(n, 3, n_rest // 3)
        f_rest = f_rest.transpose(0, 2, 1)  # channel-major -> [N, 15, 3]
    else:
        f_rest = np.zeros((n, SH_REST, 3), np.float32)
    if f_rest.shape[1] < SH_REST:
        pad = np.zeros((n, SH_REST - f_rest.shape[1], 3), np.float32)
        f_rest = np.concatenate([f_rest, pad], axis=1)
    opacity = rec["opacity"].reshape(n, 1)
    scale = cols("scale", 3)
    rot = cols("rot", 4)

    capacity = capacity or n
    assert capacity >= n

    def pad_to(arr, fill=0.0):
        out = np.full((capacity,) + arr.shape[1:], fill, np.float32)
        out[:n] = arr
        return jnp.asarray(out)

    alive = np.zeros(capacity, bool)
    alive[:n] = True
    rot_pad = np.zeros((capacity, 4), np.float32)
    rot_pad[:, 0] = 1.0
    rot_pad[:n] = rot
    return Gaussians(
        xyz=pad_to(xyz), features_dc=pad_to(f_dc), features_rest=pad_to(f_rest),
        scaling=pad_to(scale, fill=-10.0), rotation=jnp.asarray(rot_pad),
        opacity=pad_to(opacity, fill=-10.0), alive=jnp.asarray(alive),
        xyz_gradient_accum=jnp.zeros(capacity), denom=jnp.zeros(capacity),
        max_radii2D=jnp.zeros(capacity))
