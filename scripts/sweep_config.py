"""Sweep (tile_size, gaussian_chunk, max_dup_per_axis, max_instances) at the
bench scene and slope-measure the full fwd+bwd step for each.  The exact-cull
extents (v13) cut live instances ~2.7x, which may move the optimal tile size.
Each config first verifies n_dropped == 0 (otherwise it is not apples-to-
apples) and prints the live-instance count.
"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def slope(body_of_scalar, k1=2, k2=7, reps=3):
    @partial(jax.jit, static_argnames="iters")
    def run(s, iters):
        return jax.lax.fori_loop(0, iters, lambda i, c: body_of_scalar(c, i),
                                 s)

    for iters in (k1, k2):
        float(run(jnp.float32(0.5), iters))
    pers = []
    for j in range(reps):
        s1 = jnp.float32(0.1 + 0.01 * j)
        s2 = jnp.float32(0.2 + 0.01 * j)
        t0 = time.perf_counter()
        float(run(s1, k1))
        t1 = time.perf_counter()
        float(run(s2, k2))
        t2 = time.perf_counter()
        pers.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return float(np.median(pers))


def main():
    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops import binning as B
    from mini3dgs_tpu.ops.projection import project_gaussians
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    W = H = 800
    C = 2 ** 17
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    def with_s(s):
        return {**params0, "xyz": params0["xyz"] * (1.0 + s * 1e-9)}

    # (tile_size, G, DUP, K, large_capacity).  At tile 16 most of this
    # scene's gaussians span >2 tiles per axis, so the C/8 two-level pool
    # overflows (drops); large_capacity=C degenerates to the exact single
    # grid there.
    combos = [
        (32, 256, 3, 2 ** 19, 0),   # current bench config
        (32, 512, 3, 2 ** 19, 0),   # halve chunk count (loop overhead probe)
        (32, 128, 3, 2 ** 19, 0),   # double chunk count
    ]
    for (TS, G, DUP, K, LC) in combos:
        settings = RenderSettings(image_height=H, image_width=W,
                                  use_pallas=True, max_instances=K,
                                  gaussian_chunk=G, tile_size=TS,
                                  max_dup_per_axis=DUP, large_capacity=LC)

        # exactness check
        p = project_gaussians(g, cam)
        b = B.bin_gaussians(p, H, W, TS, K, G, radius_max=50.0,
                            max_dup_per_axis=DUP, large_capacity=LC)
        dropped = int(b.n_dropped)
        live = int(b.n_live)

        def full_loss(params):
            out = render(g.with_params(params), cam, settings)
            return jnp.abs(out["image"] - target).mean()

        gfull = jax.grad(full_loss)

        def pf(s, i):
            d = gfull(with_s(s))
            return jnp.sum(d["xyz"]) * 1e-12 + s

        per = slope(pf, k2=12, reps=5)
        mpix = W * H / per / 1e6
        print(f"tile={TS:3d} G={G:3d} DUP={DUP} K=2^{K.bit_length()-1} "
              f"LC={LC} live={live:7d} dropped={dropped:5d}  "
              f"{per * 1e3:7.2f} ms  {mpix:6.2f} Mpix/s", flush=True)


if __name__ == "__main__":
    main()
