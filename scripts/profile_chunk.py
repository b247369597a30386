"""Chunk-size sweep for the raster kernels on the compact stream."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def slope(body_of_scalar, name, k1=2, k2=10, reps=3):
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
    per = float(np.median(pers))
    print(f"{name:56s} {per * 1e3:8.2f} ms", flush=True)
    return per


def main():
    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    W = H = 800
    C = 2 ** 17
    K = 2 ** 20
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    for ts, G in ((16, 128), (32, 128), (32, 256), (64, 128)):
        settings = RenderSettings(image_height=H, image_width=W,
                                  use_pallas=True, max_instances=K,
                                  tile_size=ts,
                                  gaussian_chunk=G, max_dup_per_axis=5)

        def full_loss(params):
            out = render(g.with_params(params), cam, settings)
            return jnp.abs(out["image"] - target).mean()

        def pf_fwd(s, i):
            return full_loss(
                {**params0,
                 "xyz": params0["xyz"] * (1.0 + s * 1e-9)}) * 1e-6 + s

        gfull = jax.grad(full_loss)

        def pf_fwdbwd(s, i):
            d = gfull({**params0,
                       "xyz": params0["xyz"] * (1.0 + s * 1e-9)})
            return jnp.sum(d["xyz"]) * 1e-12 + s

        slope(pf_fwd, f"tile={ts} G={G} full fwd")
        slope(pf_fwdbwd, f"tile={ts} G={G} full fwd+bwd", k2=7)


if __name__ == "__main__":
    main()
