"""BASELINE config #4 probe: 800^2, 1MAussians, single chip (slope)."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def slope(body_of_scalar, name, k1=1, k2=5, reps=3):
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
    g, cam = _scene(capacity=2 ** 20, n=1_000_000, width=W, height=H)
    settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                              max_instances=2 ** 22, tile_size=32,
                              gaussian_chunk=256, max_dup_per_axis=3)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    def full_loss(params):
        out = render(g.with_params(params), cam, settings)
        return jnp.abs(out["image"] - target).mean()

    gfull = jax.grad(full_loss)

    def pf_fwdbwd(s, i):
        d = gfull({**params0, "xyz": params0["xyz"] * (1.0 + s * 1e-9)})
        return jnp.sum(d["xyz"]) * 1e-12 + s

    slope(pf_fwdbwd, "1M gaussians 800^2 fwd+bwd")

    # check droppage at max_dup_per_axis=3
    from mini3dgs_tpu.ops import binning as B
    from mini3dgs_tpu.ops.projection import project_gaussians
    b = jax.jit(lambda: B.bin_gaussians(
        project_gaussians(g, cam), H, W, 32, 2 ** 22, 256,
        max_dup_per_axis=3))()
    print("n_live", int(b.n_live), "n_dropped", int(b.n_dropped))


if __name__ == "__main__":
    main()
