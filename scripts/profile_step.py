"""Quick slope measurement of ONLY the full fwd+bwd step at the bench
config (2 compiles instead of profile_stages5's 10)."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    W = H = 800
    g, cam = _scene(capacity=2 ** 17, n=100_000, width=W, height=H)
    settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                              max_instances=2 ** 19, gaussian_chunk=256,
                              tile_size=32, max_dup_per_axis=3)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    def full_loss(params):
        out = render(g.with_params(params), cam, settings)
        return jnp.abs(out["image"] - target).mean()

    gfull = jax.grad(full_loss)

    @partial(jax.jit, static_argnames="iters")
    def run(s, iters):
        def body(i, c):
            p = {**params0, "xyz": params0["xyz"] * (1.0 + c * 1e-9)}
            d = gfull(p)
            return jnp.sum(d["xyz"]) * 1e-12 + c + 1e-6 * i
        return jax.lax.fori_loop(0, iters, body, s)

    k1, k2 = 2, 12
    for iters in (k1, k2):
        float(run(jnp.float32(0.5), iters))
    pers = []
    for j in range(5):
        s1 = jnp.float32(0.1 + 0.01 * j)
        s2 = jnp.float32(0.2 + 0.01 * j)
        t0 = time.perf_counter()
        float(run(s1, k1))
        t1 = time.perf_counter()
        float(run(s2, k2))
        t2 = time.perf_counter()
        pers.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    per = float(np.median(pers))
    print(f"full fwd+bwd: {per * 1e3:.2f} ms  "
          f"{W * H / per / 1e6:.2f} Mpix/s  (all reps: "
          + ", ".join(f"{p * 1e3:.2f}" for p in pers) + ")", flush=True)


if __name__ == "__main__":
    main()
