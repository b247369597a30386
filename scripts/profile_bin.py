"""Binning micro-profile at bench config: where do the non-sort ms go?"""

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
    from mini3dgs_tpu.ops import binning as B
    from mini3dgs_tpu.ops.projection import project_gaussians

    W = H = 800
    C = 2 ** 17
    G = 128
    K = 2 ** 20
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    proj = project_gaussians(g, cam)
    proj = jax.tree.map(jax.lax.stop_gradient, proj)

    def pf_proj(s, i):
        p = project_gaussians(
            g.with_params({**g.params(),
                           "xyz": g.params()["xyz"] * (1.0 + s * 1e-9)}), cam)
        return p.means2d.sum() * 1e-9 + s
    slope(pf_proj, "projection alone")

    def pf_order(s, i):
        d = jnp.where(proj.visible, proj.depth + s * 1e-9, jnp.inf)
        return jnp.argsort(d)[-1].astype(jnp.float32) * 1e-9 + s
    slope(pf_order, f"depth argsort C={C}")

    order = B._depth_order(proj)

    def pf_cand(s, i):
        p = proj._replace(means2d=proj.means2d + s * 1e-9)
        ct, cv, lost = B._candidates(p, order, H, W, 16, 5, 0, 0, H, W)
        return (ct.sum() + cv.sum() + lost.sum()).astype(
            jnp.float32) * 1e-12 + s
    slope(pf_cand, "candidate grid build [C,25]")

    ct, cv, lost = B._candidates(proj, order, H, W, 16, 5, 0, 0, H, W)
    rank = jnp.arange(C, dtype=jnp.int32)[:, None]

    def pf_key(s, i):
        key = jnp.where(cv, (ct ^ (i + jnp.int32(s * 0))) * C + rank,
                        2 ** 31 - 1)
        return key.reshape(-1)[::4097].sum().astype(jnp.float32) * 1e-9 + s
    slope(pf_key, "key build + where")

    cand_key = jnp.where(cv, ct * C + rank, 2 ** 31 - 1).reshape(-1)

    def pf_sort(s, i):
        k = jax.lax.sort(cand_key ^ (i + jnp.int32(s * 0)))
        return k[:K].sum().astype(jnp.float32) * 1e-12 + s
    slope(pf_sort, f"candidate 1-op sort n={cand_key.shape[0]}")

    s_key = jax.lax.sort(cand_key)[:K]
    s_tile = jnp.where(s_key == 2 ** 31 - 1, 2500, s_key // C)

    def pf_layout(s, i):
        st = s_tile ^ 0 * (i + jnp.int32(s * 0))
        tids = jnp.arange(2500, dtype=jnp.int32)
        end = jnp.searchsorted(st, tids, side="right").astype(jnp.int32)
        return end.sum().astype(jnp.float32) * 1e-9 + s
    slope(pf_layout, "layout searchsorted 2500q")

    def pf_gather_order(s, i):
        o = order ^ (i + jnp.int32(s * 0))
        m = proj.means2d[o]
        r = proj.radius[o]
        v = proj.visible[o]
        return (m.sum() + r.sum() + v.sum()) * 1e-9 + s
    slope(pf_gather_order, f"3 depth-order gathers [C]")


if __name__ == "__main__":
    main()
