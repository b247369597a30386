"""Isolate the backward costs at bench config: raster-kernel bwd alone
(fixed packed inputs) and pack bwd alone.  Slope methodology."""

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
    from mini3dgs_tpu.ops import raster_pallas as RP
    from mini3dgs_tpu.ops.projection import project_gaussians

    W = H = 800
    C = 2 ** 17
    G = 128
    K = 2 ** 20
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    proj = project_gaussians(g, cam)
    b = jax.jit(lambda p: B.bin_gaussians(p, H, W, 16, K, G, radius_max=50.0,
                                          max_dup_per_axis=5))(proj)
    K = int(b.s_rank.shape[0])
    zeros = jnp.zeros_like(proj.depth)
    attrs = jnp.stack([
        proj.means2d[:, 0], proj.means2d[:, 1],
        proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2],
        proj.opacity, proj.color[:, 0], proj.color[:, 1], proj.color[:, 2],
        proj.depth, jnp.ones_like(proj.depth),
    ] + [zeros] * (B.N_ROWS - 11), axis=1)
    inst0 = B.pack_instances(attrs, b.s_rank, b.rank_counts, b.order,
                             b.inv_order, b.n_live, G)
    tiles_x = W // 16
    num_tiles = tiles_x * (H // 16)
    op = RP._make_raster_op(num_tiles, tiles_x, 16, G, K, 0, 0, False)

    # kernel fwd alone
    def pf_kfwd(s, i):
        out = op(inst0 * (1.0 + s * 1e-12), b.tile_start, b.tile_count)
        return out.sum() * 1e-9 + s
    t_kf = slope(pf_kfwd, "raster kernel fwd alone")

    # kernel fwd+bwd (custom VJP incl. head merge)
    def kernel_loss(inst):
        out = op(inst, b.tile_start, b.tile_count)
        return jnp.sum(out[:, 0:5] * 1e-6)

    gk = jax.grad(kernel_loss)

    def pf_kboth(s, i):
        d = gk(inst0 * (1.0 + s * 1e-12))
        return jnp.sum(d[:, 0]) * 1e-9 + s
    t_kb = slope(pf_kboth, "raster kernel fwd+bwd (+head merge)")

    # pack fwd alone / fwd+bwd
    def pack_of(a):
        return B.pack_instances(a, b.s_rank, b.rank_counts, b.order,
                                b.inv_order, b.n_live, G)

    def pf_pfwd(s, i):
        return jnp.sum(pack_of(attrs * (1.0 + s * 1e-12))[:, 0]) * 1e-9 + s
    t_pf = slope(pf_pfwd, "pack fwd alone")

    gp = jax.grad(lambda a: jnp.sum(pack_of(a) * 1e-6))

    def pf_pboth(s, i):
        d = gp(attrs * (1.0 + s * 1e-12))
        return jnp.sum(d) * 1e-9 + s
    t_pb = slope(pf_pboth, "pack fwd+bwd")

    print("\nderived:")
    print(f"  kernel bwd (+merge) = {1e3 * (t_kb - t_kf):.2f}")
    print(f"  pack bwd = {1e3 * (t_pb - t_pf):.2f}")


if __name__ == "__main__":
    main()
