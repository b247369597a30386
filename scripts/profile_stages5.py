"""Trimmed stage split at the bench config (tile 32, G=256, DUP=3, K=2^19):
proj+binning / +pack fwd / full fwd / full fwd+bwd.  Slope methodology."""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def slope(body_of_scalar, name, k1=2, k2=12, reps=3):
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
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    W = H = 800
    C = 2 ** 17
    G = 256
    TS = 32
    K = 2 ** 19
    DUP = 3
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                              max_instances=K, gaussian_chunk=G, tile_size=TS,
                              max_dup_per_axis=DUP)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    def with_s(s):
        return {**params0, "xyz": params0["xyz"] * (1.0 + s * 1e-9)}

    def bin_of(params):
        p = project_gaussians(g.with_params(params), cam)
        return p, B.bin_gaussians(p, H, W, TS, K, G, radius_max=50.0,
                                  max_dup_per_axis=DUP)

    def pf_bin(s, i):
        _, b = bin_of(with_s(s))
        return (jnp.sum(b.tile_count) + jnp.sum(b.n_live)
                + jnp.sum(b.s_rank)).astype(jnp.float32) * 1e-12 + s

    def attrs_of(p):
        zeros = jnp.zeros_like(p.depth)
        return jnp.stack([
            p.means2d[:, 0], p.means2d[:, 1],
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.opacity, p.color[:, 0], p.color[:, 1], p.color[:, 2],
            p.depth, jnp.ones_like(p.depth),
        ] + [zeros] * (B.N_ROWS - 11), axis=1)

    def pf_pack(s, i):
        p, b = bin_of(with_s(s))
        inst = B.pack_instances(attrs_of(p), b.s_rank, b.rank_perm,
                                b.rank_key, b.seg_start_gid,
                                b.counts_gid, b.order, b.n_live, G, DUP * DUP)
        return jnp.sum(inst[:, 0]) * 1e-9 + s

    def full_loss(params):
        out = render(g.with_params(params), cam, settings)
        return jnp.abs(out["image"] - target).mean()

    def pf_fwd(s, i):
        return full_loss(with_s(s)) * 1e-6 + s

    gfull = jax.grad(full_loss)

    def pf_fwdbwd(s, i):
        d = gfull(with_s(s))
        return jnp.sum(d["xyz"]) * 1e-12 + s

    # pack fwd+bwd in isolation (11-op sort now)
    def pack_loss(params):
        p, b = bin_of(params)
        inst = B.pack_instances(attrs_of(p), b.s_rank, b.rank_perm,
                                b.rank_key, b.seg_start_gid,
                                b.counts_gid, b.order, b.n_live, G, DUP * DUP)
        return jnp.sum(inst * inst) * 1e-9

    gpack = jax.grad(pack_loss)

    def pf_packbwd(s, i):
        d = gpack(with_s(s))
        return jnp.sum(d["xyz"]) * 1e-12 + s

    slope(pf_bin, "proj+binning")
    slope(pf_pack, "proj+binning+pack fwd")
    slope(pf_packbwd, "proj+binning+pack fwd+bwd", k2=7)
    slope(pf_fwd, "full fwd")
    slope(pf_fwdbwd, "full fwd+bwd (bench step)", k2=7)


if __name__ == "__main__":
    main()
