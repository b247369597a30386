"""Finer stage split at the BENCH config (G=128, max_dup=5, K=2^20):
bin / bin+pack / full fwd / fwd+bwd, plus gather-layout micro-experiments
(16-float rows vs 8-instance 128-lane grouped rows) to size the pack
redesign.  Slope-of-chained-fori-loop methodology (see profile_stages2.py).
"""

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
    G = 128
    K = 2 ** 20
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                              max_instances=K, gaussian_chunk=G,
                              max_dup_per_axis=5)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    def with_s(s):
        return {**params0, "xyz": params0["xyz"] * (1.0 + s * 1e-9)}

    def proj_of(params):
        return project_gaussians(g.with_params(params), cam)

    def bin_of(params):
        p = proj_of(params)
        return p, B.bin_gaussians(p, H, W, 16, K, G, radius_max=50.0,
                                  max_dup_per_axis=5)

    def pf_bin(s, i):
        _, b = bin_of(with_s(s))
        # cheap full passes only — no scalar-gather debug properties
        return (jnp.sum(b.tile_count) + jnp.sum(b.n_live)
                + jnp.sum(b.s_rank)).astype(jnp.float32) * 1e-12 + s

    def pf_pack(s, i):
        p, b = bin_of(with_s(s))
        zeros = jnp.zeros_like(p.depth)
        attrs = jnp.stack([
            p.means2d[:, 0], p.means2d[:, 1],
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.opacity, p.color[:, 0], p.color[:, 1], p.color[:, 2],
            p.depth, jnp.ones_like(p.depth),
        ] + [zeros] * (B.N_ROWS - 11), axis=1)
        inst = B.pack_instances(attrs, b.s_rank, b.rank_counts, b.order,
                                b.inv_order, b.n_live, G)
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

    t_bin = slope(pf_bin, "proj+binning (clean)")
    t_pack = slope(pf_pack, "proj+binning+pack fwd")
    t_fwd = slope(pf_fwd, "full fwd")
    t_all = slope(pf_fwdbwd, "full fwd+bwd (bench step)", k2=7)

    # ---- gather-layout micro-experiments ----
    rng = np.random.default_rng(0)
    K_pad = (K + 2500 * (G - 1) + G + G - 1) // G * G

    src = jnp.asarray(rng.integers(0, C - 1, K, dtype=np.int32))
    attrs_c = jnp.asarray(rng.random((C, 16), dtype=np.float32))

    def pf_g1(s, i):
        x = attrs_c + s * 1e-9
        return x[src].sum() * 1e-9 + s
    slope(pf_g1, f"[{K},16] random row gather from [{C},16]")

    # run-structured indices: consecutive runs of length >= G (the padded
    # expansion's actual index pattern)
    starts = np.sort(rng.integers(0, K - G, K_pad // G).astype(np.int32))
    run_idx = (starts[:, None] + np.arange(G, dtype=np.int32)[None]).reshape(-1)
    run_idx = jnp.asarray(run_idx)
    comp = jnp.asarray(rng.random((K, 16), dtype=np.float32))

    def pf_g2(s, i):
        x = comp + s * 1e-9
        return x[run_idx].sum() * 1e-9 + s
    slope(pf_g2, f"[{K_pad},16] run-structured row gather from [{K},16]")

    # grouped: 8 instances x 16 attrs = 128 lanes per row, 8-aligned runs
    comp8 = jnp.asarray(rng.random((K // 8, 128), dtype=np.float32))
    starts8 = np.sort(rng.integers(0, K // 8 - G // 8,
                                   K_pad // G).astype(np.int32))
    run8 = (starts8[:, None]
            + np.arange(G // 8, dtype=np.int32)[None]).reshape(-1)
    run8 = jnp.asarray(run8)

    def pf_g3(s, i):
        x = comp8 + s * 1e-9
        return x[run8].sum() * 1e-9 + s
    slope(pf_g3, f"[{K_pad // 8},128] grouped row gather from [{K // 8},128]")

    # same but random group indices (compact-stage analog, 8x fewer rows)
    rnd8 = jnp.asarray(rng.integers(0, K // 8 - 1, K // 8, dtype=np.int32))

    def pf_g4(s, i):
        x = comp8 + s * 1e-9
        return x[rnd8].sum() * 1e-9 + s
    slope(pf_g4, f"[{K // 8},128] random row gather from [{K // 8},128]")

    # one-hot matmul alternative for the compact gather:
    # [K,16] = onehot[K, C] @ [C,16] is K*C*16 MXU flops = 2^20*2^17*16 — no.
    # bf16 variants of the two big gathers
    comp_bf = comp.astype(jnp.bfloat16)

    def pf_g5(s, i):
        x = comp_bf + jnp.bfloat16(s * 1e-9)
        return x[run_idx].sum().astype(jnp.float32) * 1e-9 + s
    slope(pf_g5, f"[{K_pad},16] bf16 run-structured row gather")

    print("\nderived:")
    print(f"  pack fwd = {1e3 * (t_pack - t_bin):.2f}")
    print(f"  raster fwd kernel = {1e3 * (t_fwd - t_pack):.2f}")
    print(f"  bwd total = {1e3 * (t_all - t_fwd):.2f}")


if __name__ == "__main__":
    main()
