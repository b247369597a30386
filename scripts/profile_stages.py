# NOTE: written against the pre-compact-stream binning API; kept for
# the measurement record.  Use profile_stages3.py / profile_pack.py.
"""Per-stage timing of the Pallas render pipeline on the real chip.

Times jitted PREFIXES of the pipeline and reports diffs, so each stage's
cost includes exactly its own work (XLA DCEs everything not needed for the
returned value).  Distinct inputs per iteration (the remote runtime dedupes
identical executions).

Usage:  python scripts/profile_stages.py [--width 800 --n 100000]
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--capacity", type=int, default=2 ** 17)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops import binning as B
    from mini3dgs_tpu.ops.projection import project_gaussians
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    W = H = args.width
    g, cam = _scene(capacity=args.capacity, n=args.n, width=W, height=H)
    settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                              max_instances=2 ** 20, gaussian_chunk=256,
                              max_dup_per_axis=5)
    target = jnp.zeros((3, H, W), jnp.float32)

    G = settings.gaussian_chunk

    def proj_of(params):
        return project_gaussians(
            g.with_params(params), cam,
            radius_min=settings.radius_min, radius_max=settings.radius_max)

    def f_proj(params):
        p = proj_of(params)
        return sum(jnp.sum(x) for x in
                   [p.means2d, p.conic, p.depth, p.radius, p.color, p.opacity])

    def f_bin(params):
        p = proj_of(params)
        b = B.bin_gaussians(p, H, W, settings.tile_size,
                            settings.max_instances, G,
                            radius_max=settings.radius_max,
                            max_dup_per_axis=settings.max_dup_per_axis)
        return (jnp.sum(b.slot_rank) + jnp.sum(b.tile_start)
                + jnp.sum(b.tile_count) + jnp.sum(b.live))

    def _attrs_inst(params):
        p = proj_of(params)
        b = B.bin_gaussians(p, H, W, settings.tile_size,
                            settings.max_instances, G,
                            radius_max=settings.radius_max,
                            max_dup_per_axis=settings.max_dup_per_axis)
        zeros = jnp.zeros_like(p.depth)
        attrs = jnp.stack([
            p.means2d[:, 0], p.means2d[:, 1],
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.opacity, p.color[:, 0], p.color[:, 1], p.color[:, 2],
            p.depth, jnp.ones_like(p.depth)] + [zeros] * (B.N_ROWS - 11),
            axis=1)
        inst = B.pack_instances(attrs, b.s_rank, b.src_row, b.live,
                                b.rank_counts, b.order, b.inv_order)
        return inst

    def f_pack(params):
        return jnp.sum(_attrs_inst(params))

    def f_fwd(params):
        out = render(g.with_params(params), cam, settings)
        return jnp.abs(out["image"] - target).mean()

    g_pack = jax.grad(f_pack)
    g_fwd = jax.grad(f_fwd)

    def f_projgrad(params):
        return f_proj(params)
    g_proj = jax.grad(f_projgrad)

    fns = {
        "fwd: projection": jax.jit(f_proj),
        "fwd: +binning": jax.jit(f_bin),
        "fwd: +pack": jax.jit(f_pack),
        "fwd: full (raster+blend)": jax.jit(f_fwd),
        "bwd: proj-only grad": jax.jit(g_proj),
        "bwd: pack grad (no raster)": jax.jit(g_pack),
        "bwd: full grad (bench step)": jax.jit(g_fwd),
    }

    params0 = g.params()
    results = {}
    for name, fn in fns.items():
        t0 = time.perf_counter()
        out = fn(params0)
        jax.block_until_ready(out)
        compile_s = time.perf_counter() - t0
        # warm
        for i in range(2):
            out = fn(jax.tree.map(
                lambda x: x + (i + 1) * 1e-7 if x.dtype == jnp.float32 else x,
                params0))
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(args.iters):
            out = fn(jax.tree.map(
                lambda x: x + (i + 3) * 1e-7 if x.dtype == jnp.float32 else x,
                params0))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / args.iters
        results[name] = dt
        print(f"{name:32s} {dt * 1e3:8.2f} ms   (compile {compile_s:.1f}s)",
              flush=True)

    print("\n--- stage diffs ---")
    ms = {k: v * 1e3 for k, v in results.items()}
    print(f"projection fwd      : {ms['fwd: projection']:.2f}")
    print(f"binning             : {ms['fwd: +binning'] - ms['fwd: projection']:.2f}")
    print(f"pack fwd            : {ms['fwd: +pack'] - ms['fwd: +binning']:.2f}")
    print(f"raster fwd + blend  : {ms['fwd: full (raster+blend)'] - ms['fwd: +pack']:.2f}")
    print(f"full fwd            : {ms['fwd: full (raster+blend)']:.2f}")
    print(f"pack bwd + chain    : {ms['bwd: pack grad (no raster)'] - ms['fwd: +pack']:.2f}")
    print(f"full fwd+bwd        : {ms['bwd: full grad (bench step)']:.2f}")
    print(f"raster bwd + extra  : {ms['bwd: full grad (bench step)'] - ms['bwd: pack grad (no raster)'] - (ms['fwd: full (raster+blend)'] - ms['fwd: +pack']):.2f}")


if __name__ == "__main__":
    main()
