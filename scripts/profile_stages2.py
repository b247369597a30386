# NOTE: written against the pre-compact-stream binning API; kept for
# the measurement record.  Use profile_stages3.py / profile_pack.py.
"""Trustworthy per-stage profile: every measurement is the SLOPE of a
chained fori_loop (k2-k1 extra iterations) with a forced scalar fetch —
immune to the remote tunnel's async dispatch and execution dedupe.

Measures pipeline prefixes AND the micro-ops inside binning / pack-bwd.
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
    """body_of_scalar(s: f32 scalar, i) -> f32 scalar; chained k times."""
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
    print(f"{name:52s} {per * 1e3:8.2f} ms", flush=True)
    return per


def main():
    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops import binning as B
    from mini3dgs_tpu.ops.projection import project_gaussians
    from mini3dgs_tpu.ops.renderer import RenderSettings, render

    W = H = 800
    C = 2 ** 17
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    settings = RenderSettings(image_height=H, image_width=W, use_pallas=True,
                              max_instances=2 ** 20, gaussian_chunk=256,
                              max_dup_per_axis=5)
    target = jnp.zeros((3, H, W), jnp.float32)
    params0 = g.params()

    def with_s(s):
        # perturb one param by the carried scalar so iterations chain
        return {**params0, "xyz": params0["xyz"] * (1.0 + s * 1e-9)}

    def proj_of(params):
        return project_gaussians(g.with_params(params), cam)

    # ---- pipeline prefixes ----
    def pf_proj(s, i):
        p = proj_of(with_s(s))
        return jnp.sum(p.means2d) * 1e-12 + s

    def pf_bin(s, i):
        p = proj_of(with_s(s))
        b = B.bin_gaussians(p, H, W, 16, 2 ** 20, 256, radius_max=50.0,
                            max_dup_per_axis=5)
        return (jnp.sum(b.slot_rank) + jnp.sum(b.tile_count)).astype(
            jnp.float32) * 1e-12 + s

    def full_loss(params):
        out = render(g.with_params(params), cam, settings)
        return jnp.abs(out["image"] - target).mean()

    def pf_fwd(s, i):
        return full_loss(with_s(s)) * 1e-6 + s

    gfull = jax.grad(full_loss)

    def pf_fwdbwd(s, i):
        d = gfull(with_s(s))
        return jnp.sum(d["xyz"]) * 1e-12 + s

    t_proj = slope(pf_proj, "proj fwd")
    t_bin = slope(pf_bin, "proj+binning fwd")
    t_fwd = slope(pf_fwd, "full fwd")
    t_all = slope(pf_fwdbwd, "full fwd+bwd (bench step)", k2=7)

    # ---- binning micro-ops at true sizes ----
    rng = np.random.default_rng(0)
    MAXDUP = 25
    ncand = C * MAXDUP
    K = 2 ** 20
    cand = jnp.asarray(rng.integers(0, 2500 * C, ncand, dtype=np.int32))

    slope(lambda s, i: jax.lax.sort(
        cand ^ (i + jnp.int32(s * 100)))[:K].sum().astype(jnp.float32) * 1e-12
        + s, f"candidate 1-op sort n={ncand} (take {K})")

    skeys = jnp.sort(jnp.asarray(
        rng.integers(0, 2500, K, dtype=np.int32)))
    tids = jnp.arange(2500, dtype=jnp.int32)

    def pf_ss(s, i):
        k = skeys + jnp.int32(s * 0)
        end = jnp.searchsorted(k, tids, side="right", method="sort")
        return end.sum().astype(jnp.float32) * 1e-9 + s
    slope(pf_ss, f"searchsorted(method=sort) keys={K} q=2500")

    def pf_ss_scan(s, i):
        k = skeys + jnp.int32(s * 0)
        end = jnp.searchsorted(k, tids, side="right")
        return end.sum().astype(jnp.float32) * 1e-9 + s
    slope(pf_ss_scan, f"searchsorted(method=scan) keys={K} q=2500")

    # chunk machinery: vmap dynamic_slice of [NC] chunks
    NC = (K + 2500 * 255 + 256) // 256
    s_rank = jnp.asarray(rng.integers(0, C, K + 256, dtype=np.int32))
    src = jnp.asarray(rng.integers(0, K - 1, NC, dtype=np.int32))

    def pf_chunks(s, i):
        sr = s_rank ^ (i + jnp.int32(s * 0))
        out = jax.vmap(lambda st: jax.lax.dynamic_slice(sr, (st,), (256,)))(src)
        return out.sum().astype(jnp.float32) * 1e-12 + s
    slope(pf_chunks, f"vmap dynamic_slice chunks NC={NC}")

    # ---- pack-bwd micro-ops ----
    K_pad = NC * 256
    gT = jnp.asarray(rng.random((16, K_pad), dtype=np.float32))
    perm = jnp.asarray(rng.permutation(K_pad).astype(np.int32))

    def pf_rowgather(s, i):
        x = (gT + s * 1e-9).T
        return x[perm].sum() * 1e-9 + s
    slope(pf_rowgather, f"transpose+row-gather [{K_pad},16]")

    from mini3dgs_tpu.ops.binning import _cumsum_blocked_last

    def pf_cumsum(s, i):
        x = gT + s * 1e-9
        return _cumsum_blocked_last(x)[:, -1].sum() * 1e-9 + s
    slope(pf_cumsum, f"cumsum blocked [16,{K_pad}]")

    key = jnp.asarray(rng.integers(0, C, K_pad, dtype=np.int32))
    iota = jnp.arange(K_pad, dtype=jnp.int32)

    def pf_sort2(s, i):
        k = key ^ (i + jnp.int32(s * 0))
        sk, pm = jax.lax.sort((k, iota), num_keys=1)
        return (sk[-1] + pm[-1]).astype(jnp.float32) * 1e-9 + s
    slope(pf_sort2, f"2-op sort n={K_pad}")

    qs = jnp.arange(C, dtype=jnp.int32)
    skey2 = jnp.sort(key)

    def pf_ss2(s, i):
        k = skey2 + jnp.int32(s * 0)
        end = jnp.searchsorted(k, qs, side="right", method="sort")
        return end.sum().astype(jnp.float32) * 1e-9 + s
    slope(pf_ss2, f"searchsorted(sort) keys={K_pad} q={C}")

    csum = jnp.asarray(rng.random((K_pad + 1, 16), dtype=np.float32))
    endq = jnp.asarray(rng.integers(0, K_pad, C, dtype=np.int32))

    def pf_boundary(s, i):
        x = csum + s * 1e-9
        return (x[endq] - x[jnp.maximum(endq - 1, 0)]).sum() * 1e-9 + s
    slope(pf_boundary, f"2x boundary row-gather [{C},16] from [{K_pad},16]")

    print("\nderived:")
    print(f"  binning = {1e3 * (t_bin - t_proj):.2f}")
    print(f"  pack+raster fwd = {1e3 * (t_fwd - t_bin):.2f}")
    print(f"  bwd total = {1e3 * (t_all - t_fwd):.2f}")


if __name__ == "__main__":
    main()
