"""Micro-profile of the pack-bwd-v1 internals at K=2^20, C=2^17, G=256:
which of (2-op sort, [K,16] relayout, row gather, blocked cumsum,
boundary gathers) costs the 15 ms.  Slope methodology.

MEASUREMENT RECORD (v1 pack bwd, since redesigned — the `_pack_bwd` call
at the bottom no longer matches the current signature):
  2-op sort 1.12 / relayout 0.06(DCEd) / [K,16] row gather 6.60 /
  blocked cumsum 3.02 / boundary gathers 1.28 / whole 12.21 ms.
The row gather (4KB tile read per row) motivated the sort-carried v2."""

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
    from mini3dgs_tpu.ops import binning as B

    C = 2 ** 17
    K = 2 ** 20
    G = 256
    NR = B.N_ROWS
    rng = np.random.default_rng(0)

    s_rank = jnp.asarray(rng.integers(0, C, K, dtype=np.int32))
    g = jnp.asarray(rng.random((K // G, NR, G), dtype=np.float32))
    rank_counts = jnp.asarray(rng.integers(0, 25, C, dtype=np.int32))
    inv_order = jnp.asarray(rng.permutation(C).astype(np.int32))
    n_live = jnp.int32(K - 1000)

    iota = jnp.arange(K, dtype=jnp.int32)

    def key_of(s):
        return jnp.where(iota < n_live, s_rank, C) + (s * 1e-12).astype(
            jnp.int32)

    def pf_sort(s, i):
        sk, perm = jax.lax.sort((key_of(s), iota), num_keys=1)
        return sk[0].astype(jnp.float32) * 1e-12 + s
    slope(pf_sort, "2-op sort (key, iota) K=2^20")

    def pf_relayout(s, i):
        gK = (g + s * 1e-12).transpose(1, 0, 2).reshape(NR, K).T
        gK = jax.lax.optimization_barrier(gK)
        return gK[0, 0] * 1e-12 + s
    slope(pf_relayout, "g [K//G,16,G] -> [K,16] relayout")

    perm0 = jnp.asarray(rng.permutation(K).astype(np.int32))
    gK0 = jnp.asarray(rng.random((K, NR), dtype=np.float32))

    def pf_gather(s, i):
        x = gK0 + s * 1e-12
        return x[perm0][0, 0] * 1e-12 + s
    slope(pf_gather, "[K,16] row gather by perm")

    def pf_cumsum(s, i):
        x = gK0 + s * 1e-12
        c = B._cumsum_blocked_last(x.T).T
        return c[0, 0] * 1e-12 + s
    slope(pf_cumsum, "blocked cumsum [16,K] + transposes")

    def pf_cumsum_notrans(s, i):
        x = gK0.T + s * 1e-12            # already [16, K]
        c = B._cumsum_blocked_last(x)
        return c[0, 0] * 1e-12 + s
    slope(pf_cumsum_notrans, "blocked cumsum [16,K] (no transposes)")

    csum0 = jnp.asarray(rng.random((K + 1, NR), dtype=np.float32))
    end0 = jnp.asarray(np.sort(rng.integers(0, K, C)).astype(np.int32))

    def pf_bound(s, i):
        x = csum0 + s * 1e-12
        d = x[end0] - x[jnp.maximum(end0 - 5, 0)]
        return d[0, 0] * 1e-12 + s
    slope(pf_bound, "2x [C,16] boundary row gathers from [K+1,16]")

    def pf_whole(s, i):
        d = B._pack_bwd(G, (s_rank, rank_counts, inv_order, n_live),
                        g + s * 1e-12)[0]
        return d[0, 0] * 1e-12 + s
    slope(pf_whole, "whole _pack_bwd")


if __name__ == "__main__":
    main()
