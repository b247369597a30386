"""Micro-profile of pack-bwd v2 internals at K=2^20, C=2^17, G=256:
(16 strided slices of g, 17-op sort, masked doubling, stack+lane-gather,
whole _pack_bwd).  Slope methodology."""

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
    MAX_SEG = 25
    rng = np.random.default_rng(0)

    s_rank = jnp.asarray(rng.integers(0, C, K, dtype=np.int32))
    g = jnp.asarray(rng.random((K // G, NR, G), dtype=np.float32))
    seg_start = jnp.asarray(np.sort(rng.integers(0, K, C)).astype(np.int32))
    counts_gid = jnp.asarray(rng.integers(0, 25, C, dtype=np.int32))
    n_live = jnp.int32(K - 1000)
    iota = jnp.arange(K, dtype=jnp.int32)

    def pf_slices(s, i):
        x = g + s * 1e-12
        rows = [x[:, r, :].reshape(K) for r in range(NR)]
        acc = rows[0]
        for r in rows[1:]:
            acc = acc + r
        return acc[0] * 1e-12 + s
    slope(pf_slices, "16 strided slices of g (summed to defeat DCE)")

    def pf_sort17(s, i):
        key = jnp.where(iota < n_live, s_rank, C) + (s * 1e-12).astype(
            jnp.int32)
        rows = tuple(g[:, r, :].reshape(K) for r in range(NR))
        outs = jax.lax.sort((key,) + rows, num_keys=1)
        acc = outs[1]
        for r in outs[2:]:
            acc = acc + r
        return acc[0] * 1e-12 + s
    slope(pf_sort17, "slices + 17-op sort (all outputs consumed)")

    skey0 = jnp.asarray(np.sort(rng.integers(0, C, K)).astype(np.int32))
    rows16 = [jnp.asarray(rng.random(K, dtype=np.float32))
              for _ in range(NR)]

    def pf_doubling(s, i):
        acc = [r + s * 1e-12 for r in rows16]
        sh = 1
        while sh < MAX_SEG:
            kshift = jnp.concatenate([skey0[sh:],
                                      jnp.full((sh,), -1, skey0.dtype)])
            same = kshift == skey0
            for j in range(NR):
                v = acc[j]
                vsh = jnp.concatenate([v[sh:], jnp.zeros((sh,), v.dtype)])
                acc[j] = v + jnp.where(same, vsh, 0.0)
            sh *= 2
        tot = acc[0]
        for a in acc[1:]:
            tot = tot + a
        return tot[0] * 1e-12 + s
    slope(pf_doubling, "masked doubling 16x[K], 5 passes (consumed)")

    def pf_readout(s, i):
        stacked = jnp.stack([r + s * 1e-12 for r in rows16])   # [16, K]
        dT = jnp.take(stacked, seg_start, axis=1)              # [16, C]
        d = dT.T
        return d[0, 0] * 1e-12 + s
    slope(pf_readout, "stack + [16,K] lane-gather + transpose")

    def pf_whole(s, i):
        d = B._pack_bwd(G, MAX_SEG, (s_rank, seg_start, counts_gid, n_live),
                        g + s * 1e-12)[0]
        return jnp.sum(d[0]) * 1e-12 + s
    slope(pf_whole, "whole _pack_bwd v2")


if __name__ == "__main__":
    main()
