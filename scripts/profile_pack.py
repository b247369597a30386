"""Micro-measurements to choose the pack fwd/bwd redesign (G=128 config).

Hypotheses from profile_stages3:
  * narrow (16-lane) row gathers pay ~4KB-tile reads when the SOURCE is big;
  * 128-lane row gathers run at full bandwidth even with random indices;
  * gathers from small sources are fast regardless.
This script prices every candidate building block.
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
    print(f"{name:60s} {per * 1e3:8.2f} ms", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    C = 2 ** 17
    K = 2 ** 20
    G = 128
    K_pad = (K + 2500 * (G - 1) + G + G - 1) // G * G
    NC = K_pad // G
    print(f"C={C} K={K} K_pad={K_pad} NC={NC}")

    # --- fwd candidates ---
    s_rank = jnp.asarray(rng.integers(0, C, K, dtype=np.int32))
    src_row = jnp.asarray(np.sort(rng.integers(0, K, K_pad)).astype(np.int32))

    def pf_rank1d(s, i):
        sr = s_rank ^ (i + jnp.int32(s * 0))
        return sr[src_row].sum().astype(jnp.float32) * 1e-12 + s
    slope(pf_rank1d, f"1-D int32 gather [{K_pad}] from [{K}] (rank_padded)")

    attrs_sorted = jnp.asarray(rng.random((C, 16), dtype=np.float32))
    rank_padded = jnp.asarray(rng.integers(0, C, K_pad, dtype=np.int32))

    def pf_direct(s, i):
        x = attrs_sorted + s * 1e-9
        return x[rank_padded].sum() * 1e-9 + s
    slope(pf_direct, f"[{K_pad},16] gather from [{C},16] (direct padded)")

    # --- bwd current baseline ---
    big = jnp.asarray(rng.random((K_pad, 16), dtype=np.float32))
    perm = jnp.asarray(rng.permutation(K_pad)[:K].astype(np.int32))

    def pf_bwd_cur(s, i):
        x = big + s * 1e-9
        return x[perm].sum() * 1e-9 + s
    slope(pf_bwd_cur, f"[{K},16] gather from [{K_pad},16] (bwd cur)")

    # --- bwd alt: 16 separate 1-D gathers from [K_pad] tables ---
    cols = jnp.asarray(rng.random((16, K_pad), dtype=np.float32))

    def pf_bwd_cols(s, i):
        x = cols + s * 1e-9
        tot = jnp.float32(0.0)
        for a in range(16):
            tot = tot + x[a][perm].sum()
        return tot * 1e-9 + s
    slope(pf_bwd_cols, f"16 x 1-D gather [{K}] from [{K_pad}] (bwd cols)")

    # one 1-D gather alone for scaling
    def pf_bwd_col1(s, i):
        x = cols + s * 1e-9
        return x[0][perm].sum() * 1e-9 + s
    slope(pf_bwd_col1, f"1 x 1-D f32 gather [{K}] from [{K_pad}]")

    # --- wide-row machinery ---
    narrow = jnp.asarray(rng.random((K, 16), dtype=np.float32))

    def pf_relayout(s, i):
        x = narrow + s * 1e-9
        return x.reshape(K // 8, 128).sum(axis=0)[0] * 1e-9 + s
    slope(pf_relayout, f"relayout [{K},16] -> [{K // 8},128] (reshape+reduce)")

    wide = jnp.asarray(rng.random((K_pad // 8, 128), dtype=np.float32))
    rnd_w = jnp.asarray(rng.integers(0, K_pad // 8, K_pad // 8,
                                     dtype=np.int32))

    def pf_wide_gather(s, i):
        x = wide + s * 1e-9
        return x[rnd_w].sum() * 1e-9 + s
    slope(pf_wide_gather,
          f"[{K_pad // 8},128] random gather from [{K_pad // 8},128]")

    # 8-way shift-select: out[r] = concat(A[r, 16s:], B[r, :16s]) by s[r]
    A = wide
    Bm = jnp.asarray(rng.random((K_pad // 8, 128), dtype=np.float32))
    sh = jnp.asarray(rng.integers(0, 8, K_pad // 8, dtype=np.int32))

    def pf_shift_select(s, i):
        a = A + s * 1e-9
        out = jnp.zeros_like(a)
        for sv in range(8):
            cand = (a if sv == 0 else
                    jnp.concatenate([a[:, 16 * sv:], Bm[:, :16 * sv]], axis=1))
            out = jnp.where((sh == sv)[:, None], cand, out)
        return out.sum() * 1e-9 + s
    slope(pf_shift_select, f"8-way shift-select [{K_pad // 8},128]")

    # --- sorts ---
    MAXD = 25
    ncand = C * MAXD
    cand = jnp.asarray(rng.integers(0, 2500 * C, ncand, dtype=np.int32))
    cid = jnp.arange(ncand, dtype=jnp.int32)

    def pf_sort2(s, i):
        k = cand ^ (i + jnp.int32(s * 0))
        sk, sc = jax.lax.sort((k, cid), num_keys=1)
        return (sk[:K].sum() + sc[:K].sum()).astype(jnp.float32) * 1e-12 + s
    slope(pf_sort2, f"2-op candidate sort n={ncand}")

    key = jnp.asarray(rng.integers(0, C, K_pad, dtype=np.int32))
    iota = jnp.arange(K_pad, dtype=jnp.int32)

    def pf_sortp(s, i):
        k = key ^ (i + jnp.int32(s * 0))
        sk, pm = jax.lax.sort((k, iota), num_keys=1)
        return (sk[-1] + pm[-1]).astype(jnp.float32) * 1e-9 + s
    slope(pf_sortp, f"2-op slot sort n={K_pad} (bwd perm)")

    # 9-op sort: key + 8 packed-bf16-pair payloads (value-carrying sort)
    pay = [jnp.asarray(rng.integers(0, 2 ** 31 - 1, K_pad, dtype=np.int32))
           for _ in range(8)]

    def pf_sort9(s, i):
        k = key ^ (i + jnp.int32(s * 0))
        out = jax.lax.sort(tuple([k] + pay), num_keys=1)
        return sum(o[-1] for o in out).astype(jnp.float32) * 1e-9 + s
    slope(pf_sort9, f"9-op value-carrying sort n={K_pad}")


if __name__ == "__main__":
    main()
