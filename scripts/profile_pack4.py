"""Size the pack-bwd v2 redesign: multi-operand sort-carried payload vs
perm+gather, and bounded-doubling masked segment-sum vs blocked cumsum.
Slope methodology."""

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
    C = 2 ** 17
    K = 2 ** 20
    rng = np.random.default_rng(0)

    key0 = jnp.asarray(rng.integers(0, C, K, dtype=np.int32))
    rows = [jnp.asarray(rng.random(K, dtype=np.float32)) for _ in range(16)]

    def key_of(s):
        return key0 + (s * 1e-12).astype(jnp.int32)

    def mk_sort(nops):
        def pf(s, i):
            outs = jax.lax.sort((key_of(s),) + tuple(rows[:nops - 1]),
                                num_keys=1)
            return outs[1][0] * 1e-12 + s
        return pf

    for nops in (3, 6, 11, 17):
        slope(mk_sort(nops), f"{nops}-op sort (key + {nops-1} f32 [K])")

    # bounded-doubling masked segment sum over 10 [K] lane vectors:
    # segments are contiguous runs of equal key (sorted), length <= 25.
    skey0 = jnp.asarray(np.sort(rng.integers(0, C, K)).astype(np.int32))

    def pf_doubling(s, i):
        vals = [r + s * 1e-12 for r in rows[:10]]
        key = skey0
        acc = list(vals)
        for sh in (1, 2, 4, 8, 16):
            kshift = jnp.concatenate(
                [key[sh:], jnp.full((sh,), -1, key.dtype)])
            same = kshift == key
            for j in range(10):
                v = acc[j]
                vsh = jnp.concatenate([v[sh:], jnp.zeros((sh,), v.dtype)])
                acc[j] = v + jnp.where(same, vsh, 0.0)
        return acc[0][0] * 1e-12 + s
    slope(pf_doubling, "bounded doubling segsum 10x[K] (5 masked passes)")

    # same but vals stacked as ONE [10, K] array (fewer, wider passes)
    def pf_doubling_stacked(s, i):
        v = jnp.stack(rows[:10]) + s * 1e-12      # [10, K]
        key = skey0[None, :]
        for sh in (1, 2, 4, 8, 16):
            kshift = jnp.concatenate(
                [key[:, sh:], jnp.full((1, sh), -1, key.dtype)], axis=1)
            same = kshift == key
            vsh = jnp.concatenate(
                [v[:, sh:], jnp.zeros((10, sh), v.dtype)], axis=1)
            v = v + jnp.where(same, vsh, 0.0)
        return v[0, 0] * 1e-12 + s
    slope(pf_doubling_stacked, "bounded doubling segsum [10,K] stacked")

    # start-gather comparison: [C] gathers from [K,10] rows (after stack+T)
    starts = jnp.asarray(np.sort(rng.integers(0, K, C)).astype(np.int32))

    def pf_startgather(s, i):
        v = jnp.stack(rows[:10], axis=0) + s * 1e-12   # [10, K]
        vr = v.T                                        # [K, 10] relayout
        out = vr[starts]                                # [C, 10]
        return out[0, 0] * 1e-12 + s
    slope(pf_startgather, "[10,K] -> [K,10] transpose + [C] row gather")

    # gather along lanes instead: out[c] = v[:, starts[c]] via one-hot mm?
    def pf_startgather_lanes(s, i):
        v = jnp.stack(rows[:10], axis=0) + s * 1e-12   # [10, K]
        out = jnp.take(v, starts, axis=1)              # [10, C]
        return out[0, 0] * 1e-12 + s
    slope(pf_startgather_lanes, "[10,K] lane-gather at C starts")


if __name__ == "__main__":
    main()
