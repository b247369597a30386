"""Sort cost vs operand count at K=2^20 (the pack-bwd sort), plus the
3.3M-key 1-op candidate sort.  Slope methodology."""

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

    def mk(nops):
        def pf(s, i):
            k = key0 + (s * 1e-12).astype(jnp.int32)
            outs = jax.lax.sort((k,) + tuple(rows[:nops - 1]), num_keys=1)
            acc = outs[0].astype(jnp.float32)
            for r in outs[1:]:
                acc = acc + r
            return acc[0] * 1e-12 + s
        return pf

    for nops in (1, 2, 6, 9, 11, 13, 17):
        slope(mk(nops), f"sort K=2^20, {nops} operands")

    n_keys = C * 25
    big = jnp.asarray(rng.integers(0, 2 ** 30, n_keys, dtype=np.int32))

    def pf_cand(s, i):
        k = big + (s * 1e-12).astype(jnp.int32)
        out = jax.lax.sort(k)
        return out[0].astype(jnp.float32) * 1e-12 + s

    slope(pf_cand, "candidate sort 3.3M keys, 1 operand")


if __name__ == "__main__":
    main()
