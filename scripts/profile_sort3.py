"""Device-true sort timing: K dependent iterations inside one jit, one fetch.
Each iteration's input depends on the previous output (no dedupe, no overlap
ambiguity); reported time = (t(K2 iters) - t(K1 iters)) / (K2 - K1)."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


def bench_loop(body, init, name, k1=2, k2=52):
    @partial(jax.jit, static_argnames="iters")
    def run(x, iters):
        def step(i, x):
            return body(x, i)
        out = jax.lax.fori_loop(0, iters, step, x)
        return out.reshape(-1)[-1].astype(jnp.float32)  # scalar: force fetch

    for iters in (k1, k2):  # compile both
        float(run(init, iters))
    # fresh inputs for every timed call (runtime dedupes identical executions)
    if init.dtype == jnp.int32:
        pairs = [(init ^ (7 + 13 * j), init ^ (9 + 17 * j)) for j in range(3)]
    else:
        pairs = [(init + 1e-5 * (j + 1), init + 2e-5 * (j + 1))
                 for j in range(3)]
    pers = []
    for x1, x2 in pairs:
        x1, x2 = jax.block_until_ready((x1, x2))
        t0 = time.perf_counter()
        float(run(x1, k1))
        t1 = time.perf_counter()
        float(run(x2, k2))
        t2 = time.perf_counter()
        pers.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    per = float(np.median(pers))
    print(f"{name:52s} {per * 1e3:8.3f} ms/iter", flush=True)


def main():
    rng = np.random.default_rng(0)
    n = 3_276_800
    keys = jnp.asarray(rng.integers(0, 2 ** 30, n, dtype=np.int32))

    bench_loop(lambda k, i: jax.lax.sort(k ^ (i + 1)), keys,
               f"1-op int32 sort n={n}")
    bench_loop(lambda k, i: jax.lax.sort((k ^ (i + 1), k), num_keys=1)[0],
               keys, f"2-op int32 sort n={n}")

    n2 = 2 ** 20
    k2 = jnp.asarray(rng.integers(0, 2 ** 30, n2, dtype=np.int32))
    bench_loop(lambda k, i: jax.lax.sort(k ^ (i + 1)), k2,
               f"1-op int32 sort n={n2}")
    bench_loop(lambda k, i: jax.lax.sort((k ^ (i + 1), k), num_keys=1)[0],
               k2, f"2-op int32 sort n={n2}")

    c = 131072
    fk = jnp.asarray(rng.random(c, dtype=np.float32))
    bench_loop(lambda k, i: jnp.argsort(k + 1e-9 * (i + 1)).astype(
        jnp.float32), fk, f"argsort f32 n={c}")


if __name__ == "__main__":
    main()
