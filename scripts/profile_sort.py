"""Microbenchmark: XLA lax.sort costs at the binning/pack-bwd sizes, plus
binning sub-stage costs, on the real chip.  Informs the Pallas sort design."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench(fn, *args, iters=10, name=""):
    f = jax.jit(fn)
    t0 = time.perf_counter()
    out = f(*args)
    jax.block_until_ready(out)
    compile_s = time.perf_counter() - t0
    # distinct inputs per iter: xor a counter into int arrays, add eps to floats
    t0 = time.perf_counter()
    for i in range(iters):
        args_i = [a ^ (i + 1) if a.dtype in (jnp.int32, jnp.uint32)
                  else a + (i + 1) * 1e-7 for a in args]
        out = f(*args_i)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:48s} {dt * 1e3:8.2f} ms  (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)

    # --- raw sort costs ---
    for n in (2 ** 20, 3_276_800, 2 ** 22):
        keys = jnp.asarray(rng.integers(0, 2 ** 30, n, dtype=np.int32))
        bench(lambda k: jax.lax.sort(k), keys, name=f"sort 1-op int32 n={n}")
        iota = jnp.arange(n, dtype=jnp.int32)
        bench(lambda k, i: jax.lax.sort((k, i), num_keys=1), keys, iota,
              name=f"sort 2-op int32 n={n}")

    # --- searchsorted method=sort at binning size ---
    n, q = 2 ** 20, 2500
    keys = jnp.sort(jnp.asarray(rng.integers(0, 2 ** 30, n, dtype=np.int32)))
    qs = jnp.arange(q, dtype=jnp.int32)
    bench(lambda k: jnp.searchsorted(k, qs, side="right", method="sort"),
          keys, name=f"searchsorted(sort) n={n} q={q}")

    # --- cumsum blocked at pack-bwd size ---
    from mini3dgs_tpu.ops.binning import _cumsum_blocked_last
    x = jnp.asarray(rng.random((16, 1_310_720), dtype=np.float32))
    bench(lambda v: _cumsum_blocked_last(v), x,
          name="cumsum blocked [16, 1.31M]")

    # --- transpose + row gather at pack-bwd size ---
    perm = jnp.asarray(rng.permutation(1_310_720).astype(np.int32))
    bench(lambda v: v.T[perm], x, name="transpose + row-gather [1.31M,16]")
    xt = jnp.asarray(rng.random((1_310_720, 16), dtype=np.float32))
    bench(lambda v: v[perm], xt, name="row-gather [1.31M,16]")


if __name__ == "__main__":
    main()
