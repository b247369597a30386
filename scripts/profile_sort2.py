"""Verify the 1-op vs 2-op lax.sort anomaly with airtight measurement:
every variant reduces to a scalar that is fetched to host each iteration."""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def bench(make_fn, args, iters=10, name=""):
    f = jax.jit(make_fn)
    t0 = time.perf_counter()
    out = f(*args, jnp.int32(0))
    out = jax.tree.map(lambda x: float(x), out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    acc = 0.0
    for i in range(iters):
        acc += float(f(*args, jnp.int32(i + 1)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:52s} {dt * 1e3:8.2f} ms  (compile {compile_s:.1f}s)",
          flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    n = 3_276_800
    keys = jnp.asarray(rng.integers(0, 2 ** 30, n, dtype=np.int32))
    iota = jnp.arange(n, dtype=jnp.int32)

    bench(lambda k, c: jax.lax.sort(k ^ c)[-1].astype(jnp.float32),
          (keys,), name=f"1-op sort, fetch last, n={n}")
    bench(lambda k, i, c: jax.lax.sort((k ^ c, i), num_keys=1)[0][-1]
          .astype(jnp.float32), (keys, iota),
          name=f"2-op sort (payload iota), fetch last, n={n}")
    bench(lambda k, i, c: (lambda s: (s[0][-1] + s[1][-1]).astype(jnp.float32))(
        jax.lax.sort((k ^ c, i), num_keys=1)), (keys, iota),
          name=f"2-op sort, fetch BOTH outputs, n={n}")
    bench(lambda k, c: jax.lax.sort((k ^ c,), num_keys=1)[0][-1]
          .astype(jnp.float32), (keys,),
          name=f"1-op-as-tuple sort, n={n}")
    # dummy second operand: does a constant payload also get the fast path?
    bench(lambda k, c: jax.lax.sort((k ^ c, jnp.zeros_like(k)), num_keys=1)[0]
          [-1].astype(jnp.float32), (keys,),
          name=f"2-op sort (payload zeros), n={n}")
    # 2 keys (lexicographic)
    bench(lambda k, i, c: jax.lax.sort((k ^ c, i), num_keys=2)[0][-1]
          .astype(jnp.float32), (keys, iota),
          name=f"2-KEY sort (num_keys=2), n={n}")
    # float32 single
    fkeys = jnp.asarray(rng.random(n, dtype=np.float32))
    bench(lambda k, c: jax.lax.sort(k + c.astype(jnp.float32) * 1e-9)[-1],
          (fkeys,), name=f"1-op float32 sort, n={n}")
    # uint32 single
    bench(lambda k, c: jax.lax.sort(k.astype(jnp.uint32) ^ c.astype(jnp.uint32))
          [-1].astype(jnp.float32), (keys,),
          name=f"1-op uint32 sort, n={n}")
    # argsort (what binning's depth sort uses) at C=131072, f32 keys
    dk = jnp.asarray(rng.random(131072, dtype=np.float32))
    bench(lambda k, c: jnp.argsort(k + c.astype(jnp.float32) * 1e-9)[-1]
          .astype(jnp.float32), (dk,), name="argsort f32 n=131072")


if __name__ == "__main__":
    main()
