"""Pack-bwd micro-experiments: can the [K,16] rank-sorted gather and the
prefix machinery get cheaper?"""

import sys
import time
from functools import partial
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def slope(body_of_scalar, name, k1=2, k2=10, reps=3):
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
    K = 2 ** 20
    G = 128
    NC = K // G
    perm = jnp.asarray(rng.permutation(K).astype(np.int32))

    big = jnp.asarray(rng.random((K, 16), dtype=np.float32))

    def pf_cur(s, i):
        x = big + s * 1e-9
        return x[perm].sum() * 1e-9 + s
    slope(pf_cur, f"[{K},16] gather from [{K},16] (bwd cur)")

    wide = jnp.asarray(rng.random((K // 8, 128), dtype=np.float32))
    gidx = perm // 8
    lidx = (perm % 8) * 16
    starts = jnp.stack([gidx, lidx], axis=1)  # [K, 2]

    def pf_2d(s, i):
        x = wide + s * 1e-9
        out = x[gidx][jnp.arange(K)[:, None],
                      lidx[:, None] + jnp.arange(16)[None, :]]
        return out.sum() * 1e-9 + s
    slope(pf_2d, "wide-source row gather + per-row 16-lane slice")

    from jax import lax

    def pf_gather2d(s, i):
        x = wide + s * 1e-9
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1,), collapsed_slice_dims=(0,),
            start_index_map=(0, 1))
        out = lax.gather(x, starts, dn, slice_sizes=(1, 16))
        return out.sum() * 1e-9 + s
    slope(pf_gather2d, "lax.gather [K,16] from wide, 2-D starts (1,16)")

    # transpose/materialize cost of the d-stream relayout
    dstream = jnp.asarray(rng.random((NC, 16, G), dtype=np.float32))

    def pf_relayout(s, i):
        x = dstream + s * 1e-9
        gK = x.transpose(1, 0, 2).reshape(16, K).T
        return gK[::4097].sum() * 1e-9 + s
    slope(pf_relayout, "[NC,16,G] -> [K,16] relayout")

    # cumsum block sizes
    from mini3dgs_tpu.ops.binning import _cumsum_blocked_last
    cols = jnp.asarray(rng.random((16, K), dtype=np.float32))
    for blk in (256, 512, 1024, 2048):
        def pf_cs(s, i, blk=blk):
            x = cols + s * 1e-9
            return _cumsum_blocked_last(x, block=blk)[:, -1].sum() * 1e-9 + s
        slope(pf_cs, f"cumsum blocked [16,{K}] block={blk}")

    # fused alternative: gather in wide space THEN shift-select (dest wide)
    def pf_wide_gather_only(s, i):
        x = wide + s * 1e-9
        return x[gidx[::8]].sum() * 1e-9 + s
    slope(pf_wide_gather_only, f"[{K // 8},128] gather from [{K // 8},128]")


if __name__ == "__main__":
    main()
