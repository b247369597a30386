"""Pack-stage variant timing at the bench config (slope methodology).

The stage profile (profile_stages5) shows pack fwd ~2.3 ms and pack bwd
~3.7 ms — ~20x off the ~35 MB bandwidth floor — while binning+sorts are
1.27 ms and the raster kernels run at VPU peak.  This script times isolated
variants of the two pack gathers to find where the time goes:

fwd variants (all produce the identical [K//G, 16, G] stream):
  f0  current: tab = take(attrs.T, order); take(tab, s_rank); transpose
  f1  fused index: idx = order[s_rank] (int lane gather), ONE attr gather
  f2  fused + per-row takes assembled without the 3-D transpose
  f3  fused + two 8-row gathers (halved gather-table footprint)

bwd variants (segment-sum inputs; [GRAD_ROWS, K] rank-ordered rows):
  b0  current: strided row stack + one [10, K] lane gather by rank_perm
  b1  two 5-row gathers (halved table footprint)
  b2  gather straight from g's chunk layout per row (no pre-stack)
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
    print(f"{name:56s} {per * 1e3:8.2f} ms", flush=True)
    return per


def main():
    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops import binning as B
    from mini3dgs_tpu.ops.projection import project_gaussians

    W = H = 800
    C = 2 ** 17
    G = 256
    TS = 32
    K = 2 ** 19
    DUP = 3
    g, cam = _scene(capacity=C, n=100_000, width=W, height=H)
    params0 = g.params()

    def with_s(s):
        return {**params0, "xyz": params0["xyz"] * (1.0 + s * 1e-9)}

    def bin_of(params):
        p = project_gaussians(g.with_params(params), cam)
        b = B.bin_gaussians(p, H, W, TS, K, G, radius_max=50.0,
                            max_dup_per_axis=DUP)
        return p, b

    def attrs_of(p):
        zeros = jnp.zeros_like(p.depth)
        return jnp.stack([
            p.means2d[:, 0], p.means2d[:, 1],
            p.conic[:, 0], p.conic[:, 1], p.conic[:, 2],
            p.opacity, p.color[:, 0], p.color[:, 1], p.color[:, 2],
            p.depth, jnp.ones_like(p.depth),
        ] + [zeros] * (B.N_ROWS - 11), axis=1)

    NR = B.N_ROWS

    def base(s, i):
        p, b = bin_of(with_s(s))
        return (jnp.sum(b.s_rank) + jnp.sum(attrs_of(p))).astype(
            jnp.float32) * 1e-12 + s

    # ---------------- forward variants ----------------
    def f0(attrs, b):
        tab = jnp.take(attrs.T, b.order, axis=1)
        compact = jnp.take(tab, b.s_rank, axis=1)
        return compact.reshape(NR, K // G, G).transpose(1, 0, 2)

    def f1(attrs, b):
        idx = jnp.take(b.order, b.s_rank)
        compact = jnp.take(attrs.T, idx, axis=1)
        return compact.reshape(NR, K // G, G).transpose(1, 0, 2)

    def f2(attrs, b):
        idx = jnp.take(b.order, b.s_rank)
        at = attrs.T
        rows = [jnp.take(at[r], idx).reshape(K // G, 1, G) for r in range(NR)]
        return jnp.concatenate(rows, axis=1)

    def f3(attrs, b):
        idx = jnp.take(b.order, b.s_rank)
        at = attrs.T
        c0 = jnp.take(at[:8], idx, axis=1).reshape(8, K // G, G)
        c1 = jnp.take(at[8:], idx, axis=1).reshape(8, K // G, G)
        return jnp.concatenate([c0, c1], axis=0).transpose(1, 0, 2)

    def mk_f(fn):
        def pf(s, i):
            p, b = bin_of(with_s(s))
            inst = fn(attrs_of(p), b)
            return jnp.sum(inst[:, 0]) * 1e-9 + s
        return pf

    # ---------------- backward variants ----------------
    def seg_sum(acc, skey, max_seg):
        sh = 1
        while sh < max_seg:
            kshift = jnp.concatenate([skey[sh:],
                                      jnp.full((sh,), -1, skey.dtype)])
            same = (kshift == skey)[None, :]
            vsh = jnp.concatenate(
                [acc[:, sh:], jnp.zeros((acc.shape[0], sh), acc.dtype)],
                axis=1)
            acc = acc + jnp.where(same, vsh, 0.0)
            sh *= 2
        return acc

    GR = B.GRAD_ROWS

    def readout(acc, b):
        sidx = jnp.clip(b.seg_start_gid, 0, K - 1)
        dT = jnp.take(acc, sidx, axis=1)
        valid = (b.counts_gid > 0) & (b.seg_start_gid < b.n_live)
        return jnp.where(valid[None, :], dT, 0.0)

    def b0(gstream, b):
        rows = jnp.stack([gstream[:, r, :].reshape(K) for r in range(GR)])
        acc = jnp.take(rows, b.rank_perm, axis=1)
        acc = seg_sum(acc, b.rank_key, DUP * DUP)
        return readout(acc, b)

    def b1(gstream, b):
        rows = jnp.stack([gstream[:, r, :].reshape(K) for r in range(GR)])
        a0 = jnp.take(rows[:5], b.rank_perm, axis=1)
        a1 = jnp.take(rows[5:], b.rank_perm, axis=1)
        acc = jnp.concatenate([a0, a1], axis=0)
        acc = seg_sum(acc, b.rank_key, DUP * DUP)
        return readout(acc, b)

    def b2(gstream, b):
        rows = [jnp.take(gstream[:, r, :].reshape(K), b.rank_perm)
                for r in range(GR)]
        acc = jnp.stack(rows)
        acc = seg_sum(acc, b.rank_key, DUP * DUP)
        return readout(acc, b)

    def mk_b(fn):
        def pf(s, i):
            p, b = bin_of(with_s(s))
            # a deterministic fake gradient stream (cheap to build):
            gstream = jnp.broadcast_to(
                (b.s_rank.astype(jnp.float32) * 1e-6).reshape(K // G, 1, G),
                (K // G, NR, G))
            dT = fn(gstream, b)
            return jnp.sum(dT) * 1e-9 + s
        return pf

    import sys as _sys
    which = _sys.argv[1] if len(_sys.argv) > 1 else "all"
    fwd_variants = [("f0 current two-gather", f0),
                    ("f1 fused single gather", f1),
                    ("f2 fused per-row, no transpose", f2),
                    ("f3 fused split 8+8 rows", f3)]
    bwd_variants = [("b0 current [10,K] gather", b0),
                    ("b1 split 5+5 gather", b1),
                    ("b2 per-row gathers", b2)]
    slope(base, "proj+binning+attrs (baseline)")
    if which in ("all", "fwd"):
        for name, fn in fwd_variants:
            if "f2" in name and which == "all":
                continue
            slope(mk_f(fn), f"pack fwd {name}")
    if which in ("all", "bwd"):
        for name, fn in bwd_variants:
            slope(mk_b(fn), f"pack bwd {name}")


if __name__ == "__main__":
    main()
