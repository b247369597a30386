"""Same-session A/B of the t0-specialized raster kernels (VERDICT r3 next
#2): round 3 regressed single-chip throughput 33.2 -> 29.8 Mpix/s after the
ring-chaining kernel changes (t0 VMEM operand + row-5 transmittance output
+ bwd dt0 output) landed on the single-pass path too.  This measures, in
ONE tunnel session (tunnel compile latency varies 3x day to day, so only
same-session slopes are comparable):

  A) has_t0=False — the specialized kernels (t0 == ones folded at trace
     time; current rasterize_tiles default), and
  B) has_t0=True  — the round-3 configuration (FORCE_T0 toggle),

each as the bench's standard 2-vs-12-iteration chain slope, repeated
`--reps` times interleaved (ABAB...) to separate kernel delta from session
drift.  Optionally (--golden) re-measures the full-size golden baseline
(FULL_GOLDEN_S in bench.py) under the current kernels — VERDICT r3 weak #5.

Usage: python scripts/ab_t0.py [--reps 3] [--golden]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from bench import build, time_step
import mini3dgs_tpu.ops.raster_pallas as RP


def build_variant(force_t0: bool, wide: bool):
    """Build AND trace (warm) one variant's chain while the flags hold
    their values — both are read at trace time, so warming here pins the
    kernel configuration into the compiled executable.  One compile per
    variant total; the timed reps below reuse the warmed chains.
    (force_t0=True, wide=True) is EXACTLY the round-3 configuration."""
    RP.FORCE_T0 = force_t0
    RP.WIDE_STREAM = wide
    RP._make_raster_op.cache_clear()
    chain = build(width=800, height=800, n=100_000, capacity=2 ** 17,
                  use_pallas=True, max_instances=1536 * 256)
    for iters in (2, 12):
        float(chain(jnp.float32(0.5), iters))  # compile + warm NOW
    return chain


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--golden", action="store_true")
    args = ap.parse_args()
    assert jax.default_backend() == "tpu", "A/B needs the real chip"

    variants = [  # (force_t0, wide) — (True, True) = round-3 config
        (False, False),   # current: t0-specialized + 10-row stream
        (True, False),    # t0 operand + 10-row stream
        (False, True),    # t0-specialized + legacy 16-row stream
        (True, True),     # ROUND-3 configuration
    ]
    chains = {}
    for v in variants:
        t0c = time.perf_counter()
        chains[v] = build_variant(*v)
        print(f"compiled has_t0={v[0]} wide={v[1]} in "
              f"{time.perf_counter()-t0c:.0f}s", flush=True)

    results = {v: [] for v in variants}
    for r in range(args.reps):
        for v in variants:
            dt = time_step(chains[v], reps=1)
            results[v].append(dt)
            mp = 800 * 800 / dt / 1e6
            print(f"rep {r} has_t0={v[0]} wide={v[1]}: {dt*1e3:.3f} ms/step "
                  f"({mp:.2f} Mpix/s)", flush=True)

    import numpy as np
    med = {v: float(np.median(results[v])) for v in variants}
    spread = {v: (max(results[v]) - min(results[v])) * 1e3 for v in variants}
    a = med[(False, False)]
    out = {
        "current_ms": round(a * 1e3, 3),
        "current_mpix_s": round(800 * 800 / a / 1e6, 3),
        "t0_only_ms": round(med[(True, False)] * 1e3, 3),
        "wide_only_ms": round(med[(False, True)] * 1e3, 3),
        "round3_ms": round(med[(True, True)] * 1e3, 3),
        "round3_mpix_s": round(800 * 800 / med[(True, True)] / 1e6, 3),
        "t0_delta_ms": round((med[(True, False)] - a) * 1e3, 3),
        "rows_delta_ms": round((med[(False, True)] - a) * 1e3, 3),
        "total_delta_ms": round((med[(True, True)] - a) * 1e3, 3),
        "max_spread_ms": round(max(spread.values()), 3),
    }
    print(json.dumps(out), flush=True)

    if args.golden:
        RP.FORCE_T0 = False
        RP.WIDE_STREAM = False
        RP._make_raster_op.cache_clear()
        g_chain = build(width=800, height=800, n=100_000, capacity=2 ** 17,
                        use_pallas=False, golden_pixel_block=16384)
        float(g_chain(jnp.float32(0.5), 1))  # compile
        t0 = time.perf_counter()
        float(g_chain(jnp.float32(0.25), 1))
        g_dt = time.perf_counter() - t0
        print(json.dumps({"full_golden_s": round(g_dt, 3),
                          "ratio_vs_specialized": round(g_dt / a, 1)}),
              flush=True)


if __name__ == "__main__":
    main()
