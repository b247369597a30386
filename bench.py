"""Benchmark: fwd+bwd rasterization throughput on the flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Metric: Mpixels/s/chip of a full differentiable render step (projection ->
binning/sort -> Pallas tile raster -> loss -> hand-written VJP backward ->
gradient scatter), the BASELINE.json headline.  The reference publishes no
numbers (BASELINE.md) and its Python-loop rasterizer is ~4 orders of magnitude
slower, so vs_baseline is reported against the measured golden-XLA path on the
same chip when available, else 1.0.
"""

import json
import math
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import jax
import jax.numpy as jnp
import numpy as np


# Full-size golden baseline, measured on this chip (PERF.md v17, RE-MEASURED
# round-4 under the current kernels: 26.878 s — the constant is stable): the
# reference-semantics golden-XLA step at the headline 800^2/100K size takes
# 26.88 s/step (remat'd chunked autodiff, golden_pixel_block=16384; one-shot
# timing — slope irrelevant at that magnitude).  Carried as a constant so the
# default bench reports the apples-to-apples ratio without paying the
# minutes-long golden step every run; re-measure any time with
# BENCH_FULL_GOLDEN=1 (same code path below).
FULL_GOLDEN_S = 26.88


def make_chain(g, cam, settings, target):
    """Steady-state training-loop measurement: `iters` chained grad steps
    under ONE jit, each with a distinct perturbed input (the axon runtime
    dedupes identical executions) and a scalar data dependency between
    iterations (so steps execute serially on-device).  This measures the
    device step rate a resident training loop sees, excluding per-dispatch
    host/tunnel latency — the same slope methodology as scripts/profile_*."""
    from functools import partial

    from mini3dgs_tpu.ops.renderer import render

    params0 = g.params()

    def loss_fn(params):
        out = render(g.with_params(params), cam, settings)
        return jnp.abs(out["image"] - target).mean()

    grad_fn = jax.grad(loss_fn)

    @partial(jax.jit, static_argnames="iters")
    def chain(s, iters):
        def body(i, c):
            p = {**params0, "xyz": params0["xyz"] * (1.0 + c * 1e-9)}
            d = grad_fn(p)
            return jnp.sum(d["xyz"]) * 1e-12 + c + 1e-6 * i

        return jax.lax.fori_loop(0, iters, body, s)

    return chain


def build(width=800, height=800, n=100_000, capacity=2 ** 17, seed=0,
          use_pallas=True, max_instances=1536 * 256,
          golden_pixel_block=65536, golden_chunk=512, aniso=False):
    import numpy as np_

    from __graft_entry__ import _scene
    from mini3dgs_tpu.ops.renderer import RenderSettings

    g, cam = _scene(capacity=capacity, n=n, width=width, height=height,
                    seed=seed)
    if aniso:
        # Rotated strongly-anisotropic variant (the trained-scene regime):
        # _scene already gives random unit-quaternion rotations; elongating
        # the sigmas makes the AABB overlap tiles the ellipse misses, the
        # exact ellipse-vs-tile cull's target case (PERF.md v17).
        off = np_.array([0.45, -1.1, -1.1], np_.float32)
        g = g.replace(scaling=g.scaling + jnp.asarray(off)[None, :])
    # max_dup_per_axis=3 and the instance-stream capacity are exact for
    # this scene (runtime-verified: binning reports n_dropped == 0; spans
    # <= 3 tiles, 369330 live instances; capacity 1536 chunks = 393216,
    # ~6% headroom).  Sizing the stream to the scene is what the CUDA
    # reference stack does dynamically (it mallocs the sorted buffer per
    # frame); pack/sort cost is linear in the STATIC stream length.
    settings = RenderSettings(image_height=height, image_width=width,
                              use_pallas=use_pallas,
                              golden_pixel_block=golden_pixel_block,
                              max_instances=max_instances,
                              # tile 32 / G 256 measured best on v5e with the
                              # compact stream (39.3 vs 41.8 ms at 16/128);
                              # tile 64 exceeds the 16MB VMEM scoped limit
                              tile_size=32,
                              gaussian_chunk=256,
                              max_dup_per_axis=3)
    target = jnp.zeros((3, height, width), jnp.float32)
    return make_chain(g, cam, settings, target)


def build_trained(config_yaml="configs/sdf_tex_30k.yaml"):
    """Trained-population bench (VERDICT r4 next #2): the synthetic headline
    scene is radius-homogeneous; a trained checkpoint (168K+ splats, real
    anisotropy, real tile imbalance from densification) is the regime the
    framework exists for — the reference's only implied workload IS a
    trained scene (`/root/reference/config/config.py:41-64`).

    Loads the latest tex-scene checkpoint through the real trainer path,
    auto-sizes the instance stream from one probe render (observed
    occupancy + ~25% headroom, the auto_max_instances policy applied
    statically), and returns (chain, info)."""
    import dataclasses

    from mini3dgs_tpu.config import ConfigManager
    from mini3dgs_tpu.ops.renderer import render
    from mini3dgs_tpu.train.checkpoint import latest_checkpoint_iteration
    from mini3dgs_tpu.train.trainer import GaussianTrainer

    config = ConfigManager.load_from_yaml(config_yaml)
    it = latest_checkpoint_iteration(config.output_path)
    if it is None:
        return None, {"error": f"no checkpoint under {config.output_path}"}
    config = dataclasses.replace(config, verify_sharding=False)
    trainer = GaussianTrainer(config)
    trainer.setup()
    trainer.load_checkpoint(it)
    g = trainer.state.gaussians
    cap0 = g.capacity
    if os.environ.get("BENCH_NO_COMPACT") != "1":
        # Load-time slot compaction: the checkpoint sits mid-growth at 32%
        # pool occupancy; per-Gaussian stages scale with CAPACITY, so
        # compacting to the next pow2 over the live count (2^19 -> 2^18
        # here) removes pure dead-slot overhead.  Output identical.
        from mini3dgs_tpu.core.gaussians import compact
        g = compact(g)
    cam = trainer.dataset.get_train_cameras()[0].replace(uid=0,
                                                         image_name="")
    target = cam.image
    settings = trainer.settings.replace(sh_degree=trainer.active_sh_degree())
    # probe occupancy at the training-run stream size, then size the bench
    # stream to the observed instance count (chunk-rounded, 25% headroom)
    probe = jax.jit(lambda gg, cc: render(gg, cc, settings))(g, cam)
    n_live = int(probe["n_live"])
    G = settings.gaussian_chunk
    k = ((int(n_live * 1.25) + G - 1) // G) * G
    settings = settings.replace(max_instances=k)
    # ... and the large-splat pool to the observed span>2x2 census (same
    # probe): candidate-sort cost is linear in the STATIC pool size, and a
    # config-carried value sized for mid-training can tax a compacted
    # checkpoint (round-5: the auto trainer sizes this at train() start)
    from mini3dgs_tpu.ops.binning import plan_two_level
    two_level, eff_lc, _ = plan_two_level(
        g.capacity, settings.image_height, settings.image_width,
        settings.tile_size, settings.radius_max,
        settings.max_dup_per_axis, settings.large_capacity)
    n_large = int(probe["n_large"])
    lc = max(-(-int(n_large * 1.25) // 128) * 128, 256)
    if two_level and lc < eff_lc:
        settings = settings.replace(large_capacity=lc)
    n_dropped = int(jax.jit(
        lambda gg, cc: render(gg, cc, settings)["n_dropped"])(g, cam))
    info = {"checkpoint_iteration": it,
            "trained_capacity": int(g.capacity),
            "trained_capacity_raw": int(cap0),
            "n_alive": int(g.num_alive()),
            "trained_instances": n_live,
            "trained_max_instances": k,
            "trained_n_large": n_large,
            "trained_large_capacity": int(settings.large_capacity),
            "trained_n_dropped": n_dropped,
            "height": cam.height, "width": cam.width}
    return make_chain(g, cam, settings, target), info


def time_step(chain, k1=2, k2=12, reps=3):
    """Per-step device time as the slope between k1- and k2-iteration
    chains.  Returns (median, spread, reps): spread = max-min over the
    interleaved slope reps, so the bench JSON carries its own error bar
    (VERDICT r4 next #6: cross-session drift is ±1.5 Mpix/s — a
    single-point BENCH number reads noise as signal)."""
    for iters in (k1, k2):
        float(chain(jnp.float32(0.5), iters))  # compile + warm
    pers = []
    for j in range(reps):
        s1 = jnp.float32(0.1 + 0.01 * j)
        s2 = jnp.float32(0.2 + 0.01 * j)
        t0 = time.perf_counter()
        float(chain(s1, k1))
        t1 = time.perf_counter()
        float(chain(s2, k2))
        t2 = time.perf_counter()
        pers.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return float(np.median(pers)), float(max(pers) - min(pers)), reps


def main():
    import os
    width = height = 800
    on_tpu = jax.default_backend() == "tpu"
    full_golden = os.environ.get("BENCH_FULL_GOLDEN") == "1"
    if not on_tpu:
        # CPU smoke fallback: tiny config through the same code path.
        width = height = 64
    chain = build(width=width, height=height,
                  n=100_000 if on_tpu else 2_000,
                  capacity=2 ** 17 if on_tpu else 4096,
                  use_pallas=on_tpu,
                  max_instances=1536 * 256 if on_tpu else 2 ** 14)
    if on_tpu:
        dt, dt_spread, reps = time_step(chain)
    else:
        dt, dt_spread, reps = time_step(chain, k1=1, k2=3, reps=1)
    mpix_s = width * height / dt / 1e6
    # error bar in throughput units: spread of the slope reps propagated
    spread_mpix = (width * height / 1e6) * dt_spread / (dt * dt)

    # Anisotropic headline variant: same size, rotated elongated splats —
    # the regime real trained scenes live in, where the default-on exact
    # ellipse-vs-tile cull prunes instances (isotropic scenes can't show it
    # by construction).
    aniso_mpix_s = None
    if on_tpu:
        try:
            a_chain = build(width=width, height=height, n=100_000,
                            capacity=2 ** 17, use_pallas=True,
                            max_instances=1536 * 256, aniso=True)
            a_dt, _, _ = time_step(a_chain, k1=2, k2=10, reps=2)
            aniso_mpix_s = width * height / a_dt / 1e6
            print(f"anisotropic variant: {a_dt*1e3:.2f} ms/step "
                  f"({aniso_mpix_s:.2f} Mpix/s)", file=sys.stderr)
        except Exception as e:
            print(f"aniso bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    # Trained-checkpoint line (VERDICT r4 next #2): the tex-scene 30k
    # checkpoint, auto-sized stream — real anisotropy + tile imbalance.
    trained = None
    if on_tpu and os.environ.get("BENCH_SKIP_TRAINED") != "1":
        try:
            t_chain, t_info = build_trained()
            if t_chain is not None:
                t_dt, t_spread, t_reps = time_step(t_chain, k1=2, k2=10,
                                                   reps=3)
                px = t_info["height"] * t_info["width"]
                trained = dict(t_info)
                trained["trained_mpix_s"] = round(px / t_dt / 1e6, 3)
                trained["trained_spread_mpix_s"] = round(
                    (px / 1e6) * t_spread / (t_dt * t_dt), 3)
                print(f"trained checkpoint it{t_info['checkpoint_iteration']}"
                      f" ({t_info['n_alive']} splats, stream "
                      f"{t_info['trained_max_instances']}): "
                      f"{t_dt*1e3:.2f} ms/step "
                      f"({trained['trained_mpix_s']:.2f} Mpix/s)",
                      file=sys.stderr)
            else:
                print(f"trained bench skipped: {t_info}", file=sys.stderr)
        except Exception as e:
            print(f"trained bench failed: {type(e).__name__}: {e}",
                  file=sys.stderr)

    vs_baseline = 1.0
    if on_tpu and full_golden:
        # BENCH_FULL_GOLDEN=1: apples-to-apples golden baseline at the FULL
        # headline size (800^2 / 100K).  The remat'd chunked golden step fits
        # memory but takes minutes/step, so this is a one-shot timing (slope
        # irrelevant at that magnitude) recorded manually into PERF.md — the
        # default bench keeps the fast 400^2 proxy.
        try:
            # 16K pixel blocks: the 65K-block dense autodiff working set
            # crashed the TPU worker (OOM-killed) on the small-HBM chip
            g_chain = build(width=800, height=800, n=100_000,
                            capacity=2 ** 17, use_pallas=False,
                            golden_pixel_block=16384)
            float(g_chain(jnp.float32(0.5), 1))  # compile
            t0 = time.perf_counter()
            float(g_chain(jnp.float32(0.25), 1))
            g_dt = time.perf_counter() - t0
            vs_baseline = g_dt / dt
            print(f"full-size golden: {g_dt:.2f}s/step -> ratio {vs_baseline:.1f}x",
                  file=sys.stderr)
        except Exception as e:
            print(f"full golden failed: {type(e).__name__}: {e}",
                  file=sys.stderr)
    elif on_tpu:
        # Baseline = the reference-semantics golden XLA renderer at the SAME
        # 800^2/100K workload on the same chip, carried as the measured
        # constant FULL_GOLDEN_S (26.88 s/step, PERF.md v17; re-measure with
        # BENCH_FULL_GOLDEN=1).  Earlier rounds reported a conservative
        # 400^2/25K proxy instead; this is the honest apples-to-apples ratio.
        vs_baseline = FULL_GOLDEN_S / dt

    out = {
        "metric": "fwd+bwd render Mpixels/s/chip (800x800, 100K gaussians)",
        "value": round(mpix_s, 3),
        "unit": "Mpix/s",
        "vs_baseline": round(vs_baseline, 3),
        # self-describing error bar (VERDICT r4 next #6): spread = max-min
        # of `reps` interleaved slope pairs, in Mpix/s.  Cross-session
        # drift is ±1.5 Mpix/s on top of this (PERF.md round-4) — compare
        # BENCH files round-over-round only beyond spread + session drift.
        "spread": round(spread_mpix, 3),
        "reps": reps,
        # BASELINE.md north-star companion counter: Gaussians composited
        # per second = scene size x step rate (same measurement)
        "mgaussians_per_s": round((100_000 if on_tpu else 2_000)
                                  / dt / 1e6, 3),
    }
    if aniso_mpix_s is not None:
        out["aniso_rotated_mpix_s"] = round(aniso_mpix_s, 3)
    if trained is not None:
        out.update(trained)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
