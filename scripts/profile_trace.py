"""On-chip jax.profiler trace capture + op-table summary (VERDICT r4 next #1).

Three rounds of perf conclusions rest on A/B chain slopes; this captures the
actual device timeline and reduces it to a committed op table so every number
in ROADMAP's bench-landscape table has a trace-confirmed counterpart (or a
documented divergence).  SURVEY §5's profiling obligation ("jax.profiler
traces + per-kernel roofline counters") — the counters existed
(utils/profiling.py), the trace artifact did not.

Modes:
  bench     trace N reps of the 800²/100K bench grad step (the headline)
  trainer   trace ~20 steps of the tex-scene trainer from its checkpoint
  loop      trace a K-step on-device fori_loop window vs K single dispatches
            (the open PERF round-4 question: where does the 1.4x while-body
            slowdown live — copies from lost buffer aliasing?)

The raw trace (multi-GB at scale) stays in --trace-dir (not committed); the
summary op table is written to docs/artifacts/ for the repo.

Usage: python scripts/profile_trace.py --mode bench [--reps 3]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


# ---------------------------------------------------------------------------
# Trace post-processing: perfetto trace.json.gz -> op table
# ---------------------------------------------------------------------------

def load_trace_events(log_dir: str):
    files = sorted(glob.glob(f"{log_dir}/**/*.trace.json.gz", recursive=True))
    if not files:
        raise FileNotFoundError(f"no trace.json.gz under {log_dir}")
    events = []
    for f in files:
        with gzip.open(f, "rt") as fh:
            data = json.load(fh)
        events.extend(data.get("traceEvents", []))
    return events


def summarize(events, top=40):
    """Group complete ('X') events by (process lane, op name); return
    (lanes, table) where table rows are dicts sorted by total duration."""
    pid_names = {}
    tid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", str(e["pid"]))
        if e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    acc = defaultdict(lambda: [0.0, 0])
    lane_total = defaultdict(float)
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        lane = pid_names.get(pid, str(pid))
        tname = tid_names.get((pid, e.get("tid")), "")
        key_lane = f"{lane}/{tname}" if tname else lane
        dur = float(e.get("dur", 0.0))  # microseconds
        name = e.get("name", "?")
        acc[(key_lane, name)][0] += dur
        acc[(key_lane, name)][1] += 1
        lane_total[key_lane] += dur
    rows = [{"lane": k[0], "op": k[1], "total_us": v[0], "count": v[1]}
            for k, v in acc.items()]
    rows.sort(key=lambda r: -r["total_us"])
    return lane_total, rows[:top]


STAGE_BUCKETS = (
    # (bucket, substrings matched against the lowered op name)
    ("raster_fwd (pallas)", ("_fwd_kernel", "fwd_kernel")),
    ("raster_bwd (pallas)", ("_bwd_kernel", "bwd_kernel")),
    ("sort (binning)", ("sort",)),
    ("gather/pack", ("gather", "dynamic-slice", "dynamic-update")),
    ("scatter", ("scatter",)),
    ("conv (ssim)", ("conv",)),
    ("copy", ("copy",)),
    ("fusion (elementwise)", ("fusion", "loop_")),
    ("all-reduce/collective", ("all-reduce", "all-gather", "all-to-all",
                               "collective", "permute")),
)


def bucketize(rows, device_only=True):
    """Map op rows on device lanes into coarse stage buckets."""
    buckets = defaultdict(lambda: [0.0, 0])
    for r in rows:
        lane = r["lane"].lower()
        if device_only and not any(t in lane for t in
                                   ("tpu", "device", "xla", "accelerator")):
            continue
        name = r["op"].lower()
        for bucket, subs in STAGE_BUCKETS:
            if any(s in name for s in subs):
                buckets[bucket][0] += r["total_us"]
                buckets[bucket][1] += r["count"]
                break
        else:
            buckets["other"][0] += r["total_us"]
            buckets["other"][1] += r["count"]
    return dict(buckets)


def write_summary(path, title, lane_total, rows, buckets, meta):
    lines = [f"# {title}", ""]
    for k, v in meta.items():
        lines.append(f"- {k}: {v}")
    lines.append("")
    lines.append("## Lanes (total us of X events)")
    lines.append("")
    for lane, tot in sorted(lane_total.items(), key=lambda kv: -kv[1])[:12]:
        lines.append(f"- `{lane}`: {tot:,.0f} us")
    lines.append("")
    lines.append("## Stage buckets (device lanes)")
    lines.append("")
    lines.append("| bucket | total us | events |")
    lines.append("|---|---|---|")
    for b, (us, n) in sorted(buckets.items(), key=lambda kv: -kv[1][0]):
        lines.append(f"| {b} | {us:,.0f} | {n} |")
    lines.append("")
    lines.append("## Top ops")
    lines.append("")
    lines.append("| lane | op | total us | count |")
    lines.append("|---|---|---|---|")
    for r in rows:
        lines.append(f"| `{r['lane'][:40]}` | `{r['op'][:60]}` | "
                     f"{r['total_us']:,.0f} | {r['count']} |")
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    Path(path).write_text("\n".join(lines) + "\n")
    print(f"wrote {path}")


# ---------------------------------------------------------------------------
# Workloads
# ---------------------------------------------------------------------------

def run_bench(trace_dir, reps):
    import jax
    import jax.numpy as jnp

    from bench import build
    from mini3dgs_tpu.utils.profiling import trace

    on_tpu = jax.default_backend() == "tpu"
    chain = build(width=800 if on_tpu else 64,
                  height=800 if on_tpu else 64,
                  n=100_000 if on_tpu else 2_000,
                  capacity=2 ** 17 if on_tpu else 4096,
                  use_pallas=on_tpu,
                  max_instances=1536 * 256 if on_tpu else 2 ** 14)
    float(chain(jnp.float32(0.5), 2))          # compile + warm OUTSIDE trace
    with trace(trace_dir):
        for j in range(reps):
            float(chain(jnp.float32(0.3 + 0.01 * j), 4))
    return {"workload": "bench chain, reps x 4 grad steps", "reps": reps}


def run_trainer(trace_dir, steps):
    import dataclasses

    import jax

    from mini3dgs_tpu.config import ConfigManager
    from mini3dgs_tpu.train.checkpoint import latest_checkpoint_iteration
    from mini3dgs_tpu.train.trainer import GaussianTrainer
    from mini3dgs_tpu.utils.profiling import trace

    config = ConfigManager.load_from_yaml("configs/sdf_tex_30k.yaml")
    config = dataclasses.replace(config, verify_sharding=False,
                                 eval_interval=10 ** 9,
                                 save_interval=10 ** 9,
                                 log_interval=10 ** 9,
                                 densify_from_iter=10 ** 9)
    trainer = GaussianTrainer(config)
    trainer.setup()
    it = latest_checkpoint_iteration(config.output_path)
    if it:
        trainer.load_checkpoint(it)
    trainer.train(iterations=3)                # compile + warm OUTSIDE trace
    with trace(trace_dir):
        trainer.train(iterations=steps)
    return {"workload": f"tex-scene trainer from it{it}", "steps": steps,
            "n_alive": int(trainer.state.gaussians.num_alive()),
            "max_instances": trainer.settings.max_instances}


def run_loop(trace_dir, k):
    """K-step fori_loop window vs K single dispatches in ONE trace —
    the round-4 open question (while-body copies from lost aliasing)."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from mini3dgs_tpu.config import ConfigManager
    from mini3dgs_tpu.train.checkpoint import latest_checkpoint_iteration
    from mini3dgs_tpu.train.trainer import GaussianTrainer
    from mini3dgs_tpu.utils.profiling import trace

    config = ConfigManager.load_from_yaml("configs/sdf_tex_30k.yaml")
    config = dataclasses.replace(config, verify_sharding=False,
                                 eval_interval=10 ** 9, save_interval=10 ** 9,
                                 log_interval=10 ** 9,
                                 densify_from_iter=10 ** 9,
                                 densify_interval=k, prune_interval=k,
                                 opacity_reset_interval=0,
                                 sh_increase_interval=k,
                                 densify_until_iter=k,
                                 steps_per_call=0, auto_max_instances=False)
    trainer = GaussianTrainer(config)
    trainer.setup()
    it = latest_checkpoint_iteration(config.output_path)
    if it:
        trainer.load_checkpoint(it)
    assert trainer._loop_K() == k, trainer._loop_K()
    trainer.train(iterations=2 * k)            # compile both paths + warm
    cams = list(trainer.train_cameras())
    with trace(trace_dir):
        trainer.train(iterations=k)            # one K-window dispatch
        # K single dispatches of the same step for contrast
        for i in range(k):
            trainer.train_step(cams[i % len(cams)].replace(uid=0,
                                                           image_name=""),
                               i % len(cams))
    return {"workload": f"K={k} loop window + {k} single dispatches"}


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--mode", choices=("bench", "trainer", "loop"),
                   default="bench")
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--k", type=int, default=8)
    p.add_argument("--trace-dir", default="/tmp/mini3dgs_trace_r5")
    p.add_argument("--out", default=None)
    args = p.parse_args(argv)

    trace_dir = f"{args.trace_dir}_{args.mode}"
    if args.mode == "bench":
        meta = run_bench(trace_dir, args.reps)
        meta["steps_traced"] = args.reps * 4
    elif args.mode == "trainer":
        meta = run_trainer(trace_dir, args.steps)
        meta["steps_traced"] = args.steps
    else:
        meta = run_loop(trace_dir, args.k)
        meta["steps_traced"] = 2 * args.k

    out = args.out or f"docs/artifacts/trace_r5_{args.mode}.md"
    import jax
    meta["backend"] = jax.default_backend()
    write_xplane_summary(trace_dir, out, meta)
    return 0


def write_xplane_summary(trace_dir, out, meta):
    """Preferred artifact: per-op DEVICE self-time table from the .xplane.pb
    (the perfetto JSON of a remote-axon capture collapses the device lane
    into one opaque Steps block; the xplane keeps 'XLA Ops')."""
    from xplane import parse_xspace, self_time_table, op_table
    pbs = sorted(glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True))
    if not pbs:
        raise FileNotFoundError(f"no xplane.pb under {trace_dir}")
    planes = parse_xspace(pbs[-1])
    table = self_time_table(planes)
    mods = op_table(planes)
    steps = meta.get("steps_traced", 1)
    lines = [f"# Device op self-time table — {meta.get('workload', '?')}", ""]
    for k, v in meta.items():
        lines.append(f"- {k}: {v}")
    lines.append("")
    for plane, rows in table.items():
        total_self = sum(r[1] for r in rows)
        lines.append(f"## {plane} — XLA Ops self time")
        lines.append("")
        lines.append(f"Sum of self times: **{total_self/steps/1e9:.3f} "
                     f"ms/step** over {steps} traced steps (self time = "
                     f"event duration minus nested children, so the lane "
                     f"sums to wall time exactly).")
        lines.append("")
        lines.append("| ms/step (self) | total ms | count | op |")
        lines.append("|---|---|---|---|")
        for op, self_ps, total_ps, cnt in rows[:45]:
            if self_ps / steps / 1e9 < 0.005:
                break
            lines.append(f"| {self_ps/steps/1e9:.3f} | {total_ps/1e9:.1f} "
                         f"| {cnt} | `{op[:100]}` |")
        lines.append("")
        m = mods.get(plane, {}).get("XLA Modules", [])
        if m:
            lines.append("### Modules")
            lines.append("")
            for op, ps, cnt in m[:8]:
                lines.append(f"- `{op[:80]}`: {ps/1e9:.1f} ms over {cnt} "
                             f"executions")
            lines.append("")
    Path(out).parent.mkdir(parents=True, exist_ok=True)
    Path(out).write_text("\n".join(lines) + "\n")
    print(f"wrote {out}")


if __name__ == "__main__":
    sys.exit(main())
