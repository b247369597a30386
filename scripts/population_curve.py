"""Extract the densification population curve from a training log.

Parses the trainer's per-log-interval lines for n_alive / n_visible /
render_instances and writes a CSV + a milestone table to stdout —
the published artifact for VERDICT r3 next #5 (canonical knobs must be
shown doing the reconstruction work on the texture-dense scene).

Usage: python scripts/population_curve.py runs/tex30k.log [--csv OUT.csv]
"""

import argparse
import re
import sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("log")
    ap.add_argument("--csv", default=None)
    args = ap.parse_args()
    rows = []
    pat = re.compile(r"^\[\s*(\d+)\] (.*)")
    for line in open(args.log):
        m = pat.match(line)
        if not m:
            continue
        it = int(m.group(1))
        kv = dict(p.split("=") for p in m.group(2).split() if "=" in p)
        rows.append((it,
                     float(kv.get("n_alive", kv.get("n_visible", 0))),
                     float(kv.get("n_visible", 0)),
                     float(kv.get("render_instances", 0)),
                     float(kv.get("total_loss", 0)),
                     float(kv.get("n_clone", 0)), float(kv.get("n_split", 0)),
                     float(kv.get("n_pruned", 0)),
                     float(kv.get("render_drops", 0))))
    if args.csv:
        with open(args.csv, "w") as f:
            f.write("iter,n_alive,n_visible,render_instances,total_loss,"
                    "n_clone,n_split,n_pruned,render_drops\n")
            for r in rows:
                f.write(",".join(str(x) for x in r) + "\n")
        print(f"wrote {len(rows)} rows to {args.csv}")
    print(f"{'iter':>6} {'n_alive':>9} {'instances':>10} {'loss':>8} "
          f"{'clone':>6} {'split':>6} {'prune':>6} {'drops':>6}")
    marks = {500, 1000, 2000, 3000, 5000, 8000, 10000, 12000, 15000,
             20000, 25000, 30000}
    for r in rows:
        if r[0] in marks or r is rows[-1]:
            print(f"{r[0]:>6} {int(r[1]):>9} {int(r[3]):>10} {r[4]:>8.4f} "
                  f"{int(r[5]):>6} {int(r[6]):>6} {int(r[7]):>6} "
                  f"{int(r[8]):>6}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
