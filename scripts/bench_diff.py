"""Diff two committed per-query bench tables (BENCH_LOCAL_r{N}.json).

The r4/r5 driver bench tails shared zero per-query keys, so comparing
rounds meant re-running; with the full table committed each round
(bench.py writes it), a regression check is:

    python scripts/bench_diff.py BENCH_LOCAL_r06.json BENCH_LOCAL_r07.json

Prints per-query deltas above the noise threshold (default 0.5 s AND
1.5x), the added/removed query sets, and a one-line summary.  Exit 0
always — this is a report, not a gate (long-session JVM-state inflation
makes single-query in-session numbers noisy; see SCALE.md round-6
certification note — chase a flagged query with an ISOLATED re-run
before calling it a regression).
"""

from __future__ import annotations

import argparse
import json


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--abs-sec", type=float, default=0.5)
    ap.add_argument("--ratio", type=float, default=1.5)
    args = ap.parse_args()

    with open(args.old) as f:
        old = json.load(f)["queries"]
    with open(args.new) as f:
        new = json.load(f)["queries"]

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    common = sorted(set(old) & set(new))

    slower, faster = [], []
    for q in common:
        a, b = old[q], new[q]
        if b - a >= args.abs_sec and b >= args.ratio * a:
            slower.append((q, a, b))
        elif a - b >= args.abs_sec and a >= args.ratio * b:
            faster.append((q, a, b))

    for q, a, b in sorted(slower, key=lambda t: t[1] - t[2]):
        print(f"SLOWER  {q}: {a:.2f} -> {b:.2f} s ({b / a:.2f}x)")
    for q, a, b in sorted(faster, key=lambda t: t[2] - t[1]):
        print(f"faster  {q}: {a:.2f} -> {b:.2f} s ({b / a:.2f}x)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    tot_old = sum(old[q] for q in common)
    tot_new = sum(new[q] for q in common)
    print(
        json.dumps(
            {
                "metric": "bench_diff",
                "common_queries": len(common),
                "common_total_old": round(tot_old, 3),
                "common_total_new": round(tot_new, 3),
                "flagged_slower": len(slower),
                "flagged_faster": len(faster),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
