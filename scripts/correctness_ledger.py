"""Generate CORRECTNESS_LEDGER.md — per registered query, the most
recent round with a driver CORRECTNESS row and that row's result, so
staleness is machine-checked instead of comment-tracked in _PRIORITY.

Usage: python scripts/correctness_ledger.py   (writes repo-root file)
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, "/root/repo")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def collect() -> tuple[dict[str, tuple[int, str]], int]:
    """query -> (last driver round, result string); plus newest round."""
    last: dict[str, tuple[int, str]] = {}
    newest = 0
    for path in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        newest = max(newest, rnd)
        with open(path) as f:
            rows = json.load(f)
        for name, row in rows.items():
            if row.get("err") == "no_oracle":
                result = f"rows-only ({row.get('spark_rows')} rows)"
            elif row.get("hash_match"):
                result = "pass"
            elif row.get("err"):
                result = f"ERROR: {row['err']}"
            else:
                result = "MISMATCH"
            last[name] = (rnd, result)
    return last, newest


def main() -> int:
    import __spark_entry__ as e

    last, newest = collect()
    names = list(e.queries())
    lines = [
        "# CORRECTNESS ledger (generated — scripts/correctness_ledger.py)",
        "",
        f"Registered queries: {len(names)}.  Rounds scanned: r01-r{newest:02d}.",
        "`age` = rounds since the query's last driver row (0 = current round).",
        "",
        "| query | last driver round | age | result |",
        "|---|---|---|---|",
    ]
    never = []
    for name in names:
        if name in last:
            rnd, result = last[name]
            lines.append(f"| {name} | r{rnd:02d} | {newest - rnd} | {result} |")
        else:
            never.append(name)
            lines.append(f"| {name} | — | — | NEVER driver-checked |")
    lines += [
        "",
        f"Never driver-checked: {len(never)}"
        + (f" — {', '.join(never)}" if never else ""),
        "",
    ]
    out = os.path.join(REPO, "CORRECTNESS_LEDGER.md")
    with open(out, "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {out}: {len(names)} queries, {len(never)} never-checked")
    return 0


if __name__ == "__main__":
    sys.exit(main())
