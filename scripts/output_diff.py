"""Capture or compare FULL query outputs — the equivalence harness for
optimization rounds.

Optimizations must not change what any declared query computes.  The
sf0.01 oracle replay is the driver's gate; this harness additionally
pins the COMPLETE output at any SF (default sf0.1, where the bench
runs) so a restructured query can be proved row-identical before/after.

Usage:
    python scripts/output_diff.py capture <out.json> <name-prefix>...
    python scripts/output_diff.py compare <a.json> <b.json>

Normalization mirrors tests/conftest.py::assert_frames_match: columns
sorted by name, rows sorted, floats rounded to 6 digits.
"""
from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    if isinstance(v, list):
        return [_norm_cell(x) for x in v]
    if isinstance(v, dict):
        return {k: _norm_cell(x) for k, x in sorted(v.items())}
    return v


def capture(out_path: str, prefixes: list[str]) -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flashml_spark.queries import QUERIES
    from flashml_spark.session import get_spark

    spark = get_spark("output-diff")
    spark.sparkContext.setLogLevel("ERROR")
    names = [
        n for n in QUERIES
        if any(n == p or n.startswith(p) for p in prefixes)
    ]
    result: dict[str, dict] = {}
    for name in names:
        df = QUERIES[name][0](spark, sf_dir)
        cols = sorted(df.columns)
        rows = [
            [_norm_cell(r[c]) for c in cols]
            for r in df.select(*cols).collect()
        ]
        rows.sort(key=lambda r: json.dumps(r, sort_keys=True, default=str))
        result[name] = {"cols": cols, "n": len(rows), "rows": rows}
        print(f"captured {name}: {len(rows)} rows")
        spark.catalog.clearCache()
    with open(out_path, "w") as f:
        json.dump(result, f, default=str)
    return 0


def compare(a_path: str, b_path: str) -> int:
    with open(a_path) as f:
        a = json.load(f)
    with open(b_path) as f:
        b = json.load(f)
    rc = 0
    for name in sorted(set(a) | set(b)):
        if name not in a or name not in b:
            print(f"{name}: MISSING from {'a' if name not in a else 'b'}")
            rc = 1
            continue
        if a[name] == b[name]:
            print(f"{name}: IDENTICAL ({a[name]['n']} rows)")
        else:
            rc = 1
            qa, qb = a[name], b[name]
            if qa["cols"] != qb["cols"]:
                print(f"{name}: SCHEMA DIFF {qa['cols']} vs {qb['cols']}")
                continue
            sa = {json.dumps(r, default=str) for r in qa["rows"]}
            sb = {json.dumps(r, default=str) for r in qb["rows"]}
            only_a, only_b = sa - sb, sb - sa
            print(
                f"{name}: DIFF rows a={qa['n']} b={qb['n']} "
                f"only_a={len(only_a)} only_b={len(only_b)}"
            )
            for r in list(only_a)[:3]:
                print(f"  a: {r[:200]}")
            for r in list(only_b)[:3]:
                print(f"  b: {r[:200]}")
    return rc


def main() -> int:
    mode = sys.argv[1]
    if mode == "capture":
        return capture(sys.argv[2], sys.argv[3:])
    if mode == "compare":
        return compare(sys.argv[2], sys.argv[3])
    raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    sys.exit(main())
