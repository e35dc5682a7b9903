"""Scoped re-timing probe for optimization batches: bench.py's exact
methodology (one warm JVM, noop sink, storage release between queries,
per-query repeat-min over N passes) restricted to name prefixes.

Usage:
    python scripts/bench_subset.py x278 x282 x283 [--passes 2]

Prints one JSON line {"queries": {name: sec}} with the repeat-min per
query.  NOT a committed bench table — a dev probe for before/after
deltas; the round's committed numbers come from full bench.py runs.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    passes = 2
    for a in sys.argv[1:]:
        if a.startswith("--passes"):
            passes = int(a.split("=", 1)[1]) if "=" in a else passes
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from bench import HEADLINE, release_storage, run_query
    from flashml_spark.queries import QUERIES
    from flashml_spark.session import get_spark

    names = [
        n
        for n in HEADLINE
        if n in QUERIES and any(n.startswith(p) for p in args)
    ]
    if not names:
        print(json.dumps({"error": "no queries matched", "args": args}))
        return 1

    spark = get_spark("flashml-bench-subset")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM + parquet footer cache like bench.py does
    run_query(QUERIES["q01_filter_project"][0](spark, sf_dir))

    timings: dict[str, float] = {}
    for _ in range(passes):
        for name in names:
            fn = QUERIES[name][0]
            spark.sparkContext.setJobDescription(f"subset:{name}")
            t0 = time.perf_counter()
            run_query(fn(spark, sf_dir))
            dt = round(time.perf_counter() - t0, 3)
            timings[name] = min(timings.get(name, dt), dt)
            release_storage(spark)
    print(json.dumps({"queries": timings, "sf_dir": sf_dir}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
