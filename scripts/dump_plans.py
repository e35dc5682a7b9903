"""Dump .explain('formatted') for named queries to plans/r11/<name>_<tag>.txt.

Usage: python scripts/dump_plans.py <tag> <name-prefix> [<name-prefix> ...]
Tag is 'before' or 'after'.  Prefixes match query names like verify_replay.
"""
import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    tag = sys.argv[1]
    prefixes = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from flashml_spark.queries import QUERIES
    from flashml_spark.session import get_spark

    spark = get_spark("plan-dump")
    spark.sparkContext.setLogLevel("ERROR")
    names = [
        n for n in QUERIES
        if any(n == p or n.startswith(p + "_") or n.startswith(p) for p in prefixes)
    ]
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", os.environ.get("SPARK_GRAFT_PLAN_ROUND", "r12")
    )
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        fn = QUERIES[name][0]
        df = fn(spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(buf.getvalue())
        txt = buf.getvalue()
        print(
            f"{name}: exchanges={txt.count('Exchange')} "
            f"smj={txt.count('SortMergeJoin')} bhj={txt.count('BroadcastHashJoin')} "
            f"python={txt.count('EvalPython') + txt.count('MapInPandas') + txt.count('ArrowEval')} "
            f"-> {os.path.basename(path)}"
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
