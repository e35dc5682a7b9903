"""Over-budget fallback probe (r11 verdict item 8): force the bounded
driver solves PAST their budgets and show the distributed fallback
(a) engages and (b) scales, on the same ×{1,2,4,8} replicated inputs
as scripts/scale_probe.py.

Each probe drives the OPERATOR with its public budget parameter set
below the input size (``driver_edge_budget=0`` / ``driver_vocab_budget=0``)
or with a parameterization the driver gate legitimately rejects
(``n_features=2048 > 1024`` for the quality fit) — no monkeypatching,
the same switch a 100 TB input would flip.  The paired ``driver`` run
at the default budget shows the bounded path on the same data.

Usage:
    python scripts/scale_probe_fallback.py [--factors 1,2,4] [--out /tmp/scaleprobe]
Prints one JSON line per (probe, factor) and a final log-log OLS slope
summary per probe (sec ~ factor^slope).
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_probe import replicate  # noqa: E402  (sibling script)


def run_noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def probe_cc(spark, sf_dir: str, budget: int) -> None:
    """Connected components over a linear star-edge set (each doc links
    to the head of its 16-doc block): |edges| grows with the corpus,
    components stay bounded — the dedup-graph shape."""
    from pyspark.sql import functions as F

    from flashml_spark.operators import dedup
    from flashml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    edges = docs.select(
        F.col("doc_id").alias("id_a"),
        (F.col("doc_id") - F.col("doc_id") % 16).alias("id_b"),
    ).where(F.col("id_a") != F.col("id_b"))
    run_noop(
        dedup.connected_components(edges, driver_edge_budget=budget)
    )


def probe_bpe(spark, sf_dir: str, budget: int) -> None:
    from flashml_spark.operators import textops
    from flashml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents")
    run_noop(
        textops.bpe_learn(docs, "text", n_merges=3, driver_vocab_budget=budget)
    )


def probe_quality_fit(spark, sf_dir: str, n_features: int) -> None:
    """n_features > 1024 rejects the driver Newton gate, so spark.ml's
    LogisticRegression runs — the same switch a wide production model
    flips.  fit_sample_rows caps the LR input (the operator's own
    bound); the sampling count scans the full replicated corpus, so
    the probe still grows with the factor."""
    from pyspark.sql import functions as F

    from flashml_spark.operators import quality
    from flashml_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    pos = docs.where(F.col("doc_id") % 2 == 0).select("text")
    neg = docs.where(F.col("doc_id") % 2 == 1).select("text")
    quality.fit_quality_classifier(
        pos, neg, "text", n_features=n_features, max_iter=5,
        reg_param=0.01, fit_sample_rows=2000,
    )


PROBES = {
    "cc_distributed": lambda s, d: probe_cc(s, d, budget=0),
    "cc_driver": lambda s, d: probe_cc(s, d, budget=5_000_000),
    "bpe_distributed": lambda s, d: probe_bpe(s, d, budget=0),
    "bpe_driver": lambda s, d: probe_bpe(s, d, budget=200_000),
    "qualityfit_distributed": lambda s, d: probe_quality_fit(s, d, 2048),
    "qualityfit_driver": lambda s, d: probe_quality_fit(s, d, 256),
}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,4")
    ap.add_argument("--out", default="/tmp/scaleprobe")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--only", default=None)
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    from bench import release_storage
    from flashml_spark.session import get_spark

    spark = get_spark("scale-probe-fallback")
    spark.sparkContext.setLogLevel("ERROR")

    for k in factors:
        dst = f"{args.out}/x{k}"
        if not os.path.exists(f"{dst}/documents.parquet"):
            replicate(spark, args.src, dst, k)

    probes = dict(PROBES)
    if args.only:
        pres = [p.strip() for p in args.only.split(",")]
        probes = {
            n: f for n, f in PROBES.items()
            if any(n.startswith(p) for p in pres)
        }

    # warm once so JIT/footer costs don't land on x1
    next(iter(probes.values()))(spark, f"{args.out}/x{factors[0]}")
    release_storage(spark)

    timings: dict[str, dict[int, float]] = {n: {} for n in probes}
    for k in factors:
        dst = f"{args.out}/x{k}"
        for name, fn in probes.items():
            t0 = time.perf_counter()
            fn(spark, dst)
            dt = time.perf_counter() - t0
            release_storage(spark)
            timings[name][k] = round(dt, 3)
            print(json.dumps({"probe": name, "factor": k, "sec": timings[name][k]}))
            sys.stdout.flush()

    slopes = {}
    for name, ts in timings.items():
        if len(ts) < 2:
            continue
        xs = [math.log(k) for k in ts]
        ys = [math.log(s) for s in ts.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        slopes[name] = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3
        )
    print(json.dumps({"metric": "fallback_scaling_slopes", "slopes": slopes}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
