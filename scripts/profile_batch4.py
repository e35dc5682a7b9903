"""Stage-level decomposition of the batch-4 candidates (guide §1:
measure BEFORE changing): x286 fit vs score, x151 symmetrize vs BFS
rounds.  One fresh JVM, noop-equivalent actions (count/collect of the
terminal frame only)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from flashml_spark.session import get_spark  # noqa: E402


def t(label, fn):
    t0 = time.perf_counter()
    out = fn()
    print(f"{label}: {time.perf_counter() - t0:.2f}s", flush=True)
    return out


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile-batch4")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    t("warm count", lambda: docs.count())

    # ---- x286: fit vs corpus score
    from flashml_spark.operators import quality

    posv = ["alpha", "beta", "gamma", "delta"]
    negv = ["zork", "grunt", "blee", "snarf"]
    pos = spark.createDataFrame(
        [(i, " ".join(posv[(i + j) % 4] for j in range(3 + i % 5)))
         for i in range(12)],
        "doc_id long, text string",
    ).repartition(1)
    neg = spark.createDataFrame(
        [(i, " ".join(negv[(i + j) % 4] for j in range(3 + i % 5)))
         for i in range(12)],
        "doc_id long, text string",
    ).repartition(1)
    model = t("x286 fit (24-row LR, max_iter=30)", lambda: quality.fit_quality_classifier(
        pos, neg, "text", n_features=256, max_iter=30, reg_param=0.01,
        fit_sample_rows=None,
    ))
    d2 = docs.select("doc_id", "text")
    t("x286 corpus score (pandas_udf scan)", lambda: quality.score_quality_model(
        d2, "text", model).agg(F.sum("is_kept")).collect())
    t("x286 fit #2", lambda: quality.fit_quality_classifier(
        pos, neg, "text", n_features=256, max_iter=30, reg_param=0.01,
        fit_sample_rows=None,
    ))

    # ---- x151: edge build vs BFS loop
    from flashml_spark.operators import graph

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        "l_orderkey", "l_suppkey")
    o = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    t("x151 edge build+distinct count", lambda: edges.count())
    seeds = spark.createDataFrame([(2,)], "node long").repartition(1)
    t("x151 bfs_hops end-to-end", lambda: graph.bfs_hops(
        edges, seeds, max_hops=3).count())
    t("x151 bfs_hops #2", lambda: graph.bfs_hops(
        edges, seeds, max_hops=3).count())
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
