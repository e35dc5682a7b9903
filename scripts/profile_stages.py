"""One-off stage-level profiling of the SemDeDup/D4 family (guide §1:
measure BEFORE changing).  Times each phase of x278's work separately in
one fresh JVM so the optimization targets the real cost, not a guess.
"""
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
    from flashml_spark.operators import similarity
    from flashml_spark.operators.dedup import connected_components
    from flashml_spark.functions import vector as V

    spark = get_spark("profile-semdedup")
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM like bench.py does
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    t("warm count", lambda: emb.count())

    # ---- x278 fixture phase (23 rows, k-means|| fit, 20 iters)
    def pt(axis, off_axis, off):
        v = [0.0] * 6
        v[axis] = 200.0
        v[off_axis] = off
        return v

    rows = []
    spread = [(3, 70.0), (4, 70.0), (5, 70.0), (3, -70.0), (4, -70.0),
              (5, -70.0), (3, 35.0), (4, 35.0)]
    for i, (ax, off) in enumerate(spread):
        rows.append((i, pt(0, ax, off)))
    rows += [(8, pt(0, 3, 70.0)), (9, pt(0, 3, 70.0))]
    for i, (ax, off) in enumerate(spread[:6]):
        rows.append((10 + i, pt(1, ax, off)))
    rows.append((16, pt(1, 3, 70.0)))
    for i, (ax, off) in enumerate(spread[:6]):
        rows.append((20 + i, pt(2, ax, off)))
    fix = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    print("fixture partitions:", fix.rdd.getNumPartitions(), flush=True)

    fix_cents = t(
        "fixture kmeans fit (k=3, kmeans||, 20it)",
        lambda: similarity.fit_ivf_centroids(
            fix, "embedding", n_lists=3, seed=42, sample_rows=None,
            max_iter=20, init_mode="k-means||",
        ),
    )
    t(
        "fixture semdedup rest (assign+pairs+CC+join)",
        lambda: similarity.semdedup(
            fix, "embedding", "vec_id", threshold=0.99, centroids=fix_cents
        ).write.format("noop").mode("overwrite").save(),
    )

    # ---- x278 corpus phase
    n = t("corpus count", lambda: emb.count())
    k = max(8, n // 100)
    cents = t(
        f"corpus kmeans fit (k={k}, random, 5it, sample<=100k)",
        lambda: similarity.fit_ivf_centroids(
            emb, "embedding", n_lists=k, seed=42, sample_rows=100_000,
            max_iter=5, init_mode="random",
        ),
    )
    assigned = similarity.with_ivf_list(emb, "embedding", cents).select(
        F.col("vec_id"), F.col("ivf_list"),
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias("__v"),
    )
    t(
        "corpus assignment only (noop)",
        lambda: assigned.write.format("noop").mode("overwrite").save(),
    )
    a, b = assigned.alias("a"), assigned.alias("b")
    sim = V.cosine(F.col("a.__v"), F.col("b.__v"))
    pairs = (
        a.join(b, "ivf_list")
        .filter(F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            F.round(sim, 6).alias("sim"),
        )
        .filter(F.col("sim") >= 0.95)
        .select("id_a", "id_b")
    )
    t("corpus pair join + cosine (noop)",
      lambda: pairs.write.format("noop").mode("overwrite").save())
    n_pairs = t("pair count", lambda: pairs.count())
    print("n_pairs:", n_pairs, flush=True)
    comp = t("connected components (construct)",
             lambda: connected_components(pairs))
    t("components noop", lambda: comp.write.format("noop").mode("overwrite").save())

    # full operator end-to-end for reference
    t(
        "semdedup corpus end-to-end (noop)",
        lambda: similarity.semdedup(
            emb, "embedding", "vec_id", n_lists=k, threshold=0.95, seed=42,
            max_iter=5,
        ).write.format("noop").mode("overwrite").save(),
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
