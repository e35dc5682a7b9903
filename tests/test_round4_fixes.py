"""Round-4 contract fixes: global_cumsum small-input fast path, gated
group_zscore broadcast, null-safe snapshot_diff, listing-based incremental
ingestion, and the bounded k-means fit sample."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- global_cumsum rows_hint fast path -------------------------------------

def _cumsum_frame(spark):
    return spark.createDataFrame(
        [(float(i), i % 3 + 1) for i in range(40)], ["k", "v"]
    )


def test_global_cumsum_fast_path_matches_default(spark):
    from flashml_spark.functions.windows import global_cumsum

    df = _cumsum_frame(spark)
    slow = {
        r["k"]: r["cum_v"]
        for r in global_cumsum(df, "k", ["v"], ascending=False).collect()
    }
    fast = {
        r["k"]: r["cum_v"]
        for r in global_cumsum(
            df, "k", ["v"], ascending=False, rows_hint=64
        ).collect()
    }
    assert fast == slow


def test_global_cumsum_fast_path_is_single_window(spark):
    from flashml_spark.functions.windows import global_cumsum

    df = _cumsum_frame(spark)
    plan = plan_of(global_cumsum(df, "k", ["v"], rows_hint=64))
    # tiny promised input: ONE plain window, none of the range-repartition
    # + per-partition offset machinery
    assert "__pid" not in plan
    # and a hint ABOVE the threshold must keep the scale-safe path
    plan_big = plan_of(global_cumsum(df, "k", ["v"], rows_hint=10_001))
    assert "__pid" in plan_big


def test_q19_uses_fast_path_but_metrics_default_does_not(spark):
    """q19's post-agg frame is bounded (quantized l_quantity) so it may take
    the single-window path; the unhinted metrics operator must keep the
    range-partitioned shape (test_plan_shapes pins that separately)."""
    from flashml_spark.queries import QUERIES

    plan = plan_of(QUERIES["q19_threshold_sweep"][0](spark, SF_DIR))
    assert "__pid" not in plan


# --- group_zscore broadcast gating -----------------------------------------

def test_group_zscore_high_cardinality_is_not_force_broadcast(spark):
    from flashml_spark.operators.relational import group_zscore

    df = spark.createDataFrame(
        [(i, float(i % 7)) for i in range(200)], ["g", "v"]
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # with auto-broadcast off, only a FORCED hint could broadcast:
        # the default (ungated) plan must therefore be a shuffle join
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plan = plan_of(group_zscore(df, "v", ["g"]))
        assert "Broadcast" not in plan
        # the explicit small-|groups| profile still forces the hint
        plan_forced = plan_of(group_zscore(df, "v", ["g"], broadcast_moments=True))
        assert "BroadcastHashJoin" in plan_forced
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_group_zscore_values_unchanged_without_hint(spark):
    from flashml_spark.operators.relational import group_zscore

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], ["g", "v"]
    )
    got = {
        (r["g"], r["v"]): r["z"]
        for r in group_zscore(df, "v", ["g"], broadcast_moments=False).collect()
    }
    assert got == {("a", 1.0): -1.0, ("a", 3.0): 1.0, ("b", 5.0): 0.0}


# --- snapshot_diff null-content handling -----------------------------------

def test_snapshot_diff_null_text_not_misreported(spark):
    from flashml_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "x"), (3, None), (4, "same")],
        "id int, text string",
    )
    new = spark.createDataFrame(
        [(1, None), (2, None), (4, "same"), (5, None)],
        "id int, text string",
    )
    got = {r["id"]: r["status"] for r in snapshot_diff(old, new, "text", "id").collect()}
    assert got == {
        1: "unchanged",  # NULL on both sides — same (absent) content
        2: "changed",    # real text -> NULL
        3: "removed",    # null-text row genuinely absent from new
        4: "unchanged",
        5: "added",      # null-text row genuinely absent from old
    }


# --- incremental ingestion: listing-based, empty-dir safe -------------------

def test_read_incremental_missing_dir_first_run(spark, tmp_path):
    from flashml_spark.sources.readers import read_incremental

    df, new = read_incremental(
        spark, str(tmp_path / "never_written"), str(tmp_path / "manifest")
    )
    assert df is None and new == []


def test_read_incremental_discovery_is_listing_not_scan(spark, tmp_path):
    """File discovery must be FS metadata — the data itself must not be
    re-read to find new files.  Corrupt the already-committed file: a
    listing-based discovery never opens it, a scan-based one would throw."""
    import os

    from flashml_spark.sources.readers import commit_manifest, read_incremental

    src = str(tmp_path / "incoming")
    manifest = str(tmp_path / "manifest")
    spark.createDataFrame([(1,)], "v int").coalesce(1).write.mode("append").parquet(src)
    df1, new1 = read_incremental(spark, src, manifest)
    assert df1.count() == 1 and len(new1) == 1
    commit_manifest(spark, manifest, new1)

    # corrupt the committed file in place (same name/size-ish)
    committed = new1[0].replace("file:", "")
    with open(committed, "wb") as f:
        f.write(b"not parquet at all")
    # second batch: discovery + read must only touch the NEW file
    spark.createDataFrame([(2,)], "v int").coalesce(1).write.mode("append").parquet(src)
    # remove the extra _SUCCESS overwrite side effects are fine; find new file
    df2, new2 = read_incremental(spark, src, manifest)
    assert [r["v"] for r in df2.collect()] == [2]
    assert committed not in [p.replace("file:", "") for p in new2]


# --- bounded k-means fit sample --------------------------------------------

def test_bounded_fit_sample_hard_cap(spark):
    from flashml_spark.operators.similarity import _bounded_fit_sample

    df = spark.range(5000).select(F.col("id").cast("double").alias("v"))
    capped = _bounded_fit_sample(df, None, 500, seed=42)
    assert capped.count() <= 500
    # under the cap: untouched
    small = spark.range(100).select(F.col("id").alias("v"))
    assert _bounded_fit_sample(small, None, 500, seed=42).count() == 100


def test_cluster_balanced_sample_fit_is_capped(spark):
    """The quantizer fit input is bounded even when the corpus exceeds the
    cap; quotas stay deterministic run-over-run."""
    from flashml_spark.operators.similarity import cluster_balanced_sample
    from flashml_spark.sources.readers import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    a = cluster_balanced_sample(
        emb, "embedding", "vec_id", n_lists=4, k_per_cluster=2, fit_sample_rows=50
    )
    rows_a = sorted((r["vec_id"], r["ivf_list"], r["rn"]) for r in a.collect())
    rows_b = sorted(
        (r["vec_id"], r["ivf_list"], r["rn"])
        for r in cluster_balanced_sample(
            emb, "embedding", "vec_id", n_lists=4, k_per_cluster=2, fit_sample_rows=50
        ).collect()
    )
    assert rows_a == rows_b
    per_cluster = {}
    for _, lst, rn in rows_a:
        per_cluster.setdefault(lst, []).append(rn)
    for rns in per_cluster.values():
        assert len(rns) <= 2
