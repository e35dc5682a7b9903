"""Incremental aggregate maintenance: merging per-batch mergeable state
must equal re-aggregating the concatenated corpus, batch by batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flashml_spark.operators.relational import incremental_agg_merge, mergeable_agg

MEASURES = {
    "n": ("count", None),
    "sum_v": ("sum", "v"),
    "min_v": ("min", "v"),
    "max_v": ("max", "v"),
}


def _rows(df):
    return sorted(
        (r["k"], r["n"], r["sum_v"], r["min_v"], r["max_v"]) for r in df.collect()
    )


def test_merge_equals_full_recompute(spark):
    b1 = spark.createDataFrame([("a", 1.0), ("a", 2.0), ("b", 5.0)], "k string, v double")
    b2 = spark.createDataFrame([("a", -3.0), ("c", 7.0)], "k string, v double")
    b3 = spark.createDataFrame([("b", 0.5), ("c", -1.0)], "k string, v double")

    snap = None
    for b in (b1, b2, b3):
        snap = incremental_agg_merge(snap, b, ["k"], MEASURES)
    full = mergeable_agg(b1.unionByName(b2).unionByName(b3), ["k"], MEASURES)
    assert _rows(snap) == _rows(full)


def test_merge_keys_on_one_side_pass_through(spark):
    b1 = spark.createDataFrame([("a", 1.0)], "k string, v double")
    b2 = spark.createDataFrame([("b", 2.0)], "k string, v double")
    snap = incremental_agg_merge(
        incremental_agg_merge(None, b1, ["k"], MEASURES), b2, ["k"], MEASURES
    )
    rows = {r["k"]: r for r in snap.collect()}
    assert rows["a"]["n"] == 1 and rows["a"]["min_v"] == 1.0
    assert rows["b"]["n"] == 1 and rows["b"]["max_v"] == 2.0


def test_merge_null_values_are_skipped_like_sql(spark):
    b1 = spark.createDataFrame([("a", None), ("a", 4.0)], "k string, v double")
    b2 = spark.createDataFrame([("a", None)], "k string, v double")
    snap = incremental_agg_merge(
        incremental_agg_merge(None, b1, ["k"], MEASURES), b2, ["k"], MEASURES
    )
    full = mergeable_agg(b1.unionByName(b2), ["k"], MEASURES)
    # count counts rows (3); sum/min/max skip nulls (4.0)
    assert _rows(snap) == _rows(full) == [("a", 3, 4.0, 4.0, 4.0)]


def test_non_mergeable_kind_rejected(spark):
    b = spark.createDataFrame([("a", 1.0)], "k string, v double")
    with pytest.raises(ValueError, match="non-mergeable"):
        mergeable_agg(b, ["k"], {"m": ("avg", "v")})


def test_merge_plan_never_touches_history_raw(spark):
    # the merged plan's only inputs are the old SNAPSHOT and the new batch
    b1 = spark.createDataFrame([("a", 1.0)], "k string, v double")
    b2 = spark.createDataFrame([("a", 2.0)], "k string, v double")
    snap = incremental_agg_merge(None, b1, ["k"], MEASURES)
    merged = incremental_agg_merge(snap, b2, ["k"], MEASURES)
    # one aggregate for the delta; the old side joins WITHOUT re-aggregating
    plan = merged._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("Aggregate") == 2  # b1's snapshot agg + b2's delta agg
