"""Temporal join operators: as-of join and bucketed range join
(``flashml_spark.operators.joins``) — semantics plus plan-shape guards
(the whole point of these operators is avoiding broadcast-nested-loop)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from flashml_spark.operators import joins


def _ts(minute: int, second: int = 0):
    return datetime.datetime(2024, 1, 1, 10, minute, second)


def _frames(spark):
    left = spark.createDataFrame(
        [(1, _ts(10), "a"), (1, _ts(20), "b"), (2, _ts(15), "c"), (3, _ts(5), "d")],
        ["k", "ts", "tag"],
    )
    right = spark.createDataFrame(
        [(1, _ts(8), 100), (1, _ts(10), 200), (1, _ts(19), 300), (2, _ts(16), 400)],
        ["k", "ts", "val"],
    )
    return left, right


def test_asof_join_backward_inclusive(spark):
    left, right = _frames(spark)
    out = joins.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols={"r_ts": "ts", "r_val": "val"},
    )
    got = {r["tag"]: (r["r_ts"], r["r_val"]) for r in out.collect()}
    assert got["a"] == (_ts(10), 200)      # equal ts matches (inclusive)
    assert got["b"] == (_ts(19), 300)      # latest prior, not just any prior
    assert got["c"] == (None, None)        # right row is later -> no match
    assert got["d"] == (None, None)        # key with no right rows -> left join


def test_asof_join_strict_excludes_equal_ts(spark):
    left, right = _frames(spark)
    out = joins.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols={"r_val": "val"}, strict=True,
    )
    got = {r["tag"]: r["r_val"] for r in out.collect()}
    assert got["a"] == 100                 # ts(10) excluded, falls back to ts(8)


def test_asof_join_tie_break_and_row_consistency(spark):
    """Two right rows at the same ts: max tie_col wins, and the carried
    columns must come from the SAME right row even when one payload field
    is NULL (struct carry, not per-column carry)."""
    left = spark.createDataFrame([(1, _ts(10), "a")], ["k", "ts", "tag"])
    right = spark.createDataFrame(
        [(1, _ts(5), 1, "early"), (1, _ts(9), 2, None), (1, _ts(9), 3, "late")],
        ["k", "ts", "rid", "name"],
    )
    out = joins.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts",
        right_cols={"rid": "rid", "name": "name"}, tie_col="rid",
    ).first()
    assert out["rid"] == 3 and out["name"] == "late"

    # NULL field in the winning row must NOT fall back to an older row
    right2 = spark.createDataFrame(
        [(1, _ts(5), 1, "early"), (1, _ts(9), 2, None)], ["k", "ts", "rid", "name"]
    )
    out2 = joins.asof_join(
        left, right2, on=["k"], left_ts="ts", right_ts="ts",
        right_cols={"rid": "rid", "name": "name"}, tie_col="rid",
    ).first()
    assert out2["rid"] == 2 and out2["name"] is None


def test_asof_join_single_shuffle_plan(spark):
    left, right = _frames(spark)
    out = joins.asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="ts", right_cols={"r_val": "val"}
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert "BroadcastNestedLoopJoin" not in plan


def test_bucketed_range_join_pairs_and_boundaries(spark):
    left = spark.createDataFrame(
        [(1, _ts(10, 0), "l1"), (1, _ts(10, 30), "l2")], ["k", "lts", "ltag"]
    )
    right = spark.createDataFrame(
        [(1, _ts(10, 0), "r0"),     # gap 0 from l1 (inclusive lower bound)
         (1, _ts(11, 0), "r60"),    # gap 60s from l1 (exactly max_gap)
         (1, _ts(11, 1), "r61"),    # gap 61s from l1 — out
         (1, _ts(9, 59), "rneg")],  # before l1 — out
        ["k", "rts", "rtag"],
    )
    out = joins.bucketed_range_join(
        left, right, on=["k"], left_ts="lts", right_ts="rts", max_gap=60, unit="s"
    )
    pairs = {(r["ltag"], r["rtag"]) for r in out.collect()}
    assert pairs == {
        ("l1", "r0"), ("l1", "r60"),
        ("l2", "r60"), ("l2", "r61"),  # from l2: gaps 30s and 31s
    }


def test_bucketed_range_join_is_equi_join_plan(spark):
    left, right = _frames(spark)
    l = left.select("k", F.col("ts").alias("lts"))
    r = right.select("k", F.col("ts").alias("rts"))
    out = joins.bucketed_range_join(
        l, r, on=["k"], left_ts="lts", right_ts="rts", max_gap=300, unit="s"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_star_join_broadcasts_dims(spark):
    from flashml_spark.queries import QUERIES

    fn, _ = QUERIES["x43_star_join_revenue"]
    plan = fn(spark, "/root/testdata/sf0.01")._jdf.queryExecution().executedPlan().toString()
    assert plan.count("BroadcastHashJoin") == 3
    assert "SortMergeJoin" not in plan
