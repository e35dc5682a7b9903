"""Round-4 third batch (x110..x121): operator-level semantics and plan
shapes for the new join shapes and statistical audits.  (Oracle parity for
every registered query is covered by test_oracle_queries.py's sweep; here
we pin edge cases the sf-data can't reach and the plans we designed for.)
"""

from __future__ import annotations

import contextlib
import io
import math

import pytest
from pyspark.sql import functions as F

from flashml_spark.operators import events, relational, textops
from flashml_spark.queries import QUERIES
from tests.conftest import SF_DIR


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def q(spark, name):
    return QUERIES[name][0](spark, SF_DIR)


# --- operator edge cases ----------------------------------------------------


def test_interarrival_single_event_streams_emit_no_gaps(spark):
    df = spark.createDataFrame(
        [(1, 10, "a", "2024-01-01 00:00:00"), (2, 11, "a", "2024-01-01 01:00:00")],
        "event_id long, user_id long, event_type string, ts string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    # one event per (user, type) stream -> zero gaps -> empty result
    assert events.interarrival_stats(df).count() == 0


def test_interarrival_burstiness_of_regular_clock_is_minus_one_ish(spark):
    rows = [(i, 1, "tick", f"2024-01-01 00:{i:02d}:00") for i in range(10)]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = events.interarrival_stats(df).collect()[0]
    assert out["n_gaps"] == 9
    assert out["mean_gap_s"] == 60.0
    assert out["sd_gap_s"] == 0.0
    # sigma=0 -> B = (0-mu)/(0+mu) = -1 exactly
    assert out["burstiness"] == -1.0


def test_cooccurrence_lift_independent_types(spark):
    # both users emit both types -> joint = N, lift = N*N/(N*N) = 1
    rows = [(u, t) for u in (1, 2) for t in ("a", "b")]
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = events.cooccurrence_lift(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"], r["n_joint"]) == ("a", "b", 2)
    assert r["lift"] == 1.0


def test_cooccurrence_output_bounded_by_type_vocabulary(spark):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    n_types = ev.select("event_type").distinct().count()
    assert events.cooccurrence_lift(ev).count() <= n_types * (n_types - 1) // 2


def test_daily_outliers_warmup_days_have_null_z(spark):
    out = q(spark, "x119_daily_outliers").orderBy("day").collect()
    # first 7 observed days can never have a full 7-day trailing window
    assert all(r["z"] is None and r["trail_mean"] is None for r in out[:7])
    assert any(r["z"] is not None for r in out[7:])


def test_gini_all_equal_is_zero_and_extreme_is_high(spark):
    eq = spark.createDataFrame(
        [("g", i, 10.0) for i in range(4)], "g string, id long, v double"
    )
    out = relational.gini_coefficient(eq, ["g"], "v", "id").collect()[0]
    assert out["gini"] == 0.0
    skew = spark.createDataFrame(
        [("g", 0, 0.0), ("g", 1, 0.0), ("g", 2, 0.0), ("g", 3, 100.0)],
        "g string, id long, v double",
    )
    out = relational.gini_coefficient(skew, ["g"], "v", "id").collect()[0]
    assert out["gini"] == 0.75  # (n-1)/n for winner-take-all


def test_gini_zero_total_group_is_null(spark):
    z = spark.createDataFrame(
        [("g", 0, 0.0), ("g", 1, 0.0)], "g string, id long, v double"
    )
    out = relational.gini_coefficient(z, ["g"], "v", "id").collect()[0]
    assert out["gini"] is None
    assert out["total"] == 0.0


def test_zipf_slope_on_synthetic_zipf_corpus(spark):
    # frequencies EXACTLY proportional to 1/rank (2520 divides by 1..10)
    # -> ln(freq) = ln(2520) - ln(rank) -> slope == -1, intercept == ln(2520)
    words = []
    for rank in range(1, 11):
        words += [f"w{rank:03d}"] * (2520 // rank)
    df = spark.createDataFrame([(" ".join(words),)], "text string")
    out = textops.zipf_slope(df, "text", top_n=10).collect()[0]
    assert out["n_ranks"] == 10
    assert math.isclose(out["slope"], -1.0, abs_tol=1e-6)
    assert math.isclose(out["intercept"], round(math.log(2520), 6), abs_tol=1e-6)


def test_prefix_dup_counts_exact_groups(spark):
    df = spark.createDataFrame(
        [
            ("AAAA tail one",),
            ("aaaa tail two",),  # same lowercased 4-char prefix? no — full 120 window
            ("short",),
            (None,),
        ],
        "text string",
    )
    # texts shorter than prefix_len hash their full text; the two 'aaaa…'
    # rows differ beyond char 4 so with len=4 they collide, with 120 not
    out120 = textops.prefix_dup_stats(df, "text", prefix_len=120).collect()[0]
    assert out120["dup_groups"] == 0 and out120["dup_docs"] == 0
    out4 = textops.prefix_dup_stats(df, "text", prefix_len=4).collect()[0]
    assert (out4["dup_groups"], out4["dup_docs"], out4["surplus_docs"], out4["max_group"]) == (
        1, 2, 1, 2,
    )


def test_doc_frequency_counts_presence_not_occurrences(spark):
    df = spark.createDataFrame(
        [(1, "the the the cat"), (2, "the dog")], "doc_id long, text string"
    )
    out = {r["token"]: (r["df"], r["idf"]) for r in
           textops.doc_frequency_top(df, "text", "doc_id", k=10).collect()}
    assert out["the"][0] == 2  # presence in 2 docs, not 4 occurrences
    assert out["cat"][0] == 1
    # smoothed idf: ln(2 / (1+2)) for 'the'
    assert math.isclose(out["the"][1], round(math.log(2 / 3), 6), abs_tol=1e-6)


# --- plan shapes ------------------------------------------------------------


def test_x110_topk_is_take_ordered_with_broadcast_nation(spark):
    plan = plan_of(q(spark, "x110_returned_revenue"))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_x112_disjunction_keeps_hash_join(spark):
    # the OR'd clauses share the p_partkey equi-key; the join must stay
    # hash-based, never degrade to a nested-loop/cartesian
    plan = plan_of(q(spark, "x112_disjunctive_pricing"))
    assert "BroadcastHashJoin" in plan or "ShuffledHashJoin" in plan or "SortMergeJoin" in plan
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan


def test_x113_is_single_shuffle_agg_no_correlated_rescan(spark):
    # the exists/not-exists pair must decorrelate into ONE pass over
    # lineitem join orders (plan scans lineitem exactly once)
    plan = plan_of(q(spark, "x113_sole_late_supplier"))
    assert plan.count("lineitem") <= 2  # one scan node + its file listing line
    assert "CartesianProduct" not in plan


def test_x115_head_is_take_ordered_not_global_sort(spark):
    plan = plan_of(q(spark, "x115_zipf_slope"))
    assert "TakeOrderedAndProject" in plan


def test_x118_population_scalars_broadcast(spark):
    plan = plan_of(q(spark, "x118_event_lift"))
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan or "BroadcastNestedLoopJoin" not in plan


def test_trailing_distinct_users_islands(spark):
    """Hand-computed rolling reach: users whose activity islands overlap
    and a gap larger than the window."""
    from flashml_spark.operators.events import trailing_distinct_users

    rows = [
        # user 1 active on day 1 and day 10 (gap > 7 => two islands)
        (1, "2024-01-01 10:00:00"),
        (1, "2024-01-10 10:00:00"),
        # user 2 active on day 3 only
        (2, "2024-01-03 09:00:00"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts string").withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    out = {
        r["day"]: r["active_users"]
        for r in trailing_distinct_users(df, window_days=7).collect()
    }
    # day 1..7: user1's first island covers 01-01..01-07
    assert out["2024-01-01"] == 1
    assert out["2024-01-03"] == 2          # user2 joins
    assert out["2024-01-07"] == 2          # user1 island ends 01-07, user2's 01-09
    assert out["2024-01-08"] == 1          # only user2's coverage remains
    assert out["2024-01-09"] == 1
    assert out["2024-01-10"] == 1          # user1's second island starts
    assert len(out) == 10                  # full span 01-01..01-10


def test_pagerank_two_node_analytic(spark):
    """Two nodes linked symmetrically: rank stays uniform at every
    iteration (analytic fixed point); a dangling-free star graph puts the
    hub strictly above the leaves."""
    from flashml_spark.operators.graph import pagerank

    sym = spark.createDataFrame([("a", "b"), ("b", "a")], "src string, dst string")
    r = {x["node"]: x["rank"] for x in pagerank(sym, iterations=4).collect()}
    assert abs(r["a"] - 0.5) < 1e-12 and abs(r["b"] - 0.5) < 1e-12

    star_half = [("hub", l) for l in ("l1", "l2", "l3")]
    star = star_half + [(l, "hub") for l in ("l1", "l2", "l3")]
    rs = {
        x["node"]: x["rank"]
        for x in pagerank(
            spark.createDataFrame(star, "src string, dst string"), iterations=6
        ).collect()
    }
    assert rs["hub"] > rs["l1"] == rs["l2"] == rs["l3"]
    assert abs(sum(rs.values()) - 1.0) < 1e-9  # symmetric graph conserves mass
