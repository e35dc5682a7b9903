"""Round-4 second batch (x97..x105): oracle parity + plan shapes +
operator-level semantics for the PII scrubber, trigram cosine, and
embedding-norm audit."""

from __future__ import annotations

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from flashml_spark.queries import QUERIES
from tests.conftest import SF_DIR, assert_frames_match


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def q(spark, name):
    return QUERIES[name][0](spark, SF_DIR)


@pytest.mark.parametrize(
    "name",
    [
        "x97_order_count_distribution",
        "x98_small_qty_revenue",
        "x99_large_orders",
        "x100_dormant_rich_customers",
        "x101_nation_trade_matrix",
        "x102_cheapest_supplier",
        "x103_pii_scrub",
        "x104_lang_trigram_cosine",
        "x105_embedding_norm_audit",
    ],
)
def test_ext7_query_matches_oracle(spark, ddb, name):
    assert_frames_match(q(spark, name), ddb, QUERIES[name][1])


# --- plan shapes ------------------------------------------------------------


def test_x99_topk_is_take_ordered(spark):
    plan = plan_of(q(spark, "x99_large_orders"))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


def test_x100_anti_join_not_cartesian(spark):
    plan = plan_of(q(spark, "x100_dormant_rich_customers"))
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan


def test_x101_nation_dims_broadcast(spark):
    plan = plan_of(q(spark, "x101_nation_trade_matrix"))
    assert "BroadcastHashJoin" in plan


def test_x102_argmin_is_single_agg_no_window(spark):
    # the struct-min arg-min must not fall back to a per-part sort window
    plan = plan_of(q(spark, "x102_cheapest_supplier"))
    assert "Window" not in plan
    assert "BroadcastHashJoin" in plan  # filtered part dim broadcast


def test_x103_scrub_is_pure_map_before_agg(spark):
    # PII scrub adds no shuffle of its own: the only exchanges are the
    # final per-source agg plus load_table's single-row-group parallelize
    # repartition (a no-op on splittable inputs).  Count detail headers —
    # formatted output lists each node twice (tree + details).
    import re

    plan = plan_of(q(spark, "x103_pii_scrub"))
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2


# --- operator semantics -----------------------------------------------------


def test_scrub_pii_counts_and_redacts(spark):
    from flashml_spark.operators.textops import scrub_pii

    df = spark.createDataFrame(
        [
            (1, "mail a@b.com and c.d@e.org, call 555-123-4567 at 1.2.3.4"),
            (2, "no pii here"),
            (3, None),
        ],
        "id int, text string",
    )
    rows = {r["id"]: r for r in scrub_pii(df, "text").collect()}
    assert rows[1]["n_email"] == 2
    assert rows[1]["n_phone"] == 1
    assert rows[1]["n_ipv4"] == 1
    assert (
        rows[1]["scrubbed"]
        == "mail <EMAIL> and <EMAIL>, call <PHONE> at <IP>"
    )
    assert rows[2]["n_email"] == 0 and rows[2]["scrubbed"] == "no pii here"
    assert rows[3]["scrubbed"] is None


def test_char_ngram_cosine_identical_groups(spark):
    from flashml_spark.operators.textops import char_ngram_group_cosine

    df = spark.createDataFrame(
        [("a", "abcabc"), ("b", "abcabc"), ("c", "zzzzzz")],
        "g string, text string",
    )
    got = {
        (r["ga"], r["gb"]): r["cos"]
        for r in char_ngram_group_cosine(df, "text", "g").collect()
    }
    assert got[("a", "b")] == pytest.approx(1.0)
    # 'c' shares no trigram with 'a'/'b' → no pair row at all
    assert ("a", "c") not in got and ("b", "c") not in got


def test_embedding_norm_stats_known_values(spark):
    from flashml_spark.operators.similarity import embedding_norm_stats

    df = spark.createDataFrame(
        [(0, [3.0, 4.0]), (0, [6.0, 8.0]), (1, [1.0, 0.0])],
        "label int, embedding array<float>",
    )
    rows = {r["label"]: r for r in embedding_norm_stats(df, "embedding", "label").collect()}
    assert rows[0]["n"] == 2
    assert rows[0]["min_norm"] == pytest.approx(5.0)
    assert rows[0]["max_norm"] == pytest.approx(10.0)
    assert rows[0]["avg_norm"] == pytest.approx(7.5)
    assert rows[1]["sd_norm"] is None  # stddev_samp of a single row


@pytest.mark.parametrize("name", ["x106_upsert_apply", "x107_event_paths"])
def test_ext7b_query_matches_oracle(spark, ddb, name):
    assert_frames_match(q(spark, name), ddb, QUERIES[name][1])


def test_x107_topk_is_take_ordered(spark):
    plan = plan_of(q(spark, "x107_event_paths"))
    assert "TakeOrderedAndProject" in plan
    assert "Exchange SinglePartition" not in plan  # windows stay per-user


def test_apply_upserts_semantics(spark):
    from flashml_spark.operators.dedup import apply_upserts

    base = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id int, text string"
    )
    changes = spark.createDataFrame(
        [(2, "B", "upsert"), (3, None, "delete"), (4, "d", "upsert")],
        "id int, text string, op string",
    )
    got = {r["id"]: r["text"] for r in apply_upserts(base, changes, "id").collect()}
    assert got == {1: "a", 2: "B", 4: "d"}


@pytest.mark.parametrize("name", ["x108_ks_length_drift", "x109_chisq_lang_source"])
def test_ext7c_query_matches_oracle(spark, ddb, name):
    assert_frames_match(q(spark, name), ddb, QUERIES[name][1])


def test_ks_statistic_known_value(spark):
    from flashml_spark.operators.relational import ks_statistic

    # A = {1,2}, B = {3,4}: CDFs never overlap before v=2 → KS = 1.0
    df = spark.createDataFrame(
        [(1, True), (2, True), (3, False), (4, False)], "v int, f boolean"
    )
    row = ks_statistic(df, "v", F.col("f")).first()
    assert row["ks_stat"] == pytest.approx(1.0)
    assert row["n_a"] == 2 and row["n_b"] == 2
    # identical samples → KS = 0
    df2 = spark.createDataFrame(
        [(1, True), (2, True), (1, False), (2, False)], "v int, f boolean"
    )
    assert ks_statistic(df2, "v", F.col("f")).first()["ks_stat"] == pytest.approx(0.0)


def test_chisq_independence_known_value(spark):
    from flashml_spark.operators.relational import chisq_independence

    # perfectly independent 2x2 table (all cells equal) → chi2 = 0
    rows = [(a, b) for a in ("x", "y") for b in ("u", "v") for _ in range(5)]
    df = spark.createDataFrame(rows, "a string, b string")
    r = chisq_independence(df, "a", "b").first()
    assert r["chi2"] == pytest.approx(0.0)
    assert r["n_cells"] == 4
    # fully dependent: a==x ⇔ b==u (10 each) → chi2 = N = 20
    rows = [("x", "u")] * 10 + [("y", "v")] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    assert chisq_independence(df, "a", "b").first()["chi2"] == pytest.approx(20.0)
