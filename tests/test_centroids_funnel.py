"""Label-centroid similarity and session-funnel operators: semantics on
hand-built frames (the oracle suite covers them end-to-end at sf0.01)."""

from __future__ import annotations

import datetime
import math

from flashml_spark.operators import events, similarity


def test_label_centroids_elementwise_mean(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (0, [3.0, 2.0]), (1, [0.0, 4.0])], ["label", "vec"]
    )
    cents = {
        r["label"]: r["centroid"]
        for r in similarity.label_centroids(df, "vec", "label").collect()
    }
    assert cents[0] == [2.0, 1.0]
    assert cents[1] == [0.0, 4.0]


def test_label_centroid_similarity_pairs(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [1.0, 1.0])], ["label", "vec"]
    )
    rows = {
        (r["label_a"], r["label_b"]): r["cos"]
        for r in similarity.label_centroid_similarity(df, "vec", "label").collect()
    }
    assert set(rows) == {(0, 1), (0, 2), (1, 2)}  # a < b, each pair once
    assert rows[(0, 1)] == 0.0
    assert abs(rows[(0, 2)] - round(1 / math.sqrt(2), 6)) < 1e-9


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, datetime.datetime(2024, 1, 1, 0, m), u, t, 0.0) for i, (u, m, t) in enumerate(rows)],
        ["event_id", "ts", "user_id", "event_type", "value"],
    )


def test_funnel_stats_stage_ordering(spark):
    # u1 s0: full funnel in order; u1 s1 (after 40-min gap): click before
    # view -> stage 1 not reached; u2: view only
    df = _ev(
        spark,
        [
            ("u1", 0, "view"), ("u1", 1, "click"), ("u1", 2, "purchase"),
            ("u1", 50, "click"), ("u1", 51, "view"),
            ("u2", 0, "view"),
        ],
    )
    row = events.funnel_stats(df, stages=("view", "click", "purchase"), gap_minutes=30).first()
    assert row["n_sessions"] == 3
    assert row["n_s0"] == 3          # all three sessions have a view
    assert row["n_s1"] == 1          # only u1 s0 has click >= view
    assert row["n_s2"] == 1


def test_funnel_stats_missing_stage_is_not_counted(spark):
    df = _ev(spark, [("u1", 0, "view"), ("u1", 1, "purchase")])  # no click
    row = events.funnel_stats(df, stages=("view", "click", "purchase")).first()
    assert (row["n_s0"], row["n_s1"], row["n_s2"]) == (1, 0, 0)
