"""Round-4 extension queries (x84..x92): unit semantics + plan shapes."""

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
        "x84_priority_exists",
        "x85_linestatus_priority",
        "x86_promo_revenue_share",
        "x87_mixture_weights",
        "x88_pmi_pairs",
        "x89_dup_cluster_histogram",
        "x90_log2_length_histogram",
        "x91_user_moving_avg",
        "x92_daily_user_accession",
    ],
)
def test_round4_query_matches_oracle(spark, ddb, name):
    assert_frames_match(q(spark, name), ddb, QUERIES[name][1])


# --- plan shapes ------------------------------------------------------------

def test_x84_exists_is_semi_join(spark):
    plan = plan_of(q(spark, "x84_priority_exists"))
    assert "LeftSemi" in plan or "left_semi" in plan.lower()
    assert "CartesianProduct" not in plan


def test_x86_part_dim_broadcast(spark):
    plan = plan_of(q(spark, "x86_promo_revenue_share"))
    assert "BroadcastHashJoin" in plan


def test_x88_pmi_is_take_ordered(spark):
    plan = plan_of(q(spark, "x88_pmi_pairs"))
    assert "TakeOrderedAndProject" in plan  # top-k, never a global sort
    assert "CartesianProduct" not in plan


def test_x91_window_is_partitioned(spark):
    plan = plan_of(q(spark, "x91_user_moving_avg"))
    assert "Exchange SinglePartition" not in plan
    assert "windowspecdefinition(user_id" in plan


# --- operator-level semantics ----------------------------------------------

def test_moving_agg_known_values(spark):
    from flashml_spark.operators.events import moving_agg

    df = spark.createDataFrame(
        [(1, "u", 2.0), (2, "u", 4.0), (3, "u", 6.0), (4, "u", 8.0), (1, "v", 10.0)],
        "event_id int, user_id string, value double",
    ).withColumn("ts", F.col("event_id").cast("timestamp"))
    got = {
        (r["user_id"], r["event_id"]): r["moving_avg"]
        for r in moving_agg(df, "user_id", "ts", "value", 3, "event_id").collect()
    }
    assert got == {
        ("u", 1): 2.0, ("u", 2): 3.0, ("u", 3): 4.0, ("u", 4): 6.0,
        ("v", 1): 10.0,
    }


def test_mixture_weights_custom_targets(spark):
    from flashml_spark.operators.textops import mixture_weights

    df = spark.createDataFrame(
        [("a", "w w w"), ("b", "w")], ["source", "text"]
    )
    got = {
        r["source"]: (r["actual_share"], r["target_share"], r["weight"])
        for r in mixture_weights(
            df, "text", "source", targets={"a": 0.5, "b": 0.5}
        ).collect()
    }
    assert got["a"] == (0.75, 0.5, pytest.approx(0.666667))
    assert got["b"] == (0.25, 0.5, 2.0)


def test_daily_user_accession_cumulative_is_distinct_total(spark):
    from flashml_spark.operators.events import daily_user_accession

    rows = [
        ("2024-01-01 01:00:00", 1), ("2024-01-01 02:00:00", 2),
        ("2024-01-02 01:00:00", 1), ("2024-01-02 02:00:00", 3),
        ("2024-01-04 01:00:00", 1),
    ]
    df = spark.createDataFrame(rows, "ts_s string, user_id int").select(
        F.col("ts_s").cast("timestamp").alias("ts"), "user_id"
    )
    got = {
        r["day"]: (r["dau"], r["new_users"], r["cum_users"])
        for r in daily_user_accession(df).collect()
    }
    assert got == {
        "2024-01-01": (2, 2, 2),
        "2024-01-02": (2, 1, 3),
        "2024-01-04": (1, 0, 3),
    }


def test_log2_histogram_nonpositive_bucketed_null(spark):
    from flashml_spark.operators.relational import log2_histogram

    df = spark.createDataFrame([(0,), (1,), (2,), (3,), (8,)], ["v"])
    got = {r["bucket"]: (r["n"], r["min_v"], r["max_v"])
           for r in log2_histogram(df, "v").collect()}
    assert got[None] == (1, 0, 0)
    assert got[0] == (1, 1, 1)
    assert got[1] == (2, 2, 3)
    assert got[3] == (1, 8, 8)


def test_pmi_min_count_floor(spark):
    from flashml_spark.operators.textops import pmi_top_pairs

    df = spark.createDataFrame(
        [("x y x y x y",), ("rare pair",)], ["text"]
    )
    rows = pmi_top_pairs(df, "text", k=10, min_count=2).collect()
    pairs = {(r["w1"], r["w2"]) for r in rows}
    assert ("rare", "pair") not in pairs  # floored out
    assert ("x", "y") in pairs


@pytest.mark.parametrize(
    "name",
    [
        "x93_doc_chunking",
        "x94_hash_split",
        "x95_source_dedup_rate",
        "x96_centroid_drift",
    ],
)
def test_round4b_query_matches_oracle(spark, ddb, name):
    assert_frames_match(q(spark, name), ddb, QUERIES[name][1])


def test_chunk_documents_overlap_and_tail(spark):
    from flashml_spark.operators.textops import chunk_documents

    df = spark.createDataFrame([(1, " ".join(f"t{i}" for i in range(50)))],
                               ["id", "text"])
    rows = {r["chunk_idx"]: (r["n_tok"], r["head"])
            for r in chunk_documents(df, "text", "id", 32, 24).collect()}
    # starts at 0, 24, 48: full window, clipped tail windows
    assert rows == {0: (32, "t0"), 1: (26, "t24"), 2: (2, "t48")}


def test_chunk_documents_is_shuffle_free(spark):
    from flashml_spark.operators.textops import chunk_documents

    # raw read (load_table's input-parallelism guard adds a repartition of
    # its own — that's the loader's shuffle, not the operator's)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id", "text")
    plan = plan_of(chunk_documents(docs, "text", "doc_id"))
    assert "Exchange" not in plan  # pure map: generate + project over scan


def test_hash_split_stable_and_partition_invariant(spark):
    from flashml_spark.operators.sampling import deterministic_hash_split

    df = spark.range(1000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"]: r["split"]
         for r in deterministic_hash_split(df, "doc_id").collect()}
    b = {r["doc_id"]: r["split"]
         for r in deterministic_hash_split(df.repartition(7), "doc_id").collect()}
    assert a == b  # assignment is a pure function of the id
    frac_train = sum(1 for v in a.values() if v == "train") / len(a)
    assert 0.7 < frac_train < 0.9


def test_centroid_shift_identical_halves_is_zero(spark):
    from flashml_spark.operators.similarity import centroid_shift

    df = spark.createDataFrame(
        [(0, [1.0, 0.0], 1), (1, [1.0, 0.0], 1), (2, [0.0, 2.0], 2), (3, [0.0, 2.0], 2)],
        "vec_id int, embedding array<double>, label int",
    )
    a = df.filter("vec_id % 2 = 0")
    b = df.filter("vec_id % 2 = 1")
    got = {r["label"]: (r["cos"], r["shift"])
           for r in centroid_shift(a, b, "embedding", "label").collect()}
    assert got == {1: (1.0, 0.0), 2: (1.0, 0.0)}
