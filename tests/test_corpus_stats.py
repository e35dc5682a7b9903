"""Unit tests for the round-2 corpus-statistics operators: repetition
ratio, per-group vocabulary head, quota sampling, scale-safe NTILE, and
SimHash Hamming-radius pairs (exact-recall guarantee)."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from flashml_spark.functions.windows import global_ntile
from flashml_spark.operators import dedup, sampling, textops
from flashml_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_repetition_ratio_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b"),      # bigrams: [a b, b a, a b] -> 1 - 2/3
            (2, "x y z"),        # all distinct -> 0.0
            (3, "one"),          # sub-n tokens -> 0.0 (no NULL)
            (4, ""),             # empty -> 0.0
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["rep_ratio"]
        for r in textops.with_repetition_ratio(df, "text", n=2).collect()
    }
    assert got[1] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_token_topk_per_group_ties_break_ascending(spark):
    df = spark.createDataFrame(
        [("en", "b a b a c"), ("de", "x x y")], ["lang", "text"]
    )
    rows = textops.token_topk_per_group(df, "text", "lang", k=2).collect()
    en = sorted((r["rn"], r["token"]) for r in rows if r["lang"] == "en")
    # a and b tie at 2; ascending token order ranks a first
    assert en == [(1, "a"), (2, "b")]


def test_quota_per_group_deterministic_and_bounded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    s1 = sampling.quota_per_group(docs, "source", "doc_id", k=3)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.quota_per_group(docs, "source", "doc_id", k=3)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2  # same survivors every run
    per_group = (
        s1.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_group <= 3


def test_global_ntile_matches_single_partition_ntile(spark):
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["bucket"]
        for r in global_ntile(docs, "n_chars", 7, tiebreak_cols=["doc_id"]).collect()
    }
    w = Window.orderBy(F.asc("n_chars"), F.asc("doc_id"))
    want = {
        r["doc_id"]: r["b"]
        for r in docs.withColumn("b", F.ntile(7).over(w)).collect()
    }
    assert got == want


def test_simhash_hamming_pairs_exact_recall_vs_brute_force(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(
            docs, "text", "doc_id", bits=16, bands=4, max_hamming=3
        ).collect()
    }
    fps = {
        r["doc_id"]: r["fp"]
        for r in dedup.with_simhash(docs, "text", 16, out_col="fp")
        .select("doc_id", "fp")
        .collect()
    }
    want = {}
    for a, b in combinations(sorted(fps), 2):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= 3:
            want[(a, b)] = h
    # pigeonhole: radius 3 with 4 bands is EXACT, not approximate
    assert got == want


def test_simhash_hamming_pairs_radius_cap_enforced(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="exact-recall"):
        dedup.simhash_hamming_pairs(docs, "text", "doc_id", bands=4, max_hamming=4)
