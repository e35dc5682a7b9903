"""Unit tests for the round-5 third-wave curation operators:
eval-set decontamination (n-gram overlap) and the corpus-unigram
log-probability quality score.  Oracle parity runs via
test_oracle_queries.py's registry sweep; these pin hand-checkable
semantics on tiny frames.
"""

from __future__ import annotations

import math

from flashml_spark.operators import textops

# --- decontamination_audit --------------------------------------------------


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_decontamination_flags_shared_grams(spark):
    # train doc 1 repeats the eval doc's opening 5-gram verbatim; doc 2
    # shares nothing.  n=3 keeps the hand arithmetic small.
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),  # grams: 4, 1 shared
            (2, "completely different text entirely here now"),
        ],
        "doc_id long, text string",
    )
    ev = spark.createDataFrame(
        [(100, "the quick brown cat")], "doc_id long, text string"
    )
    out = _rows(
        textops.decontamination_audit(train, ev, "text", "doc_id", n=3)
    )
    assert out[1]["n_grams"] == 4
    assert out[1]["n_hit"] == 1  # "the quick brown"
    assert out[1]["contamination"] == 0.25
    assert out[2]["n_hit"] == 0
    assert out[2]["contamination"] == 0.0


def test_decontamination_distinct_grams_count_once(spark):
    # a train doc repeating the contaminated gram twice still reports it
    # as ONE distinct gram hit, and a fully-contained doc scores 1.0
    train = spark.createDataFrame(
        [(1, "a b c x a b c"), (2, "a b c")], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c")], "doc_id long, text string")
    out = _rows(textops.decontamination_audit(train, ev, "text", "doc_id", n=3))
    # doc 1 distinct 3-grams: "a b c","b c x","c x a","x a b" -> 4, hit 1
    assert out[1]["n_grams"] == 4 and out[1]["n_hit"] == 1
    assert out[2]["contamination"] == 1.0


def test_decontamination_short_docs_drop_out(spark):
    train = spark.createDataFrame(
        [(1, "too short"), (2, None)], "doc_id long, text string"
    )
    ev = spark.createDataFrame([(9, "a b c d e")], "doc_id long, text string")
    assert (
        textops.decontamination_audit(train, ev, "text", "doc_id", n=5).count()
        == 0
    )


# --- unigram_logprob_score --------------------------------------------------


def test_unigram_logprob_hand_values(spark):
    # corpus: "a a b" + "b c" -> counts a=2 b=2 c=1, N=5
    df = spark.createDataFrame(
        [(1, "a a b"), (2, "b c")], "doc_id long, text string"
    )
    out = _rows(textops.unigram_logprob_score(df, "text", "doc_id"))
    n = {"a": 2.0, "b": 2.0, "c": 1.0}
    exp1 = (math.log(n["a"]) + math.log(n["a"]) + math.log(n["b"])) / 3 - math.log(5)
    exp2 = (math.log(n["b"]) + math.log(n["c"])) / 2 - math.log(5)
    assert out[1]["n_tokens"] == 3
    assert abs(out[1]["avg_logp"] - exp1) < 1e-6
    assert out[2]["n_tokens"] == 2
    assert abs(out[2]["avg_logp"] - exp2) < 1e-6


def test_unigram_logprob_rare_tokens_score_lower(spark):
    df = spark.createDataFrame(
        [
            (1, "common common common common"),
            (2, "rare1 rare2 rare3 rare4"),
        ],
        "doc_id long, text string",
    )
    out = _rows(textops.unigram_logprob_score(df, "text", "doc_id"))
    assert out[1]["avg_logp"] > out[2]["avg_logp"]
