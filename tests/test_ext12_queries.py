"""Unit + property tests for the round-5 extension operators:
duplicated-span stats (exact substring dedup measurement) and SCD2
run-interval history.  Oracle parity runs via test_oracle_queries.py's
registry sweep; these pin hand-checkable semantics and brute-force
equivalence the SQL compare can't isolate.
"""

from __future__ import annotations

import datetime

from hypothesis import given, settings
from hypothesis import strategies as st

from flashml_spark.operators import events, textops

# --- dup_span_stats ---------------------------------------------------------


def _rows(df):
    return {r["doc_id"]: r for r in df.collect()}


def test_dup_spans_cross_doc_claim(spark):
    # 'x y' appears in both docs -> each doc reports one 2-token span
    docs = spark.createDataFrame(
        [(1, "x y a b c"), (2, "q x y r")], "doc_id long, text string"
    )
    out = _rows(textops.dup_span_stats(docs, "text", "doc_id", n=2))
    assert (out[1]["n_dup_spans"], out[1]["dup_tokens"]) == (1, 2)
    assert (out[2]["n_dup_spans"], out[2]["dup_tokens"]) == (1, 2)
    assert out[1]["dup_frac"] == 0.4  # 2 of 5 tokens


def test_dup_spans_within_doc_repeat_and_merge(spark):
    # 'x y' at pos 0 and 3 within ONE doc: two disjoint spans (gap 'z');
    # overlapping claims ('a b', 'b a', 'a b' in doc 2) merge into one
    docs = spark.createDataFrame(
        [(1, "x y z x y"), (2, "a b a b"), (3, "a b c")],
        "doc_id long, text string",
    )
    out = _rows(textops.dup_span_stats(docs, "text", "doc_id", n=2))
    assert (out[1]["n_dup_spans"], out[1]["dup_tokens"]) == (2, 4)
    # doc 2: grams 'a b'(x2, dup) and 'b a'(x1, not dup alone? it IS
    # counted: 'a b' dup claims pos 0 and 2; 'b a' occurs once -> only if
    # duplicated corpus-wide.  'a b' also in doc 3.  pos 0 and 2 with n=2
    # are ADJACENT (2 <= 0+2) -> one merged span covering all 4 tokens
    assert (out[2]["n_dup_spans"], out[2]["dup_tokens"]) == (1, 4)
    assert out[2]["dup_frac"] == 1.0


def test_dup_spans_zero_report_for_unique_and_short(spark):
    docs = spark.createDataFrame(
        [(1, "completely unique text here"), (2, "tiny")],
        "doc_id long, text string",
    )
    out = _rows(textops.dup_span_stats(docs, "text", "doc_id", n=2))
    # every non-null doc reports, zeros included (doc 2 has no bigrams)
    assert set(out) == {1, 2}
    for r in out.values():
        assert r["n_dup_spans"] == 0 and r["dup_tokens"] == 0
        assert r["dup_frac"] == 0.0


def _brute_dup_spans(corpus: dict[int, list[str]], n: int):
    from collections import Counter

    grams = Counter()
    for toks in corpus.values():
        for i in range(len(toks) - n + 1):
            grams[tuple(toks[i : i + n])] += 1
    out = {}
    for doc, toks in corpus.items():
        claims = [
            i
            for i in range(len(toks) - n + 1)
            if grams[tuple(toks[i : i + n])] >= 2
        ]
        spans = []
        for p in claims:
            if spans and p <= spans[-1][1] + 1:
                spans[-1][1] = max(spans[-1][1], p + n - 1)
            else:
                spans.append([p, p + n - 1])
        out[doc] = (len(spans), sum(e - s + 1 for s, e in spans))
    return out


@settings(max_examples=12, deadline=None, derandomize=True)
@given(
    st.lists(
        st.lists(st.sampled_from("abcd"), min_size=1, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_dup_spans_matches_brute_force(spark, corpora):
    corpus = {i: toks for i, toks in enumerate(corpora)}
    docs = spark.createDataFrame(
        [(i, " ".join(t)) for i, t in corpus.items()], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["n_dup_spans"], r["dup_tokens"])
        for r in textops.dup_span_stats(docs, "text", "doc_id", n=2).collect()
    }
    assert got == _brute_dup_spans(corpus, 2)


# --- scd2_run_intervals -----------------------------------------------------


def _ts(h):
    return datetime.datetime(2024, 1, 1, h)


def test_scd2_hand_history(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts(1), 10, "A"),
            (2, _ts(2), 10, "A"),
            (3, _ts(3), 10, "B"),
            (4, _ts(4), 10, "A"),  # A recurs -> NEW interval, not merged
            (5, _ts(1), 20, "C"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    out = events.scd2_run_intervals(ev, "user_id", "ts", "event_type", "event_id")
    rows = sorted(
        out.collect(), key=lambda r: (r["user_id"], r["valid_from"])
    )
    u10 = [(r["event_type"], r["valid_from"], r["valid_to"], r["n_events"]) for r in rows if r["user_id"] == 10]
    assert u10 == [
        ("A", _ts(1), _ts(3), 2),
        ("B", _ts(3), _ts(4), 1),
        ("A", _ts(4), None, 1),
    ]
    u20 = [(r["event_type"], r["valid_to"], r["n_events"]) for r in rows if r["user_id"] == 20]
    assert u20 == [("C", None, 1)]


def test_scd2_interval_chain_invariants(spark):
    # per key: exactly one open interval; valid_to chains to the next
    # valid_from; n_events sums to the key's event count
    ev = spark.createDataFrame(
        [
            (i, _ts(1 + i % 20), 100 + (i % 3), ["A", "B"][(i // 4) % 2])
            for i in range(48)
        ],
        "event_id long, ts timestamp, user_id long, event_type string",
    )
    rows = events.scd2_run_intervals(
        ev, "user_id", "ts", "event_type", "event_id"
    ).collect()
    by_user: dict[int, list] = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    total = 0
    for user, ivs in by_user.items():
        ivs.sort(key=lambda r: r["valid_from"])
        assert sum(1 for r in ivs if r["valid_to"] is None) == 1
        assert ivs[-1]["valid_to"] is None
        for a, b in zip(ivs, ivs[1:]):
            assert a["valid_to"] == b["valid_from"]
            assert a["event_type"] != b["event_type"] or a["valid_to"] is None
        total += sum(r["n_events"] for r in ivs)
    assert total == 48


# --- remove_dup_spans -------------------------------------------------------


def test_remove_dup_spans_hand_case(spark):
    docs = spark.createDataFrame(
        [(1, "x y a b c"), (2, "q x y r"), (3, "tiny")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.remove_dup_spans(docs, "text", "doc_id", n=2).collect()}
    assert out[1]["clean_text"] == "a b c" and out[1]["kept_tokens"] == 3
    assert out[2]["clean_text"] == "q r" and out[2]["kept_tokens"] == 2
    assert out[3]["clean_text"] == "tiny" and out[3]["kept_tokens"] == 1


def test_remove_dup_spans_can_empty_a_doc(spark):
    docs = spark.createDataFrame(
        [(1, "a b a b"), (2, "a b c")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in textops.remove_dup_spans(docs, "text", "doc_id", n=2).collect()}
    # doc 1 is one merged span covering all 4 tokens -> emptied, survives
    assert out[1]["clean_text"] == "" and out[1]["kept_tokens"] == 0
    assert out[1]["n_tokens"] == 4
    # doc 2 loses its 'a b' claim, keeps 'c'
    assert out[2]["clean_text"] == "c" and out[2]["kept_tokens"] == 1


def test_remove_dup_spans_consistent_with_stats(spark):
    # the cut and the measurement must agree: kept = n_tokens - dup_tokens
    docs = spark.createDataFrame(
        [(i, f"common prefix tokens here doc {i} unique tail {i * 7}") for i in range(12)],
        "doc_id long, text string",
    )
    stats = {
        r["doc_id"]: r
        for r in textops.dup_span_stats(docs, "text", "doc_id", n=3).collect()
    }
    cut = {
        r["doc_id"]: r
        for r in textops.remove_dup_spans(docs, "text", "doc_id", n=3).collect()
    }
    assert set(stats) == set(cut)
    for d in stats:
        assert cut[d]["kept_tokens"] == stats[d]["n_tokens"] - stats[d]["dup_tokens"]
        assert len(cut[d]["clean_text"].split()) == cut[d]["kept_tokens"] or (
            cut[d]["clean_text"] == "" and cut[d]["kept_tokens"] == 0
        )
