"""PII scan/redaction unit pins: per-type counts, the email-before-IP
replacement order, null passthrough, and RE2-safe pattern syntax."""

from __future__ import annotations

import re

from flashml_spark.operators import pii


def test_pii_scan_counts_and_flag(spark):
    rows = [
        (1, "mail a@b.co and c.d+e@f-g.org, ip 10.0.0.1, tel 555-123-4567"),
        (2, "ip only 1.2.3.4 and 99.999.999.999"),
        (3, "clean text"),
        (4, None),
        (5, "phones 123 456 7890 and 123.456.7890"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in pii.pii_scan(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3, 5}  # null text drops
    assert (out[1]["n_email"], out[1]["n_ipv4"], out[1]["n_phone"]) == (2, 1, 1)
    # 99.999.999.999 still MATCHES the shape pattern (screens are
    # shape-level; octet-range validation is a downstream choice)
    assert out[2]["n_ipv4"] == 2 and out[2]["n_email"] == 0
    assert out[3]["has_pii"] == 0 and out[1]["has_pii"] == 1
    assert out[5]["n_phone"] == 2


def test_pii_redact_order_and_nulls(spark):
    # the dotted mail host must be consumed by <EMAIL>, never
    # re-matched as an IP — pattern ORDER is part of the contract
    rows = [(1, "x user@10.0.0.1.example.com y 10.0.0.1 z"), (2, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["redacted"]
           for r in pii.pii_redact(df, "text").collect()}
    assert out[1] == "x <EMAIL> y <IP> z"
    assert out[2] is None


def test_pii_patterns_are_re2_safe():
    # no lookaround / backreferences — the property that makes the
    # DuckDB twin a true oracle
    for _name, pat, _tok in pii.PII_PATTERNS:
        assert "(?=" not in pat and "(?!" not in pat and "(?<" not in pat
        assert not re.search(r"\\[1-9]", pat)
        re.compile(pat)  # and it is valid Python/Java-style too


# --- CCNet paragraph dedup (same round; shares this file's curation
# scope) ---------------------------------------------------------------


def test_paragraph_dedup_cross_doc_first_wins(spark):
    from flashml_spark.operators import textops

    rows = [
        (1, "cookie banner\nunique one\n\nshared para"),
        (2, "cookie banner\nunique two\nshared para"),
        (3, "COOKIE   banner\nunique three"),  # norm: trim+lower ≠ doc1's
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textops.paragraph_dedup(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    # doc 1 owns every first occurrence, keeps everything incl. the
    # blank line (empties never dedup)
    assert out[1]["n_paragraphs"] == 4 and out[1]["n_kept"] == 4
    assert out[1]["dedup_text"] == "cookie banner\nunique one\n\nshared para"
    # doc 2 loses both duplicated paragraphs, order preserved
    assert out[2]["n_kept"] == 1 and out[2]["dedup_text"] == "unique two"
    # doc 3's banner differs after normalization (internal spaces)
    assert out[3]["n_kept"] == 2


def test_paragraph_dedup_digit_folding_and_self_dup(spark):
    from flashml_spark.operators import textops

    rows = [
        # digits fold to 0: 'page 1' and 'page 2' normalize equal ->
        # the SECOND drops even inside one document
        (7, "page 1\nbody text\npage 2"),
        (8, "Body TEXT"),  # case-folds equal to doc 7's 'body text'
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textops.paragraph_dedup(df, "text", "doc_id").collect()}
    assert out[7]["n_kept"] == 2
    assert out[7]["dedup_text"] == "page 1\nbody text"
    assert out[8]["n_kept"] == 0 and out[8]["dedup_text"] == ""


def test_bigram_logprob_hand_computed(spark):
    import math

    from flashml_spark.operators import textops

    rows = [(1, "a b a b"), (2, "a b"), (3, "x"), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textops.bigram_logprob_score(df, "text", "doc_id").collect()}
    assert set(out) == {1, 2, 3}
    # c12: (a,b)=3, (b,a)=1; prefix counts a=3, b=1; unigrams a=3,b=3,
    # x=1, T=7 -> p(b|a) = .7*3/3 + .3*3/7 = p(a|b) = .7*1/1 + .3*3/7
    expect = round(math.log(0.7 + 0.3 * 3 / 7), 6)
    assert out[1]["n_bigrams"] == 3 and out[1]["avg_logp2"] == expect
    assert out[2]["n_bigrams"] == 1 and out[2]["avg_logp2"] == expect
    assert out[3]["n_bigrams"] == 0 and out[3]["avg_logp2"] is None
    import pytest as _pytest

    with _pytest.raises(ValueError, match="lam"):
        textops.bigram_logprob_score(df, "text", "doc_id", lam=0.0)
    # fluency ordering: a doc of corpus-common bigrams outranks a doc
    # of once-seen bigrams
    rows2 = [(i, "the cat sat") for i in range(5)] + [(99, "zq vw kj")]
    df2 = spark.createDataFrame(rows2, "doc_id long, text string")
    s = {r["doc_id"]: r["avg_logp2"] for r in
         textops.bigram_logprob_score(df2, "text", "doc_id").collect()}
    assert s[0] > s[99]


def test_packed_attention_hand_layout(spark):
    from flashml_spark.operators import textops

    docs = [(1, "a b c d"), (2, "e f g h")]  # 8 tokens at L=6
    df = spark.createDataFrame(docs, "doc_id long, text string")
    out = {r["seq"]: r for r in
           textops.packed_attention_audit(df, "text", "doc_id", 6).collect()}
    # seq 0: spans 4 + 2 -> T=6, intra 16+4, cross 16
    assert out[0]["n_docs"] == 2 and out[0]["tokens_filled"] == 6
    assert (out[0]["total_pairs"], out[0]["intra_pairs"],
            out[0]["cross_pairs"]) == (36, 20, 16)
    assert out[0]["cross_frac"] == round(16 / 36, 6)
    # seq 1: doc 2's remaining 2 tokens alone -> zero leakage
    assert out[1]["n_docs"] == 1 and out[1]["cross_frac"] == 0.0


def test_span_corruption_closed_form(spark):
    import pytest as _pytest

    from flashml_spark.operators import textops

    rows = [
        (1, "w"),                      # n=1: one clamped 1-token span
        (20, " ".join(["t"] * 20)),    # n=20: one full span
        (21, " ".join(["t"] * 21)),    # n=21: second span clamps to 1
        (25, " ".join(["t"] * 25)),    # n=25: two full spans
        (99, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           textops.span_corruption_plan(df, "text", "doc_id").collect()}
    assert set(out) == {1, 20, 21, 25}
    assert (out[1]["n_spans"], out[1]["n_masked"], out[1]["mask_ratio"]) == \
        (1, 1, 1.0)
    assert (out[20]["n_spans"], out[20]["n_masked"]) == (1, 3)
    assert (out[21]["n_spans"], out[21]["n_masked"]) == (2, 4)
    assert (out[25]["n_spans"], out[25]["n_masked"]) == (2, 6)
    assert out[25]["mask_ratio"] == round(6 / 25, 6)
    with _pytest.raises(ValueError, match="overlap"):
        textops.span_corruption_plan(df, "text", "doc_id",
                                     span_len=5, period=3)
    with _pytest.raises(ValueError, match="offset"):
        textops.span_corruption_plan(df, "text", "doc_id", offset=0)
