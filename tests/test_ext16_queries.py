"""Unit and property tests for the round-6 operator additions
(x219-x226): deterministic HLL, G² collocations, gains table,
Fellegi-Sunter bands, Gopher rules, DSIR weights, BH FDR, exact
isotonic calibration."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


def test_hll_estimate_within_theoretical_error(spark):
    # 256 registers -> relative standard error 1.04/sqrt(256) = 6.5%;
    # 5 sigma of slack covers any single draw deterministically chosen
    # here.  Exact count must be exact.
    from flashml_spark.operators.sketches import hll_distinct

    rows = [("g1", f"tok{i}") for i in range(5000)] + [
        ("g2", f"val{i % 137}") for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "g string, v string")
    out = {r["g"]: r for r in hll_distinct(df, "g", "v").collect()}
    assert out["g1"]["n_exact"] == 5000
    assert out["g2"]["n_exact"] == 137
    assert abs(out["g1"]["hll_estimate"] - 5000) / 5000 < 0.33
    # 137 distinct is deep in the linear-counting regime (< 2.5m = 640);
    # the small-range correction makes the estimate tight
    assert abs(out["g2"]["hll_estimate"] - 137) / 137 < 0.1


def test_hll_is_insensitive_to_duplication_and_order(spark):
    # cardinality sketches must ignore multiplicity: duplicating every
    # value 7 times changes nothing
    from flashml_spark.operators.sketches import hll_distinct

    base = [("g", f"t{i}") for i in range(500)]
    df1 = spark.createDataFrame(base, "g string, v string")
    df7 = spark.createDataFrame(base * 7, "g string, v string")
    r1 = hll_distinct(df1, "g", "v").collect()[0]
    r7 = hll_distinct(df7, "g", "v").collect()[0]
    assert r1["hll_estimate"] == r7["hll_estimate"]
    assert r1["n_exact"] == r7["n_exact"] == 500


def _py_g2(k11, ra, cb, n):
    def term(k, e):
        return k * math.log(k / e) if k > 0 else 0.0

    k12, k21 = ra - k11, cb - k11
    k22 = n - ra - cb + k11
    return 2.0 * (
        term(k11, ra * cb / n)
        + term(k12, ra * (n - cb) / n)
        + term(k21, (n - ra) * cb / n)
        + term(k22, (n - ra) * (n - cb) / n)
    )


def test_collocations_g2_matches_python_model(spark):
    from collections import Counter

    from flashml_spark.operators.textops import collocations_g2

    docs = [
        "new york new york is big",
        "new york has new ideas",
        "york new is rare",
    ]
    df = spark.createDataFrame([(d,) for d in docs], "text string")
    got = {
        (r["word_a"], r["word_b"]): (r["n_pair"], r["g2"])
        for r in collocations_g2(df, "text", top_k=50, min_count=1).collect()
    }
    bigrams = Counter()
    for d in docs:
        t = d.split()
        for a, b in zip(t, t[1:]):
            bigrams[(a, b)] += 1
    left = Counter()
    right = Counter()
    for (a, b), k in bigrams.items():
        left[a] += k
        right[b] += k
    n = sum(bigrams.values())
    for (a, b), k in bigrams.items():
        want = round(_py_g2(k, left[a], right[b], n), 6)
        assert got[(a, b)][0] == k
        assert got[(a, b)][1] == pytest.approx(want, abs=2e-6), (a, b)
    # the repeated collocation ranks first
    top = max(got.items(), key=lambda kv: kv[1][1])
    assert top[0] == ("new", "york")


def test_cumulative_gains_matches_python_model(spark):
    from flashml_spark.metrics.binary import cumulative_gains

    rows = [(i, (100 - i) / 100.0, 1 if i < 30 else 0) for i in range(100)]
    df = spark.createDataFrame(rows, "id int, score double, y int")
    out = cumulative_gains(df, "score", "y", "id", n_buckets=5).collect()
    # perfect ranking: 30 positives all in the top 30 rows -> first
    # bucket (20 rows) all positive, second bucket 10 of 20
    assert [r["n_pos"] for r in out] == [20, 10, 0, 0, 0]
    assert [r["cum_pos"] for r in out] == [20, 30, 30, 30, 30]
    assert out[0]["lift"] == pytest.approx(1.0 / 0.3, abs=1e-6)
    assert out[-1]["gain"] == 1.0


def test_fs_weight_bands_known_weights(spark):
    from flashml_spark.operators.dedup import fs_weight_bands

    m, u = 0.9, 0.1
    agree_w = math.log(m / u)       # +2.197
    disagree_w = math.log(0.1 / 0.9)  # -2.197
    rows = [(True, True), (False, False), (True, False), (False, True)]
    df = spark.createDataFrame(rows, "agree boolean, is_match boolean")
    out = {r["band"]: r for r in fs_weight_bands(
        df, [("agree", m, u)], "is_match"
    ).collect()}
    hi, lo = math.floor(agree_w), math.floor(disagree_w)
    assert out[hi]["n_pairs"] == 2 and out[hi]["n_match"] == 1
    assert out[lo]["n_pairs"] == 2 and out[lo]["n_match"] == 1
    assert out[hi]["match_rate"] == 0.5


def test_gopher_rules_flag_each_violation(spark):
    from flashml_spark.operators.textops import gopher_quality_rules

    ok = "the be to of and that have with " + " ".join(
        f"word{i}" for i in range(60)
    )
    short = "only three words"                     # wordcount violation
    longwords = " ".join(["supercalifragilistic"] * 60)  # wordlen + stop
    symbols = " ".join(["$$$"] * 60)               # alpha + stop (+wordlen)
    rows = [("s1", ok), ("s2", short), ("s3", longwords), ("s4", symbols)]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in gopher_quality_rules(
        df, "text", "source"
    ).collect()}
    assert out["s1"]["v_any"] == 0 and out["s1"]["pass_rate"] == 1.0
    assert out["s2"]["v_wordcount"] == 1
    assert out["s3"]["v_wordlen"] == 1 and out["s3"]["v_stop"] == 1
    assert out["s4"]["v_alpha"] == 1


def test_dsir_ranks_target_like_source_higher(spark):
    from flashml_spark.operators.textops import dsir_importance

    # target docs talk about "alpha beta"; src_like mimics them,
    # src_far does not
    rows = (
        [(i, "tgt", True, "alpha beta alpha beta gamma") for i in range(10)]
        + [(100 + i, "like", False, "alpha beta alpha beta") for i in range(10)]
        + [(200 + i, "far", False, "zeta eta theta iota kappa") for i in range(10)]
    )
    df = spark.createDataFrame(
        rows, "doc_id int, source string, is_t boolean, text string"
    )
    out = {r["source"]: r["mean_log_weight"] for r in dsir_importance(
        df, "text", "doc_id", "source", "is_t", n_buckets=64
    ).collect()}
    assert out["like"] > out["far"]


def test_bh_fdr_textbook_example(spark):
    # classic BH walkthrough: m=10, q=0.25, thresholds i/10*0.25.
    # p6=0.10 <= 0.15 is the largest passing rank (p7=0.20 > 0.175),
    # so the step-up discovers ranks 1..6 — including p5=0.05 and
    # p6=0.10 even though p6 alone wouldn't pass its own threshold
    # under Bonferroni.
    from flashml_spark.operators.relational import bh_fdr

    ps = [0.01, 0.02, 0.03, 0.04, 0.05, 0.10, 0.20, 0.30, 0.40, 0.50]
    df = spark.createDataFrame(
        [(f"t{i}", p) for i, p in enumerate(ps)], "k string, p double"
    )
    out = sorted(bh_fdr(df, "k", "p", q=0.25).collect(), key=lambda r: r["rank"])
    assert [r["discovered"] for r in out] == [1] * 6 + [0] * 4


def test_bh_fdr_no_discoveries(spark):
    from flashml_spark.operators.relational import bh_fdr

    df = spark.createDataFrame(
        [("a", 0.9), ("b", 0.95)], "k string, p double"
    )
    out = bh_fdr(df, "k", "p", q=0.05).collect()
    assert all(r["discovered"] == 0 for r in out)


def _py_pav(pairs):
    """Pool-adjacent-violators on [(weight, rate)] -> fitted values."""
    blocks = [[w, w * r] for w, r in pairs]  # [weight, weighted_sum]
    idx = [[i] for i in range(len(pairs))]
    i = 0
    while i < len(blocks) - 1:
        if blocks[i][1] / blocks[i][0] > blocks[i + 1][1] / blocks[i + 1][0] + 1e-15:
            blocks[i][0] += blocks[i + 1][0]
            blocks[i][1] += blocks[i + 1][1]
            idx[i].extend(idx[i + 1])
            del blocks[i + 1], idx[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    out = [0.0] * len(pairs)
    for blk, members in zip(blocks, idx):
        for m in members:
            out[m] = blk[1] / blk[0]
    return out


def test_isotonic_matches_pav_and_is_monotone(spark):
    from flashml_spark.metrics.binary import isotonic_calibration

    # scores spread over [0,1); labels deliberately NON-monotone in the
    # middle so PAV has pools to merge
    rows = []
    import random

    rnd = random.Random(7)
    for i in range(400):
        s = (i % 100) / 100.0 + 0.005
        y = 1 if rnd.random() < (0.8 - 0.6 * abs(s - 0.5)) else 0
        rows.append((s, y))
    df = spark.createDataFrame(rows, "score double, y int")
    out = isotonic_calibration(df, "score", "y", n_bins=10).collect()
    iso = [r["iso_rate"] for r in out]
    assert iso == sorted(iso)  # monotone non-decreasing
    # PAV reference on the same binned data
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for s, y in rows:
        b = min(int(s * 10), 9)
        agg[b][0] += 1
        agg[b][1] += y
    binned = [
        (agg[b][0], agg[b][1] / agg[b][0]) for b in sorted(agg)
    ]
    want = [round(v, 6) for v in _py_pav(binned)]
    assert iso == pytest.approx(want, abs=1e-6)


def test_hll_merge_identical_and_cross_group_dedup(spark):
    # values shared by several groups count once globally; merged and
    # direct register paths agree bit-for-bit (max associativity)
    from flashml_spark.operators.sketches import hll_merge_audit

    rows = [(f"g{i % 4}", f"tok{i % 300}") for i in range(3000)]
    df = spark.createDataFrame(rows, "g string, v string")
    r = hll_merge_audit(df, "g", "v").collect()[0]
    assert r["n_exact"] == 300
    assert r["merge_identical"] == 1
    assert r["direct_hll"] == r["merged_hll"]
    assert r["rel_error"] < 0.1  # linear-counting regime is tight


def test_changepoint_finds_planted_break(spark):
    from flashml_spark.operators.events import changepoint_single_split

    # 20 days at ~100, then 20 days at ~200 (small deterministic wiggle
    # so SSE is not degenerate)
    rows = []
    for i in range(40):
        base = 100.0 if i < 20 else 200.0
        rows.append((f"2024-01-{i + 1:02d}" if i < 31 else f"2024-02-{i - 30:02d}",
                     base + (i % 3)))
    df = spark.createDataFrame(rows, "d string, v double").select(
        F.col("d").cast("timestamp").alias("ts"), "v"
    )
    r = changepoint_single_split(df, "ts", "v").collect()[0]
    assert str(r["last_before_date"]) == "2024-01-20"
    assert r["n_before"] == 20 and r["n_after"] == 20
    # sum of i%3 over i=0..19 is 19 -> mean 100 + 19/20
    assert r["mean_before"] == pytest.approx(100.95, abs=0.01)
    assert r["mean_after"] == pytest.approx(201.0, abs=0.01)
    assert r["sse_reduction_pct"] > 99.0


def test_mann_kendall_directions(spark):
    from flashml_spark.operators.events import mann_kendall_test

    def series(vals):
        rows = [(f"2024-01-{i + 1:02d}", float(v)) for i, v in enumerate(vals)]
        return spark.createDataFrame(rows, "d string, v double").select(
            F.col("d").cast("timestamp").alias("ts"), "v"
        )

    up = mann_kendall_test(series(range(1, 21)), "ts", "v").collect()[0]
    n = 20
    assert up["s_stat"] == n * (n - 1) // 2  # every pair concordant
    assert up["trend"] == 1 and up["p"] < 0.001

    down = mann_kendall_test(series(range(20, 0, -1)), "ts", "v").collect()[0]
    assert down["s_stat"] == -n * (n - 1) // 2 and down["trend"] == -1

    flat = mann_kendall_test(series([7] * 20), "ts", "v").collect()[0]
    assert flat["s_stat"] == 0 and flat["trend"] == 0 and flat["p"] == 1.0
    # all-tied variance: n(n-1)(2n+5) == tie term -> var 0, z guarded to 0
    assert flat["var_s"] == 0.0


def test_count_min_never_underestimates_and_is_tight_for_heavy_hitters(spark):
    from flashml_spark.operators.sketches import count_min_audit

    # one dominant value + a long tail
    rows = [("hot",)] * 500 + [(f"tail{i}",) for i in range(2000)]
    df = spark.createDataFrame(rows, "v string")
    out = count_min_audit(df, "v", top_k=5).collect()
    assert out[0]["value"] == "hot" and out[0]["n_exact"] == 500
    for r in out:
        assert r["overestimate"] >= 0  # CMS never underestimates
    # E[error] <= N/w = 2500/1024 per row; min over 4 rows is tight
    assert out[0]["overestimate"] < 50


def test_hll_pairwise_jaccard_identical_and_disjoint_groups(spark):
    from flashml_spark.operators.sketches import hll_pairwise_jaccard

    rows = (
        [("a", f"t{i}") for i in range(400)]
        + [("b", f"t{i}") for i in range(400)]       # identical to a
        + [("c", f"other{i}") for i in range(400)]   # disjoint
    )
    df = spark.createDataFrame(rows, "g string, v string")
    out = {(r["group_a"], r["group_b"]): r for r in hll_pairwise_jaccard(
        df, "g", "v", top_k=10
    ).collect()}
    ab = out[("a", "b")]
    # identical sets: union registers == single registers -> est exactly 1
    assert ab["jaccard_est"] == 1.0 and ab["jaccard_exact"] == 1.0
    for pair in (("a", "c"), ("b", "c")):
        assert out[pair]["jaccard_exact"] == 0.0
        assert out[pair]["jaccard_est"] < 0.15  # sketch noise only
