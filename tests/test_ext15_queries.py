"""Unit tests for the round-5 fourth-wave operators: join-key skew
audit, functional-dependency audit, EWMA anomaly detection, and the
Poisson-bootstrap CI.  Oracle parity runs via test_oracle_queries.py's
registry sweep; these pin hand-checkable semantics on tiny frames.
"""

from __future__ import annotations

import hashlib
import math

from pyspark.sql import functions as F

from flashml_spark.operators import events, relational, sampling
from flashml_spark.operators import textops as textops_mod

# --- join_key_skew_audit ----------------------------------------------------


def test_skew_audit_hand_counts(spark):
    rows = [("a",)] * 5 + [("b",)] * 3 + [("c",)] + [("d",)]
    df = spark.createDataFrame(rows, "k string")
    out = relational.join_key_skew_audit(df, "k", top_k=2).collect()
    assert [r["rank"] for r in out] == [1, 2]
    top = out[0]
    # 10 rows over 4 keys: mean 2.5 -> a has share 0.5, skew 2.0
    assert top["key"] == "a" and top["cnt"] == 5
    assert top["share"] == 0.5 and top["skew_ratio"] == 2.0
    assert out[1]["key"] == "b" and out[1]["skew_ratio"] == 1.2


def test_skew_audit_tie_breaks_by_key(spark):
    df = spark.createDataFrame([("z",), ("y",), ("x",)], "k string")
    out = relational.join_key_skew_audit(df, "k", top_k=3).collect()
    assert [r["key"] for r in out] == ["x", "y", "z"]  # equal counts


# --- functional_dependency_audit --------------------------------------------


def test_fd_audit_holds_and_violates(spark):
    df = spark.createDataFrame(
        [(1, "a", "p"), (1, "a", "q"), (2, "b", "p"), (3, "b", "p")],
        "k long, dep_ok string, dep_bad string",
    )
    out = {
        (r["det_col"], r["dep_col"]): r
        for r in relational.functional_dependency_audit(
            df, [("k", "dep_ok"), ("k", "dep_bad")]
        ).collect()
    }
    ok = out[("k", "dep_ok")]
    assert ok["n_keys"] == 3 and ok["n_violating"] == 0
    assert ok["violation_rate"] == 0.0
    bad = out[("k", "dep_bad")]
    # key 1 maps to {p, q} -> 1 of 3 keys violates
    assert bad["n_violating"] == 1
    assert bad["violation_rate"] == round(1 / 3, 6)


# --- ewma_anomaly -----------------------------------------------------------


def _ewma_expected(values, alpha, lags, t):
    """Python mirror of the operator's forecast for day index t (0-based):
    weighted mean of the prior `lags` values, weight (1-alpha)**(lag-1)."""
    prior = values[max(0, t - lags) : t]
    ws = sum(
        (1.0 - alpha) ** (t - j - 1) * v
        for j, v in enumerate(values[max(0, t - lags) : t], start=max(0, t - lags))
    )
    wt = sum((1.0 - alpha) ** (t - j - 1) for j in range(max(0, t - lags), t))
    return ws / wt, prior


def test_ewma_warmup_and_forecast(spark):
    vals = [100.0, 110.0, 90.0, 105.0, 95.0, 100.0, 102.0]
    rows = [(f"2024-01-{d + 1:02d}", v) for d, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = events.ewma_anomaly(df, "ts", "v", alpha=0.3, lags=30, min_lags=5).collect()
    assert len(out) == 7
    # first five days have < 5 predecessors -> warm-up
    for r in out[:5]:
        assert r["ewma"] is None and r["is_anomaly"] == 0
    for t in (5, 6):
        exp, prior = _ewma_expected(vals, 0.3, 30, t)
        assert abs(out[t]["ewma"] - exp) < 1e-6
        mean = sum(prior) / len(prior)
        sd = math.sqrt(sum((x - mean) ** 2 for x in prior) / (len(prior) - 1))
        assert abs(out[t]["sd"] - sd) < 1e-4
        assert out[t]["deviation"] == round(vals[t] - round(exp, 6), 6) or abs(
            out[t]["deviation"] - (vals[t] - exp)
        ) < 1e-5


def test_ewma_flags_a_spike(spark):
    vals = [100.0, 101.0, 99.0, 100.0, 101.0, 99.0, 100.0, 500.0]
    rows = [(f"2024-02-{d + 1:02d}", v) for d, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = events.ewma_anomaly(df, "ts", "v", alpha=0.3, lags=30, z=3.0).collect()
    assert out[-1]["is_anomaly"] == 1
    assert all(r["is_anomaly"] == 0 for r in out[:-1])


def test_ewma_gap_days_use_observed_lags_only(spark):
    # days are non-contiguous: lag distance counts OBSERVED days, so the
    # forecast still has 5 predecessors and fires
    rows = [(f"2024-03-{2 * d + 1:02d}", 100.0 + d) for d in range(6)]
    df = spark.createDataFrame(rows, "ts string, v double").select(
        F.col("ts").cast("timestamp").alias("ts"), "v"
    )
    out = events.ewma_anomaly(df, "ts", "v", alpha=0.3, lags=30).collect()
    assert out[-1]["ewma"] is not None


# --- poisson_bootstrap_ci ---------------------------------------------------


def _py_poisson_weight(doc_id: int, r: int) -> int:
    u = (
        int(hashlib.md5(f"{doc_id}:{r}".encode()).hexdigest()[:8], 16) + 1.0
    ) / 4294967296.0
    for k, c in enumerate(sampling.POISSON1_CDF):
        if u < c:
            return k
    return len(sampling.POISSON1_CDF)


def test_bootstrap_weights_match_python_mirror(spark):
    # reproduce the replicate-0 weighted mean by hand for 50 ids
    ids = list(range(1, 51))
    vals = {i: float(i * 10) for i in ids}
    df = spark.createDataFrame([(i, vals[i]) for i in ids], "id long, v double")
    out = sampling.poisson_bootstrap_ci(df, "v", "id", reps=1).collect()[0]
    w = {i: _py_poisson_weight(i, 0) for i in ids}
    exp = sum(w[i] * vals[i] for i in ids) / sum(w.values())
    assert abs(out["boot_mean"] - exp) < 1e-6
    assert out["n_rows"] == 50
    assert out["point_mean"] == round(sum(vals.values()) / 50, 6)


def test_bootstrap_constant_column_collapses_ci(spark):
    df = spark.createDataFrame([(i, 7.5) for i in range(200)], "id long, v double")
    out = sampling.poisson_bootstrap_ci(df, "v", "id", reps=16).collect()[0]
    assert out["boot_mean"] == 7.5 and out["boot_se"] == 0.0
    assert out["ci_lo"] == 7.5 and out["ci_hi"] == 7.5


def test_bootstrap_nulls_excluded(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (2, None), (3, 3.0)], "id long, v double"
    )
    out = sampling.poisson_bootstrap_ci(df, "v", "id", reps=4).collect()[0]
    assert out["n_rows"] == 2
    assert out["point_mean"] == 2.0


# --- z_value / write_zorder_layout -------------------------------------------


def test_z_value_interleaves_bits(spark):
    from flashml_spark.functions.zorder import z_value

    df = spark.createDataFrame(
        [(0b101, 0b011), (0, 0), (1, 0), (0, 1), (65535, 65535)],
        "a long, b long",
    )
    out = [
        r["z"]
        for r in df.select(
            z_value(F.col("a"), F.col("b"), bits=16).alias("z")
        ).collect()
    ]

    def py_z(a, b):
        z = 0
        for j in range(16):
            z |= ((a >> j) & 1) << (2 * j)
            z |= ((b >> j) & 1) << (2 * j + 1)
        return z

    assert out == [py_z(0b101, 0b011), 0, 1, 2, py_z(65535, 65535)]
    assert out[-1] == (1 << 32) - 1


def test_zorder_layout_clusters_both_dimensions(spark, tmp_path):
    import itertools

    from flashml_spark.sources.savepoint import write_zorder_layout

    # a 64x64 grid: every (x, y) pair once — perfectly uniform 2-D data
    grid = spark.createDataFrame(
        [(x, y) for x, y in itertools.product(range(64), range(64))],
        "x long, y long",
    )
    path = str(tmp_path / "zorder")
    write_zorder_layout(grid, "x", "y", path, n_files=16, bits=6)
    import glob as _g

    files = sorted(_g.glob(path + "/part-*.parquet"))
    assert len(files) >= 8
    import pyarrow.parquet as pq

    spans = []
    for f in files:
        t = pq.read_table(f)
        xs, ys = t.column("x").to_pylist(), t.column("y").to_pylist()
        spans.append((max(xs) - min(xs), max(ys) - min(ys)))
    mean_x = sum(s[0] for s in spans) / len(spans)
    mean_y = sum(s[1] for s in spans) / len(spans)
    # a 1-D sort on x would give y-span 63 in every file; z-order keeps
    # BOTH mean spans well under the global span of 63
    assert mean_x < 40 and mean_y < 40


# --- skyline_2d ---------------------------------------------------------------


def test_skyline_hand_frontier(spark):
    # points: (price, size).  Frontier: (1,1),(2,5),(4,9) — (3,5) is
    # dominated by (2,5) (same size, cheaper); (5,2) by (1,1)? no —
    # (1,1) is cheaper but smaller... (5,2) dominated by (2,5) (cheaper
    # AND larger).  (6,9) dominated by (4,9).
    df = spark.createDataFrame(
        [(1, 1.0, 1), (2, 2.0, 5), (3, 3.0, 5), (4, 4.0, 9),
         (5, 5.0, 2), (6, 6.0, 9)],
        "id long, price double, size long",
    )
    out = sorted(
        r["id"] for r in relational.skyline_2d(df, "price", "size").collect()
    )
    assert out == [1, 2, 4]


def test_skyline_keeps_exact_duplicates(spark):
    df = spark.createDataFrame(
        [(1, 1.0, 5), (2, 1.0, 5), (3, 2.0, 4)], "id long, price double, size long"
    )
    out = sorted(
        r["id"] for r in relational.skyline_2d(df, "price", "size").collect()
    )
    # the two (1.0, 5) twins are mutually non-dominating; (2.0, 4) loses
    assert out == [1, 2]


def test_skyline_matches_bruteforce_on_random_points(spark):
    import random

    rng = random.Random(7)
    pts = [(i, float(rng.randint(0, 20)), rng.randint(0, 20)) for i in range(120)]
    df = spark.createDataFrame(pts, "id long, price double, size long")
    got = sorted(
        r["id"] for r in relational.skyline_2d(df, "price", "size").collect()
    )

    def dominated(p):
        return any(
            q[1] <= p[1] and q[2] >= p[2] and (q[1] < p[1] or q[2] > p[2])
            for q in pts
        )

    exp = sorted(p[0] for p in pts if not dominated(p))
    assert got == exp


# --- markov_removal_attribution ----------------------------------------------


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )


def _mk_rows(seqs):
    """seqs: list of per-user event-type sequences."""
    rows = []
    eid = 0
    for u, seq in enumerate(seqs):
        for i, st in enumerate(seq):
            eid += 1
            rows.append((u, f"2024-01-01 00:{i:02d}:00", eid, st))
    return rows


def test_markov_attribution_single_channel_takes_all(spark):
    from datetime import datetime

    rows = [
        (u, datetime(2024, 1, 1, 0, i), u * 10 + i, st)
        for u, seq in enumerate([["a", "purchase"], ["a", "purchase"]])
        for i, st in enumerate(seq)
    ]
    df = _ev(spark, rows)
    out = {
        r["channel"]: r
        for r in events.markov_removal_attribution(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert set(out) == {"a"}
    assert out["a"]["p_conv_full"] == 1.0
    assert out["a"]["p_conv_removed"] == 0.0
    assert out["a"]["share"] == 1.0


def test_markov_attribution_closed_form_two_paths(spark):
    from datetime import datetime

    # 1 user converts via a, 1 user touches b and drops:
    # chain: START -> a (1/2) -> CONV; START -> b (1/2) -> DROP
    # p_full = 0.5; removing a -> 0; removing b -> still 0.5
    seqs = [["a", "purchase"], ["b"]]
    rows = [
        (u, datetime(2024, 1, 1, 0, i), u * 10 + i, st)
        for u, seq in enumerate(seqs)
        for i, st in enumerate(seq)
    ]
    df = _ev(spark, rows)
    out = {
        r["channel"]: r
        for r in events.markov_removal_attribution(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert out["a"]["p_conv_full"] == 0.5
    assert out["a"]["p_conv_removed"] == 0.0
    assert out["a"]["removal_effect"] == 1.0
    assert out["b"]["p_conv_removed"] == 0.5
    assert out["b"]["removal_effect"] == 0.0
    assert out["a"]["share"] == 1.0 and out["b"]["share"] == 0.0


def test_markov_transition_counts_journeys(spark):
    from datetime import datetime

    # one user: a -> purchase -> b (trailing drop journey)
    rows = [
        (1, datetime(2024, 1, 1, 0, 0), 1, "a"),
        (1, datetime(2024, 1, 1, 0, 1), 2, "purchase"),
        (1, datetime(2024, 1, 1, 0, 2), 3, "b"),
    ]
    df = _ev(spark, rows)
    out = {
        (r["state"], r["next_state"]): r["n"]
        for r in events.markov_transition_counts_with_bounds(
            df, "user_id", "ts", "event_id", "event_type", "purchase"
        ).collect()
    }
    assert out == {
        ("START", "a"): 1,
        ("a", "CONV"): 1,
        ("START", "b"): 1,
        ("b", "DROP"): 1,
    }


# --- mutual_information --------------------------------------------------------


def test_mutual_information_independent_and_identical(spark):
    import math

    # perfectly dependent: b == a -> MI = H(a), NMI = 1
    dep = spark.createDataFrame(
        [("x", "x")] * 2 + [("y", "y")] * 2, "a string, b string"
    )
    r = relational.mutual_information(dep, "a", "b").collect()[0]
    assert r["n"] == 4
    assert abs(r["mi"] - math.log(2)) < 1e-6
    assert r["nmi"] == 1.0

    # independent 2x2 with uniform margins -> MI = 0
    ind = spark.createDataFrame(
        [("x", "p"), ("x", "q"), ("y", "p"), ("y", "q")], "a string, b string"
    )
    r = relational.mutual_information(ind, "a", "b").collect()[0]
    assert r["mi"] == 0.0 and r["nmi"] == 0.0
    assert abs(r["h_a"] - math.log(2)) < 1e-6


def test_mutual_information_hand_2x2(spark):
    import math

    # joint counts: (x,p)=3 (x,q)=1 (y,p)=1 (y,q)=3, N=8
    rows = [("x", "p")] * 3 + [("x", "q")] + [("y", "p")] + [("y", "q")] * 3
    df = spark.createDataFrame(rows, "a string, b string")
    r = relational.mutual_information(df, "a", "b").collect()[0]
    exp = sum(
        (nab / 8) * math.log(nab * 8 / (4 * 4)) for nab in (3, 1, 1, 3)
    )
    assert abs(r["mi"] - exp) < 1e-6


# --- loglog_elasticity ----------------------------------------------------------


def test_elasticity_recovers_exact_powerlaw(spark):
    # y = 100 * x^(-2) exactly -> slope -2, intercept ln(100)
    import math

    rows = [("g", float(x), 100.0 * x**-2.0) for x in range(1, 21)]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    r = relational.loglog_elasticity(df, "g", "x", "y", min_n=5).collect()[0]
    assert abs(r["slope"] - (-2.0)) < 1e-6
    assert abs(r["intercept"] - math.log(100)) < 1e-6
    assert r["n"] == 20


def test_elasticity_filters_and_min_n(spark):
    rows = [("g", 1.0, 0.0), ("g", -1.0, 2.0)] + [
        ("h", float(x), float(x)) for x in range(1, 12)
    ]
    df = spark.createDataFrame(rows, "g string, x double, y double")
    out = {r["g"]: r for r in relational.loglog_elasticity(df, "g", "x", "y").collect()}
    # g has 0 usable rows (nonpositive x/y) -> suppressed entirely
    assert list(out) == ["h"]
    assert out["h"]["slope"] == 1.0


# --- token_budget_curve --------------------------------------------------------


def test_token_budget_curve_hand_counts(spark):
    from flashml_spark.operators import textops

    df = spark.createDataFrame(
        [("a b c",), ("a b c d e",), (None,)], "text string"
    )
    out = {
        r["budget"]: r
        for r in textops.token_budget_curve(df, "text", [4, 10]).collect()
    }
    b4 = out[4]
    assert b4["n_docs"] == 2 and b4["tokens_total"] == 8
    assert b4["n_truncated"] == 1  # the 5-token doc
    assert b4["tokens_retained"] == 3 + 4
    assert b4["retention"] == round(7 / 8, 6)
    b10 = out[10]
    assert b10["n_truncated"] == 0 and b10["retention"] == 1.0


# --- two_proportion_ztest -------------------------------------------------------


def test_ztest_hand_counts_and_significance(spark):
    import math

    # variant 0: 4 users, 1 converts; variant 1: 4 users, 3 convert
    rows = []
    for u in range(8):
        rows.append((u, "view"))
    for u in (0, 1, 3, 5):  # conversions: u0 (v0); u1, u3, u5 (v1)
        rows.append((u, "purchase"))
    df = spark.createDataFrame(rows, "user_id long, event_type string")
    out = events.two_proportion_ztest(
        df,
        "user_id",
        (F.col("user_id") % 2).cast("int"),
        F.col("event_type") == "purchase",
    ).collect()[0]
    assert (out["n_a"], out["conv_a"]) == (4, 1)
    assert (out["n_b"], out["conv_b"]) == (4, 3)
    pa, pb, pp = 0.25, 0.75, 0.5
    se = math.sqrt(pp * (1 - pp) * (1 / 4 + 1 / 4))
    assert abs(out["z"] - (pa - pb) / se) < 1e-6
    assert out["significant"] == 0  # |z| ~ 1.414 < 1.96


# --- logrank_test ---------------------------------------------------------------


def test_logrank_identical_groups_is_zero(spark):
    from datetime import datetime

    # two identical cohorts: every lifetime appears once per group ->
    # O = E in every stratum -> chi2 == 0
    rows = []
    for g in range(2):
        for u, life in enumerate([1, 2, 3]):
            uid = 10 * u + g  # parity = g
            rows.append((uid, datetime(2024, 1, 1)))
            rows.append((uid, datetime(2024, 1, 1 + life)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = events.logrank_test(
        df, "user_id", "ts", (F.col("user_id") % 2).cast("int")
    ).collect()[0]
    assert out["chi2"] == 0.0
    assert out["e1"] == out["o1"] and out["e2"] == out["o2"]


def test_logrank_textbook_hand_computation(spark):
    from datetime import datetime

    # group 0 lifetimes: 1, 2 (both deaths); group 1 lifetimes: 3, 4
    # where 4 = corpus max -> censored.  Hand Mantel-Haenszel:
    # t=1: d=1 (g0), n1=2 n2=2 -> e1 += 1*2/4 = .5, v += (2/4)(2/4)(3/3) = .25
    # t=2: d=1 (g0), n1=1 n2=2 -> e1 += 1/3,  v += (1/3)(2/3)(2/2) = 2/9
    # t=3: d=1 (g1), n1=0 n2=2 -> e1 += 0,    v += 0
    # (t=4 censored only -> no stratum)
    rows = []
    for uid, life in ((0, 1), (2, 2), (1, 3), (3, 4)):
        rows.append((uid, datetime(2024, 3, 1)))
        rows.append((uid, datetime(2024, 3, 1 + life)))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = events.logrank_test(
        df, "user_id", "ts", (F.col("user_id") % 2).cast("int")
    ).collect()[0]
    e1 = 0.5 + 1 / 3
    v = 0.25 + 2 / 9
    assert out["o1"] == 2 and out["o2"] == 1
    assert abs(out["e1"] - e1) < 1e-6
    assert abs(out["chi2"] - (2 - e1) ** 2 / v) < 1e-5


# --- table_digest ----------------------------------------------------------------


def test_table_digest_is_order_and_partition_independent(spark):
    rows = [(i, f"v{i % 3}") for i in range(40)]
    a = spark.createDataFrame(rows, "id long, v string").repartition(8)
    b = spark.createDataFrame(list(reversed(rows)), "id long, v string").coalesce(1)
    da = relational.table_digest(a).collect()[0]
    db = relational.table_digest(b).collect()[0]
    assert da["digest"] == db["digest"] and da["n_rows"] == db["n_rows"] == 40


def test_table_digest_detects_single_row_change(spark):
    rows = [(i, "x") for i in range(20)]
    a = spark.createDataFrame(rows, "id long, v string")
    changed = rows[:10] + [(10, "y")] + rows[11:]
    b = spark.createDataFrame(changed, "id long, v string")
    assert (
        relational.table_digest(a).collect()[0]["digest"]
        != relational.table_digest(b).collect()[0]["digest"]
    )


def test_table_digest_null_vs_literal_sentinel(spark):
    a = spark.createDataFrame([(1, None)], "id long, v string")
    b = spark.createDataFrame([(1, "__NULL__")], "id long, v string")
    # documented collision: NULL canonicalizes to the sentinel string
    assert (
        relational.table_digest(a).collect()[0]["digest"]
        == relational.table_digest(b).collect()[0]["digest"]
    )


def test_table_digest_matches_python_mirror(spark):
    import hashlib

    rows = [(1, "a"), (2, "b")]
    df = spark.createDataFrame(rows, "id long, v string")
    got = relational.table_digest(df).collect()[0]["digest"]
    exp = sum(
        int(hashlib.md5(f"id={i}|v={v}".encode()).hexdigest()[:12], 16)
        for i, v in rows
    ) % (2**63)
    assert got == exp


# --- weighted_median_per_group ----------------------------------------------------


def test_weighted_median_hand_cases(spark):
    df = spark.createDataFrame(
        [("g", 1.0, 1.0), ("g", 2.0, 1.0), ("g", 3.0, 10.0),
         ("h", 5.0, 1.0), ("h", 7.0, 1.0)],
        "g string, v double, w double",
    )
    out = {
        r["g"]: r["weighted_median"]
        for r in relational.weighted_median_per_group(df, "g", "v", "w").collect()
    }
    assert out["g"] == 3.0  # the heavy row owns the median
    assert out["h"] == 5.0  # even split -> lower median


def test_weighted_median_merges_duplicate_values(spark):
    # two (v=2) rows each weight 2 must act as one weight-4 cell
    df = spark.createDataFrame(
        [("g", 1.0, 3.0), ("g", 2.0, 2.0), ("g", 2.0, 2.0)],
        "g string, v double, w double",
    )
    out = relational.weighted_median_per_group(df, "g", "v", "w").collect()
    assert out[0]["weighted_median"] == 2.0


# --- compression_ratio_score -------------------------------------------------------


def test_compression_ratio_matches_zlib_mirror(spark):
    import zlib

    rows = [
        (1, "a" * 400),                       # repetitive -> tiny ratio
        (2, "The quick brown fox jumps over the lazy dog. " * 5),
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in textops_mod.compression_ratio_score(df, "text", "doc_id").collect()
    }
    assert set(out) == {1, 2}  # NULL and empty drop out
    for i in (1, 2):
        raw = rows[i - 1][1].encode()
        assert out[i]["raw_bytes"] == len(raw)
        assert out[i]["comp_bytes"] == len(zlib.compress(raw, 6))
        assert out[i]["ratio"] == round(len(zlib.compress(raw, 6)) / len(raw), 6)
    assert out[1]["ratio"] < out[2]["ratio"]  # repetition compresses harder


def test_compression_ratio_audit_single_pass_accounting(spark):
    # r9 verdict item 6: the audit emits fixture pins AND the corpus
    # accounting from ONE mapInPandas pass.  Fixture rows keep their
    # exact zlib numbers; the corpus row sums per-batch partials
    # (forced here across partitions so >=2 partials must merge);
    # NULL/empty docs drop from both; exactly one mapInPandas appears
    # in the plan.
    import zlib

    rows = [
        ("fx:runs", "a" * 100),
        (None, "hello world " * 4),
        (None, "the corpus doc two"),
        (None, None),
        (None, ""),
    ]
    df = spark.createDataFrame(rows, "key string, text string").repartition(3)
    out = {
        r["key"]: r
        for r in textops_mod.compression_ratio_audit(df, "text", "key").collect()
    }
    assert set(out) == {"fx:runs", "corpus"}
    raw = ("a" * 100).encode()
    assert out["fx:runs"]["n_docs"] == 1
    assert out["fx:runs"]["raw_bytes"] == len(raw)
    assert out["fx:runs"]["comp_bytes"] == len(zlib.compress(raw, 6))
    corpus = out["corpus"]
    assert corpus["n_docs"] == 2
    assert corpus["raw_bytes"] == len(b"hello world " * 4) + len(
        b"the corpus doc two"
    )
    assert corpus["comp_bytes"] is None and corpus["ratio"] is None

    plan = textops_mod.compression_ratio_audit(
        df, "text", "key"
    )._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInPandas") == 1


# --- densify_daily ---------------------------------------------------------------


def test_densify_fills_gaps_with_zero_rows(spark):
    from datetime import datetime

    rows = [
        (datetime(2024, 1, 1, 5), 10.0),
        (datetime(2024, 1, 1, 9), 5.0),
        (datetime(2024, 1, 4, 0), 2.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, value double")
    out = {str(r["d"]): r for r in events.densify_daily(df, "ts", "value").collect()}
    assert len(out) == 4  # Jan 1-4 inclusive
    assert out["2024-01-01"]["n"] == 2 and out["2024-01-01"]["total"] == 15.0
    assert out["2024-01-02"]["n"] == 0 and out["2024-01-02"]["is_gap"] == 1
    assert out["2024-01-03"]["is_gap"] == 1
    assert out["2024-01-04"]["total"] == 2.0 and out["2024-01-04"]["is_gap"] == 0


# --- exact_quantiles_per_group ------------------------------------------------------


def test_exact_quantiles_hand_cases(spark):
    df = spark.createDataFrame(
        [("g", float(v)) for v in range(1, 11)], "g string, v double"
    )
    out = {
        r["q"]: r["value"]
        for r in relational.exact_quantiles_per_group(
            df, "g", "v", [0.25, 0.5, 0.75, 1.0]
        ).collect()
    }
    # lower quantile: smallest v with cum-count >= ceil(q*10)
    assert out[0.25] == 3.0 and out[0.5] == 5.0
    assert out[0.75] == 8.0 and out[1.0] == 10.0


def test_exact_quantiles_duplicate_values_merge(spark):
    df = spark.createDataFrame(
        [("g", 1.0)] * 9 + [("g", 100.0)], "g string, v double"
    )
    out = {
        r["q"]: r["value"]
        for r in relational.exact_quantiles_per_group(
            df, "g", "v", [0.5, 0.9, 1.0]
        ).collect()
    }
    assert out[0.5] == 1.0 and out[0.9] == 1.0 and out[1.0] == 100.0


# --- chao1_vocab_estimate -----------------------------------------------------------


def test_chao1_hand_counts(spark):
    # tokens: a a b c  -> V=3, f1={b,c}=2, f2={a}? a appears twice -> f2=1
    df = spark.createDataFrame([("a a b c",)], "text string")
    out = textops_mod.chao1_vocab_estimate(df, "text").collect()[0]
    assert out["v_obs"] == 3 and out["f1"] == 2 and out["f2"] == 1
    assert out["chao1"] == 3 + 4 / 2
    assert out["chao1_bc"] == round(3 + 2 * 1 / (2 * 2), 6)


def test_chao1_no_doubletons_uses_bias_corrected(spark):
    df = spark.createDataFrame([("x y z",)], "text string")
    out = textops_mod.chao1_vocab_estimate(df, "text").collect()[0]
    assert out["f2"] == 0 and out["chao1"] is None
    assert out["chao1_bc"] == 3 + round(3 * 2 / 2, 6)


# --- theil_sen_trend --------------------------------------------------------------


def test_theil_sen_recovers_slope_despite_outlier(spark):
    from datetime import datetime

    # y = 10*t except day 5 is a wild outlier; median slope stays 10
    rows = []
    for t in range(8):
        v = 10.0 * t if t != 5 else 10000.0
        rows.append((datetime(2024, 1, 1 + t), v))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = events.theil_sen_trend(df, "ts", "v").collect()[0]
    assert out["n_days"] == 8 and out["n_pairs"] == 28
    assert out["slope_per_day"] == 10.0


def test_theil_sen_driver_matches_distributed(spark):
    """The bounded driver solve must reproduce the distributed pipeline
    bit-for-bit: duplicate slope values, a -0.0-producing pair, uneven
    day gaps, and both even and odd pair counts."""
    from datetime import datetime

    import random as _random

    rng = _random.Random(7)
    day, rows = 0, []
    for _ in range(23):
        day += rng.randint(1, 9)  # uneven gaps
        v = rng.choice([0.0, 1.5, -2.25, 7.0, 7.0])  # forced slope ties
        rows.append((datetime(2023, 1, 1 + day % 27, day // 27 + 1), v))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    fast = events.theil_sen_trend(df, "ts", "v").collect()
    slow = events.theil_sen_trend(
        df, "ts", "v", driver_days_budget=0
    ).collect()
    assert [r.asDict() for r in fast] == [r.asDict() for r in slow]
    # sub-budget edge cases: single day, empty frame, an all-NULL day
    # (NULL daily sum -> NULL slopes: cumsum counts them first, min
    # skips them), and an ALL-NULL frame (slope must be NULL)
    one = spark.createDataFrame(
        [(datetime(2024, 3, 1), 4.0)], "ts timestamp, v double"
    )
    empty = spark.createDataFrame([], "ts timestamp, v double")
    null_day = spark.createDataFrame(
        [
            (datetime(2024, 1, 1), None),
            (datetime(2024, 1, 2), 0.0),
            (datetime(2024, 1, 5), 10.0),
        ],
        "ts timestamp, v double",
    )
    all_null = spark.createDataFrame(
        [(datetime(2024, 1, 1), None), (datetime(2024, 1, 3), None)],
        "ts timestamp, v double",
    )
    for d in (one, empty, null_day, all_null):
        fast = events.theil_sen_trend(d, "ts", "v").collect()
        slow = events.theil_sen_trend(
            d, "ts", "v", driver_days_budget=0
        ).collect()
        assert [r.asDict() for r in fast] == [r.asDict() for r in slow]


def test_theil_sen_aggregates_within_day_first(spark):
    from datetime import datetime

    # two rows on day 0 sum to 0; day 1 is 5 -> slope 5
    rows = [
        (datetime(2024, 2, 1, 1), 3.0),
        (datetime(2024, 2, 1, 2), -3.0),
        (datetime(2024, 2, 2, 1), 5.0),
    ]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = events.theil_sen_trend(df, "ts", "v").collect()[0]
    assert out["n_days"] == 2 and out["n_pairs"] == 1
    assert out["slope_per_day"] == 5.0


# --- dedup_savings_report -----------------------------------------------------------


def test_dedup_savings_hand_tiers(spark):
    from flashml_spark.operators import dedup as dedup_mod

    rows = [
        (1, "hello world"),        # keeper (exact group A)
        (2, "hello world"),        # exact dup of 1 (11 chars saved)
        (3, "Hello   World"),      # tier-2 dup of 1 after norm (13 chars)
        (4, "unique text"),        # survives both tiers
        (5, None),                 # dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_mod.dedup_savings_report(df, "text", "doc_id").collect()[0]
    assert out["n_docs"] == 4
    assert out["total_chars"] == 11 + 11 + 13 + 11
    assert out["exact_dupes"] == 1 and out["exact_chars_saved"] == 11
    assert out["norm_dupes"] == 1 and out["norm_chars_saved"] == 13
    assert out["pct_rows_saved"] == 0.5
    assert out["pct_chars_saved"] == round(24 / 46, 6)


def test_dedup_savings_norm_keeper_is_min_id(spark):
    from flashml_spark.operators import dedup as dedup_mod

    # norm group where the min-id keeper is the LONGER variant: saved
    # chars must be the group sum minus the KEEPER's length, not max/min
    rows = [(1, "a   b"), (2, "a b")]  # both normalize to "a b"
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = dedup_mod.dedup_savings_report(df, "text", "doc_id").collect()[0]
    assert out["norm_dupes"] == 1
    assert out["norm_chars_saved"] == 3  # 5 + 3 - keeper(5)


# --- time_weighted_average ----------------------------------------------------------


def test_twap_duration_weighting(spark):
    from datetime import datetime

    # v=10 held 10s, v=100 held 90s, final obs opens no interval
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, 10.0),
        (1, datetime(2024, 1, 1, 0, 0, 10), 2, 100.0),
        (1, datetime(2024, 1, 1, 0, 1, 40), 3, 7.0),
        (2, datetime(2024, 1, 1), 4, 5.0),  # single event -> drops out
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long, value double")
    out = {r["user_id"]: r for r in events.time_weighted_average(
        df, "user_id", "ts", "event_id", "value").collect()}
    assert list(out) == [1]
    r = out[1]
    assert r["n_intervals"] == 2 and r["span_seconds"] == 100.0
    assert r["twap"] == round((10 * 10 + 100 * 90) / 100, 6)
    assert r["plain_avg"] == 55.0  # unweighted over the same 2 rows


# --- running_peak_drawdown ----------------------------------------------------------


def test_drawdown_hand_series(spark):
    from datetime import datetime

    # cum: 10, 30, 15, 25 -> peak path 10, 30, 30, 30 -> max drawdown 15
    vals = [10.0, 20.0, -15.0, 10.0]
    rows = [(1, datetime(2024, 1, 1 + i), i, v) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, id long, v double")
    out = events.running_peak_drawdown(df, "k", "ts", "id", "v").collect()[0]
    assert out["n"] == 4
    assert out["final_total"] == 25.0
    assert out["peak"] == 30.0
    assert out["max_drawdown"] == 15.0


def test_drawdown_monotonic_series_is_zero(spark):
    from datetime import datetime

    rows = [(1, datetime(2024, 2, 1 + i), i, 5.0) for i in range(4)]
    df = spark.createDataFrame(rows, "k long, ts timestamp, id long, v double")
    out = events.running_peak_drawdown(df, "k", "ts", "id", "v").collect()[0]
    assert out["max_drawdown"] == 0.0 and out["peak"] == 20.0


# --- ltv_curve -----------------------------------------------------------------------


def test_ltv_curve_fixed_denominator(spark):
    from datetime import datetime

    # u1: 10 on day0, 20 on day1; u2: 30 on day0 only.
    rows = [
        (1, datetime(2024, 1, 1), 10.0),
        (1, datetime(2024, 1, 2), 20.0),
        (2, datetime(2024, 1, 5), 30.0),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    out = {r["day_offset"]: r for r in events.ltv_curve(
        df, "user_id", "ts", "value").collect()}
    assert out[0]["n_users_active"] == 2
    assert out[0]["cum_revenue_per_user"] == 20.0  # (10+30)/2
    # day 1 adds u1's 20 but the denominator stays 2 (no survivorship)
    assert out[1]["n_users_active"] == 1
    assert out[1]["cum_revenue_per_user"] == 30.0  # (10+30+20)/2


# --- weekday_adjusted_anomaly ---------------------------------------------------------


def test_weekday_anomaly_flags_only_the_break(spark):
    from datetime import datetime, timedelta

    # 6 Mondays at ~100, one Monday at 1000; other weekdays stable.
    rows = []
    base = datetime(2024, 1, 1)  # a Monday
    for week in range(7):
        for dow in range(7):
            d = base + timedelta(days=7 * week + dow)
            v = 100.0 + dow + week * 0.5  # distinct per week -> nonzero MAD
            if week == 3 and dow == 0:
                v = 1000.0
            rows.append((d, v))
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = events.weekday_adjusted_anomaly(df, "ts", "v", k=5.0).collect()
    flagged = [r for r in out if r["is_anomaly"] == 1]
    assert len(flagged) == 1
    assert str(flagged[0]["d"]) == "2024-01-22" and flagged[0]["weekday"] == 1


def test_x210_registered_and_shaped(spark):
    # composition query: shape + quantile-key sanity at the smoke scale
    from flashml_spark.queries import QUERIES

    fn, oracle = QUERIES["x210_ship_latency_bands"]
    out = fn(spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert {r["q"] for r in rows} <= {0.25, 0.5, 0.75, 0.95}
    # synthetic shipdates are not TPC-H-strict (can precede the order
    # date) — assert quantile monotonicity per priority instead of sign
    by_g = {}
    for r in rows:
        by_g.setdefault(r["o_orderpriority"], []).append((r["q"], r["value"]))
    for pairs in by_g.values():
        vals = [v for _, v in sorted(pairs)]
        assert vals == sorted(vals)
    assert oracle is not None


# --- funnel_stage_latencies -----------------------------------------------------------


def test_funnel_latencies_hand_session(spark):
    from datetime import datetime

    # one session: view at t0, click +10s, purchase +40s
    rows = [
        (1, datetime(2024, 1, 1, 0, 0, 0), 1, "view"),
        (1, datetime(2024, 1, 1, 0, 0, 10), 2, "click"),
        (1, datetime(2024, 1, 1, 0, 0, 50), 3, "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = {
        (r["stage"], r["q"]): r["value"]
        for r in events.funnel_stage_latencies(df, quantiles=[0.5]).collect()
    }
    assert out[("view->click", 0.5)] == 10_000_000
    assert out[("click->purchase", 0.5)] == 40_000_000


def test_funnel_latencies_skip_out_of_order_and_partial(spark):
    from datetime import datetime

    rows = [
        # click BEFORE view in the same session -> negative, excluded
        (1, datetime(2024, 2, 1, 0, 0, 0), 1, "click"),
        (1, datetime(2024, 2, 1, 0, 0, 5), 2, "view"),
        # view only, no click -> contributes nothing
        (2, datetime(2024, 2, 1), 3, "view"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, event_type string"
    )
    out = events.funnel_stage_latencies(df, quantiles=[0.5]).collect()
    assert out == []


# --- pareto_concentration --------------------------------------------------------------


def test_pareto_hand_distribution(spark):
    # values: 50, 30, 10, 10 -> total 100; 80% needs 50+30 -> 2 keys
    df = spark.createDataFrame(
        [(1, 50.0), (2, 30.0), (3, 10.0), (4, 10.0)], "k long, v double"
    )
    out = events.pareto_concentration(df, "k", "v", threshold=0.8).collect()[0]
    assert out["n_keys"] == 4 and out["total_value"] == 100.0
    assert out["n_top"] == 2 and out["pct_keys"] == 0.5


def test_pareto_boundary_row_included(spark):
    # exact boundary: 40+40 = 80 = 0.8*100 exactly -> the row REACHING
    # the threshold is counted, the next is not
    df = spark.createDataFrame(
        [(1, 40.0), (2, 40.0), (3, 20.0)], "k long, v double"
    )
    out = events.pareto_concentration(df, "k", "v", threshold=0.8).collect()[0]
    assert out["n_top"] == 2


# --- order_total_consistency_audit -------------------------------------------------------


def test_order_total_audit_hand_cases(spark):
    orders = spark.createDataFrame(
        [(1, 110.0), (2, 999.0)], "o_orderkey long, o_totalprice double"
    )
    li = spark.createDataFrame(
        [
            (1, 100.0, 0.0, 0.10),   # 100*1.1 = 110 -> matches
            (2, 100.0, 0.10, 0.0),   # 90 vs stored 999 -> mismatch
        ],
        "l_orderkey long, l_extendedprice double, l_discount double, l_tax double",
    )
    out = relational.order_total_consistency_audit(orders, li).collect()[0]
    assert out["n_orders"] == 2
    assert out["n_matched"] == 1 and out["n_mismatched"] == 1
    assert out["match_rate"] == 0.5
    assert out["max_abs_err"] == 909.0


# --- cross_source_duplication --------------------------------------------------------------


def test_cross_source_duplication_matrix(spark):
    from flashml_spark.operators import dedup as dedup_mod

    rows = [
        (1, "shared one", "a"),
        (2, "shared one", "b"),      # a<->b share 1
        (3, "shared two", "a"),
        (4, "shared two", "c"),      # a<->c share 1
        (5, "only a", "a"),
        (6, "shared one", "a"),      # within-source dup: distinct digests only
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        (r["source_a"], r["source_b"]): r
        for r in dedup_mod.cross_source_duplication(
            df, "text", "doc_id", "source"
        ).collect()
    }
    ab = out[("a", "b")]
    assert ab["n_shared"] == 1
    # a has 3 distinct digests, b has 1
    assert ab["share_of_a"] == round(1 / 3, 6) and ab["share_of_b"] == 1.0
    assert out[("a", "c")]["n_shared"] == 1
    assert ("b", "c") not in out


# --- ab_ztest_curve -------------------------------------------------------------------------


def test_ab_zcurve_cumulates_and_matches_final_ztest(spark):
    import math
    from datetime import datetime

    # day 1: u0(v0) enters+converts, u1(v1) enters; day 2: u2(v0), u3(v1)
    # enter, u1 converts
    rows = [
        (0, datetime(2024, 1, 1, 9), "purchase"),
        (1, datetime(2024, 1, 1, 10), "view"),
        (2, datetime(2024, 1, 2, 9), "view"),
        (3, datetime(2024, 1, 2, 10), "view"),
        (1, datetime(2024, 1, 2, 11), "purchase"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {str(r["d"]): r for r in events.ab_ztest_curve(
        df, "user_id", "ts",
        (F.col("user_id") % 2).cast("int"),
        F.col("event_type") == "purchase").collect()}
    d1, d2 = out["2024-01-01"], out["2024-01-02"]
    assert (d1["n_a"], d1["conv_a"], d1["n_b"], d1["conv_b"]) == (1, 1, 1, 0)
    assert (d2["n_a"], d2["conv_a"], d2["n_b"], d2["conv_b"]) == (2, 1, 2, 1)
    # day 2 rates equal -> z = 0
    assert d2["z"] == 0.0
    # day 1: pa=1, pb=0, pp=.5 -> z = 1/sqrt(.25*2) = sqrt(2)
    assert abs(d1["z"] - math.sqrt(2)) < 1e-6


# --- histogram_2d ----------------------------------------------------------------------------


def test_histogram_2d_hand_grid(spark):
    rows = [(0.0, 0.0), (9.99, 9.99), (10.0, 10.0), (5.0, 0.0)]
    df = spark.createDataFrame(rows, "x double, y double")
    out = {(r["bx"], r["by"]): r for r in
           relational.histogram_2d(df, "x", "y", bins=10).collect()}
    assert out[(0, 0)]["n"] == 1 and out[(0, 0)]["x_lo"] == 0.0
    assert out[(9, 9)]["n"] == 2  # 9.99 and the folded max 10.0
    assert out[(5, 0)]["n"] == 1 and out[(5, 0)]["x_lo"] == 5.0


def test_histogram_2d_constant_axis_folds_to_zero(spark):
    df = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "x double, y double")
    out = relational.histogram_2d(df, "x", "y", bins=10).collect()
    assert all(r["by"] == 0 for r in out)
    assert sum(r["n"] for r in out) == 2


# --- pairwise_distance_profile -----------------------------------------------------------------


def test_distance_profile_identical_and_orthogonal(spark):
    from flashml_spark.operators import similarity as sim

    # ids 1..4: v1 == v2 (cos 1 at stride 1), v3 orthogonal to v4
    rows = [
        (1, [1.0, 0.0]),
        (2, [1.0, 0.0]),
        (3, [0.0, 1.0]),
        (4, [1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = sim.pairwise_distance_profile(
        df, "embedding", "vec_id", strides=(1,), bins=20
    ).collect()
    got = {r["bin"]: r["n"] for r in out}
    # cos=1 -> bin folds to 19; cos=0 -> bin 10
    assert got[19] == 1      # (1,2)
    assert got[10] == 2      # (2,3) and (3,4) both orthogonal
    for r in out:
        assert r["cos_lo"] == round(r["bin"] * 2.0 / 20 - 1.0, 6)


# --- duplication_by_length -----------------------------------------------------------------------


def test_dup_rate_by_length_bins(spark):
    from flashml_spark.operators import dedup as dedup_mod

    rows = [
        (1, "abcd"),     # len 4 -> bin 2, unique
        (2, "efgh"),     # len 4 -> bin 2, dup pair with 3
        (3, "efgh"),
        (4, "a" * 100),  # len 100 -> bin 6, unique
        (5, ""),         # dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["len_bin"]: r for r in dedup_mod.duplication_by_length(
        df, "text", "doc_id").collect()}
    b2 = out[2]
    assert b2["n_docs"] == 3 and b2["n_dup_docs"] == 2
    assert b2["dup_rate"] == round(2 / 3, 6) and b2["chars_lo"] == 4
    assert out[6]["n_dup_docs"] == 0 and out[6]["chars_lo"] == 64
