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
