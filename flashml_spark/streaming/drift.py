"""Streaming distribution-drift monitoring: windowed PSI against a
static baseline — the live twin of the batch PSI in
``flashml_spark/metrics/stability.py`` (reference parity:
``core/metrics`` PSI, SURVEY §2.11), run continuously over an event
stream instead of per-page batches.

Design constraint: append-mode streaming allows ONE stateful
aggregation, but PSI needs every bucket of a window at once.  Solution:
the bucket histogram is a CONDITIONAL-SUM PIVOT — B count columns in a
single windowed agg (same trick as the BM25 pivot) — and the PSI is
then a stateless projection over that one row, with the baseline
fractions baked in as literals (they are a tiny python list computed
batch-side).  One watermarked stateful op, incremental, no chained
aggregations.

PSI convention: ``Σ_b (p_b - q_b) · ln(p_b / q_b)`` with both fractions
floored at ``eps`` (the standard zero-guard), p = window, q = baseline.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["quantile_edges", "baseline_fractions", "windowed_psi", "batch_windowed_psi"]


def quantile_edges(baseline: DataFrame, value_col: str, buckets: int = 10) -> list[float]:
    """Equal-population bucket edges from the BASELINE's exact quantiles
    (one bounded agg; interior edges only — the outer buckets are
    open-ended so drifted mass beyond the baseline's range still lands
    somewhere)."""
    probs = [i / buckets for i in range(1, buckets)]
    row = baseline.agg(
        F.expr(
            f"percentile({value_col}, array({', '.join(str(p) for p in probs)}))"
        ).alias("qs")
    ).first()
    return [float(q) for q in row["qs"]]


def _bucket(value: Column, edges: list[float]) -> Column:
    """Bucket index 0..len(edges) by interior edges: b = |{e : e <= v}|."""
    b = F.lit(0)
    for e in edges:
        b = b + F.when(value >= F.lit(e), 1).otherwise(0)
    return b


def baseline_fractions(
    baseline: DataFrame, value_col: str, edges: list[float]
) -> list[float]:
    """Baseline bucket fractions q_b (len(edges)+1 values, batch-side —
    a |buckets|-row agg collected once)."""
    n_buckets = len(edges) + 1
    counts = (
        baseline.select(_bucket(F.col(value_col), edges).alias("b"))
        .groupBy("b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    total = sum(r["n"] for r in counts) or 1
    by_b = {r["b"]: r["n"] for r in counts}
    return [by_b.get(i, 0) / total for i in range(n_buckets)]


def _psi_from_windowed_counts(
    df: DataFrame,
    value_col: str,
    edges: list[float],
    fracs: list[float],
    window: str,
    ts_col: str,
    eps: float,
) -> DataFrame:
    """Shared body of the streaming operator and its batch twin: the
    bit-equal parity guarantee between them holds BECAUSE both route
    through this single set of bucket/count/PSI expressions.  NULL
    values are excluded before bucketing (a null satisfies no
    ``v >= edge`` test and would otherwise silently count as
    lowest-bucket mass — a burst of sensor nulls must not read as
    drift; standard PSI tracks nulls separately)."""
    v = F.col(value_col)
    b = _bucket(v, edges)
    n_buckets = len(edges) + 1
    conds = [
        F.sum(F.when(b == i, 1).otherwise(0)).cast("double").alias(f"__c{i}")
        for i in range(n_buckets)
    ]
    agg = (
        df.where(v.isNotNull())
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*conds)
    )
    count_cols = [F.col(f"__c{i}") for i in range(n_buckets)]
    n = sum(count_cols[1:], count_cols[0])
    terms = []
    for c, q in zip(count_cols, fracs):
        p = F.greatest(c / n, F.lit(eps))
        qc = F.lit(max(q, eps))
        terms.append((p - qc) * F.log(p / qc))
    return agg.select(
        F.col("w.start").alias("window_start"),
        n.cast("bigint").alias("n"),
        F.round(sum(terms[1:], terms[0]), 6).alias("psi"),
    )


def windowed_psi(
    stream: DataFrame,
    ts_col: str,
    value_col: str,
    edges: list[float],
    fracs: list[float],
    window: str = "1 day",
    watermark: str = "1 day",
    eps: float = 1e-6,
) -> DataFrame:
    """Per-window PSI of a streaming value column against the baseline
    fractions.  ONE watermarked windowed agg (B conditional counts),
    then a stateless PSI projection — append-mode safe, O(B) state per
    open window.  NULL values are excluded (see the shared body).
    Output: ``window_start, n, psi``."""
    return _psi_from_windowed_counts(
        stream.withWatermark(ts_col, watermark),
        value_col,
        edges,
        fracs,
        window,
        ts_col,
        eps,
    )


def batch_windowed_psi(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    edges: list[float],
    fracs: list[float],
    window: str = "1 day",
    eps: float = 1e-6,
) -> DataFrame:
    """Batch twin of :func:`windowed_psi` — literally the same bucket,
    count, and PSI expressions (shared helper), over a static frame,
    for parity tests and backfills."""
    return _psi_from_windowed_counts(
        df, value_col, edges, fracs, window, ts_col, eps
    )
