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


def _psi_projection(
    count_cols: list[Column], fracs: list[float], eps: float
) -> Column:
    n = sum(count_cols[1:], count_cols[0])
    terms = []
    for c, q in zip(count_cols, fracs):
        p = F.greatest(c / n, F.lit(eps))
        qc = F.lit(max(q, eps))
        terms.append((p - qc) * F.log(p / qc))
    return F.round(sum(terms[1:], terms[0]), 6)


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
    open window.  Output: ``window_start, n, psi``."""
    v = F.col(value_col)
    b = _bucket(v, edges)
    conds = [
        F.sum(F.when(b == i, 1).otherwise(0)).cast("double").alias(f"__c{i}")
        for i in range(len(edges) + 1)
    ]
    agg = (
        stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"))
        .agg(*conds)
    )
    count_cols = [F.col(f"__c{i}") for i in range(len(edges) + 1)]
    n = sum(count_cols[1:], count_cols[0])
    return agg.select(
        F.col("w.start").alias("window_start"),
        n.cast("bigint").alias("n"),
        _psi_projection(count_cols, fracs, eps).alias("psi"),
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
    """Batch twin of :func:`windowed_psi` — identical bucket edges,
    windowing, and PSI arithmetic over a static frame, for parity tests
    and backfills."""
    v = F.col(value_col)
    b = _bucket(v, edges)
    conds = [
        F.sum(F.when(b == i, 1).otherwise(0)).cast("double").alias(f"__c{i}")
        for i in range(len(edges) + 1)
    ]
    agg = df.groupBy(F.window(F.col(ts_col), window).alias("w")).agg(*conds)
    count_cols = [F.col(f"__c{i}") for i in range(len(edges) + 1)]
    n = sum(count_cols[1:], count_cols[0])
    return agg.select(
        F.col("w.start").alias("window_start"),
        n.cast("bigint").alias("n"),
        _psi_projection(count_cols, fracs, eps).alias("psi"),
    )
