"""Numerical binning operators (SURVEY §2.7, ``FeatureGenerationEngine.scala:279-332``).

Three modes, all ±∞-padded like the reference:
  * equidistant — N equal-width intervals from min/max
  * equiarea    — N quantile buckets
  * intervals   — user-supplied split points

Bucket assignment is a pure column expression (no ml.Bucketizer dependency in
the hot path) so it stays inside whole-stage codegen and is SQL-checkable;
semantics match Spark's Bucketizer: [lo, hi) buckets, last bucket closed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucket_expr(col: Column, splits: list[float]) -> Column:
    """CASE-chain bucket assignment over inner split points (±∞ implied).

    splits are the INNER boundaries: value < splits[0] → 0, < splits[1] → 1,
    …, else len(splits).  Matches Bucketizer's left-closed intervals.
    """
    expr = F.lit(len(splits))
    # build from the last condition backwards so earlier splits win
    for i in range(len(splits) - 1, -1, -1):
        expr = F.when(col < F.lit(splits[i]), F.lit(i)).otherwise(expr)
    return expr.cast("int")


def bin_intervals(df: DataFrame, col: str, splits: list[float], out_col: str | None = None) -> DataFrame:
    """User-supplied interval binning (``FeatureGenerationEngine.scala:320-332``)."""
    out_col = out_col or f"{col}_binned"
    return df.withColumn(out_col, bucket_expr(F.col(col), splits))


def equidistant_splits(df: DataFrame, col: str, n: int) -> list[float]:
    """Inner split points for N equal-width bins from global min/max
    (``FeatureGenerationEngine.scala:279-308``).  One tiny agg, no collect of
    data rows."""
    row = df.agg(F.min(col).alias("mn"), F.max(col).alias("mx")).first()
    mn, mx = float(row["mn"]), float(row["mx"])
    width = (mx - mn) / n
    return [mn + i * width for i in range(1, n)]


def bin_equidistant(df: DataFrame, col: str, n: int, out_col: str | None = None) -> DataFrame:
    return bin_intervals(df, col, equidistant_splits(df, col, n), out_col)


def exact_quantile_splits(df: DataFrame, col: str, n: int) -> list[float]:
    """Exact linear-interpolated quantile split points (SQL ``percentile``,
    same interpolation as ANSI ``percentile_cont``).  One full-sort agg —
    use only when cross-engine bit-equality matters; ``bin_equiarea``'s
    GK sketch is the 100 TB path."""
    qs = ", ".join(str(i / n) for i in range(1, n))
    row = df.agg(F.expr(f"percentile({col}, array({qs}))").alias("qs")).first()
    uniq: list[float] = []
    for s in row["qs"]:
        if not uniq or s > uniq[-1]:
            uniq.append(float(s))
    return uniq


def bin_equiarea_exact(df: DataFrame, col: str, n: int, out_col: str | None = None) -> DataFrame:
    return bin_intervals(df, col, exact_quantile_splits(df, col, n), out_col)


def bin_equiarea(df: DataFrame, col: str, n: int, out_col: str | None = None,
                 relative_error: float = 1e-4) -> DataFrame:
    """N quantile buckets (``FeatureGenerationEngine.scala:310-318``) via
    ``approxQuantile`` (Greenwald-Khanna sketch — single pass, mergeable
    across 1000 executors; exact sort at 100 TB would be a full shuffle)."""
    qs = [i / n for i in range(1, n)]
    splits = df.approxQuantile(col, qs, relative_error)
    # dedupe non-increasing split points (constant regions)
    uniq: list[float] = []
    for s in splits:
        if not uniq or s > uniq[-1]:
            uniq.append(s)
    return bin_intervals(df, col, uniq, out_col)
