"""Stability-index column expressions (PSI / VSI).

Reference formula (``core/metrics/ModelHealthMetricsEvaluator.scala:27,120-135``):
``(p_new - p_base) * ln(p_new / p_base) * 100`` summed over buckets, with
bucket percentages computed as whole-frame window sums
(``sum(cnt).over(Window.partitionBy())``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def stability_index_term(p_base: Column, p_new: Column) -> Column:
    return (p_new - p_base) * F.log(p_new / p_base) * 100.0


def whole_frame_fraction(cnt: Column) -> Column:
    """``cnt / sum(cnt) OVER ()`` — percentage against the whole frame
    (``ModelHealthMetricsEvaluator.scala:120-128,173-178``)."""
    return cnt.cast("double") / F.sum(cnt).over(Window.partitionBy())


def psi_from_bucket_counts(buckets: DataFrame, base_cnt: str, new_cnt: str,
                           out_col: str = "psi", round_to: int | None = 6) -> DataFrame:
    """Aggregate a per-bucket count table into a single PSI value."""
    p_base = whole_frame_fraction(F.col(base_cnt))
    p_new = whole_frame_fraction(F.col(new_cnt))
    term = stability_index_term(p_base, p_new)
    agg = buckets.select(term.alias("__term")).agg(F.sum("__term").alias(out_col))
    if round_to is not None:
        agg = agg.select(F.round(F.col(out_col), round_to).alias(out_col))
    return agg
