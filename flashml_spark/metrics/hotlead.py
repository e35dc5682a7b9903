"""Hotlead simulation — the reference's journey-level custom metrics
(``core/metrics/WebCustomMetricsEvaluator.scala:67-189``).

Per dataset: mark ``isHotLead`` by per-page probability thresholds, derive
the visitor key, and roll up:
  * distinct visitor count
  * earliest hotlead page per visitor + whether the visitor ever converted
  * per-page hotlead count & captured positives (overflow pages folded into
    page N)
  * hotleadRate & captureRate

Pure DataFrame aggregations — the reference's ``collect()``-based rollups
(see SURVEY §7 scale posture) are re-expressed as two groupBys.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flashml_spark.training.postprocess import hotlead_flag


def hotlead_simulation(
    scored: DataFrame,
    primary_keys: list[str],
    page_col: str,
    prob_positive: Column,
    response_col: str,
    prob_thresholds: list[float],
    num_pages: int | None = None,
    top_thresholds: list[float] | None = None,
    top_col: Column | None = None,
) -> dict:
    """Returns summary rates + the per-page rollup DataFrame (not collected
    beyond the per-page table, which has ``num_pages`` rows).

    ``top_thresholds``/``top_col`` add the reference's two-signal hotlead
    rule (``WebCustomMetricsEvaluator.scala:103-109``): a row is hot only
    when BOTH the positive probability and the top-intent score clear
    their per-page thresholds (``customMetrics.type != "PROB_ONLY"``).
    """
    num_pages = num_pages or len(prob_thresholds)
    df = scored.withColumn(
        "visitors", F.concat_ws("_", *[F.col(c).cast("string") for c in primary_keys])
    ).withColumn(
        "isHotLead",
        hotlead_flag(
            prob_positive,
            F.col(page_col),
            prob_thresholds,
            top_thresholds=top_thresholds,
            top=top_col,
        ),
    )

    n_visitors = df.select("visitors").distinct().count()

    # earliest hotlead page per visitor (overflow pages fold into page N)
    clamped_page = F.least(F.col(page_col).cast("int"), F.lit(num_pages))
    per_visitor = (
        df.filter(F.col("isHotLead") == 1)
        .groupBy("visitors")
        .agg(
            F.min(clamped_page).alias("hotleadPage"),
            F.max(F.col(response_col).cast("int")).alias("converted"),
        )
    )
    per_page = (
        per_visitor.groupBy("hotleadPage")
        .agg(
            F.count(F.lit(1)).alias("hotleads"),
            F.sum("converted").cast("bigint").alias("captured"),
        )
        .orderBy("hotleadPage")
    )

    totals = per_visitor.agg(
        F.count(F.lit(1)).alias("hotlead_visitors"),
        F.sum("converted").alias("captured_total"),
    ).first()
    positives = (
        df.filter(F.col(response_col).cast("int") == 1).select("visitors").distinct().count()
    )

    hotlead_visitors = totals["hotlead_visitors"] or 0
    captured = totals["captured_total"] or 0
    return {
        "visitors": n_visitors,
        "hotleadVisitors": hotlead_visitors,
        "hotleadRate": hotlead_visitors / n_visitors if n_visitors else 0.0,
        "capturedPositives": captured,
        "positiveVisitors": positives,
        "captureRate": captured / positives if positives else 0.0,
        "perPage": per_page,
    }
