"""Binary-classification metrics as pure DataFrame plans.

The reference collects ``(probability, label)`` into RDDs and
``mllib.evaluation`` (``core/metrics/StandardMetricsEvaluator.scala:66-111``).
Here everything is windows/aggregations — no RDDs, no driver data loops:

  * threshold sweep — group by score, cumulative TP/FP over a descending
    score window → precision / recall / F-beta at every distinct threshold
  * AUROC — Mann-Whitney rank-sum formulation (ties get average ranks):
    exact, one sort, identical to trapezoidal ROC integration
  * best-F2 threshold (``WebCustomMetricsEvaluator.scala:38-65``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def threshold_sweep(
    scored: DataFrame, score_col: str = "positive_probability", label_col: str = "label",
    beta: float = 2.0,
) -> DataFrame:
    """Per-distinct-threshold confusion counts and P/R/F-beta.

    Output: ``thresh, tp, fp, fn, tn, precision, recall, fbeta``.
    Predicting positive means ``score >= thresh``.
    """
    pos_total = F.sum("pos_at").over(Window.partitionBy())
    neg_total = F.sum("neg_at").over(Window.partitionBy())
    w = Window.orderBy(F.desc("thresh"))

    per_thresh = scored.groupBy(F.col(score_col).alias("thresh")).agg(
        F.sum(F.when(F.col(label_col) == 1.0, 1).otherwise(0)).alias("pos_at"),
        F.sum(F.when(F.col(label_col) != 1.0, 1).otherwise(0)).alias("neg_at"),
    )
    cum = per_thresh.select(
        "thresh",
        F.sum("pos_at").over(w).alias("tp"),
        F.sum("neg_at").over(w).alias("fp"),
        pos_total.alias("P"),
        neg_total.alias("N"),
    )
    # every ratio guarded: Spark 4 ANSI mode raises on 0/0 (degenerate
    # inputs — e.g. no positive rows at all — are legitimate here)
    def ratio(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    precision = ratio(F.col("tp"), F.col("tp") + F.col("fp"))
    recall = ratio(F.col("tp"), F.col("P"))
    b2 = beta * beta
    fbeta = ratio((1 + b2) * precision * recall, b2 * precision + recall)
    return cum.select(
        "thresh",
        "tp",
        "fp",
        (F.col("P") - F.col("tp")).alias("fn"),
        (F.col("N") - F.col("fp")).alias("tn"),
        precision.alias("precision"),
        recall.alias("recall"),
        F.coalesce(fbeta, F.lit(0.0)).alias("fbeta"),
    )


def best_fbeta_threshold(
    scored: DataFrame, score_col: str = "positive_probability", label_col: str = "label",
    beta: float = 2.0,
) -> dict:
    """Threshold maximizing F-beta plus its P/R/accuracy
    (``WebCustomMetricsEvaluator.scala:38-65``)."""
    sweep = threshold_sweep(scored, score_col, label_col, beta)
    row = sweep.orderBy(F.desc("fbeta"), F.desc("thresh")).limit(1).first()
    total = row["tp"] + row["fp"] + row["fn"] + row["tn"]
    return {
        "threshold": row["thresh"],
        "fbeta": row["fbeta"],
        "precision": row["precision"],
        "recall": row["recall"],
        "accuracy": (row["tp"] + row["tn"]) / total if total else 0.0,
    }


def auroc(
    scored: DataFrame, score_col: str = "positive_probability", label_col: str = "label"
) -> float:
    """Exact AUROC via the rank-sum identity:
    ``AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)``
    with average ranks on score ties (equivalent to trapezoidal ROC).
    One global sort; everything else is aggregation.
    """
    ranked = scored.select(
        F.col(score_col).alias("s"),
        F.when(F.col(label_col) == 1.0, 1.0).otherwise(0.0).alias("y"),
    ).withColumn("r", F.row_number().over(Window.orderBy("s")))
    # average rank per tied score group
    avg_ranks = ranked.groupBy("s").agg(
        F.avg("r").alias("r_avg"), F.sum("y").alias("pos_in_group")
    )
    agg = avg_ranks.agg(
        F.sum(F.col("r_avg") * F.col("pos_in_group")).alias("rank_sum"),
        F.sum("pos_in_group").alias("n_pos"),
        F.sum(F.lit(0)).alias("_z"),
    ).first()
    n = ranked.count()
    n_pos = agg["n_pos"]
    n_neg = n - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.0
    return (agg["rank_sum"] - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)
