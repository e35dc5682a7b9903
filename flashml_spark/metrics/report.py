"""Metrics sinks (SURVEY §2.2).

Mirrors the reference's accumulate-then-write-once contract:
  * all metrics gathered in one map, written as ``metrics/metrics.json``
    and ``metrics/metrics.csv`` (``core/metrics/MetricsEvaluator.scala:14-47``;
    ``core/PipelineSteps.scala:263-272``; ``core/DirectoryCreator.scala:69-76``)
  * per-class confusion stats as a single text file
    (``core/metrics/StandardMetricsEvaluator.scala:208-229,269-291``) —
    ``coalesce(1)`` is correct here: the table has |classes| rows.

Metric maps are driver-side tiny (scalars only); the json/csv writes use
plain Python IO for local paths and ``coalesce(1)`` DataFrame writes for
distributed filesystems.
"""

from __future__ import annotations

import csv
import json
import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class MetricsAccumulator:
    """Accumulate named metrics across pipeline steps; write once at the end."""

    def __init__(self) -> None:
        self.metrics: dict[str, object] = {}

    def add(self, prefix: str, values: dict) -> None:
        for key, value in values.items():
            self.metrics[f"{prefix}.{key}" if prefix else key] = value

    def write(self, out_dir: str) -> dict[str, str]:
        os.makedirs(out_dir, exist_ok=True)
        jpath = os.path.join(out_dir, "metrics.json")
        cpath = os.path.join(out_dir, "metrics.csv")
        with open(jpath, "w") as f:
            json.dump(self.metrics, f, indent=2, sort_keys=True, default=str)
        with open(cpath, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["metric", "value"])
            for key in sorted(self.metrics):
                w.writerow([key, self.metrics[key]])
        return {"json": jpath, "csv": cpath}


def per_class_stats(scored: DataFrame, label_col: str, prediction_col: str) -> DataFrame:
    """Per-class TP / FP / FN / precision / recall from (label, prediction)
    pairs — one groupBy over the scored set, |classes|-row result
    (``StandardMetricsEvaluator.scala:269-291``)."""
    pairs = scored.groupBy(
        F.col(label_col).alias("label"), F.col(prediction_col).alias("pred")
    ).agg(F.count(F.lit(1)).alias("n"))
    tp = (
        pairs.filter(F.col("label") == F.col("pred"))
        .select(F.col("label").alias("cls"), F.col("n").alias("tp"))
    )
    by_pred = pairs.groupBy(F.col("pred").alias("cls")).agg(F.sum("n").alias("n_pred"))
    by_label = pairs.groupBy(F.col("label").alias("cls")).agg(F.sum("n").alias("n_label"))
    out = (
        by_label.join(by_pred, "cls", "full_outer")
        .join(tp, "cls", "left")
        .na.fill({"tp": 0, "n_pred": 0, "n_label": 0})
    )
    return out.select(
        "cls",
        F.col("tp").cast("bigint").alias("tp"),
        (F.col("n_pred") - F.col("tp")).cast("bigint").alias("fp"),
        (F.col("n_label") - F.col("tp")).cast("bigint").alias("fn"),
        F.when(F.col("n_pred") > 0, F.col("tp") / F.col("n_pred")).otherwise(0.0).alias("precision"),
        F.when(F.col("n_label") > 0, F.col("tp") / F.col("n_label")).otherwise(0.0).alias("recall"),
    ).orderBy("cls")


def write_confusion_text(
    scored: DataFrame, label_col: str, prediction_col: str, path: str
) -> None:
    """Single-partition text dump of the per-class stats — the result has
    |classes| rows, so ``coalesce(1)`` is the right physical choice."""
    stats = per_class_stats(scored, label_col, prediction_col)
    lines = stats.select(
        F.concat_ws(
            "\t",
            F.col("cls").cast("string"),
            F.col("tp").cast("string"),
            F.col("fp").cast("string"),
            F.col("fn").cast("string"),
            F.round("precision", 6).cast("string"),
            F.round("recall", 6).cast("string"),
        ).alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(path)
