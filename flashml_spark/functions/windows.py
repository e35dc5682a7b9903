"""Distributed global cumulative sums.

``Window.orderBy(...)`` with no partition spec funnels EVERY row into a
single task — fine over a pre-aggregated few-row frame, a cliff over
anything data-sized (continuous model scores keep millions of distinct
values).  The classic fix, expressed in DataFrames:

  1. ``repartitionByRange`` on the order column — ranges are assigned to
     ascending partition ids, so partition order == sort order;
  2. per-partition totals (|partitions| rows) → driver → running offsets
     broadcast back as a literal map;
  3. within-partition cumulative window (``partitionBy(partition_id)`` —
     parallel) + the partition's offset.

Only |partitions| scalars ever reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_cumsum(
    df: DataFrame,
    order_col: str,
    sum_cols: list[str],
    ascending: bool = True,
    num_partitions: int | None = None,
    prefix: str = "cum_",
) -> DataFrame:
    """Append ``<prefix><col>`` inclusive running totals in global
    ``order_col`` order, without a single-partition window."""
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    key = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    ranged = df.repartitionByRange(n_parts, key).withColumn(
        "__pid", F.spark_partition_id()
    )

    totals = {
        r["__pid"]: r
        for r in ranged.groupBy("__pid")
        .agg(*[F.sum(c).alias(c) for c in sum_cols])
        .collect()  # |partitions| rows
    }
    offsets: dict[int, dict[str, float]] = {}
    running = {c: 0 for c in sum_cols}
    for pid in sorted(totals):
        offsets[pid] = dict(running)
        for c in sum_cols:
            running[c] += totals[pid][c] or 0

    # offset lookup as a literal map column per summed col (tiny)
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_col).asc() if ascending else F.col(order_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged
    for c in sum_cols:
        omap = F.create_map(
            *[
                lit
                for pid in offsets
                for lit in (F.lit(pid), F.lit(offsets[pid][c]))
            ]
        )
        out = out.withColumn(
            f"{prefix}{c}",
            F.sum(c).over(w) + F.coalesce(omap[F.col("__pid")], F.lit(0)),
        )
    return out.drop("__pid")
