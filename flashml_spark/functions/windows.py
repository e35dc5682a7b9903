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
    rows_hint: int | None = None,
    small_input_threshold: int = 10_000,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Append ``<prefix><col>`` inclusive running totals in global
    ``order_col`` order, without a single-partition window.

    ``tiebreak_cols`` extends the ordering to make the written order
    total when ``order_col`` alone admits ties (r8 VERDICT x250
    hardening): the running totals at tie positions then have ONE
    defined value in every engine, instead of an
    any-order-is-equivalent family.

    ``rows_hint`` is the CALLER's promise of an upper bound on the frame's
    row count (e.g. a post-aggregation frame over a quantized key).  When
    the hint is at or under ``small_input_threshold``, the range-partition
    + offsets machinery is pure overhead — a single-partition cumulative
    window over the tiny frame is strictly cheaper (one exchange of
    ≤ threshold rows), so that fast path is taken.  With no hint the
    scale-safe default path always runs; a wrong (too-small) hint only
    costs performance, never correctness — the window result is identical.
    """
    spark = df.sparkSession
    key = F.col(order_col).asc() if ascending else F.col(order_col).desc()
    ties = [F.col(c).asc() for c in (tiebreak_cols or [])]
    if rows_hint is not None and rows_hint <= small_input_threshold:
        w = Window.orderBy(key, *ties).rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        out = df
        for c in sum_cols:
            out = out.withColumn(f"{prefix}{c}", F.sum(c).over(w))
        return out
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    # localCheckpoint: the ranged frame is evaluated twice (totals collect
    # + returned plan); pin it so a nondeterministic upstream can't make
    # the offsets disagree with the second evaluation.
    ranged = (
        df.repartitionByRange(n_parts, key, *ties)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
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
        .orderBy(
            F.col(order_col).asc() if ascending else F.col(order_col).desc(),
            *ties,
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = ranged
    for c in sum_cols:
        if offsets:
            omap = F.create_map(
                *[
                    lit
                    for pid in offsets
                    for lit in (F.lit(pid), F.lit(offsets[pid][c]))
                ]
            )
            off = F.coalesce(omap[F.col("__pid")], F.lit(0))
        else:
            # empty input: create_map() is untyped (VOID key lookup
            # fails analysis) and the window emits no rows anyway
            off = F.lit(0)
        out = out.withColumn(f"{prefix}{c}", F.sum(c).over(w) + off)
    return out.drop("__pid")


def global_row_number(
    df: DataFrame,
    order_cols: list[str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """Append a 1-based global ``row_number`` in ``order_cols`` ascending
    order without a single-partition window.

    Same machinery as :func:`global_cumsum`: ``repartitionByRange`` on the
    order keys (partition order == sort order), per-partition row counts to
    the driver (|partitions| scalars), within-partition ``row_number`` plus
    the partition's running offset.  Bit-identical to
    ``row_number() OVER (ORDER BY ...)`` when the order keys form a total
    order (ties would be numbered in nondeterministic relative order on
    any engine, exactly like the single-partition window).
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    keys = [F.col(c).asc() for c in order_cols]
    ranged = (
        df.repartitionByRange(n_parts, *keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets, running = {}, 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    omap = F.create_map(
        *[lit for pid in offsets for lit in (F.lit(pid), F.lit(offsets[pid]))]
    )
    w = Window.partitionBy("__pid").orderBy(*keys)
    return ranged.withColumn(
        out_col,
        (F.row_number().over(w) + F.coalesce(omap[F.col("__pid")], F.lit(0))).cast(
            "long"
        ),
    ).drop("__pid")


def global_running_max_exclusive(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Append ``max(value_col)`` over the rows STRICTLY BEFORE the current
    row in global ``order_col`` ascending order (null for the first rows),
    without a single-partition window — the skyline/Pareto sweep primitive.

    Machinery: range-repartition on ``order_col`` (equal keys co-located,
    partition order == sort order); per-partition maxima to the driver
    (|partitions| scalars) become exclusive prefix-max offsets; within each
    partition an exclusive-preceding ``max`` window composes with the
    offset via ``greatest``.  Tie caveat (same as the single-partition
    ``Window.orderBy`` it replaces): rows tied on ``order_col`` see an
    arbitrary subset of each other as predecessors — callers must be
    tie-insensitive on ``value_col`` within an ``order_col`` group
    (skyline's pruned frame is: ties share the group-max value).
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ranged = (
        df.repartitionByRange(n_parts, F.col(order_col).asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    maxima = {
        r["__pid"]: r["mx"]
        for r in ranged.groupBy("__pid").agg(F.max(value_col).alias("mx")).collect()
    }
    offsets: dict[int, object] = {}
    running = None
    for pid in sorted(maxima):
        offsets[pid] = running
        m = maxima[pid]
        if m is not None and (running is None or m > running):
            running = m
    lits = []
    for pid, off in offsets.items():
        if off is not None:  # create_map rejects null values; absent == null
            lits += [F.lit(pid), F.lit(off)]
    omap = F.create_map(*lits) if lits else None
    w = (
        Window.partitionBy("__pid")
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    local = F.max(value_col).over(w)
    if omap is not None:
        prev = omap[F.col("__pid")]
        combined = F.when(
            local.isNull(), prev
        ).when(prev.isNull(), local).otherwise(F.greatest(local, prev))
    else:
        combined = local
    return ranged.withColumn(out_col, combined).drop("__pid")


def global_ntile(
    df: DataFrame,
    order_col: str,
    n: int,
    tiebreak_cols: list[str] | None = None,
    out_col: str = "bucket",
    num_partitions: int | None = None,
) -> DataFrame:
    """Equal-count buckets (SQL ``NTILE(n)``) in global ``order_col`` order
    without a single-partition window.

    Same machinery as ``global_cumsum``: range-repartition on the order key
    (partition order == sort order), per-partition row counts to the driver
    (|partitions| scalars), then a within-partition ``row_number`` plus the
    partition's offset gives the global rank.  The bucket follows ANSI
    NTILE's remainder-first arithmetic: with ``base, rem = divmod(total,
    n)``, the first ``rem`` buckets get ``base+1`` rows and the rest get
    ``base``, so ranks up to the cutover ``rem*(base+1)`` map via
    ``floor((rank-1)/(base+1))+1`` and later ranks via ``rem +
    floor((rank-1-cut)/base)+1``.  (NOT ``floor((rank-1)*n/total)+1`` —
    that proportional formula spreads the remainder across buckets and
    diverges from ANSI/DuckDB NTILE whenever ``total % n != 0``.)
    Bit-identical to DuckDB NTILE for a deterministic total order
    (supply tie-break columns).
    """
    spark = df.sparkSession
    n_parts = num_partitions or spark.sparkContext.defaultParallelism
    ties = tiebreak_cols or []
    keys = [F.col(order_col).asc()] + [F.col(c).asc() for c in ties]
    # localCheckpoint: the ranged frame is evaluated twice (counts collect
    # + returned plan); pin it so a nondeterministic upstream can't make
    # the offsets disagree with the second evaluation.
    ranged = (
        df.repartitionByRange(n_parts, *keys)
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=False)
    )
    counts = {
        r["__pid"]: r["cnt"]
        for r in ranged.groupBy("__pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    total = sum(counts.values())
    if total == 0:
        return df.withColumn(out_col, F.lit(None).cast("int"))
    offsets, running = {}, 0
    for pid in sorted(counts):
        offsets[pid] = running
        running += counts[pid]
    omap = F.create_map(
        *[lit for pid in offsets for lit in (F.lit(pid), F.lit(offsets[pid]))]
    )
    w = Window.partitionBy("__pid").orderBy(*keys)
    rank = F.row_number().over(w) + F.coalesce(omap[F.col("__pid")], F.lit(0))
    # ANSI NTILE hands the remainder rows to the FIRST total%n buckets
    # (sizes base+1), not spread across them — branch on the cutover rank
    base, rem = divmod(total, n)
    cut = rem * (base + 1)
    if base == 0:
        bucket = rank  # fewer rows than buckets: one row per bucket
    else:
        bucket = F.when(
            rank <= cut, F.floor((rank - 1) / F.lit(base + 1)) + 1
        ).otherwise(F.lit(rem) + F.floor((rank - 1 - cut) / F.lit(base)) + 1)
    return ranged.withColumn(out_col, bucket.cast("int")).drop("__pid")
