"""Temporal join operators Spark's DataFrame API lacks as built-ins:
as-of join and bounded range (interval) join.

Both are expressed so the physical plan stays a *hash* exchange on the
equi-key — never a broadcast-nested-loop over an inequality predicate,
which is what a naive ``l.join(r, (l.k == r.k) & (r.ts <= l.ts))`` degrades
to and what dies first at 100 TB.

  * ``asof_join``          — union-tag + one window carry-forward: a single
                             shuffle on the key columns; per-key state is a
                             sort, not a quadratic probe.
  * ``bucketed_range_join`` — time-bucket both sides (bucket width = gap
                             window) and equi-join on (key, bucket); each
                             left row probes exactly 2 buckets, so the
                             shuffle key stays equi and candidate blowup is
                             bounded by bucket occupancy, not |L|x|R|.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "bucketed_range_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_cols: dict[str, str],
    tie_col: str | None = None,
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: for every left row, attach the columns of the
    LATEST right row with the same ``on`` key and ``right_ts <= left_ts``
    (``<`` when ``strict``).  Left rows with no prior right row keep NULLs
    (left-join semantics).

    ``right_cols`` maps output alias -> right column name.  ``tie_col``
    breaks ties between right rows sharing a timestamp (max wins) so the
    result is deterministic — required for oracle-hash reproducibility.

    Plan shape: union both sides, one window over
    ``partitionBy(on).orderBy(ts, side, tie)`` carrying the last non-null
    right-row STRUCT forward (a struct, not per-column ``last`` — per-column
    carry would stitch together values from *different* right rows when a
    payload field is legitimately NULL).  One shuffle on ``on``; skewed keys
    are AQE's problem, same as any keyed window.
    """
    on = list(on)
    # right side first: its schema decides the carried-struct / tie types
    payload = F.struct(*[F.col(c).alias(a) for a, c in right_cols.items()])
    # side ordering encodes the <= vs < semantics: rows sort (ts, side), so
    # inclusive puts right rows BEFORE left rows at equal ts (side 0 < 1),
    # strict puts them after (side 2 > 1) where the running window can't
    # see them yet
    right_side = 2 if strict else 0
    tie = F.col(tie_col) if tie_col is not None else F.lit(0)
    r = right.select(
        *[F.col(c) for c in on],
        F.col(right_ts).alias("__asof_t"),
        F.lit(right_side).alias("__asof_side"),
        tie.alias("__asof_tie"),
        payload.alias("__asof_carry"),
    )
    carry_type = r.schema["__asof_carry"].dataType
    tie_type = r.schema["__asof_tie"].dataType

    left_cols = left.columns
    l = left.select(
        "*",
        F.col(left_ts).alias("__asof_t"),
        F.lit(1).alias("__asof_side"),
        F.lit(None).cast(tie_type).alias("__asof_tie"),
        F.lit(None).cast(carry_type).alias("__asof_carry"),
    )
    on_set = set(on)
    r_full = r.select(
        *[
            F.lit(None).cast(f.dataType).alias(f.name)
            for f in left.schema.fields
            if f.name not in on_set
        ],
        *r.columns,
    )
    unioned = l.unionByName(r_full)

    w = (
        Window.partitionBy(*on)
        .orderBy(
            F.col("__asof_t").asc_nulls_first(),
            F.col("__asof_side"),
            F.col("__asof_tie").asc_nulls_first(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = F.last("__asof_carry", ignorenulls=True).over(w)
    return (
        unioned.withColumn("__asof_c", carried)
        .filter(F.col("__asof_side") == 1)
        .select(
            *[F.col(c) for c in left_cols],
            *[F.col("__asof_c").getField(a).alias(a) for a in right_cols],
        )
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    max_gap: int,
    min_gap: int = 0,
    unit: str = "us",
) -> DataFrame:
    """Equi-keyed interval join: all (left, right) pairs with the same
    ``on`` key and ``right_ts - left_ts`` in ``[min_gap, max_gap]``
    (``unit``: 'us' | 's' on timestamp columns).

    Non-key column names must not collide (pre-alias them); the output
    carries every column of both inputs.

    Plan shape: bucket width ``w = max_gap - min_gap``; a right row lives in
    bucket ``floor(t/w)``, a left row probes ``floor((t+min_gap)/w)`` and
    the following bucket — exactly 2 probes per row, then an equi-join on
    ``(on…, bucket)`` + exact residual filter.  The shuffle stays a hash
    exchange; compare a raw inequality join, which Catalyst can only run as
    broadcast-nested-loop.
    """
    if max_gap <= min_gap:
        raise ValueError(f"max_gap ({max_gap}) must exceed min_gap ({min_gap})")
    scale = {"us": 1, "s": 1_000_000}[unit]
    lo_gap, hi_gap = min_gap * scale, max_gap * scale
    w = hi_gap - lo_gap

    def micros(c: str) -> Column:
        return F.unix_micros(F.col(c))

    # integer DIV (not float /): epoch micros near 2^50 lose ULPs as
    # doubles, and a boundary bucket off by one silently drops pairs
    l = left.withColumn("__rj_lt", micros(left_ts)).withColumn(
        "__rj_bucket",
        F.explode(
            F.sequence(
                F.expr(f"(__rj_lt + {lo_gap}) DIV {w}"),
                F.expr(f"(__rj_lt + {hi_gap}) DIV {w}"),
            )
        ),
    )
    r = right.withColumn("__rj_rt", micros(right_ts)).withColumn(
        "__rj_bucket", F.expr(f"__rj_rt DIV {w}")
    )
    gap = F.col("__rj_rt") - F.col("__rj_lt")
    return (
        l.join(r, on=[*on, "__rj_bucket"])
        .filter((gap >= lo_gap) & (gap <= hi_gap))
        .drop("__rj_bucket", "__rj_lt", "__rj_rt")
    )
