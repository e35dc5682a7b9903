"""Watermarked stream-stream joins.

Structured Streaming's interval join: both sides carry watermarks, the
join condition bounds the event-time gap, and state on each side is
evicted once the watermark passes the interval — so state size tracks the
interval horizon, not stream length.  The batch twin is
``operators.joins.bucketed_range_join`` (same pairing semantics on a
static frame), which the unit test uses as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def streaming_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    max_gap_seconds: int = 60,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Join stream rows sharing ``key`` where the right event lands within
    ``(0, max_gap_seconds]`` AFTER the left event.

    Both inputs are watermarked; the interval condition lets the engine
    bound per-side state (rows older than watermark + gap are evicted).
    Timestamp-NTZ inputs are cast to timestamp for watermarking and cast
    back on the way out, mirroring ``streaming_dedup_exact``.
    Output: key, ``l_ts``, ``r_ts``, ``gap_s`` plus left/right payloads
    prefixed ``l_``/``r_``.
    """
    def prep(df: DataFrame, ts: str, side: str) -> DataFrame:
        was_ntz = dict(df.dtypes).get(ts) == "timestamp_ntz"
        if was_ntz:
            df = df.withColumn(ts, F.col(ts).cast("timestamp"))
        renamed = df.select(
            F.col(key),
            F.col(ts).alias(f"{side}_ts"),
            *[
                F.col(c).alias(f"{side}_{c}")
                for c in df.columns
                if c not in (key, ts)
            ],
        )
        return renamed.withWatermark(f"{side}_ts", watermark)

    lw = prep(left, left_ts, "l")
    rw = prep(right, right_ts, "r")
    cond = (
        (lw[key] == rw[key])
        & (F.col("r_ts") > F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {max_gap_seconds} SECONDS"))
    )
    return (
        lw.join(rw, cond)
        .drop(rw[key])
        .withColumn("gap_s", F.unix_micros("r_ts") / 1e6 - F.unix_micros("l_ts") / 1e6)
    )
