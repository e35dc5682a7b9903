"""Structured Streaming variants of the event operators.

The batch definitions live in ``operators.events``; these wire the same
logical plans onto ``readStream`` sources with watermarks:

  * tumbling-window aggregation — identical ``groupBy(window(...))``
    expression, plus a watermark so state is bounded and late events beyond
    the threshold are dropped
  * sessionization — ``F.session_window`` (gap-based), the streaming-native
    equivalent of the batch lag/cumsum formulation

Scale posture: watermark + windowed state keeps per-executor state bounded
regardless of stream length; keys partition the state store.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _watermarked(stream: DataFrame, ts_col: str, watermark: str) -> tuple[DataFrame, bool]:
    """Apply the event-time watermark, casting TIMESTAMP_NTZ event time to
    TIMESTAMP first (watermarks require an instant type,
    [EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE]).  Session timezone is pinned to
    UTC in ``session.get_spark`` so the cast is wall-clock-preserving.
    Returns the watermarked stream and whether the cast happened, so window
    bounds can be cast back and keep the batch operators' NTZ schema."""
    was_ntz = dict(stream.dtypes).get(ts_col) == "timestamp_ntz"
    if was_ntz:
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    return stream.withWatermark(ts_col, watermark), was_ntz


def _bound(col: Column, was_ntz: bool) -> Column:
    return col.cast("timestamp_ntz") if was_ntz else col


def read_event_stream(
    spark: SparkSession, path: str, schema=None, fmt: str = "parquet"
) -> DataFrame:
    """File-source stream over an events directory (new files appear →
    micro-batches).  Schema must be supplied (streaming sources don't
    infer)."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def streaming_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked tumbling-window count/sum per key — same expression as
    ``operators.events.tumbling_window_agg``."""
    wm, was_ntz = _watermarked(stream, ts_col, watermark)
    return (
        wm.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("total"),
        )
        .select(_bound(F.col("w.start"), was_ntz).alias("ws"), key_col, "n", "total")
    )


def streaming_session_stats(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based sessions via ``session_window`` — one row per closed
    session: ``user_id, session_start, session_end, n_events, total``."""
    wm, was_ntz = _watermarked(stream, ts_col, watermark)
    return (
        wm.groupBy(F.session_window(ts_col, gap).alias("sw"), F.col(user_col))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum(value_col), 6).alias("total"),
        )
        .select(
            user_col,
            _bound(F.col("sw.start"), was_ntz).alias("session_start"),
            _bound(F.col("sw.end"), was_ntz).alias("session_end"),
            "n_events",
            "total",
        )
    )


def streaming_sliding_window_agg(
    stream: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width: str = "1 hour",
    slide: str = "15 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked hopping-window aggregation — streaming twin of
    ``operators.events.sliding_window_agg``."""
    wm, _ = _watermarked(stream, ts_col, watermark)
    return (
        wm.groupBy(F.window(F.col(ts_col), width, slide).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("total"),
        )
        .select(F.col("w.start").cast("long").alias("ws"), key_col, "n", "total")
    )
