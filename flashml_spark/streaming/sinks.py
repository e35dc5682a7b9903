"""Streaming sinks.

The reference has no streaming layer (SURVEY §1.1); this closes the loop
for the engine's streaming extensions: a watermarked aggregation written
to files is the scale-path for continuous metric/report production (the
batch equivalents land in ``metrics/report.py`` sinks).

Parquet file sinks are append-only by Structured Streaming's contract: a
windowed aggregate row is emitted exactly once, when the watermark passes
the window end.  That gives exactly-once file output (checkpoint +
manifest), at the cost of the final open window staying unflushed until
later data closes it — the correct trade at scale, where a "final" window
doesn't exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    query_name: str | None = None,
) -> StreamingQuery:
    """Start an append-mode parquet sink with exactly-once checkpointing.

    ``available_now=True`` drains all currently-available input then stops
    (batch-over-stream replay); ``False`` runs continuously on the default
    trigger.  The checkpoint dir carries source offsets + sink manifest, so
    a restarted query resumes without duplicating output files.
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
