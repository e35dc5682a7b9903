"""Custom stateful sessionizer: closed-session set must match hand-walked
gap semantics across micro-batches, including the event-time-timeout
close path (idle session flushed once the watermark passes end + gap)."""

from __future__ import annotations

import datetime

from flashml_spark.streaming.stateful import sessionize_with_timeout

BASE = datetime.datetime(2024, 5, 1, 0, 0, 0)


def _rows(*specs):
    return [
        (u, BASE + datetime.timedelta(minutes=m))
        for u, m in specs
    ]


def test_sessionizer_gap_and_timeout_closes(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "user_id long, ts timestamp"
    # batch 1: u1 two events in one session; u2 one event
    spark.createDataFrame(_rows((1, 0), (1, 10), (2, 5)), schema).coalesce(
        1
    ).write.parquet(src)
    # batch 2: u1 far later (closes session 1); u3 appears late in the day
    spark.createDataFrame(_rows((1, 120), (3, 540)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # batch 3: u3 again within gap (merges); advances watermark so idle
    # sessions (u2, u1's second) time out
    spark.createDataFrame(_rows((3, 570)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = sessionize_with_timeout(
        stream, gap_seconds=1800, watermark="10 seconds"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = {
        (r["user"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions").collect()
    }
    us = lambda m: int((BASE + datetime.timedelta(minutes=m)).timestamp() * 1_000_000)  # noqa: E731
    want = {
        (1, us(0), us(10), 2),     # closed by the minute-120 event (gap exceeded)
        (2, us(5), us(5), 1),      # closed by event-time timeout
        (1, us(120), us(120), 1),  # closed by event-time timeout
        # u3's (540-570, n=2) session is still OPEN at end of input: no row
    }
    assert got == want
