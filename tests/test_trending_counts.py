"""Decayed trending counts: the stateful stream's final per-key value
must equal the closed form Σ 2^(-(T - t_i)/hl) hand-computed over all
batches, including late (out-of-order) arrivals."""

from __future__ import annotations

import datetime

from flashml_spark.streaming.stateful import decayed_trending_counts

BASE = datetime.datetime(2024, 5, 1, 0, 0, 0)
HL = 600.0  # 10-minute half-life


def _rows(*specs):
    return [(t, BASE + datetime.timedelta(seconds=s)) for t, s in specs]


def _closed_form(times, ref):
    return sum(2.0 ** (-(ref - t) / HL) for t in times)


def test_trending_decay_across_batches_with_late_event(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "token string, ts timestamp"
    # batch 1: "ai" at 0s and 300s; "db" at 0s
    spark.createDataFrame(_rows(("ai", 0), ("ai", 300), ("db", 0)), schema).coalesce(
        1
    ).write.parquet(src)
    # batch 2: "ai" at 900s, plus a LATE "ai" event at 60s
    spark.createDataFrame(_rows(("ai", 900), ("ai", 60)), schema).coalesce(
        1
    ).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = decayed_trending_counts(stream, half_life_seconds=HL)
    q = (
        out.writeStream.format("memory")
        .queryName("trending")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = spark.sql(
        "SELECT * FROM trending ORDER BY as_of"
    ).collect()
    # last emission per token wins (update mode emits once per batch)
    last = {}
    for r in rows:
        last[r["token"]] = r

    base_epoch = BASE.timestamp()
    ai_times = [base_epoch + s for s in (0, 300, 900, 60)]
    assert abs(last["ai"]["decayed_count"] - _closed_form(ai_times, base_epoch + 900)) < 1e-9
    assert last["ai"]["as_of"] == base_epoch + 900  # late event didn't move ref
    assert abs(last["db"]["decayed_count"] - 1.0) < 1e-9
