"""Streaming EWMA monitor: state recursion must match a hand-rolled
Python replay across micro-batches, and the anomaly flag must fire on a
spike after warm-up — the recursive twin of events.ewma_anomaly."""

from __future__ import annotations

import datetime

from flashml_spark.streaming.stateful import ewma_monitor

BASE = datetime.datetime(2024, 6, 1, 0, 0, 0)


def _rows(*specs):
    return [
        (k, BASE + datetime.timedelta(minutes=m), v) for k, m, v in specs
    ]


def _py_replay(values, alpha=0.3, z=3.0, min_n=5):
    n, ewma, ewvar, flagged = 0, 0.0, 0.0, 0
    for x in values:
        if n >= min_n and ewvar > 0 and abs(x - ewma) > z * ewvar**0.5:
            flagged += 1
        if n == 0:
            ewma = x
        else:
            d = x - ewma
            ewma += alpha * d
            ewvar = (1 - alpha) * (ewvar + alpha * d * d)
        n += 1
    return n, ewma, ewvar**0.5, flagged


def test_ewma_monitor_matches_python_replay_across_batches(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "event_type string, ts timestamp, value double"
    b1 = [("a", i, 100.0 + (i % 3)) for i in range(6)]
    b2 = [("a", 6, 500.0), ("a", 7, 101.0), ("b", 0, 1.0)]
    spark.createDataFrame(_rows(*b1), schema).coalesce(1).write.parquet(src)
    spark.createDataFrame(_rows(*b2), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        ewma_monitor(stream, "event_type", "ts", "value")
        .writeStream.format("memory")
        .queryName("ewmamon")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    rows = spark.sql(
        "SELECT * FROM ewmamon ORDER BY n"
    ).collect()
    # last emitted row per key = final state
    final = {r["event_type"]: r for r in rows}
    vals_a = [v for _, _, v in b1] + [500.0, 101.0]
    n, ewma, ewsd, flagged = _py_replay(vals_a)
    fa = final["a"]
    assert fa["n"] == n == 8
    assert abs(fa["ewma"] - ewma) < 1e-9
    assert abs(fa["ewsd"] - ewsd) < 1e-9
    # the 500 spike fires after the 6-observation warm-up; batch 2 holds it
    batch2_a = [r for r in rows if r["event_type"] == "a" and r["n"] == 8]
    assert batch2_a[0]["batch_anomalies"] >= 1
    assert final["b"]["n"] == 1 and final["b"]["batch_anomalies"] == 0


def test_ewma_monitor_no_flags_on_stable_series(spark, tmp_path):
    src = str(tmp_path / "src")
    schema = "event_type string, ts timestamp, value double"
    rows = [("k", i, 50.0 + (i % 2)) for i in range(20)]
    spark.createDataFrame(_rows(*rows), schema).coalesce(1).write.parquet(src)
    stream = spark.readStream.schema(schema).parquet(src)
    q = (
        ewma_monitor(stream, "event_type", "ts", "value")
        .writeStream.format("memory")
        .queryName("ewmastable")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    out = spark.sql("SELECT * FROM ewmastable").collect()
    assert sum(r["batch_anomalies"] for r in out) == 0
    n, ewma, ewsd, _ = _py_replay([v for _, _, v in rows])
    last = max(out, key=lambda r: r["n"])
    assert abs(last["ewma"] - ewma) < 1e-9
