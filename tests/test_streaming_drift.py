"""Streaming drift monitor (windowed PSI vs static baseline): the
streaming result must equal the batch twin bucket-for-bucket, and a
deliberately shifted window must score high PSI while an in-distribution
window scores ~0."""

from __future__ import annotations

from pyspark.sql import functions as F

from flashml_spark.streaming import (
    baseline_fractions,
    batch_windowed_psi,
    quantile_edges,
    windowed_psi,
)


def _staged(spark, tmp_path):
    """Two days of data: day 1 ~ baseline distribution, day 2 shifted
    (+100).  Deterministic values from the row id."""
    base = spark.range(0, 2000).select(
        F.timestamp_micros(
            F.lit(86_400_000_000) + (F.col("id") % 1000) * 60_000_000
        ).alias("ts"),
        (F.pmod(F.col("id") * 37, F.lit(100))).cast("double").alias("v"),
    )
    shifted = spark.range(2000, 4000).select(
        F.timestamp_micros(
            F.lit(2 * 86_400_000_000) + (F.col("id") % 1000) * 60_000_000
        ).alias("ts"),
        (F.pmod(F.col("id") * 37, F.lit(100)) + 100.0).cast("double").alias("v"),
    )
    src = str(tmp_path / "drift_src")
    base.unionByName(shifted).coalesce(1).write.parquet(src)
    return spark.read.parquet(src), src


def test_streaming_psi_matches_batch_twin(spark, tmp_path):
    staged, src = _staged(spark, tmp_path)
    baseline = staged.filter(F.col("v") < 100)  # day-1 shape
    edges = quantile_edges(baseline, "v", buckets=10)
    fracs = baseline_fractions(baseline, "v", edges)
    assert len(edges) == 9 and len(fracs) == 10
    assert abs(sum(fracs) - 1.0) < 1e-9

    stream = spark.readStream.schema(staged.schema).parquet(src)
    # complete mode so the memory sink shows every window: in append
    # mode a finite replay can never emit the LAST window (the watermark
    # cannot pass its end without later data — correct streaming
    # semantics, wrong for a bounded parity test); live deployments run
    # update/append and windows emit as the watermark crosses them
    q = (
        windowed_psi(stream, "ts", "v", edges, fracs)
        .writeStream.format("memory")
        .queryName("psi_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: r for r in spark.table("psi_stream").collect()
    }
    want = {
        r["window_start"]: r
        for r in batch_windowed_psi(staged, "ts", "v", edges, fracs).collect()
    }
    assert set(got) == set(want) and len(got) == 2
    for k in want:
        assert got[k]["n"] == want[k]["n"]
        assert got[k]["psi"] == want[k]["psi"]  # bit-equal arithmetic


def test_psi_separates_drifted_from_stable(spark, tmp_path):
    staged, _ = _staged(spark, tmp_path)
    baseline = staged.filter(F.col("v") < 100)
    edges = quantile_edges(baseline, "v", buckets=10)
    fracs = baseline_fractions(baseline, "v", edges)
    rows = sorted(
        batch_windowed_psi(staged, "ts", "v", edges, fracs).collect(),
        key=lambda r: r["window_start"],
    )
    stable, drifted = rows[0], rows[1]
    assert stable["psi"] < 0.01  # in-distribution day
    # day 2's mass all lands in the top open-ended bucket -> large PSI
    assert drifted["psi"] > 1.0
