"""Exactly-once streaming upsert sink: a change-stream folded through
``write_stream_upsert`` must converge to the same corpus a batch
``apply_upserts`` produces, and replaying an already-committed micro-batch
(the crash-between-snapshot-and-offset window) must be a no-op."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

from flashml_spark.streaming.sinks import (
    _snapshot_versions,
    read_upsert_snapshot,
    write_stream_upsert,
)

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("op", StringType()),
    ]
)


def _run(spark, src, base, ckpt):
    stream = spark.readStream.schema(SCHEMA).parquet(src)
    q = write_stream_upsert(
        stream, base, ckpt, id_col="doc_id", available_now=True
    )
    q.awaitTermination(180)


def _corpus(spark, base):
    return {
        (r["doc_id"], r["text"])
        for r in read_upsert_snapshot(spark, base).collect()
    }


def test_upsert_sink_converges_and_is_idempotent(spark, tmp_path):
    src = str(tmp_path / "src")
    base = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    first = [(1, "alpha", "upsert"), (2, "beta", "upsert"), (3, "gamma", "upsert")]
    spark.createDataFrame(first, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, base, ckpt)
    assert _corpus(spark, base) == {(1, "alpha"), (2, "beta"), (3, "gamma")}

    # second batch: replace 2, delete 3, insert 4
    second = [(2, "BETA2", "upsert"), (3, None, "delete"), (4, "delta", "upsert")]
    spark.createDataFrame(second, SCHEMA).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, base, ckpt)
    assert _corpus(spark, base) == {(1, "alpha"), (2, "BETA2"), (4, "delta")}

    # restart with no new input: no new snapshot version is committed
    before = _snapshot_versions(spark, base)
    _run(spark, src, base, ckpt)
    assert _snapshot_versions(spark, base) == before


def test_upsert_sink_skips_replayed_batch(spark, tmp_path):
    """Simulate the crash-replay window: a fresh checkpoint re-delivers
    batch 0, whose batch_id is already committed in the snapshot — the
    sink must skip it instead of double-applying."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "corpus")

    rows = [(1, "alpha", "upsert"), (2, "beta", "upsert")]
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(src)
    _run(spark, src, base, str(tmp_path / "ckpt1"))
    v1 = _snapshot_versions(spark, base)

    # new checkpoint => Structured Streaming replays everything as batch 0
    _run(spark, src, base, str(tmp_path / "ckpt2"))
    assert _snapshot_versions(spark, base) == v1
    assert _corpus(spark, base) == {(1, "alpha"), (2, "beta")}


def test_upsert_sink_matches_batch_twin(spark, tmp_path):
    """Stream-fold == batch apply_upserts on the same change-set."""
    from flashml_spark.operators.dedup import apply_upserts

    src = str(tmp_path / "src")
    base = str(tmp_path / "corpus")
    changes = [
        (1, "a", "upsert"),
        (2, "b", "upsert"),
        (1, "a2", "upsert"),  # within-batch duplicate id: one survivor
        (3, "c", "upsert"),
    ]
    spark.createDataFrame(changes, SCHEMA).coalesce(1).write.parquet(src)
    _run(spark, src, base, str(tmp_path / "ckpt"))

    got = read_upsert_snapshot(spark, base)
    empty = spark.createDataFrame([], StructType(SCHEMA.fields[:2]))
    want = apply_upserts(
        empty,
        spark.read.parquet(src).dropDuplicates(["doc_id"]),
        "doc_id",
    )
    assert {r["doc_id"] for r in got.collect()} == {
        r["doc_id"] for r in want.collect()
    } == {1, 2, 3}


def test_time_travel_reads_exact_versions(spark, tmp_path):
    """Each committed v=N stays immutable and addressable; pairing two
    versions with snapshot_diff reconstructs what the stream did."""
    from flashml_spark.operators.dedup import snapshot_diff

    src = str(tmp_path / "src")
    base = str(tmp_path / "corpus")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "alpha", "upsert"), (2, "beta", "upsert")], SCHEMA
    ).coalesce(1).write.parquet(src)
    _run(spark, src, base, ckpt)
    spark.createDataFrame(
        [(2, "beta-v2", "upsert"), (3, "gamma", "upsert")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, base, ckpt)

    v0 = read_upsert_snapshot(spark, base, version=0)
    v1 = read_upsert_snapshot(spark, base, version=1)
    assert {r["doc_id"] for r in v0.collect()} == {1, 2}
    assert {r["doc_id"] for r in v1.collect()} == {1, 2, 3}

    diff = snapshot_diff(v0, v1, text_col="text", id_col="doc_id")
    got = {
        (r["doc_id"], r["status"])
        for r in diff.collect()
        if r["status"] != "unchanged"
    }
    assert got == {(2, "changed"), (3, "added")}

    import pytest

    with pytest.raises(ValueError):
        read_upsert_snapshot(spark, base, version=7)
