"""corpus_snapshot Python data source: format-based reads match the
helper, time travel works, filters push to parquet, manifest audits."""

from __future__ import annotations

import pytest
from pyspark.sql.types import LongType, StringType, StructField, StructType

from flashml_spark.sources.snapshot_source import (
    SnapshotDataSource,
    snapshot_manifest,
)
from flashml_spark.streaming.sinks import write_stream_upsert

SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("op", StringType()),
    ]
)


@pytest.fixture()
def store(spark, tmp_path):
    src, base, ckpt = (str(tmp_path / d) for d in ("src", "base", "ckpt"))

    def run():
        st = spark.readStream.schema(SCHEMA).parquet(src)
        write_stream_upsert(st, base, ckpt, id_col="doc_id").awaitTermination(180)

    spark.createDataFrame(
        [(i, f"doc{i}", "upsert") for i in range(10)], SCHEMA
    ).coalesce(1).write.parquet(src)
    run()
    spark.createDataFrame(
        [(3, None, "delete"), (11, "doc11", "upsert")], SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    run()
    spark.dataSource.register(SnapshotDataSource)
    return base


def test_reads_latest_and_time_travel(spark, store):
    latest = spark.read.format("corpus_snapshot").option("base", store).load()
    assert {r["doc_id"] for r in latest.collect()} == set(range(10)) - {3} | {11}

    v0 = (
        spark.read.format("corpus_snapshot")
        .option("base", store)
        .option("version", "0")
        .load()
    )
    assert {r["doc_id"] for r in v0.collect()} == set(range(10))


def test_equality_filter_pushes_and_matches(spark, store):
    df = (
        spark.read.format("corpus_snapshot")
        .option("base", store)
        .load()
        .filter("doc_id = 5")
    )
    rows = df.collect()
    assert [(r["doc_id"], r["text"]) for r in rows] == [(5, "doc5")]


def test_manifest_audit(spark, store):
    m = snapshot_manifest(store)
    assert [v["version"] for v in m] == [0, 1]
    assert [v["batch_id"] for v in m] == [0, 1]
    assert all(v["n_files"] >= 1 for v in m)


def test_missing_version_raises(spark, store):
    import pytest as _pt

    with _pt.raises(Exception):
        (
            spark.read.format("corpus_snapshot")
            .option("base", store)
            .option("version", "9")
            .load()
            .collect()
        )
