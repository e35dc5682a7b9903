"""Continuous near-dup curation (streaming/neardup.py): batch-internal
LSH dedup + the persistent band-key store must block duplicates across
micro-batches and across independent runs."""

from __future__ import annotations

from pyspark.sql import functions as F

from flashml_spark.streaming import batch_neardup_curate, run_streaming_neardup

TXT_A = "alpha beta gamma delta epsilon zeta"
TXT_B = "one two three four five six seven"
TXT_C = "totally different content lives here now"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_batch_curate_blocks_across_calls(spark, tmp_path):
    store = str(tmp_path / "store")
    first = batch_neardup_curate(
        _df(spark, [(1, TXT_A), (2, TXT_B), (3, TXT_A)]), "text", "doc_id", store
    )
    # batch-internal: doc 3 duplicates doc 1 -> min id kept
    assert {r["doc_id"] for r in first.collect()} == {1, 2}
    second = batch_neardup_curate(
        _df(spark, [(10, TXT_A), (11, TXT_C)]), "text", "doc_id", store
    )
    # cross-call: doc 10 hits doc 1's stored band keys; 11 is novel
    assert {r["doc_id"] for r in second.collect()} == {11}
    # the store now blocks C too
    third = batch_neardup_curate(
        _df(spark, [(20, TXT_C)]), "text", "doc_id", store
    )
    assert third.count() == 0


def test_batch_curate_result_survives_store_append(spark, tmp_path):
    # the survivor frame is pinned BEFORE the key append: materializing it
    # after the call must NOT see its own keys in the store
    store = str(tmp_path / "store2")
    out = batch_neardup_curate(_df(spark, [(1, TXT_A)]), "text", "doc_id", store)
    assert out.count() == 1  # would be 0 without the eager checkpoint


def test_streaming_neardup_two_microbatches(spark, tmp_path):
    src = str(tmp_path / "src")
    store = str(tmp_path / "store3")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _df(spark, [(1, TXT_A), (2, TXT_B), (3, TXT_A)]).coalesce(1).write.parquet(
        src + "/f1"
    )
    _df(spark, [(10, TXT_A), (11, TXT_C)]).coalesce(1).write.parquet(src + "/f2")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(src)
    )
    q = run_streaming_neardup(stream, "text", "doc_id", store, out, ckpt)
    q.awaitTermination(120)

    rows = spark.read.parquet(out).collect()
    texts = [r["text"] for r in rows]
    # each distinct text survives exactly once, whichever batch came first
    assert sorted(set(texts)) == sorted({TXT_A, TXT_B, TXT_C})
    assert len(texts) == 3
    # the store holds band keys for every survivor
    assert spark.read.parquet(store).select("band_key").distinct().count() >= 3
