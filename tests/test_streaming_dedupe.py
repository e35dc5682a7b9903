"""Streaming dedup vs the batch operators: within-stream
dropDuplicatesWithinWatermark and the stream-vs-corpus anti-join must
agree with ``operators.dedup.exact_dedup`` semantics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flashml_spark.operators import dedup
from flashml_spark.sources.readers import load_table
from flashml_spark.streaming import (
    corpus_digests,
    streaming_dedup_against_corpus,
    streaming_dedup_exact,
)
from tests.conftest import SF_DIR


def _staged_docs_with_dupes(spark, tmp_path, n_dupes: int = 25):
    """documents + ts column + injected exact duplicates (new ids, same
    text) written as a streaming-source dir.  Event times start a day
    after the epoch: a row with event time exactly 0 equals the initial
    watermark and is (correctly) dropped as late."""
    docs = (
        load_table(spark, SF_DIR, "documents")
        .limit(200)
        .withColumn("ts", F.timestamp_micros(F.col("doc_id") * 1_000_000 + 86_400_000_000))
    )
    dupes = (
        docs.limit(n_dupes)
        .withColumn("doc_id", F.col("doc_id") + 1_000_000)
        .withColumn("ts", F.timestamp_micros(F.col("doc_id") + 86_400_000_000))
    )
    staged = docs.unionByName(dupes)
    src = str(tmp_path / "docs_src")
    # ONE file => one micro-batch: the injected dupes carry small event
    # times, and a multi-batch replay would advance the watermark past
    # them between batches (correct streaming behavior, wrong test).
    # Return the READ-BACK frame: limit() without an order is
    # nondeterministic, so recomputing `staged` could pick different rows
    # than the ones written.
    staged.coalesce(1).write.parquet(src)
    return spark.read.parquet(src), src


def test_streaming_dedup_exact_matches_batch(spark, tmp_path):
    staged, src = _staged_docs_with_dupes(spark, tmp_path)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        streaming_dedup_exact(stream, "text", watermark="10 seconds")
        .writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.table("dedup_stream").select("text").collect()
    texts = [r["text"] for r in got]
    # one row per distinct content, none dropped spuriously
    assert len(texts) == len(set(texts))
    batch_distinct = staged.select("text").distinct().count()
    assert len(texts) == batch_distinct


def test_streaming_dedup_against_corpus_matches_anti_join(spark, tmp_path):
    staged, src = _staged_docs_with_dupes(spark, tmp_path)
    # corpus = first 100 docs; the stream replays ALL rows, so survivors
    # are exactly the rows whose text is not in the corpus
    corpus = staged.filter(F.col("doc_id") < 100)
    digests = corpus_digests(corpus, "text")
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema
    ).parquet(src)
    q = (
        streaming_dedup_against_corpus(stream, digests, "text")
        .writeStream.format("memory")
        .queryName("corpus_dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(r["doc_id"] for r in spark.table("corpus_dedup_stream").collect())
    want_df = staged.join(
        corpus.select(dedup.H.md5_hex(F.col("text")).alias("__d")).distinct(),
        dedup.H.md5_hex(F.col("text")) == F.col("__d"),
        "left_anti",
    )
    want = sorted(r["doc_id"] for r in want_df.collect())
    assert got == want


def test_streaming_curation_matches_batch_stages(spark, tmp_path):
    """The curation pipeline's streaming form — stateless quality filter
    projection + within-stream digest dedup — must keep exactly the docs
    the batch stages (quality_filter_verdict + exact_dedup) keep."""
    from flashml_spark.operators.textops import quality_filter_verdict

    staged, src = _staged_docs_with_dupes(spark, tmp_path)

    stream = spark.readStream.schema(staged.schema).parquet(src)
    filtered = quality_filter_verdict(stream, "text", lang_col="lang").filter(
        F.col("keep")
    ).drop("reason", "keep")
    q = (
        streaming_dedup_exact(filtered, "text", "ts")
        .writeStream.format("memory")
        .queryName("curated_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got_texts = {
        r["text"]
        for r in spark.sql("SELECT text FROM curated_stream").collect()
    }

    batch_kept = (
        quality_filter_verdict(staged, "text", lang_col="lang")
        .filter(F.col("keep"))
        .drop("reason", "keep")
    )
    want_texts = {
        r["text"] for r in dedup.exact_dedup(batch_kept, "text", "doc_id").collect()
    }
    assert got_texts == want_texts


def test_ttl_anchor_first_parity_with_dropDuplicatesWithinWatermark(
    spark, tmp_path
):
    """ttl_dedup_flags(anchor="first") is the batch twin of streaming
    dropDuplicatesWithinWatermark: same kept set when batch boundaries
    advance the watermark past each anchor's expiry (the operator's
    documented guarantee — within one microbatch streaming also drops
    farther-apart duplicates because state is only evicted at watermark
    advance, which is a batch-boundary accident, not the contract).

    Scenario (delay = horizon = 10 s): key A bursts at +0/+5/+8 s, a
    watermark-advancing filler key at +100 s (watermark -> 90 s), an
    intermediate microbatch whose END evicts A's state (Spark removes
    expired dedup state at batch end, not before processing — verified
    empirically: without this batch A@+95 is still dropped), then A
    returns at +95 s (re-emitted new anchor) and +97 s (dup of it).
    """
    import time

    base = 86_400  # seconds; epoch-adjacent event times are "late" rows
    rows1 = [
        ("A", 1, base + 0),
        ("A", 2, base + 5),
        ("A", 3, base + 8),
        ("W", 4, base + 100),
    ]
    rows_evict = [("W2", 7, base + 105)]
    rows2 = [
        ("A", 5, base + 95),
        ("A", 6, base + 97),
    ]

    def _frame(rows):
        return spark.createDataFrame(
            rows, "key string, event_id long, sec long"
        ).select(
            "key", "event_id", F.timestamp_seconds("sec").alias("ts")
        )

    src = str(tmp_path / "ttl_src")
    # three files, strictly increasing mtime -> three microbatches under
    # maxFilesPerTrigger=1, watermark advancing between them
    for rows in (rows1, rows_evict, rows2):
        _frame(rows).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    batch_df = _frame(rows1 + rows_evict + rows2)
    stream = (
        spark.readStream.schema(batch_df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        stream.withWatermark("ts", "10 seconds")
        .dropDuplicatesWithinWatermark(["key"])
        .writeStream.format("memory")
        .queryName("ttl_anchor_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    streaming_kept = {
        r["event_id"] for r in spark.table("ttl_anchor_stream").collect()
    }

    flagged = dedup.ttl_dedup_flags(
        batch_df, ["key"], "ts", "event_id", 10, anchor="first"
    )
    batch_kept = {
        r["event_id"] for r in flagged.filter(F.col("is_dup") == 0).collect()
    }
    assert streaming_kept == batch_kept == {1, 4, 5, 7}
    # and the refreshing default would NOT re-emit at +95 if the chain
    # were gap-free; here the 87 s gap exceeds the horizon either way,
    # so pin the distinguishing rows instead: 2,3,6 are dups in both
    dups = {
        r["event_id"] for r in flagged.filter(F.col("is_dup") == 1).collect()
    }
    assert dups == {2, 3, 6}


def test_streaming_hll_matches_batch_sketch(spark, tmp_path):
    """streaming_hll_distinct over two micro-batches converges to the
    batch hll_distinct estimate on the union — same md5 register
    arithmetic, O(256) state per key."""
    import time

    from flashml_spark.operators.sketches import hll_distinct
    from flashml_spark.streaming import streaming_hll_distinct

    rows1 = [("s1", f"tok{i}") for i in range(400)] + [
        ("s2", f"v{i % 37}") for i in range(100)
    ]
    rows2 = [("s1", f"tok{i}") for i in range(200, 700)] + [
        ("s2", f"v{i % 53}") for i in range(100)
    ]

    def _frame(rows):
        return spark.createDataFrame(rows, "source string, token string")

    src = str(tmp_path / "hll_src")
    _frame(rows1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _frame(rows2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(_frame(rows1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_hll_distinct(stream, "source", "token")
        .writeStream.format("memory")
        .queryName("hll_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per key = the converged estimate
    out = spark.sql(
        "SELECT source, hll_estimate FROM hll_stream "
        "WHERE (source, n_rows) IN "
        "(SELECT source, MAX(n_rows) FROM hll_stream GROUP BY source)"
    ).collect()
    got = {r["source"]: r["hll_estimate"] for r in out}

    batch = {
        r["source"]: r["hll_estimate"]
        for r in hll_distinct(
            _frame(rows1 + rows2), "source", "token"
        ).collect()
    }
    # batch rounds to 6; the streaming estimate must agree to that digit
    assert round(got["s1"], 6) == pytest.approx(batch["s1"], abs=2e-6)
    assert round(got["s2"], 6) == pytest.approx(batch["s2"], abs=2e-6)


def test_streaming_hll_non_string_values_match_batch(spark, tmp_path):
    """Regression (r6 ADVICE): for NON-string value columns the pandas
    worker used to hash Python str(v) while the batch sketch hashes
    Spark's CAST(value AS STRING) — e.g. 3e18 renders "3e+18" in Python
    but "3.0E18" in Spark, silently breaking estimate parity.  The
    value column is now cast JVM-side, so a DOUBLE column must give the
    batch estimate exactly."""
    import time

    from flashml_spark.operators.sketches import hll_distinct
    from flashml_spark.streaming import streaming_hll_distinct

    # doubles whose str()/CAST renderings disagree (exponent notation)
    rows = [("s1", (i + 1) * 1e18) for i in range(300)]
    df = spark.createDataFrame(rows, "source string, token double")
    src = str(tmp_path / "hll_dbl_src")
    df.limit(150).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    df.coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_hll_distinct(stream, "source", "token")
        .writeStream.format("memory")
        .queryName("hll_dbl_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT hll_estimate FROM hll_dbl_stream "
        "ORDER BY n_rows DESC LIMIT 1"
    ).collect()[0]["hll_estimate"]
    batch = hll_distinct(df, "source", "token").collect()[0]["hll_estimate"]
    assert round(got, 6) == pytest.approx(batch, abs=2e-6)


def test_streaming_count_min_matches_batch_sketch(spark, tmp_path):
    """streaming_count_min over two micro-batches: each target's
    lifetime estimate equals the batch count_min_audit estimate over
    the union — same md5 cell arithmetic, additive merges, O(4096)
    state per key.  Targets include a value column needing the
    JVM-side string cast (long token ids)."""
    import time

    from flashml_spark.operators.sketches import count_min_audit
    from flashml_spark.streaming import streaming_count_min

    rows1 = [("k", i % 7) for i in range(300)] + [("k", 999)] * 40
    rows2 = [("k", i % 11) for i in range(200)] + [("k", 999)] * 25

    def _frame(rows):
        return spark.createDataFrame(rows, "g string, token long")

    src = str(tmp_path / "cms_src")
    _frame(rows1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _frame(rows2).coalesce(1).write.mode("append").parquet(src)

    targets = ["999", "0", "5"]
    stream = (
        spark.readStream.schema(_frame(rows1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_count_min(stream, "g", "token", targets)
        .writeStream.format("memory")
        .queryName("cms_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql(
        "SELECT estimates FROM cms_stream ORDER BY n_rows DESC LIMIT 1"
    ).collect()[0]["estimates"]

    batch = {
        str(r["value"]): r["cms_estimate"]
        for r in count_min_audit(
            _frame(rows1 + rows2), "token", top_k=20
        ).collect()
    }
    # exact counts as the floor; the sketch never underestimates
    assert got[0] == batch["999"] >= 65
    assert got[1] == batch["0"]
    assert got[2] == batch["5"]
