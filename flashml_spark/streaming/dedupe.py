"""Streaming deduplication.

Two shapes a continuous ingestion pipeline needs:

  * within-stream dedup — ``dropDuplicatesWithinWatermark`` on a content
    digest: state holds one digest per distinct document and is evicted
    once the watermark passes, so state stays bounded by the dedup
    horizon, not stream length (the batch twin is
    ``operators.dedup.exact_dedup``)
  * stream-vs-corpus dedup — left-anti join of the stream against a
    STATIC digest frame (the historical corpus signature store).  Spark
    broadcasts or hash-joins the static side per micro-batch; at scale
    the store is a digest-bucketed parquet table, so the probe is a
    co-partitioned join, never a full corpus scan.

Both keep the digest column expression identical to the batch operators
(``functions.hashing.md5_hex``) so a document dropped by the batch
pipeline is dropped by the stream and vice versa.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from flashml_spark.functions import hashing as H


def _digest(text_col: str) -> Column:
    return H.md5_hex(F.col(text_col))


def streaming_dedup_exact(
    stream: DataFrame,
    text_col: str,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Drop later stream rows whose content digest was already seen within
    the watermark horizon.  Emits input rows unchanged (digest column is
    internal).  State: one row per distinct digest, watermark-evicted.
    """
    was_ntz = dict(stream.dtypes).get(ts_col) == "timestamp_ntz"
    if was_ntz:
        stream = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    out = (
        stream.withColumn("__digest", _digest(text_col))
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["__digest"])
        .drop("__digest")
    )
    if was_ntz:
        out = out.withColumn(ts_col, F.col(ts_col).cast("timestamp_ntz"))
    return out


def corpus_digests(corpus: DataFrame, text_col: str) -> DataFrame:
    """Distinct digest frame of a historical corpus — the static side of
    the stream-vs-corpus join.  Persist this once (digest-bucketed
    parquet via ``sources.savepoint.write_bucketed``) rather than
    recomputing per run."""
    return corpus.select(_digest(text_col).alias("__digest")).distinct()


def streaming_dedup_against_corpus(
    stream: DataFrame,
    digests: DataFrame,
    text_col: str,
) -> DataFrame:
    """Keep only stream rows whose content digest is NOT in the historical
    corpus: stream-static left-anti join on the digest.  The static side
    re-reads per micro-batch (Spark's stream-static contract), which is
    exactly what makes a slowly-growing corpus store pick up new snapshots
    without restarting the query."""
    return (
        stream.withColumn("__digest", _digest(text_col))
        .join(digests, "__digest", "left_anti")
        .drop("__digest")
    )
