"""Streaming shard checksum manifest — the incremental twin of
``operators.textops.shard_checksum_manifest``.

The batch manifest's checksum was designed COMMUTATIVE exactly so a
continuously-ingesting pipeline can maintain it as a streaming
aggregation: each arriving document contributes one order-free term
(``functions.hashing.content_checksum_term`` — the SAME expression the
batch operator sums), so after any prefix of the stream the emitted
rows equal the batch manifest of the rows ingested so far, and at
convergence the stream manifest equals the batch manifest of the whole
corpus — certifiable by direct comparison, no replay.

State: |shards| rows of (count, char-sum, term-sum) — constant,
watermark-free (a manifest is a running total by definition).  The
modulus is applied on EMIT, not in state, so the running DECIMAL(38,0)
sum stays exact (overflow headroom ~10^20 rows per shard).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flashml_spark.functions import hashing as H


def streaming_shard_checksum(
    stream: DataFrame,
    id_col: str,
    content_col: str,
    n_shards: int = 8,
) -> DataFrame:
    """Running per-shard manifest over a document stream: emits
    ``shard, n_docs, total_chars, checksum`` (update mode — the latest
    row per shard is the manifest of everything ingested so far).
    Bit-comparable to the batch ``shard_checksum_manifest`` of the same
    rows."""
    return (
        stream.select(
            (F.col(id_col) % n_shards).alias("shard"),
            H.content_checksum_term(
                F.col(id_col), F.col(content_col)
            ).alias("__h"),
            F.length(F.col(content_col).cast("string")).alias("__len"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__len").cast("bigint").alias("total_chars"),
            F.sum("__h").alias("__hsum"),
        )
        .select(
            "shard",
            "n_docs",
            "total_chars",
            (F.col("__hsum") % F.lit(H.CHECKSUM_MOD))
            .cast("bigint")
            .alias("checksum"),
        )
    )
