"""Continuous near-duplicate curation: a stream of documents filtered
against a PERSISTENT minhash band-key store, so a document that arrived
last week still blocks today's near-duplicates.

Within-stream exact dedup (``dedupe.py``) holds state in the streaming
state store and evicts by watermark — right for a dedup HORIZON.  A
curation pipeline needs the opposite: membership that never expires and
survives restarts.  That is a store-table problem, not a state-store
problem, so the streaming side runs ``foreachBatch`` over a band-key
parquet table:

  per micro-batch —
    1. batch-internal near-dup removal (the batch ``minhash_dedup``:
       banded LSH -> connected components -> keep min id);
    2. drop survivors whose ANY band key already exists in the store
       (one keyed semi-join per batch — the store is band-key data, so
       at scale it is a bucketed table and the probe co-partitions);
    3. append the remaining documents' keys to the store and emit them.

The band keys come from the SAME ``band_key_array`` expression as the
batch candidate join, so stream and batch agree document-for-document on
what counts as a near-duplicate.

Failure semantics: re-running a batch re-appends its keys (harmless —
the probe is a semi-join, duplicates in the store change nothing) and
re-emits its documents; route the emit side through the exactly-once
upsert sink (``sinks.py``) when duplicate emission matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flashml_spark.operators.dedup import (
    band_key_array,
    minhash_dedup,
    with_minhash_signature,
)


def batch_neardup_curate(
    batch: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
) -> DataFrame:
    """One curation step over a (micro-)batch; returns the surviving rows
    AFTER appending their band keys to the store.

    The survivor frame is pinned (eager localCheckpoint) BEFORE the store
    append: the filter plan reads the store lazily, so without the pin a
    caller materializing the result after the append would see its own
    keys in the store and filter everything out.
    """
    from pyspark.errors import AnalysisException

    spark = batch.sparkSession
    local = minhash_dedup(batch, text_col, id_col, num_hashes, bands, shingle_n)
    keys = (
        with_minhash_signature(
            local.select(id_col, text_col), text_col, num_hashes, shingle_n
        )
        .select(
            F.col(id_col),
            F.explode(band_key_array(num_hashes, bands)).alias("band_key"),
        )
        .filter(F.col("band_key").isNotNull())
    )
    try:
        store = spark.read.parquet(store_path).select("band_key")
    except AnalysisException:
        store = None
    if store is not None:
        hit_ids = keys.join(store, "band_key", "left_semi").select(id_col).distinct()
        novel = local.join(hit_ids, id_col, "left_anti")
        novel_keys = keys.join(hit_ids, id_col, "left_anti")
    else:
        novel, novel_keys = local, keys
    novel = novel.localCheckpoint(eager=True)
    novel_keys.select("band_key").write.mode("append").parquet(store_path)
    return novel


def run_streaming_neardup(
    stream: DataFrame,
    text_col: str,
    id_col: str,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_n: int = 2,
):
    """Wire the curation step into a ``foreachBatch`` streaming query
    (availableNow trigger: drain what exists, then stop — the scheduled-
    ingestion twin of a long-running stream).  Returns the started query;
    callers ``awaitTermination()``."""

    def step(batch: DataFrame, epoch_id: int) -> None:
        novel = batch_neardup_curate(
            batch, text_col, id_col, store_path, num_hashes, bands, shingle_n
        )
        novel.write.mode("append").parquet(out_path)

    return (
        stream.writeStream.foreachBatch(step)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
