"""Streaming sinks.

The reference has no streaming layer (SURVEY §1.1); this closes the loop
for the engine's streaming extensions: a watermarked aggregation written
to files is the scale-path for continuous metric/report production (the
batch equivalents land in ``metrics/report.py`` sinks).

Parquet file sinks are append-only by Structured Streaming's contract: a
windowed aggregate row is emitted exactly once, when the watermark passes
the window end.  That gives exactly-once file output (checkpoint +
manifest), at the cost of the final open window staying unflushed until
later data closes it — the correct trade at scale, where a "final" window
doesn't exist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery


def write_stream_parquet(
    df: DataFrame,
    path: str,
    checkpoint: str,
    available_now: bool = True,
    query_name: str | None = None,
) -> StreamingQuery:
    """Start an append-mode parquet sink with exactly-once checkpointing.

    ``available_now=True`` drains all currently-available input then stops
    (batch-over-stream replay); ``False`` runs continuously on the default
    trigger.  The checkpoint dir carries source offsets + sink manifest, so
    a restarted query resumes without duplicating output files.
    """
    writer = (
        df.writeStream.format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# --------------------------------------------------------------------------
# Exactly-once streaming upsert sink (foreachBatch + versioned snapshots).
#
# Structured Streaming's file sinks are append-only; maintaining a keyed
# corpus (insert/replace/delete by id) from a change-stream needs
# read-modify-write, which ``foreachBatch`` provides — at the cost of
# exactly-once becoming the SINK's job: after a crash between "snapshot
# written" and "offsets committed", the restarted query REPLAYS the last
# micro-batch into a snapshot that already contains it.
#
# The sink makes the replay idempotent with versioned snapshot directories:
#     <base>/v=N/part-*.parquet      the full corpus at version N
#     <base>/v=N/_COMMIT             json {"batch_id": B}, written LAST
# A batch is applied by reading the newest COMMITTED version, running
# ``apply_upserts``, writing v=N+1, then writing its _COMMIT marker —
# readers and recovery only ever trust directories with a marker, so a
# torn write is invisible, and a replayed batch_id <= the committed one is
# skipped.  (The same recipe a Delta/Iceberg table service runs, reduced
# to its engine-portable core: an atomic marker over an immutable dir.)
#
# Scale: the rewrite cost is O(|corpus|) per micro-batch, the honest cost
# of full-snapshot semantics on plain parquet; at 100 TB you'd point the
# same foreachBatch body at a MERGE-capable table format instead — the
# sink isolates exactly that swap behind ``apply_fn``.


def _snapshot_versions(spark, base: str) -> list[tuple[int, str]]:
    """Committed (version, path) pairs under ``base``, ascending."""
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(base)
    fs = p.getFileSystem(conf)
    if not fs.exists(p):
        return []
    out = []
    for st in fs.listStatus(p):
        name = st.getPath().getName()
        if st.isDirectory() and name.startswith("v="):
            commit = jvm.org.apache.hadoop.fs.Path(st.getPath(), "_COMMIT")
            if fs.exists(commit):
                out.append((int(name[2:]), str(st.getPath())))
    return sorted(out)


def _read_commit(spark, version_path: str) -> int:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(version_path + "/_COMMIT")
    fs = p.getFileSystem(conf)
    stream = fs.open(p)
    try:
        reader = jvm.java.io.BufferedReader(
            jvm.java.io.InputStreamReader(stream, "UTF-8")
        )
        raw = reader.readLine()
    finally:
        stream.close()
    import json

    return int(json.loads(raw)["batch_id"])


def _write_commit(spark, version_path: str, batch_id: int) -> None:
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(version_path + "/_COMMIT")
    fs = p.getFileSystem(conf)
    out = fs.create(p, True)
    try:
        import json

        out.write(bytearray(json.dumps({"batch_id": batch_id}), "utf-8"))
    finally:
        out.close()


def read_upsert_snapshot(spark, base: str, version: int | None = None) -> DataFrame:
    """Load a committed corpus snapshot written by ``write_stream_upsert``
    — the newest by default, or an exact ``version`` for time travel
    (pair an old and a new version with ``dedup.snapshot_diff`` to audit
    what a change-stream did to the corpus between two points).

    Raises ``FileNotFoundError`` if nothing is committed yet /
    ``ValueError`` for a version that was never committed."""
    versions = _snapshot_versions(spark, base)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {base}")
    if version is None:
        return spark.read.parquet(versions[-1][1])
    by_v = dict(versions)
    if version not in by_v:
        raise ValueError(
            f"version {version} not committed under {base}; have {sorted(by_v)}"
        )
    return spark.read.parquet(by_v[version])


def write_stream_upsert(
    changes: DataFrame,
    base: str,
    checkpoint: str,
    id_col: str,
    op_col: str = "op",
    available_now: bool = True,
    query_name: str | None = None,
) -> StreamingQuery:
    """Maintain a keyed corpus snapshot from a change-stream, exactly once.

    ``changes`` is a streaming frame carrying the corpus schema plus
    ``op_col`` ∈ {'upsert','delete'}.  Each micro-batch folds into the
    newest committed snapshot via ``dedup.apply_upserts`` and commits a
    new immutable version; replays of an already-committed batch_id are
    skipped, so restart after any crash point yields the same corpus.
    """
    from flashml_spark.operators.dedup import apply_upserts

    spark = changes.sparkSession
    data_cols = [c for c in changes.columns if c != op_col]

    def fold(batch_df: DataFrame, batch_id: int) -> None:
        versions = _snapshot_versions(spark, base)
        if versions:
            last_v, last_path = versions[-1]
            if batch_id <= _read_commit(spark, last_path):
                return  # replayed micro-batch: already in the snapshot
            current = spark.read.parquet(last_path)
        else:
            last_v = -1
            current = spark.createDataFrame(
                [], batch_df.drop(op_col).schema
            )
        # latest change per id wins within the batch (ts-free: last op
        # ordering inside one micro-batch is not defined, so collapse by
        # highest op precedence: any delete beats upserts for the id only
        # if it is the only op — callers needing intra-batch ordering
        # should carry a sequence column and pre-dedupe).
        batch = batch_df.dropDuplicates([id_col])
        merged = apply_upserts(current, batch.select(*data_cols, op_col),
                               id_col, op_col=op_col)
        new_path = f"{base}/v={last_v + 1}"
        merged.write.mode("overwrite").parquet(new_path)
        _write_commit(spark, new_path, batch_id)

    writer = (
        changes.writeStream.foreachBatch(fold)
        .option("checkpointLocation", checkpoint)
        .outputMode("update")
    )
    if query_name:
        writer = writer.queryName(query_name)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
