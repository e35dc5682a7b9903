"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API)
exposing the versioned corpus store written by
``streaming.sinks.write_stream_upsert`` as a first-class read path::

    spark.dataSource.register(SnapshotDataSource)
    spark.read.format("corpus_snapshot").option("base", path).load()
    spark.read.format("corpus_snapshot").option("base", path) \\
         .option("version", "2").load()          # time travel

Why a data source instead of a helper function: format-based access
composes with everything that takes a reader (SQL `CREATE TABLE ... USING
corpus_snapshot`, views, downstream tools that only know
``spark.read.format``), and the reader participates in Spark's planning —
one input partition per parquet file (parallel scan) and Arrow-batch
transfer (zero row-by-row Python cost).  Predicate pushdown handles
equality and range filters by parquet row-group statistics via pyarrow.

Filesystem note: version discovery lists the directory with ``os`` —
local/NFS paths (this container's storage).  On an object store you'd
swap the listing for an fsspec call; the Spark-facing surface is
unchanged.
"""

from __future__ import annotations

import json
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    GreaterThanOrEqual,
    InputPartition,
    LessThanOrEqual,
)
from pyspark.sql.types import StructType


def _committed_versions(base: str) -> list[tuple[int, str]]:
    if not os.path.isdir(base):
        return []
    out = []
    for name in os.listdir(base):
        full = os.path.join(base, name)
        if name.startswith("v=") and os.path.isdir(full):
            if os.path.exists(os.path.join(full, "_COMMIT")):
                out.append((int(name[2:]), full))
    return sorted(out)


def _resolve_version_dir(options) -> str:
    base = options.get("base")
    if not base:
        raise ValueError("corpus_snapshot requires .option('base', <path>)")
    versions = _committed_versions(base)
    if not versions:
        raise FileNotFoundError(f"no committed snapshot under {base}")
    v = options.get("version")
    if v is None:
        return versions[-1][1]
    by_v = dict(versions)
    if int(v) not in by_v:
        raise ValueError(
            f"version {v} not committed under {base}; have {sorted(by_v)}"
        )
    return by_v[int(v)]


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class SnapshotReader(DataSourceReader):
    def __init__(self, version_dir: str):
        self.version_dir = version_dir
        self.pushed: list[Filter] = []

    def pushFilters(self, filters: list[Filter]):  # noqa: N802 (API name)
        for f in filters:
            # single-column equality/range → parquet row-group stats can
            # serve them; anything else stays with Spark.  Spark ALSO
            # re-applies pushed filters post-scan unless told otherwise,
            # so over-accepting here can only lose performance, never
            # correctness — still, only accept what read() honors.
            if isinstance(f, (EqualTo, GreaterThanOrEqual, LessThanOrEqual)) and len(
                f.attribute
            ) == 1:
                self.pushed.append(f)
            else:
                yield f

    def partitions(self):
        files = sorted(
            os.path.join(self.version_dir, f)
            for f in os.listdir(self.version_dir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        return [_FilePartition(p) for p in files]

    def read(self, partition: _FilePartition) -> Iterator:
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        expr = None
        for f in self.pushed:
            col = pc.field(f.attribute[0])
            if isinstance(f, EqualTo):
                e = col == f.value
            elif isinstance(f, GreaterThanOrEqual):
                e = col >= f.value
            else:
                e = col <= f.value
            expr = e if expr is None else (expr & e)
        # pyarrow applies the expression with row-group statistics first
        # (skip), then per-batch filtering — the pushdown is real I/O
        # savings on a range-sorted snapshot (write_range_sorted).
        table = pq.read_table(partition.path, filters=expr)
        yield from table.to_batches()


class SnapshotDataSource(DataSource):
    """``corpus_snapshot`` format: committed-version parquet snapshots."""

    @classmethod
    def name(cls) -> str:
        return "corpus_snapshot"

    def schema(self):
        import pyarrow.parquet as pq
        from pyspark.sql.pandas.types import from_arrow_schema

        vdir = _resolve_version_dir(self.options)
        files = [
            f for f in os.listdir(vdir)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        ]
        if not files:
            raise FileNotFoundError(f"no parquet files in {vdir}")
        return from_arrow_schema(pq.read_schema(os.path.join(vdir, files[0])))

    def reader(self, schema: StructType) -> SnapshotReader:
        return SnapshotReader(_resolve_version_dir(self.options))


def snapshot_manifest(base: str) -> list[dict]:
    """Audit view of the store: one dict per committed version
    (version, path, batch_id, n_files)."""
    out = []
    for v, path in _committed_versions(base):
        with open(os.path.join(path, "_COMMIT")) as fh:
            batch_id = json.load(fh)["batch_id"]
        n_files = sum(
            1
            for f in os.listdir(path)
            if f.endswith(".parquet") and not f.startswith(("_", "."))
        )
        out.append(
            {"version": v, "path": path, "batch_id": batch_id, "n_files": n_files}
        )
    return out
