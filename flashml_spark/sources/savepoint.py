"""Savepoint manager — materialized DataFrames enabling pipeline resume.

Mirrors ``dal/SavePointManager.scala:30-135`` and the directory contract of
``core/DirectoryCreator.scala:39-149``:

    <root>/<project>/<model>/<type>/page<k>/noSegment/data/<step><DataSet>

The reference writes gzip parquet (``FlashML.scala:66``); we default to
snappy (better scan throughput at 100 TB; gzip available via option).
Writes are partitioned — never ``coalesce(1)`` for data-sized outputs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class SavepointManager:
    """Save/load per-(step, dataset, page) materialization barriers."""

    def __init__(self, spark: SparkSession, root: str, project: str = "default",
                 model: str = "model", compression: str = "snappy") -> None:
        self.spark = spark
        self.root = root.rstrip("/")
        self.project = project
        self.model = model
        self.compression = compression

    def path(self, step: str, dataset: str = "train", page: int = 0) -> str:
        return (
            f"{self.root}/{self.project}/{self.model}/page{page}/noSegment/data/"
            f"{step}{dataset.capitalize()}"
        )

    def save(self, df: DataFrame, step: str, dataset: str = "train", page: int = 0) -> str:
        p = self.path(step, dataset, page)
        (
            df.write.mode("overwrite")
            .option("compression", self.compression)
            .parquet(p)
        )
        return p

    def load(self, step: str, dataset: str = "train", page: int = 0) -> DataFrame:
        return self.spark.read.parquet(self.path(step, dataset, page))
