"""compact_parquet: many-small-files directory rewritten to few files,
byte-identical content, atomic swap leaves no temp dirs behind."""

from __future__ import annotations

import os

from flashml_spark.sources.savepoint import _dir_stats, compact_parquet


def test_compact_reduces_files_preserves_rows(spark, tmp_path):
    path = str(tmp_path / "many")
    df = spark.createDataFrame([(i, f"v{i}") for i in range(5000)], "id int, v string")
    df.repartition(64).write.parquet(path)
    _, before = _dir_stats(spark, path)
    assert before >= 32

    stats = compact_parquet(spark, path, target_file_mb=512)
    assert stats["files_before"] == before
    assert stats["files_after"] < before
    assert stats["files_after"] <= 2

    back = spark.read.parquet(path)
    assert back.count() == 5000
    assert back.agg({"id": "sum"}).collect()[0][0] == sum(range(5000))
    # no residue from the swap
    siblings = os.listdir(tmp_path)
    assert "many__compact_tmp" not in siblings
    assert "many__compact_old" not in siblings


def test_compact_noop_below_threshold(spark, tmp_path):
    path = str(tmp_path / "few")
    spark.createDataFrame([(1, "a")], "id int, v string").coalesce(1).write.parquet(path)
    stats = compact_parquet(spark, path, min_files_to_compact=8)
    assert stats["files_before"] == stats["files_after"]
    assert spark.read.parquet(path).count() == 1
