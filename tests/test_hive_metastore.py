"""Hive-metastore-backed read path (``dal/HiveReader.scala:19-51``).

The reference reads real metastore tables, not temp views.  This test
proves the same contract end-to-end: ``saveAsTable`` into a Derby-backed
Hive metastore in one JVM, then ``read_source("hive://default.t")`` from a
SECOND JVM that only shares the metastore/warehouse directories — i.e.
the table resolves through the catalog, not through anything in-session.

Runs each step in a subprocess so the suite's shared (non-Hive) session
stays untouched.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

_SESSION_PY = """
import sys
from pyspark.sql import SparkSession

metastore, warehouse, mode = sys.argv[1], sys.argv[2], sys.argv[3]
spark = (
    SparkSession.builder.master("local[2]")
    .appName("hive-metastore-test-" + mode)
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.warehouse.dir", warehouse)
    .config(
        "spark.hadoop.javax.jdo.option.ConnectionURL",
        f"jdbc:derby:;databaseName={metastore};create=true",
    )
    .config("spark.ui.enabled", "false")
    .enableHiveSupport()
    .getOrCreate()
)
if mode == "write":
    df = spark.createDataFrame(
        [(i, f"name_{i}", float(i) * 1.5) for i in range(100)],
        "id bigint, name string, score double",
    )
    df.write.mode("overwrite").saveAsTable("default.flashml_hive_t")
else:
    sys.path.insert(0, sys.argv[4])
    from flashml_spark.sources.readers import read_source

    df = read_source(spark, "hive://default.flashml_hive_t")
    rows = df.count()
    total = df.selectExpr("CAST(SUM(score) AS DOUBLE) s").first()["s"]
    print(f"RESULT rows={rows} total={total}")
spark.stop()
"""


def test_hive_metastore_roundtrip_across_jvms(tmp_path):
    metastore = str(tmp_path / "metastore_db")
    warehouse = str(tmp_path / "warehouse")
    script = textwrap.dedent(_SESSION_PY)
    import os

    import flashml_spark

    repo_root = os.path.dirname(os.path.dirname(flashml_spark.__file__))

    def run(mode):
        return subprocess.run(
            [sys.executable, "-c", script, metastore, warehouse, mode, repo_root],
            capture_output=True,
            text=True,
            timeout=300,
            cwd=str(tmp_path),  # keep derby.log out of the repo
        )

    w = run("write")
    assert w.returncode == 0, w.stderr[-2000:]
    r = run("read")
    assert r.returncode == 0, r.stderr[-2000:]
    # 100 rows, sum(score) = 1.5 * sum(0..99) = 7425.0
    assert "RESULT rows=100 total=7425.0" in r.stdout, r.stdout
