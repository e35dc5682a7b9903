"""Stream-stream interval join vs its batch twin: the watermarked join
must emit exactly the pairs a static join with the same interval
condition produces."""

from __future__ import annotations

from pyspark.sql import functions as F

from flashml_spark.sources.readers import load_table
from flashml_spark.streaming import streaming_interval_join
from tests.conftest import SF_DIR


def test_streaming_interval_join_matches_batch(spark, tmp_path):
    ev = (
        load_table(spark, SF_DIR, "events")
        .limit(400)
        .select("event_id", "user_id", "ts", "event_type")
    )
    src = str(tmp_path / "ev_src")
    # one file => one micro-batch (no watermark advancement between files)
    ev.coalesce(1).write.parquet(src)
    staged = spark.read.parquet(src)

    stream = spark.readStream.schema(staged.schema).parquet(src)
    joined = streaming_interval_join(
        stream.select("user_id", "ts", F.col("event_id").alias("eid")),
        stream.select("user_id", "ts", F.col("event_id").alias("eid")),
        key="user_id",
        max_gap_seconds=300,
    )
    q = (
        joined.writeStream.format("memory")
        .queryName("sj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["l_eid"], r["r_eid"])
        for r in spark.sql("SELECT l_eid, r_eid FROM sj").collect()
    }

    a = staged.select(
        "user_id", F.col("ts").alias("a_ts"), F.col("event_id").alias("a_id")
    )
    b = staged.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("b_id"),
    )
    want = {
        (r["a_id"], r["b_id"])
        for r in a.join(
            b,
            (a["user_id"] == b["b_user"])
            & (F.col("b_ts") > F.col("a_ts"))
            & (
                F.col("b_ts")
                <= F.col("a_ts") + F.expr("INTERVAL 300 SECONDS")
            ),
        ).collect()
    }
    assert got == want and len(want) > 0
