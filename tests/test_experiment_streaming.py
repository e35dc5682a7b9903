"""Experiment orchestration + Structured Streaming tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flashml_spark.experiment import Experiment, ExperimentConfig


def _journey_df(spark, n=300):
    """Synthetic web-journey data: text + categorical + numerical + pages."""
    rows = []
    for i in range(n):
        page = (i % 3) + 1
        good = i % 2 == 0
        text = "buy now great deal" if good else "just browsing around here"
        rows.append(
            (
                f"{i:08x}",          # hex session id
                page,
                text,
                "mobile" if i % 4 < 2 else "desktop",
                float(i % 7),
                "1" if good else "0",
            )
        )
    return spark.createDataFrame(
        rows, ["session_id", "page", "text", "device", "dwell", "response"]
    )


def test_experiment_end_to_end_binary(spark):
    df = _journey_df(spark)
    cfg = ExperimentConfig(
        primary_keys=["session_id"],
        response="response",
        text_cols=["text"],
        categorical_cols=["device"],
        numerical_cols=["dwell"],
        random_id_col="session_id",
        text_method="tfidf",
        slots=100,
        algorithm="logistic_regression",
        train_fraction=0.7,
    )
    exp = Experiment(cfg)
    metrics = exp.run(spark, df)
    assert metrics["accuracy"] > 0.95
    assert metrics["auroc"] > 0.95
    assert 0 < metrics["bestF2"]["threshold"] <= 1.0
    assert len(exp.models_) == 1


def test_experiment_page_level(spark):
    df = _journey_df(spark)
    cfg = ExperimentConfig(
        primary_keys=["session_id"],
        response="response",
        text_cols=["text"],
        page_col="page",
        num_pages=2,
        slots=100,
        train_fraction=0.7,
    )
    exp = Experiment(cfg)
    metrics = exp.run(spark, df)
    assert len(exp.models_) == 2  # page 1 + pages >= 2
    assert metrics["accuracy"] > 0.9


def test_experiment_savepoints_roundtrip(spark, tmp_path):
    from pyspark.ml import PipelineModel

    df = _journey_df(spark, 120)
    root = str(tmp_path / "sp")
    cfg = ExperimentConfig(
        primary_keys=["session_id"],
        response="response",
        text_cols=["text"],
        slots=50,
        savepoint_root=root,
    )
    Experiment(cfg).run(spark, df)
    reloaded = PipelineModel.load(f"{root}/pipeline/page0/model_pipeline")
    out = reloaded.transform(df)
    assert "prediction" in out.columns
    scored = spark.read.parquet(f"{root}/default/model/page0/noSegment/data/scoringTest")
    assert scored.count() > 0


def test_streaming_window_agg_matches_batch(spark, tmp_path):
    """availableNow stream over the events parquet must equal the batch
    tumbling-window aggregation."""
    from flashml_spark.operators.events import tumbling_window_agg
    from flashml_spark.sources import load_table
    from flashml_spark.streaming import streaming_window_agg

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    # stage a micros-normalized copy (streaming needs a schema-stable dir)
    src = str(tmp_path / "events_src")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    agg = streaming_window_agg(stream, watermark="10 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("win_agg")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["ws"], r["event_type"]): (r["n"], r["total"])
        for r in spark.table("win_agg").collect()
    }
    expected = {
        (r["ws"], r["event_type"]): (r["n"], r["total"])
        for r in tumbling_window_agg(ev).collect()
    }
    assert got == expected


def test_streaming_session_stats_runs(spark, tmp_path):
    from flashml_spark.sources import load_table
    from flashml_spark.streaming import streaming_session_stats

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    src = str(tmp_path / "events_src2")
    ev.write.parquet(src)
    stream = spark.readStream.schema(ev.schema).parquet(src)
    q = (
        streaming_session_stats(stream)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = spark.table("sessions").collect()
    assert len(rows) > 0
    assert all(r["session_end"] >= r["session_start"] for r in rows)
