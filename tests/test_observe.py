"""Observation metrics: one action yields every stage's metrics, values
match a direct (second-scan) computation."""

from __future__ import annotations

from pyspark.sql import functions as F

from flashml_spark.metrics.observe import ObservationSet, observed_keep_rate
from flashml_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_observation_set_multi_stage(spark):
    docs = load_table(spark, SF_DIR, "documents")
    obs = ObservationSet()
    staged = obs.attach(
        docs, "ingest", F.count(F.lit(1)).alias("rows"),
        F.avg("n_chars").alias("mean_len"),
    )
    cleaned = staged.filter(F.col("n_chars") >= 100)
    cleaned = obs.attach(cleaned, "clean", F.count(F.lit(1)).alias("rows"))

    cleaned.write.format("noop").mode("overwrite").save()  # ONE action

    got = obs.all()
    assert got["ingest"]["rows"] == docs.count()
    assert abs(got["ingest"]["mean_len"] - docs.agg(F.avg("n_chars")).first()[0]) < 1e-9
    assert got["clean"]["rows"] == docs.filter("n_chars >= 100").count()


def test_observed_keep_rate(spark):
    docs = load_table(spark, SF_DIR, "documents")
    verdicts = docs.withColumn("keep", F.col("n_chars") >= 200)
    out, ob = observed_keep_rate(verdicts, "keep")
    out.write.format("noop").mode("overwrite").save()
    m = dict(ob.get)
    want_kept = docs.filter("n_chars >= 200").count()
    assert m["total"] == docs.count()
    assert m["kept"] == want_kept


def test_duplicate_point_name_rejected(spark):
    import pytest

    docs = load_table(spark, SF_DIR, "documents")
    obs = ObservationSet()
    obs.attach(docs, "p", F.count(F.lit(1)).alias("rows"))
    with pytest.raises(ValueError):
        obs.attach(docs, "p", F.count(F.lit(1)).alias("rows"))
