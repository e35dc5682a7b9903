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


def test_observation_does_not_poison_model_closures(spark):
    """Spark 4.1: the first DataFrame.observe initializes the session's
    ObservationManager, which is not serializable — a fitted model whose
    trainingSummary still pins the session then breaks ANY later closure
    that captures the model.  strip_training_summary at the fit sites
    keeps model closures session-free; this test locks the interaction."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.linalg import Vectors

    from flashml_spark.training.estimators import strip_training_summary

    # ensure an Observation has initialized the manager in THIS session
    df0 = spark.range(10)
    from pyspark.sql import Observation

    ob = Observation("poison_probe")
    df0.observe(ob, F.count(F.lit(1)).alias("n")).write.format("noop").mode(
        "overwrite"
    ).save()
    assert ob.get["n"] == 10

    data = spark.createDataFrame(
        [(Vectors.dense([0.0, 1.0]), 0.0), (Vectors.dense([1.0, 0.0]), 1.0)] * 20,
        ["features", "label"],
    )
    model = LogisticRegression(maxIter=2).fit(data)
    strip_training_summary(model)
    # transform + evaluate serializes the model into task closures
    from pyspark.ml.evaluation import BinaryClassificationEvaluator

    scored = model.transform(data)
    auc = BinaryClassificationEvaluator().evaluate(scored)
    assert auc == 1.0
