"""Model-based quality classifier (r10 VERDICT item 9): the GPT-3/
LLaMA reference-vs-crawl LR filter.  The load-bearing pins are the
two LITERAL mirrors — the Python murmur3/bucket hash vs spark.ml
HashingTF, and the whole map-side scorer vs model.transform — plus a
separable-vocabulary fixture with closed-form decisions."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flashml_spark.functions import hashing as H
from flashml_spark.operators import quality


def test_murmur3_matches_ml_hashingtf(spark):
    # every tail length (0..3 mod 4), unicode, empty string, repeats
    from pyspark.ml.feature import HashingTF

    toks = ["", "a", "ab", "abc", "abcd", "abcde", "hello", "the",
            "αβγ", "x1", "ZZZZZZZZZ", "word-with-dash",
            "élève", "1234567890123"]
    for n in (128, 1 << 15, 1 << 20):
        tf = HashingTF(inputCol="t", outputCol="v", numFeatures=n)
        ml = [
            r["v"].indices.tolist()[0]
            for r in tf.transform(
                spark.createDataFrame([([t],) for t in toks],
                                      "t array<string>")
            ).collect()
        ]
        assert ml == [H.hashing_tf_index(t, n) for t in toks]


def test_quality_scorer_matches_ml_transform(spark):
    # end-to-end parity: the broadcast-coefficient map-side scorer must
    # reproduce model.transform's keep-probability on arbitrary text
    # (including unseen tokens, nasty whitespace, empty and NULL docs)
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF
    from pyspark.ml.functions import vector_to_array

    pos = spark.createDataFrame(
        [(i, f"good clean prose number {i} with structure") for i in range(12)],
        "doc_id long, text string",
    )
    neg = spark.createDataFrame(
        [(i, f"zzz spam spam buy{i} now click") for i in range(12)],
        "doc_id long, text string",
    )
    model = quality.fit_quality_classifier(
        pos, neg, "text", n_features=256, max_iter=25, reg_param=0.01,
        fit_sample_rows=None,
    )
    evald = spark.createDataFrame(
        [
            (1, "good clean prose about nothing"),
            (2, "buy now spam zzz"),
            (3, "totally unseen vocabulary here"),
            (4, "\tgood\nprose  with nbsp"),
            (5, ""),
            (6, None),
        ],
        "doc_id long, text string",
    )
    ours = {
        r["doc_id"]: r["quality_score"]
        for r in quality.score_quality_model(
            evald, "text", model, round_to=6
        ).collect()
    }
    # the ml pipeline's own probability on the same rows
    tf = HashingTF(inputCol="__toks", outputCol="__features",
                   numFeatures=256)
    feats = tf.transform(
        evald.where(F.col("text").isNotNull())
        .select("doc_id", H.tokens(F.col("text")).alias("__toks"))
    )
    # rebuilding an ml model from the dict is awkward; instead refit
    # the SAME training frame through the raw ml path and compare
    train = (
        pos.select(H.tokens(F.col("text")).alias("__toks"),
                   F.lit(1.0).alias("__label"))
        .unionByName(
            neg.select(H.tokens(F.col("text")).alias("__toks"),
                       F.lit(0.0).alias("__label")))
    )
    from flashml_spark.training.estimators import strip_training_summary

    mlmodel = LogisticRegression(
        featuresCol="__features", labelCol="__label", maxIter=25,
        regParam=0.01,
    ).fit(tf.transform(train))
    # the raw ml fit pins the session via trainingSummary; when an
    # earlier test initialized the (non-serializable) ObservationManager
    # the transform closure would break — the repo's fit-site remedy
    strip_training_summary(mlmodel)
    theirs = {
        r["doc_id"]: round(float(r["p"][1]), 6)
        for r in mlmodel.transform(feats)
        .select("doc_id", vector_to_array("probability").alias("p"))
        .collect()
    }
    for d in (1, 2, 3, 4, 5):
        assert ours[d] == pytest.approx(theirs[d], abs=2e-6), d
    assert ours[6] is None
    # the fit separated the planted vocabularies
    assert ours[1] > 0.8 and ours[2] < 0.2


def test_quality_filter_flag_and_nulls(spark):
    model = {"weights": [0.0] * 64, "intercept": 2.0, "n_features": 64}
    df = spark.createDataFrame(
        [(1, "anything"), (2, None)], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in
           quality.score_quality_model(df, "text", model).collect()}
    assert out[1]["quality_score"] == pytest.approx(0.880797, abs=1e-6)
    assert out[1]["is_kept"] == 1
    assert out[2]["quality_score"] is None and out[2]["is_kept"] == 0
    with pytest.raises(ValueError, match="weights length"):
        quality.score_quality_model(
            df, "text", {"weights": [0.0], "intercept": 0.0,
                         "n_features": 64})


def test_pareto_acceptance_exact_and_monotone(spark):
    import hashlib

    from flashml_spark.operators import quality

    df = spark.createDataFrame(
        [(i, 1.0, 0.0) for i in range(400)],
        "doc_id long, hi double, lo double",
    )
    out_hi = quality.pareto_quality_filter(df, "hi", "doc_id").collect()
    out_lo = quality.pareto_quality_filter(df, "lo", "doc_id").collect()
    # score 1.0 always beats 1 - pareto (threshold = 2 - u^{-1/9} < 1);
    # score 0.0 keeps only the P(x>1) = 2^-9 tail (~0.2%)
    assert all(r["is_sampled"] == 1 for r in out_hi)
    n_lo = sum(r["is_sampled"] for r in out_lo)
    assert n_lo <= 5  # 400 * 1/512 ≈ 0.8 expected
    # the threshold is the exact inverse-CDF of the documented md5 u
    r0 = next(r for r in out_hi if r["doc_id"] == 7)
    u = (int(hashlib.md5(b"pareto:7").hexdigest()[:8], 16) + 1.0) / 2**32
    assert r0["accept_threshold"] == round(2.0 - u ** (-1.0 / 9.0), 6)
    import pytest as _pytest

    with _pytest.raises(ValueError, match="alpha"):
        quality.pareto_quality_filter(df, "hi", "doc_id", alpha=0.0)
