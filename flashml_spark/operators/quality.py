"""Model-based document quality classification — the GPT-3/LLaMA
filtering recipe (Brown et al. 2020 Appendix A; Touvron et al. 2023
§2.1): train a linear classifier to separate a high-quality reference
corpus (Wikipedia/books-style "positives") from raw crawl
("negatives") on hashed token features, then score every crawl
document and keep the high-scoring mass.  This composes the engine's
§2 ML stack (HashingTF features, LogisticRegression, the reference's
seed-999 trainer convention — cf. ``training/estimators.py``) with
the LLM-pipeline curation surface (the heuristic siblings: Gopher
rules x223, CCNet perplexity buckets x281, DSIR x224).

Two halves, matched exactly:

* **Fit** (bounded): ``fit_quality_classifier`` tokenizes with the
  engine tokenizer (``H.tokens`` — lower+trim+ASCII-``\\s`` split),
  hashes with spark.ml ``HashingTF`` (murmur3 seed 42, binary=False
  term counts) and fits ``LogisticRegression`` on a hard-capped
  sample per side — at 100 TB the iterative fit never sees the full
  corpus; the model is ~``n_features`` doubles.

* **Score** (pure map): ``score_quality_model`` applies the model
  MAP-SIDE with the coefficient vector broadcast to executors — one
  Arrow-batched pandas_udf computing ``sigmoid(b + Σ_t w[h(t)])``
  per document, where the Python tokenizer
  (:func:`~flashml_spark.functions.hashing.py_tokens`) and bucket
  hash (:func:`~flashml_spark.functions.hashing.hashing_tf_index`)
  are LITERAL mirrors of the training-side Spark expressions (each
  pinned by its own parity test, and the whole scorer pinned
  probability-equal to ``model.transform`` by
  ``test_quality_scorer_matches_ml_transform``).  No shuffle, no
  join: the 100 TB score pass is a single scan.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flashml_spark.functions import hashing as H


def fit_quality_classifier(
    positive_df: DataFrame,
    negative_df: DataFrame,
    text_col: str,
    n_features: int = 1 << 15,
    max_iter: int = 50,
    reg_param: float = 0.0,
    fit_sample_rows: int | None = 100_000,
    seed: int = 999,
) -> dict:
    """Fit the quality LR on hashed token counts; returns a plain
    serializable model ``{"weights": [n_features floats],
    "intercept": float, "n_features": int}`` — small enough to
    broadcast, engine-independent to store.

    ``fit_sample_rows`` hard-caps EACH side (count → Bernoulli
    oversample → limit, the ``fit_ivf_centroids`` bound) so the
    ``max_iter`` LR passes run over a bounded frame at any corpus
    size.  ``seed`` follows the reference's trainer convention
    (seed 999 across estimators) — it seeds the per-side samples; the
    LR solve itself is deterministic.
    """
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF

    from flashml_spark.operators.similarity import _bounded_fit_sample

    if n_features < 2:
        raise ValueError(f"n_features must be >= 2, got {n_features}")
    sides = []
    for label, side in ((1.0, positive_df), (0.0, negative_df)):
        s = _bounded_fit_sample(
            side.where(F.col(text_col).isNotNull()).select(text_col),
            None,
            fit_sample_rows,
            seed,
        )
        sides.append(s.select(
            H.tokens(F.col(text_col)).alias("__toks"),
            F.lit(label).alias("__label"),
        ))
    train = sides[0].unionByName(sides[1])
    tf = HashingTF(
        inputCol="__toks", outputCol="__features", numFeatures=n_features
    )
    lr = LogisticRegression(
        featuresCol="__features",
        labelCol="__label",
        maxIter=max_iter,
        regParam=reg_param,
    )
    from flashml_spark.training.estimators import strip_training_summary

    model = lr.fit(tf.transform(train))
    # fit-site convention (test_observe): drop the session-pinning
    # trainingSummary so the model never poisons later task closures
    strip_training_summary(model)
    return {
        "weights": [float(w) for w in model.coefficients],
        "intercept": float(model.intercept),
        "n_features": int(n_features),
    }


def score_quality_model(
    df: DataFrame,
    text_col: str,
    model: dict,
    out_col: str = "quality_score",
    keep_threshold: float | None = 0.5,
    round_to: int | None = 6,
) -> DataFrame:
    """Append the model's keep-probability (and, when
    ``keep_threshold`` is set, an ``is_kept`` 0/1 flag) to every row —
    the corpus-wide scoring pass of the GPT-3 recipe.

    Scale shape: ONE Arrow-batched pandas_udf over the text column
    with the ``n_features`` coefficient vector broadcast via
    ``SparkContext.broadcast`` — pure map, no shuffle; NULL text
    scores NULL (and ``is_kept`` 0).  GPT-3 itself resamples with a
    Pareto acceptance on this score; that is a one-line
    ``WHERE score > 1 - rv`` over any deterministic rv column
    downstream — the scorer stays sampling-free.
    """
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    n = int(model["n_features"])
    weights = np.asarray(model["weights"], dtype=np.float64)
    if weights.shape != (n,):
        raise ValueError(
            f"model weights length {weights.shape[0]} != n_features {n}"
        )
    intercept = float(model["intercept"])
    bweights = df.sparkSession.sparkContext.broadcast(weights)

    @pandas_udf("double")
    def score(s: pd.Series) -> pd.Series:
        w = bweights.value
        out = []
        for text in s:
            if text is None:
                out.append(None)
                continue
            z = intercept
            for tok in H.py_tokens(text):
                z += w[H.hashing_tf_index(tok, n)]
            z = min(max(z, -709.0), 709.0)  # exp() stays finite
            out.append(1.0 / (1.0 + np.exp(-z)))
        return pd.Series(out, dtype="float64")

    sc = score(F.col(text_col))
    if round_to is not None:
        sc = F.round(sc, round_to)
    out = df.withColumn(out_col, sc)
    if keep_threshold is not None:
        out = out.withColumn(
            "is_kept",
            (F.col(out_col) >= F.lit(float(keep_threshold)))
            .cast("int")
            .alias("is_kept"),
        ).fillna({"is_kept": 0})
    return out


def pareto_quality_filter(
    df: DataFrame,
    score_col: str,
    id_col: str,
    alpha: float = 9.0,
    out_col: str = "is_sampled",
    salt: str = "pareto",
    round_to: int = 6,
) -> DataFrame:
    """The GPT-3 acceptance step (Brown et al. 2020 Appendix A): keep a
    document iff ``score > 1 - x`` with ``x ~ Pareto(alpha)`` — the
    soft cut that keeps SOME low-scoring mass (diversity) while
    heavily favoring high scores (GPT-3 used alpha=9 on its LR
    quality score; compose with :func:`score_quality_model`).

    Reproducible twin of ``numpy.random.pareto``: inverse-CDF
    ``x = u^(-1/alpha) - 1`` with the engine's deterministic
    ``u = md5_uniform(salt || id)`` — so the rule is one pure column
    expression, ``score > 2 - u^(-1/alpha)``, identical in any SQL
    engine (each engine computes the SAME u from the SAME md5).  The
    threshold is rounded to ``round_to`` before comparing so the
    float boundary is engine-exact.

    Pure map — no shuffle; at 100 TB this rides the scoring scan.
    """
    if alpha <= 0:
        raise ValueError(f"alpha must be positive, got {alpha}")
    u = H.md5_uniform(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    threshold = F.round(
        F.lit(2.0) - F.pow(u, F.lit(-1.0 / alpha)), round_to
    )
    return df.withColumn("accept_threshold", threshold).withColumn(
        out_col,
        (F.col(score_col) > F.col("accept_threshold")).cast("int"),
    )
