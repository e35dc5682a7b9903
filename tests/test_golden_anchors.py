"""Golden-metric regression anchors.

The reference pins expected end-to-end metrics as constants and fails the
suite when an estimator-path change shifts them (its system tests assert
stored precision values from ``application.conf``-style config).  Same
posture here: two fixed-seed experiments over a fully deterministic
synthetic dataset (no RNG — pure index formulas, with deterministic label
noise so metrics sit strictly inside (0, 1) and are sensitive to drift).

Count-ratio metrics (accuracy/precision/recall/F1) and the rank-sum AUROC
are asserted EXACTLY — they are rationals of integer counts, stable across
runs.  The best-F2 threshold is an LR probability, which carries ~1e-12
tree-aggregation jitter between fits, so it is pinned to 6 decimals.

Regenerate after an INTENDED estimator change by running the experiments
under tests/conftest's session config (cpus=8, shuffle_partitions=8) and
updating the constants — never loosen the assertions instead.
"""

from __future__ import annotations

import pytest

from flashml_spark.experiment import Experiment, ExperimentConfig

TEXTS = {
    "billing": "pay my bill invoice due",
    "sales": "buy now great deal price",
    "support": "help me fix broken issue",
    "other": "just browsing around here",
}
INTENTS = ("billing", "sales", "support", "other")

BINARY_LR_ANCHORS = {
    "accuracy": 0.8854166666666666,
    "weightedPrecision": 0.8888326585695007,
    "weightedRecall": 0.8854166666666666,
    "weightedF1": 0.8862393162393163,
    "auroc": 0.9018518518518519,
}
BINARY_LR_BESTF2 = {
    "fbeta": 0.9183673469387755,
    "precision": 0.6923076923076923,
    "recall": 1.0,
    "accuracy": 0.8333333333333334,
    "threshold_6dp": 0.08914,
}
MULTI_NB_ANCHORS = {
    "accuracy": 0.84375,
    "weightedPrecision": 0.8557692307692307,
    "weightedRecall": 0.84375,
    "weightedF1": 0.8418427002583978,
}


def _anchor_df(spark, n=400):
    rows = []
    for i in range(n):
        intent = INTENTS[i % 4] if i % 5 else "other"
        # deterministic label noise: every 6th row carries the NEXT
        # intent's text, so classes overlap and metrics leave 1.0
        text_src = INTENTS[(INTENTS.index(intent) + 1) % 4] if i % 6 == 0 else intent
        text = TEXTS[text_src] + f" tok{i % 11}"
        rows.append(
            (
                f"{i:08x}",
                text,
                "mobile" if i % 4 < 2 else "desktop",
                float(i % 7),
                intent,
                "1" if intent != "other" else "0",
            )
        )
    return spark.createDataFrame(
        rows, ["session_id", "text", "device", "dwell", "intent", "response"]
    )


def test_binary_lr_anchors(spark):
    cfg = ExperimentConfig(
        primary_keys=["session_id"],
        response="response",
        text_cols=["text"],
        categorical_cols=["device"],
        numerical_cols=["dwell"],
        text_method="tfidf",
        slots=200,
        algorithm="logistic_regression",
        train_fraction=0.7,
        seed=20,
    )
    m = Experiment(cfg).run(spark, _anchor_df(spark))
    for key, expected in BINARY_LR_ANCHORS.items():
        assert m[key] == expected, f"{key}: {m[key]!r} != anchored {expected!r}"
    best = m["bestF2"]
    for key in ("fbeta", "precision", "recall", "accuracy"):
        assert best[key] == BINARY_LR_BESTF2[key], (key, best[key])
    assert round(best["threshold"], 6) == pytest.approx(
        BINARY_LR_BESTF2["threshold_6dp"], abs=1e-6
    )


def test_multi_intent_nb_anchors(spark):
    cfg = ExperimentConfig(
        primary_keys=["session_id"],
        response="intent",
        text_cols=["text"],
        categorical_cols=["device"],
        numerical_cols=["dwell"],
        text_method="tfidf",
        slots=200,
        algorithm="naive_bayes",
        multi_intent=True,
        train_fraction=0.7,
        seed=20,
    )
    m = Experiment(cfg).run(spark, _anchor_df(spark))
    for key, expected in MULTI_NB_ANCHORS.items():
        assert m[key] == expected, f"{key}: {m[key]!r} != anchored {expected!r}"
