"""Golden end-to-end runs over the REFERENCE'S shipped public datasets,
driven through the config-file CLI — mirroring the reference's own
system-test matrix, which replays `src/test/resources/*.json` configs
over `data/*.gz` (`systemTests/MultiIntentSVMTest.scala:24-107`).

The pinned metrics are THIS engine's fixed-seed goldens (SURVEY §5
stance: reference metrics are anchors, not cross-engine equality —
different tokenizers/optimizers legitimately give different numbers).
Any drift in sampling, preprocessing, vectorization, or training
changes these values, so they pin the whole pipeline end-to-end.
"""

from __future__ import annotations

import json
import os

import pytest

TITANIC = "/root/reference/data/titanic-survival-data.csv.gz"
YELP = "/root/reference/data/yelp-data/reviews_1k.json.gz"
WEB_JOURNEY = "/root/reference/data/web_journey_data.tsv.gz"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(TITANIC) and os.path.exists(YELP)),
    reason="reference datasets not present",
)


def test_titanic_binary_lr_golden(spark, tmp_path):
    """Binary LR on titanic-survival (the reference ships this dataset
    for its binary configs; cf. `binary_test_config.json` shape): csv.gz
    source -> SQL view chain casts/NULL-imputes -> random split ->
    categorical hashing + numeric assembly -> LR -> metrics."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "titanic_sp")
    cfg = {
        "project": {
            "id": "titanic_binary_lr",
            "logLevel": "ERROR",
            "data": {
                "location": {
                    "source": f"csv://{TITANIC}",
                    "queries": [
                        # CSV columns are strings; cast the numerics and
                        # impute NULL age with the classic 28.0 median
                        "SELECT pclass, sex, COALESCE(embarked, '') AS embarked, "
                        "CAST(COALESCE(age, '28.0') AS DOUBLE) AS age, "
                        "CAST(sibsp AS DOUBLE) AS sibsp, "
                        "CAST(parch AS DOUBLE) AS parch, "
                        "CAST(COALESCE(fare, '0') AS DOUBLE) AS fare, "
                        "survived FROM flashml_table_in"
                    ],
                },
                "responseVariable": "survived",
                "categoricalVariables": ["pclass", "sex", "embarked"],
                "numericalVariables": ["age", "sibsp", "parch", "fare"],
            },
        },
        "sampling": {"type": "random", "trainFraction": 0.8, "seed": 20},
        "model": {"algorithm": "logistic_regression"},
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "titanic.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    # fixed-seed goldens for THIS engine (seed 20 split, deterministic LR;
    # byte-identical across repeated runs — verified twice before pinning)
    for key, want in GOLDEN_TITANIC.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    # sanity floor independent of the golden pin
    assert metrics["test.accuracy"] > 0.75


def test_yelp_multiintent_nb_golden(spark, tmp_path):
    """Multi-intent Naive Bayes on yelp reviews_1k — the reference's
    `multiIntent_nb_test_config.json` scenario (stars as the intent
    label, count_vectorizer 15000 slots, multinomial NB) replayed
    through this engine's CLI on the same shipped dataset."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "yelp_sp")
    cfg = {
        "project": {
            "id": "yelp_multiintent_nb",
            "logLevel": "ERROR",
            "data": {
                "location": {"source": f"json://{YELP}"},
                "primaryKey": ["review_id"],
                "responseVariable": "stars",
                "textVariables": ["text"],
            },
        },
        "sampling": {"type": "random", "trainFraction": 0.7, "seed": 20},
        "vectorization": {"text": {"method": "count_vectorizer", "slots": 15000}},
        "model": {"algorithm": "naive_bayes", "multiIntent": True},
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "yelp.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_YELP.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    # 5-class problem: meaningful lift over random (20%)
    assert metrics["test.accuracy"] > 0.40


def test_web_journey_binary_lr_conditional_split_golden(spark, tmp_path):
    """Binary LR on the reference's web-journey dataset with the exact
    `binary_test_config.json` scenario: purchase_flag response,
    URL/referrer text + categorical/numerical roles, and the reference's
    CONDITIONAL split on the rv column (train rv<=80 / test rv>80,
    `sample.condition` in the config)."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "wj_sp")
    cfg = {
        "project": {
            "id": "web_journey_binary_lr",
            "logLevel": "ERROR",
            "data": {
                "location": {
                    "source": f"tsv://{WEB_JOURNEY}",
                    "queries": [
                        "SELECT COALESCE(current_page_url, '') AS current_page_url, "
                        "COALESCE(referrer, '') AS referrer, "
                        "COALESCE(initial_referrer_cat, '') AS initial_referrer_cat, "
                        "COALESCE(browser_cat, '') AS browser_cat, "
                        "COALESCE(isp, '') AS isp, COALESCE(os_cat, '') AS os_cat, "
                        "COALESCE(dd, '') AS dd, "
                        "COALESCE(hour_of_day, '0') AS hour_of_day, "
                        "CAST(COALESCE(no_of_visits_in_last_7_days, '0') AS DOUBLE) "
                        "AS no_of_visits_in_last_7_days, "
                        "CAST(COALESCE(session_time, '0') AS DOUBLE) AS session_time, "
                        "CAST(COALESCE(rv, '0') AS DOUBLE) AS rv, "
                        "purchase_flag FROM flashml_table_in "
                        "WHERE purchase_flag IS NOT NULL"
                    ],
                },
                "responseVariable": "purchase_flag",
                "randomVariable": "rv",
                "textVariables": ["current_page_url", "referrer"],
                "categoricalVariables": [
                    "initial_referrer_cat", "browser_cat", "isp", "os_cat",
                    "dd", "hour_of_day",
                ],
                "numericalVariables": [
                    "no_of_visits_in_last_7_days", "session_time",
                ],
            },
        },
        "sampling": {"type": "conditional", "conditions": ["rv<=80", "rv>80"]},
        "vectorization": {"text": {"method": "tfidf", "slots": 2000}},
        "model": {"algorithm": "logistic_regression"},
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "web_journey.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_WEB_JOURNEY.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.auroc"] > 0.75


def test_yelp_multiintent_svm_platt_topk_golden(spark, tmp_path):
    """Multi-intent SVM with Platt scaling and top-K intents on yelp —
    the reference's flagship NLP scenario
    (`multiIntent_svm_test_config.json`: OVR SVM,
    plattScalingEnabled=true) plus the TopKIntents tail, end-to-end
    through the CLI on the shipped dataset."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "yelp_svm_sp")
    cfg = {
        "project": {
            "id": "yelp_multiintent_svm",
            "logLevel": "ERROR",
            "data": {
                "location": {"source": f"json://{YELP}"},
                "primaryKey": ["review_id"],
                "responseVariable": "stars",
                "textVariables": ["text"],
            },
        },
        "sampling": {"type": "random", "trainFraction": 0.7, "seed": 20},
        "vectorization": {"text": {"method": "count_vectorizer", "slots": 15000}},
        "model": {
            "algorithm": "svm",
            "multiIntent": True,
            "platt": True,
            "topK": 3,
            "params": {"regParam": 0.1, "maxIter": 20},
        },
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "yelp_svm.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_YELP_SVM.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.accuracy"] > 0.40


# Pinned from the first green run (verified identical on a second run);
# see module docstring for what a change here means.
GOLDEN_TITANIC = {
    "test.accuracy": 0.7805755395683454,
    "test.auroc": 0.8342864923747276,
    "test.weightedF1": 0.7791141822832289,
}
GOLDEN_YELP = {
    "test.accuracy": 0.45544554455445546,
    "test.weightedF1": 0.40702506539022465,
    "test.weightedPrecision": 0.5838778877887788,
}
# purchase_flag is heavily imbalanced (majority ~0.975), so auroc is the
# meaningful signal for web-journey; accuracy pins determinism
GOLDEN_WEB_JOURNEY = {
    "test.accuracy": 0.9752415140157314,
    "test.auroc": 0.8219835422877038,
    "test.weightedF1": 0.968447090958351,
}
# re-pinned round 5: the config loader's flattener had silently dropped
# dict-valued keys (model.params), so the original pin ran DEFAULT SVM
# params; with regParam=0.1/maxIter=20 actually applied the model improves
GOLDEN_YELP_SVM = {
    "test.accuracy": 0.5016501650165016,
    "test.weightedF1": 0.5002251453289693,
}
GOLDEN_TITANIC_CV = {
    "test.accuracy": 0.7697841726618705,
    "test.auroc": 0.8296568627450981,
    "test.weightedF1": 0.7680031041479812,
}
GOLDEN_TITANIC_HB = {
    "test.accuracy": 0.7805755395683454,
    "test.auroc": 0.8281318082788671,
    "test.weightedF1": 0.7764275299071584,
}


_TITANIC_QUERY = (
    "SELECT pclass, sex, COALESCE(embarked, '') AS embarked, "
    "CAST(COALESCE(age, '28.0') AS DOUBLE) AS age, "
    "CAST(sibsp AS DOUBLE) AS sibsp, CAST(parch AS DOUBLE) AS parch, "
    "CAST(COALESCE(fare, '0') AS DOUBLE) AS fare, "
    "survived FROM flashml_table_in"
)


def _titanic_cfg(pid, root):
    return {
        "project": {
            "id": pid,
            "logLevel": "ERROR",
            "data": {
                "location": {
                    "source": f"csv://{TITANIC}",
                    "queries": [_TITANIC_QUERY],
                },
                "responseVariable": "survived",
                "categoricalVariables": ["pclass", "sex", "embarked"],
                "numericalVariables": ["age", "sibsp", "parch", "fare"],
            },
        },
        "sampling": {"type": "random", "trainFraction": 0.8, "seed": 20},
        "model": {"algorithm": "logistic_regression"},
        "savepoint": {"root": root},
    }


def test_titanic_lr_grid_cv_golden(spark, tmp_path):
    """Grid-CV tuning scenario on titanic — the reference's *_cv_test
    configs (`binary_gbt_cv_test_config.json` family) replayed with an
    LR regParam grid.  The pinned metrics DIFFER from the plain-LR
    golden, proving the chosen grid point reaches the refit model (the
    round-5 config-flattener regression ran the untuned model
    silently)."""
    import json as _json

    from flashml_spark.__main__ import main

    root = str(tmp_path / "titanic_cv_sp")
    cfg = _titanic_cfg("titanic_lr_cv", root)
    cfg["tuning"] = {
        "type": "cv",
        "paramGrid": {"regParam": [0.01, 0.1]},
        "folds": 3,
        "metric": "weightedPrecision",
    }
    cfg_path = tmp_path / "titanic_cv.json"
    cfg_path.write_text(_json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = _json.load(f)
    for key, want in GOLDEN_TITANIC_CV.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.accuracy"] != GOLDEN_TITANIC["test.accuracy"]


def test_titanic_lr_hyperband_golden(spark, tmp_path):
    """HyperBand tuning scenario on titanic — the reference's
    *_hyperband configs (`binary_gbt_hyperband.json` family) replayed
    with an LR regParam space (maxIter 9, eta 3)."""
    import json as _json

    from flashml_spark.__main__ import main

    root = str(tmp_path / "titanic_hb_sp")
    cfg = _titanic_cfg("titanic_lr_hb", root)
    cfg["tuning"] = {
        "type": "hyperband",
        "paramRanges": {"regParam": [0.001, 0.01, 0.1, 0.3]},
        "metric": "weightedPrecision",
        "hyperband": {
            "maxIter": 9,
            "eta": 3,
            "iterationMultiplier": 2,
            "maxIterationsFinalModel": 50,
        },
    }
    cfg_path = tmp_path / "titanic_hb.json"
    cfg_path.write_text(_json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = _json.load(f)
    for key, want in GOLDEN_TITANIC_HB.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.auroc"] != GOLDEN_TITANIC["test.auroc"]


_WEB_JOURNEY_PAGE_QUERY = (
    "SELECT COALESCE(current_page_url, '') AS current_page_url, "
    "COALESCE(referrer, '') AS referrer, "
    "COALESCE(initial_referrer_cat, '') AS initial_referrer_cat, "
    "COALESCE(browser_cat, '') AS browser_cat, "
    "COALESCE(isp, '') AS isp, COALESCE(os_cat, '') AS os_cat, "
    "COALESCE(dd, '') AS dd, COALESCE(hour_of_day, '0') AS hour_of_day, "
    "CAST(COALESCE(no_of_visits_in_last_7_days, '0') AS DOUBLE) "
    "AS no_of_visits_in_last_7_days, "
    "CAST(COALESCE(rv, '0') AS DOUBLE) AS rv, "
    "CAST(COALESCE(nop_count, '1') AS INT) AS nop_count, "
    "CAST(COALESCE(page_count, '1') AS INT) AS page_count, "
    "CAST(COALESCE(repeatVisitor, '0') AS DOUBLE) AS repeatVisitor, "
    "purchase_flag FROM flashml_table_in WHERE purchase_flag IS NOT NULL"
)


def _web_journey_page_cfg(pid, root):
    """The reference's page-level web-journey scenario shape
    (`singleIntent_svm_PG_test_config.json` /
    `singleIntent_svm_PGUP_test_config.json`): pageVariable nop_count,
    4 page models (page>=4 folds into the last), customFilter
    page_count<=10, conditional rv split — with LR as the estimator."""
    return {
        "project": {
            "id": pid,
            "logLevel": "ERROR",
            "data": {
                "location": {
                    "source": f"tsv://{WEB_JOURNEY}",
                    "queries": [_WEB_JOURNEY_PAGE_QUERY],
                },
                "responseVariable": "purchase_flag",
                "randomVariable": "rv",
                "pageVariable": "nop_count",
                "numPages": 4,
                "filter": "page_count<=10",
                "textVariables": ["current_page_url", "referrer"],
                "categoricalVariables": [
                    "initial_referrer_cat", "browser_cat", "isp", "os_cat",
                    "dd", "hour_of_day",
                ],
                "numericalVariables": ["no_of_visits_in_last_7_days"],
            },
        },
        "sampling": {"type": "conditional", "conditions": ["rv<=80", "rv>80"]},
        "vectorization": {"text": {"method": "tfidf", "slots": 2000}},
        "model": {"algorithm": "logistic_regression"},
        "savepoint": {"root": root},
    }


def test_web_journey_page_level_lr_golden(spark, tmp_path):
    """Page-level modelling on the reference's shipped web-journey data:
    one LR per nop_count page (4 models, page>=4 folded into the last),
    the reference's customFilter and conditional rv split, end-to-end
    through the config CLI.  Pins overall AND per-page metrics — the
    per-page rows prove the fan-out actually trained distinct models."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "wj_pg_sp")
    cfg = _web_journey_page_cfg("web_journey_page_lr", root)
    cfg_path = tmp_path / "wj_pg.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_WEB_JOURNEY_PAGE.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    # the four page models must all have scored rows and distinct metrics
    page_accs = [metrics[f"test.page{k}.accuracy"] for k in range(4)]
    assert len(set(page_accs)) > 1


def test_web_journey_uplift_lr_golden(spark, tmp_path):
    """Uplift modelling on shipped web-journey data — the reference's
    `treatmentVariable` scenario (`singleIntent_svm_UP_test_config.json`
    shape, LR estimator): repeatVisitor rides as the LAST feature slot,
    scoring runs twice with it forced 0/1, and probability becomes
    [1-d, d] (UpliftTransformer.scala:93-148 semantics).  auroc over the
    uplift score is the pinned signal; prediction is the constant 1.0
    the transformer emits, so accuracy pins only determinism."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "wj_up_sp")
    cfg = _web_journey_page_cfg("web_journey_uplift_lr", root)
    # noPage uplift: drop the page fan-out, add the treatment variable
    del cfg["project"]["data"]["pageVariable"]
    del cfg["project"]["data"]["numPages"]
    cfg["project"]["data"]["numericalVariables"].append("repeatVisitor")
    cfg["model"]["upliftTreatment"] = "repeatVisitor"
    cfg_path = tmp_path / "wj_up.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_WEB_JOURNEY_UPLIFT.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key


# Pinned from the first green run, verified byte-identical on a second
# full run (same discipline as the r5 goldens above).
GOLDEN_WEB_JOURNEY_PAGE = {
    "test.accuracy": 0.9785710257711611,
    "test.auroc": 0.8265011768963194,
    "test.weightedF1": 0.9739452197669061,
    "test.page0.accuracy": 0.9917653113741637,
    "test.page1.accuracy": 0.9752941176470589,
    "test.page2.accuracy": 0.9569569569569569,
    "test.page3.accuracy": 0.950381679389313,
}
# uplift probability is the treatment-EFFECT score d = p1 - p0, not an
# outcome propensity: auroc against the outcome label is NOT expected to
# beat 0.5 (the pin is determinism), and prediction is the constant 1.0
# UpliftTransformer emits, so accuracy equals the positive rate.
GOLDEN_WEB_JOURNEY_UPLIFT = {
    "test.accuracy": 0.024023007951277278,
    "test.auroc": 0.29565264509380584,
    "test.weightedF1": 0.0011271327041405496,
}


def test_web_journey_svm_preprocessing_chain_golden(spark, tmp_path):
    """Config-driven preprocessing chains on shipped web-journey data —
    the reference's `singleIntent_svm_PG*_test_config.json` preprocessing
    shape: nullcheck -> case_normalization -> tokenizer('/') per URL
    variable, hashingtf(2000) vectorization, SVM(regparam .01, maxiter
    10) with Platt scaling, conditional rv split.  This is the first e2e
    exercise of `preprocessing.steps` through the CLI: the chain's
    output variables are what vectorization reads (the raw URL columns
    never reach the vectorizer)."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "wj_prep_sp")
    cfg = {
        "project": {
            "id": "web_journey_svm_prep",
            "logLevel": "ERROR",
            "data": {
                "location": {
                    "source": f"tsv://{WEB_JOURNEY}",
                    "queries": [
                        "SELECT current_page_url, referrer, "
                        "COALESCE(browser_cat, '') AS browser_cat, "
                        "COALESCE(os_cat, '') AS os_cat, "
                        "CAST(COALESCE(rv, '0') AS DOUBLE) AS rv, "
                        "purchase_flag FROM flashml_table_in "
                        "WHERE purchase_flag IS NOT NULL"
                    ],
                },
                "responseVariable": "purchase_flag",
                "randomVariable": "rv",
                "textVariables": ["current_page_url1", "referrer1"],
                "categoricalVariables": ["browser_cat", "os_cat"],
            },
        },
        "preprocessing": {
            "steps": [
                {
                    "inputVariable": "current_page_url",
                    "outputVariable": "current_page_url1",
                    "transformations": [
                        {"type": "nullcheck", "parameter": ""},
                        {"type": "case_normalization"},
                        {"type": "tokenizer", "parameter": "/"},
                    ],
                },
                {
                    "inputVariable": "referrer",
                    "outputVariable": "referrer1",
                    "transformations": [
                        {"type": "nullcheck", "parameter": ""},
                        {"type": "case_normalization"},
                        {"type": "tokenizer", "parameter": "/"},
                    ],
                },
            ]
        },
        "sampling": {"type": "conditional", "conditions": ["rv<=80", "rv>80"]},
        "vectorization": {"text": {"method": "hashingtf", "slots": 2000}},
        "model": {
            "algorithm": "svm",
            "params": {"regParam": 0.01, "maxIter": 10},
        },
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "wj_prep.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_WEB_JOURNEY_PREP.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.auroc"] > 0.5


# Pinned from the first green run, byte-identical on a second full run.
GOLDEN_WEB_JOURNEY_PREP = {
    "test.accuracy": 0.9745552446814126,
    "test.auroc": 0.7911479209447377,
    "test.weightedF1": 0.9674312508875317,
}


def test_yelp_multiintent_lr_stratified_golden(spark, tmp_path):
    """Multi-intent LR on yelp with STRATIFIED sampling — the
    reference's `multiIntent_lr_stratifiedSampling_test_config.json`
    scenario: per-class exact 70/30 split (seed 20) instead of the
    random split, count_vectorizer, multinomial LR.  The train-side
    class proportions therefore match the full dataset's exactly —
    asserted against the raw data below, which is what distinguishes
    this golden from the random-split yelp runs."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "yelp_strat_sp")
    cfg = {
        "project": {
            "id": "yelp_multiintent_lr_stratified",
            "logLevel": "ERROR",
            "data": {
                "location": {"source": f"json://{YELP}"},
                "primaryKey": ["review_id"],
                "responseVariable": "stars",
                "textVariables": ["text"],
            },
        },
        "sampling": {"type": "stratified", "trainFraction": 0.7, "seed": 20},
        "vectorization": {"text": {"method": "count_vectorizer", "slots": 15000}},
        "model": {"algorithm": "logistic_regression", "multiIntent": True},
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "yelp_strat.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_YELP_STRATIFIED.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    # stratification check straight from the savepointed split
    # (reference dir contract: <root>/<project>/<model>/page0/noSegment/
    # data/<step><Dataset>): per-class train counts are the exact
    # floor/ceil of 70% of the class sizes
    base = f"{root}/default/model/page0/noSegment/data"
    train = spark.read.parquet(f"{base}/samplingTrain")
    full = spark.read.parquet(f"{base}/dataReaderFull")
    tc = {r["stars"]: r["count"] for r in train.groupBy("stars").count().collect()}
    fc = {r["stars"]: r["count"] for r in full.groupBy("stars").count().collect()}
    for cls, n in fc.items():
        assert abs(tc[cls] - 0.7 * n) <= 1, cls


# Pinned from the first green run, byte-identical on a second full run.
GOLDEN_YELP_STRATIFIED = {
    "test.accuracy": 0.4633333333333333,
    "test.weightedF1": 0.4531823987513469,
    "test.weightedPrecision": 0.4534433896436471,
}


def test_titanic_rf_and_gbt_goldens(spark, tmp_path):
    """Remaining algorithm scenario classes through the CLI on titanic —
    the reference's `binaryRF_test_config.json`,
    `binary_gbt_test_config.json`, `binary_decisionTree_test_config.json`
    and the MLP config shapes (seed-999 estimators, seed-20 split).  All
    pinned after byte-identical repeat runs; together with the LR/NB/SVM
    goldens above, EVERY ALGORITHMS entry now runs end-to-end on shipped
    data through the config CLI."""
    from flashml_spark.__main__ import main

    for algo, params, golden in (
        ("random_forest", {}, GOLDEN_TITANIC_RF),
        ("gradient_boosted_trees", {}, GOLDEN_TITANIC_GBT),
        # "decision_trees" = the reference's plural configChecks spelling
        # (the loader normalizes it — r6 regression where neither
        # spelling passed both validators)
        ("decision_trees", {}, GOLDEN_TITANIC_DT),
        ("multilayer_perceptron", {"hiddenLayers": [10]}, GOLDEN_TITANIC_MLP),
    ):
        root = str(tmp_path / f"titanic_{algo}_sp")
        cfg = _titanic_cfg(f"titanic_{algo}", root)
        cfg["model"] = {"algorithm": algo}
        if params:
            cfg["model"]["params"] = params
        cfg_path = tmp_path / f"titanic_{algo}.json"
        cfg_path.write_text(json.dumps(cfg))
        assert main([str(cfg_path)]) == 0
        with open(f"{root}/metrics/metrics.json") as f:
            metrics = json.load(f)
        for key, want in golden.items():
            assert metrics[key] == pytest.approx(want, abs=1e-9), (algo, key)


# Pinned from the first green run, byte-identical on a second full run.
GOLDEN_TITANIC_RF = {
    "test.accuracy": 0.8093525179856115,
    "test.auroc": 0.8389978213507625,
    "test.weightedF1": 0.8046320327075223,
}
GOLDEN_TITANIC_GBT = {
    "test.accuracy": 0.8129496402877698,
    "test.auroc": 0.8529139433551198,
    "test.weightedF1": 0.809149734554662,
}
GOLDEN_TITANIC_DT = {
    "test.accuracy": 0.7985611510791367,
    "test.auroc": 0.8509803921568627,
    "test.weightedF1": 0.7944689449050206,
}
GOLDEN_TITANIC_MLP = {
    "test.accuracy": 0.7589928057553957,
    "test.auroc": 0.7798202614379085,
    "test.weightedF1": 0.7583495393148791,
}


def test_yelp_tuned_multiintent_goldens(spark, tmp_path):
    """Tuned multi-intent scenario classes on yelp — the reference's
    `multiIntent_nb_cv_test_config.json` (smoothing grid [3,5,7], 2
    folds) and `multiIntent_lr_hyperband_test_config.json` shapes
    through the CLI.  The NB-CV golden differs from the untuned yelp NB
    golden, proving the chosen grid point reaches the refit model.
    (The OVR-SVM tuned scenarios are covered separately by
    test_yelp_multiintent_svm_cv_and_hyperband_goldens.)"""
    from flashml_spark.__main__ import main

    def base_cfg(pid, root, algo):
        return {
            "project": {
                "id": pid,
                "logLevel": "ERROR",
                "data": {
                    "location": {"source": f"json://{YELP}"},
                    "primaryKey": ["review_id"],
                    "responseVariable": "stars",
                    "textVariables": ["text"],
                },
            },
            "sampling": {"type": "random", "trainFraction": 0.7, "seed": 20},
            "vectorization": {
                "text": {"method": "count_vectorizer", "slots": 15000}
            },
            "model": {"algorithm": algo, "multiIntent": True},
            "savepoint": {"root": root},
        }

    root = str(tmp_path / "yelp_nbcv_sp")
    cfg = base_cfg("yelp_nb_cv", root, "naive_bayes")
    cfg["tuning"] = {
        "type": "cv",
        "paramGrid": {"smoothing": [3.0, 5.0, 7.0]},
        "folds": 2,
        "metric": "weightedPrecision",
    }
    cfg_path = tmp_path / "yelp_nbcv.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_YELP_NB_CV.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.accuracy"] != GOLDEN_YELP["test.accuracy"]

    root = str(tmp_path / "yelp_lrhb_sp")
    cfg = base_cfg("yelp_lr_hb", root, "logistic_regression")
    cfg["tuning"] = {
        "type": "hyperband",
        "paramRanges": {"regParam": [0.001, 0.01, 0.1, 0.3]},
        "metric": "weightedPrecision",
        "hyperband": {
            "maxIter": 9,
            "eta": 3,
            "iterationMultiplier": 2,
            "maxIterationsFinalModel": 50,
        },
    }
    cfg_path = tmp_path / "yelp_lrhb.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_YELP_LR_HB.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key


# Pinned from the first green run, byte-identical on a second full run.
GOLDEN_YELP_NB_CV = {
    "test.accuracy": 0.38943894389438943,
    "test.weightedF1": 0.2841770174545505,
    "test.weightedPrecision": 0.5788239961305423,
}
GOLDEN_YELP_LR_HB = {
    "test.accuracy": 0.45874587458745875,
    "test.weightedF1": 0.46069141715558243,
    "test.weightedPrecision": 0.47811552425373277,
}


def test_yelp_multiintent_svm_cv_and_hyperband_goldens(spark, tmp_path):
    """Grid CV and HyperBand composed around the multi-intent OVR-SVM
    ensemble — the reference's last two unreplayed scenario shapes
    (`multiIntent_svm_cv_test_config.json`: regparam grid [0.01, 0.1],
    2 folds, f1 metric, Platt enabled; `multiIntent_svm_hyperband_test_
    config.json`: regparam range, iterations=3, eta=3, iterMultiplier=2;
    semantics `CrossValidatorCustom.scala:124-306`).  Until r8 the
    OVR-SVM path returned before the tuning branches, so a user's tuning
    block was SILENTLY ignored; each tuned golden must differ from the
    untuned GOLDEN_YELP_SVM pin, proving the chosen point reaches the
    refit ensemble."""
    from flashml_spark.__main__ import main

    def svm_cfg(pid, root):
        return {
            "project": {
                "id": pid,
                "logLevel": "ERROR",
                "data": {
                    "location": {"source": f"json://{YELP}"},
                    "primaryKey": ["review_id"],
                    "responseVariable": "stars",
                    "textVariables": ["text"],
                },
            },
            "sampling": {"type": "random", "trainFraction": 0.7, "seed": 20},
            "vectorization": {
                "text": {"method": "count_vectorizer", "slots": 15000}
            },
            "model": {
                "algorithm": "svm",
                "multiIntent": True,
                "platt": True,
                "params": {"maxIter": 10},
            },
            "savepoint": {"root": root},
        }

    root = str(tmp_path / "yelp_svmcv_sp")
    cfg = svm_cfg("yelp_svm_cv", root)
    cfg["tuning"] = {
        "type": "cv",
        "paramGrid": {"regParam": [0.01, 0.1]},
        "folds": 2,
        "metric": "f1",
    }
    cfg_path = tmp_path / "yelp_svmcv.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        cv_metrics = json.load(f)
    print("YELP_SVM_CV_GOLDEN", {
        k: cv_metrics[k]
        for k in ("test.accuracy", "test.weightedF1", "test.weightedPrecision")
    })
    for key, want in GOLDEN_YELP_SVM_CV.items():
        assert cv_metrics[key] == pytest.approx(want, abs=1e-9), key
    assert cv_metrics["test.accuracy"] != GOLDEN_YELP_SVM["test.accuracy"]

    root = str(tmp_path / "yelp_svmhb_sp")
    cfg = svm_cfg("yelp_svm_hb", root)
    cfg["tuning"] = {
        "type": "hyperband",
        "paramRanges": {"regParam": [0.001, 0.01, 0.1, 0.3]},
        "metric": "weightedPrecision",
        "hyperband": {
            "maxIter": 3,
            "eta": 3,
            "iterationMultiplier": 2,
            "maxIterationsFinalModel": 20,
        },
    }
    cfg_path = tmp_path / "yelp_svmhb.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        hb_metrics = json.load(f)
    print("YELP_SVM_HB_GOLDEN", {
        k: hb_metrics[k]
        for k in ("test.accuracy", "test.weightedF1", "test.weightedPrecision")
    })
    for key, want in GOLDEN_YELP_SVM_HB.items():
        assert hb_metrics[key] == pytest.approx(want, abs=1e-9), key
    assert hb_metrics["test.accuracy"] != GOLDEN_YELP_SVM["test.accuracy"]


# Pinned from the first green run, byte-identical on a second full run.
GOLDEN_YELP_SVM_CV = {
    "test.accuracy": 0.47854785478547857,
    "test.weightedF1": 0.4822703716725912,
    "test.weightedPrecision": 0.494778513490762,
}
GOLDEN_YELP_SVM_HB = {
    "test.accuracy": 0.47194719471947194,
    "test.weightedF1": 0.4693663064225138,
    "test.weightedPrecision": 0.47171101576375235,
}


def test_titanic_lr_binning_golden(spark, tmp_path):
    """Config-driven feature binning through the CLI — the reference's
    `binning_test_config.json` / `binaryLR_binning_test_noPage.json`
    scenario class: age equidistant(8) + fare intervals([10,50,100]);
    the binned variables leave the numerical list and vectorize as
    categoricals.  The pinned metrics DIFFER from the unbinned titanic
    LR golden, proving the binning stages actually re-shaped the
    features."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "titanic_bin_sp")
    cfg = _titanic_cfg("titanic_lr_binning", root)
    cfg["featuregeneration"] = {"binning": [
        {"variable": "age", "type": "equidistant", "buckets": 8},
        {"variable": "fare", "type": "intervals", "splits": [10.0, 50.0, 100.0]},
    ]}
    cfg_path = tmp_path / "titanic_bin.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_TITANIC_BINNING.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.accuracy"] != GOLDEN_TITANIC["test.accuracy"]


def test_web_journey_pgup_svm_golden(spark, tmp_path):
    """The reference's RICHEST scenario composition —
    `singleIntent_svm_PGUP_test_config.json`: page-level (4 nop_count
    models) + uplift (repeatVisitor last-slot) + SVM + Platt + custom
    filter + conditional rv split, end-to-end through the CLI.  This is
    the scenario that required margin-model uplift support: LinearSVC
    emits no probability, so each counterfactual scoring maps its
    margin through the SAME per-page Platt sigmoid the calibrated
    pipeline uses."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "wj_pgup_sp")
    cfg = _web_journey_page_cfg("web_journey_pgup_svm", root)
    cfg["project"]["data"]["numericalVariables"].append("repeatVisitor")
    cfg["model"] = {
        "algorithm": "svm",
        "params": {"regParam": 0.01, "maxIter": 10},
        "upliftTreatment": "repeatVisitor",
    }
    cfg_path = tmp_path / "wj_pgup.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    for key, want in GOLDEN_WEB_JOURNEY_PGUP.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key


# Pinned from the first green run, byte-identical on a second full run.
GOLDEN_TITANIC_BINNING = {
    "test.accuracy": 0.7841726618705036,
    "test.auroc": 0.8407135076252723,
    "test.weightedF1": 0.7829607494846402,
}
# uplift semantics: prediction is the constant 1.0, so accuracy = the
# positive rate; auroc over the uplift score pins determinism (see the
# uplift-LR golden's rationale above)
GOLDEN_WEB_JOURNEY_PGUP = {
    "test.accuracy": 0.024023007951277278,
    "test.auroc": 0.32039717165108095,
    "test.weightedF1": 0.0011271327041405496,
    "test.page0.accuracy": 0.008131755018013382,
    "test.page3.accuracy": 0.07633587786259542,
}


def test_titanic_lr_imputer_chain_golden(spark, tmp_path):
    """The reference's `multiIntent_lr_withImputer_test_config.json`
    scenario class: imputers INSIDE config preprocessing chains — a text
    variable's chain opens with nullcheck (impute "" + indicator) before
    case_normalization/stopwords/stemming/tokenizer, AND a second
    numeric-only step imputes age with "0" (typed NullImputer).  The
    numeric chain has no text consumer, exercising the non-text chain
    path; its imputed value must reach the assembler (pinned below by
    the golden differing when the imputer is dropped)."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "titanic_imp_sp")
    cfg = {
        "project": {
            "id": "titanic_lr_imputer",
            "logLevel": "ERROR",
            "data": {
                "location": {
                    "source": f"csv://{TITANIC}",
                    "queries": [
                        # home_dest/age arrive RAW (nullable) — the imputers
                        # in the preprocessing chains do the null handling,
                        # unlike the other titanic goldens' SQL COALESCE
                        "SELECT ticket, home_dest, "
                        "CAST(age AS DOUBLE) AS age, "
                        "CAST(sibsp AS DOUBLE) AS sibsp, "
                        "survived FROM flashml_table_in "
                        "WHERE survived IS NOT NULL"
                    ],
                },
                "primaryKey": ["ticket"],
                "responseVariable": "survived",
                "textVariables": ["linetext1"],
                "numericalVariables": ["age", "sibsp"],
            },
        },
        "preprocessing": {
            "steps": [
                {
                    "inputVariable": "home_dest",
                    "outputVariable": "linetext1",
                    "transformations": [
                        {"type": "nullcheck", "parameter": "tempText"},
                        {"type": "case_normalization"},
                        {"type": "stopwords", "parameter": ["the", "of", "a"]},
                        {"type": "stemming", "parameter": []},
                        {"type": "tokenizer", "parameter": "[.,? /]"},
                    ],
                },
                {
                    "inputVariable": "age",
                    "transformations": [
                        {"type": "nullcheck", "parameter": "0"},
                    ],
                },
            ]
        },
        "sampling": {"type": "random", "trainFraction": 0.8, "seed": 20},
        "vectorization": {"text": {"method": "hashingtf", "slots": 15000}},
        "model": {"algorithm": "logistic_regression"},
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "titanic_imp.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    print("IMPUTER_GOLDEN", {k: metrics[k] for k in
          ("test.accuracy", "test.auroc", "test.weightedF1")})
    for key, want in GOLDEN_TITANIC_IMPUTER.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    assert metrics["test.accuracy"] > 0.55


def test_yelp_mlp_cv_golden(spark, tmp_path):
    """MLP with grid-CV on yelp — the reference's
    `multiIntent_mlp_cv_test_config.json` scenario class: the CV grid is
    declared over `intermediateLayers` ([[4,4],[5,5]]) exactly as the
    reference writes it, and the engine wraps each hidden spec with the
    sniffed input dim and class count to form the Spark `layers` param
    (ModelTrainingUtils.scala:341-361).  Slots reduced 15000 -> 1000 to
    bound test runtime; the scenario class (MLP + CV + layer grid) is
    what's replayed."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "yelp_mlpcv_sp")
    cfg = {
        "project": {
            "id": "yelp_mlp_cv",
            "logLevel": "ERROR",
            "data": {
                "location": {"source": f"json://{YELP}"},
                "primaryKey": ["review_id"],
                "responseVariable": "stars",
                "textVariables": ["text"],
            },
        },
        "sampling": {"type": "random", "trainFraction": 0.7, "seed": 20},
        "vectorization": {"text": {"method": "hashingtf", "slots": 1000}},
        "model": {
            "algorithm": "multilayer_perceptron",
            "multiIntent": True,
            "params": {"maxIter": 40, "blockSize": 128},
        },
        "tuning": {
            "type": "cv",
            "paramGrid": {"intermediateLayers": [[4, 4], [5, 5]]},
            "folds": 2,
        },
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "yelp_mlpcv.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)
    print("MLPCV_GOLDEN", {k: metrics[k] for k in
          ("test.accuracy", "test.weightedF1")})
    for key, want in GOLDEN_YELP_MLP_CV.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key
    # 5-class problem: the tuned MLP must beat the majority class floor
    assert metrics["test.accuracy"] > 0.30


def test_web_journey_total_visitors_custom_metrics_golden(spark, tmp_path):
    """The reference's `totalVisitorsCount_test_config.json` scenario —
    the custom-metrics step (WebCustomMetricsEvaluator.scala:126-189):
    page-level LR over nop_count with primaryKey (vid, active_session,
    dt), then the journey-level hotlead rollup — per page: hotLead
    visitor count, global totalVisitor / totalPositiveClass, hotleadRate
    and captureRate, prob thresholds from each page's best-F2 sweep."""
    from flashml_spark.__main__ import main

    root = str(tmp_path / "wj_tv_sp")
    cfg = _web_journey_page_cfg("web_journey_total_visitors", root)
    cfg["project"]["data"]["location"]["queries"] = [
        _WEB_JOURNEY_PAGE_QUERY.replace(
            "SELECT ",
            "SELECT COALESCE(vid, '') AS vid, "
            "COALESCE(active_session, '') AS active_session, "
            "COALESCE(dt, '') AS dt, ",
        )
    ]
    cfg["project"]["data"]["primaryKey"] = ["vid", "active_session", "dt"]
    cfg["customMetrics"] = {"type": "prob_only"}
    cfg_path = tmp_path / "wj_tv.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0
    with open(f"{root}/metrics/metrics.json") as f:
        metrics = json.load(f)

    rows = [
        {
            k.rsplit(".", 1)[-1]: v
            for k, v in metrics.items()
            if k.startswith(f"test.customMetrics.page{p}.")
        }
        for p in (1, 2, 3, 4)
    ]
    print("TV_GOLDEN", rows)
    # reference row shape + internal consistency (the semantics the
    # evaluator logs: hotleadRate = hotLead/totalVisitor, captureRate =
    # capturedPositiveClass/totalPositiveClass, globals shared by pages)
    for p, r in zip((1, 2, 3, 4), rows):
        assert r["pageNo"] == p
        assert set(r) == {
            "pageNo", "accuracy", "bestF2", "probThreshold", "topThreshold",
            "hotLead", "totalVisitor", "hotleadRate",
            "capturedPositiveClass", "totalPositiveClass", "captureRate",
        }
        assert r["totalVisitor"] == rows[0]["totalVisitor"] > 0
        assert r["totalPositiveClass"] == rows[0]["totalPositiveClass"] > 0
        assert r["hotleadRate"] == pytest.approx(
            r["hotLead"] / r["totalVisitor"], abs=1e-12
        )
        assert r["captureRate"] == pytest.approx(
            r["capturedPositiveClass"] / r["totalPositiveClass"], abs=1e-12
        )
        assert 0 <= r["capturedPositiveClass"] <= r["totalPositiveClass"]
        assert r["topThreshold"] == 0.0  # prob_only
    # a visitor is counted at its EARLIEST hotlead page only: the page
    # hotLead counts sum to at most the distinct hotlead visitors
    assert sum(r["hotLead"] for r in rows) <= rows[0]["totalVisitor"]
    assert sum(r["hotLead"] for r in rows) > 0
    for key, want in GOLDEN_WEB_JOURNEY_TV.items():
        assert metrics[key] == pytest.approx(want, abs=1e-9), key


# Pinned from the first green run, byte-identical on a second full run.
GOLDEN_TITANIC_IMPUTER = {
    "test.accuracy": 0.6906474820143885,
    "test.auroc": 0.6483519447591304,
    "test.weightedF1": 0.6781203510013387,
}
GOLDEN_YELP_MLP_CV = {
    "test.accuracy": 0.4158415841584158,
    "test.weightedF1": 0.42362721039550016,
}
GOLDEN_WEB_JOURNEY_TV = {
    "test.customMetrics.page1.hotLead": 380,
    "test.customMetrics.page1.probThreshold": 0.04866160198340341,
    "test.customMetrics.page1.captureRate": 0.26582278481012656,
    "test.customMetrics.page2.hotLead": 340,
    "test.customMetrics.page3.hotLead": 221,
    "test.customMetrics.page4.hotLead": 23,
    "test.customMetrics.page4.probThreshold": 0.24013129816560053,
    "test.customMetrics.page4.totalVisitor": 9715,
    "test.customMetrics.page4.totalPositiveClass": 79,
}


def test_titanic_rf_and_dt_grid_cv_goldens(spark, tmp_path):
    """The last unreplayed *_cv scenario classes — the reference's
    `multiIntent_rf_cv_test_config.json` (numberOfTrees x maxDepth grid)
    and `multiIntent_dt_cv_test_config.json` (maxDepth x maxBins grid),
    2 folds each, replayed on titanic through the CLI.  Each tuned
    golden must DIFFER from the corresponding untuned r6 golden, proving
    the chosen grid point reaches the refit model.  (multiIntent_svm_cv
    / _hyperband are replayed by
    test_yelp_multiintent_svm_cv_and_hyperband_goldens.)"""
    import json as _json

    from flashml_spark.__main__ import main

    results = {}
    for algo, grid in (
        ("random_forest", {"numTrees": [15, 20], "maxDepth": [5, 7, 8]}),
        ("decision_tree", {"maxDepth": [5, 7], "maxBins": [15, 25]}),
    ):
        root = str(tmp_path / f"titanic_{algo}_cv_sp")
        cfg = _titanic_cfg(f"titanic_{algo}_cv", root)
        cfg["model"] = {"algorithm": algo}
        cfg["tuning"] = {
            "type": "cv",
            "paramGrid": grid,
            "folds": 2,
            "metric": "weightedPrecision",
        }
        cfg_path = tmp_path / f"titanic_{algo}_cv.json"
        cfg_path.write_text(_json.dumps(cfg))
        assert main([str(cfg_path)]) == 0
        with open(f"{root}/metrics/metrics.json") as f:
            results[algo] = _json.load(f)
    print("RFDT_CV_GOLDEN", {
        a: {k: m[k] for k in ("test.accuracy", "test.auroc")}
        for a, m in results.items()
    })
    for key, want in GOLDEN_TITANIC_RF_CV.items():
        assert results["random_forest"][key] == pytest.approx(want, abs=1e-9), key
    for key, want in GOLDEN_TITANIC_DT_CV.items():
        assert results["decision_tree"][key] == pytest.approx(want, abs=1e-9), key


GOLDEN_TITANIC_RF_CV = {
    "test.accuracy": 0.8165467625899281,
    "test.auroc": 0.8485294117647059,
}
GOLDEN_TITANIC_DT_CV = {
    "test.accuracy": 0.7949640287769785,
    "test.auroc": 0.8406318082788671,
}
