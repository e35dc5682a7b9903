"""Config validation parity tests.

Mirrors the reference's validator test pair
(``functionalTests/ConfigValidatorNegativeTest.scala`` /
``ConfigValidatorPositiveTest.scala``): a config that violates one step's
declarative checks must raise ``ConfigValidationError`` naming the offending
path when that step's list is validated, and a fully-valid config must pass
every step.  Pure driver-side — no SparkSession needed.
"""

from __future__ import annotations

import json

import pytest

from flashml_spark.config import (
    CONFIG_CHECKS,
    ConfigValidationError,
    load_config,
    validate_config_items,
    validate_config_list,
)

VALID = {
    "project.data.responseVariable": "response",
    "project.data.numPages": 3,
    "project.data.pageVariable": "page",
    "sampling.type": "stratified",
    "sampling.trainFraction": 0.8,
    "sampling.seed": 20,
    "vectorization.text.method": "tfidf",
    "vectorization.text.slots": 4096,
    "model.algorithm": "svm",
    "model.multiIntent": True,
    "model.platt": True,
    "tuning.type": "cv",
    "tuning.folds": 3,
    "tuning.metric": "weightedPrecision",
    "experiment.cv.predictSavepoint": False,
    "experiment.parallelism": 3,
}


def test_positive_all_steps_pass():
    validate_config_items(VALID)


# (step, overrides, message fragment) — one negative case per check family:
# empty, pattern, datatype, range.  The message must carry the config path
# (ConfigItemValidator.scala error strings).
NEGATIVE_CASES = [
    ("generic", {"project.data.responseVariable": ""}, "responseVariable"),
    ("generic", {"project.data.responseVariable": "bad col!"}, "pattern"),
    ("datareader", {"project.data.numPages": 0}, "numPages"),
    ("datareader", {"project.data.numPages": "three"}, "datatype"),
    ("datareader", {"project.data.pageVariable": "pa ge"}, "pageVariable"),
    ("sampling", {"sampling.type": "bootstrap"}, "sampling.type"),
    ("sampling", {"sampling.trainFraction": 1.5}, "trainFraction"),
    ("sampling", {"sampling.trainFraction": "0.8"}, "datatype"),
    ("sampling", {"sampling.seed": 1.5}, "datatype"),
    ("vectorization", {"vectorization.text.slots": 0}, "slots"),
    ("vectorization", {"vectorization.text.method": ""}, "should not be empty"),
    ("modelling", {"model.algorithm": "xgboost"}, "model.algorithm"),
    ("modelling", {"model.platt": "yes"}, "datatype"),
    ("modelling", {"tuning.type": "bayesian"}, "tuning.type"),
    ("modelling", {"tuning.folds": 1}, "tuning.folds"),
    ("modelling", {"tuning.metric": "auc"}, "tuning.metric"),
    ("modelling", {"experiment.cv.predictSavepoint": "true"}, "datatype"),
    ("modelling", {"experiment.parallelism": 0}, "parallelism"),
    ("modelling", {"tuning.hyperband.eta": 1}, "eta"),
]


@pytest.mark.parametrize("step,overrides,fragment", NEGATIVE_CASES)
def test_negative_step_validation(step, overrides, fragment):
    flat = {**VALID, **overrides}
    with pytest.raises(ConfigValidationError, match=fragment):
        validate_config_list(step, flat)


def test_boolean_not_accepted_as_int():
    # bool is an int subclass in Python; the reference's typed HOCON getInt
    # would reject it, so the datatype gate must too.
    with pytest.raises(ConfigValidationError, match="datatype"):
        validate_config_list("datareader", {**VALID, "project.data.numPages": True})


def test_load_config_runs_item_checks_before_semantic():
    raw = {
        "project": {"data": {"responseVariable": "response"}},
        "sampling": {"type": "random", "trainFraction": 2.0},
    }
    with pytest.raises(ConfigValidationError, match="trainFraction"):
        load_config(raw)


def test_load_config_valid_nested_json_passes():
    cfg = load_config(
        {
            "project": {"data": {"responseVariable": "response"}},
            "sampling": {"type": "random", "trainFraction": 0.7},
            "model": {"algorithm": "naive_bayes"},
        }
    )
    assert cfg.algorithm == "naive_bayes" and cfg.train_fraction == 0.7


def test_every_declared_check_is_well_formed():
    """Guard the check table itself: ranges parse, datatypes are known,
    patterns compile."""
    import re

    for step, checks in CONFIG_CHECKS.items():
        for c in checks:
            assert c.datatype in ("string", "int", "float", "boolean"), (step, c.path)
            if c.pattern:
                re.compile(c.pattern)
            if c.range:
                lo, hi = (float(x) for x in c.range.split("-"))
                assert lo <= hi, (step, c.path)


def test_random_variable_role_kept_through_pruning(spark):
    """Reference ``randomVariable`` (config.json / ConfigValues.scala:
    545-606): an EXISTING random/split column declared as a role survives
    column pruning (so conditional splits can reference it) but is never
    a feature column."""
    from flashml_spark.experiment import Experiment

    cfg = load_config(
        {
            "project": {
                "data": {
                    "responseVariable": "y",
                    "randomVariable": "rv",
                    "numericalVariables": ["x1"],
                }
            },
            "sampling": {"type": "conditional", "conditions": ["rv<=80", "rv>80"]},
            "model": {"algorithm": "logistic_regression"},
        }
    )
    assert cfg.random_col == "rv"
    df = spark.createDataFrame(
        [(1.0, 5.0, 10.0, "drop_me")] * 4, "y double, x1 double, rv double, junk string"
    )
    kept = Experiment(cfg).read(df)
    assert set(kept.columns) == {"y", "x1", "rv"}
    # rv drives the split but is not vectorized
    assert "rv" not in cfg.numerical_cols + cfg.categorical_cols + cfg.text_cols


def test_dict_valued_config_keys_arrive_verbatim():
    """Round-5 regression: the flattener used to descend INTO dict
    values, silently dropping model.params / tuning.paramGrid /
    tuning.paramRanges — a regParam=100 CV config reproduced the
    untuned goldens bit-for-bit.  Dict-valued mapped keys must arrive
    whole."""
    from flashml_spark.config import load_config

    cfg = load_config(
        {
            "project": {
                "id": "t",
                "data": {
                    "location": {"source": "csv://x"},
                    "responseVariable": "y",
                },
            },
            "sampling": {"type": "random", "trainFraction": 0.8, "seed": 20},
            "model": {
                "algorithm": "svm",
                "params": {"regParam": 0.25, "maxIter": 7},
            },
            "tuning": {
                "type": "cv",
                "paramGrid": {"regParam": [0.01, 0.1]},
                "folds": 4,
                "metric": "weightedPrecision",
            },
        }
    )
    assert cfg.algo_params == {"regParam": 0.25, "maxIter": 7}
    assert cfg.param_grid == {"regParam": [0.01, 0.1]}
    assert cfg.cv_folds == 4 and cfg.tuning == "cv"


def test_preprocessing_steps_config_validation():
    from flashml_spark.config import load_config

    base = {
        "project": {"data": {"responseVariable": "y", "textVariables": ["t1"]}},
    }

    def with_steps(steps):
        cfg = json.loads(json.dumps(base))
        cfg["preprocessing"] = {"steps": steps}
        return cfg

    # valid chain parses and lands on the config
    cfg = load_config(with_steps([
        {"inputVariable": "t", "outputVariable": "t1",
         "transformations": [{"type": "case_normalization"},
                             {"type": "tokenizer", "parameter": "/"}]},
    ]))
    assert cfg.preprocessing_steps[0]["outputVariable"] == "t1"

    # unknown type rejected with the offending name
    with pytest.raises(ValueError, match="not_a_transform"):
        load_config(with_steps([
            {"inputVariable": "t",
             "transformations": [{"type": "not_a_transform"}]},
        ]))

    # tokenizer must be last
    with pytest.raises(ValueError, match="tokenizer"):
        load_config(with_steps([
            {"inputVariable": "t",
             "transformations": [{"type": "tokenizer"},
                                 {"type": "case_normalization"}]},
        ]))

    # missing inputVariable rejected
    with pytest.raises(ValueError, match="inputVariable"):
        load_config(with_steps([{"transformations": [{"type": "stemming"}]}]))


def test_decision_tree_both_spellings_load():
    # r6 regression: the item pattern said "decision_trees" (reference
    # configChecks.json plural) while ALGORITHMS said "decision_tree" —
    # NEITHER spelling passed both checks, so DTs were unusable via CLI
    from flashml_spark.config import load_config

    for spelling in ("decision_tree", "decision_trees"):
        cfg = load_config({
            "project": {"data": {"responseVariable": "y"}},
            "model": {"algorithm": spelling},
        })
        assert cfg.algorithm == "decision_tree", spelling
