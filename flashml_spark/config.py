"""JSON config loading + scope resolution.

The reference's ONLY public API is a JSON/HOCON config file
(``FlashML.scala:27-83``; SURVEY §2.13).  Here the programmatic
``ExperimentConfig`` is primary and JSON is its serialization:
``load_config(path_or_dict) -> ExperimentConfig``.

Scope resolution (``FlashMLConstants.scala:71-74``;
``util/ConfigValues.scala:63-101``; user guide §"Understanding scope"):
config blocks are ``noPage`` (single value, non-page-level),
``allPage`` (one value shared by every page) or ``perPage`` (an array
with one entry per page).  ``resolve_scoped`` normalizes any of the
three to a per-page list so engines never re-implement the rules.
"""

from __future__ import annotations

import json
from typing import Any

from flashml_spark.experiment import ExperimentConfig

SCOPES = ("noPage", "allPage", "perPage")


def resolve_scoped(value: Any, scope: str, num_pages: int) -> list:
    """Normalize a scoped config value to one entry per page.

    * ``noPage``  — page-level modelling off; single value, returned as a
      1-element list (callers treat the experiment as one page).
    * ``allPage`` — the single value is replicated ``num_pages`` times.
    * ``perPage`` — value must already be a list with exactly one entry
      per page.
    """
    if scope == "noPage":
        return [value]
    if scope == "allPage":
        return [value] * num_pages
    if scope == "perPage":
        if not isinstance(value, (list, tuple)) or len(value) != num_pages:
            raise ValueError(
                f"perPage value needs exactly {num_pages} entries, got {value!r}"
            )
        return list(value)
    raise ValueError(f"unknown scope {scope!r}; expected one of {SCOPES}")


def infer_scope(value: Any, num_pages: int) -> str:
    """Reference configs omit the scope tag when unambiguous: arrays of
    length ``num_pages`` mean perPage, scalars mean allPage (or noPage
    when the experiment isn't page-level)."""
    if isinstance(value, (list, tuple)):
        return "perPage"
    return "allPage" if num_pages > 1 else "noPage"


# JSON key → ExperimentConfig field (reference config.json naming,
# ``config.json:27-88`` / ``util/ConfigValues.scala:40-101``)
_KEY_MAP = {
    "project.data.primaryKey": "primary_keys",
    "project.data.responseVariable": "response",
    "project.data.textVariables": "text_cols",
    "project.data.categoricalVariables": "categorical_cols",
    "project.data.numericalVariables": "numerical_cols",
    "project.data.pageVariable": "page_col",
    "project.data.numPages": "num_pages",
    "project.data.filter": "input_filter",
    "project.data.randomIdVariable": "random_id_col",
    "sampling.type": "split",
    "sampling.trainFraction": "train_fraction",
    "sampling.conditions": "conditions",
    "sampling.seed": "seed",
    "vectorization.text.method": "text_method",
    "vectorization.text.slots": "slots",
    "model.algorithm": "algorithm",
    "model.params": "algo_params",
    "model.multiIntent": "multi_intent",
    "model.platt": "platt",
    "model.topK": "top_k",
    "model.upliftTreatment": "uplift_treatment",
    "tuning.type": "tuning",
    "tuning.paramGrid": "param_grid",
    "tuning.paramRanges": "param_ranges",
    "tuning.folds": "cv_folds",
    "tuning.metric": "cv_metric",
    "experiment.cv.predictSavepoint": "cv_predict_savepoint",
    "tuning.hyperband.maxIter": "hyperband_max_iter",
    "tuning.hyperband.eta": "hyperband_eta",
    "tuning.hyperband.iterationMultiplier": "hyperband_iteration_multiplier",
    "tuning.hyperband.maxIterationsFinalModel": "hyperband_final_max_iter",
    "experiment.parallelism": "parallelism",
    "scoring.filter": "post_predict_filter",
    "savepoint.root": "savepoint_root",
}


def _flatten(d: dict, prefix: str = "") -> dict[str, Any]:
    out: dict[str, Any] = {}
    for k, v in d.items():
        key = f"{prefix}.{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def load_config(source: str | dict) -> ExperimentConfig:
    """Build an ExperimentConfig from a JSON file path, JSON string, or
    already-parsed dict using the reference's dotted key naming.  Unknown
    keys are ignored (forward compatibility), wrong value types raise."""
    if isinstance(source, str):
        try:
            raw = json.loads(source)
        except json.JSONDecodeError:
            with open(source) as f:
                raw = json.load(f)
    else:
        raw = source
    flat = _flatten(raw)
    kwargs = {}
    for dotted, field_name in _KEY_MAP.items():
        if dotted in flat:
            kwargs[field_name] = flat[dotted]
    cfg = ExperimentConfig(**kwargs)
    _validate(cfg)
    return cfg


def _validate(cfg: ExperimentConfig) -> None:
    """Structural validation in the spirit of ``ConfigValidator.scala:38-85``
    (key presence / type / range)."""
    problems = []
    if not cfg.response:
        problems.append("responseVariable must be set")
    if cfg.split not in ("random", "stratified", "stratified_approx", "conditional"):
        problems.append(
            f"sampling.type {cfg.split!r} not in random|stratified|stratified_approx|conditional"
        )
    if cfg.split == "conditional" and len(cfg.conditions) != 2:
        problems.append("conditional sampling needs exactly 2 conditions")
    if not 0.0 < cfg.train_fraction < 1.0 and cfg.split != "conditional":
        problems.append(f"trainFraction {cfg.train_fraction} outside (0, 1)")
    if cfg.num_pages < 1:
        problems.append(f"numPages {cfg.num_pages} < 1")
    if cfg.page_col is None and cfg.num_pages > 1:
        problems.append("numPages > 1 requires pageVariable")
    from flashml_spark.training.estimators import ALGORITHMS
    from flashml_spark.vectorization import TEXT_METHODS

    if cfg.text_method not in TEXT_METHODS:
        problems.append(f"unknown text method {cfg.text_method!r}")
    if cfg.algorithm not in ALGORITHMS:
        problems.append(f"unknown algorithm {cfg.algorithm!r}")
    if problems:
        raise ValueError("invalid config: " + "; ".join(problems))
