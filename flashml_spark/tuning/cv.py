"""Cross-validation with fold-level metric logging and best-model refit.

Reference: ``org/apache/spark/ml/tuning/CrossValidatorCustom.scala:124-306``
— k-fold, per fold × per ParamMap parallel fits, fold-level Multiclass
metrics (accuracy / weightedPrecision / weightedRecall / F1), averaged,
best picked by a configured metric (default weightedPrecision,
``FlashMLConstants.scala:217``), refit on full data.

DataFrame-native folds: a seeded ``rand`` fold id (no RDD ``MLUtils.kFold``)
— one pass tags every row, each fold is a filter over the cached tagged
frame.  Candidate fits run concurrently from a driver thread pool; each
fit is an independent Spark job (reference ``parallelism`` semantics).
"""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from pyspark.ml.evaluation import MulticlassClassificationEvaluator
from pyspark.sql import DataFrame

from flashml_spark.training.estimators import strip_training_summary
from pyspark.sql import functions as F

FOLD_METRICS = ("accuracy", "weightedPrecision", "weightedRecall", "f1")


class CrossValidatorWithFoldMetrics:
    def __init__(
        self,
        estimator,
        param_maps: list[dict],
        label_col: str = "label",
        metric: str = "weightedPrecision",
        num_folds: int = 3,
        seed: int = 999,
        parallelism: int = 6,
        predict_savepoint_path: str | None = None,
        predict_savepoint_cols: list[str] | None = None,
    ):
        self.estimator = estimator
        self.param_maps = param_maps
        self.label_col = label_col
        self.metric = metric
        self.num_folds = num_folds
        self.seed = seed
        self.parallelism = parallelism
        # fold-level prediction savepoint (CrossValidatorCustom.scala:283-300):
        # the best param map's per-fold validation predictions, written as one
        # parquet dataset for later threshold calculation
        self.predict_savepoint_path = predict_savepoint_path
        self.predict_savepoint_cols = predict_savepoint_cols
        # populated by fit():
        self.fold_metrics_: list[dict] = []
        self.avg_metrics_: list[float] = []
        self.best_index_: int | None = None
        self.best_params_: dict | None = None

    def _evaluator(self, metric: str) -> MulticlassClassificationEvaluator:
        return MulticlassClassificationEvaluator(
            labelCol=self.label_col, predictionCol="prediction", metricName=metric
        )

    def _apply_params(self, params: dict):
        if hasattr(self.estimator, "with_params"):
            # estimator-like ensembles (OneVsRestWithScores): params go to
            # each fresh binary estimator via the factory hook
            return self.estimator.with_params(params)
        est = self.estimator.copy()
        for k, v in params.items():
            est.set(est.getParam(k), v)  # in-place; returns None
        return est

    def fit(self, df: DataFrame):
        tagged = df.withColumn(
            "__fold", (F.rand(self.seed) * self.num_folds).cast("int")
        ).cache()
        tagged.count()

        tasks = [
            (p_idx, fold)
            for p_idx in range(len(self.param_maps))
            for fold in range(self.num_folds)
        ]

        scored_frames: dict[tuple[int, int], DataFrame] = {}

        def run(task):
            p_idx, fold = task
            train = tagged.filter(F.col("__fold") != fold).drop("__fold")
            val = tagged.filter(F.col("__fold") == fold).drop("__fold")
            model = self._apply_params(self.param_maps[p_idx]).fit(train)
            strip_training_summary(model)
            scored = model.transform(val)
            if self.predict_savepoint_path is not None:
                # lazy plan over the fitted model — writing later re-runs only
                # the transform, never the fit
                scored_frames[(p_idx, fold)] = scored
            row = {
                m: self._evaluator(m).evaluate(scored) for m in FOLD_METRICS
            }
            row.update(param_index=p_idx, fold=fold)
            return row

        with ThreadPoolExecutor(max_workers=self.parallelism) as pool:
            self.fold_metrics_ = list(pool.map(run, tasks))

        self.avg_metrics_ = []
        for p_idx in range(len(self.param_maps)):
            vals = [
                fm[self.metric] for fm in self.fold_metrics_ if fm["param_index"] == p_idx
            ]
            self.avg_metrics_.append(sum(vals) / len(vals))
        self.best_index_ = max(range(len(self.avg_metrics_)), key=self.avg_metrics_.__getitem__)
        self.best_params_ = self.param_maps[self.best_index_]

        if self.predict_savepoint_path is not None:
            from functools import reduce

            folds = [
                scored_frames[(self.best_index_, f)] for f in range(self.num_folds)
            ]
            out = reduce(DataFrame.unionByName, folds)
            if self.predict_savepoint_cols:
                # tolerate estimators without a probability column (LinearSVC:
                # the reference calibrates inside CV, we calibrate after) —
                # keep whatever score columns the model does emit
                present = [c for c in self.predict_savepoint_cols if c in out.columns]
                if "probability" in self.predict_savepoint_cols and "probability" not in out.columns:
                    present += [c for c in ("rawPrediction",) if c in out.columns]
                out = out.select(*present)
            # reference deletes the dir then appends every fold
            # (CrossValidatorCustom.scala:285-299) — net effect is overwrite
            out.write.mode("overwrite").parquet(
                f"{self.predict_savepoint_path}/predictedData"
            )

        tagged.unpersist()
        # refit best on the full data (CrossValidatorCustom.scala:268-306)
        best = self._apply_params(self.best_params_).fit(df)
        strip_training_summary(best)
        return best
