"""Config-driven experiment orchestration — the engine's equivalent of the
reference's 11-step pipeline (``core/PipelineSteps.scala:35-296``):

    dataReader → sampling → preprocessing → featureGeneration →
    vectorization → modelling → scoring → standardmetrics → custommetrics
    (→ publish handled by PipelineModel.save)

Programmatic API first (SURVEY §7): ``Experiment(config).run(spark)``; a
JSON config is just a serialization of ``ExperimentConfig``.

Page-level semantics (``PipelineSteps.scala:308-327``): when ``page_col``
and ``num_pages`` are set, one model per page is fitted (page k rows for
k < N, page >= N folded into the last model); all fitted artifacts save
under the reference's directory contract via SavepointManager.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.ml import Pipeline, PipelineModel
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.metrics.binary import auroc, best_fbeta_threshold
from flashml_spark.metrics.multiclass import multiclass_metrics
from flashml_spark.operators import relational, sampling
from flashml_spark.training.estimators import build_estimator, build_label_indexer
from flashml_spark.vectorization import build_assembler, build_text_vectorizer


@dataclass
class ExperimentConfig:
    """Column roles are DECLARED, not inferred (reference ``config.json``
    semantics, ``util/ConfigValues.scala:40-101``)."""

    # column roles
    primary_keys: list[str] = field(default_factory=list)
    response: str = "label"
    text_cols: list[str] = field(default_factory=list)
    categorical_cols: list[str] = field(default_factory=list)
    numerical_cols: list[str] = field(default_factory=list)
    page_col: str | None = None
    num_pages: int = 1
    # dataReader
    input_filter: str | None = None
    random_id_col: str | None = None  # derive random_variable from this id
    # sampling
    split: str = "random"  # random | stratified | conditional
    train_fraction: float = 0.8
    conditions: list[str] = field(default_factory=list)
    seed: int = 20
    # vectorization
    text_method: str = "tfidf"
    slots: int = 1000
    # modelling
    algorithm: str = "logistic_regression"
    algo_params: dict = field(default_factory=dict)
    multi_intent: bool = False
    # scoring
    post_predict_filter: str | None = None
    # savepoints
    savepoint_root: str | None = None


class Experiment:
    def __init__(self, config: ExperimentConfig):
        self.config = config
        self.models_: list[PipelineModel] = []
        self.metrics_: dict = {}

    # ---- dataReader ------------------------------------------------------
    def read(self, df: DataFrame) -> DataFrame:
        c = self.config
        out = relational.input_filter(df, c.input_filter, response_col=c.response)
        if c.random_id_col:
            out = relational.derive_random_variable(out, c.random_id_col)
        keep = list(
            dict.fromkeys(
                c.primary_keys
                + [c.response]
                + c.text_cols
                + c.categorical_cols
                + c.numerical_cols
                + ([c.page_col] if c.page_col else [])
                + (["random_variable"] if c.random_id_col else [])
            )
        )
        return relational.prune_columns(out, keep)

    # ---- sampling --------------------------------------------------------
    def split(self, df: DataFrame) -> tuple[DataFrame, DataFrame]:
        c = self.config
        if c.split == "stratified":
            return sampling.stratified_split(df, c.response, c.train_fraction, c.seed)
        if c.split == "conditional":
            parts = sampling.conditional_split(df, c.conditions)
            if len(parts) != 2:
                raise ValueError("conditional split needs exactly 2 conditions")
            return parts[0], parts[1]
        train, test = sampling.random_split(
            df, [c.train_fraction, 1.0 - c.train_fraction], c.seed
        )
        return train, test

    # ---- per-page model pipeline ----------------------------------------
    def _build_stages(self) -> list:
        c = self.config
        stages = []
        feature_vec_cols = []
        for col in c.text_cols:
            toks = f"{col}__toks"
            stages.append(
                __import__("pyspark.ml.feature", fromlist=["RegexTokenizer"]).RegexTokenizer(
                    inputCol=col, outputCol=toks, pattern=r"\s+", toLowercase=True
                )
            )
            vec = f"{col}__vec"
            stages.extend(build_text_vectorizer(c.text_method, toks, vec, c.slots))
            feature_vec_cols.append(vec)
        if c.categorical_cols:
            from flashml_spark.features import CategoricalConcat

            stages.append(
                CategoricalConcat(inputCols=c.categorical_cols, outputCol="categorical_array")
            )
            stages.extend(
                build_text_vectorizer("count_vectorizer", "categorical_array", "cat__vec", c.slots)
            )
            feature_vec_cols.append("cat__vec")
        stages.append(
            build_assembler(feature_vec_cols, numerical_cols=c.numerical_cols)
        )
        stages.append(build_label_indexer(c.response, c.multi_intent))
        stages.append(
            build_estimator(
                c.algorithm,
                label_col=f"{c.response}_indexed",
                params=c.algo_params,
            )
        )
        return stages

    # ---- lifecycle -------------------------------------------------------
    def run(self, spark: SparkSession, df: DataFrame) -> dict:
        c = self.config
        data = self.read(df).persist()
        train, test = self.split(data)

        if c.page_col and c.num_pages > 1:
            train_pages = relational.split_page_level(train, c.page_col, c.num_pages)
            test_pages = relational.split_page_level(test, c.page_col, c.num_pages)
        else:
            train_pages, test_pages = [train], [test]

        scored_pages = []
        self.models_ = []
        for k, (tr, te) in enumerate(zip(train_pages, test_pages)):
            model = Pipeline(stages=self._build_stages()).fit(tr)
            self.models_.append(model)
            scored = model.transform(te)
            scored = relational.post_predict_filter(scored, c.post_predict_filter)
            scored_pages.append(scored)
            if c.savepoint_root:
                from flashml_spark.sources.savepoint import SavepointManager

                SavepointManager(spark, c.savepoint_root).save(
                    scored.drop(*[col for col, t in scored.dtypes if t == "vector"]),
                    "scoring", "test", page=k,
                )
                model.write().overwrite().save(
                    f"{c.savepoint_root}/pipeline/page{k}/model_pipeline"
                )

        scored_all = relational.union_pages(scored_pages)
        label_col = f"{c.response}_indexed"
        self.metrics_ = multiclass_metrics(scored_all, label_col, "prediction")
        if not c.multi_intent and "probability" in scored_all.columns:
            from pyspark.ml.functions import vector_to_array

            binary = scored_all.select(
                vector_to_array("probability").getItem(1).alias("positive_probability"),
                F.col(label_col).alias("label"),
            )
            self.metrics_["auroc"] = auroc(binary)
            self.metrics_["bestF2"] = best_fbeta_threshold(binary)
        data.unpersist()
        return self.metrics_
