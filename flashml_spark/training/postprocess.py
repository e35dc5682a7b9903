"""Post-processing transformers: TopK intents, IndexToString, Hotlead rule,
Uplift scoring (SURVEY §2.9).
"""

from __future__ import annotations

from pyspark.ml.feature import IndexToString
from pyspark.ml.functions import array_to_vector, vector_to_array
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def top_k_intents(
    df: DataFrame,
    labels: list[str],
    k: int = 3,
    probability_col: str = "probability",
    out_col: str = "topKIntents",
) -> DataFrame:
    """Top-K (label, probability) pairs sorted by probability desc
    (``TopKIntents.scala:90-106``): output ``array<struct<label,prob>>``.

    Pure SQL: zip the probability array with the label array, sort the
    structs (prob leads the struct so sort_array orders by it), slice K.
    """
    probs = (
        F.col(probability_col)
        if not _is_vector(df, probability_col)
        else vector_to_array(F.col(probability_col))
    )
    label_arr = F.array(*[F.lit(l) for l in labels])
    zipped = F.zip_with(
        probs, label_arr, lambda p, l: F.struct(p.alias("prob"), l.alias("label"))
    )
    top = F.slice(F.sort_array(zipped, asc=False), 1, k)
    # reorder struct fields to (label, prob) like the reference output
    top = F.transform(
        top, lambda s: F.struct(s["label"].alias("label"), s["prob"].alias("prob"))
    )
    return df.withColumn(out_col, top)


def _is_vector(df: DataFrame, col: str) -> bool:
    return dict(df.dtypes).get(col) == "vector"


def index_to_string(
    df: DataFrame, labels: list[str], prediction_col: str = "prediction",
    out_col: str = "prediction_label",
) -> DataFrame:
    """Map predicted index back to the original label string
    (``ModelTrainingEngine.scala:235-248``)."""
    stage = IndexToString(inputCol=prediction_col, outputCol=out_col, labels=labels)
    return stage.transform(df)


def hotlead_flag(
    prob_positive: Column,
    page: Column,
    prob_thresholds: list[float],
    top_thresholds: list[float] | None = None,
    top: Column | None = None,
) -> Column:
    """Business rule (``publish/transformer/HotleadTransformer.scala``;
    ``WebCustomMetricsEvaluator.scala:103-109``):

        isHotLead = prob(1) >= probThreshold[page] AND top >= topThreshold[page]

    with the page index clamped to the number of configured pages.
    Threshold arrays ship as literals; ``element_at`` is 1-based.
    """
    n = len(prob_thresholds)
    clamped = F.least(F.greatest(page.cast("int"), F.lit(1)), F.lit(n))
    prob_arr = F.array(*[F.lit(float(t)) for t in prob_thresholds])
    cond = prob_positive >= F.element_at(prob_arr, clamped)
    if top_thresholds is not None and top is not None:
        top_arr = F.array(*[F.lit(float(t)) for t in top_thresholds])
        cond = cond & (top >= F.element_at(top_arr, clamped))
    return F.when(cond, 1).otherwise(0)


def uplift_transform(
    df: DataFrame,
    model,
    features_col: str = "features",
    probability_col: str = "probability",
    calibrator=None,
) -> DataFrame:
    """Uplift scoring (``UpliftTransformer.scala:93-148``): score twice with
    the treatment variable (LAST feature slot) forced to 0 then 1;
    uplift d = p1(1) - p0(1); output ``probability = [1-d, d]``,
    ``prediction = 1.0``, logit-based ``rawPrediction``; the model's own
    outputs renamed ``modelProbability``/``modelPrediction``/``modelRawPrediction``.

    Margin-only models (LinearSVC has no ``probabilityCol``) need a
    fitted binary ``PlattScalarModel`` as ``calibrator`` — each of the
    two counterfactual scorings maps its margin through the SAME Platt
    sigmoid the pipeline's calibrated probabilities use, exactly the
    reference's SVM+uplift composition (``UpliftTransformer`` consumes
    the Platt-calibrated pipeline, ``PipelineSteps.scala``).

    Vector slot surgery is ``vector_to_array`` → rewrite last slot →
    ``array_to_vector`` (JVM-side, no Python UDF).
    """
    arr = vector_to_array(F.col(features_col))
    n = F.size(arr)

    def with_treatment(value: float) -> Column:
        return array_to_vector(
            F.concat(
                F.slice(arr, 1, n - 1), F.array(F.lit(value))
            )
        )

    has_prob = hasattr(model, "setProbabilityCol")
    if not has_prob and calibrator is None:
        raise ValueError(
            f"{type(model).__name__} emits no probability column; "
            "uplift scoring needs a fitted PlattScalarModel calibrator"
        )
    out = df
    for tag, value in (("0", 0.0), ("1", 1.0)):
        m = (
            model.copy()
            .setFeaturesCol("__feat_t")
            .setPredictionCol(f"__pred_{tag}")
            .setRawPredictionCol(f"__raw_{tag}")
        )
        if has_prob:
            m = m.setProbabilityCol(f"__prob_{tag}")
        out = m.transform(out.withColumn("__feat_t", with_treatment(value)))
        if has_prob:
            p_tag = vector_to_array(F.col(f"__prob_{tag}")).getItem(1)
        else:
            sigmoids = calibrator.sigmoids
            if len(sigmoids) != 1:
                raise ValueError(
                    "margin-model uplift needs a BINARY Platt calibrator "
                    f"(got {len(sigmoids)} class sigmoids)"
                )
            a, b = sigmoids[0]
            margin = vector_to_array(F.col(f"__raw_{tag}")).getItem(1)
            p_tag = calibrator._sigmoid(a, b, margin)
        out = out.withColumn(f"__p{tag}", p_tag).drop(
            "__feat_t", f"__pred_{tag}", f"__raw_{tag}",
            *([f"__prob_{tag}"] if has_prob else []),
        )

    # original-model outputs (if present) renamed model*
    for orig, renamed in (
        ("probability", "modelProbability"),
        ("prediction", "modelPrediction"),
        ("rawPrediction", "modelRawPrediction"),
    ):
        if orig in out.columns:
            out = out.withColumnRenamed(orig, renamed)

    def clamped_logit(p: Column) -> Column:
        # reference clamps: p >= 1 → 100, p <= 0 → -100 (UpliftTransformer.scala:100-104)
        return (
            F.when(p >= 1.0, F.lit(100.0))
            .when(p <= 0.0, F.lit(-100.0))
            .otherwise(F.log(p / (1.0 - p)))
        )

    d = F.col("__p1") - F.col("__p0")
    out = (
        out.withColumn(probability_col, F.array(1.0 - d, d))
        .withColumn(
            "rawPrediction",
            F.array(
                clamped_logit(F.element_at(probability_col, 1)),
                clamped_logit(F.element_at(probability_col, 2)),
            ),
        )
        .withColumn("prediction", F.lit(1.0))
        .drop("__p0", "__p1")
    )
    return out
