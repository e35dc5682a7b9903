"""Binary-classification metrics as pure DataFrame plans.

The reference collects ``(probability, label)`` into RDDs and
``mllib.evaluation`` (``core/metrics/StandardMetricsEvaluator.scala:66-111``).
Here everything is windows/aggregations — no RDDs, no driver data loops:

  * threshold sweep — group by score, cumulative TP/FP over a descending
    score window → precision / recall / F-beta at every distinct threshold
  * AUROC — Mann-Whitney rank-sum formulation (ties get average ranks):
    exact, one sort, identical to trapezoidal ROC integration
  * best-F2 threshold (``WebCustomMetricsEvaluator.scala:38-65``)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def threshold_sweep(
    scored: DataFrame, score_col: str = "positive_probability", label_col: str = "label",
    beta: float = 2.0, distinct_scores_hint: int | None = None,
) -> DataFrame:
    """Per-distinct-threshold confusion counts and P/R/F-beta.

    Output: ``thresh, tp, fp, fn, tn, precision, recall, fbeta``.
    Predicting positive means ``score >= thresh``.

    Continuous scores keep ~|rows| distinct thresholds, so the cumulative
    runs through ``global_cumsum`` (range-partitioned prefix sums) — never
    a single-partition window.  Grand totals broadcast as a 1-row frame.
    Callers scoring QUANTIZED models (calibrated bins, fixed-precision
    probabilities) can pass ``distinct_scores_hint`` — an upper bound on
    distinct score values — to take the post-agg small-input fast path.
    """
    from flashml_spark.functions.windows import global_cumsum

    per_thresh = scored.groupBy(F.col(score_col).alias("thresh")).agg(
        F.sum(F.when(F.col(label_col) == 1.0, 1).otherwise(0)).alias("pos_at"),
        F.sum(F.when(F.col(label_col) != 1.0, 1).otherwise(0)).alias("neg_at"),
    )
    totals = per_thresh.agg(
        F.sum("pos_at").alias("P"), F.sum("neg_at").alias("N")
    )
    cum = (
        global_cumsum(
            per_thresh,
            "thresh",
            ["pos_at", "neg_at"],
            ascending=False,
            rows_hint=distinct_scores_hint,
        )
        .crossJoin(F.broadcast(totals))
        .select(
            "thresh",
            F.col("cum_pos_at").alias("tp"),
            F.col("cum_neg_at").alias("fp"),
            "P",
            "N",
        )
    )
    # every ratio guarded: Spark 4 ANSI mode raises on 0/0 (degenerate
    # inputs — e.g. no positive rows at all — are legitimate here)
    def ratio(num, den):
        return F.when(den > 0, num / den).otherwise(F.lit(0.0))

    precision = ratio(F.col("tp"), F.col("tp") + F.col("fp"))
    recall = ratio(F.col("tp"), F.col("P"))
    b2 = beta * beta
    fbeta = ratio((1 + b2) * precision * recall, b2 * precision + recall)
    return cum.select(
        "thresh",
        "tp",
        "fp",
        (F.col("P") - F.col("tp")).alias("fn"),
        (F.col("N") - F.col("fp")).alias("tn"),
        precision.alias("precision"),
        recall.alias("recall"),
        F.coalesce(fbeta, F.lit(0.0)).alias("fbeta"),
    )


def best_fbeta_threshold(
    scored: DataFrame, score_col: str = "positive_probability", label_col: str = "label",
    beta: float = 2.0,
) -> dict:
    """Threshold maximizing F-beta plus its P/R/accuracy
    (``WebCustomMetricsEvaluator.scala:38-65``)."""
    sweep = threshold_sweep(scored, score_col, label_col, beta)
    row = sweep.orderBy(F.desc("fbeta"), F.desc("thresh")).limit(1).first()
    total = row["tp"] + row["fp"] + row["fn"] + row["tn"]
    return {
        "threshold": row["thresh"],
        "fbeta": row["fbeta"],
        "precision": row["precision"],
        "recall": row["recall"],
        "accuracy": (row["tp"] + row["tn"]) / total if total else 0.0,
    }


def auroc(
    scored: DataFrame, score_col: str = "positive_probability", label_col: str = "label"
) -> float:
    """Exact AUROC via the rank-sum identity:
    ``AUC = (R_pos - n_pos(n_pos+1)/2) / (n_pos * n_neg)``
    with average ranks on score ties (equivalent to trapezoidal ROC).
    One global sort; everything else is aggregation.
    """
    from flashml_spark.functions.windows import global_cumsum

    # one row per distinct score: group counts first, then distributed
    # prefix sums give each group its rank range (no global-window task)
    groups = scored.groupBy(F.col(score_col).alias("s")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum(F.when(F.col(label_col) == 1.0, 1.0).otherwise(0.0)).alias("pos_in_group"),
    )
    cum = global_cumsum(groups, "s", ["cnt"], ascending=True)
    # ranks in the tied group are cum_cnt-cnt+1 .. cum_cnt → average rank
    r_avg = F.col("cum_cnt") - F.col("cnt") + (F.col("cnt") + 1) / 2.0
    agg = cum.agg(
        F.sum(r_avg * F.col("pos_in_group")).alias("rank_sum"),
        F.sum("pos_in_group").alias("n_pos"),
        F.sum("cnt").alias("n"),
    ).first()
    n_pos = agg["n_pos"]
    n_neg = agg["n"] - n_pos
    if n_pos == 0 or n_neg == 0:
        return 0.0
    return (agg["rank_sum"] - n_pos * (n_pos + 1) / 2.0) / (n_pos * n_neg)


def calibration_curve(
    df: DataFrame,
    score_col: str,
    label_col: str,
    buckets: int = 10,
) -> DataFrame:
    """Reliability diagram: bucket model scores into ``buckets``
    equal-width cells of [0, 1] and report, per cell, the support, the
    mean predicted score, the observed positive rate, and their absolute
    gap — the per-cell terms of expected calibration error (ECE =
    Σ n_b/N · gap_b, computable from this frame with one more agg).

    Scale shape: ONE projection (bucket id from the score) + ONE hash
    agg keyed by bucket — nothing global, no windows, no driver state.
    Empty cells are absent (support 0 rows carry no evidence).

    Output: ``bucket, n, mean_score, pos_rate, abs_gap`` — bucket i
    covers scores [i/buckets, (i+1)/buckets).  Out-of-range scores
    clamp into the edge cells (1.0 and above fold into the last, below
    0 into the first — an uncalibrated regressor must not mint a
    bucket -1 row); NULL scores are excluded.
    """
    B = float(buckets)
    s = F.col(score_col).cast("double")
    bucket = F.greatest(
        F.lit(0), F.least(F.floor(s * B).cast("int"), F.lit(buckets - 1))
    )
    y = F.when(F.col(label_col).cast("double") == 1.0, 1.0).otherwise(0.0)
    out = (
        df.where(s.isNotNull())
        .select(bucket.alias("bucket"), s.alias("__s"), y.alias("__y"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.avg("__s"), 6).alias("mean_score"),
            F.round(F.avg("__y"), 6).alias("pos_rate"),
            F.round(F.abs(F.avg("__s") - F.avg("__y")), 6).alias("abs_gap"),
        )
    )
    return out


def cumulative_gains(
    df: DataFrame,
    score_col: str,
    label_col: str,
    tiebreak_col: str,
    n_buckets: int = 10,
) -> DataFrame:
    """Cumulative gains / decile lift table — the campaign-targeting
    readout next to AUROC: rank by score descending, cut into
    ``n_buckets`` equal-count buckets, and report each bucket's capture
    of all positives (gain) and its rate vs the base rate (lift).

    Scale shape: ranking uses ``global_ntile`` (range partition +
    per-partition offsets — no single-partition window over raw rows);
    per-bucket aggregation is one hash agg; the cumulative runs over
    the |buckets| frame via ``global_cumsum`` with a ``rows_hint``; the
    scalar totals ride a 1-row broadcast.

    Output: ``bucket, n, n_pos, cum_pos, gain, lift`` (bucket 1 = top
    scores).
    """
    from flashml_spark.functions.windows import global_cumsum, global_ntile

    ranked = df.select(
        (-F.col(score_col)).alias("__neg"),
        F.col(tiebreak_col).alias("__tb"),
        F.col(label_col).cast("double").alias("__y"),
    )
    tiled = global_ntile(ranked, "__neg", n_buckets, tiebreak_cols=["__tb"])
    per = tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("__y").cast("bigint").alias("n_pos"),
    ).localCheckpoint(eager=False)  # |buckets| rows, read twice
    cum = global_cumsum(
        per, "bucket", ["n_pos"], rows_hint=n_buckets, prefix="cum_"
    )
    tot = per.agg(
        F.sum("n_pos").cast("double").alias("__tp"),
        F.sum("n").cast("double").alias("__tn"),
    )
    return (
        cum.crossJoin(F.broadcast(tot))
        .select(
            F.col("bucket").cast("bigint").alias("bucket"),
            "n",
            "n_pos",
            F.col("cum_n_pos").cast("bigint").alias("cum_pos"),
            F.round(F.col("cum_n_pos") / F.col("__tp"), 6).alias("gain"),
            F.round(
                (F.col("n_pos") / F.col("n")) / (F.col("__tp") / F.col("__tn")), 6
            ).alias("lift"),
        )
        .orderBy("bucket")
    )


def isotonic_calibration(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """EXACT isotonic (monotone non-decreasing) calibration of a score
    against binary outcomes, via the minimax closed form of the
    pool-adjacent-violators solution: on the binned frame,
    ``g(i) = max_{j<=i} min_{k>=i} wavg(rate[j..k])`` (Barlow et al.
    1972, thm 1.4.4) — no iterative PAV loop, no driver-side fitting,
    and unlike ``pyspark.ml.IsotonicRegression`` the arithmetic is
    plain integer-sum divisions, so a SQL engine reproduces the fit
    bit-for-bit.

    Scale shape: the corpus collapses to ``n_bins`` rows in one hash
    agg; prefix sums, the (j,k) interval means (``B(B+1)/2`` rows) and
    the minimax double-agg all run on frames bounded by ``n_bins²`` —
    config-bounded, never data-bounded.  Label sums stay integers until
    the final division.

    Output: ``bucket, n, mean_score, raw_rate, iso_rate`` — iso_rate is
    non-decreasing in bucket by construction.
    """
    b = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    bins = (
        df.select(
            F.greatest(b, F.lit(0)).alias("bucket"),
            F.col(score_col).alias("__s"),
            F.col(label_col).cast("long").alias("__y"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum("__s").alias("sum_s"),
            F.sum("__y").cast("bigint").alias("sum_y"),
        )
        # n_bins rows, read three times (prefix sums, bucket list, final
        # join) — checkpointed so the corpus agg runs once
        .localCheckpoint(eager=False)
    )
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    pre = bins.select(
        "bucket", "n", "sum_s", "sum_y",
        F.sum("n").over(w).alias("cn"),
        F.sum("sum_y").over(w).alias("cy"),
    )
    jj = pre.select(
        F.col("bucket").alias("j"),
        (F.col("cn") - F.col("n")).alias("cn_before"),
        (F.col("cy") - F.col("sum_y")).alias("cy_before"),
    )
    kk = pre.select(
        F.col("bucket").alias("k"), F.col("cn").alias("cn_k"),
        F.col("cy").alias("cy_k"),
    )
    intervals = jj.join(kk, F.col("j") <= F.col("k")).select(
        "j", "k",
        (
            (F.col("cy_k") - F.col("cy_before"))
            / (F.col("cn_k") - F.col("cn_before")).cast("double")
        ).alias("a"),
    )
    buckets = bins.select(F.col("bucket").alias("i"))
    g = (
        buckets.join(
            intervals, (F.col("j") <= F.col("i")) & (F.col("k") >= F.col("i"))
        )
        .groupBy("i", "j")
        .agg(F.min("a").alias("mn"))
        .groupBy("i")
        .agg(F.max("mn").alias("iso"))
    )
    return (
        bins.join(g, bins["bucket"] == g["i"])
        .select(
            "bucket",
            "n",
            F.round(F.col("sum_s") / F.col("n").cast("double"), 6).alias(
                "mean_score"
            ),
            F.round(F.col("sum_y") / F.col("n").cast("double"), 6).alias(
                "raw_rate"
            ),
            F.round("iso", 6).alias("iso_rate"),
        )
        .orderBy("bucket")
    )
