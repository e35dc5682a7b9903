"""Event-stream operators (batch semantics; streaming variants in
``flashml_spark.streaming`` share these definitions).

The reference has no streaming layer (SURVEY §1.1: "No streams … exist");
these operators extend the engine with the standard event-analytics set a
large-scale pipeline needs: tumbling-window aggregation and gap-based
sessionization — both expressible as one-shuffle DataFrame plans, and both
reusable under Structured Streaming (window agg directly; sessionization
via ``session_window``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    window: str = "1 hour",
) -> DataFrame:
    """Tumbling-window count/sum per key: ``ws, <key>, n, total``.

    Pure groupBy — partial aggregation map-side, one shuffle on
    (window, key).  Under streaming the identical expression runs with a
    watermark.
    """
    return (
        df.groupBy(F.window(ts_col, window).alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("total"),
        )
        .select(F.col("w.start").alias("ws"), key_col, "n", "total")
    )


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds the gap.  Returns the input plus
    ``session_idx`` (0-based per user).

    One shuffle on the user key; lag + running sum over the same window
    spec share a single sort.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    prev_ts = F.lag(ts_col).over(w)
    gap_sec = gap_minutes * 60
    new_session = F.when(
        prev_ts.isNull()
        | ((F.col(ts_col).cast("long") - prev_ts.cast("long")) > gap_sec),
        1,
    ).otherwise(0)
    return df.withColumn("__new", new_session).withColumn(
        "session_idx", F.sum("__new").over(w) - 1
    ).drop("__new")


def session_stats(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    gap_minutes: int = 30,
) -> DataFrame:
    """Per-user session statistics: ``user_id, n_sessions, n_events``."""
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    return (
        s.groupBy(user_col)
        .agg(
            (F.max("session_idx") + 1).cast("bigint").alias("n_sessions"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    width: str = "1 hour",
    slide: str = "15 minutes",
) -> DataFrame:
    """Overlapping (hopping) windows — each event lands in width/slide
    windows (``F.window`` with a slide), epoch-aligned.  ``ws`` is the
    window start in epoch seconds (engine-portable).  Same shuffle shape
    as the tumbling variant: one hash agg on (window, key)."""
    w = F.window(F.col(ts_col), width, slide)
    return (
        df.groupBy(w.alias("w"), F.col(key_col))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(value_col), 6).alias("total"),
        )
        .select(
            F.col("w.start").cast("long").alias("ws"), key_col, "n", "total"
        )
    )


def multi_granularity_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    value_col: str = "value",
    fine: str = "minute",
    coarse: str = "hour",
) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: build the COARSE
    aggregate from the FINE one (``count``/``sum`` are mergeable), not from
    raw events.  At 100 TB the fine aggregate is the materialized rollup a
    pipeline maintains incrementally; hourly/daily views re-aggregate
    ~60-1440x fewer rows instead of rescanning the event log.  Returns
    ``ws, <key>, n, total`` at the coarse grain — identical to aggregating
    raw events directly (the oracle checks exactly that).
    """
    fine_agg = df.groupBy(
        F.date_trunc(fine, F.col(ts_col)).alias("__fine_ws"), F.col(key_col)
    ).agg(F.count(F.lit(1)).alias("n"), F.sum(value_col).alias("total"))
    return fine_agg.groupBy(
        F.date_trunc(coarse, F.col("__fine_ws")).alias("ws"), F.col(key_col)
    ).agg(
        F.sum("n").alias("n"),
        F.round(F.sum("total"), 6).alias("total"),
    )


def funnel_stats(
    df: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
) -> DataFrame:
    """Session funnel conversion: one summary row counting sessions that
    reached each stage, where stage k counts only if its earliest event is
    no earlier than stage k-1's earliest (weak ordering; NULL-safe).

    Plan: sessionize (one shuffle on user) → conditional-min per
    (user, session) reusing that partitioning → single-row final agg.
    """
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    mins = [
        F.min(F.when(F.col(type_col) == st, F.col(ts_col))).alias(f"__t{i}")
        for i, st in enumerate(stages)
    ]
    per = s.groupBy(user_col, "session_idx").agg(*mins)

    def one_if(cond):
        # NULL-safe 0/1: a NULL condition (missing stage) counts as 0, and
        # SUM never collapses to NULL when no session reaches the stage
        return F.when(cond, F.lit(1)).otherwise(F.lit(0)).cast("long")

    reached = F.col("__t0").isNotNull()
    aggs = [
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(one_if(reached)).alias("n_s0"),
    ]
    for i in range(1, len(stages)):
        reached = reached & (F.col(f"__t{i}") >= F.col(f"__t{i-1}"))
        aggs.append(F.sum(one_if(reached)).alias(f"n_s{i}"))
    return per.agg(*aggs)


def hour_of_day_histogram(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Event count + mean value by hour of day — 24-group hash agg with
    map-side partials; the diurnal-profile scan of a monitoring rollup.
    Output: ``hour, n, avg_value``."""
    return (
        df.groupBy(F.hour(F.col(ts_col)).cast("bigint").alias("hour"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(value_col), 6).alias("avg_value"),
        )
    )


def retention_cohorts(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    out_cohort: str = "cohort_day",
    out_offset: str = "day_offset",
) -> DataFrame:
    """Retention-cohort matrix: users bucketed by first-seen day, activity
    counted at each day offset — ``(cohort_day, day_offset, n_users)``.

    Shape: one agg for first-seen (|users| rows, broadcast-able back onto
    the event scan), then one distinct-count agg on (cohort, offset) —
    both shuffle on bounded keys; no windows, no driver loops.
    """
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    first = df.groupBy(user_col).agg(F.min(day).alias("__cohort"))
    return (
        df.join(first, user_col)
        .select(
            F.col("__cohort").cast("string").alias(out_cohort),
            F.datediff(day, F.col("__cohort")).cast("bigint").alias(out_offset),
            F.col(user_col),
        )
        .groupBy(out_cohort, out_offset)
        .agg(F.count_distinct(F.col(user_col)).alias("n_users"))
    )


def moving_agg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    n_rows: int = 3,
    id_col: str | None = None,
    out_col: str = "moving_avg",
) -> DataFrame:
    """Per-key trailing moving average over the last ``n_rows`` events
    (current row inclusive) in event-time order — the smoothing pass a
    metrics/feature pipeline runs before thresholding noisy signals.

    One shuffle on the key; the window is PARTITIONED (per-key sort, all
    keys in parallel) with a deterministic tie-break on ``id_col``, so the
    plan has no global sort and no one-task window.  State per row is the
    n-row frame — O(n), independent of corpus size.
    """
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(-(n_rows - 1), Window.currentRow)
    )
    return df.withColumn(out_col, F.round(F.avg(value_col).over(w), 6))


def daily_user_accession(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Daily audience growth: per day, distinct active users (DAU), users
    seen for the FIRST time that day, and the running total of distinct
    users ever seen — ``day, dau, new_users, cum_users``.

    Cumulative-distinct is rewritten as cumulative-sum-of-first-seen (a
    user contributes to exactly one day's ``new_users``), so the running
    total needs only a |days|-sized frame: first-seen per user (one agg),
    day rollup, then ``global_cumsum`` with a rows_hint — days are
    calendar-bounded at any corpus size.
    """
    from flashml_spark.functions.windows import global_cumsum

    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    dau = df.select(day.alias("day"), F.col(user_col)).groupBy("day").agg(
        F.count_distinct(F.col(user_col)).alias("dau")
    )
    first = df.groupBy(user_col).agg(F.min(day).alias("day"))
    new_by_day = first.groupBy("day").agg(
        F.count(F.lit(1)).alias("new_users")
    )
    joined = dau.join(new_by_day, "day", "left").na.fill({"new_users": 0})
    # |days| is bounded by the calendar (≤ ~36.5k rows even for a century
    # of data) — a single-window frame of scalars, so the fast path is
    # explicitly allowed past the default threshold
    cum = global_cumsum(
        joined, "day", ["new_users"], rows_hint=36_500,
        small_input_threshold=50_000,
    )
    return cum.select(
        F.col("day").cast("string").alias("day"),
        F.col("dau").cast("bigint").alias("dau"),
        F.col("new_users").cast("bigint").alias("new_users"),
        F.col("cum_new_users").cast("bigint").alias("cum_users"),
    )
