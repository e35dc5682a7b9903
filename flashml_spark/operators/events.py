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

from flashml_spark.functions import hashing as H


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


def interarrival_stats(
    df: DataFrame,
    key_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Inter-arrival-time statistics per event type: mean gap, standard
    deviation, and the burstiness index B = (sigma - mu) / (sigma + mu)
    (Goh & Barabasi 2008) — B near -1 is a regular clock, 0 is Poisson,
    +1 is maximally bursty.  The traffic-shape audit run before sizing
    streaming state or rate limits.

    Gaps are computed WITHIN each (user, type) stream — a per-key lag
    window ordered by event time with an id tie-break (partitioned window,
    no global sort) — then aggregated per type.  Timestamps diff in exact
    integer microseconds (``unix_micros``) so engine float handling can't
    skew the parity.  Output: ``<key_col>, n_gaps, mean_gap_s, sd_gap_s,
    burstiness`` (seconds, rounded to 6).
    """
    us = F.unix_micros(F.col(ts_col))
    w = Window.partitionBy(user_col, key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    gaps = (
        df.select(F.col(key_col), F.col(user_col), F.col(ts_col), F.col(id_col))
        .withColumn("__gap_us", us - F.lag(us).over(w))
        .filter(F.col("__gap_us").isNotNull())
        .select(key_col, (F.col("__gap_us") / 1e6).alias("__gap_s"))
    )
    mu, sd = F.avg("__gap_s"), F.stddev_samp("__gap_s")
    return gaps.groupBy(key_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_gaps"),
        F.round(mu, 6).alias("mean_gap_s"),
        F.round(sd, 6).alias("sd_gap_s"),
        F.round((sd - mu) / (sd + mu), 6).alias("burstiness"),
    )


def cooccurrence_lift(
    df: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Event-type co-occurrence lift across users: for each unordered type
    pair (a < b), lift = P(a,b) / (P(a) * P(b)) over the user population —
    the market-basket audit for "which behaviors travel together".

    Distinct (user, type) first (one agg absorbs event-count skew), then a
    self-join on user with a < b.  The join fan-out per user is
    |types-per-user| choose 2 — bounded by the TYPE vocabulary, not by the
    user's event count — and the output is at most |types|^2 rows.
    Per-type supports and the population size join back as broadcast
    scalars.  Output: ``type_a, type_b, n_joint, lift`` (rounded to 6).
    """
    ut = df.select(F.col(user_col).alias("__u"), F.col(type_col).alias("__t")).distinct()
    a = ut.select("__u", F.col("__t").alias("type_a"))
    b = ut.select("__u", F.col("__t").alias("type_b"))
    joint = (
        a.join(b, "__u")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_joint"))
    )
    support = ut.groupBy("__t").agg(F.count(F.lit(1)).alias("__n"))
    n_users = ut.select("__u").distinct().agg(F.count(F.lit(1)).alias("__nu"))
    return (
        joint.join(
            F.broadcast(support.select(F.col("__t").alias("type_a"), F.col("__n").alias("__na"))),
            "type_a",
        )
        .join(
            F.broadcast(support.select(F.col("__t").alias("type_b"), F.col("__n").alias("__nb"))),
            "type_b",
        )
        .crossJoin(F.broadcast(n_users))
        .select(
            "type_a",
            "type_b",
            "n_joint",
            F.round(
                F.col("n_joint") * F.col("__nu") / (F.col("__na") * F.col("__nb")), 6
            ).alias("lift"),
        )
    )


def daily_outlier_zscores(
    df: DataFrame,
    ts_col: str = "ts",
    trailing_days: int = 7,
    z_threshold: float = 2.0,
) -> DataFrame:
    """Volume-anomaly audit: each day's event count scored against the
    mean/stddev of the preceding ``trailing_days`` OBSERVED days (current
    day excluded, so a spike can't mask itself).  Days without a full
    trailing window are emitted with NULL z (warm-up, not silently
    dropped).

    The corpus collapses to |days| rows in one hash agg before any window
    runs; the trailing frame is over that calendar-bounded frame — the
    same accepted whole-frame posture as ``daily_user_accession``.
    Output: ``day, n, trail_mean, trail_sd, z, is_outlier``.
    """
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    daily = df.select(day.alias("day")).groupBy("day").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.orderBy("day").rowsBetween(-trailing_days, -1)
    mu = F.avg("n").over(w)
    sd = F.stddev_samp("n").over(w)
    full = F.count("n").over(w) == trailing_days
    z = F.when(full & (sd > 0), (F.col("n") - mu) / sd)
    return daily.select(
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("bigint").alias("n"),
        F.round(F.when(full, mu), 6).alias("trail_mean"),
        F.round(F.when(full, sd), 6).alias("trail_sd"),
        F.round(z, 6).alias("z"),
        F.when(z.isNotNull(), F.abs(z) > z_threshold).alias("is_outlier"),
    )


def time_range_moving_avg(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    window_seconds: int,
    out_col: str = "range_avg",
) -> DataFrame:
    """Trailing moving average over a TIME range (all events within the
    last ``window_seconds``, current inclusive) — the time-domain twin of
    ``moving_agg``'s row-count frame, for irregularly spaced streams where
    "last N events" and "last N minutes" diverge.

    RANGE frames order by a numeric epoch so the frame bound is exact
    integer seconds on every engine.  Partitioned per key: one shuffle,
    per-key sort, O(events-in-window) state per row.
    """
    epoch = F.col(ts_col).cast("timestamp").cast("long")
    w = (
        Window.partitionBy(key_col)
        .orderBy(epoch)
        .rangeBetween(-window_seconds, 0)
    )
    return df.withColumn(out_col, F.avg(value_col).over(w))


def locf_fill(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    id_col: str | None = None,
    out_col: str = "filled",
) -> DataFrame:
    """Last-observation-carried-forward gap filling: NULL measurements
    take the most recent non-null value of the same key in event-time
    order (rows before any observation stay NULL).

    ``last(..., ignorenulls=True)`` over an unbounded-preceding frame is
    the canonical Spark form — per-key partitioned window, no global sort;
    the frame scan is incremental, so cost is O(1) amortized per row.
    """
    order = [F.col(ts_col).asc()] + ([F.col(id_col).asc()] if id_col else [])
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(out_col, F.last(value_col, ignorenulls=True).over(w))


def trailing_distinct_users(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    window_days: int = 7,
    out_col: str = "active_users",
) -> DataFrame:
    """Per calendar day, the number of DISTINCT users active in the
    trailing ``window_days`` (current day inclusive) — rolling reach/WAU.

    Spark windows cannot express COUNT(DISTINCT) over a moving frame, and
    the naive day×user range self-join multiplies the fact by the window
    width.  This runs fully scalable instead:

    1. distinct (user, day) — one hash agg, collapses event volume;
    2. per user, merge active days into coverage islands (a day covers
       [day, day+w-1]; consecutive days ≤ w-1 apart merge) via a per-user
       lag window — per-key sort, all users parallel;
    3. each island emits two boundary deltas (+1 at start, −1 after end)
       — ≤ 2 rows per island, REGARDLESS of window width or event count;
    4. cumulative-sum the deltas over the calendar-day domain — a
       value-domain-bounded frame (|days|), the same accepted posture as
       the daily-accession and outlier rollups.

    Output: ``day (string), <out_col>`` for every day in the event span.
    """
    w = window_days - 1
    ud = (
        df.select(F.col(user_col).alias("__u"), F.to_date(ts_col).alias("__d"))
        .distinct()
    )
    lw = Window.partitionBy("__u").orderBy("__d")
    isl = ud.withColumn(
        "__new",
        F.when(F.lag("__d").over(lw).isNull(), 1)
        .when(F.col("__d") > F.date_add(F.lag("__d").over(lw), w), 1)
        .otherwise(0),
    ).withColumn(
        "__isl",
        F.sum("__new").over(lw.rowsBetween(Window.unboundedPreceding, 0)),
    )
    iv = isl.groupBy("__u", "__isl").agg(
        F.min("__d").alias("__s"), F.date_add(F.max("__d"), w).alias("__e")
    )
    deltas = (
        iv.select(F.col("__s").alias("day"), F.lit(1).alias("__delta"))
        .unionAll(iv.select(F.date_add("__e", 1).alias("day"), F.lit(-1)))
        .groupBy("day")
        .agg(F.sum("__delta").alias("__delta"))
    )
    span = ud.agg(F.min("__d").alias("__lo"), F.max("__d").alias("__hi"))
    domain = span.select(
        F.explode(F.expr("sequence(__lo, __hi, interval 1 day)")).alias("day")
    )
    cum = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    return (
        domain.join(deltas, "day", "left")
        .select("day", F.coalesce("__delta", F.lit(0)).alias("__delta"))
        .select(
            F.col("day").cast("string").alias("day"),
            F.sum("__delta").over(cum).cast("long").alias(out_col),
        )
    )


def last_touch_attribution(
    df: DataFrame,
    conversion_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Last-touch conversion attribution: credit each conversion event's
    value to the user's most recent PRIOR non-conversion event type (the
    "channel").  Conversions with no prior touch attribute to the NULL
    channel (direct).

    One keyed window per user (ignore-nulls last_value over an
    unbounded-preceding frame — the conversion row itself maps to NULL in
    the carried column, so "at or before current" is effectively
    "strictly before").  State per user is one row; no global ordering.
    Output: ``channel, n_conversions, total_value`` (rounded to 2).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    touch = F.when(F.col(type_col) != conversion_type, F.col(type_col))
    labeled = df.withColumn(
        "channel", F.last(touch, ignorenulls=True).over(w)
    ).where(F.col(type_col) == conversion_type)
    return labeled.groupBy("channel").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_conversions"),
        F.round(F.sum(value_col), 2).alias("total_value"),
    )


def cuped_adjusted_means(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    split_ts: str,
    variant_col: str | None = None,
) -> DataFrame:
    """CUPED variance reduction for experiment readouts: per-user PRE-
    period activity (before ``split_ts``) is the covariate; the adjusted
    post-period metric is ``post − θ·(pre − mean(pre))`` with
    ``θ = cov(pre, post)/var(pre)`` pooled across variants — the
    experimentation-platform primitive that shrinks metric variance
    without touching the estimand.  ``variant_col`` defaults to
    ``user_col % 2`` (the deterministic hash-bucket arm).

    All moments are explicit (n, Σ, Σ², Σxy) sums pooled in ONE 1-row
    broadcast; per-user pre/post are one keyed agg; output is one row
    per variant: ``variant, n_users, mean_post, mean_adjusted, theta``
    (rounded 6; θ NULL when var(pre) = 0).
    """
    variant = (
        F.col(variant_col) if variant_col else (F.col(user_col) % 2).cast("int")
    ).alias("variant")
    pre = F.sum(
        F.when(F.col(ts_col) < F.lit(split_ts).cast("timestamp"), F.col(value_col))
    )
    post = F.sum(
        F.when(F.col(ts_col) >= F.lit(split_ts).cast("timestamp"), F.col(value_col))
    )
    per_user = df.groupBy(F.col(user_col), variant).agg(
        F.coalesce(pre, F.lit(0.0)).alias("pre"),
        F.coalesce(post, F.lit(0.0)).alias("post"),
    )
    stats = per_user.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("pre").alias("sx"),
        F.sum(F.col("pre") * F.col("pre")).alias("sxx"),
        F.sum("post").alias("sy"),
        F.sum(F.col("pre") * F.col("post")).alias("sxy"),
    )
    mx = F.col("sx") / F.col("n")
    varx = F.col("sxx") / F.col("n") - mx * mx
    cov = F.col("sxy") / F.col("n") - mx * (F.col("sy") / F.col("n"))
    theta = F.when(varx > 0, cov / varx)
    joined = per_user.crossJoin(F.broadcast(stats)).select(
        "variant",
        "post",
        (
            F.col("post")
            - F.coalesce(theta, F.lit(0.0)) * (F.col("pre") - mx)
        ).alias("adj"),
        theta.alias("__theta"),
    )
    return joined.groupBy("variant").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.round(F.avg("post"), 6).alias("mean_post"),
        F.round(F.avg("adj"), 6).alias("mean_adjusted"),
        F.round(F.first("__theta"), 6).alias("theta"),
    )


def conversion_within_window(
    df: DataFrame,
    trigger_type: str = "click",
    conversion_type: str = "purchase",
    window_seconds: int = 3600,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-window funnel conversion: the fraction of users with at least
    one ``trigger_type`` event followed by a ``conversion_type`` event
    within ``window_seconds`` — strictly after in (ts, id) order, so a
    conversion logged at the same instant but sequenced earlier doesn't
    count.

    No per-user pair join (quadratic for heavy users): one keyed window
    carries each event's NEXT conversion timestamp (min over the
    following frame), so the check is a per-row comparison.  Output: one
    row ``n_clickers, n_converted, conv_rate`` (rounded 6; rate NULL
    when no trigger events exist).
    """
    w = (
        Window.partitionBy(user_col)
        .orderBy(F.col(ts_col).asc(), F.col(id_col).asc())
        .rowsBetween(1, Window.unboundedFollowing)
    )
    next_conv = F.min(
        F.when(F.col(type_col) == conversion_type, F.col(ts_col))
    ).over(w)
    clicks = (
        df.withColumn("__next", next_conv)
        .where(F.col(type_col) == trigger_type)
        .select(
            F.col(user_col),
            (
                F.col("__next").isNotNull()
                & (
                    F.col("__next")
                    <= F.col(ts_col) + F.expr(f"INTERVAL {window_seconds} SECOND")
                )
            )
            .cast("int")
            .alias("conv"),
        )
    )
    per_user = clicks.groupBy(user_col).agg(F.max("conv").alias("conv"))
    return per_user.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clickers"),
        F.sum("conv").cast("bigint").alias("n_converted"),
        F.round(F.sum("conv") / F.count(F.lit(1)), 6).alias("conv_rate"),
    )


def scd2_run_intervals(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: str,
) -> DataFrame:
    """Build an SCD2-style change history from an event stream: per key,
    collapse CONSECUTIVE events carrying the same value into one
    validity interval — ``valid_from`` is the run's first event time,
    ``valid_to`` the next run's first event time (NULL for the current,
    open interval), the slowly-changing-dimension type-2 load that a
    warehouse build runs over change-capture feeds.  A value that
    recurs after an intervening different value opens a NEW interval
    (true SCD2, not a distinct-values rollup).

    Scale shape: gaps-and-islands entirely inside PER-KEY windows (two
    window passes + one (key, run) agg + one lead) — keyed by
    ``key_col`` throughout, no global window, no driver state.
    ``order_tiebreak`` breaks equal timestamps deterministically.

    Output: ``key_col, value_col, valid_from, valid_to, n_events``.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    # null-safe change test (IS DISTINCT FROM), plus an explicit first-row
    # start so a leading NULL value still opens a run
    changed = (
        (F.row_number().over(w) == 1)
        | ~F.lag(value_col).over(w).eqNullSafe(F.col(value_col))
    ).cast("long")
    runs = df.withColumn(
        "__run",
        F.sum(changed).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    per_run = runs.groupBy(key_col, "__run").agg(
        # value is constant within a run; MIN is the deterministic pick
        F.min(value_col).alias(value_col),
        F.min(ts_col).alias("valid_from"),
        F.count(F.lit(1)).cast("bigint").alias("n_events"),
    )
    wk = Window.partitionBy(key_col).orderBy("__run")
    return per_run.select(
        key_col,
        value_col,
        "valid_from",
        F.lead("valid_from").over(wk).alias("valid_to"),
        "n_events",
    )


def seasonal_indices(
    df: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
) -> DataFrame:
    """Day-of-week seasonal indices per key: mean value on each weekday
    divided by the key's overall mean — the classical multiplicative
    seasonality readout (index > 1 = that weekday runs hot), the first
    thing a forecaster or anomaly detector normalizes by.

    Weekday is computed as ``pmod(days_since_epoch + 4, 7)`` (0 = Sunday;
    1970-01-01 was a Thursday) — pure integer arithmetic, bit-identical
    across engines, unlike the engines' dayofweek() functions which
    disagree on the base index.  pmod, not ``%``: signed remainder would
    report dow = -1 for pre-1970 Saturdays.  A key whose overall mean is
    0 gets NULL indices (try_divide) instead of aborting the job under
    ANSI mode.

    Scale shape: one (key, dow) hash agg + one |keys| agg joined back —
    both value-domain bounded; no windows.  Output:
    ``key_col, dow, n, avg_value, seasonal_index``.
    """
    dow = F.pmod(
        F.datediff(F.to_date(F.col(ts_col)), F.to_date(F.lit("1970-01-01"))) + 4,
        F.lit(7),
    )
    per = (
        df.select(F.col(key_col), dow.alias("dow"), F.col(value_col).alias("__v"))
        .groupBy(key_col, "dow")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.avg("__v").alias("__avg"),
        )
    )
    overall = df.groupBy(key_col).agg(F.avg(value_col).alias("__all"))
    return (
        per.join(overall, key_col)
        .select(
            key_col,
            F.col("dow").cast("int").alias("dow"),
            "n",
            F.round("__avg", 6).alias("avg_value"),
            F.round(F.try_divide(F.col("__avg"), F.col("__all")), 6).alias(
                "seasonal_index"
            ),
        )
    )


def retention_decay(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    min_offsets: int = 3,
) -> DataFrame:
    """Per-cohort exponential retention-decay fit: regress
    ``ln(retained fraction)`` on day offset (offsets >= 1, fraction > 0)
    with closed-form OLS, reporting the slope and the implied half-life
    ``-ln(2)/slope`` — the one-number retention readout product teams
    track per acquisition cohort.

    Composes :func:`retention_cohorts`; the regression runs over the
    (|cohorts| x |offsets|)-bounded matrix via moment sums (same
    machinery as the Zipf/forecast fits) — one extra hash agg, no
    windows, no driver math beyond none (the fit is in-plan).

    Output: ``cohort_day, n_points, slope, half_life_days`` for cohorts
    with at least ``min_offsets`` usable offset points (slope < 0 gives
    a finite half-life; flat/growing cohorts report NULL half-life).
    """
    m = retention_cohorts(df, user_col, ts_col)
    base = m.filter(F.col("day_offset") == 0).select(
        "cohort_day", F.col("n_users").alias("__n0")
    )
    pts = (
        m.filter(F.col("day_offset") >= 1)
        .join(base, "cohort_day")
        .filter(F.col("n_users") > 0)
        .select(
            "cohort_day",
            F.col("day_offset").cast("double").alias("x"),
            F.log(F.col("n_users") / F.col("__n0")).alias("y"),
        )
    )
    agg = pts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return (
        agg.filter(F.col("n") >= min_offsets)
        .select(
            "cohort_day",
            F.col("n").cast("bigint").alias("n_points"),
            F.round(slope, 6).alias("slope"),
            F.round(
                F.when(slope < 0, -F.log(F.lit(2.0)) / slope), 6
            ).alias("half_life_days"),
        )
    )


def markov_transitions(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences: for every observed (state, next_state) pair, the count
    and the conditional probability P(next | state) — the "what do
    users do after X" product-analytics staple and the input to
    next-event prediction baselines.

    Scale shape: one per-user window (lead on (ts, id) order — keyed
    by the user, the same partitioning every sessionize/funnel op here
    uses), one (state, next_state) hash agg, and one |states|-keyed
    window for the row-normalizing totals (the state domain is tiny by
    construction; the frame under that window is |states|² aggregated
    rows, not events).  Each user's final event has no successor and
    drops out.

    Output: ``state, next_state, n, p`` (p rounded to 6).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    steps = (
        df.select(
            F.col(state_col).alias("state"),
            F.lead(state_col).over(w).alias("next_state"),
        )
        .where(F.col("next_state").isNotNull())
    )
    counts = steps.groupBy("state", "next_state").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = Window.partitionBy("state")
    return counts.withColumn(
        "p", F.round(F.col("n") / F.sum("n").over(tot), 6)
    )


def _ntile_from_rn(rn, n, buckets: int):
    """SQL NTILE(buckets) from a 1-based global row number and total n —
    the first ``n % buckets`` tiles get one extra row (integer math,
    engine-portable)."""
    q = F.floor(n / buckets)
    r = n % buckets
    head = r * (q + 1)
    return F.when(rn <= head, F.floor((rn - 1) / (q + 1)) + 1).otherwise(
        r + F.floor((rn - head - 1) / q) + 1
    )


def rfm_segments(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    buckets: int = 5,
) -> DataFrame:
    """RFM segmentation: per-user Recency (seconds since the user's last
    event, against the corpus max), Frequency (event count) and Monetary
    (summed value, rounded to 6 so the float sum is a stable sort key),
    each cut into global NTILE quintiles — the classic
    marketing-segmentation rollup (tile 1 = most recent / least frequent
    / lowest spend; ties broken by user id).

    Recency is measured in MICROSECONDS (``unix_micros``; exact
    integers, engine-portable — second-truncating ``unix_timestamp``
    would floor each side separately and disagree with engines that
    subtract first).

    Scale shape: one per-user agg, a 1-row anchor/total scalar cross,
    and per metric a scale-safe global row number via
    :func:`~flashml_spark.functions.windows.global_cumsum` over the
    unique (metric, user) struct key — range partition + offsets, never
    a single-partition NTILE window over |users| rows.  NTILE itself is
    rebuilt from the row number with integer math (`_ntile_from_rn`),
    bit-identical to SQL tie semantics because the order key is unique.

    Output: ``user_col, recency_us, frequency, monetary, r_tile, f_tile,
    m_tile, rfm`` (rfm = "R-F-M" string).
    """
    from flashml_spark.functions.windows import global_cumsum

    per_user = df.groupBy(user_col).agg(
        F.max(ts_col).alias("__last"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.round(F.coalesce(F.sum(value_col), F.lit(0.0)), 6).alias("monetary"),
    )
    anchor = df.agg(
        F.max(ts_col).alias("__anchor"),
        F.count_distinct(F.col(user_col)).cast("bigint").alias("__n"),
    )
    base = per_user.crossJoin(anchor).select(
        user_col,
        (
            F.unix_micros("__anchor") - F.unix_micros("__last")
        ).cast("bigint").alias("recency_us"),
        "frequency",
        "monetary",
        "__n",
    )
    out = base
    for metric, tile in (
        ("recency_us", "r_tile"),
        ("frequency", "f_tile"),
        ("monetary", "m_tile"),
    ):
        keyed = out.withColumn(
            "__k", F.struct(F.col(metric), F.col(user_col))
        ).withColumn("__one", F.lit(1))
        rn = global_cumsum(keyed, "__k", ["__one"], prefix="rn_")
        out = rn.withColumn(
            tile, _ntile_from_rn(F.col("rn___one"), F.col("__n"), buckets).cast("bigint")
        ).drop("__k", "__one", "rn___one", "__pid")
    return out.select(
        user_col,
        "recency_us",
        "frequency",
        "monetary",
        "r_tile",
        "f_tile",
        "m_tile",
        F.concat_ws("-", "r_tile", "f_tile", "m_tile").alias("rfm"),
    )


def kaplan_meier_survival(
    df: DataFrame, user_col: str, ts_col: str
) -> DataFrame:
    """Kaplan-Meier survival curve over user lifetimes (days between a
    user's first and last event), right-censoring users still active on
    the corpus's final day — the churn-analysis estimator that handles
    "hasn't churned YET" correctly instead of treating it as churn.

    ``S(t) = Π_{t_i ≤ t} (1 - d_i / n_i)`` with deaths ``d_i``
    (uncensored lifetimes ending at ``t_i``) and at-risk counts ``n_i``
    (lifetimes ≥ ``t_i``).  The product runs as ``exp(Σ ln factor)``
    with an explicit zero flag once ``d_i = n_i`` (Spark's ``log`` of 0
    is NULL, other engines -inf — the flag sidesteps both).

    Scale shape: one per-user agg, a 1-row (max-day, N) scalar cross,
    one (lifetime)-keyed agg, then cumulative windows over the
    POST-AGG |distinct lifetime days| frame — value-domain bounded
    (the accepted tiny-frame window class), never over users.
    Output: ``t, at_risk, deaths, censored_n, survival`` (rounded 6).
    """
    from pyspark.sql import Window

    day = F.col(ts_col).cast("date")
    per_user = df.groupBy(user_col).agg(
        F.min(day).alias("__first"),
        F.max(day).alias("__last"),
    )
    anchor = df.agg(
        F.max(day).alias("__maxday"),
        F.count_distinct(F.col(user_col)).cast("long").alias("__total"),
    )
    u = per_user.crossJoin(anchor).select(
        F.datediff("__last", "__first").cast("bigint").alias("t"),
        (F.col("__last") == F.col("__maxday")).cast("int").alias("__cens"),
        "__total",
    )
    g = u.groupBy("t", "__total").agg(
        F.count(F.lit(1)).alias("__ending"),
        F.sum(1 - F.col("__cens")).alias("deaths"),
        F.sum("__cens").alias("censored_n"),
    )
    w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    at_risk = F.col("__total") - F.sum("__ending").over(w) + F.col("__ending")
    s = g.withColumn("at_risk", at_risk).withColumn(
        "__dead_all",
        F.max((F.col("deaths") >= F.col("at_risk")).cast("int")).over(w),
    ).withColumn(
        "__lnsum",
        F.sum(
            F.when(
                F.col("deaths") < F.col("at_risk"),
                F.log(1.0 - F.col("deaths") / F.col("at_risk")),
            ).otherwise(F.lit(0.0))
        ).over(w),
    )
    return s.select(
        F.col("t"),
        F.col("at_risk").cast("bigint").alias("at_risk"),
        F.col("deaths").cast("bigint").alias("deaths"),
        F.col("censored_n").cast("bigint").alias("censored_n"),
        F.round(
            F.when(F.col("__dead_all") == 1, F.lit(0.0)).otherwise(
                F.exp(F.col("__lnsum"))
            ),
            6,
        ).alias("survival"),
    )


def position_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    conversion: str,
) -> DataFrame:
    """Position-based (40/20/40, "U-shaped") multi-touch attribution:
    each conversion's credit splits 0.4 to the journey's first touch,
    0.4 to its last, and 0.2 evenly across the middle — the standard
    middle ground between `last_touch_attribution`'s winner-take-all
    and linear models.  A journey is the run of non-conversion events
    between consecutive conversions; single-touch journeys take 1.0,
    two-touch journeys 0.5 each; a conversion with no prior touches
    goes unattributed (documented).

    Scale shape: journey ids from a per-user prior-conversion running
    count (keyed window), a semi-join onto converting journeys, one
    (user, journey)-keyed position window, and a |channels| agg — no
    global windows, no driver state.
    Output: ``channel, credit, n_touches`` (credit rounded to 6).
    """
    from pyspark.sql import Window

    conv = (F.col(state_col) == conversion).cast("int")
    wj = (
        Window.partitionBy(user_col)
        .orderBy(ts_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    j = df.select(
        F.col(user_col),
        F.col(ts_col),
        F.col(id_col),
        F.col(state_col),
        conv.alias("__conv"),
        F.coalesce(F.sum(conv).over(wj), F.lit(0)).alias("__journey"),
    )
    conv_j = j.where(F.col("__conv") == 1).select(
        user_col, "__journey"
    ).distinct()
    touches = j.where(F.col("__conv") == 0).join(
        conv_j, [user_col, "__journey"]
    )
    wp = Window.partitionBy(user_col, "__journey").orderBy(ts_col, id_col)
    wm = Window.partitionBy(user_col, "__journey")
    p = touches.select(
        F.col(state_col).alias("channel"),
        F.row_number().over(wp).alias("__pos"),
        F.count(F.lit(1)).over(wm).alias("__m"),
    )
    credit = (
        F.when(F.col("__m") == 1, F.lit(1.0))
        .when(F.col("__m") == 2, F.lit(0.5))
        .when((F.col("__pos") == 1) | (F.col("__pos") == F.col("__m")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("__m") - 2))
    )
    return (
        p.select("channel", credit.alias("__credit"))
        .groupBy("channel")
        .agg(
            F.round(F.sum("__credit"), 6).alias("credit"),
            F.count(F.lit(1)).cast("bigint").alias("n_touches"),
        )
    )


def ewma_weights(alpha: float, lags: int) -> list[float]:
    """The EWMA lag weights ``(1-alpha)**(j-1)``, j = 1..lags, computed
    ONCE in Python and injected as literals into BOTH the Spark plan and
    the SQL oracle — engine libm ``pow`` differences never enter."""
    return [(1.0 - alpha) ** j for j in range(lags)]


def ewma_anomaly(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    lags: int = 30,
    z: float = 3.0,
    min_lags: int = 5,
) -> DataFrame:
    """EWMA anomaly flags over a daily total: each day's value is
    compared against the exponentially-weighted moving average of the
    preceding ``lags`` observed days (weight ``(1-alpha)**(j-1)`` for
    the j-th most recent, normalized over the days actually present),
    and flagged when it deviates from that forecast by more than ``z``
    trailing standard deviations — the classic ops-monitoring detector,
    recursion unrolled into a bounded-lag weighted window so it stays a
    pure relational plan (no stateful fold).

    Scale shape: the raw frame reduces to |distinct days| rows in one
    keyed hash agg; the lag attachment is a self-join on a day-index
    band of width ``lags`` over that POST-AGG value-domain frame (a few
    thousand rows for decades of data), never over events.  Days with
    fewer than ``min_lags`` predecessors report NULL ewma and flag 0
    (warm-up).

    Cross-engine determinism: every sum that feeds a 6-decimal rounding
    is EXACT — daily revenue and the weighted/lag moment sums accumulate
    as decimals (association order can't shift an ulp), lag weights are
    Python-computed literals shared with the SQL oracle, and the
    trailing sd comes from exact moment sums, so the oracle comparison
    never sits on a rounding knife-edge.

    Output: ``d, revenue, ewma, sd, deviation, is_anomaly`` — floats
    rounded to 6; deviation = revenue - ewma.
    """
    weights = ewma_weights(alpha, lags)
    daily = df.groupBy(F.col(ts_col).cast("date").alias("d")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue")
    )
    w = Window.orderBy("d")
    idx = daily.select("d", "revenue", F.row_number().over(w).alias("__rn"))
    cur = idx.select(F.col("d"), F.col("revenue"), F.col("__rn").alias("__i"))
    prior = idx.select(F.col("revenue").alias("__pv"), F.col("__rn").alias("__j"))
    j = cur.join(
        prior,
        (F.col("__j") >= F.col("__i") - lags) & (F.col("__j") <= F.col("__i") - 1),
        "left",
    )
    wgt = F.element_at(
        F.array(*[F.lit(x) for x in weights]), (F.col("__i") - F.col("__j")).cast("int")
    )
    dec = "decimal(38,6)"
    agg = j.groupBy("d", "revenue", "__i").agg(
        F.count("__pv").alias("__np"),
        F.sum((wgt * F.col("__pv")).cast(dec)).cast("double").alias("__ws"),
        F.sum(F.when(F.col("__pv").isNotNull(), wgt).cast(dec))
        .cast("double")
        .alias("__wt"),
        F.sum(F.col("__pv").cast(dec)).cast("double").alias("__s1"),
        F.sum((F.col("__pv") * F.col("__pv")).cast(dec))
        .cast("double")
        .alias("__s2"),
    )
    np_ = F.col("__np").cast("double")
    # greatest(.,0): exact-cancellation noise on near-constant lags must
    # not feed sqrt a tiny negative
    var = F.greatest(
        (np_ * F.col("__s2") - F.col("__s1") * F.col("__s1"))
        / (np_ * (np_ - 1)),
        F.lit(0.0),
    )
    ok = F.col("__np") >= min_lags
    ewma = F.when(ok, F.col("__ws") / F.col("__wt"))
    sd = F.when(ok, F.sqrt(var))
    dev = F.col("revenue") - ewma
    return agg.select(
        "d",
        F.round("revenue", 6).alias("revenue"),
        F.round(ewma, 6).alias("ewma"),
        F.round(sd, 6).alias("sd"),
        F.round(dev, 6).alias("deviation"),
        F.when(sd.isNotNull() & (F.abs(dev) > z * sd), F.lit(1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("is_anomaly"),
    ).orderBy("d")


def markov_transition_counts_with_bounds(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    conv_state: str,
) -> DataFrame:
    """Journey-level transition counts for attribution chains: per-user
    event sequences split into journeys at each ``conv_state`` event
    (the conversion closes its journey, exactly x185's journey
    derivation); every journey contributes START -> first touch,
    touch -> touch steps, and last touch -> CONV (converting journey)
    or -> DROP (trailing unconverted journey).  Touchless conversions
    contribute START -> CONV directly.

    Scale shape: one per-user window pass for journey ids + leads, one
    (state, next_state) hash agg — identical shuffle shape to
    :func:`markov_transitions`.  Output: ``state, next_state, n``.
    """
    wj = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    conv = F.when(F.col(state_col) == conv_state, 1).otherwise(0)
    j = df.select(
        F.col(user_col).alias("__u"),
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(state_col).alias("__st"),
        conv.alias("__conv"),
        F.coalesce(
            F.sum(conv).over(
                wj.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0),
        ).alias("__journey"),
    )
    wp = Window.partitionBy("__u", "__journey").orderBy("__ts", "__id")
    steps = j.select(
        "__u",
        "__journey",
        "__st",
        "__conv",
        F.row_number().over(wp).alias("__pos"),
        F.lead("__st").over(wp).alias("__next"),
    )
    # START -> first element of every journey
    starts = steps.where(F.col("__pos") == 1).select(
        F.lit("START").alias("state"),
        F.when(F.col("__conv") == 1, F.lit("CONV"))
        .otherwise(F.col("__st"))
        .alias("next_state"),
    )
    # touch -> successor (touch rows only; a conversion row terminates
    # its journey and emits nothing itself)
    mids = steps.where(F.col("__conv") == 0).select(
        F.col("__st").alias("state"),
        F.when(F.col("__next").isNull(), F.lit("DROP"))
        .when(F.col("__next") == conv_state, F.lit("CONV"))
        .otherwise(F.col("__next"))
        .alias("next_state"),
    )
    return (
        starts.unionByName(mids)
        .groupBy("state", "next_state")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )


def markov_removal_attribution(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    conv_state: str,
) -> DataFrame:
    """Markov-chain (removal-effect) multi-touch attribution, the
    data-driven alternative to x141/x185's positional rules (Anderl et
    al. 2016): fit a first-order chain over journeys with absorbing
    CONV/DROP states, then credit each channel by how much the overall
    conversion probability drops when that channel is removed
    (its transitions redirected to DROP).  ``share`` normalizes the
    removal effects to sum to 1.

    Scale shape: the transition counts are fully distributed (one
    window pass + one hash agg, see
    :func:`markov_transition_counts_with_bounds`); only the
    |states|² transition matrix is collected — states are the event-type
    domain, a few dozen at most — and the absorbing-chain solves run on
    that matrix driver-side (numpy, exact LU), one (|states|-1)² solve
    per channel.  The matrix inverse itself is not SQL-expressible, but
    since r10 the x192 registration carries a planted-fixture
    execution-forcing oracle (closed-form chain pins + an output-
    measured corpus channel count); unit tests pin further chains.

    Output: ``channel, p_conv_full, p_conv_removed, removal_effect,
    share`` (rounded to 6), one row per non-absorbing channel.
    """
    import numpy as np

    counts = markov_transition_counts_with_bounds(
        df, user_col, ts_col, id_col, state_col, conv_state
    ).collect()  # |states|^2 bounded: event-type domain
    schema = (
        "channel string, p_conv_full double, p_conv_removed double, "
        "removal_effect double, share double"
    )
    if not counts:
        return df.sparkSession.createDataFrame([], schema)
    states = sorted(
        ({r["state"] for r in counts} | {r["next_state"] for r in counts})
        - {"CONV", "DROP"}
    )
    idx = {s: i for i, s in enumerate(states)}
    n = len(states)
    trans = np.zeros((n, n + 2))  # columns: states..., CONV, DROP
    for r in counts:
        i = idx[r["state"]]
        if r["next_state"] == "CONV":
            trans[i, n] += r["n"]
        elif r["next_state"] == "DROP":
            trans[i, n + 1] += r["n"]
        else:
            trans[i, idx[r["next_state"]]] += r["n"]

    def p_conv(removed: int | None) -> float:
        t = trans.copy()
        if removed is not None:
            t[:, n + 1] += t[:, removed]  # into-channel edges -> DROP
            t[:, removed] = 0.0
            t[removed, :] = 0.0
        rows = t.sum(axis=1)
        safe = np.where(rows > 0, rows, 1.0)
        q = t[:, :n] / safe[:, None]
        b = t[:, n] / safe
        sol = np.linalg.solve(np.eye(n) - q, b)
        return float(sol[idx["START"]])

    full = p_conv(None)
    out = []
    channels = [s for s in states if s != "START"]
    effects = {}
    for c in channels:
        pr = p_conv(idx[c])
        effects[c] = max(0.0, (full - pr) / full) if full > 0 else 0.0
        out.append((c, pr))
    tot = sum(effects.values())
    spark = df.sparkSession
    rows = [
        (
            c,
            round(full, 6),
            round(pr, 6),
            round(effects[c], 6),
            round(effects[c] / tot, 6) if tot > 0 else 0.0,
        )
        for c, pr in out
    ]
    return spark.createDataFrame(rows, schema)


def two_proportion_ztest(
    df: DataFrame,
    user_col: str,
    variant_expr,
    conv_expr,
) -> DataFrame:
    """Two-proportion z-test for an A/B conversion readout: users split
    by ``variant_expr`` (0/1), converted when ANY of their rows
    satisfies ``conv_expr``; the pooled-variance z statistic compares
    the two conversion rates (CUPED's x154 sharpens a mean metric; this
    is the categorical-outcome counterpart).

    Scale shape: one per-user agg (keyed), one 2-row variant agg, one
    1-row pivot — counts stay integers until the final single
    divisions, so every output is bit-identical across engines.

    Output (1 row): ``n_a, conv_a, rate_a, n_b, conv_b, rate_b, z,
    significant`` (rates/z rounded 6; significant = |z| > 1.96).
    """
    per_user = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.max(variant_expr).cast("int").alias("__variant"),
        F.max(F.when(conv_expr, 1).otherwise(0)).alias("__conv"),
    )
    counts = per_user.agg(
        F.sum(F.when(F.col("__variant") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_a"),
        F.sum(F.when((F.col("__variant") == 0) & (F.col("__conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("conv_a"),
        F.sum(F.when(F.col("__variant") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_b"),
        F.sum(F.when((F.col("__variant") == 1) & (F.col("__conv") == 1), 1).otherwise(0))
        .cast("bigint")
        .alias("conv_b"),
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pp * (1 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    zstat = F.when(se > 0, (pa - pb) / se).otherwise(F.lit(0.0))
    return counts.select(
        "n_a",
        "conv_a",
        F.round(pa, 6).alias("rate_a"),
        "n_b",
        "conv_b",
        F.round(pb, 6).alias("rate_b"),
        F.round(zstat, 6).alias("z"),
        F.when(F.abs(zstat) > 1.96, 1).otherwise(0).cast("int").alias("significant"),
    )


def logrank_test(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    group_expr,
) -> DataFrame:
    """Two-group log-rank test over user lifetimes — the significance
    readout for x184's Kaplan-Meier curves: do the two cohorts churn at
    the same rate?  Lifetimes and right-censoring follow x184 exactly
    (days first->last event, censored at the corpus max day); the
    statistic is the standard Mantel-Haenszel form
    ``chi2 = (O1 - E1)^2 / V`` over the distinct death times.

    Scale shape: one per-user agg; every later stage runs on the
    |distinct lifetime days| x 2 value-domain frame — per-group at-risk
    counts come from a grp-keyed cumulative window that counts ALL
    endings (deaths AND censorings reduce the risk set), then a
    conditional-sum pivot per death time and a 1-row reduction.

    Output (1 row): ``o1, e1, o2, e2, chi2`` (floats rounded 6).
    """
    day = F.col(ts_col).cast("date")
    anchor = df.select(F.max(day).alias("__maxd"))
    u = (
        df.groupBy(F.col(user_col).alias("__u"))
        .agg(
            F.min(day).alias("__first"),
            F.max(day).alias("__last"),
            F.max(group_expr).cast("int").alias("__grp"),
        )
        .crossJoin(F.broadcast(anchor))
        .select(
            F.datediff(F.col("__last"), F.col("__first")).alias("__t"),
            F.when(F.col("__last") == F.col("__maxd"), 1)
            .otherwise(0)
            .alias("__cens"),
            "__grp",
        )
    )
    end = u.groupBy("__t", "__grp").agg(
        F.count(F.lit(1)).alias("__ending"),
        F.sum(1 - F.col("__cens")).alias("__deaths"),
    )
    totals = u.groupBy("__grp").agg(F.count(F.lit(1)).alias("__total"))
    # dense (t x grp) frame so the cumulative never skips a time where
    # only the OTHER group had endings
    allt = end.select("__t").distinct().crossJoin(
        end.select("__grp").distinct()
    )
    dense = (
        allt.join(end, ["__t", "__grp"], "left")
        .fillna(0, ["__ending", "__deaths"])
        .join(totals, "__grp")
    )
    w = Window.partitionBy("__grp").orderBy("__t")
    risky = dense.select(
        "__t",
        "__grp",
        "__deaths",
        (
            F.col("__total") - F.sum("__ending").over(w) + F.col("__ending")
        ).alias("__at_risk"),
    )
    wide = risky.groupBy("__t").agg(
        F.sum(F.when(F.col("__grp") == 0, F.col("__deaths")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("__grp") == 1, F.col("__deaths")).otherwise(0)).alias("d2"),
        F.sum(F.when(F.col("__grp") == 0, F.col("__at_risk")).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("__grp") == 1, F.col("__at_risk")).otherwise(0)).alias("n2"),
    )
    dt = F.col("d1") + F.col("d2")
    nt = F.col("n1") + F.col("n2")
    terms = wide.where((dt > 0) & (nt > 1)).select(
        F.col("d1").alias("__o1"),
        F.col("d2").alias("__o2"),
        (dt * F.col("n1") / nt).alias("__e1"),
        (dt * F.col("n2") / nt).alias("__e2"),
        (
            dt
            * (F.col("n1") / nt)
            * (F.col("n2") / nt)
            * (nt - dt)
            / (nt - 1)
        ).alias("__v"),
    )
    agg = terms.agg(
        F.sum("__o1").cast("bigint").alias("o1"),
        F.sum("__e1").alias("__se1"),
        F.sum("__o2").cast("bigint").alias("o2"),
        F.sum("__e2").alias("__se2"),
        F.sum("__v").alias("__sv"),
    )
    chi2 = F.when(
        F.col("__sv") > 0,
        (F.col("o1") - F.col("__se1")) * (F.col("o1") - F.col("__se1")) / F.col("__sv"),
    ).otherwise(F.lit(0.0))
    return agg.select(
        "o1",
        F.round("__se1", 6).alias("e1"),
        "o2",
        F.round("__se2", 6).alias("e2"),
        F.round(chi2, 6).alias("chi2"),
    )


def densify_daily(
    df: DataFrame,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Calendar densification: the daily aggregate with every missing
    calendar day between the corpus min and max dates materialized as
    an explicit zero row — the step LOCF (x128), forecasting (x122) and
    EWMA (x188) consumers need when "no rows" must mean 0, not a
    silently skipped lag.

    Scale shape: the raw frame reduces to |days| in one keyed agg; the
    spine is a 1-row min/max agg exploded into a |calendar days|
    sequence (value-domain, never row-scaled) and left-joined back.

    Output: ``d, n, total, is_gap`` (total rounded 6; gap rows carry
    n=0, total=0.0, is_gap=1).
    """
    day = F.col(ts_col).cast("date")
    daily = df.groupBy(day.alias("__d")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(value_col).alias("__total"),
    )
    spine = (
        df.agg(F.min(day).alias("__lo"), F.max(day).alias("__hi"))
        .select(
            F.explode(
                F.sequence(
                    F.col("__lo"), F.col("__hi"), F.expr("interval 1 day")
                )
            ).alias("__d")
        )
    )
    return (
        spine.join(daily, "__d", "left")
        .select(
            F.col("__d").alias("d"),
            F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n"),
            F.round(F.coalesce(F.col("__total"), F.lit(0.0)), 6).alias("total"),
            F.when(F.col("n").isNull(), 1).otherwise(0).cast("int").alias("is_gap"),
        )
    )


def _theil_sen_driver(spark, rows) -> DataFrame:
    """Exact driver-side twin of the distributed Theil-Sen pipeline in
    :func:`theil_sen_trend` for a bounded daily frame.

    Bit-exactness argument: each pairwise slope is ONE double subtract,
    ONE integer subtract and ONE double division — three correctly
    rounded IEEE-754 operations with NO accumulation, so numpy float64
    reproduces the JVM expression bit-for-bit per pair.  The lower
    median mirrors the ``global_cumsum`` condition (min slope with
    ``2*cum >= n_pairs`` = the 1-based ``ceil(n_pairs/2)``-th smallest);
    ``+ 0.0`` mirrors Spark's -0.0 → 0.0 grouping-key normalization;
    round(6) uses the Spark ``Round`` mirror (BigDecimal shortest-repr
    HALF_UP, the ``_markov_horizon_driver`` argument).  A day whose
    values are all NULL yields NULL slopes (NaN here): the cumsum
    orders NULLS FIRST and ``F.min`` skips them, mirrored by counting
    the NaNs ahead of the sorted finite slopes and clamping the pick
    to the first finite one (None when no finite slope exists)."""
    from decimal import ROUND_HALF_UP, Decimal

    import numpy as np

    n_days = len(rows)
    if n_days < 2:
        return spark.createDataFrame(
            [(n_days, 0, None)],
            "n_days bigint, n_pairs bigint, slope_per_day double",
        )
    order = sorted(rows, key=lambda r: r["__x"])  # unique post-agg days
    xs = np.array([r["__x"] for r in order], dtype=np.int64)
    ys = np.array([r["__v"] for r in order], dtype=np.float64)  # None->NaN
    n_pairs = n_days * (n_days - 1) // 2
    slopes = np.empty(n_pairs, dtype=np.float64)
    pos = 0
    for i in range(n_days - 1):
        m = n_days - 1 - i
        slopes[pos:pos + m] = (ys[i + 1:] - ys[i]) / (xs[i + 1:] - xs[i])
        pos += m
    slopes = slopes[~np.isnan(slopes)]  # NULL-day slopes: cum-first, min-skipped
    n_nan = n_pairs - slopes.size
    k = (n_pairs + 1) // 2  # smallest 1-based cum with 2*cum >= n_pairs
    if slopes.size == 0:
        med6 = None
    else:
        slopes += 0.0  # -0.0 -> 0.0, the groupBy-key normalization
        i1 = max(1, k - n_nan)  # first FINITE cell whose cum reaches k
        slopes.partition(i1 - 1)  # in-place: no second 8*n_pairs buffer
        med = float(slopes[i1 - 1])
        med6 = float(
            Decimal(repr(med)).quantize(
                Decimal("1e-6"), rounding=ROUND_HALF_UP
            )
        ) + 0.0
    return spark.createDataFrame(
        [(n_days, n_pairs, med6)],
        "n_days bigint, n_pairs bigint, slope_per_day double",
    )


def theil_sen_trend(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    driver_days_budget: int = 8192,
) -> DataFrame:
    """Theil-Sen robust trend of a daily total: the MEDIAN of all
    pairwise slopes between distinct days — the estimator that shrugs
    off the outlier days x188 flags (OLS x122/x174 chase them;
    breakdown point 29.3 %).  The median is the exact lower median,
    computed scale-safely.

    Scale shape: events reduce to the |days| frame in one keyed agg
    (exact decimal revenue, the x188 determinism rule); daily frames
    within ``driver_days_budget`` solve the slope median as ONE
    vectorized pass on the driver (|days| is calendar-bounded, so this
    is the steady-state path at every scale — see
    :func:`_theil_sen_driver` for the bit-exactness mirror); past the
    budget the pairwise slopes are a |days|²/2 self-join of that
    POST-AGG value-domain frame and the median uses ``global_cumsum``'s
    range-partition + offsets machinery, so no single-partition window
    ever sees the slope frame.

    Output (1 row): ``n_days, n_pairs, slope_per_day`` (slope rounded
    6; with < 2 distinct days the row carries n_pairs = 0 and a NULL
    slope).
    """
    from flashml_spark.functions.windows import global_cumsum

    daily = df.groupBy(F.col(ts_col).cast("date").alias("__d")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)"))
        .cast("double")
        .alias("__v")
    )
    # Bounded driver solve (r11, the markov/kcore/BFS budget pattern):
    # |days| is calendar-bounded (two decades ≈ 7.3k rows) while the
    # slope join is |days|²/2 — the limit-probe collect doubles as the
    # size gate, and past the budget the distributed path below runs
    # unchanged.  See _theil_sen_driver for the bit-exactness argument.
    if driver_days_budget and driver_days_budget > 0:
        probe = (
            daily.select(
                F.datediff(
                    F.col("__d"), F.lit("1970-01-01").cast("date")
                ).alias("__x"),
                "__v",
            )
            .limit(driver_days_budget + 1)
            .collect()
        )
        if len(probe) <= driver_days_budget:
            return _theil_sen_driver(df.sparkSession, probe)
    a = daily.select(
        F.datediff(F.col("__d"), F.lit("1970-01-01").cast("date")).alias("__x1"),
        F.col("__v").alias("__y1"),
    )
    b = daily.select(
        F.datediff(F.col("__d"), F.lit("1970-01-01").cast("date")).alias("__x2"),
        F.col("__v").alias("__y2"),
    )
    pairs = a.join(b, F.col("__x1") < F.col("__x2")).select(
        (
            (F.col("__y2") - F.col("__y1")) / (F.col("__x2") - F.col("__x1"))
        ).alias("__slope")
    )
    cells = pairs.groupBy("__slope").agg(F.count(F.lit(1)).alias("__c"))
    cum = global_cumsum(cells, "__slope", ["__c"])
    # n_pairs = sum of the slope-cell counts, read from the frame
    # global_cumsum already pinned — counting ``pairs`` directly would
    # re-execute the |days|^2 slope join a second time
    # coalesce: sum over an EMPTY cell frame is NULL, but the < 2-day
    # contract is n_pairs = 0 (count() semantics)
    tot = cum.agg(
        F.coalesce(F.sum("__c"), F.lit(0)).cast("bigint").alias("n_pairs")
    )
    days = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n_days"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("cum___c") * 2 >= F.col("n_pairs"))
        .agg(F.min("__slope").alias("__med"))
    )
    return (
        days.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(med))
        .select("n_days", "n_pairs", F.round("__med", 6).alias("slope_per_day"))
    )


def time_weighted_average(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-user time-weighted average (TWAP semantics): each observation
    holds from its timestamp until the next one, so its weight is that
    holding duration in seconds — the right average for sampled state
    (a sensor level, a price, a session quality score), where the plain
    mean over-counts bursts.  The final observation has no successor
    and contributes no interval (standard TWAP).

    Scale shape: one per-user lead window (the sessionize partitioning)
    + one keyed agg.  Users with a single event (no interval) drop out.

    Output: ``<user_col>, n_intervals, span_seconds, twap, plain_avg``
    (floats rounded 6) — plain_avg over the SAME interval-opening rows,
    so the two columns differ exactly by the duration weighting.
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, id_col)
    stepped = df.select(
        user_col,
        F.col(value_col).alias("__v"),
        (
            F.lead(F.col(ts_col).cast("double")).over(w)
            - F.col(ts_col).cast("double")
        ).alias("__dur"),
    ).where(F.col("__dur").isNotNull())
    return (
        stepped.groupBy(user_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_intervals"),
            F.round(F.sum("__dur"), 6).alias("span_seconds"),
            F.round(
                F.sum(F.col("__v") * F.col("__dur")) / F.sum("__dur"), 6
            ).alias("twap"),
            F.round(F.avg("__v"), 6).alias("plain_avg"),
        )
    )


def running_peak_drawdown(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key maximum drawdown of the running total: the largest drop
    from a running peak — the churn-risk / spend-collapse readout
    (finance's max-drawdown applied to any cumulative series).

    Scale shape: ONE keyed window spec serves the running sum, and a
    second pass over the same partitioning takes the running max and
    the max gap — Catalyst shares the sort, so it's one shuffle on the
    key.  Output: ``<key_col>, n, final_total, peak, max_drawdown``
    (floats rounded 6).
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    # two stacked windows over the SAME partitioning + order: Catalyst
    # shares one sort/shuffle; the running peak follows EVENT order
    cum = df.select(
        key_col,
        F.col(ts_col).alias("__ts"),
        F.col(id_col).alias("__id"),
        F.col(value_col).alias("__v"),
        F.sum(value_col).over(w).alias("__cum"),
    )
    wp = (
        Window.partitionBy(key_col)
        .orderBy("__ts", "__id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cum.withColumn("__peak", F.max("__cum").over(wp))
    return (
        cum.groupBy(key_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(F.max("__cum"), 6).alias("peak"),
            F.round(F.sum("__v"), 6).alias("final_total"),
            F.round(F.max(F.col("__peak") - F.col("__cum")), 6).alias(
                "max_drawdown"
            ),
        )
        .select(key_col, "n", "final_total", "peak", "max_drawdown")
    )


def ltv_curve(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    max_days: int = 60,
) -> DataFrame:
    """Average cumulative revenue per user by account age (LTV curve):
    day k's value is the mean over ALL users of revenue accrued in
    their first k days — the payback-horizon curve a marketing budget
    is set against.  Users enter at their first event; days beyond
    ``max_days`` truncate.

    Scale shape: first-seen agg joined back (keyed), per-(user, offset)
    agg, then an |offsets| x 1 frame: per-offset totals cumulate over
    the value-domain day axis and divide by the FIXED user count (every
    user is in every day's denominator — no survivorship bias).

    Output: ``day_offset, n_users_active, cum_revenue_per_user``
    (rounded 6), ``max_days + 1`` rows at most.
    """
    day = F.col(ts_col).cast("date")
    first = df.groupBy(user_col).agg(F.min(day).alias("__first"))
    n_users = first.agg(
        F.count(F.lit(1)).cast("double").alias("__n_users")
    )
    per = (
        df.join(first, user_col)
        .select(
            F.col(user_col).alias("__u"),
            F.datediff(day, F.col("__first")).alias("day_offset"),
            F.col(value_col).alias("__v"),
        )
        .where(F.col("day_offset") <= max_days)
        .groupBy("day_offset")
        .agg(
            F.countDistinct("__u").cast("bigint").alias("n_users_active"),
            F.sum(F.coalesce(F.col("__v"), F.lit(0.0))).alias("__rev"),
        )
    )
    w = Window.orderBy("day_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        per.crossJoin(F.broadcast(n_users))
        .select(
            F.col("day_offset").cast("bigint").alias("day_offset"),
            "n_users_active",
            F.round(F.sum("__rev").over(w) / F.col("__n_users"), 6).alias(
                "cum_revenue_per_user"
            ),
        )
    )


def weekday_adjusted_anomaly(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    k: float = 5.0,
) -> DataFrame:
    """Seasonality-robust daily anomaly flags: each day's total is
    compared against ITS WEEKDAY's median, scaled by that weekday's MAD
    — the robust twin of x188's EWMA detector (a weekly cycle never
    trips it, and one wild day cannot poison the baseline the way it
    inflates a mean/sd).  Flag when ``|x - median_w| > k * MAD_w``.

    Scale shape: daily totals (exact decimal), then medians/MADs via
    two keyed distinct-value cumulative passes over the 7-weekday
    value domain; one join back on weekday.

    Output: ``d, weekday, revenue, wd_median, wd_mad, is_anomaly``.
    """
    daily = df.groupBy(F.col(ts_col).cast("date").alias("d")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue")
    )
    wd = daily.select(
        "d",
        (((F.dayofweek("d") + 5) % 7) + 1).cast("bigint").alias("weekday"),
        "revenue",
    )

    def _lower_median(frame: DataFrame, grp: str, val: str, out: str) -> DataFrame:
        cells = frame.groupBy(grp, F.col(val).alias("__v")).agg(
            F.count(F.lit(1)).alias("__c")
        )
        cw = Window.partitionBy(grp).orderBy("__v")
        tot = Window.partitionBy(grp)
        cum = cells.select(
            grp,
            "__v",
            F.sum("__c").over(cw).alias("__cw"),
            F.sum("__c").over(tot).alias("__tw"),
        )
        return (
            cum.where(F.col("__cw") * 2 >= F.col("__tw"))
            .groupBy(grp)
            .agg(F.min("__v").alias(out))
        )

    med = _lower_median(wd, "weekday", "revenue", "wd_median")
    dev = wd.join(med, "weekday").select(
        "weekday",
        "d",
        "revenue",
        "wd_median",
        F.abs(F.col("revenue") - F.col("wd_median")).alias("__ad"),
    )
    mad = _lower_median(dev, "weekday", "__ad", "wd_mad")
    out = dev.join(mad, "weekday")
    return out.select(
        "d",
        "weekday",
        F.round("revenue", 6).alias("revenue"),
        F.round("wd_median", 6).alias("wd_median"),
        F.round("wd_mad", 6).alias("wd_mad"),
        F.when(
            (F.col("wd_mad") > 0)
            & (F.col("__ad") > F.lit(k) * F.col("wd_mad")),
            1,
        )
        .otherwise(0)
        .cast("int")
        .alias("is_anomaly"),
    )


def funnel_stage_latencies(
    df: DataFrame,
    stages: tuple[str, ...] = ("view", "click", "purchase"),
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
    gap_minutes: int = 30,
    quantiles: list[float] | None = None,
) -> DataFrame:
    """Per-stage-transition latency quantiles inside sessions: for each
    consecutive funnel pair (stage k-1 -> stage k, weak ordering by
    earliest event, x48's session semantics), the distribution of
    seconds between the two earliest occurrences — the "WHERE does the
    funnel stall" readout that x48's reach counts cannot answer.

    Scale shape: sessionize (one user shuffle) -> conditional-min per
    session -> per-transition latency rows -> the exact lower-quantile
    machinery over each transition's distinct-value domain.

    Output: ``stage, q, value`` (value = microseconds, bigint), one
    row per (transition, quantile).
    """
    from flashml_spark.operators.relational import exact_quantiles_per_group

    qs = quantiles or [0.5]
    s = sessionize(df, user_col, ts_col, id_col, gap_minutes)
    mins = [
        F.min(F.when(F.col(type_col) == st, F.col(ts_col))).alias(f"__t{i}")
        for i, st in enumerate(stages)
    ]
    per = s.groupBy(user_col, "session_idx").agg(*mins)
    parts = []
    for i in range(1, len(stages)):
        lat = F.unix_micros(F.col(f"__t{i}")) - F.unix_micros(
            F.col(f"__t{i-1}")
        )
        parts.append(
            per.where(
                F.col(f"__t{i-1}").isNotNull()
                & F.col(f"__t{i}").isNotNull()
                & (lat >= 0)
            ).select(
                F.lit(f"{stages[i-1]}->{stages[i]}").alias("stage"),
                lat.cast("bigint").alias("__lat"),
            )
        )
    allp = parts[0]
    for p in parts[1:]:
        allp = allp.unionByName(p)
    return exact_quantiles_per_group(allp, "stage", "__lat", qs).withColumnRenamed(
        "value", "value"
    )


def pareto_concentration(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 0.8,
) -> DataFrame:
    """Pareto (80/20) concentration: the smallest number of keys whose
    summed value reaches ``threshold`` of the total, keys ranked by
    value descending — "how many customers make 80 % of revenue".

    Scale shape: one keyed agg to per-key EXACT-decimal totals, then a
    scale-safe global cumulative (range-partition + offsets via
    ``global_cumsum`` on a (-value, key) composite — no single-partition
    window over |keys|), and a 1-row reduction.  Determinism: the
    ENTIRE chain stays decimal — per-key totals, the cumulative, and
    the threshold product — so the prefix-boundary comparison is exact
    integer arithmetic on both engines (a double cumulative would
    associate differently in the offsets machinery vs a sequential SQL
    window and could flip the boundary row).

    Output (1 row): ``n_keys, total_value, n_top, pct_keys``
    (total rounded 6; ``n_top`` keys reach the threshold).
    """
    from flashml_spark.functions.windows import global_cumsum

    per = df.groupBy(F.col(key_col).alias("__k")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__v")
    )
    ordered = per.select(
        F.struct((-F.col("__v")).alias("a"), F.col("__k").alias("b")).alias(
            "__ord"
        ),
        "__v",
    )
    cum = global_cumsum(ordered, "__ord", ["__v"])
    thr = F.lit(str(threshold)).cast("decimal(10,6)")
    tot = per.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_keys"),
        F.sum("__v").alias("__tot"),
    )
    reach = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("cum___v") - F.col("__v") < thr * F.col("__tot"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_top"))
    )
    return (
        tot.crossJoin(F.broadcast(reach))
        .select(
            "n_keys",
            F.round(F.col("__tot").cast("double"), 6).alias("total_value"),
            "n_top",
            F.round(F.col("n_top") / F.col("n_keys"), 6).alias("pct_keys"),
        )
    )


def ab_ztest_curve(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    variant_expr,
    conv_expr,
) -> DataFrame:
    """Sequential A/B monitoring curve: the two-proportion z statistic
    recomputed at each day boundary over CUMULATIVE first-conversions —
    the "peeking" trace an experimentation dashboard plots (and the
    reason naive daily peeking inflates false positives; the curve
    makes the wandering visible).  A user enters their variant's
    denominator on their first event day and the conversion numerator
    on their first conversion day.

    Scale shape: two per-user aggs (first seen, first conversion),
    keyed day aggs, then cumulative sums and the z formula on the
    |days| x 2 value-domain frame.  Counts stay integers to the final
    divisions — bit-identical across engines.

    Output: ``d, n_a, conv_a, n_b, conv_b, z`` per day (z rounded 6;
    0.0 while either arm is empty).
    """
    day = F.col(ts_col).cast("date")
    per_user = df.groupBy(F.col(user_col).alias("__u")).agg(
        F.max(variant_expr).cast("int").alias("__variant"),
        F.min(day).alias("__first"),
        F.min(F.when(conv_expr, day)).alias("__conv_day"),
    )
    entries = per_user.groupBy(F.col("__first").alias("d")).agg(
        F.sum(F.when(F.col("__variant") == 0, 1).otherwise(0)).alias("__ea"),
        F.sum(F.when(F.col("__variant") == 1, 1).otherwise(0)).alias("__eb"),
    )
    convs = (
        per_user.where(F.col("__conv_day").isNotNull())
        .groupBy(F.col("__conv_day").alias("d"))
        .agg(
            F.sum(F.when(F.col("__variant") == 0, 1).otherwise(0)).alias("__ca"),
            F.sum(F.when(F.col("__variant") == 1, 1).otherwise(0)).alias("__cb"),
        )
    )
    daily = entries.join(convs, "d", "full").fillna(
        0, ["__ea", "__eb", "__ca", "__cb"]
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = daily.select(
        "d",
        F.sum("__ea").over(w).cast("bigint").alias("n_a"),
        F.sum("__ca").over(w).cast("bigint").alias("conv_a"),
        F.sum("__eb").over(w).cast("bigint").alias("n_b"),
        F.sum("__cb").over(w).cast("bigint").alias("conv_b"),
    )
    pa = F.col("conv_a") / F.col("n_a")
    pb = F.col("conv_b") / F.col("n_b")
    pp = (F.col("conv_a") + F.col("conv_b")) / (F.col("n_a") + F.col("n_b"))
    se = F.sqrt(pp * (1 - pp) * (1.0 / F.col("n_a") + 1.0 / F.col("n_b")))
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se > 0), (pa - pb) / se
    ).otherwise(F.lit(0.0))
    return cum.select(
        "d", "n_a", "conv_a", "n_b", "conv_b", F.round(z, 6).alias("z")
    )


def changepoint_single_split(
    df: DataFrame,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Single-changepoint detection on the daily series via exact binary
    segmentation: evaluate EVERY candidate split day k, pick the one
    minimizing within-segment sum of squares (equivalently maximizing
    the between-segment F statistic) — the first step of binary
    segmentation (Scott & Knott 1974) done exactly, no iterative
    scanning.

    Scale shape: the corpus collapses to |days| exact-decimal daily
    totals; prefix sums/sum-of-squares run over that bounded frame, so
    every candidate split is one row of arithmetic — the |days| frame is
    date-range-bounded, never row-count-bounded.  Sums convert
    decimal→double once, so both engines do identical float arithmetic
    (x188's rule).

    Output (1 row): ``last_before_date, n_before, n_after,
    mean_before, mean_after, sse_reduction_pct, f_stat`` — the BEFORE
    segment ends on ``last_before_date`` inclusive (the series may have
    calendar gaps, so the boundary is named by a day that exists).
    """
    from flashml_spark.functions.windows import global_cumsum

    daily = df.groupBy(F.col(ts_col).cast("date").alias("d")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("__sd")
    )
    # per-day value = day total; the changepoint is over the daily
    # series.  |days|-bounded and read twice (prefix sums + totals) —
    # checkpointed so the corpus agg runs once
    dd = daily.select(
        "d", F.col("__sd").cast("double").alias("x")
    ).localCheckpoint(eager=False)
    pre = global_cumsum(
        dd.withColumn("__one", F.lit(1)).withColumn(
            "x2", F.col("x") * F.col("x")
        ),
        "d",
        ["x", "x2", "__one"],
        prefix="c_",
    )
    tot = dd.agg(
        F.sum("x").alias("ts_"),
        F.sum(F.col("x") * F.col("x")).alias("tss"),
        F.count(F.lit(1)).cast("double").alias("tn"),
    )
    cand = (
        pre.crossJoin(F.broadcast(tot))
        .where(F.col("c___one") < F.col("tn"))  # split must leave a tail
        .select(
            "d",
            F.col("c___one").cast("double").alias("n1"),
            (F.col("tn") - F.col("c___one")).alias("n2"),
            F.col("c_x").alias("s1"),
            (F.col("ts_") - F.col("c_x")).alias("s2"),
            F.col("c_x2").alias("ss1"),
            (F.col("tss") - F.col("c_x2")).alias("ss2"),
            "ts_", "tss", "tn",
        )
    )
    sse_w = (
        F.col("ss1") - F.col("s1") * F.col("s1") / F.col("n1")
        + F.col("ss2") - F.col("s2") * F.col("s2") / F.col("n2")
    )
    sst = F.col("tss") - F.col("ts_") * F.col("ts_") / F.col("tn")
    scored = cand.select(
        "d", "n1", "n2", "s1", "s2",
        sse_w.alias("sse_w"),
        sst.alias("sst"),
        F.col("tn").alias("tn"),
    )
    best = (
        scored.orderBy(F.col("sse_w").asc(), F.col("d").asc())
        .limit(1)
        .select(
            F.col("d").alias("last_before_date"),
            F.col("n1").cast("bigint").alias("n_before"),
            F.col("n2").cast("bigint").alias("n_after"),
            F.round(F.col("s1") / F.col("n1"), 6).alias("mean_before"),
            F.round(F.col("s2") / F.col("n2"), 6).alias("mean_after"),
            F.round(
                (F.col("sst") - F.col("sse_w")) / F.col("sst") * 100.0, 6
            ).alias("sse_reduction_pct"),
            F.round(
                (F.col("sst") - F.col("sse_w"))
                / (F.col("sse_w") / (F.col("tn") - 2.0)),
                6,
            ).alias("f_stat"),
        )
    )
    return best


def mann_kendall_test(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float = 0.05,
) -> DataFrame:
    """Mann-Kendall trend test on the daily series — the significance
    companion to :func:`theil_sen_trend` (same robustness: rank-based,
    outlier-immune): S = Σ_{i<j} sign(x_j − x_i), tie-corrected
    variance Var(S) = [n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)]/18, and the
    continuity-corrected z with a two-sided p-value from the shared
    A&S polynomial (relational.normal_sf — identical literal arithmetic
    in both engines).

    Scale shape: daily exact-decimal totals first, then the |days|²/2
    pair frame — date-range-bounded, never row-count-bounded (same
    posture as Theil-Sen); S and the tie counts stay integers until the
    final divisions.

    Output (1 row): ``n_days, s_stat, var_s, z, p, trend`` (trend is
    +1/-1/0 at the given alpha).
    """
    from flashml_spark.operators.relational import normal_sf

    # |days|-bounded, read four times (both pair-join sides, tie scan,
    # count) — checkpointed so the corpus agg runs once
    daily = df.groupBy(F.col(ts_col).cast("date").alias("d")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).cast("double").alias("x")
    ).localCheckpoint(eager=False)
    a, b = daily.alias("a"), daily.alias("b")
    s = (
        a.join(b, F.col("a.d") < F.col("b.d"))
        .agg(
            F.sum(
                F.when(F.col("b.x") > F.col("a.x"), 1)
                .when(F.col("b.x") < F.col("a.x"), -1)
                .otherwise(0)
            ).cast("bigint").alias("s_stat")
        )
    )
    n_df = daily.agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    ties = (
        daily.groupBy("x")
        .agg(F.count(F.lit(1)).cast("bigint").alias("t"))
        .where(F.col("t") > 1)
        .agg(
            F.coalesce(
                F.sum(F.col("t") * (F.col("t") - 1) * (2 * F.col("t") + 5)),
                F.lit(0),
            ).cast("bigint").alias("tie_term")
        )
    )
    j = (
        s.crossJoin(F.broadcast(n_df))
        .crossJoin(F.broadcast(ties))
        .select(
            "n", "s_stat",
            (
                (
                    F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5)
                    - F.col("tie_term")
                ).cast("double")
                / 18.0
            ).alias("var_s"),
        )
    )
    z = (
        F.when(F.col("s_stat") > 0, (F.col("s_stat") - 1.0) / F.sqrt("var_s"))
        .when(F.col("s_stat") < 0, (F.col("s_stat") + 1.0) / F.sqrt("var_s"))
        .otherwise(F.lit(0.0))
    )
    scored = j.withColumn("z", z).withColumn(
        "p",
        F.when(F.col("z") == 0, F.lit(1.0)).otherwise(
            2.0 * normal_sf(F.abs(F.col("z")))
        ),
    )
    return scored.select(
        F.col("n").alias("n_days"),
        "s_stat",
        F.round("var_s", 6).alias("var_s"),
        F.round("z", 6).alias("z"),
        F.round("p", 6).alias("p"),
        F.when(
            (F.col("p") < alpha) & (F.col("s_stat") > 0), F.lit(1)
        )
        .when((F.col("p") < alpha) & (F.col("s_stat") < 0), F.lit(-1))
        .otherwise(F.lit(0))
        .cast("int")
        .alias("trend"),
    )


def holt_linear_forecast(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    alpha: float = 0.3,
    beta: float = 0.1,
    horizon: int = 7,
) -> DataFrame:
    """Holt's linear-trend exponential smoothing over the daily total
    series, with a one-step-ahead backtest (Holt 1957 / Hyndman &
    Athanasopoulos FPP §8.2 — level ``l_t = αy_t + (1−α)(l_{t−1} +
    b_{t−1})``, trend ``b_t = β(l_t − l_{t−1}) + (1−β)b_{t−1}``, init
    ``l_2 = y_2, b_2 = y_2 − y_1``): the trend-aware successor to the
    flat EWMA forecast (``ewma_anomaly``) for series that drift.

    Output: one row per horizon step — ``h, forecast = l_n + h·b_n,
    backtest_mae`` (mean |y_t − (l_{t−1}+b_{t−1})| over t ≥ 3, the
    honest one-step error of the SAME recursion that produced the
    forecast).

    Scale + determinism shape: ONE corpus pass for the exact
    DECIMAL(28,6) daily sums (the x188 float-determinism rule); the
    recursion is sequential by nature, so it runs as a JVM-side
    ``aggregate`` fold over the |days|-bounded sorted array — no
    Python, no window over raw rows.  All float ops in the fold are
    IEEE exactly-rounded (+ − × ÷ abs) applied in the same order as
    the SQL oracle's recursive CTE, so results replay bit-for-bit.
    """
    a = float(alpha)
    om_a = 1.0 - a
    bt = float(beta)
    om_b = 1.0 - bt

    daily = df.groupBy(F.col(ts_col).cast("date").alias("d")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("yd")
    )
    # |days| is value-domain bounded (calendar span) — documented
    # collect_list-over-post-agg contract
    arr = daily.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("d"), F.col("yd").cast("double").alias("y"))
            )
        ).alias("a")
    )

    def step(acc, x):
        lnew = F.lit(a) * x["y"] + F.lit(om_a) * (acc["l"] + acc["b"])
        return F.struct(
            (acc["i"] + 1).alias("i"),
            F.when(acc["i"] == 0, x["y"])
            .when(acc["i"] == 1, x["y"])
            .otherwise(lnew)
            .alias("l"),
            F.when(acc["i"] == 0, F.lit(0.0))
            .when(acc["i"] == 1, x["y"] - acc["l"])
            .otherwise(
                F.lit(bt) * (lnew - acc["l"]) + F.lit(om_b) * acc["b"]
            )
            .alias("b"),
            F.when(
                acc["i"] >= 2,
                acc["errsum"] + F.abs(x["y"] - (acc["l"] + acc["b"])),
            )
            .otherwise(acc["errsum"])
            .alias("errsum"),
        )

    fin = arr.select(
        F.aggregate(
            "a",
            F.struct(
                F.lit(0).alias("i"),
                F.lit(0.0).alias("l"),
                F.lit(0.0).alias("b"),
                F.lit(0.0).alias("errsum"),
            ),
            step,
        ).alias("s")
    ).select("s.i", "s.l", "s.b", "s.errsum")
    return (
        fin.select(
            F.explode(
                F.array(*[F.lit(h) for h in range(1, horizon + 1)])
            ).alias("h"),
            "l",
            "b",
            "errsum",
            "i",
        )
        .select(
            F.col("h").cast("int").alias("h"),
            F.round(
                F.col("l") + F.col("h").cast("double") * F.col("b"), 6
            ).alias("forecast"),
            F.round(
                F.col("errsum") / (F.col("i") - 2).cast("double"), 6
            ).alias("backtest_mae"),
        )
        .orderBy("h")
    )


def diff_in_diff(
    df: DataFrame,
    ts_col: str,
    unit_col: str,
    value_col: str,
    treat_col=None,
    cutover=None,
) -> DataFrame:
    """Difference-in-differences readout (Card & Krueger 1994 two-by-two):
    DiD = (ȳ_treat,post − ȳ_treat,pre) − (ȳ_ctrl,post − ȳ_ctrl,pre),
    with the classic four-cell pooled standard error
    ``SE = sqrt(Σ s²_cell / n_cell)`` and z = DiD/SE — the panel
    companion to the cross-sectional z-test (x196) and CUPED (x154).

    ``treat_col`` defaults to a deterministic md5 coin on the unit id
    (the repo's reproducible-assignment rule); ``cutover`` defaults to
    the calendar midpoint of the observed span, computed INSIDE the
    plan from a 1-row min/max aggregate (broadcast scalar — never a
    driver collect).

    Determinism shape: cell sums are exact DECIMAL(28,6) (Σv and, for
    the variance, Σ CAST(v·v AS DECIMAL(28,6)) — the documented x188
    truncation trade); every derived float uses exactly-rounded ops in
    the same order as the SQL twin.  One corpus pass → 4-cell agg →
    1-row output.
    """
    if treat_col is None:
        treat_col = (H.md5_uniform(F.col(unit_col)) < 0.5).cast("int")
    span = df.agg(
        F.min(F.col(ts_col).cast("date")).alias("dmin"),
        F.max(F.col(ts_col).cast("date")).alias("dmax"),
    )
    tagged = df.crossJoin(F.broadcast(span))  # 1-row scalar broadcast
    if cutover is None:
        cutover = F.date_add(
            F.col("dmin"),
            (F.datediff(F.col("dmax"), F.col("dmin")) / 2).cast("int"),
        )
    cells = (
        tagged.select(
            treat_col.alias("treat"),
            (F.col(ts_col).cast("date") >= cutover).cast("int").alias("post"),
            F.col(value_col).cast("decimal(28,6)").alias("v"),
            (F.col(value_col) * F.col(value_col))
            .cast("decimal(28,6)")
            .alias("v2"),
        )
        .groupBy("treat", "post")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum("v2").alias("sq"),
        )
        .select(
            "treat",
            "post",
            F.col("n").cast("double").alias("n"),
            F.col("s").cast("double").alias("s"),
            F.col("sq").cast("double").alias("sq"),
        )
    )
    # pivot the 4 cells wide via conditional firsts (4-row frame)
    wide = cells.agg(
        *[
            F.first(
                F.when(
                    (F.col("treat") == t) & (F.col("post") == p), F.col(c)
                ),
                ignorenulls=True,
            ).alias(f"{c}_{'t' if t else 'c'}{p}")
            for t in (1, 0)
            for p in (1, 0)
            for c in ("n", "s", "sq")
        ]
    )
    m = {
        f"m_{g}{p}": F.col(f"s_{g}{p}") / F.col(f"n_{g}{p}")
        for g in ("t", "c")
        for p in (0, 1)
    }
    v = {
        f"v_{g}{p}": (
            F.col(f"sq_{g}{p}")
            - F.col(f"s_{g}{p}") * F.col(f"s_{g}{p}") / F.col(f"n_{g}{p}")
        )
        / (F.col(f"n_{g}{p}") - F.lit(1.0))
        for g in ("t", "c")
        for p in (0, 1)
    }
    did = (m["m_t1"] - m["m_t0"]) - (m["m_c1"] - m["m_c0"])
    se = F.sqrt(
        v["v_t1"] / F.col("n_t1")
        + v["v_t0"] / F.col("n_t0")
        + v["v_c1"] / F.col("n_c1")
        + v["v_c0"] / F.col("n_c0")
    )
    return wide.select(
        F.round(m["m_c0"], 6).alias("mean_ctrl_pre"),
        F.round(m["m_c1"], 6).alias("mean_ctrl_post"),
        F.round(m["m_t0"], 6).alias("mean_treat_pre"),
        F.round(m["m_t1"], 6).alias("mean_treat_post"),
        F.round(did, 6).alias("did"),
        F.round(se, 6).alias("se"),
        F.round(did / se, 6).alias("z"),
    )


def cusum_drift(
    df: DataFrame,
    ts_col: str,
    value_col: str,
    k: float = 0.5,
    h: float = 5.0,
    base_days: int = 7,
) -> DataFrame:
    """Two-sided CUSUM control chart over the daily total series (Page
    1954): ``S⁺_t = max(0, S⁺_{t−1} + z_t − k)``, ``S⁻_t = max(0,
    S⁻_{t−1} − z_t − k)`` with ``z_t = (y_t − μ)/σ`` standardized
    against the first ``base_days`` calendar days, alarming when either
    statistic exceeds ``h`` — the SEQUENTIAL drift detector that
    accumulates small persistent shifts the per-day outlier tests
    (x119/x209) and the retrospective changepoint (x229) treat as
    noise; k is the half-shift deadband, h the run-length dial.

    Determinism shape: daily totals are exact DECIMAL(28,6) sums; μ and
    σ derive from the base period's moment sums (sqrt only — IEEE
    exactly-rounded); the recursion folds JVM-side over the |days|
    array in the SAME operation order as the oracle's recursive CTE.
    Output: ``d, z, cusum_pos, cusum_neg, alarm`` per day.
    """
    kk, hh = float(k), float(h)
    daily = df.groupBy(F.col(ts_col).cast("date").alias("d")).agg(
        F.sum(F.col(value_col).cast("decimal(28,6)")).alias("yd")
    )
    d0 = daily.agg(F.min("d").alias("d0"))
    base = (
        daily.crossJoin(F.broadcast(d0))  # 1-row scalar broadcast
        .where(F.datediff(F.col("d"), F.col("d0")) < base_days)
        .agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum("yd").cast("double").alias("s1"),
            F.sum(
                (F.col("yd") * F.col("yd")).cast("decimal(38,6)")
            ).cast("double").alias("s2"),
        )
        .select(
            (F.col("s1") / F.col("n")).alias("mu"),
            F.sqrt(
                F.col("s2") / F.col("n")
                - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
            ).alias("sd"),
        )
    )
    arr = daily.agg(
        F.sort_array(
            F.collect_list(
                F.struct(F.col("d"), F.col("yd").cast("double").alias("y"))
            )
        ).alias("a")
    ).crossJoin(F.broadcast(base))

    def step(acc, x):
        z = (x["y"] - F.col("mu")) / F.col("sd")
        sp = F.greatest(F.lit(0.0), acc["sp"] + z - F.lit(kk))
        sn = F.greatest(F.lit(0.0), acc["sn"] - z - F.lit(kk))
        return F.struct(
            sp.alias("sp"),
            sn.alias("sn"),
            F.concat(
                acc["out"],
                F.array(
                    F.struct(
                        x["d"].alias("d"),
                        z.alias("z"),
                        sp.alias("sp"),
                        sn.alias("sn"),
                    )
                ),
            ).alias("out"),
        )

    folded = arr.select(
        F.explode(
            F.aggregate(
                "a",
                F.struct(
                    F.lit(0.0).alias("sp"),
                    F.lit(0.0).alias("sn"),
                    F.array().cast(
                        "array<struct<d:date,z:double,sp:double,sn:double>>"
                    ).alias("out"),
                ),
                step,
                lambda acc: acc["out"],
            )
        ).alias("o")
    )
    return folded.select(
        F.col("o.d").alias("d"),
        F.round("o.z", 6).alias("z"),
        F.round("o.sp", 6).alias("cusum_pos"),
        F.round("o.sn", 6).alias("cusum_neg"),
        (
            (F.col("o.sp") > F.lit(hh)) | (F.col("o.sn") > F.lit(hh))
        ).cast("int").alias("alarm"),
    ).orderBy("d")


# z_{0.975}, Python-computed once and shared with every SQL twin (the
# cross-engine literal rule): statistics.NormalDist().inv_cdf(0.975)
OBF_Z975 = 1.959963984540054


def obf_boundary_curve(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    variant_expr,
    conv_expr,
    alpha_z: float = OBF_Z975,
) -> DataFrame:
    """O'Brien-Fleming-style sequential boundary over the peeking
    z-curve (O'Brien & Fleming 1979; Lan-DeMets spending approximation
    ``b(t) = z_{α/2} / sqrt(t)`` with t = information fraction): the
    completion of the x215 story — the curve SHOWS the wandering z,
    this adds the boundary that says when a peek is actually
    significant.  Early looks (tiny t) face a huge boundary; the final
    look converges to the fixed-horizon z_{α/2}.

    Information fraction = cumulative enrolled users / final enrolled
    users (a 1-row scalar broadcast of the last day's totals).  All
    float ops are exactly-rounded and ordered identically to the SQL
    twin; ``alpha_z`` ships as a shared Python literal.

    Output: ``d, z, info_frac, boundary, crossed`` per day.
    """
    curve = ab_ztest_curve(df, user_col, ts_col, variant_expr, conv_expr)
    total = curve.agg(
        F.max(F.col("n_a") + F.col("n_b")).alias("__nt")
    )
    t = (F.col("n_a") + F.col("n_b")).cast("double") / F.col("__nt").cast(
        "double"
    )
    boundary = F.lit(float(alpha_z)) / F.sqrt(t)
    return (
        curve.crossJoin(F.broadcast(total))  # 1-row scalar broadcast
        .select(
            "d",
            "z",
            F.round(t, 6).alias("info_frac"),
            F.round(boundary, 6).alias("boundary"),
            (F.abs(F.col("z")) > boundary).cast("int").alias("crossed"),
        )
        .orderBy("d")
    )


def _markov_horizon_driver(spark, m_rows, horizon: int) -> DataFrame:
    """Exact driver-side twin of the distributed horizon recurrence in
    :func:`markov_conversion_horizon` — same per-product round(12) →
    decimal(28,12) exact sum → double cast → per-iterate round(12) →
    final round(6), mirrored bit-for-bit (see caller comment)."""
    from decimal import ROUND_HALF_UP, Decimal

    q12 = Decimal("1e-12")
    q6 = Decimal("1e-6")

    def _round(x: float, q: Decimal) -> float:
        # Spark Round(double, n): BigDecimal.valueOf(x) [shortest repr,
        # == Python repr] .setScale(n, HALF_UP) .toDouble [correctly
        # rounded, == Python float(Decimal)]
        return float(Decimal(repr(x)).quantize(q, rounding=ROUND_HALF_UP))

    m = [(r["s"], r["t"], r["p"]) for r in m_rows]
    states = sorted({s for s, _, _ in m if s not in ("CONV", "DROP")})
    b = {s: p for s, t, p in m if t == "CONV"}
    v = {s: 0.0 for s in states}
    for _ in range(horizon):
        acc: dict[str, Decimal] = {}
        for s, t, p in m:
            vt = v.get(t)
            if vt is not None:
                # round(p*v, 12) then cast to decimal(28,12): exact
                # (the rounded double's shortest repr has <= 12 frac
                # digits); the group sum is exact decimal addition
                acc[s] = acc.get(s, Decimal(0)) + Decimal(
                    repr(_round(p * vt, q12))
                ).quantize(q12, rounding=ROUND_HALF_UP)
        v = {
            s: _round(b.get(s, 0.0) + float(acc.get(s, Decimal(0))), q12)
            for s in states
        }
    out = [(s, _round(v[s], q6)) for s in states]
    return spark.createDataFrame(
        out, "state string, p_conv_h double"
    ).orderBy("state")


def markov_conversion_horizon(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    id_col: str,
    state_col: str,
    conv_state: str,
    horizon: int = 8,
    driver_matrix_budget: int = 200_000,
) -> DataFrame:
    """Finite-horizon conversion probability per channel state: the
    probability of reaching CONV from each transient state within
    ``horizon`` steps of the fitted first-order journey chain —
    ``v_{k+1}(s) = b(s) + Σ_{s'} P(s,s')·v_k(s')`` unrolled exactly
    ``horizon`` times.  Well-defined finite-horizon semantics (not an
    approximation knob): the k-step curve is what a path-length-capped
    attribution uses, and it gives the x192 absorbing-solve family its
    SQL-checkable member — the unrolled recurrence IS expressible as
    ``horizon`` chained CTEs, unlike the matrix inverse.

    Determinism: P and b are exact-count ratios (identical doubles in
    both engines); each product rounds to 12 and sums as an exact
    decimal (order-free); each iterate rounds to 12.  Scale shape: the
    transition fit is the distributed x181/x192 pass; the iteration
    runs ``horizon`` joins over the |states|²-bounded matrix frame.
    Output: ``state, p_conv_h`` (rounded 6) ordered by state.
    """
    counts = markov_transition_counts_with_bounds(
        df, user_col, ts_col, id_col, state_col, conv_state
    )
    rs = counts.groupBy("state").agg(F.sum("n").alias("__tot"))
    # localCheckpoint: every horizon iteration references the matrix —
    # pin the |states|²-bounded frame once so the distributed
    # transition-count pass runs ONE time, not once per unrolled step
    m = (
        counts.join(rs, "state")
        .select(
            F.col("state").alias("s"),
            F.col("next_state").alias("t"),
            (F.col("n").cast("double") / F.col("__tot").cast("double")).alias(
                "p"
            ),
        )
        .localCheckpoint()
    )
    # Bounded driver solve (r11, the kcore/BFS/Newton pattern): the
    # iterate is |states|-sized and the matrix |states|²-bounded, so
    # when m fits a row budget the horizon recurrence runs in exact
    # Python-decimal arithmetic on the driver — ``horizon`` rounds of
    # tiny-join scheduler overhead (~3 shuffles each) dominate the
    # distributed loop at that size.  One limited collect doubles as
    # the size probe; past the budget the distributed loop below runs
    # unchanged.  Rounding mirrors Spark exactly: round(x, n) =
    # HALF_UP on the shortest-repr decimal (Double.toString ==
    # Python repr — both shortest round-trip), double→decimal(28,12)
    # casts are exact here (inputs already have <= 12 frac digits),
    # decimal sums are exact, decimal→double is correctly rounded in
    # both engines.  Parity pinned by unit test.
    probe = m.limit(driver_matrix_budget + 1).collect()
    if len(probe) <= driver_matrix_budget:
        return _markov_horizon_driver(
            df.sparkSession, probe, horizon
        )
    states = m.select("s").where(~F.col("s").isin("CONV", "DROP")).distinct()
    b = m.where(F.col("t") == "CONV").select("s", F.col("p").alias("__b"))
    v = states.select("s", F.lit(0.0).alias("v"))
    for _ in range(horizon):
        step = (
            m.join(v.select(F.col("s").alias("t"), "v"), "t")
            .groupBy("s")
            .agg(
                F.sum(
                    F.round(F.col("p") * F.col("v"), 12).cast("decimal(28,12)")
                ).alias("__x")
            )
        )
        v = (
            states.join(b, "s", "left")
            .join(step, "s", "left")
            .select(
                "s",
                F.round(
                    F.coalesce(F.col("__b"), F.lit(0.0))
                    + F.coalesce(
                        F.col("__x"), F.lit(0).cast("decimal(28,12)")
                    ).cast("double"),
                    12,
                ).alias("v"),
            )
        )
    return v.select(
        F.col("s").alias("state"), F.round("v", 6).alias("p_conv_h")
    ).orderBy("state")


def interarrival_burstiness(
    df: DataFrame,
    type_col: str = "event_type",
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-event-type burstiness of user activity: the coefficient of
    variation of inter-arrival gaps within each (type, user) stream —
    CV ≈ 1 is Poisson-like, CV ≫ 1 is bursty (sessions/bots), CV ≪ 1
    is metronomic (schedulers).  The traffic-shape screen a pipeline
    runs before trusting rate-based features or sessionization
    thresholds.

    Exactness: gaps are exact BIGINT epoch-MICROsecond differences
    (second-truncation would alias sub-second bursts to 0 and differs
    across engines' casts); per type the audit accumulates n, Σd, Σd²
    as exact integers/decimals and evaluates
    ``CV = sqrt((n·Σd² − (Σd)²) / (n·(n−1))) / (Σd/n)`` in ONE written
    double order — CV is unit-free, so µs vs s cancels; sqrt and each
    division are correctly rounded over exact inputs, so the result is
    engine-identical with a single final ROUND(6).

    Scale shape: the lag window partitions by (type, user) — millions
    of small partitions, never a global sort; then one keyed agg to the
    |types| frame.  Output: ``<type_col>, n_gaps, mean_gap_s, cv``
    ordered by type.
    """
    w = (
        Window.partitionBy(type_col, user_col)
        .orderBy(F.col(ts_col).asc(), F.col("event_id").asc())
        if "event_id" in df.columns
        else Window.partitionBy(type_col, user_col).orderBy(
            F.col(ts_col).asc()
        )
    )
    epoch = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gaps = (
        df.withColumn("__prev", F.lag(epoch).over(w))
        .where(F.col("__prev").isNotNull())
        .select(
            F.col(type_col).alias("t"),
            (epoch - F.col("__prev")).alias("d"),
        )
    )
    # Σ in DECIMAL(38,0): Σd² of µs gaps overflows a BIGINT accumulator
    # (at real horizons even a single d² can: ANSI error), and the
    # n·Σd² − (Σd)² difference must stay exact before the one cast
    d_dec = F.col("d").cast("decimal(38,0)")
    agg = gaps.groupBy("t").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(d_dec).alias("sd"),
        F.sum(d_dec * d_dec).alias("sdd"),
    )
    n, sd, sdd = F.col("n"), F.col("sd"), F.col("sdd")
    var = (n * sdd - sd * sd).cast("double") / (n * (n - 1)).cast("double")
    mean = sd.cast("double") / n.cast("double")
    # sd > 0 excludes all-duplicate-timestamp streams (mean gap 0):
    # CV is undefined there, and engines disagree on 0/0 (Spark NULL vs
    # DuckDB NaN/inf) — r9 ADVICE item
    return (
        agg.where((n >= 2) & (sd > 0))
        .select(
            F.col("t").alias(type_col),
            n.alias("n_gaps"),
            F.round(mean / F.lit(1_000_000.0), 6).alias("mean_gap_s"),
            F.round(F.sqrt(var) / mean, 6).alias("cv"),
        )
        .orderBy(type_col)
    )
