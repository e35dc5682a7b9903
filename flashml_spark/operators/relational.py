"""Core relational operators of the engine.

Each function is a pure DataFrame→DataFrame transform (lazy; Catalyst fuses
them into one optimized plan).  Reference citations per SURVEY §2.3-2.5.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# 2**32 - 1 : FlashMLConstants.scala:280 (MAX8BITHEXDOUBLE)
_MAX_8HEX = 4294967295.0


def input_filter(df: DataFrame, predicate: str | Column | None, response_col: str | None = None) -> DataFrame:
    """Config-driven input filter (``dal/DataReader.scala:128-140``).

    Default (when no predicate configured): drop rows with NULL response.
    The predicate is a SQL string — pushed down to the scan by Catalyst.
    """
    if predicate is None:
        if response_col is None:
            return df
        return df.filter(F.col(response_col).isNotNull())
    return df.filter(predicate)


def prune_columns(df: DataFrame, columns: list[str]) -> DataFrame:
    """Early column pruning (``dal/DataReader.scala:136-140``,
    ``core/PipelineSteps.scala:163-177``).  Explicit ``select`` so pruning
    survives ``.cache()`` boundaries (Catalyst prunes within a plan but not
    across materialization)."""
    return df.select(*columns)


def page_bucket(df: DataFrame, page_col: str, num_pages: int, out_col: str = "page") -> DataFrame:
    """Clamp page numbers: rows with ``page >= N`` fold into the last model
    (``core/PipelineSteps.scala:316-323``)."""
    c = F.col(page_col)
    return df.withColumn(out_col, F.when(c < num_pages, c).otherwise(F.lit(num_pages)))


def split_page_level(df: DataFrame, page_col: str, num_pages: int) -> list[DataFrame]:
    """One DataFrame per page model: ``page == k`` for k < N, ``page >= N``
    for the last (``core/PipelineSteps.scala:308-327``).

    Scale note: these are N filters over ONE cached parent — each filter is
    partition-pruned if the source is partitioned by page.

    Pages below 1 clamp into the FIRST model (mirroring the high-side
    ``page >= N`` fold) so no row silently vanishes from every split.
    """
    c = F.col(page_col)
    if num_pages == 1:
        return [df]
    out = [df.filter(c <= 1)]
    out.extend(df.filter(c == k) for k in range(2, num_pages))
    out.append(df.filter(c >= num_pages))
    return out


def time_on_page(
    df: DataFrame,
    primary_keys: list[str],
    order_col: str,
    cumulative_time_col: str,
    out_col: str = "time_on_page",
) -> DataFrame:
    """``lead(cumTime,1) OVER (PARTITION BY pk ORDER BY page) - cumTime``
    (``dal/DataReader.scala:143-156``).

    One shuffle on the session key; at 100 TB the pk partition count is set
    by AQE.  No driver involvement.
    """
    w = Window.partitionBy(*primary_keys).orderBy(order_col)
    c = F.col(cumulative_time_col)
    return df.withColumn(out_col, F.lead(c, 1).over(w) - c)


def derive_random_variable(df: DataFrame, id_col: str, out_col: str = "random_variable") -> DataFrame:
    """Deterministic uniform[0,100] from the first 8 hex chars of an ID
    (``dal/DataReader.scala:34-78``): ``conv(substr(id,1,8),16,10)*100/(2^32-1)``.

    Pure column expression — whole-stage-codegen'd, no UDF.
    """
    hex8 = F.substring(F.col(id_col).cast("string"), 1, 8)
    return df.withColumn(
        out_col, F.conv(hex8, 16, 10).cast("double") * 100.0 / F.lit(_MAX_8HEX)
    )


def post_predict_filter(df: DataFrame, predicate: str | None) -> DataFrame:
    """SQL predicate applied after scoring (``core/Predict.scala:56-75``)."""
    return df if predicate is None else df.filter(predicate)


def union_pages(dfs: list[DataFrame]) -> DataFrame:
    """Union per-page DataFrames back into one (``core/metrics/
    MetricsEvaluator.scala:49-72``).  ``unionByName`` guards against column
    order drift between page pipelines."""
    out = dfs[0]
    for d in dfs[1:]:
        out = out.unionByName(d)
    return out


def concat_key(df: DataFrame, cols: list[str], out_col: str = "key", sep: str = "_") -> DataFrame:
    """Composite primary key as a concatenated string
    (``publish/Publish.scala:424-437``, QA-join key)."""
    return df.withColumn(out_col, F.concat_ws(sep, *[F.col(c).cast("string") for c in cols]))


def top_n_per_group(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    n: int,
    descending: bool = True,
    tiebreak_cols: list[str] | None = None,
    rank_col: str = "rn",
) -> DataFrame:
    """Top-N rows per group via a ranked window.

    Shuffles once on the group key; each group ranks independently in its
    partition (bounded by group size, not table size — the scalable shape
    for per-entity top-k).  Tie-break columns make the cut deterministic.
    """
    from pyspark.sql import Window as W

    order = [F.desc(order_col) if descending else F.asc(order_col)]
    order += [F.asc(c) for c in (tiebreak_cols or [])]
    w = W.partitionBy(*group_cols).orderBy(*order)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def with_json_field(
    df: DataFrame,
    json_col: str,
    path: str,
    out_col: str,
    cast: str | None = None,
) -> DataFrame:
    """Extract a JSON field from a string column (``path`` like ``$.k``) —
    JVM-side ``get_json_object``, whole-stage codegen; the semi-structured
    props pattern without a Python round-trip.  ``cast`` optionally types
    the extracted string."""
    col = F.get_json_object(F.col(json_col), path)
    if cast:
        col = col.cast(cast)
    return df.withColumn(out_col, col)


def group_zscore(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    out_col: str = "z",
    ndigits: int = 6,
    broadcast_moments: bool | None = None,
) -> DataFrame:
    """Per-group standardization ``z = (v - mean) / stddev_pop`` (0.0 for
    zero-variance groups).  Group moments come from ONE hash aggregation
    (|groups| rows) joined back — never a per-row window, so a single
    giant group costs a join lookup, not a one-task sort.

    ``broadcast_moments``: ``True`` forces a broadcast hint — ONLY safe
    when the caller knows |groups| is small (a language/source column).
    ``False`` forces no hint.  Default ``None`` adds no hint and lets AQE
    pick broadcast at runtime from the moments frame's MEASURED post-agg
    size — the scale-safe default for arbitrary (e.g. per-user) keys,
    where a forced broadcast would OOM the driver."""
    moments = df.groupBy(*group_cols).agg(
        F.avg(value_col).alias("__mu"),
        F.stddev_pop(value_col).alias("__sigma"),
    )
    if broadcast_moments:
        moments = F.broadcast(moments)
    z = F.when(
        F.col("__sigma") > 0,
        (F.col(value_col) - F.col("__mu")) / F.col("__sigma"),
    ).otherwise(F.lit(0.0))
    return (
        df.join(moments, group_cols)
        .withColumn(out_col, F.round(z, ndigits))
        .drop("__mu", "__sigma")
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    lo: float = 0.05,
    hi: float = 0.95,
    out_col: str | None = None,
    exact: bool = True,
    relative_error: float = 1e-4,
) -> DataFrame:
    """Clip a numeric column to its [lo, hi] quantiles (outlier clamping
    before corpus statistics).  ``exact=True`` uses linear-interpolated SQL
    ``percentile`` (one full-sort agg — cross-engine bit-equal); the
    100 TB path is ``exact=False``: a mergeable single-pass Greenwald-
    Khanna sketch (``approxQuantile``), same shape as ``bin_equiarea``."""
    out_col = out_col or f"{value_col}_clipped"
    if exact:
        row = df.agg(
            F.expr(f"percentile({value_col}, array({lo}, {hi}))").alias("qs")
        ).first()
        q_lo, q_hi = float(row["qs"][0]), float(row["qs"][1])
    else:
        q_lo, q_hi = df.approxQuantile(value_col, [lo, hi], relative_error)
    return df.withColumn(
        out_col,
        F.least(F.greatest(F.col(value_col), F.lit(q_lo)), F.lit(q_hi)),
    )


def log2_histogram(
    df: DataFrame,
    value_col: str,
    out_col: str = "bucket",
) -> DataFrame:
    """Log-scale histogram of a positive numeric column: bucket
    ``floor(log2(v))`` → count + min/max, the standard length-distribution
    audit for heavy-tailed corpus statistics (doc lengths span 5+ orders
    of magnitude; linear bins waste 90% of their range on the tail).

    One hash aggregation over a pure-map bucket expression; non-positive
    values land in bucket NULL rather than poisoning log2.
    Output: ``<out_col>, n, min_v, max_v``."""
    bucket = F.when(
        F.col(value_col) > 0, F.floor(F.log2(F.col(value_col)))
    ).cast("bigint")
    return (
        df.select(bucket.alias(out_col), F.col(value_col).alias("__v"))
        .groupBy(out_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("__v").alias("min_v"),
            F.max("__v").alias("max_v"),
        )
    )


def ks_statistic(
    df: DataFrame, value_col: str, flag_col: str | Column
) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov statistic between the rows where
    ``flag_col`` is true (sample A) and the rest (sample B) — the
    distribution-drift audit for a numeric column (doc lengths, quality
    scores) between two cohorts.

    Exact, not sampled: the sup runs over the VALUE DOMAIN — one hash agg
    to per-value counts, then a cumulative over the |distinct values|
    frame (bounded by the domain, not the corpus; same accepted
    whole-frame-window posture as the PSI totals and q19's post-agg
    sweep).  Output: one row ``ks_stat, n_a, n_b``."""
    flag = F.expr(flag_col) if isinstance(flag_col, str) else flag_col
    counts = (
        df.select(F.col(value_col).alias("__v"), flag.cast("int").alias("__f"))
        .groupBy("__v")
        .agg(
            F.sum("__f").alias("__a"),
            F.sum(1 - F.col("__f")).alias("__b"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    totals = counts.agg(
        F.sum("__a").alias("__na"), F.sum("__b").alias("__nb")
    )
    cum = counts.select(
        F.sum("__a").over(w).alias("__ca"), F.sum("__b").over(w).alias("__cb")
    ).crossJoin(F.broadcast(totals))
    return cum.agg(
        F.round(
            F.max(
                F.abs(
                    F.col("__ca") / F.col("__na") - F.col("__cb") / F.col("__nb")
                )
            ),
            6,
        ).alias("ks_stat"),
        F.max("__na").cast("bigint").alias("n_a"),
        F.max("__nb").cast("bigint").alias("n_b"),
    )


def chisq_independence(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Pearson chi-square statistic for independence of two categorical
    columns (language × source: "did the crawl's language mix shift per
    source?").  Exact over ALL cells of the contingency table — expected
    counts come from a |A|×|B| cross join of the marginal frames (both
    post-agg tiny), left-joined against observed counts so
    zero-observation cells still contribute their expectation.
    Output: one row ``chi2, n_cells, dof``."""
    obs = df.groupBy(col_a, col_b).agg(F.count(F.lit(1)).alias("__c"))
    ra = obs.groupBy(col_a).agg(F.sum("__c").alias("__r"))
    cb = obs.groupBy(col_b).agg(F.sum("__c").alias("__s"))
    n = obs.agg(F.sum("__c").alias("__n"))
    cells = (
        ra.crossJoin(F.broadcast(cb))
        .crossJoin(F.broadcast(n))
        .join(obs, [col_a, col_b], "left")
        .select(
            (F.col("__r") * F.col("__s") / F.col("__n")).alias("__e"),
            F.coalesce(F.col("__c"), F.lit(0)).alias("__o"),
        )
    )
    stat = (F.col("__o") - F.col("__e")) ** 2 / F.col("__e")
    return cells.agg(
        F.round(F.sum(stat), 6).alias("chi2"),
        F.count(F.lit(1)).cast("bigint").alias("n_cells"),
    )


def gini_coefficient(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    id_col: str,
) -> DataFrame:
    """Per-group Gini coefficient of a non-negative value — the
    concentration audit (revenue per customer within a nation, tokens per
    source within a language): 0 is perfect equality, →1 is winner-take-
    all.  Uses the rank formulation
    ``G = 2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n`` over values
    sorted ascending with an ``id_col`` tie-break.

    One partitioned window (per-group sort, groups in parallel — the frame
    is |group members|, the documented cardinality contract) feeding one
    hash agg.  Groups summing to zero emit NULL rather than dividing by
    zero.  Output: ``<group_cols>, n, total, gini`` (rounded to 6)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.col(value_col).asc(), F.col(id_col).asc()
    )
    ranked = df.select(
        *group_cols,
        F.col(value_col).alias("__x"),
        F.row_number().over(w).alias("__i"),
    )
    n, tot = F.count(F.lit(1)), F.sum("__x")
    return ranked.groupBy(*group_cols).agg(
        n.cast("bigint").alias("n"),
        F.round(tot, 2).alias("total"),
        F.round(
            F.when(
                tot > 0,
                2 * F.sum(F.col("__i") * F.col("__x")) / (n * tot)
                - (n + 1) / n,
            ),
            6,
        ).alias("gini"),
    )


# Supported mergeable aggregate kinds for incremental maintenance.
_MERGEABLE = {"count", "sum", "min", "max"}


def mergeable_agg(
    df: DataFrame, keys: list[str], measures: dict[str, tuple[str, str | None]]
) -> DataFrame:
    """One keyed aggregation producing MERGEABLE state columns.

    ``measures`` maps output column -> (kind, source column), kind in
    {count, sum, min, max}; ``count`` ignores the source column.  Means /
    rates are derived downstream from (sum, count) pairs — they are not
    mergeable themselves and must never be stored as state.
    """
    aggs = []
    for out, (kind, src) in measures.items():
        if kind not in _MERGEABLE:
            raise ValueError(f"non-mergeable aggregate kind: {kind}")
        if kind == "count":
            aggs.append(F.count(F.lit(1)).cast("long").alias(out))
        else:
            aggs.append(getattr(F, kind)(src).alias(out))
    return df.groupBy(*keys).agg(*aggs)


def incremental_agg_merge(
    old: DataFrame | None,
    batch: DataFrame,
    keys: list[str],
    measures: dict[str, tuple[str, str | None]],
) -> DataFrame:
    """Maintain a keyed aggregate table at DELTA cost: aggregate only the
    new batch, then merge it into the previous snapshot with one
    |keys|-keyed full-outer join — never re-reading the historical raw
    data.  The materialized-view-maintenance primitive for the mergeable
    aggregate kinds (count/sum merge by addition, min/max by
    least/greatest, all null-skipping so keys present on one side only
    pass through unchanged).

    Equivalent by construction to re-aggregating the concatenated corpus
    (unit-proved), at O(|batch| + |affected keys|) instead of O(corpus).
    Store the result through the versioned upsert sink for exactly-once
    snapshots.
    """
    delta = mergeable_agg(batch, keys, measures)
    if old is None:
        return delta
    o = old.select(keys + [F.col(c).alias(f"__o_{c}") for c in measures])
    d = delta.select(keys + [F.col(c).alias(f"__d_{c}") for c in measures])
    merged = o.join(d, keys, "full_outer")
    cols = [F.col(k) for k in keys]
    for out, (kind, _src) in measures.items():
        a, b = F.col(f"__o_{out}"), F.col(f"__d_{out}")
        if kind in ("count", "sum"):
            c = F.when(
                a.isNull() & b.isNull(), F.lit(None)
            ).otherwise(F.coalesce(a, F.lit(0)) + F.coalesce(b, F.lit(0)))
        elif kind == "min":
            c = F.least(a, b)
        else:
            c = F.greatest(a, b)
        cols.append(c.alias(out))
    return merged.select(*cols)


def mann_whitney_u(
    df: DataFrame, value_col: str, flag_col: str | Column
) -> DataFrame:
    """Exact two-sample Mann-Whitney U (rank-sum) between the rows where
    ``flag_col`` is true (sample A) and the rest — the nonparametric
    "did this cohort's distribution shift" audit that pairs with
    :func:`ks_statistic` (same value-domain machinery, different power).

    U and the tie-corrected normal approximation are computed WITHOUT any
    global rank over data: one hash agg to per-value counts, then a
    cumulative over the |distinct values| frame (the accepted
    whole-frame posture; bounded by the domain, not the corpus):
    ``U = Σ_v a_v·(B_below(v) + b_v/2)``; ties enter the variance via
    ``Σ(t³−t)``.  Output: one row ``u_stat, z, n_a, n_b`` (z NULL when a
    sample is empty or all values tie).
    """
    flag = F.expr(flag_col) if isinstance(flag_col, str) else flag_col
    counts = (
        df.select(F.col(value_col).alias("__v"), flag.cast("int").alias("__f"))
        .groupBy("__v")
        .agg(
            F.sum("__f").cast("double").alias("__a"),
            F.sum(1 - F.col("__f")).cast("double").alias("__b"),
        )
    )
    w = Window.orderBy("__v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = counts.select(
        "__a",
        "__b",
        (F.sum("__b").over(w) - F.col("__b")).alias("__b_below"),
        (F.col("__a") + F.col("__b")).alias("__t"),
    )
    agg = cum.agg(
        F.sum(F.col("__a") * (F.col("__b_below") + F.col("__b") / 2)).alias("u"),
        F.sum("__a").alias("na"),
        F.sum("__b").alias("nb"),
        F.sum(F.col("__t") * F.col("__t") * F.col("__t") - F.col("__t")).alias("tie3"),
    )
    n = F.col("na") + F.col("nb")
    mean_u = F.col("na") * F.col("nb") / 2
    var_u = (
        F.col("na") * F.col("nb") / 12
        * ((n + 1) - F.col("tie3") / (n * (n - 1)))
    )
    z = F.when(var_u > 0, F.round((F.col("u") - mean_u) / F.sqrt(var_u), 6))
    return agg.select(
        F.round("u", 6).alias("u_stat"),
        z.alias("z"),
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
    )


# Benford expected first-digit probabilities log10(1 + 1/d), d = 1..9.
import math as _math

_BENFORD_P = {d: _math.log10(1 + 1 / d) for d in range(1, 10)}


def benford_audit(df: DataFrame, value_col: str) -> DataFrame:
    """First-digit Benford's-law audit of a positive numeric column — the
    classic fabricated-/truncated-data screen for financial facts.

    The leading digit comes from the INTEGER part via floor → bigint →
    string (exact on every engine; never float-to-string formatting or
    log10 arithmetic, both of which differ across engines at decade
    boundaries).  Values < 1 are excluded (no stable first digit in this
    construction).  One hash agg on 9 digit groups + a 1-row total
    broadcast.  Output per digit: ``digit, n, p_obs, p_exp, chi2_term``
    (χ² term = (n_d − N·p_d)² / (N·p_d), rounded to 6).
    """
    digit = F.substring(
        F.floor(F.col(value_col)).cast("bigint").cast("string"), 1, 1
    ).cast("bigint")
    counts = (
        df.filter(F.col(value_col) >= 1)
        .select(digit.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("double").alias("n"))
    )
    totals = counts.agg(F.sum("n").alias("total"))
    p_exp = F.element_at(
        F.create_map(*[F.lit(x) for d in _BENFORD_P for x in (d, _BENFORD_P[d])]),
        F.col("digit").cast("int"),
    )
    e = F.col("total") * p_exp
    return (
        counts.crossJoin(F.broadcast(totals))
        .select(
            "digit",
            F.col("n").cast("bigint").alias("n"),
            F.round(F.col("n") / F.col("total"), 6).alias("p_obs"),
            F.round(p_exp, 6).alias("p_exp"),
            F.round((F.col("n") - e) * (F.col("n") - e) / e, 6).alias("chi2_term"),
        )
    )


def series_autocorr(
    df: DataFrame, order_col: str, value_col: str, lag: int = 1
) -> DataFrame:
    """Lag-``lag`` Pearson autocorrelation of an (already aggregated)
    series — the "is yesterday predictive of today" audit for daily
    revenue / volume series.  The input is expected to be post-
    aggregation (one row per period): the whole-frame lag window runs
    over the |periods| frame, the accepted value-domain posture, never
    over raw data.  Moments are explicit sums so both engines walk the
    same float arithmetic.  Output: one row ``n_pairs, autocorr`` (NULL
    when fewer than 2 pairs or zero variance).
    """
    w = Window.orderBy(order_col)
    pairs = df.select(
        F.col(value_col).cast("double").alias("__y"),
        F.lag(F.col(value_col).cast("double"), lag).over(w).alias("__x"),
    ).filter(F.col("__x").isNotNull())
    agg = pairs.agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("__x").alias("sx"),
        F.sum("__y").alias("sy"),
        F.sum(F.col("__x") * F.col("__x")).alias("sxx"),
        F.sum(F.col("__y") * F.col("__y")).alias("syy"),
        F.sum(F.col("__x") * F.col("__y")).alias("sxy"),
    )
    n = F.col("n")
    cov = F.col("sxy") / n - (F.col("sx") / n) * (F.col("sy") / n)
    vx = F.col("sxx") / n - (F.col("sx") / n) * (F.col("sx") / n)
    vy = F.col("syy") / n - (F.col("sy") / n) * (F.col("sy") / n)
    r = F.when((n >= 2) & (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6))
    return agg.select(n.cast("bigint").alias("n_pairs"), r.alias("autocorr"))


def referential_integrity_audit(
    parent: DataFrame,
    child: DataFrame,
    parent_key: str,
    child_key: str,
) -> DataFrame:
    """Foreign-key health check between a parent and child table: how
    many parent keys have no children (childless), how many child rows
    reference a missing parent (orphans — the corruption that silently
    drops rows from inner joins downstream), and the totals.

    Two keyed anti-join counts over DISTINCT keys — no full outer join
    materialization, no row payloads.  The whole audit is ONE deferred
    plan (four 1-row aggregates cross-joined — each cross is a 1-row
    broadcast): building the frame runs no jobs, and re-evaluating it
    recomputes every measure from the current inputs, same lazy
    contract as every other operator here (r4 ADVICE fix — the
    anti-join counts were previously eager ``.count()`` literals that
    could go stale against the lazily-computed totals).  Output: one
    row ``n_parents, n_children, childless_parents, orphan_children``.
    """
    pk = parent.select(F.col(parent_key).alias("__k")).distinct()
    ck = child.select(F.col(child_key).alias("__k"))
    childless = (
        pk.join(ck.distinct(), "__k", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("childless_parents"))
    )
    orphans = (
        ck.join(pk, "__k", "left_anti")
        .agg(F.count(F.lit(1)).cast("bigint").alias("orphan_children"))
    )
    return (
        parent.agg(F.count(F.lit(1)).cast("bigint").alias("n_parents"))
        .crossJoin(child.agg(F.count(F.lit(1)).cast("bigint").alias("n_children")))
        .crossJoin(childless)
        .crossJoin(orphans)
    )


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """Column-profile audit — per column: row count, nulls, null
    fraction, exact distinct count.  The schema-drift / data-quality
    summary a pipeline publishes per ingestion batch.

    One aggregation computes every measure (conditional sums +
    count_distinct per column — a single pass, partial-aggregated
    map-side); the per-column long format comes from unpivoting the
    1-row wide result, so no per-column scans.  Output rows ordered by
    the caller's column list: ``col_name, n_rows, n_nulls, null_frac,
    n_distinct``.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c).isNull().cast("long")).alias(f"__null_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    structs = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").cast("bigint").alias("n_rows"),
                F.col(f"__null_{c}").cast("bigint").alias("n_nulls"),
                F.round(F.col(f"__null_{c}") / F.col("__n"), 6).alias("null_frac"),
                F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
            )
            for c in cols
        ]
    )
    return wide.select(F.explode(structs).alias("p")).select(
        "p.col_name", "p.n_rows", "p.n_nulls", "p.null_frac", "p.n_distinct"
    )


def quantile_normalize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    id_col: str,
    buckets: int = 100,
) -> DataFrame:
    """Cross-group quantile normalization: map every row's value to the
    GLOBAL distribution's value at the same relative rank, so scores from
    heterogeneous groups (e.g. per-source quality scores with different
    scales) become comparable.  The curation use-case: threshold once,
    globally, instead of hand-tuning a cutoff per source.

    Grid semantics (exact, engine-portable — no interpolation): with
    ``r = percent_rank`` within the group and ``rg`` globally, a row maps
    to grid cell ``g = floor(r * buckets)`` and receives
    ``qnorm = max{ value : floor(rg * buckets) <= g }`` — the top of the
    global distribution's matching quantile cell.  Ties share a
    percent_rank in both engines, so the result is deterministic with no
    tie-break column.

    Scale shape: the within-group rank is a keyed window (fine); the
    GLOBAL percent_rank is rebuilt WITHOUT a single-partition window —
    ``rank(v) = 1 + |rows with value < v|`` from a per-distinct-value
    count frame run through :func:`~flashml_spark.functions.windows.
    global_cumsum` (range partition + offsets), which is bit-identical
    to SQL ``percent_rank`` tie semantics.  Then a ``buckets``-row
    boundary frame (cummax + gap fill over <= buckets+1 rows — bounded,
    the accepted tiny-frame window) and ONE broadcast join of rows
    against it.  Output: ``id, group, value, qnorm``.
    """
    from pyspark.sql import Window

    from flashml_spark.functions.windows import global_cumsum

    B = float(buckets)
    v = F.col(value_col)
    r_grp = F.percent_rank().over(Window.partitionBy(group_col).orderBy(v))
    src = df.where(v.isNotNull()).select(
        F.col(id_col),
        F.col(group_col),
        v.alias("__v"),
        F.floor(r_grp * B).cast("int").alias("__g"),
    )
    vals = (
        df.where(v.isNotNull())
        .groupBy(v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    cum = global_cumsum(vals, "__v", ["__cnt"], prefix="cum_")
    total = vals.agg(F.sum("__cnt").alias("__n"))
    # rank of a value = rows strictly below it + 1; percent_rank ties share it
    cell_max = (
        cum.join(F.broadcast(total))
        .select(
            "__v",
            F.when(
                F.col("__n") > 1,
                (F.col("cum___cnt") - F.col("__cnt"))
                / (F.col("__n") - F.lit(1.0)),
            )
            .otherwise(F.lit(0.0))
            .alias("__rg"),
        )
        .select("__v", F.floor(F.col("__rg") * B).cast("int").alias("__cell"))
        .groupBy("__cell")
        .agg(F.max("__v").alias("__cmax"))
    )
    # dense 0..buckets boundary frame: cummax fills each cell with the top
    # of the last occupied cell at-or-below it (bounded window: <=B+1 rows)
    grid = src.sparkSession.range(0, buckets + 1).select(
        F.col("id").cast("int").alias("__g")
    )
    wb = Window.orderBy("__g").rowsBetween(Window.unboundedPreceding, 0)
    bounds = (
        grid.join(cell_max, grid["__g"] == cell_max["__cell"], "left")
        .select(grid["__g"], F.col("__cmax"))
        .withColumn("__qnorm", F.max("__cmax").over(wb))
        .select("__g", "__qnorm")
    )
    return (
        src.join(F.broadcast(bounds), "__g")
        .select(
            F.col(id_col),
            F.col(group_col),
            F.col("__v").alias(value_col),
            F.col("__qnorm").alias("qnorm"),
        )
    )


def frequent_pairs(
    df: DataFrame,
    basket_col: str,
    item_col: str,
    min_support: int = 2,
    top_k: int = 15,
) -> DataFrame:
    """Market-basket association mining for item PAIRS: support (baskets
    containing both), confidence in both directions' max, and lift
    (observed co-occurrence over the independence expectation) — the
    classic curation/merchandising readout, and on a training-data
    platform the "documents co-selected by the same pipeline run" audit.

    Scale shape: per-basket pair fan-out is C(basket_size, 2) — bounded
    by the basket, never by the catalog; pairs and item supports are
    hash aggs; the |items|-sized support frame joins back twice (keyed);
    the basket count is a 1-row scalar broadcast.  ``min_support``
    prunes the pair frame BEFORE the joins.  Top-k lands as
    TakeOrderedAndProject.  Output:
    ``item_a, item_b, support, confidence, lift`` with ``item_a <
    item_b``; ordered by lift desc (support, item tie-breaks).
    """
    from flashml_spark.operators.graph import co_occurrence_pairs

    b, i = F.col(basket_col), F.col(item_col)
    items = df.select(b.alias("bk"), i.alias("it")).distinct()
    # Canonical per-basket pairs via the basket-bounded HOF builder
    # (r11): one groupBy(basket) exchange generates C(basket,2) pairs in
    # place of the keyed self-join (in-basket duplicates collapse inside
    # the builder, so support semantics are unchanged: one row per
    # basket per unordered pair).
    pairs = (
        co_occurrence_pairs(df.select(b.alias("bk"), i.alias("it")), "bk", "it")
        .groupBy(F.col("src").alias("ia"), F.col("dst").alias("ib"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= min_support)
    )
    isup = items.groupBy("it").agg(F.count(F.lit(1)).alias("n_it"))
    n_baskets = items.select("bk").distinct().agg(
        F.count(F.lit(1)).alias("n_bk")
    )
    sa = isup.select(F.col("it").alias("ia"), F.col("n_it").alias("na"))
    sb = isup.select(F.col("it").alias("ib"), F.col("n_it").alias("nb"))
    out = (
        pairs.join(sa, "ia")
        .join(sb, "ib")
        .join(F.broadcast(n_baskets))
        .select(
            F.col("ia").alias("item_a"),
            F.col("ib").alias("item_b"),
            F.col("support").cast("bigint").alias("support"),
            F.round(
                F.greatest(
                    F.col("support") / F.col("na").cast("double"),
                    F.col("support") / F.col("nb").cast("double"),
                ),
                6,
            ).alias("confidence"),
            F.round(
                F.col("support")
                * F.col("n_bk").cast("double")
                / (F.col("na") * F.col("nb").cast("double")),
                6,
            ).alias("lift"),
        )
    )
    return out.orderBy(
        F.desc("lift"), F.desc("support"), F.asc("item_a"), F.asc("item_b")
    ).limit(top_k)


def concentration_hhi(
    df: DataFrame,
    group_col: str,
    entity_col: str,
    value_col: str,
) -> DataFrame:
    """Herfindahl-Hirschman concentration index per group: the sum of
    squared entity value-shares within the group (1.0 = monopoly,
    1/|entities| = perfectly even) — the standard market/supplier/source
    concentration audit, and on a data platform the "is one source
    dominating this slice" screen.

    Scale shape: one (group, entity) hash agg, one |groups| total agg
    joined back, one squared-share agg — all value-domain bounded, no
    windows.  A group whose total is 0 (all-zero or cancelling values)
    reports NULL hhi (try_divide) instead of aborting the job under
    ANSI mode.  Output: ``group_col, n_entities, total_value, hhi``.
    """
    per = df.groupBy(group_col, entity_col).agg(
        F.sum(value_col).alias("__v")
    )
    tot = per.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_entities"),
        F.sum("__v").alias("__t"),
    )
    share = F.try_divide(F.col("__v"), F.col("__t"))
    return (
        per.join(tot, group_col)
        .groupBy(group_col, "n_entities", "__t")
        .agg(F.round(F.sum(share * share), 6).alias("hhi"))
        .select(
            group_col,
            "n_entities",
            F.round(F.col("__t"), 2).alias("total_value"),
            "hhi",
        )
    )


def k_anonymity_audit(
    df: DataFrame,
    quasi_cols: list[str],
    sensitive_col: str,
    k: int = 5,
) -> DataFrame:
    """Privacy risk screen before publishing a dataset: k-anonymity
    (every quasi-identifier combination should describe >= k rows) and
    l-diversity (each combination should carry >= l distinct sensitive
    values, else the group discloses its members' attribute even at
    size k).  One summary row — the go/no-go numbers a release review
    reads.

    Scale shape: one (quasi...) hash agg with a distinct-count, then
    ONE summary agg — both bounded by the quasi-combination domain; no
    windows, no driver state.  Output: ``n_rows, n_groups,
    risky_groups, risky_rows, risky_row_pct, min_group_size, min_l``
    where risky = group size < k.
    """
    per = df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).alias("__n"),
        F.count_distinct(F.col(sensitive_col)).alias("__l"),
    )
    risky = F.col("__n") < k
    return per.agg(
        F.sum("__n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.sum(F.when(risky, 1).otherwise(0)).cast("bigint").alias("risky_groups"),
        F.sum(F.when(risky, F.col("__n")).otherwise(0))
        .cast("bigint")
        .alias("risky_rows"),
        F.round(
            F.sum(F.when(risky, F.col("__n")).otherwise(0))
            / F.sum("__n").cast("double")
            * 100.0,
            6,
        ).alias("risky_row_pct"),
        F.min("__n").cast("bigint").alias("min_group_size"),
        F.min("__l").cast("bigint").alias("min_l"),
    )


def validate_expectations(
    df: DataFrame,
    rules: list[dict],
) -> DataFrame:
    """Declarative data-contract validation (the Great-Expectations
    shape, engine-native): evaluate a fixed rule list against a frame
    and report one row per rule with its violation count — the gate a
    pipeline runs before promoting a batch.

    Rule dicts (``id`` optional, defaults to ``<type>:<column>``):
      ``{"type": "not_null", "column": c}``
      ``{"type": "range", "column": c, "lo": x, "hi": y}``  (inclusive)
      ``{"type": "allowed", "column": c, "values": [...]}``
      ``{"type": "unique", "columns": [c, ...]}``
      ``{"type": "predicate", "id": name, "sql": "<boolean expr>"}``
        (rows where the expr is false or NULL count as violations)

    Scale shape: every rule — including ``unique`` via
    ``count - count_distinct`` — compiles into ONE aggregation pass
    over the data (conditional sums side by side), then the 1-row
    result explodes to the |rules|-long report.  No second scan, no
    windows, no driver evaluation.  Output:
    ``rule_id, rule_type, violations, n_rows, passed``.
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("__n")]
    metas: list[tuple[str, str]] = []
    for i, r in enumerate(rules):
        t = r["type"]
        rid = r.get("id") or f"{t}:{r.get('column') or ','.join(r.get('columns', []))}"
        alias = f"__v{i}"
        if t == "not_null":
            bad = F.col(r["column"]).isNull()
            agg = F.sum(F.when(bad, 1).otherwise(0))
        elif t == "range":
            c = F.col(r["column"])
            ok = c.isNotNull() & (c >= F.lit(r["lo"])) & (c <= F.lit(r["hi"]))
            agg = F.sum(F.when(ok, 0).otherwise(1))
        elif t == "allowed":
            c = F.col(r["column"])
            ok = c.isin(list(r["values"]))
            agg = F.sum(F.when(ok, 0).otherwise(1))
        elif t == "unique":
            cols = [F.col(c) for c in r["columns"]]
            agg = F.count(F.lit(1)) - F.count_distinct(F.struct(*cols))
        elif t == "predicate":
            ok = F.expr(r["sql"])
            agg = F.sum(F.when(ok, 0).otherwise(1))
        else:
            raise ValueError(f"unknown expectation type {t!r}")
        aggs.append(agg.cast("bigint").alias(alias))
        metas.append((rid, t))
    one = df.agg(*aggs)
    report = F.array(
        *[
            F.struct(
                F.lit(rid).alias("rule_id"),
                F.lit(t).alias("rule_type"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, (rid, t) in enumerate(metas)
        ]
    )
    return one.select(F.explode(report).alias("r"), F.col("__n")).select(
        F.col("r.rule_id").alias("rule_id"),
        F.col("r.rule_type").alias("rule_type"),
        F.col("r.violations").alias("violations"),
        F.col("__n").alias("n_rows"),
        (F.col("r.violations") == 0).alias("passed"),
    )


def correlation_matrix(df: DataFrame, cols: list[str]) -> DataFrame:
    """Pairwise Pearson correlations over ``cols`` — the one-glance
    collinearity screen a feature-engineering pass runs before model
    fit (and the numeric twin of `column_profile`'s per-column stats).

    Scale shape: every pair reduces to six moment sums (count/sums/
    squares/cross under a both-non-null filter — true pairwise
    deletion, same as SQL ``corr``), so ALL |cols|·(|cols|-1)/2 pairs
    compile into ONE aggregation pass over a single scan (same
    single-pass discipline as `validate_expectations`); the 1-row
    result explodes to the pair report.  The ratio is guarded on
    positive variances, so a zero-variance column yields NULL instead
    of ANSI-mode division errors (``F.corr`` raises there; SQL engines
    return NULL).

    Output: ``col_a, col_b, pearson_r`` (rounded to 6) for a < b in
    the given column order.
    """
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    aggs = []
    for k, (a, b) in enumerate(pairs):
        x = F.col(a).cast("double")
        y = F.col(b).cast("double")
        both = x.isNotNull() & y.isNotNull()
        x = F.when(both, x)
        y = F.when(both, y)
        aggs += [
            F.count(x).cast("double").alias(f"__n{k}"),
            F.sum(x).alias(f"__sx{k}"),
            F.sum(y).alias(f"__sy{k}"),
            F.sum(x * x).alias(f"__sxx{k}"),
            F.sum(y * y).alias(f"__syy{k}"),
            F.sum(x * y).alias(f"__sxy{k}"),
        ]
    one = df.agg(*aggs)

    def _r(k: int):
        n, sx, sy = F.col(f"__n{k}"), F.col(f"__sx{k}"), F.col(f"__sy{k}")
        vx = n * F.col(f"__sxx{k}") - sx * sx
        vy = n * F.col(f"__syy{k}") - sy * sy
        cov = n * F.col(f"__sxy{k}") - sx * sy
        return F.when((vx > 0) & (vy > 0), cov / F.sqrt(vx) / F.sqrt(vy))

    report = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_a"),
                F.lit(b).alias("col_b"),
                F.round(_r(k), 6).alias("pearson_r"),
            )
            for k, (a, b) in enumerate(pairs)
        ]
    )
    return one.select(F.explode(report).alias("r")).select(
        "r.col_a", "r.col_b", "r.pearson_r"
    )


def join_key_skew_audit(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Pre-join skew audit: the heavy-hitter report a pipeline reads
    before picking a join strategy (broadcast / AQE skew-join / salting).
    Reports the ``top_k`` heaviest values of ``key_col`` with their row
    count, share of all rows, and skew ratio (count / mean count per
    key) — a skew ratio near 1 means uniform keys; >> 1 means the
    shuffle partition owning that key becomes the join's straggler.

    Scale shape: one keyed hash agg (map-side partial combine reduces
    every partition to its local key counts), a 1-row global agg
    attached by broadcast cross join, and a TakeOrdered top-k
    (``orderBy().limit()`` — Spark plans TakeOrderedAndProject, no full
    sort shuffle).  The rank window runs on the collected ``top_k``-row
    frame only.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    glob = counts.agg(
        F.count(F.lit(1)).cast("double").alias("__n_keys"),
        F.sum("cnt").cast("double").alias("__total"),
    )
    top = (
        counts.orderBy(F.desc("cnt"), F.asc("key"))
        .limit(top_k)
        .crossJoin(F.broadcast(glob))
    )
    w = Window.orderBy(F.desc("cnt"), F.asc("key"))
    return top.select(
        F.row_number().over(w).cast("bigint").alias("rank"),
        "key",
        "cnt",
        F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
        F.round(
            F.col("cnt") * F.col("__n_keys") / F.col("__total"), 6
        ).alias("skew_ratio"),
    )


def functional_dependency_audit(
    df: DataFrame, pairs: list[tuple[str, str]]
) -> DataFrame:
    """Functional-dependency discovery audit: for each candidate
    ``determinant -> dependent`` pair, how many determinant values map
    to MORE than one distinct dependent value.  A 0.0 violation rate
    certifies the FD holds on this corpus (safe to normalize /
    dedupe on the determinant); a high rate kills the hypothesis.

    Scale shape: one two-level keyed aggregation per pair — group by
    the determinant counting distinct dependents (hash agg with
    map-side partial), then a 1-row summary agg; the |pairs| passes
    union into one frame.  Distinct-counting by DIFFERENT keys cannot
    share a shuffle, so passes scale with the audit list, not the data.

    Output: ``det_col, dep_col, n_keys, n_violating, violation_rate``
    (rate rounded to 6), one row per audited pair.
    """
    parts = []
    for det, dep in pairs:
        per_key = df.groupBy(det).agg(
            F.countDistinct(dep).alias("__nd")
        )
        parts.append(
            per_key.agg(
                F.lit(det).alias("det_col"),
                F.lit(dep).alias("dep_col"),
                F.count(F.lit(1)).cast("bigint").alias("n_keys"),
                F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
                .cast("bigint")
                .alias("n_violating"),
                F.round(
                    F.sum(F.when(F.col("__nd") > 1, 1).otherwise(0))
                    / F.count(F.lit(1)),
                    6,
                ).alias("violation_rate"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def skyline_2d(df: DataFrame, min_col: str, max_col: str) -> DataFrame:
    """2-D skyline (Pareto frontier): the rows not dominated by any
    other — row q dominates p when q is <= on ``min_col`` (minimize)
    and >= on ``max_col`` (maximize), strictly better on at least one.
    Rows tied on BOTH dimensions are mutually non-dominating and all
    survive (standard skyline semantics).

    Scale shape — the classic nested-loop formulation is quadratic;
    this is two keyed reductions plus one value-domain pass:
    (1) lossless prune: within each ``min_col`` group only rows
    achieving the group max of ``max_col`` can be in the skyline (a
    keyed window), collapsing the frame to <= |distinct min_col| + ties;
    (2) the sorted sweep: ordered by ``min_col`` ascending, a row is
    dominated iff a predecessor has a strictly larger ``max_col``
    (running max over the PRUNED frame), or a row with the same
    ``max_col`` has a strictly smaller ``min_col`` (keyed min window).

    The post-prune frame is <= |distinct min_col| + ties — a real bound
    for discrete axes but ~|rows| when ``min_col`` is continuous (near-
    unique floats), so the global sweep runs through ``functions.
    windows.global_running_max_exclusive`` (range partition + prefix-max
    offsets), never a single-partition window: scale-honest on both
    axis types.  Tie-insensitivity holds by construction — rows tied on
    ``min_col`` all carry the group-max ``max_col`` after the prune.
    """
    from flashml_spark.functions.windows import global_running_max_exclusive

    per = Window.partitionBy(min_col)
    pruned = (
        df.withColumn("__gmax", F.max(max_col).over(per))
        .where(F.col(max_col) == F.col("__gmax"))
        .drop("__gmax")
    )
    same_val = Window.partitionBy(max_col)
    out = (
        global_running_max_exclusive(pruned, min_col, max_col, "__m1")
        .withColumn("__mp", F.min(min_col).over(same_val))
        .where(
            (F.col("__m1").isNull() | (F.col("__m1") <= F.col(max_col)))
            & (F.col("__mp") == F.col(min_col))
        )
        .drop("__m1", "__mp")
    )
    return out


def mutual_information(df: DataFrame, col_a: str, col_b: str) -> DataFrame:
    """Mutual information (and normalized MI) between two categorical
    columns — the feature-selection / redundancy screen that chi-square
    (x109) ranks but does not quantify in information units:
    ``MI = Σ_ab p(a,b) ln( p(a,b) / (p(a) p(b)) )`` in nats, with
    ``NMI = MI / sqrt(H(a) H(b))`` for a scale-free [0, 1] score.

    Scale shape: one (a, b) hash agg over the data; marginals and
    entropies derive from THAT post-agg contingency frame (|A|x|B|
    rows), attached by two keyed joins plus a 1-row total broadcast;
    the final reduction is a 1-row agg.  Nothing after the first agg
    touches row-count-scaled data.

    Output (1 row): ``n, mi, h_a, h_b, nmi`` (floats rounded to 6).
    """
    joint = df.where(
        F.col(col_a).isNotNull() & F.col(col_b).isNotNull()
    ).groupBy(
        F.col(col_a).alias("__a"), F.col(col_b).alias("__b")
    ).agg(F.count(F.lit(1)).cast("double").alias("__nab"))
    ma = joint.groupBy("__a").agg(F.sum("__nab").alias("__na"))
    mb = joint.groupBy("__b").agg(F.sum("__nab").alias("__nb"))
    tot = joint.agg(F.sum("__nab").alias("__n"))
    full = (
        joint.join(ma, "__a")
        .join(mb, "__b")
        .crossJoin(F.broadcast(tot))
    )
    mi_term = (F.col("__nab") / F.col("__n")) * F.log(
        F.col("__nab") * F.col("__n") / (F.col("__na") * F.col("__nb"))
    )
    # entropies from the SAME frame: Σ_ab nab/n · ln(n/na) telescopes to
    # Σ_a pa ln(1/pa) because Σ_b nab = na
    ha_term = (F.col("__nab") / F.col("__n")) * F.log(F.col("__n") / F.col("__na"))
    hb_term = (F.col("__nab") / F.col("__n")) * F.log(F.col("__n") / F.col("__nb"))
    out = full.agg(
        F.sum("__nab").cast("bigint").alias("n"),
        F.sum(mi_term).alias("__mi"),
        F.sum(ha_term).alias("__ha"),
        F.sum(hb_term).alias("__hb"),
    )
    nmi = F.when(
        (F.col("__ha") > 0) & (F.col("__hb") > 0),
        F.col("__mi") / F.sqrt(F.col("__ha") * F.col("__hb")),
    ).otherwise(F.lit(0.0))
    return out.select(
        "n",
        F.round("__mi", 6).alias("mi"),
        F.round("__ha", 6).alias("h_a"),
        F.round("__hb", 6).alias("h_b"),
        F.round(nmi, 6).alias("nmi"),
    )


def loglog_elasticity(
    df: DataFrame,
    group_col: str,
    x_col: str,
    y_col: str,
    min_n: int = 10,
) -> DataFrame:
    """Per-group log-log OLS slope — the price-elasticity estimate when
    ``x`` is unit price and ``y`` is quantity (slope = %Δy per %Δx).
    Closed-form from moment sums of (ln x, ln y); rows with x <= 0 or
    y <= 0 drop out; groups with fewer than ``min_n`` usable rows are
    suppressed (slope noise).

    Scale shape: one keyed hash agg computing all five moment sums —
    map-side partial combine, one shuffle on the group key, no windows,
    no second pass.

    Output: ``<group_col>, n, slope, intercept`` (floats rounded 6).
    """
    lx = F.log(F.col(x_col))
    ly = F.log(F.col(y_col))
    g = (
        df.where((F.col(x_col) > 0) & (F.col(y_col) > 0))
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).cast("double").alias("__n"),
            F.sum(lx).alias("__sx"),
            F.sum(ly).alias("__sy"),
            F.sum(lx * lx).alias("__sxx"),
            F.sum(lx * ly).alias("__sxy"),
        )
        .where(F.col("__n") >= min_n)
    )
    denom = F.col("__n") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    slope = F.when(
        denom != 0,
        (F.col("__n") * F.col("__sxy") - F.col("__sx") * F.col("__sy")) / denom,
    )
    intercept = (F.col("__sy") - slope * F.col("__sx")) / F.col("__n")
    return g.select(
        group_col,
        F.col("__n").cast("bigint").alias("n"),
        F.round(slope, 6).alias("slope"),
        F.round(intercept, 6).alias("intercept"),
    )


def table_digest(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Order-independent table fingerprint: an anti-entropy checksum two
    replicas (or a snapshot and its upsert-reconstructed twin) can
    compare without shipping rows.  Each row canonicalizes to
    ``col=value`` pairs joined with ``|`` (NULL spelled as the
    ``__NULL__`` sentinel), hashes to a 48-bit
    md5-derived int, and the digest is the SUM — commutative, so
    partition order, shuffle layout, and engine never matter.

    Scale shape: pure map + ONE 1-row agg (sum + count); zero shuffles
    beyond the final 1-row exchange.  The exact decimal sum reduces mod
    2^63 at the very end (modular addition commutes, so the digest
    stays order-independent and row-count-unbounded — a raw 48-bit sum
    overflows int64 around 3x10^5 rows, caught at sf0.1); any
    single-row difference moves the digest with probability
    ~1 - 2^-48.

    Cross-engine digests require cast-stable column types (ints,
    strings, dates): double->string formatting differs between engines
    (Java scientific notation), so round/format float columns first.

    Output (1 row): ``n_rows, digest`` (digest as bigint).
    """
    from flashml_spark.functions import hashing as H

    use = cols or df.columns
    canon = F.concat_ws(
        "|",
        *[
            F.concat(
                F.lit(c + "="),
                F.coalesce(F.col(c).cast("string"), F.lit("__NULL__")),
            )
            for c in use
        ],
    )
    h = H.md5_long(canon, 12)
    mod = F.expr("CAST('9223372036854775808' AS DECIMAL(38,0))")  # 2^63
    return df.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        (F.sum(h.cast("decimal(38,0)")) % mod).cast("bigint").alias("digest"),
    )


def weighted_median_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    weight_col: str,
) -> DataFrame:
    """Per-group weighted median: the smallest value whose cumulative
    weight reaches half the group's total (lower weighted median —
    deterministic, no interpolation, so it ports to any engine
    bit-for-bit).  The robust location estimate when rows carry
    unequal mass (revenue-weighted price, quantity-weighted rate).

    Scale shape: pre-aggregate to (group, value) cells first — the
    cumulative window then runs over the per-group DISTINCT-VALUE
    domain, not raw rows; one keyed window, one keyed filter-agg.
    """
    cells = df.groupBy(group_col, F.col(value_col).alias("__v")).agg(
        F.sum(weight_col).alias("__w")
    )
    w = Window.partitionBy(group_col).orderBy("__v")
    tot = Window.partitionBy(group_col)
    cum = cells.select(
        group_col,
        "__v",
        F.sum("__w").over(w).alias("__cw"),
        F.sum("__w").over(tot).alias("__tw"),
    )
    return (
        cum.where(F.col("__cw") * 2 >= F.col("__tw"))
        .groupBy(group_col)
        .agg(F.min("__v").alias("weighted_median"))
    )


def exact_quantiles_per_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: list[float],
) -> DataFrame:
    """Per-group exact lower quantiles without interpolation: quantile q
    is the smallest value whose cumulative count reaches ``ceil(q * n)``
    — deterministic and engine-portable (percentile_cont interpolation
    differs across engines), the generalization of
    :func:`weighted_median_per_group` to arbitrary q lists.

    Scale shape: (group, value) cell pre-agg first, so the cumulative
    window runs over each group's DISTINCT-VALUE domain; the |q| fan-out
    explodes literals on that post-agg frame.  Output:
    ``<group_col>, q, value`` sorted-friendly, |groups| x |q| rows.
    """
    cells = df.groupBy(group_col, F.col(value_col).alias("__v")).agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = Window.partitionBy(group_col).orderBy("__v")
    tot = Window.partitionBy(group_col)
    cum = cells.select(
        group_col,
        "__v",
        F.sum("__c").over(w).alias("__cw"),
        F.sum("__c").over(tot).alias("__n"),
    )
    fanned = cum.select(
        group_col,
        "__v",
        "__cw",
        "__n",
        F.explode(F.array(*[F.lit(q) for q in quantiles])).alias("q"),
    )
    return (
        fanned.where(F.col("__cw") >= F.ceil(F.col("q") * F.col("__n")))
        .groupBy(group_col, "q")
        .agg(F.min("__v").alias("value"))
    )


def order_total_consistency_audit(
    orders: DataFrame,
    lineitem: DataFrame,
    tolerance: float = 0.01,
) -> DataFrame:
    """Cross-table VALUE integrity (the twin of x159's key integrity):
    recompute each order's total from its line items
    (``sum(extendedprice * (1-discount) * (1+tax))``, the TPC-H
    invariant) and report how the stored ``o_totalprice`` disagrees —
    count within tolerance, worst offenders, error mass.  On clean
    TPC-H data every order matches; on real pipelines this catches
    partial loads and double-applied discounts.

    Scale shape: one keyed lineitem agg (exact decimal), one keyed join
    on the order key (co-partitions with the agg shuffle), ONE summary
    row.

    Output (1 row): ``n_orders, n_matched, n_mismatched, match_rate,
    max_abs_err, mean_abs_err`` (floats rounded 6).
    """
    recomputed = lineitem.groupBy(
        F.col("l_orderkey").alias("__ok")
    ).agg(
        F.sum(
            (
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax"))
            ).cast("decimal(28,6)")
        )
        .cast("double")
        .alias("__recomputed")
    )
    j = orders.select(
        F.col("o_orderkey").alias("__ok"), F.col("o_totalprice").alias("__stored")
    ).join(recomputed, "__ok", "inner")
    err = F.abs(F.col("__stored") - F.col("__recomputed"))
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_orders"),
        F.sum(F.when(err <= tolerance, 1).otherwise(0))
        .cast("bigint")
        .alias("n_matched"),
        F.sum(F.when(err > tolerance, 1).otherwise(0))
        .cast("bigint")
        .alias("n_mismatched"),
        F.round(
            F.sum(F.when(err <= tolerance, 1).otherwise(0)) / F.count(F.lit(1)), 6
        ).alias("match_rate"),
        F.round(F.max(err), 6).alias("max_abs_err"),
        F.round(F.avg(err), 6).alias("mean_abs_err"),
    )


def histogram_2d(
    df: DataFrame,
    x_col: str,
    y_col: str,
    bins: int = 10,
) -> DataFrame:
    """Fixed-width 2-D histogram (heat grid): joint distribution of two
    numeric columns over a bins x bins grid anchored at the global
    min/max of each axis — the joint-density readout behind every
    price-vs-quantity / length-vs-quality heat map.  The top edge folds
    into the last cell (max values land in bin bins-1).

    Scale shape: one 1-row min/max agg broadcast onto the scan, a pure
    map bucketing expression, one (bx, by) hash agg — bins² output
    rows.  Bucket arithmetic is single-op double math on engine-
    identical inputs, so cells are bit-identical cross-engine.

    Output: ``bx, by, n, x_lo, y_lo`` (cell counts + lower edges,
    edges rounded 6).
    """
    bounds = df.agg(
        F.min(x_col).cast("double").alias("__xmin"),
        F.max(x_col).cast("double").alias("__xmax"),
        F.min(y_col).cast("double").alias("__ymin"),
        F.max(y_col).cast("double").alias("__ymax"),
    )
    j = df.where(
        F.col(x_col).isNotNull() & F.col(y_col).isNotNull()
    ).crossJoin(F.broadcast(bounds))
    wx = (F.col("__xmax") - F.col("__xmin")) / bins
    wy = (F.col("__ymax") - F.col("__ymin")) / bins

    def bucket(col, lo, width):
        # constant axis (width 0) folds everything into bin 0
        raw = F.floor((F.col(col).cast("double") - lo) / width)
        return F.when(width > 0, F.least(raw, F.lit(bins - 1))).otherwise(
            F.lit(0)
        ).cast("bigint")

    bx = bucket(x_col, F.col("__xmin"), wx)
    by = bucket(y_col, F.col("__ymin"), wy)
    return (
        j.select(
            bx.alias("bx"),
            by.alias("by"),
            F.col("__xmin"),
            F.col("__ymin"),
            (F.col("__xmax") - F.col("__xmin")).alias("__xspan"),
            (F.col("__ymax") - F.col("__ymin")).alias("__yspan"),
        )
        .groupBy("bx", "by")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.round(
                F.first("__xmin") + F.col("bx") * F.first("__xspan") / bins, 6
            ).alias("x_lo"),
            F.round(
                F.first("__ymin") + F.col("by") * F.first("__yspan") / bins, 6
            ).alias("y_lo"),
        )
    )


# Abramowitz & Stegun 26.2.17 polynomial constants for the standard
# normal survival function — Python literals shared verbatim with SQL
# oracles (cross-engine float rule, SCALE.md): both engines evaluate the
# SAME literal arithmetic in the same association order, so the p-values
# are bit-identical (|error| < 7.5e-8, far inside the ROUND(...,6) pin).
AS_B1 = 0.319381530
AS_B2 = -0.356563782
AS_B3 = 1.781477937
AS_B4 = -1.821255978
AS_B5 = 1.330274429
AS_P = 0.2316419
INV_SQRT_2PI = 0.3989422804014327


def normal_sf(z: Column) -> Column:
    """P(Z > z) for z >= 0 via the A&S 26.2.17 polynomial (explicit
    powers, left-associated — mirror the SQL spelling exactly)."""
    t = 1.0 / (1.0 + F.lit(AS_P) * z)
    pdf = F.exp(-0.5 * z * z) * F.lit(INV_SQRT_2PI)
    poly = (
        F.lit(AS_B1) * t
        + F.lit(AS_B2) * t * t
        + F.lit(AS_B3) * t * t * t
        + F.lit(AS_B4) * t * t * t * t
        + F.lit(AS_B5) * t * t * t * t * t
    )
    return pdf * poly


def normal_sf_sql(z_expr: str) -> str:
    """The DuckDB twin of :func:`normal_sf` — identical literals,
    identical association order."""
    t = f"(1.0 / (1.0 + CAST({AS_P!r} AS DOUBLE) * {z_expr}))"
    pdf = (
        f"(EXP(-0.5 * {z_expr} * {z_expr})"
        f" * CAST({INV_SQRT_2PI!r} AS DOUBLE))"
    )
    poly = (
        f"(CAST({AS_B1!r} AS DOUBLE) * {t}"
        f" + CAST({AS_B2!r} AS DOUBLE) * {t} * {t}"
        f" + CAST({AS_B3!r} AS DOUBLE) * {t} * {t} * {t}"
        f" + CAST({AS_B4!r} AS DOUBLE) * {t} * {t} * {t} * {t}"
        f" + CAST({AS_B5!r} AS DOUBLE) * {t} * {t} * {t} * {t} * {t})"
    )
    return f"({pdf} * {poly})"


def bh_fdr(
    df: DataFrame, key_col: str, p_col: str, q: float = 0.1
) -> DataFrame:
    """Benjamini-Hochberg step-up FDR control over a family of tests:
    rank p-values ascending, find the largest rank k with
    ``p_(k) <= (k/m)·q``, and flag ranks 1..k as discoveries — the
    multiple-testing guard every per-segment metric sweep needs before
    anyone acts on "23 of 25 segments moved".

    Scale shape: the input is the FAMILY of tests (one row per test —
    |tests| is config-bounded, e.g. 25 nations), so the rank window and
    the 1-row max-k broadcast run on an already-aggregated tiny frame;
    the heavy per-test aggregation happened upstream.  Output adds
    ``rank, bh_threshold, discovered``.
    """
    w = Window.orderBy(F.col(p_col).asc(), F.col(key_col).asc())
    m_df = df.agg(F.count(F.lit(1)).cast("double").alias("__m"))
    ranked = (
        df.crossJoin(F.broadcast(m_df))
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .withColumn(
            "bh_threshold", F.round(F.col("rank") / F.col("__m") * q, 6)
        )
    )
    kmax = ranked.where(
        F.col(p_col) <= F.col("rank") / F.col("__m") * q
    ).agg(F.max("rank").alias("__k"))
    return (
        ranked.crossJoin(F.broadcast(kmax))
        .withColumn(
            "discovered",
            (F.col("rank") <= F.coalesce(F.col("__k"), F.lit(0))).cast("int"),
        )
        .drop("__m", "__k")
    )
