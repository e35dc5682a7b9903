"""Distributed sketch operators.

The reference's analytics stack has no sketch family (its dedup is
exact); these are the cardinality/frequency companions a 100 TB
curation pipeline runs *before* paying for exact passes.  Every sketch
here is DETERMINISTIC (md5-derived hashing, no engine RNG) so the same
computation is expressible in any SQL engine and the driver's DuckDB
oracle can replay it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from flashml_spark.functions import hashing as H

# alpha_256: the standard HLL bias constant for m >= 128 registers
# (Flajolet et al. 2007, eq. 3: 0.7213 / (1 + 1.079/m)).  Computed in
# Python and baked as a literal into BOTH the Spark plan and the SQL
# oracle — never each engine's own arithmetic — per the cross-engine
# float determinism rule (SCALE.md).
HLL_M = 256
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)


def hll_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """The per-group HLL register frame ``(<groups...>, reg, mr)`` —
    ≤ 256 rows per group.  256 registers from a 60-bit md5-derived
    hash: low 8 bits pick the register, the remaining 52 bits' leading-
    zero rank (``53 - bitlength``) is the register value.

    This frame IS the sketch: merging sketches (across sources, shards,
    or days) is ``groupBy(reg).max(mr)`` — the associative property that
    makes HLL usable at 100 TB (per-partition sketches meet in one
    register-bounded agg instead of a global distinct shuffle).

    The high bits come via ``shiftright`` — hv/256 through double
    division would round (60 significant bits > the 53-bit mantissa)
    and floor() could land off by one; the SQL twin is exact integer
    division (``hv // 256``).
    """
    hv = H.md5_long(F.col(value_col).cast("string"), 15)  # 60 bits, positive
    w = F.shiftright(hv, 8)
    rank = F.when(w == 0, F.lit(53)).otherwise(
        F.lit(53) - F.length(F.bin(w))
    )
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, F.col(value_col))
        .distinct()
        .select(
            *group_cols,
            (hv % HLL_M).alias("reg"),
            rank.alias("rank"),
        )
        .groupBy(*group_cols, "reg")
        .agg(F.max("rank").alias("mr"))
    )


def hll_estimate_from_registers(
    regs: DataFrame, group_cols: list[str]
) -> DataFrame:
    """Cardinality estimate from a register frame: the raw HLL harmonic
    mean, with the Flajolet et al. 2007 §4 small-range correction —
    linear counting ``m·ln(m/V)`` (V = empty registers) when the raw
    estimate is below 2.5·m, where the raw estimator is badly biased
    high.  Absent registers contribute 2^0 = 1.0 each.  Output:
    ``<groups...>, hll`` (unrounded double).
    """
    agg = regs.groupBy(*group_cols).agg(
        F.sum(F.pow(F.lit(2.0), -F.col("mr"))).alias("s"),
        F.count(F.lit(1)).alias("used"),
    )
    raw = agg.select(
        *group_cols,
        (
            F.lit(HLL_ALPHA * HLL_M * HLL_M)
            / (F.col("s") + (F.lit(HLL_M) - F.col("used")))
        ).alias("raw"),
        (F.lit(HLL_M) - F.col("used")).cast("double").alias("v"),
    )
    return raw.select(
        *group_cols,
        F.when(
            (F.col("raw") <= 2.5 * HLL_M) & (F.col("v") > 0),
            F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / F.col("v")),
        )
        .otherwise(F.col("raw"))
        .alias("hll"),
    )


def hll_cardinality(df: DataFrame, value_col: str) -> float:
    """Whole-frame HLL distinct estimate as a scalar — the monitoring
    readout (``experiment.type="monitoring"``), where the question is
    "did this column's cardinality move between training and serving"
    and an exact ``count_distinct`` over the serving corpus is the cost
    the sketch exists to avoid.  One corpus pass, one 1-row collect.
    """
    regs = hll_registers(df, [], value_col)
    rows = hll_estimate_from_registers(regs, []).collect()
    return float(rows[0]["hll"]) if rows else 0.0


def hll_distinct(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Per-group HyperLogLog distinct estimate next to the exact count —
    the sketch-accuracy audit.

    Deliberately NOT ``approx_count_distinct``: Spark's HLL++ and any
    other engine's HLL use different hash functions and bias tables, so
    their estimates can't be compared across engines.  This one is pure
    integer/md5 arithmetic + exact powers of two, so DuckDB reproduces
    it bit-for-bit — the estimate itself becomes testable, which is the
    point of an accuracy audit.

    Scale shape: distinct (group, value) hash agg → (group, register)
    max-rank agg (≤ 256·|groups| rows) → per-group sum.  The corpus is
    touched once; everything after the first agg is register-bounded.
    Output: ``<group>, n_exact, hll_estimate, rel_error``.
    """
    regs = hll_registers(df, [group_col], value_col)
    est = hll_estimate_from_registers(regs, [group_col])
    exact = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count_distinct(value_col).alias("n_exact"))
    )
    return (
        exact.join(est, group_col)
        .select(
            group_col,
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.round("hll", 6).alias("hll_estimate"),
            F.round(
                F.abs(F.col("hll") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_error"),
        )
    )


def hll_merge_audit(
    df: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """The merge-associativity audit: estimate global cardinality two
    ways — directly from the whole corpus, and by MERGING the per-group
    register frames (``groupBy(reg).max(mr)``) — and report both next
    to the exact count.  Because max is associative, the merged
    registers are IDENTICAL to the directly-computed ones, so the two
    estimates agree bit-for-bit: the property that lets 100 TB
    pipelines sketch per shard/day/source and combine later without
    ever re-touching the data.  Output (1 row): ``n_exact,
    direct_hll, merged_hll, merge_identical, rel_error``.
    """
    per_group = hll_registers(df, [group_col], value_col)
    merged = per_group.groupBy("reg").agg(F.max("mr").alias("mr"))
    m_est = hll_estimate_from_registers(merged, [])
    direct = hll_registers(df, [], value_col)
    d_est = hll_estimate_from_registers(direct, [])
    exact = df.where(F.col(value_col).isNotNull()).agg(
        F.count_distinct(value_col).alias("n_exact")
    )
    return (
        exact.crossJoin(
            F.broadcast(d_est.select(F.col("hll").alias("direct")))
        )
        .crossJoin(F.broadcast(m_est.select(F.col("hll").alias("merged"))))
        .select(
            F.col("n_exact").cast("bigint").alias("n_exact"),
            F.round("direct", 6).alias("direct_hll"),
            F.round("merged", 6).alias("merged_hll"),
            (F.col("direct") == F.col("merged")).cast("int").alias(
                "merge_identical"
            ),
            F.round(
                F.abs(F.col("merged") - F.col("n_exact")) / F.col("n_exact"), 6
            ).alias("rel_error"),
        )
    )


CMS_D = 4
CMS_W = 1024


def count_min_audit(
    df: DataFrame, value_col: str, top_k: int = 10
) -> DataFrame:
    """Count-min sketch frequency audit (Cormode & Muthukrishnan 2005):
    a d=4 × w=1024 counter grid (md5-derived row hashes), read back for
    the exact top-``top_k`` heavy hitters next to their true counts —
    the overestimate column IS the sketch's error guarantee made
    visible (CMS never underestimates; E[error] ≤ N/w per row, min over
    d rows).

    Scale shape: one corpus pass explodes each value to its d (row,
    bucket) cells; the sketch is a 4096-row agg (broadcast-size — the
    point: frequency estimates for ANY value from a fixed-size
    structure); the heavy-hitter list is one TakeOrdered.  Estimates
    join the sketch on (row, bucket) — never a rescan.

    Output: ``value, n_exact, cms_estimate, overestimate`` ordered by
    exact count desc (ties: value asc).
    """
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).alias("v")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    H.md5_long(F.concat(F.lit(f"cm{j}:"), F.col("v")), 8)
                    % CMS_W
                ).alias("b"),
            )
            for j in range(CMS_D)
        ]
    )
    sketch = (
        vals.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.j").alias("j"), F.col("c.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    top = (
        vals.groupBy("v")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_exact"))
        .orderBy(F.desc("n_exact"), F.asc("v"))
        .limit(top_k)
    )
    probe_cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    H.md5_long(F.concat(F.lit(f"cm{j}:"), F.col("v")), 8)
                    % CMS_W
                ).alias("b"),
            )
            for j in range(CMS_D)
        ]
    )
    probes = top.select("v", "n_exact", F.explode(probe_cells).alias("c"))
    est = (
        probes.join(
            F.broadcast(sketch),
            (F.col("c.j") == F.col("j")) & (F.col("c.b") == F.col("b")),
        )
        .groupBy("v", "n_exact")
        .agg(F.min("cnt").cast("bigint").alias("cms_estimate"))
    )
    return est.select(
        F.col("v").alias("value"),
        "n_exact",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("n_exact")).cast("bigint").alias(
            "overestimate"
        ),
    ).orderBy(F.desc("n_exact"), F.asc("value"))


def hll_pairwise_jaccard(
    df: DataFrame, group_col: str, value_col: str, top_k: int = 10
) -> DataFrame:
    """Pairwise set-overlap matrix from HLL sketches: for every group
    pair, |A∩B| is estimated by inclusion-exclusion over three register
    estimates (|A|, |B|, and |A∪B| from the pair's MERGED registers —
    sketch union is free), reported next to the exact Jaccard — the
    audit that says whether sketch-based overlap triage is accurate
    enough to replace the exact vocabulary join at 100 TB (where the
    sketches are a few KB per shard and the exact join is a full
    shuffle).

    Scale shape: per-group registers once (≤ 256·|groups| rows); the
    pair-union frame is |pairs| × ≤ 512 register rows (group-count
    bounded, never data bounded); the exact side is one distinct
    (group, value) self-join on the value key.  Output: ``group_a,
    group_b, jaccard_est, jaccard_exact, abs_err`` — top ``top_k`` by
    estimated Jaccard (ties: group names).
    """
    # register-bounded (≤256·|groups| rows); checkpointed so the five
    # downstream consumers read it instead of re-running the corpus
    # distinct+hash pass each
    regs = hll_registers(df, [group_col], value_col).localCheckpoint(
        eager=False
    )
    singles = hll_estimate_from_registers(regs, [group_col])
    groups = regs.select(F.col(group_col).alias("ga")).distinct()
    pairs = groups.join(
        regs.select(F.col(group_col).alias("gb")).distinct(),
        F.col("ga") < F.col("gb"),
    )
    tagged = pairs.join(
        regs,
        (F.col(group_col) == F.col("ga")) | (F.col(group_col) == F.col("gb")),
    ).select("ga", "gb", "reg", "mr")
    union_regs = tagged.groupBy("ga", "gb", "reg").agg(
        F.max("mr").alias("mr")
    )
    eu = hll_estimate_from_registers(union_regs, ["ga", "gb"]).select(
        "ga", "gb", F.col("hll").alias("eu")
    )
    ea = singles.select(F.col(group_col).alias("ga"), F.col("hll").alias("ea"))
    eb = singles.select(F.col(group_col).alias("gb"), F.col("hll").alias("eb"))
    est = (
        eu.join(ea, "ga")
        .join(eb, "gb")
        .select(
            "ga", "gb",
            F.greatest(
                (F.col("ea") + F.col("eb") - F.col("eu")) / F.col("eu"),
                F.lit(0.0),
            ).alias("jac_est"),
        )
    )
    # vocab-bounded distinct frame, read three times (sizes + both join
    # sides) — checkpointed for the same reason
    dv = (
        df.where(F.col(value_col).isNotNull())
        .select(F.col(group_col).alias("g"), F.col(value_col).alias("v"))
        .distinct()
        .localCheckpoint(eager=False)
    )
    sizes = dv.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    inter = (
        dv.select(F.col("g").alias("ga"), "v")
        .join(dv.select(F.col("g").alias("gb"), "v"), "v")
        .where(F.col("ga") < F.col("gb"))
        .groupBy("ga", "gb")
        .agg(F.count(F.lit(1)).alias("ni"))
    )
    exact = (
        inter.join(sizes.select(F.col("g").alias("ga"), F.col("n").alias("na")), "ga")
        .join(sizes.select(F.col("g").alias("gb"), F.col("n").alias("nb")), "gb")
        .select(
            "ga", "gb",
            (
                F.col("ni")
                / (F.col("na") + F.col("nb") - F.col("ni")).cast("double")
            ).alias("jac_exact"),
        )
    )
    return (
        est.join(exact, ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            F.round("jac_est", 6).alias("jaccard_est"),
            F.round(F.coalesce("jac_exact", F.lit(0.0)), 6).alias(
                "jaccard_exact"
            ),
            F.round(
                F.abs(
                    F.col("jac_est") - F.coalesce("jac_exact", F.lit(0.0))
                ),
                6,
            ).alias("abs_err"),
        )
        .orderBy(F.desc("jaccard_est"), F.asc("group_a"), F.asc("group_b"))
        .limit(top_k)
    )


def moment_registers(
    df: DataFrame, group_cols: list[str], value_col: str
) -> DataFrame:
    """Per-group MERGEABLE moment sketch ``(n, s1, s2, s3, s4)`` — exact
    integer-valued power sums (Braverman et al.'s moments-sketch idea
    reduced to its exact core): merging shards is plain addition, the
    associative property that lets per-partition sketches meet in one
    |groups|-row agg at 100 TB.

    The input must be integer-valued (``value_col`` cast to BIGINT):
    power sums of integers are EXACT in decimal arithmetic, so the
    sketch — unlike float sums, whose value depends on aggregation
    order — is bit-identical across engines and replays (the x188
    determinism rule).  ``s3``/``s4`` accumulate as DECIMAL(38,0).
    """
    v = F.col(value_col).cast("bigint")
    v2 = (v * v).alias("v2")  # value <= ~1e9 fits bigint squared
    return (
        df.where(F.col(value_col).isNotNull())
        .select(*group_cols, v.alias("v"), v2)
        .groupBy(*group_cols)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").cast("decimal(38,0)").alias("s1"),
            F.sum("v2").cast("decimal(38,0)").alias("s2"),
            F.sum(
                (F.col("v2") * F.col("v")).cast("decimal(38,0)")
            ).alias("s3"),
            F.sum(
                F.col("v2").cast("decimal(38,0)") * F.col("v2")
            ).alias("s4"),
        )
    )


def moment_quantile_audit(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: tuple = (0.25, 0.5, 0.75),
) -> DataFrame:
    """Moment-sketch quantile audit: per-group sketches are MERGED into
    global power sums (plain addition over the |groups|-row frame —
    never a corpus rescan), the merged moments yield Cornish-Fisher
    quantile estimates (mean + sd·(z + ((z²−1)/6)·skew), A&S 26.2.49
    first-order term), and each estimate is reported next to the exact
    lower quantile — the audit that says whether a few integers per
    shard can replace a global sort for tail monitoring at 100 TB.

    Cross-engine float discipline: the sketch sums are EXACT integers
    (see ``moment_registers``); every derived float uses only IEEE
    exactly-rounded ops (+ − × ÷ sqrt — never ``pow``, whose libm
    implementations differ in the last ulp between JVM and C) with the
    SAME left-associative operation order written into both the Spark
    plan and the SQL oracle, and the normal quantiles arrive as
    Python-computed literals.  The estimates therefore replay
    bit-for-bit.

    Scale shape: one corpus pass for the per-group sketch + one for the
    exact quantile cells (value-domain bounded cumsum); the merge and
    the estimate arithmetic run on |groups| and |quantiles| rows.
    Output: ``q, est, exact, abs_err`` ordered by q.
    """
    from statistics import NormalDist

    from flashml_spark.functions.windows import global_cumsum

    # standard normal quantiles, Python-computed and baked as literals
    # into BOTH engines' plans (cross-engine float rule, SCALE.md)
    nd = NormalDist()
    consts = sorted(
        (float(q), nd.inv_cdf(float(q)), (nd.inv_cdf(float(q)) ** 2 - 1.0) / 6.0)
        for q in quantiles
    )

    sk = moment_registers(df, [group_col], value_col)
    merged = sk.agg(
        F.sum("n").alias("n"),
        F.sum("s1").alias("s1"),
        F.sum("s2").alias("s2"),
        F.sum("s3").alias("s3"),
    ).select(
        F.col("n").cast("double").alias("n"),
        F.col("s1").cast("double").alias("s1"),
        F.col("s2").cast("double").alias("s2"),
        F.col("s3").cast("double").alias("s3"),
    )
    mom = merged.select(
        (F.col("s1") / F.col("n")).alias("mu"),
        (F.col("s2") / F.col("n")).alias("m2"),
        (F.col("s3") / F.col("n")).alias("m3"),
    ).select(
        "mu",
        "m3",
        "m2",
        F.sqrt(F.col("m2") - F.col("mu") * F.col("mu")).alias("sd"),
    ).select(
        "mu",
        "sd",
        (
            (
                F.col("m3")
                - F.lit(3.0) * F.col("mu") * F.col("m2")
                + F.lit(2.0) * F.col("mu") * F.col("mu") * F.col("mu")
            )
            / (F.col("sd") * F.col("sd") * F.col("sd"))
        ).alias("skew"),
    )
    qrows = mom.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(q).alias("q"),
                        (
                            F.col("mu")
                            + F.col("sd")
                            * (F.lit(z) + F.lit(c2) * F.col("skew"))
                        ).alias("est"),
                    )
                    for q, z, c2 in consts
                ]
            )
        ).alias("e")
    ).select("e.q", "e.est")

    # exact lower quantiles: value cells -> range-partitioned cumsum
    cells = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(value_col).cast("bigint").alias("v"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = global_cumsum(cells, "v", ["c"])
    total = cells.agg(F.sum("c").alias("nn"))
    spark = df.sparkSession
    qdf = spark.createDataFrame([(q,) for q, _, _ in consts], "q double")
    exact = (
        cum.crossJoin(F.broadcast(total))  # 1-row scalar broadcast
        .crossJoin(F.broadcast(qdf))
        .where(F.col("cum_c") >= F.ceil(F.col("q") * F.col("nn")))
        .groupBy("q")
        .agg(F.min("v").alias("exact"))
    )
    return (
        qrows.join(exact, "q")
        .select(
            "q",
            F.round("est", 6).alias("est"),
            F.col("exact").cast("bigint").alias("exact"),
            F.round(F.abs(F.col("est") - F.col("exact")), 6).alias("abs_err"),
        )
        .orderBy("q")
    )


def cms_grid(df: DataFrame, value_col: str) -> DataFrame:
    """The d=4 × w=1024 count-min counter grid ``(j, b, cnt)`` for one
    column — ≤ 4096 rows regardless of input size, the same md5 cell
    arithmetic as ``count_min_audit`` (so grids built by different jobs
    /shards are directly combinable: CMS merges by cell-wise ADDITION).
    """
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("string").alias("v")
    )
    cells = F.array(
        *[
            F.struct(
                F.lit(j).alias("j"),
                (
                    H.md5_long(F.concat(F.lit(f"cm{j}:"), F.col("v")), 8)
                    % CMS_W
                ).alias("b"),
            )
            for j in range(CMS_D)
        ]
    )
    return (
        vals.select(F.explode(cells).alias("c"))
        .select("c.j", "c.b")
        .groupBy("j", "b")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_join_size(
    df_a: DataFrame, key_a: str, df_b: DataFrame, key_b: str
) -> DataFrame:
    """Join-size estimation by count-min INNER PRODUCT (Cormode &
    Muthukrishnan 2005 §4.2): ``|A ⋈ B| = Σ_k c_A(k)·c_B(k)`` is
    estimated by ``min_j Σ_b A_j[b]·B_j[b]`` over the two 4-KB grids —
    never an underestimate, expected overestimate ≤ N_A·N_B / w.  The
    planning readout a 100 TB pipeline computes BEFORE paying for the
    join shuffle: two single-pass grids answer "how big will this join
    be" for any key pair, and grids from different days/shards merge by
    addition.

    Scale shape: one pass per side → two ≤4096-row grids → a
    4096-row join + 4-row agg.  The exact side is one keyed count agg
    per side + an equi-join on the key frame (|distinct keys| rows).
    Output (1 row): ``exact, cms_estimate, overestimate, rel_error``.
    """
    ga = cms_grid(df_a, key_a)
    gb = cms_grid(df_b, key_b).select(
        "j", "b", F.col("cnt").alias("cnt_b")
    )
    est = (
        ga.join(gb, ["j", "b"])
        .groupBy("j")
        .agg(F.sum(F.col("cnt") * F.col("cnt_b")).alias("ip"))
        .agg(F.min("ip").alias("cms_estimate"))
    )
    ca = (
        df_a.where(F.col(key_a).isNotNull())
        .groupBy(F.col(key_a).cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("na"))
    )
    cb = (
        df_b.where(F.col(key_b).isNotNull())
        .groupBy(F.col(key_b).cast("string").alias("k"))
        .agg(F.count(F.lit(1)).alias("nb"))
    )
    exact = ca.join(cb, "k").agg(
        # empty join -> SUM is NULL; a disjoint key pair must read 0
        F.coalesce(F.sum(F.col("na") * F.col("nb")), F.lit(0)).alias("exact")
    )
    return exact.crossJoin(F.broadcast(est)).select(  # 1-row x 1-row
        F.col("exact").cast("bigint").alias("exact"),
        F.col("cms_estimate").cast("bigint").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("exact"))
        .cast("bigint")
        .alias("overestimate"),
        # guarded denominator so the exact=0 (disjoint) case stays a
        # finite, engine-identical number
        F.round(
            (F.col("cms_estimate") - F.col("exact"))
            / F.greatest(F.col("exact"), F.lit(1)).cast("double"),
            6,
        ).alias("rel_error"),
    )


def neyman_allocation(
    df: DataFrame,
    stratum_col: str,
    value_col: str,
    budget: int = 10_000,
) -> DataFrame:
    """Neyman-optimal sample allocation across strata (Neyman 1934):
    for a fixed audit budget, sample ``n_h ∝ N_h·σ_h`` — more rows from
    big AND internally-varied strata — reported next to proportional
    allocation (``n_h ∝ N_h``) and the design-effect ratio of the two
    allocations' estimator variances for the stratified mean.  The
    sampling-design readout a corpus audit runs BEFORE drawing rows:
    when strata differ in spread, Neyman beats proportional by exactly
    the reported factor at the same budget.

    Stratum σ_h derives from the SAME exact integer power sums as the
    moment sketch (``moment_registers``), so every float is
    order-independent and the allocation replays bit-for-bit.
    Everything after the one sketch pass runs on the |strata| frame.
    Output: ``<stratum>, n_rows, sd, n_neyman, n_proportional,
    var_ratio`` (var_ratio repeated — the 1-row design effect).
    """
    sk = moment_registers(df, [stratum_col], value_col).select(
        stratum_col,
        F.col("n").cast("double").alias("n"),
        F.col("s1").cast("double").alias("s1"),
        F.col("s2").cast("double").alias("s2"),
    )
    per = sk.select(
        stratum_col,
        "n",
        F.sqrt(
            F.col("s2") / F.col("n")
            - (F.col("s1") / F.col("n")) * (F.col("s1") / F.col("n"))
        ).alias("sd"),
    )
    totals = per.agg(
        F.sum("n").alias("tn"),
        F.sum(F.col("n") * F.col("sd")).alias("tns"),
        # variance terms: Neyman V ∝ (Σ N_h σ_h)² ; proportional
        # V ∝ N · Σ N_h σ_h²  (classic finite-budget comparison,
        # Cochran 1977 eq. 5.26-5.27, fpc ignored)
        F.sum(F.col("n") * F.col("sd") * F.col("sd")).alias("tns2"),
    )
    b = F.lit(float(budget))
    return (
        per.crossJoin(F.broadcast(totals))  # 1-row totals broadcast
        .select(
            stratum_col,
            F.col("n").cast("bigint").alias("n_rows"),
            F.round("sd", 6).alias("sd"),
            F.round(b * (F.col("n") * F.col("sd")) / F.col("tns"), 6).alias(
                "n_neyman"
            ),
            F.round(b * F.col("n") / F.col("tn"), 6).alias(
                "n_proportional"
            ),
            F.round(
                (F.col("tns") * F.col("tns"))
                / (F.col("tn") * F.col("tns2")),
                6,
            ).alias("var_ratio"),
        )
        .orderBy(stratum_col)
    )
