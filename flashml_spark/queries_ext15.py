"""Extension queries, round 5 fourth-to-eighth waves (x186-x214):
data-engineering audits (pre-join skew x186, functional dependencies
x189, table digest x198, referential VALUE integrity x213, dedup
savings x205, cross-source duplication x214), resampling and robust
statistics (Poisson-bootstrap CI x187, Theil-Sen x204, weighted
medians/quantile bands x199/x202/x210, mutual information x193,
log-log elasticity x194, Chao1 x203), anomaly detection (bounded-lag
EWMA x188, weekday median/MAD x209, calendar densification x201),
experimentation/survival (A/B z-test x196, log-rank x197, Markov
removal-effect attribution x192, funnel latencies x211), product
analytics (TWAP x206, drawdown x207, LTV x208, Pareto concentration
x212), layout/frontier (Z-order keys x190, skyline x191), and
LLM-pipeline curation (token-budget curves x195, zlib compression
ratio x200).

Oracle discipline unchanged: engine-portable DuckDB SQL sharing every
literal with the Spark side; md5-derived uniforms for anything random;
and the round-5 determinism rule — exact decimal sums, Python-literal
constants in BOTH plans, moment sums over stddev, lower quantiles over
percentile_cont — wherever a 6-decimal rounding could flip on float
association order (see SCALE.md "round-5 fourth wave").
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import events, relational, sampling
from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table, local_rows


# --------------------------------------------------------------------------
# x186 — pre-join skew audit on orders.o_custkey: the top-10 heaviest
# join-key values with share and skew ratio (count / mean per-key
# count) — the report a pipeline reads before picking broadcast /
# AQE skew-join / salting for a customer-keyed join.
_SKEW_SQL = """
WITH c AS (SELECT o_custkey AS key, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM orders GROUP BY o_custkey),
     g AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_keys,
                  CAST(SUM(cnt) AS DOUBLE) AS total FROM c),
     r AS (SELECT key, cnt,
                  CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC, key ASC)
                       AS BIGINT) AS rk
           FROM c)
SELECT rk AS "rank", key, cnt, ROUND(cnt / g.total, 6) AS share,
       ROUND(cnt * g.n_keys / g.total, 6) AS skew_ratio
FROM r CROSS JOIN g WHERE rk <= 10"""


@register("x186_join_skew_audit", _SKEW_SQL)
def x186(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_custkey")
    return relational.join_key_skew_audit(orders, "o_custkey", top_k=10)


# --------------------------------------------------------------------------
# x187 — Poisson-bootstrap CI for mean(o_totalprice): 32 replicates,
# Poisson(1) weights from the md5 uniform via the shared literal
# inverse-CDF ladder; normal-theory interval from the replicate means.
def _poisson_case(u_expr: str) -> str:
    arms = "".join(
        f"\n             WHEN {u_expr} < {c!r} THEN {k}"
        for k, c in enumerate(sampling.POISSON1_CDF)
    )
    return f"CASE{arms}\n             ELSE {len(sampling.POISSON1_CDF)} END"


_BOOT_SQL = f"""
WITH v AS (SELECT o_orderkey AS id, o_totalprice AS val FROM orders
           WHERE o_totalprice IS NOT NULL),
     f AS (SELECT id, val, r FROM v
           CROSS JOIN (SELECT unnest(range(0, 32)) AS r) reps),
     u AS (SELECT val, r,
                  (CAST(('0x' || substr(md5(CAST(id AS VARCHAR) || ':' ||
                         CAST(r // 4 AS VARCHAR)), (r % 4) * 8 + 1, 8))
                        AS BIGINT) + 1.0)
                  / 4294967296.0 AS u
           FROM f),
     w AS (SELECT val, r,
                  {_poisson_case("u")} AS w
           FROM u),
     m AS (SELECT r,
                  CAST(SUM(CAST(w * val AS DECIMAL(28,6))) AS DOUBLE)
                  / CAST(SUM(CAST(w AS DECIMAL(28,6))) AS DOUBLE) AS m
           FROM w GROUP BY r),
     s AS (SELECT AVG(m) AS bm, STDDEV_SAMP(m) AS bse FROM m),
     p AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
                  CAST(SUM(CAST(val AS DECIMAL(28,6))) AS DOUBLE)
                  / COUNT(*) AS pm
           FROM v)
SELECT n_rows, ROUND(pm, 6) AS point_mean, ROUND(bm, 6) AS boot_mean,
       ROUND(bse, 6) AS boot_se,
       ROUND(pm - 1.959963984540054 * bse, 6) AS ci_lo,
       ROUND(pm + 1.959963984540054 * bse, 6) AS ci_hi
FROM p CROSS JOIN s"""


@register("x187_bootstrap_ci", _BOOT_SQL)
def x187(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    return sampling.poisson_bootstrap_ci(
        orders, "o_totalprice", "o_orderkey", reps=32
    )


# --------------------------------------------------------------------------
# x188 — EWMA anomaly flags on daily order revenue: alpha=0.3 over the
# trailing 30 observed days (normalized over days present), flag when
# the day deviates from the EWMA forecast by > 3 trailing sds; first
# min_lags=5 days are warm-up (NULL ewma, flag 0).  Determinism: daily
# revenue and all lag moment sums are EXACT decimal sums, the lag
# weights are the SAME Python-computed literals the Spark plan bakes
# in, and sd comes from moment sums — no engine pow/stddev/association
# differences can shift a 6-decimal rounding.
_EWMA_W = "CASE i - jn " + " ".join(
    f"WHEN {j + 1} THEN {w!r}" for j, w in enumerate(events.ewma_weights(0.3, 30))
) + " END"

_EWMA_SQL = f"""
WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                           AS DOUBLE) AS revenue
               FROM orders GROUP BY 1),
     idx AS (SELECT d, revenue, ROW_NUMBER() OVER (ORDER BY d) AS rn
             FROM daily),
     j AS (SELECT c.d, c.revenue, c.rn AS i, p.revenue AS pv, p.rn AS jn
           FROM idx c LEFT JOIN idx p
             ON p.rn >= c.rn - 30 AND p.rn <= c.rn - 1),
     a AS (SELECT d, revenue, COUNT(pv) AS np,
                  CAST(SUM(CAST(({_EWMA_W}) * pv AS DECIMAL(38,6)))
                       AS DOUBLE) AS ws,
                  CAST(SUM(CAST(CASE WHEN pv IS NOT NULL
                                     THEN ({_EWMA_W}) END
                                AS DECIMAL(38,6))) AS DOUBLE) AS wt,
                  CAST(SUM(CAST(pv AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                  CAST(SUM(CAST(pv * pv AS DECIMAL(38,6))) AS DOUBLE) AS s2
           FROM j GROUP BY d, revenue, i),
     e AS (SELECT d, revenue,
                  CASE WHEN np >= 5 THEN ws / wt END AS ewma,
                  CASE WHEN np >= 5
                       THEN sqrt(GREATEST((np * s2 - s1 * s1) / (np * (np - 1.0)), 0.0))
                       END AS sd
           FROM a)
SELECT d, ROUND(revenue, 6) AS revenue, ROUND(ewma, 6) AS ewma,
       ROUND(sd, 6) AS sd, ROUND(revenue - ewma, 6) AS deviation,
       CASE WHEN sd IS NOT NULL AND ABS(revenue - ewma) > 3.0 * sd
            THEN 1 ELSE 0 END AS is_anomaly
FROM e"""


@register("x188_ewma_anomaly", _EWMA_SQL)
def x188(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    return events.ewma_anomaly(
        orders, "o_orderdate", "o_totalprice", alpha=0.3, lags=30, z=3.0
    )


# --------------------------------------------------------------------------
# x189 — functional-dependency discovery over lineitem: which candidate
# determinant -> dependent rules hold (violation_rate 0.0) and which
# die.  l_orderkey -> l_returnflag/ l_linestatus are plausible FDs an
# order-grain normalizer would bet on; the partkey<->suppkey pair
# measures the many-to-many density both ways.
def _fd_arm(det: str, dep: str) -> str:
    return f"""
SELECT '{det}' AS det_col, '{dep}' AS dep_col,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_violating,
       ROUND(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
           AS violation_rate
FROM (SELECT {det}, COUNT(DISTINCT {dep}) AS nd FROM lineitem
      GROUP BY {det}) g"""


_FD_PAIRS = [
    ("l_orderkey", "l_returnflag"),
    ("l_orderkey", "l_linestatus"),
    ("l_partkey", "l_suppkey"),
    ("l_suppkey", "l_partkey"),
]
_FD_SQL = "\nUNION ALL".join(_fd_arm(det, dep) for det, dep in _FD_PAIRS)


@register("x189_functional_dependency", _FD_SQL)
def x189(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_linestatus", "l_partkey", "l_suppkey"
    )
    return relational.functional_dependency_audit(li, _FD_PAIRS)


# --------------------------------------------------------------------------
# x190 — Z-order (Morton) clustering keys for orders on
# (o_custkey, order day): the interleaved value behind
# write_zorder_layout's 2-D file clustering, computed as pure integer
# bit arithmetic on both engines (16 bits per dimension).  The day
# dimension anchors at 1992-01-01 (TPC-H epoch).
from flashml_spark.functions.zorder import z_value, z_value_sql  # noqa: E402

_ZORDER_SQL = f"""
SELECT o_orderkey,
       o_custkey % 65536 AS za,
       date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) % 65536
           AS zb,
       {z_value_sql(
           "o_custkey % 65536",
           "date_diff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE))"
           " % 65536",
       )} AS zvalue
FROM orders"""


@register("x190_zorder_keys", _ZORDER_SQL)
def x190(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    za = (F.col("o_custkey") % 65536).cast("bigint")
    zb = (
        F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01").cast("date"))
        % 65536
    ).cast("bigint")
    return orders.select(
        "o_orderkey",
        za.alias("za"),
        zb.alias("zb"),
        z_value(za, zb, bits=16).alias("zvalue"),
    )


# --------------------------------------------------------------------------
# x191 — 2-D skyline (Pareto frontier) over part: minimize
# p_retailprice, maximize p_size — "no other part is both cheaper and
# larger".  The oracle is the INDEPENDENT quadratic NOT EXISTS
# formulation, so it checks the windowed sweep against first-principles
# dominance semantics, not a re-derivation of the same plan.
_SKYLINE_SQL = """
SELECT p_partkey, p_retailprice, CAST(p_size AS BIGINT) AS p_size
FROM part p
WHERE NOT EXISTS (
    SELECT 1 FROM part q
    WHERE q.p_retailprice <= p.p_retailprice AND q.p_size >= p.p_size
      AND (q.p_retailprice < p.p_retailprice OR q.p_size > p.p_size))"""


@register("x191_skyline_parts", _SKYLINE_SQL)
def x191(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    part = load_table(spark, sf, "part").select(
        "p_partkey", "p_retailprice", F.col("p_size").cast("bigint").alias("p_size")
    )
    return relational.skyline_2d(part, "p_retailprice", "p_size")


# --------------------------------------------------------------------------
# x192 — Markov removal-effect attribution, upgraded r10 from rows-only
# to a PLANTED-FIXTURE oracle (the x25/x200 execution-forcing pattern):
# (a) a literal absorbing chain built from 5 planted journeys
#       u1: A→purchase   u2: A→purchase   u3: A→B→purchase
#       u4: A→B(drop)    u5: A(drop)
#     giving transitions  A: {CONV 2/5, B 2/5, DROP 1/5},
#     B: {CONV 1/2, DROP 1/2}, so the absorbing solve has closed forms
#       p_full = 2/5 + 2/5·1/2 = 0.6
#       remove A → START is severed → p = 0, effect 1, share 0.75
#       remove B → p = 2/5 = 0.4, effect (0.6−0.4)/0.6 = 1/3, share 0.25
#     run through the REAL matrix-inverse solver and pinned as SQL
#     literals; and
# (b) ONE corpus row measured on the SOLVER OUTPUT: the channel count
#     of the full-corpus attribution equals COUNT(DISTINCT non-purchase
#     event_type) — derivable from the input, but the Spark value is
#     the row count of the solved output frame, forcing the
#     transition-count pass + per-channel solves to run corpus-wide.
_X192_FIX_EVENTS = [
    (1, 1, 1, "A"), (1, 2, 2, "purchase"),
    (2, 1, 3, "A"), (2, 2, 4, "purchase"),
    (3, 1, 5, "A"), (3, 2, 6, "B"), (3, 3, 7, "purchase"),
    (4, 1, 8, "A"), (4, 2, 9, "B"),
    (5, 1, 10, "A"),
]

_X192_SQL = """
WITH corpus AS (SELECT CAST(COUNT(DISTINCT event_type) AS DOUBLE) AS v
                FROM events WHERE event_type <> 'purchase')
SELECT 'corpus_channels' AS key, v AS value FROM corpus
UNION ALL SELECT 'fix:p_conv_full', CAST(0.6 AS DOUBLE)
UNION ALL SELECT 'fix:A:p_conv_removed', CAST(0.0 AS DOUBLE)
UNION ALL SELECT 'fix:A:removal_effect', CAST(1.0 AS DOUBLE)
UNION ALL SELECT 'fix:A:share', CAST(0.75 AS DOUBLE)
UNION ALL SELECT 'fix:B:p_conv_removed', CAST(0.4 AS DOUBLE)
UNION ALL SELECT 'fix:B:removal_effect', CAST(0.333333 AS DOUBLE)
UNION ALL SELECT 'fix:B:share', CAST(0.25 AS DOUBLE)
ORDER BY key"""


@register("x192_markov_attribution", _X192_SQL)
def x192(spark: SparkSession, sf: str) -> DataFrame:
    fix = local_rows(
        spark, _X192_FIX_EVENTS,
        "user_id bigint, ts bigint, event_id bigint, event_type string",
    )
    att_fix = events.markov_removal_attribution(
        fix, "user_id", "ts", "event_id", "event_type", "purchase"
    )
    pins = att_fix.select(
        F.expr(
            "stack(3,"
            " concat('fix:', channel, ':p_conv_removed'), p_conv_removed,"
            " concat('fix:', channel, ':removal_effect'), removal_effect,"
            " concat('fix:', channel, ':share'), share) AS (key, value)"
        )
    )
    p_full = att_fix.agg(F.max("p_conv_full").alias("value")).select(
        F.lit("fix:p_conv_full").alias("key"), "value"
    )
    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    att_corpus = events.markov_removal_attribution(
        ev, "user_id", "ts", "event_id", "event_type", "purchase"
    )
    corpus = att_corpus.agg(
        F.count(F.lit(1)).cast("double").alias("value")
    ).select(F.lit("corpus_channels").alias("key"), "value")
    return pins.unionByName(p_full).unionByName(corpus).orderBy("key")


# --------------------------------------------------------------------------
# x193 — mutual information lang x source over documents: quantifies in
# nats what x109's chi-square only ranks; NMI gives the scale-free
# redundancy score a feature-selection pass thresholds on.
_MI_SQL = """
WITH j AS (SELECT lang AS a, source AS b, CAST(COUNT(*) AS DOUBLE) AS nab
           FROM documents
           WHERE lang IS NOT NULL AND source IS NOT NULL
           GROUP BY lang, source),
     ma AS (SELECT a, SUM(nab) AS na FROM j GROUP BY a),
     mb AS (SELECT b, SUM(nab) AS nb FROM j GROUP BY b),
     t AS (SELECT SUM(nab) AS n FROM j),
     f AS (SELECT j.nab, ma.na, mb.nb, t.n
           FROM j JOIN ma USING (a) JOIN mb USING (b) CROSS JOIN t),
     s AS (SELECT CAST(SUM(nab) AS BIGINT) AS n,
                  SUM((nab / n) * ln(nab * n / (na * nb))) AS mi0,
                  SUM((nab / n) * ln(n / na)) AS ha0,
                  SUM((nab / n) * ln(n / nb)) AS hb0
           FROM f)
SELECT n, ROUND(mi0, 6) AS mi, ROUND(ha0, 6) AS h_a, ROUND(hb0, 6) AS h_b,
       ROUND(CASE WHEN ha0 > 0 AND hb0 > 0
                  THEN mi0 / sqrt(ha0 * hb0) ELSE 0.0 END, 6) AS nmi
FROM s"""


@register("x193_mutual_information", _MI_SQL)
def x193(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("lang", "source")
    return relational.mutual_information(docs, "lang", "source")


# --------------------------------------------------------------------------
# x194 — log-log price elasticity of demand per brand: OLS slope of
# ln(quantity) on ln(unit price) over lineitem joined to the part
# dimension (broadcast).  Brands with < 10 usable rows suppressed.
_ELAST_SQL = """
WITH b AS (SELECT p.p_brand,
                  ln(l.l_extendedprice / l.l_quantity) AS lx,
                  ln(l.l_quantity) AS ly
           FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
           WHERE l.l_extendedprice / l.l_quantity > 0 AND l.l_quantity > 0),
     g AS (SELECT p_brand, CAST(COUNT(*) AS DOUBLE) AS n,
                  SUM(lx) AS sx, SUM(ly) AS sy,
                  SUM(lx * lx) AS sxx, SUM(lx * ly) AS sxy
           FROM b GROUP BY p_brand HAVING COUNT(*) >= 10)
SELECT p_brand, CAST(n AS BIGINT) AS n,
       ROUND(CASE WHEN n * sxx - sx * sx <> 0
                  THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END, 6)
           AS slope,
       ROUND((sy - CASE WHEN n * sxx - sx * sx <> 0
                        THEN (n * sxy - sx * sy) / (n * sxx - sx * sx) END
                   * sx) / n, 6) AS intercept
FROM g"""


@register("x194_price_elasticity", _ELAST_SQL)
def x194(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    part = load_table(spark, sf, "part").select("p_partkey", "p_brand")
    # unhinted: AQE broadcasts the part dim while it is small and keeps
    # a shuffle join when it is not (part scales with SF)
    joined = li.join(part, li.l_partkey == part.p_partkey).select(
        "p_brand",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        "l_quantity",
    )
    return relational.loglog_elasticity(
        joined, "p_brand", "unit_price", "l_quantity", min_n=10
    )


# --------------------------------------------------------------------------
# x195 — token-budget truncation curve: % of corpus tokens retained at
# each candidate max_seq_len — the table behind a truncate-vs-chunk
# policy choice.  One token-count pass; the fan-out explodes literals
# on the 1-int-per-doc counts frame.
from flashml_spark.operators import textops  # noqa: E402
from flashml_spark.queries_ext import _TOK  # noqa: E402

_BUDGETS = [64, 128, 256, 512, 1024]

_BUDGET_SQL = f"""
WITH n AS (SELECT len({_TOK}) AS n FROM documents WHERE text IS NOT NULL),
     f AS (SELECT n.n, b.budget FROM n
           CROSS JOIN (SELECT unnest({_BUDGETS}) AS budget) b)
SELECT CAST(budget AS BIGINT) AS budget,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN n > budget THEN 1 ELSE 0 END) AS BIGINT)
           AS n_truncated,
       CAST(SUM(n) AS BIGINT) AS tokens_total,
       CAST(SUM(LEAST(n, budget)) AS BIGINT) AS tokens_retained,
       ROUND(SUM(LEAST(n, budget)) * 1.0 / SUM(n), 6) AS retention
FROM f GROUP BY budget"""


@register("x195_token_budget_curve", _BUDGET_SQL)
def x195(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("text")
    return textops.token_budget_curve(docs, "text", _BUDGETS)


# --------------------------------------------------------------------------
# x196 — two-proportion z-test on an A/B split (user_id parity) with
# conversion = any purchase event: the categorical-outcome counterpart
# of x154's CUPED readout.  Counts stay integers to the final single
# divisions, so every float is bit-identical across engines.
_ZTEST_SQL = """
WITH pu AS (SELECT user_id,
                   MAX(CAST(user_id % 2 AS INT)) AS variant,
                   MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                       AS conv
            FROM events GROUP BY user_id),
     c AS (SELECT
        CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS conv_a,
        CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS conv_b
      FROM pu),
     d AS (SELECT *, conv_a * 1.0 / n_a AS pa, conv_b * 1.0 / n_b AS pb,
                  (conv_a + conv_b) * 1.0 / (n_a + n_b) AS pp
           FROM c),
     e AS (SELECT *, sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)) AS se
           FROM d)
SELECT n_a, conv_a, ROUND(pa, 6) AS rate_a, n_b, conv_b,
       ROUND(pb, 6) AS rate_b,
       ROUND(CASE WHEN se > 0 THEN (pa - pb) / se ELSE 0.0 END, 6) AS z,
       CAST(CASE WHEN se > 0 AND ABS((pa - pb) / se) > 1.96
                 THEN 1 ELSE 0 END AS INT) AS significant
FROM e"""


@register("x196_ab_ztest", _ZTEST_SQL)
def x196(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf, "events").select("user_id", "event_type")
    return events.two_proportion_ztest(
        ev,
        "user_id",
        (F.col("user_id") % 2).cast("int"),
        F.col("event_type") == "purchase",
    )


# --------------------------------------------------------------------------
# x197 — log-rank test between the user_id-parity cohorts' survival
# (lifetimes and censoring exactly as x184): the significance readout
# for the Kaplan-Meier curves.
_LOGRANK_SQL = """
WITH a AS (SELECT MAX(CAST(ts AS DATE)) AS maxd FROM events),
     u AS (SELECT date_diff('day', MIN(CAST(ts AS DATE)),
                            MAX(CAST(ts AS DATE))) AS t,
                  CASE WHEN MAX(CAST(ts AS DATE)) = (SELECT maxd FROM a)
                       THEN 1 ELSE 0 END AS cens,
                  CAST(MAX(user_id % 2) AS INT) AS grp
           FROM events GROUP BY user_id),
     e AS (SELECT t, grp, COUNT(*) AS ending, SUM(1 - cens) AS deaths
           FROM u GROUP BY t, grp),
     tot AS (SELECT grp, COUNT(*) AS total FROM u GROUP BY grp),
     allt AS (SELECT DISTINCT t FROM e),
     allg AS (SELECT DISTINCT grp FROM e),
     dense AS (SELECT allt.t, allg.grp, COALESCE(e.ending, 0) AS ending,
                      COALESCE(e.deaths, 0) AS deaths, tot.total
               FROM allt CROSS JOIN allg
               LEFT JOIN e ON e.t = allt.t AND e.grp = allg.grp
               JOIN tot ON tot.grp = allg.grp),
     risky AS (SELECT t, grp, deaths,
                      total - SUM(ending) OVER (PARTITION BY grp ORDER BY t)
                            + ending AS at_risk
               FROM dense),
     wide AS (SELECT t,
                     SUM(CASE WHEN grp = 0 THEN deaths ELSE 0 END) AS d1,
                     SUM(CASE WHEN grp = 1 THEN deaths ELSE 0 END) AS d2,
                     SUM(CASE WHEN grp = 0 THEN at_risk ELSE 0 END) AS n1,
                     SUM(CASE WHEN grp = 1 THEN at_risk ELSE 0 END) AS n2
              FROM risky GROUP BY t),
     terms AS (SELECT d1 AS o1, d2 AS o2,
                      (d1 + d2) * n1 * 1.0 / (n1 + n2) AS e1t,
                      (d1 + d2) * n2 * 1.0 / (n1 + n2) AS e2t,
                      (d1 + d2) * (n1 * 1.0 / (n1 + n2))
                          * (n2 * 1.0 / (n1 + n2))
                          * ((n1 + n2) - (d1 + d2)) / ((n1 + n2) - 1) AS v
               FROM wide WHERE d1 + d2 > 0 AND n1 + n2 > 1),
     s AS (SELECT CAST(SUM(o1) AS BIGINT) AS o1, SUM(e1t) AS se1,
                  CAST(SUM(o2) AS BIGINT) AS o2, SUM(e2t) AS se2,
                  SUM(v) AS sv
           FROM terms)
SELECT o1, ROUND(se1, 6) AS e1, o2, ROUND(se2, 6) AS e2,
       ROUND(CASE WHEN sv > 0 THEN (o1 - se1) * (o1 - se1) / sv
                  ELSE 0.0 END, 6) AS chi2
FROM s"""


@register("x197_logrank_test", _LOGRANK_SQL)
def x197(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf, "events").select("user_id", "ts")
    return events.logrank_test(
        ev, "user_id", "ts", (F.col("user_id") % 2).cast("int")
    )


# --------------------------------------------------------------------------
# x198 — order-independent table digest over lineitem's cast-stable key
# + flag columns: the anti-entropy checksum a replication / upsert
# pipeline compares instead of shipping rows (pairs with x106/x79).
_DIGEST_COLS = ["l_orderkey", "l_linenumber", "l_returnflag", "l_linestatus"]
_DIGEST_CANON = " || '|' || ".join(
    f"'{c}=' || CAST({c} AS VARCHAR)" for c in _DIGEST_COLS
)
_DIGEST_SQL = f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(CAST(('0x' || substr(md5({_DIGEST_CANON}), 1, 12))
                          AS BIGINT) AS DECIMAL(38,0)))
            % CAST('9223372036854775808' AS DECIMAL(38,0))
            AS BIGINT) AS digest
FROM lineitem"""


@register("x198_table_digest", _DIGEST_SQL)
def x198(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(*_DIGEST_COLS)
    return relational.table_digest(li, _DIGEST_COLS)


# --------------------------------------------------------------------------
# x199 — per-returnflag weighted median price (weight = quantity): the
# lower weighted median, deterministic with no interpolation so it
# ports bit-for-bit.
_WMED_SQL = """
WITH cells AS (SELECT l_returnflag, l_extendedprice AS v,
                      SUM(l_quantity) AS w
               FROM lineitem GROUP BY 1, 2),
     c AS (SELECT l_returnflag, v,
                  SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v) AS cw,
                  SUM(w) OVER (PARTITION BY l_returnflag) AS tw
           FROM cells)
SELECT l_returnflag, MIN(v) AS weighted_median
FROM c WHERE cw * 2 >= tw GROUP BY l_returnflag"""


@register("x199_weighted_median", _WMED_SQL)
def x199(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_returnflag", "l_extendedprice", "l_quantity"
    )
    return relational.weighted_median_per_group(
        li, "l_returnflag", "l_extendedprice", "l_quantity"
    )


# --------------------------------------------------------------------------
# x200 — zlib compression-ratio quality score (Gopher repetitiveness
# heuristic), upgraded r9 from rows-only to a PLANTED-FIXTURE oracle
# (the x25 porter pattern): fixture strings with distinct compression
# behavior get their EXACT zlib (raw, comp, ratio) pinned as SQL
# literals — computed once at registration by the same zlib the
# executors run (one container; heterogeneous-cluster caveat in the
# docstring) — and ONE corpus row carries (n_docs, Σ raw_bytes)
# measured FROM THE UDF OUTPUT, which is SQL-derivable from
# octet_length(text) while forcing the mapInPandas pass over every
# document.  A hash match certifies exact zlib scoring on the fixture
# set plus full-corpus execution with byte-exact length accounting.
_ZLIB_FIXTURES = [
    ("runs", "a" * 400),
    ("alternating", "ab" * 200),
    ("sentence", "the quick brown fox jumps over the lazy dog " * 9),
    ("incompressible", __import__("hashlib").md5(b"x200").hexdigest() * 12),
]


def _x200_sql() -> str:
    import zlib

    rows = []
    for name, text in _ZLIB_FIXTURES:
        raw = len(text.encode("utf-8"))
        comp = len(zlib.compress(text.encode("utf-8"), 6))
        rows.append(
            f"('fx:{name}', CAST(1 AS BIGINT), CAST({raw} AS BIGINT),"
            f" CAST({comp} AS BIGINT), CAST({round(comp / raw, 6)!r}"
            " AS DOUBLE))"
        )
    values = ",\n       ".join(rows)
    return f"""
WITH fix(key, n_docs, raw_bytes, comp_bytes, ratio) AS (VALUES
       {values}),
     corpus AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(strlen(text)) AS BIGINT) AS raw
                FROM documents
                WHERE text IS NOT NULL AND strlen(text) > 0)
SELECT key, n_docs, raw_bytes, comp_bytes, ratio FROM fix
UNION ALL
SELECT 'corpus', n, raw, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE)
FROM corpus
ORDER BY key"""


@register("x200_compression_ratio", _x200_sql())
def x200(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    docs = load_table(spark, sf, "documents").select(
        F.lit(None).cast("string").alias("key"), "text"
    )
    fixtures = local_rows(
        docs.sparkSession,
        [(f"fx:{n}", t) for n, t in _ZLIB_FIXTURES], "key string, text string",
    )
    # single-pass audit (r9 verdict item 6): fixture pins AND the
    # execution-forcing corpus accounting come out of ONE zlib
    # mapInPandas pass — the previous two-branch shape ran it twice
    return textops.compression_ratio_audit(
        docs.unionByName(fixtures), "text", "key"
    ).orderBy("key")


# --------------------------------------------------------------------------
# x201 — calendar-densified daily event series: every missing day
# between corpus min/max materialized as an explicit zero row (the
# spine LOCF/forecast/EWMA consumers need when "no rows" means 0).
_DENSIFY_SQL = """
WITH daily AS (SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(value) AS total
               FROM events GROUP BY 1),
     spine AS (SELECT unnest(generate_series(
                   (SELECT MIN(CAST(ts AS DATE)) FROM events),
                   (SELECT MAX(CAST(ts AS DATE)) FROM events),
                   INTERVAL 1 DAY))::DATE AS d)
SELECT spine.d, COALESCE(daily.n, 0) AS n,
       ROUND(COALESCE(daily.total, 0.0), 6) AS total,
       CAST(CASE WHEN daily.n IS NULL THEN 1 ELSE 0 END AS INT) AS is_gap
FROM spine LEFT JOIN daily ON spine.d = daily.d"""


@register("x201_densify_daily", _DENSIFY_SQL)
def x201(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("ts", "value")
    return events.densify_daily(ev, "ts", "value")


# --------------------------------------------------------------------------
# x202 — weekday revenue envelope: exact lower p25/p50/p75 of daily
# order revenue per ISO weekday — the seasonal band x172's mean indices
# flatten.  Daily revenue is an exact decimal sum (x188's determinism
# rule) so the quantile CELL VALUES are bit-identical across engines.
_QBAND_SQL = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                           AS DOUBLE) AS revenue
               FROM orders GROUP BY 1),
     wd AS (SELECT CAST(isodow(d) AS BIGINT) AS weekday, revenue
            FROM daily),
     cells AS (SELECT weekday, revenue AS v, COUNT(*) AS c
               FROM wd GROUP BY 1, 2),
     cum AS (SELECT weekday, v,
                    SUM(c) OVER (PARTITION BY weekday ORDER BY v) AS cw,
                    SUM(c) OVER (PARTITION BY weekday) AS n
             FROM cells),
     f AS (SELECT weekday, v, cw, n, q.q
           FROM cum CROSS JOIN (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS q) q)
SELECT weekday, q, MIN(v) AS value
FROM f WHERE cw >= CEIL(q * n) GROUP BY weekday, q"""


@register("x202_weekday_quantiles", _QBAND_SQL)
def x202(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders = load_table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    daily = orders.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)"))
        .cast("double")
        .alias("revenue")
    )
    # ISO weekday 1..7 (engine-portable: Spark dayofweek is 1=Sunday)
    wd = daily.select(
        (((F.dayofweek("d") + 5) % 7) + 1).cast("bigint").alias("weekday"),
        "revenue",
    )
    return relational.exact_quantiles_per_group(
        wd, "weekday", "revenue", [0.25, 0.5, 0.75]
    )


# --------------------------------------------------------------------------
# x203 — Chao1 vocabulary-richness estimate: how much unseen vocabulary
# remains (the asymptote x145's Heaps curve grows toward).
_CHAO_SQL = f"""
WITH tok AS (SELECT unnest({_TOK}) AS t FROM documents
             WHERE text IS NOT NULL),
     types AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
     a AS (SELECT CAST(COUNT(*) AS BIGINT) AS v_obs,
                  CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                      AS f1,
                  CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT)
                      AS f2
           FROM types)
SELECT v_obs, f1, f2,
       ROUND(CASE WHEN f2 > 0 THEN v_obs + f1 * f1 / (2.0 * f2) END, 6)
           AS chao1,
       ROUND(v_obs + f1 * (f1 - 1) / (2.0 * (f2 + 1)), 6) AS chao1_bc
FROM a"""


@register("x203_chao1_vocab", _CHAO_SQL)
def x203(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("text")
    return textops.chao1_vocab_estimate(docs, "text")


# --------------------------------------------------------------------------
# x204 — Theil-Sen robust slope of daily order revenue: the median of
# all pairwise day slopes (breakdown 29.3%), the outlier-proof trend
# x122's OLS is not.  Slopes are identical doubles on both engines
# (exact-decimal daily revenue; single-subtraction/division terms), and
# the median is the exact lower median.
_THEIL_SQL = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                           AS DOUBLE) AS v
               FROM orders GROUP BY 1),
     ix AS (SELECT date_diff('day', DATE '1970-01-01', d) AS x, v
            FROM daily),
     pairs AS (SELECT (b.v - a.v) / (b.x - a.x) AS slope
               FROM ix a JOIN ix b ON a.x < b.x),
     cells AS (SELECT slope, COUNT(*) AS c FROM pairs GROUP BY slope),
     cum AS (SELECT slope, SUM(c) OVER (ORDER BY slope) AS cw FROM cells),
     t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs),
     dd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_days FROM daily),
     m AS (SELECT MIN(slope) AS med FROM cum CROSS JOIN t
           WHERE cw * 2 >= n_pairs)
SELECT n_days, n_pairs, ROUND(med, 6) AS slope_per_day
FROM dd CROSS JOIN t CROSS JOIN m"""


@register("x204_theil_sen_trend", _THEIL_SQL)
def x204(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    return events.theil_sen_trend(orders, "o_orderdate", "o_totalprice")


# --------------------------------------------------------------------------
# x205 — dedup savings report: rows/chars reclaimed by the exact and
# normalized-exact tiers — the go/no-go readout before paying for the
# minhash pass (x35).  min_by is portable (Spark 3.3+/DuckDB).
from flashml_spark.operators import dedup  # noqa: E402

_SAVINGS_SQL = """
WITH r AS (SELECT doc_id AS id, CAST(length(text) AS BIGINT) AS len,
                  md5(text) AS h1,
                  md5(lower(regexp_replace(trim(text), '\\s+', ' ', 'g')))
                      AS h2
           FROM documents WHERE text IS NOT NULL),
     g1 AS (SELECT h1, MIN(id) AS keep1, COUNT(*) AS cnt1,
                   MAX(len) AS len1, min_by(h2, id) AS h2k
            FROM r GROUP BY h1),
     t1 AS (SELECT CAST(SUM(cnt1 - 1) AS BIGINT) AS exact_dupes,
                   CAST(SUM((cnt1 - 1) * len1) AS BIGINT)
                       AS exact_chars_saved
            FROM g1),
     g2 AS (SELECT h2k, COUNT(*) AS cnt2, SUM(len1) AS sum2,
                   min_by(len1, keep1) AS keeplen2
            FROM g1 GROUP BY h2k),
     t2 AS (SELECT CAST(SUM(cnt2 - 1) AS BIGINT) AS norm_dupes,
                   CAST(SUM(sum2 - keeplen2) AS BIGINT)
                       AS norm_chars_saved
            FROM g2),
     b AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
                  CAST(SUM(len) AS BIGINT) AS total_chars FROM r)
SELECT n_docs, total_chars, exact_dupes, exact_chars_saved, norm_dupes,
       norm_chars_saved,
       ROUND((exact_dupes + norm_dupes) * 1.0 / n_docs, 6)
           AS pct_rows_saved,
       ROUND((exact_chars_saved + norm_chars_saved) * 1.0 / total_chars, 6)
           AS pct_chars_saved
FROM b CROSS JOIN t1 CROSS JOIN t2"""


@register("x205_dedup_savings", _SAVINGS_SQL)
def x205(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return dedup.dedup_savings_report(docs, "text", "doc_id")


# --------------------------------------------------------------------------
# x206 — per-user time-weighted average event value (TWAP semantics):
# each observation holds until the next, weighted by its duration; the
# plain mean over the same rows rides along so the two columns differ
# exactly by the weighting.
_TWAP_SQL = """
WITH s AS (SELECT user_id, value AS v,
                  LEAD(epoch_us(ts) / 1000000.0) OVER
                      (PARTITION BY user_id ORDER BY ts, event_id)
                  - epoch_us(ts) / 1000000.0 AS dur
           FROM events),
     t AS (SELECT user_id, v, dur FROM s WHERE dur IS NOT NULL)
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_intervals,
       ROUND(SUM(dur), 6) AS span_seconds,
       ROUND(SUM(v * dur) / SUM(dur), 6) AS twap,
       ROUND(AVG(v), 6) AS plain_avg
FROM t GROUP BY user_id"""


@register("x206_time_weighted_avg", _TWAP_SQL)
def x206(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "value"
    )
    return events.time_weighted_average(ev, "user_id", "ts", "event_id", "value")


# --------------------------------------------------------------------------
# x207 — per-customer max drawdown of the running order-revenue total:
# the largest drop from a running peak (values are all-positive here so
# the drawdown is 0 by construction UNLESS returns appear — the oracle
# uses signed value: returned orders subtract).
_DRAWDOWN_SQL = """
WITH s AS (SELECT o_custkey,
                  CASE WHEN o_orderstatus = 'F' THEN o_totalprice
                       ELSE -o_totalprice END AS v,
                  o_orderdate, o_orderkey
           FROM orders),
     c AS (SELECT o_custkey, v, o_orderdate, o_orderkey,
                  SUM(v) OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate, o_orderkey) AS cum
           FROM s),
     p AS (SELECT o_custkey, v, cum,
                  MAX(cum) OVER (PARTITION BY o_custkey
                                 ORDER BY o_orderdate, o_orderkey
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS peak
           FROM c)
SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(v), 6) AS final_total,
       ROUND(MAX(cum), 6) AS peak,
       ROUND(MAX(peak - cum), 6) AS max_drawdown
FROM p GROUP BY o_custkey"""


@register("x207_revenue_drawdown", _DRAWDOWN_SQL)
def x207(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    orders = load_table(spark, sf, "orders").select(
        "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderkey"
    )
    signed = orders.select(
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        F.when(F.col("o_orderstatus") == "F", F.col("o_totalprice"))
        .otherwise(-F.col("o_totalprice"))
        .alias("signed_value"),
    )
    return events.running_peak_drawdown(
        signed, "o_custkey", "o_orderdate", "o_orderkey", "signed_value"
    )


# --------------------------------------------------------------------------
# x208 — cohort LTV curve over events (value as revenue, 60-day
# horizon): mean cumulative revenue per user by account-age day, fixed
# denominator (no survivorship bias).
_LTV_SQL = """
WITH day AS (SELECT user_id, CAST(ts AS DATE) AS d, value FROM events),
     first AS (SELECT user_id, MIN(d) AS f FROM day GROUP BY user_id),
     nu AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_users FROM first),
     per AS (SELECT date_diff('day', f, d) AS day_offset,
                    COUNT(DISTINCT day.user_id) AS n_active,
                    SUM(COALESCE(value, 0.0)) AS rev
             FROM day JOIN first ON day.user_id = first.user_id
             WHERE date_diff('day', f, d) <= 60
             GROUP BY 1),
     c AS (SELECT day_offset, n_active,
                  SUM(rev) OVER (ORDER BY day_offset
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND CURRENT ROW) AS cumrev
           FROM per)
SELECT CAST(day_offset AS BIGINT) AS day_offset,
       CAST(n_active AS BIGINT) AS n_users_active,
       ROUND(cumrev / nu.n_users, 6) AS cum_revenue_per_user
FROM c CROSS JOIN nu"""


@register("x208_ltv_curve", _LTV_SQL)
def x208(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts", "value")
    return events.ltv_curve(ev, "user_id", "ts", "value", max_days=60)


# --------------------------------------------------------------------------
# x209 — weekday-robust daily anomaly: |revenue - weekday median| >
# k * weekday MAD (k=5) — the robust seasonal twin of x188, immune to
# the weekly cycle and to baseline poisoning by the outlier itself.
_WDANOM_SQL = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6)))
                           AS DOUBLE) AS revenue
               FROM orders GROUP BY 1),
     wd AS (SELECT d, CAST(isodow(d) AS BIGINT) AS weekday, revenue
            FROM daily),
     mc AS (SELECT weekday, revenue AS v, COUNT(*) AS c FROM wd
            GROUP BY 1, 2),
     mcum AS (SELECT weekday, v,
                     SUM(c) OVER (PARTITION BY weekday ORDER BY v) AS cw,
                     SUM(c) OVER (PARTITION BY weekday) AS tw
              FROM mc),
     med AS (SELECT weekday, MIN(v) AS wd_median FROM mcum
             WHERE cw * 2 >= tw GROUP BY weekday),
     dev AS (SELECT wd.weekday, wd.d, wd.revenue, med.wd_median,
                    ABS(wd.revenue - med.wd_median) AS ad
             FROM wd JOIN med USING (weekday)),
     ac AS (SELECT weekday, ad AS v, COUNT(*) AS c FROM dev GROUP BY 1, 2),
     acum AS (SELECT weekday, v,
                     SUM(c) OVER (PARTITION BY weekday ORDER BY v) AS cw,
                     SUM(c) OVER (PARTITION BY weekday) AS tw
              FROM ac),
     mad AS (SELECT weekday, MIN(v) AS wd_mad FROM acum
             WHERE cw * 2 >= tw GROUP BY weekday)
SELECT dev.d, dev.weekday, ROUND(dev.revenue, 6) AS revenue,
       ROUND(dev.wd_median, 6) AS wd_median,
       ROUND(mad.wd_mad, 6) AS wd_mad,
       CAST(CASE WHEN mad.wd_mad > 0 AND dev.ad > 5.0 * mad.wd_mad
                 THEN 1 ELSE 0 END AS INT) AS is_anomaly
FROM dev JOIN mad USING (weekday)"""


@register("x209_weekday_anomaly", _WDANOM_SQL)
def x209(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    return events.weekday_adjusted_anomaly(
        orders, "o_orderdate", "o_totalprice", k=5.0
    )


# --------------------------------------------------------------------------
# x210 — order-to-first-ship latency quantiles per order priority:
# operational SLA bands (p25/p50/p75/p95 days), built by REUSING the
# generic exact-quantile operator on an orders-lineitem join — the
# first-ship agg keys on l_orderkey, so it co-partitions with the join.
_SHIPLAT_SQL = """
WITH ship AS (SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
              FROM lineitem GROUP BY l_orderkey),
     lat AS (SELECT o.o_orderpriority,
                    date_diff('day', CAST(o.o_orderdate AS DATE), s.first_ship)
                        AS days
             FROM orders o JOIN ship s ON o.o_orderkey = s.l_orderkey),
     cells AS (SELECT o_orderpriority, days AS v, COUNT(*) AS c
               FROM lat GROUP BY 1, 2),
     cum AS (SELECT o_orderpriority, v,
                    SUM(c) OVER (PARTITION BY o_orderpriority ORDER BY v)
                        AS cw,
                    SUM(c) OVER (PARTITION BY o_orderpriority) AS n
             FROM cells),
     f AS (SELECT o_orderpriority, v, cw, n, q.q
           FROM cum CROSS JOIN
                (SELECT CAST(unnest([0.25, 0.5, 0.75, 0.95]) AS DOUBLE)
                     AS q) q)
SELECT o_orderpriority, q, CAST(MIN(v) AS BIGINT) AS value
FROM f WHERE cw >= CEIL(q * n) GROUP BY o_orderpriority, q"""


@register("x210_ship_latency_bands", _SHIPLAT_SQL)
def x210(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    ship = li.groupBy("l_orderkey").agg(
        F.min(F.col("l_shipdate").cast("date")).alias("__first_ship")
    )
    lat = orders.join(
        ship, orders.o_orderkey == ship.l_orderkey
    ).select(
        "o_orderpriority",
        F.datediff(
            F.col("__first_ship"), F.col("o_orderdate").cast("date")
        ).cast("bigint").alias("days"),
    )
    return relational.exact_quantiles_per_group(
        lat, "o_orderpriority", "days", [0.25, 0.5, 0.75, 0.95]
    )


# --------------------------------------------------------------------------
# x211 — funnel stage-latency quantiles (p25/p50/p75) inside 30-minute
# sessions, weak ordering by earliest event (x48's semantics): WHERE
# the funnel stalls, in exact integer microseconds.
_STAGELAT_SQL = """
WITH s0 AS (
     SELECT user_id, event_id, ts, event_type,
            CASE WHEN lag(ts) OVER w IS NULL
                      OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                         - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                 THEN 1 ELSE 0 END AS new_s
     FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
   s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) - 1
                       AS session_idx
         FROM s0),
   f AS (SELECT user_id, session_idx,
                MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
                MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
         FROM s GROUP BY user_id, session_idx),
   lat AS (
     SELECT 'view->click' AS stage,
            epoch_us(t1) - epoch_us(t0) AS l
     FROM f WHERE t0 IS NOT NULL AND t1 IS NOT NULL
       AND epoch_us(t1) - epoch_us(t0) >= 0
     UNION ALL
     SELECT 'click->purchase' AS stage,
            epoch_us(t2) - epoch_us(t1) AS l
     FROM f WHERE t1 IS NOT NULL AND t2 IS NOT NULL
       AND epoch_us(t2) - epoch_us(t1) >= 0),
   cells AS (SELECT stage, l AS v, COUNT(*) AS c FROM lat GROUP BY 1, 2),
   cum AS (SELECT stage, v,
                  SUM(c) OVER (PARTITION BY stage ORDER BY v) AS cw,
                  SUM(c) OVER (PARTITION BY stage) AS n
           FROM cells),
   ff AS (SELECT stage, v, cw, n, q.q
          FROM cum CROSS JOIN
               (SELECT CAST(unnest([0.25, 0.5, 0.75]) AS DOUBLE) AS q) q)
SELECT stage, q, CAST(MIN(v) AS BIGINT) AS value
FROM ff WHERE cw >= CEIL(q * n) GROUP BY stage, q"""


@register("x211_funnel_latencies", _STAGELAT_SQL)
def x211(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return events.funnel_stage_latencies(
        ev, ("view", "click", "purchase"), quantiles=[0.25, 0.5, 0.75]
    )


# --------------------------------------------------------------------------
# x212 — Pareto revenue concentration: the smallest number of customers
# whose summed order revenue reaches 80 % of the total.  The WHOLE
# chain (per-key totals, cumulative, threshold product) is exact
# decimal arithmetic, so the prefix-boundary row cannot flip across
# engines or across the scale-safe cumulative's association order.
_PARETO_SQL = """
WITH per AS (SELECT o_custkey AS k,
                    SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS v
             FROM orders GROUP BY 1),
     c AS (SELECT v, SUM(v) OVER (ORDER BY v DESC, k ASC) AS cum FROM per),
     t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_keys, SUM(v) AS tot
           FROM per),
     r AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_top
           FROM c CROSS JOIN t
           WHERE cum - v < CAST(0.8 AS DECIMAL(10,6)) * tot)
SELECT n_keys, ROUND(CAST(tot AS DOUBLE), 6) AS total_value, n_top,
       ROUND(n_top * 1.0 / n_keys, 6) AS pct_keys
FROM t CROSS JOIN r"""


@register("x212_pareto_concentration", _PARETO_SQL)
def x212(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    return events.pareto_concentration(
        orders, "o_custkey", "o_totalprice", threshold=0.8
    )


# --------------------------------------------------------------------------
# x213 — order-total VALUE integrity: recompute each order's total from
# its line items (the TPC-H invariant) and report agreement with the
# stored o_totalprice.  The synthetic generator does NOT enforce the
# invariant, so the interesting output is the error distribution — the
# oracle guarantees the numbers, whatever they are.
_TOTCHECK_SQL = """
WITH rec AS (SELECT l_orderkey,
                    CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                                  * (1 + l_tax) AS DECIMAL(28,6)))
                         AS DOUBLE) AS recomputed
             FROM lineitem GROUP BY l_orderkey),
     j AS (SELECT o.o_totalprice AS stored, rec.recomputed
           FROM orders o JOIN rec ON o.o_orderkey = rec.l_orderkey)
SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CASE WHEN ABS(stored - recomputed) <= 0.01
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(SUM(CASE WHEN ABS(stored - recomputed) > 0.01
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
       ROUND(SUM(CASE WHEN ABS(stored - recomputed) <= 0.01
                      THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6) AS match_rate,
       ROUND(MAX(ABS(stored - recomputed)), 6) AS max_abs_err,
       ROUND(AVG(ABS(stored - recomputed)), 6) AS mean_abs_err
FROM j"""


@register("x213_order_total_audit", _TOTCHECK_SQL)
def x213(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_totalprice")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_tax"
    )
    return relational.order_total_consistency_audit(orders, li, tolerance=0.01)


# --------------------------------------------------------------------------
# x214 — cross-source exact-duplicate matrix over documents: which
# sources mirror which (within-source duplication is x01/x205's job).
_XSRC_SQL = """
WITH ds AS (SELECT DISTINCT md5(text) AS h, source AS s FROM documents
            WHERE text IS NOT NULL),
     tot AS (SELECT s, COUNT(*) AS n FROM ds GROUP BY s),
     p AS (SELECT a.s AS source_a, b.s AS source_b, COUNT(*) AS n_shared
           FROM ds a JOIN ds b ON a.h = b.h AND a.s < b.s
           GROUP BY 1, 2)
SELECT p.source_a, p.source_b, CAST(p.n_shared AS BIGINT) AS n_shared,
       ROUND(p.n_shared * 1.0 / ta.n, 6) AS share_of_a,
       ROUND(p.n_shared * 1.0 / tb.n, 6) AS share_of_b
FROM p JOIN tot ta ON ta.s = p.source_a
       JOIN tot tb ON tb.s = p.source_b"""


@register("x214_cross_source_dups", _XSRC_SQL)
def x214(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text", "source")
    return dedup.cross_source_duplication(docs, "text", "doc_id", "source")


# --------------------------------------------------------------------------
# x215 — sequential A/B z-curve (the peeking trace): the x196 statistic
# recomputed at every day boundary over cumulative first-entries /
# first-conversions per variant (user_id parity, purchase conversion).
_ZCURVE_SQL = """
WITH pu AS (SELECT user_id,
                   MAX(CAST(user_id % 2 AS INT)) AS variant,
                   MIN(CAST(ts AS DATE)) AS first_d,
                   MIN(CASE WHEN event_type = 'purchase'
                            THEN CAST(ts AS DATE) END) AS conv_d
            FROM events GROUP BY user_id),
     e AS (SELECT first_d AS d,
                  SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS ea,
                  SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS eb
           FROM pu GROUP BY first_d),
     c AS (SELECT conv_d AS d,
                  SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS ca,
                  SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS cb
           FROM pu WHERE conv_d IS NOT NULL GROUP BY conv_d),
     daily AS (SELECT COALESCE(e.d, c.d) AS d,
                      COALESCE(ea, 0) AS ea, COALESCE(eb, 0) AS eb,
                      COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
               FROM e FULL OUTER JOIN c ON e.d = c.d),
     cum AS (SELECT d,
                    CAST(SUM(ea) OVER w AS BIGINT) AS n_a,
                    CAST(SUM(ca) OVER w AS BIGINT) AS conv_a,
                    CAST(SUM(eb) OVER w AS BIGINT) AS n_b,
                    CAST(SUM(cb) OVER w AS BIGINT) AS conv_b
             FROM daily
             WINDOW w AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                          AND CURRENT ROW)),
     f AS (SELECT *, conv_a * 1.0 / n_a AS pa, conv_b * 1.0 / n_b AS pb,
                  (conv_a + conv_b) * 1.0 / (n_a + n_b) AS pp
           FROM cum),
     g AS (SELECT *, sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)) AS se
           FROM f)
SELECT d, n_a, conv_a, n_b, conv_b,
       ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
                  THEN (pa - pb) / se ELSE 0.0 END, 6) AS z
FROM g"""


@register("x215_ab_zcurve", _ZCURVE_SQL)
def x215(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import functions as F

    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_type")
    return events.ab_ztest_curve(
        ev,
        "user_id",
        "ts",
        (F.col("user_id") % 2).cast("int"),
        F.col("event_type") == "purchase",
    )


# --------------------------------------------------------------------------
# x216 — 10x10 joint histogram of lineitem quantity x extendedprice:
# the heat-grid readout; top edges fold into the last cell.
_H2D_SQL = """
WITH b AS (SELECT CAST(MIN(l_quantity) AS DOUBLE) AS xmin,
                  CAST(MAX(l_quantity) AS DOUBLE) AS xmax,
                  CAST(MIN(l_extendedprice) AS DOUBLE) AS ymin,
                  CAST(MAX(l_extendedprice) AS DOUBLE) AS ymax
           FROM lineitem),
     j AS (SELECT l_quantity AS x, l_extendedprice AS y, b.*
           FROM lineitem CROSS JOIN b
           WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
     cells AS (SELECT
         CASE WHEN (xmax - xmin) / 10 > 0
              THEN CAST(LEAST(FLOOR((CAST(x AS DOUBLE) - xmin)
                                    / ((xmax - xmin) / 10)), 9) AS BIGINT)
              ELSE 0 END AS bx,
         CASE WHEN (ymax - ymin) / 10 > 0
              THEN CAST(LEAST(FLOOR((CAST(y AS DOUBLE) - ymin)
                                    / ((ymax - ymin) / 10)), 9) AS BIGINT)
              ELSE 0 END AS by,
         xmin, ymin, xmax - xmin AS xspan, ymax - ymin AS yspan
       FROM j)
SELECT bx, by, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(MIN(xmin) + bx * MIN(xspan) / 10, 6) AS x_lo,
       ROUND(MIN(ymin) + by * MIN(yspan) / 10, 6) AS y_lo
FROM cells GROUP BY bx, by"""


@register("x216_price_qty_histogram", _H2D_SQL)
def x216(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_quantity", "l_extendedprice")
    return relational.histogram_2d(li, "l_quantity", "l_extendedprice", bins=10)


# --------------------------------------------------------------------------
# x217 — embedding pairwise-distance profile over deterministic
# id-stride pairs: collapse/anisotropy audit without sampling
# randomness (strides 1/7/101 guard id-locality artifacts).
from flashml_spark.operators import similarity  # noqa: E402

_PDIST_SQL = """
WITH base AS (SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings),
     pairs AS (
        SELECT s.stride, a.v AS va, b.v AS vb
        FROM (SELECT unnest([1, 7, 101]) AS stride) s
        JOIN base a ON TRUE
        JOIN base b ON b.id = a.id + s.stride),
     c AS (SELECT stride,
                  list_dot_product(va, vb)
                  / (sqrt(list_dot_product(va, va))
                     * sqrt(list_dot_product(vb, vb))) AS cos
           FROM pairs),
     bnd AS (SELECT CAST(stride AS BIGINT) AS stride,
                    CAST(LEAST(FLOOR((cos + 1.0) / 2.0 * 20), 19) AS BIGINT)
                        AS bin
             FROM c WHERE cos IS NOT NULL)
SELECT stride, bin, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(bin * 2.0 / 20 - 1.0, 6) AS cos_lo
FROM bnd GROUP BY stride, bin"""


@register("x217_embedding_distance_profile", _PDIST_SQL)
def x217(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return similarity.pairwise_distance_profile(
        emb, "embedding", "vec_id", strides=(1, 7, 101), bins=20
    )


# --------------------------------------------------------------------------
# x218 — duplicate rate per log2 length bin: does short text duplicate
# more?  The stratification check before a length-blind dedup pass.
_DUPLEN_SQL = """
WITH r AS (SELECT md5(text) AS h,
                  CAST(FLOOR(log2(length(text))) AS BIGINT) AS len_bin
           FROM documents WHERE text IS NOT NULL AND length(text) > 0),
     c AS (SELECT h, COUNT(*) AS cnt FROM r GROUP BY h),
     j AS (SELECT r.len_bin, c.cnt FROM r JOIN c ON r.h = c.h)
SELECT len_bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_dup_docs,
       ROUND(SUM(CASE WHEN cnt > 1 THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
           AS dup_rate,
       CAST(POWER(2.0, len_bin) AS BIGINT) AS chars_lo
FROM j GROUP BY len_bin"""


@register("x218_dup_rate_by_length", _DUPLEN_SQL)
def x218(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return dedup.duplication_by_length(docs, "text", "doc_id")
