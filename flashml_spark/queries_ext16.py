"""Extension queries x219+ — round-6 additions.

Families: deterministic sketches (HLL cardinality audit), collocation
statistics (Dunning G²), model-quality tables (cumulative gains /
decile lift, exact isotonic calibration), probabilistic record linkage
(Fellegi-Sunter), corpus quality rule screens (Gopher-style), data
mixing (DSIR importance weights), and multiple-testing control
(Benjamini-Hochberg).  Every query keeps the repo's oracle discipline:
deterministic md5-derived randomness, Python-computed shared float
literals, no engine-specific approximations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import sketches
from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table

_TOK = "string_split_regex(lower(trim(text)), '\\s+')"


# --------------------------------------------------------------------------
# x219 — HyperLogLog distinct-token estimate per source, next to the
# exact count: the sketch-accuracy audit a pipeline runs before trusting
# approximate cardinalities at 100 TB (where exact count_distinct of
# tokens is a full shuffle but the 256-register sketch is a broadcastable
# few KB per group).  The sketch is md5-deterministic, so the DuckDB
# oracle replays the ESTIMATE itself bit-for-bit — not just the exact
# side.
_HLL_SQL = f"""
WITH toks AS (SELECT DISTINCT source,
                     UNNEST({_TOK}) AS token
              FROM documents WHERE text IS NOT NULL),
     h AS (SELECT source, token,
                  CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS hv
           FROM toks),
     r AS (SELECT source, hv % 256 AS reg, hv // 256 AS w FROM h),
     mr AS (SELECT source, reg,
                   MAX(CASE WHEN w = 0 THEN 53
                            ELSE 53 - LENGTH(bin(w)) END) AS mr
            FROM r GROUP BY source, reg),
     raw AS (SELECT source,
                    CAST({sketches.HLL_ALPHA!r} AS DOUBLE) * 65536.0
                    / (SUM(POWER(2.0, -mr)) + (256 - COUNT(*))) AS raw,
                    CAST(256 - COUNT(*) AS DOUBLE) AS v
             FROM mr GROUP BY source),
     est AS (SELECT source,
                    CASE WHEN raw <= 640.0 AND v > 0
                         THEN 256.0 * LN(256.0 / v) ELSE raw END AS hll
             FROM raw),
     ex AS (SELECT source, CAST(COUNT(DISTINCT token) AS BIGINT) AS n_exact
            FROM toks GROUP BY source)
SELECT ex.source, ex.n_exact, ROUND(est.hll, 6) AS hll_estimate,
       ROUND(ABS(est.hll - ex.n_exact) / ex.n_exact, 6) AS rel_error
FROM ex JOIN est ON est.source = ex.source
ORDER BY ex.source"""


@register("x219_hll_distinct", _HLL_SQL)
def x219(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "source", F.explode(H.tokens(F.col("text"))).alias("token")
    )
    return sketches.hll_distinct(toks, "source", "token").orderBy("source")


# --------------------------------------------------------------------------
# x220 — collocation detection via Dunning's G² log-likelihood ratio on
# corpus word bigrams (Dunning 1993): the statistically-sound collocation
# ranking (PMI over-ranks rare pairs; G² weighs evidence by support).
# Complements x88's PMI pairs with the significance-tested variant.
_G2_SQL = f"""
WITH tok AS (SELECT {_TOK} AS ts FROM documents WHERE text IS NOT NULL),
     bg AS (SELECT ts[i] AS wa, ts[i + 1] AS wb
            FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r),
     p AS (SELECT wa, wb, CAST(COUNT(*) AS BIGINT) AS k11
           FROM bg GROUP BY wa, wb),
     l AS (SELECT wa, SUM(k11) AS ra FROM p GROUP BY wa),
     rr AS (SELECT wb, SUM(k11) AS cb FROM p GROUP BY wb),
     nt AS (SELECT SUM(k11) AS n FROM p),
     j AS (SELECT p.wa, p.wb, p.k11, l.ra, rr.cb,
                  CAST(nt.n AS DOUBLE) AS n,
                  p.k11 AS a11, l.ra - p.k11 AS a12, rr.cb - p.k11 AS a21,
                  nt.n - l.ra - rr.cb + p.k11 AS a22
           FROM p JOIN l ON l.wa = p.wa
                  JOIN rr ON rr.wb = p.wb, nt),
     g AS (SELECT wa, wb, k11,
                  2.0 * (
                    (CASE WHEN a11 > 0 THEN a11 * LN(a11 / (ra * cb / n)) ELSE 0.0 END)
                  + (CASE WHEN a12 > 0 THEN a12 * LN(a12 / (ra * (n - cb) / n)) ELSE 0.0 END)
                  + (CASE WHEN a21 > 0 THEN a21 * LN(a21 / ((n - ra) * cb / n)) ELSE 0.0 END)
                  + (CASE WHEN a22 > 0 THEN a22 * LN(a22 / ((n - ra) * (n - cb) / n)) ELSE 0.0 END)
                  ) AS g2
           FROM j)
SELECT wa AS word_a, wb AS word_b, k11 AS n_pair, ROUND(g2, 6) AS g2
FROM g WHERE k11 >= 3
ORDER BY g2 DESC, word_a ASC, word_b ASC LIMIT 15"""


@register("x220_collocations_g2", _G2_SQL)
def x220(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.collocations_g2(docs, "text", top_k=15, min_count=3)


# --------------------------------------------------------------------------
# x221 — cumulative gains / decile lift table: the campaign-targeting
# readout (top-decile capture, per-decile lift over base rate) for a
# scored population.  Scores/labels are hash-derived exactly as in
# x169's calibration construction (score = md5-uniform; label drawn
# with probability = score from an independent hash), so the table is
# well-behaved by construction and fully deterministic cross-engine.
_GAINS_SQL = """
WITH s AS (SELECT o_orderkey,
                  (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967296.0 AS score,
                  (CAST(('0x' || substr(md5('lbl:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967296.0 AS u2
           FROM orders),
     lab AS (SELECT o_orderkey, score,
                    CASE WHEN u2 < score THEN 1.0 ELSE 0.0 END AS y FROM s),
     t AS (SELECT o_orderkey, y,
                  ntile(10) OVER (ORDER BY -score, o_orderkey) AS bucket
           FROM lab),
     per AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(y) AS BIGINT) AS n_pos
             FROM t GROUP BY bucket),
     cum AS (SELECT bucket, n, n_pos,
                    SUM(n_pos) OVER (ORDER BY bucket
                                     ROWS UNBOUNDED PRECEDING) AS cum_pos
             FROM per),
     tot AS (SELECT CAST(SUM(n_pos) AS DOUBLE) AS tp,
                    CAST(SUM(n) AS DOUBLE) AS tn FROM per)
SELECT bucket, n, n_pos, CAST(cum_pos AS BIGINT) AS cum_pos,
       ROUND(cum_pos / tot.tp, 6) AS gain,
       ROUND((n_pos / CAST(n AS DOUBLE)) / (tot.tp / tot.tn), 6) AS lift
FROM cum, tot ORDER BY bucket"""


@register("x221_cumulative_gains", _GAINS_SQL)
def x221(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H
    from flashml_spark.metrics.binary import cumulative_gains

    o = load_table(spark, sf, "orders").select("o_orderkey")
    scored = o.select(
        "o_orderkey",
        H.md5_uniform(F.col("o_orderkey")).alias("score"),
        (
            H.md5_uniform(F.concat(F.lit("lbl:"), F.col("o_orderkey")))
            < H.md5_uniform(F.col("o_orderkey"))
        ).cast("double").alias("y"),
    )
    return cumulative_gains(scored, "score", "y", "o_orderkey", n_buckets=10)


# --------------------------------------------------------------------------
# x222 — Fellegi-Sunter probabilistic record linkage calibration table.
# A deterministic noisy-duplicate view of customer (md5-perturbed segment
# and balance) is linked back to the original by blocking on
# (nation, balance-band); each candidate pair scores log(m/u) /
# log((1-m)/(1-u)) field weights (Python-computed literals shared with
# the oracle), and the integer weight-band histogram reports the
# true-match rate per band — the table that picks linkage thresholds.
# Blocking recall loss (perturbed balances that cross a band edge) is the
# documented, measured trade: candidate generation stays |block|²-bounded.
import math as _math  # noqa: E402

_FS_M_SEG, _FS_U_SEG = 0.8, 0.2
_FS_M_BAL, _FS_U_BAL = 0.7, 0.02
_FS_W = {
    "seg_a": _math.log(_FS_M_SEG / _FS_U_SEG),
    "seg_d": _math.log((1 - _FS_M_SEG) / (1 - _FS_U_SEG)),
    "bal_a": _math.log(_FS_M_BAL / _FS_U_BAL),
    "bal_d": _math.log((1 - _FS_M_BAL) / (1 - _FS_U_BAL)),
}

_FS_SQL = f"""
WITH b AS (SELECT c_custkey, c_nationkey,
                  CASE WHEN (CAST(('0x' || substr(md5('seg:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                             AS BIGINT) + 1.0) / 4294967296.0 < 0.2
                       THEN 'PERTURBED' ELSE c_mktsegment END AS b_seg,
                  c_acctbal + CASE WHEN (CAST(('0x' || substr(md5('bal:' || CAST(c_custkey AS VARCHAR)), 1, 8))
                             AS BIGINT) + 1.0) / 4294967296.0 < 0.3
                       THEN 500.0 ELSE 0.0 END AS b_bal
           FROM customer),
     cand AS (SELECT a.c_custkey AS ka, b.c_custkey AS kb,
                     a.c_mktsegment = b.b_seg AS agree_seg,
                     ABS(a.c_acctbal - b.b_bal) < 100.0 AS agree_bal,
                     a.c_custkey = b.c_custkey AS is_match
              FROM customer a JOIN b
                ON a.c_nationkey = b.c_nationkey
               AND CAST(floor(a.c_acctbal / 2000.0) AS BIGINT)
                   = CAST(floor(b.b_bal / 2000.0) AS BIGINT)),
     w AS (SELECT is_match,
                  (CASE WHEN agree_seg THEN CAST({_FS_W["seg_a"]!r} AS DOUBLE)
                        ELSE CAST({_FS_W["seg_d"]!r} AS DOUBLE) END)
                + (CASE WHEN agree_bal THEN CAST({_FS_W["bal_a"]!r} AS DOUBLE)
                        ELSE CAST({_FS_W["bal_d"]!r} AS DOUBLE) END) AS wt
           FROM cand)
SELECT CAST(floor(wt) AS BIGINT) AS band,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN is_match THEN 1 ELSE 0 END) AS BIGINT) AS n_match,
       ROUND(SUM(CASE WHEN is_match THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS match_rate
FROM w GROUP BY band ORDER BY band"""


@register("x222_record_linkage_fs", _FS_SQL)
def x222(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H
    from flashml_spark.operators import dedup

    cust = load_table(spark, sf, "customer")
    b = cust.select(
        F.col("c_custkey").alias("kb"),
        F.col("c_nationkey").alias("nb"),
        F.when(
            H.md5_uniform(F.concat(F.lit("seg:"), F.col("c_custkey"))) < 0.2,
            F.lit("PERTURBED"),
        ).otherwise(F.col("c_mktsegment")).alias("b_seg"),
        (
            F.col("c_acctbal")
            + F.when(
                H.md5_uniform(F.concat(F.lit("bal:"), F.col("c_custkey"))) < 0.3,
                F.lit(500.0),
            ).otherwise(F.lit(0.0))
        ).alias("b_bal"),
    )
    pairs = cust.join(
        b,
        (F.col("c_nationkey") == F.col("nb"))
        & (
            F.floor(F.col("c_acctbal") / 2000.0).cast("bigint")
            == F.floor(F.col("b_bal") / 2000.0).cast("bigint")
        ),
    ).select(
        (F.col("c_mktsegment") == F.col("b_seg")).alias("agree_seg"),
        (F.abs(F.col("c_acctbal") - F.col("b_bal")) < 100.0).alias("agree_bal"),
        (F.col("c_custkey") == F.col("kb")).alias("is_match"),
    )
    return dedup.fs_weight_bands(
        pairs,
        [
            ("agree_seg", _FS_M_SEG, _FS_U_SEG),
            ("agree_bal", _FS_M_BAL, _FS_U_BAL),
        ],
        "is_match",
    )


# --------------------------------------------------------------------------
# x223 — Gopher quality rule screen per source (Rae et al. 2021 table A1
# subset): per-rule violation counts BEFORE any document is dropped —
# the triage readout complementing x46's keep/drop filter.  All measures
# are token-array HOF expressions (one pass, no explode).
_STOPLIST_SQL = "['the', 'be', 'to', 'of', 'and', 'that', 'have', 'with']"
_GOPHER_SQL = f"""
WITH t AS (SELECT source, {_TOK} AS ts FROM documents WHERE text IS NOT NULL),
     m AS (SELECT source, len(ts) AS n,
                  list_sum(list_transform(ts, x -> length(x)))
                    / CAST(len(ts) AS DOUBLE) AS mean_wl,
                  len(list_filter(ts, x -> regexp_matches(x, '[a-z]')))
                    / CAST(len(ts) AS DOUBLE) AS alpha_frac,
                  len(list_filter(ts, x -> list_contains({_STOPLIST_SQL}, x)))
                    / CAST(len(ts) AS DOUBLE) AS stop_frac
           FROM t),
     v AS (SELECT source,
                  CASE WHEN n < 50 OR n > 100000 THEN 1 ELSE 0 END AS v_wordcount,
                  CASE WHEN mean_wl < 3.0 OR mean_wl > 10.0 THEN 1 ELSE 0 END AS v_wordlen,
                  CASE WHEN alpha_frac < 0.8 THEN 1 ELSE 0 END AS v_alpha,
                  CASE WHEN stop_frac < 0.06 THEN 1 ELSE 0 END AS v_stop
           FROM m),
     w AS (SELECT *, CASE WHEN v_wordcount + v_wordlen + v_alpha + v_stop > 0
                          THEN 1 ELSE 0 END AS v_any FROM v)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(v_wordcount) AS BIGINT) AS v_wordcount,
       CAST(SUM(v_wordlen) AS BIGINT) AS v_wordlen,
       CAST(SUM(v_alpha) AS BIGINT) AS v_alpha,
       CAST(SUM(v_stop) AS BIGINT) AS v_stop,
       CAST(SUM(v_any) AS BIGINT) AS v_any,
       ROUND(1.0 - SUM(v_any) / CAST(COUNT(*) AS DOUBLE), 6) AS pass_rate
FROM w GROUP BY source ORDER BY source"""


@register("x223_gopher_rules", _GOPHER_SQL)
def x223(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.gopher_quality_rules(docs, "text", "source")


# --------------------------------------------------------------------------
# x224 — DSIR importance weights (Xie et al. 2023): score every doc by
# hashed-bigram target-likeness (target = the 'en' slice) and report the
# per-source mixture readout.  Hashed features keep the profile frame at
# a fixed 1024 rows regardless of corpus size — the broadcastable-profile
# property that makes importance resampling feasible at 100 TB.
_DSIR_SQL = f"""
WITH tok AS (SELECT doc_id, source, lang = 'en' AS is_t, {_TOK} AS ts
             FROM documents WHERE text IS NOT NULL),
     g AS (SELECT doc_id, source, is_t,
                  CAST(('0x' || substr(md5(ts[i] || ' ' || ts[i + 1]), 1, 8))
                       AS BIGINT) % 1024 AS b
           FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r),
     db AS (SELECT doc_id, source, b, CAST(COUNT(*) AS BIGINT) AS c
            FROM g GROUP BY doc_id, source, b),
     raw AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS cr FROM g GROUP BY b),
     tgt AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS ct
             FROM g WHERE is_t GROUP BY b),
     nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g),
     nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM g WHERE is_t),
     prof AS (SELECT raw.b,
                     LN(((COALESCE(tgt.ct, 0) + 1.0) / (nt.n + 1024.0))
                        / ((raw.cr + 1.0) / (nr.n + 1024.0))) AS lr
              FROM raw LEFT JOIN tgt ON tgt.b = raw.b, nr, nt),
     dw AS (SELECT db.doc_id, db.source, SUM(db.c * prof.lr) AS w
            FROM db JOIN prof ON prof.b = db.b
            GROUP BY db.doc_id, db.source)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(AVG(w), 6) AS mean_log_weight,
       ROUND(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS pos_share
FROM dw GROUP BY source ORDER BY source"""


@register("x224_dsir_weights", _DSIR_SQL)
def x224(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents").withColumn(
        "is_target", F.col("lang") == "en"
    )
    return textops.dsir_importance(
        docs, "text", "doc_id", "source", "is_target", n_buckets=1024
    )


# --------------------------------------------------------------------------
# x225 — per-nation A/B z-tests with Benjamini-Hochberg FDR control:
# 25 simultaneous two-proportion tests (arms = custkey parity,
# conversion = customer has a finalized order) and the step-up rule that
# says which nation-level "movements" survive multiple-testing control
# at q = 0.1.  p-values come from the shared A&S 26.2.17 polynomial
# (relational.normal_sf / normal_sf_sql — identical literal arithmetic
# in both engines), counts stay integers until the final divisions.
from flashml_spark.operators import relational as _rel  # noqa: E402

_BH_Q = 0.1
_ZN = "(CASE WHEN se > 0 THEN ABS(pa - pb) / se ELSE 0.0 END)"
_BH_SQL = f"""
WITH conv AS (SELECT c.c_custkey, c.c_nationkey,
                     CAST(c.c_custkey % 2 AS INT) AS variant,
                     MAX(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END)
                         AS conv
              FROM customer c LEFT JOIN orders o ON o.o_custkey = c.c_custkey
              GROUP BY c.c_custkey, c.c_nationkey),
     agg AS (SELECT c_nationkey,
        CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(SUM(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_a,
        CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(SUM(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END) AS BIGINT) AS conv_b
      FROM conv GROUP BY c_nationkey),
     d AS (SELECT *, conv_a * 1.0 / n_a AS pa, conv_b * 1.0 / n_b AS pb,
                  (conv_a + conv_b) * 1.0 / (n_a + n_b) AS pp
           FROM agg WHERE n_a > 0 AND n_b > 0),
     e AS (SELECT *, sqrt(pp * (1 - pp) * (1.0 / n_a + 1.0 / n_b)) AS se
           FROM d),
     pv AS (SELECT n.n_name,
                   CASE WHEN se > 0 THEN (pa - pb) / se ELSE 0.0 END AS z,
                   CASE WHEN se > 0
                        THEN 2.0 * {_rel.normal_sf_sql("(" + _ZN + ")")}
                        ELSE 1.0 END AS p
            FROM e JOIN nation n ON n.n_nationkey = e.c_nationkey),
     rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY p ASC, n_name ASC) AS rank,
                   (SELECT CAST(COUNT(*) AS DOUBLE) FROM pv) AS m
            FROM pv),
     k AS (SELECT MAX(rank) AS kmax FROM rk
           WHERE p <= rank / m * CAST({_BH_Q!r} AS DOUBLE))
SELECT n_name, ROUND(z, 6) AS z, ROUND(p, 6) AS p,
       CAST(rank AS BIGINT) AS rank,
       ROUND(rank / m * CAST({_BH_Q!r} AS DOUBLE), 6) AS bh_threshold,
       CAST(CASE WHEN rank <= COALESCE((SELECT kmax FROM k), 0)
                 THEN 1 ELSE 0 END AS INT) AS discovered
FROM rk ORDER BY rank"""


@register("x225_bh_fdr", _BH_SQL)
def x225(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf, "orders").select("o_custkey", "o_orderstatus")
    nation = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    conv = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(
            F.max(
                F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)
            ).alias("conv")
        )
        .withColumn("variant", (F.col("c_custkey") % 2).cast("int"))
    )
    agg = conv.groupBy("c_nationkey").agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0)).cast("bigint").alias("n_a"),
        F.sum(F.when((F.col("variant") == 0) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint").alias("conv_a"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0)).cast("bigint").alias("n_b"),
        F.sum(F.when((F.col("variant") == 1) & (F.col("conv") == 1), 1).otherwise(0))
        .cast("bigint").alias("conv_b"),
    ).where((F.col("n_a") > 0) & (F.col("n_b") > 0))
    d = agg.select(
        "*",
        (F.col("conv_a") * 1.0 / F.col("n_a")).alias("pa"),
        (F.col("conv_b") * 1.0 / F.col("n_b")).alias("pb"),
        ((F.col("conv_a") + F.col("conv_b")) * 1.0
         / (F.col("n_a") + F.col("n_b"))).alias("pp"),
    )
    e = d.withColumn(
        "se",
        F.sqrt(
            F.col("pp") * (1 - F.col("pp"))
            * (1.0 / F.col("n_a") + 1.0 / F.col("n_b"))
        ),
    )
    z = F.when(F.col("se") > 0, (F.col("pa") - F.col("pb")) / F.col("se")).otherwise(
        F.lit(0.0)
    )
    pv = (
        e.join(F.broadcast(nation), nation["n_nationkey"] == e["c_nationkey"])
        .select(
            "n_name",
            z.alias("z"),
            F.when(
                F.col("se") > 0, 2.0 * _rel.normal_sf(F.abs(z))
            ).otherwise(F.lit(1.0)).alias("p"),
        )
    )
    out = _rel.bh_fdr(pv, "n_name", "p", q=_BH_Q)
    return out.select(
        "n_name", F.round("z", 6).alias("z"), F.round("p", 6).alias("p"),
        "rank", "bh_threshold", "discovered",
    ).orderBy("rank")


# --------------------------------------------------------------------------
# x226 — EXACT isotonic score calibration via the minimax closed form of
# the PAV solution (Barlow et al. 1972): g(i) = max_{j<=i} min_{k>=i}
# wavg(rate[j..k]) on the 20-bin frame.  No iterative fitting, no
# driver state; label sums stay integers to the final division, so the
# whole fit — not just the inputs — replays bit-for-bit in DuckDB
# (pyspark.ml.IsotonicRegression could not be oracle-checked).  Scores
# and labels are x169's hash-derived construction.
_ISO_SQL = """
WITH s AS (SELECT o_orderkey,
                  (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967296.0 AS score,
                  (CAST(('0x' || substr(md5('lbl:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967296.0 AS u2
           FROM orders),
     lab AS (SELECT score,
                    CASE WHEN u2 < score THEN 1 ELSE 0 END AS y FROM s),
     bins AS (SELECT GREATEST(0, LEAST(CAST(floor(score * 20) AS INT), 19)) AS bucket,
                     CAST(COUNT(*) AS BIGINT) AS n, SUM(score) AS sum_s,
                     CAST(SUM(y) AS BIGINT) AS sum_y
              FROM lab GROUP BY bucket),
     pre AS (SELECT *, SUM(n) OVER (ORDER BY bucket) AS cn,
                    SUM(sum_y) OVER (ORDER BY bucket) AS cy
             FROM bins),
     jj AS (SELECT bucket AS j, cn - n AS cn_before, cy - sum_y AS cy_before
            FROM pre),
     kk AS (SELECT bucket AS k, cn AS cn_k, cy AS cy_k FROM pre),
     iv AS (SELECT j, k, (cy_k - cy_before)
                          / CAST(cn_k - cn_before AS DOUBLE) AS a
            FROM jj JOIN kk ON j <= k),
     mn AS (SELECT b.bucket AS i, iv.j, MIN(iv.a) AS mn
            FROM bins b JOIN iv ON iv.j <= b.bucket AND iv.k >= b.bucket
            GROUP BY b.bucket, iv.j),
     g AS (SELECT i, MAX(mn) AS iso FROM mn GROUP BY i)
SELECT bins.bucket, bins.n,
       ROUND(bins.sum_s / CAST(bins.n AS DOUBLE), 6) AS mean_score,
       ROUND(bins.sum_y / CAST(bins.n AS DOUBLE), 6) AS raw_rate,
       ROUND(g.iso, 6) AS iso_rate
FROM bins JOIN g ON g.i = bins.bucket ORDER BY bins.bucket"""


@register("x226_isotonic_calibration", _ISO_SQL)
def x226(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H
    from flashml_spark.metrics.binary import isotonic_calibration

    o = load_table(spark, sf, "orders").select("o_orderkey")
    scored = o.select(
        H.md5_uniform(F.col("o_orderkey")).alias("score"),
        (
            H.md5_uniform(F.concat(F.lit("lbl:"), F.col("o_orderkey")))
            < H.md5_uniform(F.col("o_orderkey"))
        ).cast("long").alias("y"),
    )
    return isotonic_calibration(scored, "score", "y", n_bins=20)


# --------------------------------------------------------------------------
# x227 — TTL dedup with FIRST-occurrence-anchored horizon (the batch
# twin of streaming dropDuplicatesWithinWatermark, added per the r5
# verdict): unlike x157's refreshing horizon, duplicates do NOT extend
# the window, so a retry chain longer than the horizon re-emits.  The
# Spark side is a JVM-side aggregate fold per key; the oracle expresses
# the same anchor recursion as a recursive CTE stepping through each
# key's rows in (ts, event_id) order — the per-key sequential semantics
# is the SAME recursion in both engines.
_TTL_ANCHOR_SQL = """
WITH RECURSIVE k AS (
    SELECT event_id, event_type, epoch_us(ts) AS us,
           md5(CAST(user_id AS VARCHAR) || '|' || event_type
               || '|' || COALESCE(props, '')) AS h,
           ROW_NUMBER() OVER (PARTITION BY md5(CAST(user_id AS VARCHAR)
               || '|' || event_type || '|' || COALESCE(props, ''))
               ORDER BY ts, event_id) AS rn
    FROM events),
  r AS (
    SELECT h, rn, us, event_type, us AS anchor, 0 AS is_dup
    FROM k WHERE rn = 1
    UNION ALL
    SELECT k.h, k.rn, k.us, k.event_type,
           CASE WHEN k.us - r.anchor > 3600000000 THEN k.us
                ELSE r.anchor END AS anchor,
           CASE WHEN k.us - r.anchor <= 3600000000 THEN 1 ELSE 0 END AS is_dup
    FROM r JOIN k ON k.h = r.h AND k.rn = r.rn + 1)
SELECT event_type,
       CAST(SUM(is_dup) AS BIGINT) AS dropped,
       CAST(SUM(1 - is_dup) AS BIGINT) AS kept
FROM r GROUP BY event_type ORDER BY event_type"""


@register("x227_ttl_dedup_anchored", _TTL_ANCHOR_SQL)
def x227(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "ts", "props"
    )
    flagged = dedup.ttl_dedup_flags(
        ev, ["user_id", "event_type", "props"], "ts", "event_id",
        horizon_seconds=3600, anchor="first",
    )
    return (
        flagged.groupBy("event_type")
        .agg(
            F.sum("is_dup").cast("bigint").alias("dropped"),
            F.sum(1 - F.col("is_dup")).cast("bigint").alias("kept"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# x228 — HLL merge-associativity audit: estimate global distinct tokens
# directly AND by merging the per-source register frames
# (groupBy(reg).max(mr)); max is associative, so the two estimates agree
# bit-for-bit — the property that lets a 100 TB pipeline sketch per
# shard/day/source and combine later without re-touching data.  The
# oracle replays both paths and the equality check.
_HLL_MERGE_SQL = f"""
WITH toks AS (SELECT DISTINCT source, UNNEST({_TOK}) AS token
              FROM documents WHERE text IS NOT NULL),
     h AS (SELECT source, token,
                  CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS hv
           FROM toks),
     r AS (SELECT source, hv % 256 AS reg, hv // 256 AS w FROM h),
     pg AS (SELECT source, reg,
                   MAX(CASE WHEN w = 0 THEN 53
                            ELSE 53 - LENGTH(bin(w)) END) AS mr
            FROM r GROUP BY source, reg),
     mg AS (SELECT reg, MAX(mr) AS mr FROM pg GROUP BY reg),
     dg AS (SELECT reg, MAX(CASE WHEN w = 0 THEN 53
                                 ELSE 53 - LENGTH(bin(w)) END) AS mr
            FROM r GROUP BY reg),
     est_m AS (SELECT CAST({sketches.HLL_ALPHA!r} AS DOUBLE) * 65536.0
                      / (SUM(POWER(2.0, -mr)) + (256 - COUNT(*))) AS raw,
                      CAST(256 - COUNT(*) AS DOUBLE) AS v FROM mg),
     est_d AS (SELECT CAST({sketches.HLL_ALPHA!r} AS DOUBLE) * 65536.0
                      / (SUM(POWER(2.0, -mr)) + (256 - COUNT(*))) AS raw,
                      CAST(256 - COUNT(*) AS DOUBLE) AS v FROM dg),
     fm AS (SELECT CASE WHEN raw <= 640.0 AND v > 0
                        THEN 256.0 * LN(256.0 / v) ELSE raw END AS hll
            FROM est_m),
     fd AS (SELECT CASE WHEN raw <= 640.0 AND v > 0
                        THEN 256.0 * LN(256.0 / v) ELSE raw END AS hll
            FROM est_d),
     ex AS (SELECT CAST(COUNT(DISTINCT token) AS BIGINT) AS n_exact FROM toks)
SELECT ex.n_exact, ROUND(fd.hll, 6) AS direct_hll,
       ROUND(fm.hll, 6) AS merged_hll,
       CAST(CASE WHEN fd.hll = fm.hll THEN 1 ELSE 0 END AS INT)
           AS merge_identical,
       ROUND(ABS(fm.hll - ex.n_exact) / ex.n_exact, 6) AS rel_error
FROM ex, fd, fm"""


@register("x228_hll_merge", _HLL_MERGE_SQL)
def x228(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "source", F.explode(H.tokens(F.col("text"))).alias("token")
    )
    return sketches.hll_merge_audit(toks, "source", "token")


# --------------------------------------------------------------------------
# x229 — single-changepoint detection on daily order revenue (exact
# binary-segmentation step): every candidate split day scored by
# within-segment SSE on the |days| post-agg frame; daily totals are
# exact-decimal before ONE double conversion (x188's rule), so both
# engines run identical float arithmetic.
_CHG_SQL = """
WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS x
               FROM orders GROUP BY 1),
     pre AS (SELECT d, x,
                    SUM(x) OVER w AS s1,
                    SUM(x * x) OVER w AS ss1,
                    CAST(COUNT(*) OVER w AS DOUBLE) AS n1
             FROM daily WINDOW w AS (ORDER BY d ROWS UNBOUNDED PRECEDING)),
     tot AS (SELECT SUM(x) AS ts_, SUM(x * x) AS tss,
                    CAST(COUNT(*) AS DOUBLE) AS tn FROM daily),
     cand AS (SELECT d, n1, tn - n1 AS n2, s1, ts_ - s1 AS s2,
                     ss1 - s1 * s1 / n1
                     + (tss - ss1) - (ts_ - s1) * (ts_ - s1) / (tn - n1) AS sse_w,
                     tss - ts_ * ts_ / tn AS sst, tn
              FROM pre, tot WHERE n1 < tn)
SELECT d AS last_before_date,
       CAST(n1 AS BIGINT) AS n_before, CAST(n2 AS BIGINT) AS n_after,
       ROUND(s1 / n1, 6) AS mean_before, ROUND(s2 / n2, 6) AS mean_after,
       ROUND((sst - sse_w) / sst * 100.0, 6) AS sse_reduction_pct,
       ROUND((sst - sse_w) / (sse_w / (tn - 2.0)), 6) AS f_stat
FROM cand ORDER BY sse_w ASC, d ASC LIMIT 1"""


@register("x229_changepoint_split", _CHG_SQL)
def x229(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    o = load_table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    return events.changepoint_single_split(o, "o_orderdate", "o_totalprice")


# --------------------------------------------------------------------------
# x230 — Mann-Kendall trend test on daily order revenue: the
# significance companion to x204's Theil-Sen slope (same rank-based
# robustness; |days|²/2 pair frame, date-range-bounded).  S and tie
# counts stay integers; z's p-value uses the shared A&S polynomial.
_MK_SQL = f"""
WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS d,
                      CAST(SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS DOUBLE) AS x
               FROM orders GROUP BY 1),
     s AS (SELECT CAST(SUM(CASE WHEN b.x > a.x THEN 1
                                WHEN b.x < a.x THEN -1 ELSE 0 END) AS BIGINT)
                      AS s_stat
           FROM daily a JOIN daily b ON a.d < b.d),
     nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
     ties AS (SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0) AS BIGINT)
                         AS tie_term
              FROM (SELECT CAST(COUNT(*) AS BIGINT) AS t
                    FROM daily GROUP BY x HAVING COUNT(*) > 1)),
     v AS (SELECT nn.n, s.s_stat,
                  CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tie_term
                       AS DOUBLE) / 18.0 AS var_s
           FROM nn, s, ties),
     zz AS (SELECT *, CASE WHEN s_stat > 0 THEN (s_stat - 1.0) / sqrt(var_s)
                           WHEN s_stat < 0 THEN (s_stat + 1.0) / sqrt(var_s)
                           ELSE 0.0 END AS z
            FROM v),
     pp AS (SELECT *, CASE WHEN z = 0 THEN 1.0
                           ELSE 2.0 * {_rel.normal_sf_sql("ABS(z)")} END AS p
            FROM zz)
SELECT n AS n_days, s_stat, ROUND(var_s, 6) AS var_s, ROUND(z, 6) AS z,
       ROUND(p, 6) AS p,
       CAST(CASE WHEN p < 0.05 AND s_stat > 0 THEN 1
                 WHEN p < 0.05 AND s_stat < 0 THEN -1 ELSE 0 END AS INT)
           AS trend
FROM pp"""


@register("x230_mann_kendall", _MK_SQL)
def x230(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    o = load_table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    return events.mann_kendall_test(o, "o_orderdate", "o_totalprice")


# --------------------------------------------------------------------------
# x231 — count-min sketch heavy-hitter audit on corpus tokens: the d=4 ×
# w=1024 counter grid's estimate next to the exact count for the top-10
# tokens — the overestimate column makes the CMS error guarantee (never
# under, ≤ N/w expected over per row, min over rows) visible and
# oracle-checkable.  The sketch is a fixed 4096-row frame regardless of
# corpus size.
def _cms_cells_sql(expr: str) -> str:
    cells = ", ".join(
        "STRUCT_PACK(j := {j}, b := CAST(('0x' || substr(md5('cm{j}:' || {e}), 1, 8)) "
        "AS BIGINT) % 1024)".format(j=j, e=expr)
        for j in range(4)
    )
    return f"[{cells}]"


_CMS_SQL = f"""
WITH toks AS (SELECT UNNEST({_TOK}) AS v
              FROM documents WHERE text IS NOT NULL),
     cells AS (SELECT UNNEST({_cms_cells_sql("v")}) AS c FROM toks),
     sk AS (SELECT c.j AS j, c.b AS b, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM cells GROUP BY c.j, c.b),
     top AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n_exact
             FROM toks GROUP BY v
             ORDER BY n_exact DESC, v ASC LIMIT 10),
     pr AS (SELECT top.v, top.n_exact, UNNEST({_cms_cells_sql("top.v")}) AS c
            FROM top),
     est AS (SELECT pr.v, pr.n_exact,
                    CAST(MIN(sk.cnt) AS BIGINT) AS cms_estimate
             FROM pr JOIN sk ON sk.j = pr.c.j AND sk.b = pr.c.b
             GROUP BY pr.v, pr.n_exact)
SELECT v AS value, n_exact, cms_estimate,
       CAST(cms_estimate - n_exact AS BIGINT) AS overestimate
FROM est ORDER BY n_exact DESC, value ASC"""


@register("x231_count_min_audit", _CMS_SQL)
def x231(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = docs.select(F.explode(H.tokens(F.col("text"))).alias("token"))
    return sketches.count_min_audit(toks, "token", top_k=10)


# --------------------------------------------------------------------------
# x232 — sketch-based source-overlap triage: pairwise Jaccard between
# sources estimated by HLL inclusion-exclusion (|A∪B| from the pair's
# merged registers — union is free on sketches) next to the exact
# Jaccard from the vocabulary join; the audit that says whether sketch
# overlap can replace the exact join for triage at scale.
_EST_EXPR = (
    f"CASE WHEN raw <= 640.0 AND v > 0 THEN 256.0 * LN(256.0 / v) "
    f"ELSE raw END"
)
_HLL_JAC_SQL = f"""
WITH toks AS (SELECT DISTINCT source, UNNEST({_TOK}) AS token
              FROM documents WHERE text IS NOT NULL),
     h AS (SELECT source, token,
                  CAST(('0x' || substr(md5(token), 1, 15)) AS BIGINT) AS hv
           FROM toks),
     r AS (SELECT source, hv % 256 AS reg, hv // 256 AS w FROM h),
     pg AS (SELECT source, reg,
                   MAX(CASE WHEN w = 0 THEN 53
                            ELSE 53 - LENGTH(bin(w)) END) AS mr
            FROM r GROUP BY source, reg),
     singles0 AS (SELECT source,
                         CAST({sketches.HLL_ALPHA!r} AS DOUBLE) * 65536.0
                         / (SUM(POWER(2.0, -mr)) + (256 - COUNT(*))) AS raw,
                         CAST(256 - COUNT(*) AS DOUBLE) AS v
                  FROM pg GROUP BY source),
     singles AS (SELECT source, {_EST_EXPR} AS hll FROM singles0),
     prs AS (SELECT a.source AS ga, b.source AS gb
             FROM (SELECT DISTINCT source FROM pg) a
             JOIN (SELECT DISTINCT source FROM pg) b ON a.source < b.source),
     tagged AS (SELECT prs.ga, prs.gb, pg.reg, pg.mr
                FROM prs JOIN pg ON pg.source = prs.ga OR pg.source = prs.gb),
     ur AS (SELECT ga, gb, reg, MAX(mr) AS mr
            FROM tagged GROUP BY ga, gb, reg),
     eu0 AS (SELECT ga, gb,
                    CAST({sketches.HLL_ALPHA!r} AS DOUBLE) * 65536.0
                    / (SUM(POWER(2.0, -mr)) + (256 - COUNT(*))) AS raw,
                    CAST(256 - COUNT(*) AS DOUBLE) AS v
             FROM ur GROUP BY ga, gb),
     eu AS (SELECT ga, gb, {_EST_EXPR} AS eu FROM eu0),
     est AS (SELECT eu.ga, eu.gb,
                    GREATEST((sa.hll + sb.hll - eu.eu) / eu.eu, 0.0) AS jac_est
             FROM eu JOIN singles sa ON sa.source = eu.ga
                     JOIN singles sb ON sb.source = eu.gb),
     sizes AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
               FROM toks GROUP BY source),
     inter AS (SELECT a.source AS ga, b.source AS gb,
                      CAST(COUNT(*) AS BIGINT) AS ni
               FROM toks a JOIN toks b
                 ON a.token = b.token AND a.source < b.source
               GROUP BY a.source, b.source),
     exact AS (SELECT i.ga, i.gb,
                      i.ni / CAST(sa.n + sb.n - i.ni AS DOUBLE) AS jac_exact
               FROM inter i JOIN sizes sa ON sa.source = i.ga
                            JOIN sizes sb ON sb.source = i.gb)
SELECT est.ga AS group_a, est.gb AS group_b,
       ROUND(est.jac_est, 6) AS jaccard_est,
       ROUND(COALESCE(exact.jac_exact, 0.0), 6) AS jaccard_exact,
       ROUND(ABS(est.jac_est - COALESCE(exact.jac_exact, 0.0)), 6) AS abs_err
FROM est LEFT JOIN exact ON exact.ga = est.ga AND exact.gb = est.gb
ORDER BY jaccard_est DESC, group_a ASC, group_b ASC LIMIT 10"""


@register("x232_hll_source_overlap", _HLL_JAC_SQL)
def x232(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H

    docs = load_table(spark, sf, "documents").where(F.col("text").isNotNull())
    toks = docs.select(
        "source", F.explode(H.tokens(F.col("text"))).alias("token")
    )
    return sketches.hll_pairwise_jaccard(toks, "source", "token", top_k=10)


# --------------------------------------------------------------------------
# x233 — compression-score ORDERING oracle (r6 verdict item 6: a
# partial, SQL-checkable oracle for the zlib family whose raw scores
# x200 can only verify rows-only).  Four deterministic fixture texts —
# uniform run, 8-char cycle, half-cycle/half-hex mix, md5-hex chain —
# whose LENGTHS derive from the corpus row count (both engines compute
# the same arithmetic), run through the REAL zlib operator; the oracle
# pins raw_bytes arithmetic and the rank each repetitiveness class must
# occupy (more repetitive => smaller ratio => lower rank).  The rank
# ordering is invariant to the data-driven length, so the oracle is
# exact while the zlib byte counts stay engine-side.
_COMP_ORD_SQL = """
WITH params AS (SELECT CAST(1024 + COUNT(*) % 997 AS BIGINT) AS reps
                FROM documents)
SELECT name, raw_bytes, rank FROM (
    SELECT 'uniform_run' AS name, reps * 8 AS raw_bytes, 1 AS rank
    FROM params
    UNION ALL
    SELECT 'cycle8', reps * 8, 2 FROM params
    UNION ALL
    SELECT 'half_mix', (reps // 2) * 8 + 3200, 3 FROM params
    UNION ALL
    SELECT 'md5_chain', 3200, 4 FROM params
) ORDER BY rank"""


@register("x233_compression_ordering", _COMP_ORD_SQL)
def x233(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    from flashml_spark.operators import textops

    reps = 1024 + load_table(spark, sf, "documents").count() % 997
    # md5-hex chain: 100 concatenated digests = 3200 chars of 16-symbol
    # "random" — the least-compressible fixture; built with the same
    # md5(CAST(i AS STRING)) both engines share
    chain = F.array_join(
        F.transform(
            F.sequence(F.lit(1), F.lit(100)),
            lambda i: F.md5(i.cast("string")),
        ),
        "",
    )
    fixtures = (
        spark.range(1)
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("uniform_run").alias("name"),
                        F.repeat(F.lit("a"), reps * 8).alias("text"),
                    ),
                    F.struct(
                        F.lit("cycle8").alias("name"),
                        F.repeat(F.lit("abcdefgh"), reps).alias("text"),
                    ),
                    F.struct(
                        F.lit("half_mix").alias("name"),
                        F.concat(
                            F.repeat(F.lit("abcdefgh"), reps // 2), chain
                        ).alias("text"),
                    ),
                    F.struct(F.lit("md5_chain").alias("name"), chain.alias("text")),
                )
            ).alias("f")
        )
        .select("f.name", "f.text")
    )
    scored = textops.compression_ratio_score(fixtures, "text", "name")
    # 4-row frame: the single-partition rank window is value-domain
    # bounded (|fixtures| = 4), never data-sized
    return scored.select(
        "name",
        "raw_bytes",
        F.row_number()
        .over(Window.orderBy(F.col("ratio").asc(), F.col("name").asc()))
        .alias("rank"),
    ).orderBy("rank")
