"""Extension queries x234+ — round-7 additions.

Families: mergeable moment sketches (Cornish-Fisher quantile audit),
sequential forecasting (Holt linear trend with one-step backtest),
embedding canonicalization (reciprocal nearest neighbours), and
experiment analytics (difference-in-differences).  Every query keeps
the repo's oracle discipline: exact integer/decimal aggregation before
any float, IEEE exactly-rounded float ops only (no ``pow``) written in
the SAME operation order into both engines, deterministic md5-derived
randomness, Python-computed shared literals.
"""

from __future__ import annotations

from statistics import NormalDist

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import sketches
from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# x234 — moment-sketch quantile audit on document lengths: per-source
# EXACT integer power sums (n, Σv, Σv², Σv³ — the mergeable sketch: a
# few integers per shard, merge = addition) → merged global moments →
# Cornish-Fisher quantile estimates next to the exact lower quantiles.
# The audit a 100 TB pipeline runs to decide whether shard-level moment
# sketches can replace a global sort for tail monitoring.  The normal
# quantiles and (z²−1)/6 coefficients are Python-computed HERE and
# formatted into BOTH plans, so the estimates replay bit-for-bit.
_ND = NormalDist()
_MOM_QS = (0.25, 0.5, 0.75)
_MOM_VALUES = ", ".join(
    f"({q!r}, {_ND.inv_cdf(q)!r}, {(_ND.inv_cdf(q) ** 2 - 1.0) / 6.0!r})"
    for q in _MOM_QS
)

_MOMENT_SQL = f"""
WITH sk AS (SELECT source, COUNT(*) AS n,
                   SUM(CAST(n_chars AS HUGEINT)) AS s1,
                   SUM(CAST(n_chars * n_chars AS HUGEINT)) AS s2,
                   SUM(CAST(n_chars * n_chars AS HUGEINT) * n_chars) AS s3
            FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
     m AS (SELECT CAST(SUM(n) AS DOUBLE) AS n, CAST(SUM(s1) AS DOUBLE) AS s1,
                  CAST(SUM(s2) AS DOUBLE) AS s2, CAST(SUM(s3) AS DOUBLE) AS s3
           FROM sk),
     mm AS (SELECT s1 / n AS mu, s2 / n AS m2, s3 / n AS m3 FROM m),
     ms AS (SELECT mu, m2, m3, SQRT(m2 - mu * mu) AS sd FROM mm),
     mom AS (SELECT mu, sd,
                    (m3 - 3.0 * mu * m2 + 2.0 * mu * mu * mu)
                        / (sd * sd * sd) AS skew
             FROM ms),
     ql AS (SELECT CAST(q AS DOUBLE) AS q, CAST(z AS DOUBLE) AS z,
                   CAST(c2 AS DOUBLE) AS c2
            FROM (VALUES {_MOM_VALUES}) AS t(q, z, c2)),
     est AS (SELECT q, mu + sd * (z + c2 * skew) AS est
             FROM mom CROSS JOIN ql),
     cells AS (SELECT CAST(n_chars AS BIGINT) AS v, COUNT(*) AS c
               FROM documents WHERE n_chars IS NOT NULL GROUP BY 1),
     cum AS (SELECT v, SUM(c) OVER (ORDER BY v) AS cw,
                    SUM(c) OVER () AS nn
             FROM cells),
     ex AS (SELECT q, MIN(v) AS exact
            FROM cum CROSS JOIN (SELECT q FROM ql) qq
            WHERE cw >= CEIL(q * nn) GROUP BY q)
SELECT est.q AS q, ROUND(est.est, 6) AS est,
       CAST(ex.exact AS BIGINT) AS exact,
       ROUND(ABS(est.est - ex.exact), 6) AS abs_err
FROM est JOIN ex ON est.q = ex.q ORDER BY q"""


@register("x234_moment_quantiles", _MOMENT_SQL)
def x234(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("source", "n_chars")
    return sketches.moment_quantile_audit(
        docs, "source", "n_chars", quantiles=_MOM_QS
    )


# --------------------------------------------------------------------------
# x235 — Holt linear-trend forecast with one-step backtest: the
# trend-aware successor to x122/x188's flat smoothing.  Sequential by
# nature, so the Spark side is a JVM aggregate fold over the |days|
# array and the oracle is the SAME recursion as a recursive CTE
# stepping day by day (the x227 pattern) — identical operation order,
# bit-identical floats.
_HOLT_A = 0.3
_HOLT_B = 0.1
_HOLT_SQL = f"""
WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) AS d,
                      CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS y
               FROM events GROUP BY 1),
     s AS (SELECT y, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily),
     nn AS (SELECT COUNT(*) AS nd FROM daily),
     r AS (
        SELECT 1 AS rn, y AS l, CAST(0.0 AS DOUBLE) AS b,
               CAST(0.0 AS DOUBLE) AS errsum
        FROM s WHERE rn = 1
        UNION ALL
        SELECT s.rn,
               CASE WHEN s.rn = 2 THEN s.y
                    ELSE {_HOLT_A!r} * s.y
                         + {1.0 - _HOLT_A!r} * (r.l + r.b) END,
               CASE WHEN s.rn = 2 THEN s.y - r.l
                    ELSE {_HOLT_B!r} * (({_HOLT_A!r} * s.y
                             + {1.0 - _HOLT_A!r} * (r.l + r.b)) - r.l)
                         + {1.0 - _HOLT_B!r} * r.b END,
               CASE WHEN s.rn >= 3
                    THEN r.errsum + ABS(s.y - (r.l + r.b))
                    ELSE r.errsum END
        FROM r JOIN s ON s.rn = r.rn + 1),
     fin AS (SELECT l, b, errsum FROM r
             WHERE rn = (SELECT MAX(rn) FROM s)),
     h AS (SELECT CAST(h AS INT) AS h
           FROM (VALUES (1), (2), (3), (4), (5), (6), (7)) t(h))
SELECT h.h AS h,
       ROUND(fin.l + CAST(h.h AS DOUBLE) * fin.b, 6) AS forecast,
       ROUND(fin.errsum / CAST(nn.nd - 2 AS DOUBLE), 6) AS backtest_mae
FROM fin CROSS JOIN h CROSS JOIN nn ORDER BY h"""


@register("x235_holt_forecast", _HOLT_SQL)
def x235(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    ev = load_table(spark, sf, "events").select("ts", "value")
    return events.holt_linear_forecast(
        ev, "ts", "value", alpha=_HOLT_A, beta=_HOLT_B, horizon=7
    )


# --------------------------------------------------------------------------
# x236 — reciprocal-nearest-neighbour canonical pairs over the
# embeddings table: mutual cosine top-1 (each side must PREFER the
# other), the strict criterion for embedding-level duplicate
# canonicalization.  Exact all-pairs audit variant (x06/x144 posture);
# similarities round to 6 BEFORE ranking so the top-1 choice replays
# identically across engines.
_RNN_SQL = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
     n AS (SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v),
     p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                  ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)
                      AS sim
           FROM n a JOIN n b ON a.vec_id <> b.vec_id),
     top AS (SELECT ia, ib, sim,
                    ROW_NUMBER() OVER (PARTITION BY ia
                        ORDER BY sim DESC, ib ASC) AS rn
             FROM p)
SELECT t.ia AS id_a, t.ib AS id_b, t.sim AS sim
FROM top t JOIN top o ON t.ia = o.ib AND t.ib = o.ia
WHERE t.rn = 1 AND o.rn = 1 AND t.ia < t.ib
ORDER BY id_a"""


@register("x236_reciprocal_nn", _RNN_SQL)
def x236(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return similarity.reciprocal_nn_pairs(emb, "embedding", "vec_id")


# --------------------------------------------------------------------------
# x237 — difference-in-differences readout on events: deterministic
# md5-coin treatment over users, calendar-midpoint cutover computed
# inside the plan, four exact-decimal cells -> DiD, pooled SE, z.  The
# panel companion to x196 (cross-sectional z) and x154 (CUPED).
_DID_SQL = """
WITH span AS (SELECT MIN(CAST(ts AS DATE)) AS dmin,
                     MAX(CAST(ts AS DATE)) AS dmax
              FROM events),
     cells AS (
        SELECT CASE WHEN (CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                1, 8)) AS BIGINT) + 1.0) / 4294967296.0 < 0.5
                    THEN 1 ELSE 0 END AS treat,
               CASE WHEN CAST(ts AS DATE) >=
                         dmin + ((dmax - dmin) // 2) * INTERVAL 1 DAY
                    THEN 1 ELSE 0 END AS post,
               CAST(value AS DECIMAL(28,6)) AS v,
               CAST(value * value AS DECIMAL(28,6)) AS v2
        FROM events CROSS JOIN span),
     agg AS (SELECT treat, post, CAST(COUNT(*) AS DOUBLE) AS n,
                    CAST(SUM(v) AS DOUBLE) AS s, CAST(SUM(v2) AS DOUBLE) AS sq
             FROM cells GROUP BY treat, post),
     w AS (SELECT
        MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n_t1,
        MAX(CASE WHEN treat = 1 AND post = 1 THEN s END) AS s_t1,
        MAX(CASE WHEN treat = 1 AND post = 1 THEN sq END) AS sq_t1,
        MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n_t0,
        MAX(CASE WHEN treat = 1 AND post = 0 THEN s END) AS s_t0,
        MAX(CASE WHEN treat = 1 AND post = 0 THEN sq END) AS sq_t0,
        MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n_c1,
        MAX(CASE WHEN treat = 0 AND post = 1 THEN s END) AS s_c1,
        MAX(CASE WHEN treat = 0 AND post = 1 THEN sq END) AS sq_c1,
        MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n_c0,
        MAX(CASE WHEN treat = 0 AND post = 0 THEN s END) AS s_c0,
        MAX(CASE WHEN treat = 0 AND post = 0 THEN sq END) AS sq_c0
        FROM agg),
     d AS (SELECT
        s_c0 / n_c0 AS m_c0, s_c1 / n_c1 AS m_c1,
        s_t0 / n_t0 AS m_t0, s_t1 / n_t1 AS m_t1,
        (sq_t1 - s_t1 * s_t1 / n_t1) / (n_t1 - 1.0) / n_t1
        + (sq_t0 - s_t0 * s_t0 / n_t0) / (n_t0 - 1.0) / n_t0
        + (sq_c1 - s_c1 * s_c1 / n_c1) / (n_c1 - 1.0) / n_c1
        + (sq_c0 - s_c0 * s_c0 / n_c0) / (n_c0 - 1.0) / n_c0 AS var_sum
        FROM w)
SELECT ROUND(m_c0, 6) AS mean_ctrl_pre, ROUND(m_c1, 6) AS mean_ctrl_post,
       ROUND(m_t0, 6) AS mean_treat_pre, ROUND(m_t1, 6) AS mean_treat_post,
       ROUND((m_t1 - m_t0) - (m_c1 - m_c0), 6) AS did,
       ROUND(SQRT(var_sum), 6) AS se,
       ROUND(((m_t1 - m_t0) - (m_c1 - m_c0)) / SQRT(var_sum), 6) AS z
FROM d"""


@register("x237_diff_in_diff", _DID_SQL)
def x237(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    ev = load_table(spark, sf, "events").select("ts", "user_id", "value")
    return events.diff_in_diff(ev, "ts", "user_id", "value")


# --------------------------------------------------------------------------
# x238 — join-size estimation by count-min inner product (Cormode &
# Muthukrishnan 2005 §4.2): |orders ⋈ lineitem on orderkey| estimated
# from two 4-KB grids (min over rows of Σ_b A_j[b]·B_j[b] — never an
# underestimate) next to the exact Σ_k c_A(k)·c_B(k).  The planning
# readout that sizes a shuffle BEFORE paying for it.
def _cms_cells17(expr: str) -> str:
    cells = ", ".join(
        "STRUCT_PACK(j := {j}, b := CAST(('0x' || substr(md5('cm{j}:' || {e}), 1, 8)) "
        "AS BIGINT) % 1024)".format(j=j, e=expr)
        for j in range(4)
    )
    return f"[{cells}]"


_JOINSIZE_SQL = f"""
WITH av AS (SELECT CAST(o_orderkey AS VARCHAR) AS v FROM orders
            WHERE o_orderkey IS NOT NULL),
     bv AS (SELECT CAST(l_orderkey AS VARCHAR) AS v FROM lineitem
            WHERE l_orderkey IS NOT NULL),
     ac AS (SELECT c.j AS j, c.b AS b, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT UNNEST({_cms_cells17("v")}) AS c FROM av)
            GROUP BY c.j, c.b),
     bc AS (SELECT c.j AS j, c.b AS b, CAST(COUNT(*) AS BIGINT) AS cnt
            FROM (SELECT UNNEST({_cms_cells17("v")}) AS c FROM bv)
            GROUP BY c.j, c.b),
     ip AS (SELECT ac.j, SUM(ac.cnt * bc.cnt) AS ip
            FROM ac JOIN bc ON ac.j = bc.j AND ac.b = bc.b GROUP BY ac.j),
     est AS (SELECT MIN(ip) AS cms_estimate FROM ip),
     ca AS (SELECT v AS k, COUNT(*) AS na FROM av GROUP BY v),
     cb AS (SELECT v AS k, COUNT(*) AS nb FROM bv GROUP BY v),
     ex AS (SELECT COALESCE(SUM(na * nb), 0) AS exact
            FROM ca JOIN cb USING (k))
SELECT CAST(ex.exact AS BIGINT) AS exact,
       CAST(est.cms_estimate AS BIGINT) AS cms_estimate,
       CAST(est.cms_estimate - ex.exact AS BIGINT) AS overestimate,
       ROUND((est.cms_estimate - ex.exact)
             / CAST(GREATEST(ex.exact, 1) AS DOUBLE), 6) AS rel_error
FROM ex CROSS JOIN est"""


@register("x238_join_size_sketch", _JOINSIZE_SQL)
def x238(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").select("o_orderkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey")
    return sketches.cms_join_size(orders, "o_orderkey", li, "l_orderkey")


# --------------------------------------------------------------------------
# x239 — daily PSI drift timeline on events.value vs the first-7-day
# base period: the one-shot PSI health check (q14) turned into the time
# series an on-call watches.  Equidistant bins over the base min/max
# (pure arithmetic — engine-exact bucketing), inner-join bucket
# convention, SI x 100, matching the monitoring PSI semantics.
_PSI_TL_SQL = """
WITH daily AS (SELECT CAST(ts AS DATE) AS d, value AS v FROM events
               WHERE value IS NOT NULL),
     d0 AS (SELECT MIN(d) AS d0 FROM daily),
     bb AS (SELECT MIN(v) AS lo, MAX(v) AS hi
            FROM daily CROSS JOIN d0 WHERE d - d0 < 7),
     tagged AS (SELECT d,
                       LEAST(GREATEST(FLOOR((v - lo) * 10.0 / (hi - lo)),
                                      0), 9) AS b,
                       (d - d0 < 7) AS in_base
                FROM daily CROSS JOIN bb CROSS JOIN d0),
     cells AS (SELECT d, b, in_base, COUNT(*) AS c
               FROM tagged GROUP BY d, b, in_base),
     base AS (SELECT b, SUM(c) / (SELECT SUM(c) FROM cells WHERE in_base)
                         AS pb
              FROM cells WHERE in_base GROUP BY b),
     dt AS (SELECT d, SUM(c) AS td FROM cells GROUP BY d),
     ds AS (SELECT cells.d, cells.b, SUM(c) / dt.td AS pd
            FROM cells JOIN dt ON cells.d = dt.d
            GROUP BY cells.d, cells.b, dt.td),
     p AS (SELECT ds.d,
                  ROUND(SUM((pd - pb) * LN(pd / pb)) * 100.0, 6) AS psi
           FROM ds JOIN base ON ds.b = base.b GROUP BY ds.d)
SELECT p.d AS d, CAST(dt.td AS BIGINT) AS n, p.psi AS psi
FROM p JOIN dt ON p.d = dt.d ORDER BY d"""


@register("x239_psi_timeline", _PSI_TL_SQL)
def x239(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.metrics.stability import psi_timeline

    ev = load_table(spark, sf, "events").select("ts", "value")
    return psi_timeline(ev, "ts", "value", base_days=7, bins=10)


# --------------------------------------------------------------------------
# x240 — the banded-LSH scale path for x236, upgraded r8 from rows-only
# to a PLANTED-FIXTURE oracle (r07 VERDICT item 7, the x233 pattern):
# clone the 8 smallest-id corpus vectors with ids max_id+1+vec_id, run
# the REAL banded-LSH mutual-NN operator over corpus ∪ clones, and
# return only the pairs touching a clone.  Identical vectors share
# every band's bucket, so each (original, clone) pair is a GUARANTEED
# candidate (recall 1 by construction, not probabilistically) and each
# is mutual-top-1 at sim 1.0 — strictly above any rounded corpus
# cosine.  The oracle derives the exact planted set in pure SQL; a
# hash-match therefore certifies the LSH pipeline recovered every
# planted near-duplicate with the exact similarity.  The full corpus
# still pays the complete candidate-generation + mutual-rank cost (the
# output filter sits above the rank windows, which Catalyst cannot
# prune), so the bench row keeps measuring the real operator.
_RNN_LSH_SQL = """
WITH m AS (SELECT MAX(vec_id) AS mx FROM embeddings)
SELECT e.vec_id AS id_a,
       CAST(m.mx + 1 + e.vec_id AS BIGINT) AS id_b,
       CAST(1.0 AS DOUBLE) AS sim
FROM embeddings e, m WHERE e.vec_id < 8 ORDER BY id_a"""


@register("x240_reciprocal_nn_lsh", _RNN_LSH_SQL)
def x240(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    mx = emb.agg(F.max("vec_id")).first()[0]  # scalar: clone id offset
    clones = emb.where(F.col("vec_id") < 8).select(
        (F.col("vec_id") + F.lit(int(mx) + 1)).alias("vec_id"), "embedding"
    )
    pairs = similarity.reciprocal_nn_pairs_lsh(
        emb.unionByName(clones), "embedding", "vec_id"
    )
    return (
        pairs.where(F.col("id_b") > F.lit(int(mx)))
        .select("id_a", "id_b", "sim")
        .orderBy("id_a")
    )


# --------------------------------------------------------------------------
# x241 — contrastive triplet mining: (anchor, positive) = both
# orientations of each reciprocal-NN pair, negative = a deterministic
# md5-picked row (rank = md5('a:b') % n over the vec-id-sorted index,
# stepping past collisions) — the training-data op that turns embedding
# structure into (a, p, n) rows, reproducible on any engine because the
# negative pick is hash arithmetic, not RNG.
_TRIPLET_SQL = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
     nrm AS (SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v),
     p AS (SELECT a.vec_id AS ia, b.vec_id AS ib,
                  ROUND(list_dot_product(a.e, b.e) / (a.nrm * b.nrm), 6)
                      AS sim
           FROM nrm a JOIN nrm b ON a.vec_id <> b.vec_id),
     top AS (SELECT ia, ib, sim,
                    ROW_NUMBER() OVER (PARTITION BY ia
                        ORDER BY sim DESC, ib ASC) AS rn
             FROM p),
     mut AS (SELECT t.ia AS id_a, t.ib AS id_b, t.sim
             FROM top t JOIN top o ON t.ia = o.ib AND t.ib = o.ia
             WHERE t.rn = 1 AND o.rn = 1 AND t.ia < t.ib),
     bo AS (SELECT id_a AS anchor, id_b AS positive, sim AS sim_pos
              FROM mut
              UNION ALL
              SELECT id_b, id_a, sim FROM mut),
     nn AS (SELECT COUNT(*) AS n FROM embeddings),
     idx AS (SELECT vec_id AS cand,
                    ROW_NUMBER() OVER (ORDER BY vec_id ASC) - 1 AS rn
             FROM embeddings),
     cands AS (SELECT b.*, s.step,
                      (CAST(('0x' || substr(md5(CAST(b.anchor AS VARCHAR)
                           || ':' || CAST(b.positive AS VARCHAR)), 1, 8))
                           AS BIGINT) + s.step) % nn.n AS rn
               FROM bo b CROSS JOIN nn
               CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS step) s),
     picked AS (SELECT c.anchor, c.positive, c.sim_pos, i.cand,
                       ROW_NUMBER() OVER (PARTITION BY c.anchor, c.positive
                           ORDER BY c.step) AS pick
                FROM cands c JOIN idx i ON c.rn = i.rn
                WHERE i.cand <> c.anchor AND i.cand <> c.positive)
SELECT anchor, positive, cand AS negative, sim_pos
FROM picked WHERE pick = 1 ORDER BY anchor, positive"""


@register("x241_contrastive_triplets", _TRIPLET_SQL)
def x241(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return similarity.contrastive_triplets(emb, "embedding", "vec_id")


# --------------------------------------------------------------------------
# x242 — two-sided CUSUM control chart (Page 1954) on daily event
# totals: the sequential drift detector that accumulates small
# persistent shifts the per-day outlier tests treat as noise.  The
# oracle is the SAME max(0, ...) recursion as a recursive CTE; μ/σ come
# from the first-7-day base period's exact moment sums.
_CUSUM_K = 0.5
_CUSUM_H = 5.0
_CUSUM_SQL = f"""
WITH RECURSIVE daily AS (SELECT CAST(ts AS DATE) AS d,
                      CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS y
               FROM events GROUP BY 1),
     d0 AS (SELECT MIN(d) AS d0 FROM daily),
     base AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                     CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE) AS s1,
                     CAST(SUM(CAST(y * y AS DECIMAL(38,6))) AS DOUBLE) AS s2
              FROM daily CROSS JOIN d0 WHERE d - d0 < 7),
     ms AS (SELECT s1 / n AS mu,
                   SQRT(s2 / n - (s1 / n) * (s1 / n)) AS sd
            FROM base),
     s AS (SELECT d, y, ROW_NUMBER() OVER (ORDER BY d) AS rn FROM daily),
     r AS (
        SELECT rn, d, (y - mu) / sd AS z,
               GREATEST(0.0, 0.0 + (y - mu) / sd - {_CUSUM_K!r}) AS sp,
               GREATEST(0.0, 0.0 - (y - mu) / sd - {_CUSUM_K!r}) AS sn
        FROM s CROSS JOIN ms WHERE rn = 1
        UNION ALL
        SELECT s.rn, s.d, (s.y - ms.mu) / ms.sd,
               GREATEST(0.0, r.sp + (s.y - ms.mu) / ms.sd - {_CUSUM_K!r}),
               GREATEST(0.0, r.sn - (s.y - ms.mu) / ms.sd - {_CUSUM_K!r})
        FROM r JOIN s ON s.rn = r.rn + 1 CROSS JOIN ms)
SELECT d, ROUND(z, 6) AS z, ROUND(sp, 6) AS cusum_pos,
       ROUND(sn, 6) AS cusum_neg,
       CAST(CASE WHEN sp > {_CUSUM_H!r} OR sn > {_CUSUM_H!r}
                 THEN 1 ELSE 0 END AS INT) AS alarm
FROM r ORDER BY d"""


@register("x242_cusum_drift", _CUSUM_SQL)
def x242(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    ev = load_table(spark, sf, "events").select("ts", "value")
    return events.cusum_drift(
        ev, "ts", "value", k=_CUSUM_K, h=_CUSUM_H, base_days=7
    )


# --------------------------------------------------------------------------
# x243 — O'Brien-Fleming sequential boundary over the x215 peeking
# curve (Lan-DeMets b(t) = z_.975 / sqrt(t), t = cumulative/final
# enrollment): the boundary that says when a peek is SIGNIFICANT —
# early looks face a huge bar, the final look converges to the
# fixed-horizon z.  z_.975 ships as a shared Python literal.
from flashml_spark.operators.events import OBF_Z975 as _OBF_C

_OBF_SQL = f"""
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
           FROM f),
     zc AS (SELECT d, n_a, n_b,
                   ROUND(CASE WHEN n_a > 0 AND n_b > 0 AND se > 0
                              THEN (pa - pb) / se ELSE 0.0 END, 6) AS z
            FROM g),
     nt AS (SELECT MAX(n_a + n_b) AS nt FROM zc)
SELECT d, z,
       ROUND(CAST(n_a + n_b AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS info_frac,
       ROUND({_OBF_C!r} / SQRT(CAST(n_a + n_b AS DOUBLE)
             / CAST(nt AS DOUBLE)), 6) AS boundary,
       CAST(CASE WHEN ABS(z) > {_OBF_C!r} / SQRT(CAST(n_a + n_b AS DOUBLE)
                 / CAST(nt AS DOUBLE)) THEN 1 ELSE 0 END AS INT) AS crossed
FROM zc CROSS JOIN nt ORDER BY d"""


@register("x243_obf_boundary", _OBF_SQL)
def x243(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    ev = load_table(spark, sf, "events").select("user_id", "ts", "event_type")
    return events.obf_boundary_curve(
        ev,
        "user_id",
        "ts",
        (F.col("user_id") % 2).cast("int"),
        F.col("event_type") == "purchase",
    )


# --------------------------------------------------------------------------
# x244 — Neyman-optimal audit-sample allocation across sources (Neyman
# 1934 / Cochran 1977): n_h ∝ N_h·σ_h from the SAME exact integer power
# sums as x234's sketch, next to proportional allocation and the
# design-effect variance ratio — the sampling-design readout run BEFORE
# drawing audit rows.
_NEYMAN_SQL = """
WITH sk AS (SELECT source, CAST(COUNT(*) AS DOUBLE) AS n,
                   CAST(SUM(CAST(n_chars AS HUGEINT)) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(n_chars * n_chars AS HUGEINT)) AS DOUBLE)
                       AS s2
            FROM documents WHERE n_chars IS NOT NULL GROUP BY source),
     per AS (SELECT source, n,
                    SQRT(s2 / n - (s1 / n) * (s1 / n)) AS sd
             FROM sk),
     t AS (SELECT SUM(n) AS tn, SUM(n * sd) AS tns,
                  SUM(n * sd * sd) AS tns2
           FROM per)
SELECT source, CAST(n AS BIGINT) AS n_rows, ROUND(sd, 6) AS sd,
       ROUND(10000.0 * (n * sd) / tns, 6) AS n_neyman,
       ROUND(10000.0 * n / tn, 6) AS n_proportional,
       ROUND((tns * tns) / (tn * tns2), 6) AS var_ratio
FROM per CROSS JOIN t ORDER BY source"""


@register("x244_neyman_allocation", _NEYMAN_SQL)
def x244(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("source", "n_chars")
    return sketches.neyman_allocation(docs, "source", "n_chars", budget=10_000)


# --------------------------------------------------------------------------
# x245 — semantic holdout decontamination: flag corpus embeddings whose
# max cosine against a benchmark set clears the threshold — catches the
# paraphrases token-overlap decontamination (x55/x178) misses.  The
# benchmark (vec_id % 97 == 0 here) ships as a broadcast, so the whole
# operator is one map-side corpus pass.  Excluding benchmark members
# themselves, the flags are the near-contamination set.
_SEMDECON_SQL = """
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
     n AS (SELECT vec_id, e, SQRT(list_dot_product(e, e)) AS nrm FROM v),
     bench AS (SELECT * FROM n WHERE vec_id % 97 = 0),
     corp AS (SELECT * FROM n WHERE vec_id % 97 <> 0),
     sims AS (SELECT c.vec_id AS cid, b.vec_id AS bid,
                     ROUND(list_dot_product(c.e, b.e) / (c.nrm * b.nrm), 6)
                         AS sim
              FROM corp c CROSS JOIN bench b),
     top AS (SELECT cid, bid, sim,
                    ROW_NUMBER() OVER (PARTITION BY cid
                        ORDER BY sim DESC, bid ASC) AS rn
             FROM sims)
SELECT cid AS vec_id, sim AS max_sim, bid AS nearest_benchmark_id
FROM top WHERE rn = 1 AND sim >= 0.4 ORDER BY vec_id"""


@register("x245_semantic_decontamination", _SEMDECON_SQL)
def x245(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    bench = emb.where(F.col("vec_id") % 97 == 0)
    corp = emb.where(F.col("vec_id") % 97 != 0)
    return similarity.semantic_decontamination(
        corp, bench, "embedding", "vec_id", threshold=0.4
    )
