"""Extension queries x246+ — round-8 additions.

Training-data PLANNING operators: the audits a pipeline runs before
committing to an expensive configuration — embedding truncation depth
(Matryoshka fidelity), training sequence capacity (packing waste
curve), LSH banding (measured-profile recall planner), shard
composition (stratified interleave), and source mixture (water-filling
budget allocation).  Oracle discipline unchanged: exact
integer/decimal accumulation before any float, literal-exponent
multiplication chains instead of float ``pow``, one written operation
order in both engines, Python-computed shared literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table

_TOK = "string_split_regex(lower(trim(text)), '\\s+')"


# --------------------------------------------------------------------------
# x246 — Matryoshka truncation fidelity: Pearson r and mean |Δsim|
# between full-dim and prefix-dim cosine on a deterministic
# arithmetic-sampled pair set.  The audit that picks the truncation
# depth for a cheaper ANN index.  Per-pair sims round to 6 and
# accumulate as exact decimals (order-free sums); the Pearson reduction
# is one written double expression in both engines.
_MAT_DIMS = (8, 16, 32)


def _mat_cos(prefix: str) -> str:
    """DuckDB cosine between va/vb sliced to ``prefix`` (or full)."""
    a = f"va{prefix}"
    b = f"vb{prefix}"
    return (
        f"list_dot_product({a}, {b})"
        f" / (sqrt(list_dot_product({a}, {a}))"
        f" * sqrt(list_dot_product({b}, {b})))"
    )


def _mat_block(d: int) -> str:
    return f"""
  SELECT {d} AS dim, n_pairs, mean_abs_err, pearson_r FROM (
    SELECT CAST(n AS BIGINT) AS n_pairs,
           ROUND(CAST(sabs AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_abs_err,
           ROUND((CAST(n AS DOUBLE) * CAST(sfk AS DOUBLE)
                  - CAST(sf AS DOUBLE) * CAST(sk AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(sff AS DOUBLE)
                         - CAST(sf AS DOUBLE) * CAST(sf AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(skk AS DOUBLE)
                           - CAST(sk AS DOUBLE) * CAST(sk AS DOUBLE))), 6)
               AS pearson_r
    FROM (
      SELECT COUNT(*) AS n, SUM(f) AS sf, SUM(k) AS sk, SUM(f * f) AS sff,
             SUM(k * k) AS skk, SUM(f * k) AS sfk, SUM(ABS(f - k)) AS sabs
      FROM (
        SELECT CAST(ROUND({_mat_cos("")}, 6) AS DECIMAL(18,6)) AS f,
               CAST(ROUND({_mat_cos(f"[1:{d}]")}, 6) AS DECIMAL(18,6)) AS k
        FROM pairs)))"""


_MAT_SQL = (
    """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     a AS (SELECT vec_id AS ia, v AS va FROM e WHERE vec_id % 10 = 0),
     b AS (SELECT vec_id AS ib, v AS vb FROM e WHERE vec_id % 10 = 5),
     pairs AS (SELECT va, vb FROM a JOIN b ON ia < ib)
"""
    + "\nUNION ALL".join(_mat_block(d) for d in _MAT_DIMS)
    + "\nORDER BY dim"
)


@register("x246_matryoshka_fidelity", _MAT_SQL)
def x246(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return similarity.matryoshka_fidelity(
        emb, "embedding", "vec_id", dims=list(_MAT_DIMS), sample_mod=10
    )


# --------------------------------------------------------------------------
# x247 — stratified shard interleave: 10 length strata dealt round-robin
# across 8 shards; the (shard, stratum) count grid certifies every shard
# carries the same stratum mix (spread <= 1 by construction).
_INTERLEAVE_SQL = """
WITH t AS (SELECT doc_id,
                  CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id) AS INT)
                      AS stratum
           FROM documents),
     d AS (SELECT stratum,
                  CAST((ROW_NUMBER() OVER (PARTITION BY stratum
                                           ORDER BY doc_id) - 1) % 8 AS INT)
                      AS shard
           FROM t)
SELECT shard, stratum, COUNT(*) AS n_docs
FROM d GROUP BY shard, stratum ORDER BY shard, stratum"""


@register("x247_shard_interleave", _INTERLEAVE_SQL)
def x247(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    return textops.stratified_shard_interleave(
        docs, "doc_id", "n_chars", n_strata=10, n_shards=8
    )


# --------------------------------------------------------------------------
# x248 — sequence-capacity planning: truncation loss, pad-to-capacity
# waste, and concat-packing shard count at four candidate capacities.
# Exact integer sums per capacity; fractions derived from those integers.
_CAPS = (64, 128, 256, 512)
_CAP_SQL = f"""
WITH tok AS (SELECT CAST(len({_TOK}) AS BIGINT) AS t FROM documents),
     caps AS (SELECT CAST(c AS INT) AS capacity
              FROM (VALUES {", ".join(f"({c})" for c in _CAPS)}) x(c)),
     per AS (SELECT capacity, t FROM tok CROSS JOIN caps),
     agg AS (SELECT capacity,
                    COUNT(*) AS n_docs,
                    SUM(CASE WHEN t > capacity THEN 1 ELSE 0 END)
                        AS n_overflow,
                    SUM(t) AS total_tokens,
                    SUM(CASE WHEN t > capacity THEN t - capacity ELSE 0 END)
                        AS trunc_loss,
                    SUM(CAST(CEIL(CAST(t AS DOUBLE)
                                  / CAST(capacity AS DOUBLE)) AS BIGINT))
                        AS pad_shards
             FROM per GROUP BY capacity)
SELECT capacity,
       CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_overflow AS BIGINT) AS n_overflow,
       CAST(total_tokens AS BIGINT) AS total_tokens,
       ROUND(CAST(trunc_loss AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
           AS trunc_loss_frac,
       CAST(pad_shards AS BIGINT) AS pad_shards,
       ROUND(CAST(pad_shards * capacity - total_tokens AS DOUBLE)
             / CAST(pad_shards * capacity AS DOUBLE), 6) AS pad_waste_frac,
       CAST(CEIL(CAST(total_tokens AS DOUBLE)
                 / CAST(capacity AS DOUBLE)) AS BIGINT) AS concat_shards
FROM agg ORDER BY capacity"""


@register("x248_packing_capacity_audit", _CAP_SQL)
def x248(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = textops.with_token_count(
        load_table(spark, sf, "documents"), "text"
    )
    return textops.packing_capacity_audit(docs, "n_tokens", list(_CAPS))


# --------------------------------------------------------------------------
# x249 — LSH banding planner: one permissive candidate pass measures the
# corpus's candidate-similarity profile (signature-agreement estimator,
# granularity 1/8); each (bands, rows) factorization of the 8-hash
# budget reads off its expected recall on that profile via the s-curve
# 1-(1-s^r)^b — exponents expanded as literal multiplication chains in
# BOTH engines (no float pow); per-bin contributions round to 12 and
# sum as exact decimals.
def _x249_mh_comp(i: int) -> str:
    block, slot = i // 4, i % 4
    return (
        f"list_min(list_transform(shs,"
        f" s -> substr(md5('{block}:' || s), {slot * 8 + 1}, 8)))"
    )


def _x249_chain(base: str, k: int) -> str:
    out = "1.0"
    for _ in range(k):
        out = f"({out} * {base})"
    return out


def _x249_sql() -> str:
    comps = ",\n                ".join(
        f"{_x249_mh_comp(i)} AS sig{i}" for i in range(8)
    )
    bands_keys = ", ".join(
        f"'{b}|' || sig{2 * b} || '|' || sig{2 * b + 1}" for b in range(4)
    )
    agree = " + ".join(
        f"(CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END)" for i in range(8)
    )
    blocks = []
    for bands in (1, 2, 4, 8):
        r = 8 // bands
        p_band = _x249_chain("s", r)
        p_any = f"(1.0 - {_x249_chain(f'(1.0 - {p_band})', bands)})"
        thr = round((1.0 / bands) ** (1.0 / r), 6)
        blocks.append(
            f"""
  SELECT {bands} AS bands, {r} AS rows_per_band,
         CAST({thr!r} AS DOUBLE) AS threshold_est,
         ROUND(CAST(SUM(CAST(ROUND(frac * {p_any}, 12)
                             AS DECIMAL(18,12))) AS DOUBLE), 6)
             AS expected_recall
  FROM profile"""
        )
    union = "\nUNION ALL".join(blocks)
    return f"""
WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
     sh AS (SELECT doc_id,
                   list_transform(range(1, len(ts)),
                                  i -> ts[i] || ' ' || ts[i + 1]) AS shs
            FROM tok),
     sig AS (SELECT doc_id,
                {comps}
             FROM sh),
     bnd AS (SELECT doc_id, unnest([{bands_keys}]) AS band_key FROM sig),
     cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bnd a JOIN bnd b USING (band_key)
              WHERE a.doc_id < b.doc_id),
     est AS (SELECT {agree} AS k
             FROM cand c JOIN sig a ON c.id_a = a.doc_id
                         JOIN sig b ON c.id_b = b.doc_id),
     hist AS (SELECT k, COUNT(*) AS cnt FROM est GROUP BY k),
     tot AS (SELECT SUM(cnt) AS t FROM hist),
     profile AS (SELECT CAST(k AS DOUBLE) / 8.0 AS s,
                        CAST(cnt AS DOUBLE) / CAST(t AS DOUBLE) AS frac
                 FROM hist CROSS JOIN tot)
{union}
ORDER BY bands"""


@register("x249_lsh_banding_planner", _x249_sql())
def x249(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    docs = load_table(spark, sf, "documents")
    return dedup.lsh_banding_planner(
        docs, "text", "doc_id", num_hashes=8, probe_bands=4, shingle_n=2
    )


# --------------------------------------------------------------------------
# x250 — water-filling source allocation: the unique level L with
# Σ min(avail_s, L) = 0.9 · total, via the sorted-prefix closed form
# (capped set is an ascending prefix; source is an explicit tie-break
# so the written cumsum order is total).  All post-agg frames are
# |sources|-bounded.  EXACT INTEGER arithmetic end-to-end (r8 VERDICT
# hardening: a DuckDB-version round()/cast ulp cannot flip the hash):
# budget_frac 0.9 = 9/10 exactly; cap test cross-multiplied
# (avail·remaining·10 <= total·9 − cum_before·10, all BIGINT); level
# emitted in micro-tokens via floor division // — trunc == floor here
# because both operands are provably non-negative.
_WF_SQL = f"""
WITH tok AS (SELECT source, CAST(len({_TOK}) AS BIGINT) AS t FROM documents),
     per AS (SELECT source, CAST(SUM(t) AS BIGINT) AS avail
             FROM tok GROUP BY source),
     tot AS (SELECT CAST(SUM(avail) AS BIGINT) AS total,
                    CAST(COUNT(*) AS BIGINT) AS n
             FROM per),
     cum AS (SELECT source, avail,
                    CAST(SUM(avail) OVER (ORDER BY avail, source
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS c,
                    CAST(ROW_NUMBER() OVER (ORDER BY avail, source)
                        AS BIGINT) AS i
             FROM per),
     staged AS (SELECT source, avail, total, n,
                       CAST(c - avail AS BIGINT) AS cum_before,
                       CAST(n - i + 1 AS BIGINT) AS remaining
                FROM cum CROSS JOIN tot),
     flagged AS (SELECT *,
                        CASE WHEN avail * remaining * 10
                                  <= total * 9 - cum_before * 10
                             THEN 1 ELSE 0 END AS capped
                 FROM staged),
     lvl AS (SELECT CASE WHEN MAX(n) > SUM(capped)
                         THEN CAST((MAX(total) * 9 * 100000
                               - SUM(CASE WHEN capped = 1
                                          THEN avail ELSE 0 END) * 1000000)
                              // (MAX(n) - SUM(capped)) AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END AS level_micro
             FROM flagged)
SELECT source, avail AS avail_tokens,
       CAST(CASE WHEN capped = 1 THEN avail * 1000000
                 ELSE level_micro END AS BIGINT) AS alloc_micro_tokens,
       capped
FROM flagged CROSS JOIN lvl ORDER BY source"""


@register("x250_waterfill_allocation", _WF_SQL)
def x250(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import sampling, textops

    docs = textops.with_token_count(
        load_table(spark, sf, "documents"), "text"
    )
    return sampling.waterfill_source_allocation(
        docs, "source", "n_tokens", budget_frac=0.9
    )


# --------------------------------------------------------------------------
# x251 — GroupKFold integrity: md5-hash fold per user, with the
# no-straddle proof measured from the data (max_folds_per_group = 1).
_GF_SQL = """
WITH folded AS (SELECT user_id AS g,
                       CAST(CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)),
                                                 1, 8)) AS BIGINT) % 5 AS INT)
                           AS fold
                FROM events),
     pg AS (SELECT g, COUNT(DISTINCT fold) AS nf, COUNT(*) AS rws,
                   MIN(fold) AS fold
            FROM folded GROUP BY g),
     integ AS (SELECT CAST(MAX(nf) AS INT) AS max_folds_per_group FROM pg)
SELECT fold, COUNT(*) AS n_groups, CAST(SUM(rws) AS BIGINT) AS n_rows,
       max_folds_per_group
FROM pg CROSS JOIN integ
GROUP BY fold, max_folds_per_group ORDER BY fold"""


@register("x251_group_fold_split", _GF_SQL)
def x251(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import sampling

    ev = load_table(spark, sf, "events").select("user_id")
    return sampling.group_fold_assignment(ev, "user_id", n_folds=5)


# --------------------------------------------------------------------------
# x252 — embargoed time split: cutoff at 70% of the epoch span, 1-day
# embargo, leaky-group readout (groups on both sides — reported, not
# hidden).  Epoch arithmetic in doubles, one written operation order.
_EMB_SQL = """
WITH e AS (SELECT epoch(ts) AS ep, user_id AS g FROM events),
     b AS (SELECT MIN(ep) AS mn, MAX(ep) AS mx FROM e),
     tagged AS (SELECT g,
                       CASE WHEN ep <= mn + 0.7 * (mx - mn) THEN 'train'
                            WHEN ep <= mn + 0.7 * (mx - mn) + 86400.0
                                THEN 'embargo'
                            ELSE 'test' END AS side
                FROM e CROSS JOIN b),
     pg AS (SELECT g,
                   MAX(CASE WHEN side = 'train' THEN 1 ELSE 0 END) AS tr,
                   MAX(CASE WHEN side = 'test' THEN 1 ELSE 0 END) AS te
            FROM tagged GROUP BY g),
     counts AS (SELECT CAST(SUM(CASE WHEN side = 'train' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_train,
                       CAST(SUM(CASE WHEN side = 'embargo' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_embargoed,
                       CAST(SUM(CASE WHEN side = 'test' THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_test
                FROM tagged),
     grp AS (SELECT CAST(SUM(tr) AS BIGINT) AS n_groups_train,
                    CAST(SUM(te) AS BIGINT) AS n_groups_test,
                    CAST(SUM(tr * te) AS BIGINT) AS n_leaky_groups
             FROM pg)
SELECT * FROM counts CROSS JOIN grp"""


@register("x252_embargo_split", _EMB_SQL)
def x252(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import sampling

    ev = load_table(spark, sf, "events").select("ts", "user_id")
    return sampling.embargo_split_audit(
        ev, "ts", "user_id", train_frac=0.7, embargo_days=1.0
    )


# --------------------------------------------------------------------------
# x253 — finite-horizon Markov conversion per channel (the x192
# absorbing-chain family's SQL-checkable member): v_{k+1}(s) = b(s) +
# sum_s' P(s,s') v_k(s'), unrolled 8 times as chained CTEs.  Products
# round to 12 and sum as exact decimals (order-free); each iterate
# rounds to 12; P/b are exact-count ratios.
_HORIZON = 8


def _x253_sql(horizon: int = _HORIZON) -> str:
    steps = []
    prev = "v0"
    for k in range(1, horizon + 1):
        steps.append(
            f"""     v{k} AS (SELECT st.s,
                  ROUND(COALESCE(b.p, 0.0)
                        + CAST(COALESCE(tsum.x, 0) AS DOUBLE), 12) AS v
           FROM states st
           LEFT JOIN conv_b b ON b.s = st.s
           LEFT JOIN (SELECT m.s,
                             SUM(CAST(ROUND(m.p * {prev}.v, 12)
                                      AS DECIMAL(28,12))) AS x
                      FROM m JOIN {prev} ON m.t = {prev}.s
                      GROUP BY m.s) tsum ON tsum.s = st.s)"""
        )
        prev = f"v{k}"
    chain = ",\n".join(steps)
    return f"""
WITH e AS (SELECT user_id AS u, ts, event_id AS id, event_type AS st,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS cv
           FROM events),
     j AS (SELECT *,
                  COALESCE(SUM(cv) OVER (PARTITION BY u ORDER BY ts, id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS jr
           FROM e),
     s AS (SELECT u, jr, st, cv,
                  ROW_NUMBER() OVER (PARTITION BY u, jr ORDER BY ts, id)
                      AS pos,
                  LEAD(st) OVER (PARTITION BY u, jr ORDER BY ts, id) AS nxt
           FROM j),
     tr AS (SELECT 'START' AS state,
                   CASE WHEN cv = 1 THEN 'CONV' ELSE st END AS next_state
            FROM s WHERE pos = 1
            UNION ALL
            SELECT st,
                   CASE WHEN nxt IS NULL THEN 'DROP'
                        WHEN nxt = 'purchase' THEN 'CONV'
                        ELSE nxt END
            FROM s WHERE cv = 0),
     cnt AS (SELECT state, next_state, COUNT(*) AS n
             FROM tr GROUP BY state, next_state),
     rs AS (SELECT state, SUM(n) AS tot FROM cnt GROUP BY state),
     m AS (SELECT c.state AS s, c.next_state AS t,
                  CAST(c.n AS DOUBLE) / CAST(r.tot AS DOUBLE) AS p
           FROM cnt c JOIN rs r ON c.state = r.state),
     states AS (SELECT DISTINCT s FROM m WHERE s NOT IN ('CONV', 'DROP')),
     conv_b AS (SELECT s, p FROM m WHERE t = 'CONV'),
     v0 AS (SELECT s, CAST(0.0 AS DOUBLE) AS v FROM states),
{chain}
SELECT s AS state, ROUND(v, 6) AS p_conv_h FROM v{horizon} ORDER BY state"""


@register("x253_markov_horizon_conversion", _x253_sql())
def x253(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return events.markov_conversion_horizon(
        ev, "user_id", "ts", "event_id", "event_type", "purchase",
        horizon=_HORIZON,
    )


# --------------------------------------------------------------------------
# x254 — LSH-bucket balanced diversity sample: the oracle-checked
# sibling of the rows-only k-means x72 (every step closed-form: seeded
# plane literals shared by both engines, md5 rank, keyed window).
# Completes the pattern where each non-SQL family carries an
# oracle-checked member (x192->x253, x200->x233, x72->x254).
_X254_DIM, _X254_PLANES_N, _X254_SEED, _X254_K = 64, 4, 42, 3


def _x254_sql() -> str:
    from flashml_spark.operators.similarity import random_hyperplanes

    planes = random_hyperplanes(_X254_DIM, _X254_PLANES_N, _X254_SEED)
    bucket_terms = " + ".join(
        "(CASE WHEN list_dot_product(v, [{plane}]) > 0 THEN {bit} ELSE 0 END)".format(
            plane=", ".join(repr(x) for x in plane), bit=1 << b
        )
        for b, plane in enumerate(planes)
    )
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     b AS (SELECT vec_id, CAST({bucket_terms} AS BIGINT) AS bucket FROM e),
     r AS (SELECT bucket, vec_id,
                  CAST(('0x' || substr(md5(CAST(vec_id AS VARCHAR)), 1, 8))
                       AS BIGINT) AS rk
           FROM b),
     p AS (SELECT bucket, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY bucket
                                     ORDER BY rk, vec_id) AS pick
           FROM r)
SELECT bucket, vec_id, CAST(pick AS INT) AS pick
FROM p WHERE pick <= {_X254_K} ORDER BY bucket, pick"""


@register("x254_bucket_balanced_sample", _x254_sql())
def x254(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return similarity.bucket_balanced_sample(
        emb, "embedding", "vec_id", k_per_bucket=_X254_K,
        n_planes=_X254_PLANES_N, seed=_X254_SEED,
    )
