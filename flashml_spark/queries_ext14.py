"""Extension queries, round 5 third wave (x178+): benchmark
decontamination (train/eval n-gram overlap, the GPT-3 appendix-C /
Llama recipe), a corpus-unigram log-probability quality score (the
cheap stand-in for CCNet's LM-perplexity filter), a single-pass
pairwise correlation matrix (the collinearity screen before feature
assembly), and a first-order Markov transition matrix over per-user
event sequences (next-event product analytics).

Oracle discipline unchanged: engine-portable DuckDB SQL sharing every
literal and alias with the Spark side, deterministic splits (id
modulus, never random), floats rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import events, relational, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# x178 — eval-set decontamination: documents table split by id modulus
# into a held-out eval shard (doc_id % 17 = 0) and a train shard; every
# train document reports the fraction of its DISTINCT word 5-grams that
# any eval document contains.  Docs shorter than 5 tokens drop out
# (no grams), matching x139's contract.  Quantifies what x55's
# contamination SCAN only flags: x55 answers "touched at all?"
# (3-grams, boolean), this reports per-document overlap mass (5-grams,
# fraction) — the number a redact-or-drop policy thresholds on.
_DECON_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents
             WHERE text IS NOT NULL),
     g AS (SELECT DISTINCT doc_id,
                  ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] || ' ' ||
                  ts[i + 3] || ' ' || ts[i + 4] AS gram
           FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 3)) AS i) r),
     e AS (SELECT DISTINCT gram FROM g WHERE doc_id % 17 = 0),
     t AS (SELECT doc_id, gram FROM g WHERE doc_id % 17 <> 0),
     p AS (SELECT t.doc_id, COUNT(*) AS n_grams,
                  SUM(CASE WHEN e.gram IS NOT NULL THEN 1 ELSE 0 END) AS n_hit
           FROM t LEFT JOIN e USING (gram) GROUP BY t.doc_id)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_hit AS BIGINT) AS n_hit,
       ROUND(n_hit * 1.0 / n_grams, 6) AS contamination
FROM p"""


@register("x178_decontamination", _DECON_SQL)
def x178(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    train = docs.where(F.col("doc_id") % 17 != 0)
    eval_df = docs.where(F.col("doc_id") % 17 == 0)
    return textops.decontamination_audit(train, eval_df, "text", "doc_id", n=5)


# --------------------------------------------------------------------------
# x179 — corpus-unigram log-probability quality score: per-document mean
# ln p(token) under the corpus's own MLE unigram model (CCNet's
# perplexity filter with the LM swapped for the corpus unigram counts).
_ULOGP_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents
             WHERE text IS NOT NULL),
     c AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS n_w
           FROM tok GROUP BY token),
     tot AS (SELECT SUM(n_w) AS total FROM c),
     p AS (SELECT t.doc_id, COUNT(*) AS n_tokens, AVG(ln(c.n_w)) AS avg_ln_n
           FROM tok t JOIN c USING (token) GROUP BY t.doc_id)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       ROUND(avg_ln_n - ln(tot.total), 6) AS avg_logp
FROM p CROSS JOIN tot"""


@register("x179_unigram_logprob", _ULOGP_SQL)
def x179(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.unigram_logprob_score(docs, "text", "doc_id")


# --------------------------------------------------------------------------
# x180 — pairwise Pearson correlation matrix over lineitem's numeric
# columns: all pairs compiled into ONE aggregation pass (the
# collinearity screen before feature assembly).  Generalizes x54's
# fixed 1-row corr stats into an any-column-list tidy report, and
# fixes the constant-column case (`F.corr` raises under ANSI;
# this yields NULL like SQL engines).
_CORR_SQL = """
WITH one AS (SELECT
    corr(CAST(l_quantity AS DOUBLE), CAST(l_extendedprice AS DOUBLE)) AS c0,
    corr(CAST(l_quantity AS DOUBLE), CAST(l_discount AS DOUBLE)) AS c1,
    corr(CAST(l_quantity AS DOUBLE), CAST(l_tax AS DOUBLE)) AS c2,
    corr(CAST(l_extendedprice AS DOUBLE), CAST(l_discount AS DOUBLE)) AS c3,
    corr(CAST(l_extendedprice AS DOUBLE), CAST(l_tax AS DOUBLE)) AS c4,
    corr(CAST(l_discount AS DOUBLE), CAST(l_tax AS DOUBLE)) AS c5
  FROM lineitem)
SELECT r.col_a, r.col_b, ROUND(r.c, 6) AS pearson_r
FROM one, LATERAL (VALUES
    ('l_quantity', 'l_extendedprice', one.c0),
    ('l_quantity', 'l_discount', one.c1),
    ('l_quantity', 'l_tax', one.c2),
    ('l_extendedprice', 'l_discount', one.c3),
    ('l_extendedprice', 'l_tax', one.c4),
    ('l_discount', 'l_tax', one.c5)
) AS r(col_a, col_b, c)"""


@register("x180_correlation_matrix", _CORR_SQL)
def x180(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return relational.correlation_matrix(
        li, ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    )


# --------------------------------------------------------------------------
# x181 — first-order Markov transition matrix over per-user event
# sequences: P(next event type | event type), ordered by (ts,
# event_id) within each user.  Each user's final event has no
# successor and drops out.
_MARKOV_SQL = """
WITH s AS (SELECT event_type AS state,
                  LEAD(event_type) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS next_state
           FROM events),
     c AS (SELECT state, next_state, COUNT(*) AS n
           FROM s WHERE next_state IS NOT NULL GROUP BY state, next_state)
SELECT state, next_state, CAST(n AS BIGINT) AS n,
       ROUND(n * 1.0 / SUM(n) OVER (PARTITION BY state), 6) AS p
FROM c"""


@register("x181_markov_transitions", _MARKOV_SQL)
def x181(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return events.markov_transitions(ev, "user_id", "ts", "event_id", "event_type")


# --------------------------------------------------------------------------
# x182 — RFM segmentation: per-user recency (µs vs the corpus max ts) /
# frequency / monetary, each cut into global NTILE(5) tiles with
# (metric, user_id) tie-breaks.  The Spark side rebuilds NTILE from a
# scale-safe global row number (range partition + offsets), never a
# single-partition window over |users|.
_RFM_SQL = """
WITH a AS (SELECT MAX(ts) AS anchor FROM events),
     u AS (SELECT user_id,
                  CAST(epoch_us((SELECT anchor FROM a)) - epoch_us(MAX(ts))
                       AS BIGINT) AS recency_us,
                  CAST(COUNT(*) AS BIGINT) AS frequency,
                  ROUND(COALESCE(SUM(value), 0), 6) AS monetary
           FROM events GROUP BY user_id),
     t AS (SELECT user_id, recency_us, frequency, monetary,
                  CAST(NTILE(5) OVER (ORDER BY recency_us, user_id) AS BIGINT)
                      AS r_tile,
                  CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS BIGINT)
                      AS f_tile,
                  CAST(NTILE(5) OVER (ORDER BY monetary, user_id) AS BIGINT)
                      AS m_tile
           FROM u)
SELECT user_id, recency_us, frequency, monetary, r_tile, f_tile, m_tile,
       r_tile || '-' || f_tile || '-' || m_tile AS rfm
FROM t"""


@register("x182_rfm_segments", _RFM_SQL)
def x182(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts", "value")
    return events.rfm_segments(ev, "user_id", "ts", "value", buckets=5)


# --------------------------------------------------------------------------
# x183 — per-document top-3 tf·idf keywords (idf = ln(N/df), rounded
# score as the sort key on BOTH sides; ties break token-ascending).
_KEYWORDS_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents
             WHERE text IS NOT NULL),
     tf AS (SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
            FROM tok GROUP BY doc_id, token),
     d AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS dfq FROM tf
           GROUP BY token),
     n AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM documents
           WHERE text IS NOT NULL),
     s AS (SELECT tf.doc_id, tf.token, tf.tf,
                  ROUND(tf.tf * ln(n.nd / d.dfq), 6) AS score
           FROM tf JOIN d USING (token) CROSS JOIN n),
     r AS (SELECT s.*, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY score DESC, token ASC) AS BIGINT) AS rk
           FROM s)
SELECT doc_id, token, tf, score, rk FROM r WHERE rk <= 3"""


@register("x183_tfidf_keywords", _KEYWORDS_SQL)
def x183(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.tfidf_keywords(docs, "text", "doc_id", k=3)


# --------------------------------------------------------------------------
# x184 — Kaplan-Meier survival over user lifetimes (days first→last
# event), right-censored at the corpus max day.  Cumulative windows run
# over the |distinct lifetime days| POST-AGG frame (value-domain
# bounded); the zero-survival flag sidesteps ln(0) (NULL in Spark,
# -inf elsewhere).
_KM_SQL = """
WITH u AS (SELECT user_id,
                  date_diff('day', MIN(CAST(ts AS DATE)), MAX(CAST(ts AS DATE)))
                      AS t,
                  CASE WHEN MAX(CAST(ts AS DATE)) =
                            (SELECT MAX(CAST(ts AS DATE)) FROM events)
                       THEN 1 ELSE 0 END AS cens
           FROM events GROUP BY user_id),
     n AS (SELECT COUNT(*) AS total FROM u),
     g AS (SELECT t, COUNT(*) AS ending,
                  SUM(1 - cens) AS deaths, SUM(cens) AS censored_n
           FROM u GROUP BY t),
     w AS (SELECT g.*, n.total - SUM(ending) OVER (ORDER BY t) + ending
                      AS at_risk
           FROM g CROSS JOIN n),
     s AS (SELECT *,
                  MAX(CASE WHEN deaths >= at_risk THEN 1 ELSE 0 END)
                      OVER (ORDER BY t) AS dead_all,
                  SUM(CASE WHEN deaths < at_risk
                           THEN ln(1.0 - deaths * 1.0 / at_risk)
                           ELSE 0.0 END) OVER (ORDER BY t) AS lnsum
           FROM w)
SELECT CAST(t AS BIGINT) AS t, CAST(at_risk AS BIGINT) AS at_risk,
       CAST(deaths AS BIGINT) AS deaths,
       CAST(censored_n AS BIGINT) AS censored_n,
       ROUND(CASE WHEN dead_all = 1 THEN 0.0 ELSE exp(lnsum) END, 6)
           AS survival
FROM s"""


@register("x184_km_survival", _KM_SQL)
def x184(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    return events.kaplan_meier_survival(ev, "user_id", "ts")


# --------------------------------------------------------------------------
# x185 — position-based (40/20/40) multi-touch attribution: per-user
# journeys between purchases; first/last touch take 0.4 each, middles
# split 0.2 (1.0 / 0.5-0.5 for one- / two-touch journeys).
_POSATTR_SQL = """
WITH e AS (SELECT user_id, event_id, ts, event_type,
                  CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS conv
           FROM events),
     j AS (SELECT *, COALESCE(SUM(conv) OVER (PARTITION BY user_id
                          ORDER BY ts, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                      0) AS journey
           FROM e),
     cj AS (SELECT DISTINCT user_id, journey FROM j WHERE conv = 1),
     t AS (SELECT j.user_id, j.journey, j.event_type, j.ts, j.event_id
           FROM j JOIN cj USING (user_id, journey) WHERE j.conv = 0),
     p AS (SELECT event_type,
                  ROW_NUMBER() OVER (PARTITION BY user_id, journey
                                     ORDER BY ts, event_id) AS pos,
                  COUNT(*) OVER (PARTITION BY user_id, journey) AS m
           FROM t),
     c AS (SELECT event_type AS channel,
                  CASE WHEN m = 1 THEN 1.0
                       WHEN m = 2 THEN 0.5
                       WHEN pos = 1 OR pos = m THEN 0.4
                       ELSE 0.2 / (m - 2) END AS credit
           FROM p)
SELECT channel, ROUND(SUM(credit), 6) AS credit,
       CAST(COUNT(*) AS BIGINT) AS n_touches
FROM c GROUP BY channel"""


@register("x185_position_attribution", _POSATTR_SQL)
def x185(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return events.position_attribution(
        ev, "user_id", "ts", "event_id", "event_type", "purchase"
    )
