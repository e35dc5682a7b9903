"""Extension queries, round 4 seventh batch (x135..x142): the
retrieval / data-mixing surface a training-data pipeline still lacked —
BM25 full-text ranking, temperature-scaled mixture weights, a
deterministic bottom-k-hash sample, strict-prefix containment dedup
(truncated duplicates), n-gram novelty scoring, Jensen-Shannon drift
between sources, last-touch conversion attribution, and a deterministic
weighted interleave of sources into one training stream.

Oracle discipline unchanged: portable SQL, shared literals/aliases,
deterministic tie-breaks, floats rounded (6 for scores/probabilities,
2 for money).  Every float that feeds an ORDER BY ... LIMIT is rounded
BEFORE ranking so the k-boundary is stable across summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import dedup, events, sampling, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table

_BM25_TERMS = ["spark", "hash", "window"]


# --------------------------------------------------------------------------
# x135 — BM25 top-10 for a bag-of-words query: inverted-index posting
# intersection expressed relationally (token-IN filter bounds every frame
# after tokenization by documents-containing-a-query-term).
@register(
    "x135_bm25_topk",
    f"""WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token
                     FROM documents WHERE text IS NOT NULL),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                         AVG(dl) AS avgdl FROM dl),
        q AS (SELECT * FROM tok
              WHERE token IN ('spark', 'hash', 'window')),
        dfq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
                FROM q GROUP BY token),
        tf AS (SELECT doc_id, token, COUNT(*) AS tf
               FROM q GROUP BY doc_id, token),
        sc AS (SELECT tf.doc_id,
                      ROUND(SUM(ln((stats.n_docs - dfq.df + 0.5)
                                   / (dfq.df + 0.5) + 1.0)
                                * tf.tf * (1.2 + 1.0)
                                / (tf.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * dl.dl / stats.avgdl))), 6) AS bm25
               FROM tf JOIN dfq USING (token)
                       JOIN dl ON tf.doc_id = dl.doc_id
                       CROSS JOIN stats
               GROUP BY tf.doc_id)
       SELECT doc_id, bm25 FROM sc ORDER BY bm25 DESC, doc_id LIMIT 10""",
)
def x135(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.bm25_topk(docs, "text", "doc_id", _BM25_TERMS, k=10)


# --------------------------------------------------------------------------
# x136 — temperature-scaled language mixture (mT5 convention: p ~ n^alpha,
# alpha = 0.7): the sampling schedule that upsamples tail languages.
@register(
    "x136_temperature_mix",
    """WITH c AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
        s AS (SELECT lang, n_docs, pow(CAST(n_docs AS DOUBLE), 0.7) AS w FROM c),
        t AS (SELECT CAST(SUM(n_docs) AS DOUBLE) AS nt, SUM(w) AS wt FROM s)
       SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
              ROUND(n_docs / t.nt, 6) AS p_raw,
              ROUND(w / t.wt, 6) AS p_temp,
              ROUND((w / t.wt) / (n_docs / t.nt), 6) AS epochs
       FROM s CROSS JOIN t""",
)
def x136(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("lang")
    return sampling.temperature_mixture(docs, "lang", temperature=0.7)


# --------------------------------------------------------------------------
# x137 — deterministic uniform 5-per-source sample via bottom-k id hashes:
# stable across runs, partitionings, engines, and corpus appends.
@register(
    "x137_bottomk_sample",
    """WITH h AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
                  FROM documents),
        r AS (SELECT doc_id, source,
                     CAST(ROW_NUMBER() OVER (PARTITION BY source
                                             ORDER BY h, doc_id) AS BIGINT) AS rk
              FROM h)
       SELECT doc_id, source, rk FROM r WHERE rk <= 5""",
)
def x137(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    return sampling.bottomk_hash_sample(docs, "source", "doc_id", k=5)


# --------------------------------------------------------------------------
# x138 — strict-prefix containment: documents that are a truncated copy
# of a longer document.  The oracle is the quadratic definition; the
# engine path blocks on a fixed-width prefix key (equi-join, never LIKE).
@register(
    "x138_prefix_containment",
    """SELECT DISTINCT a.doc_id
       FROM documents a JOIN documents b
         ON length(a.text) < length(b.text)
        AND substr(b.text, 1, length(a.text)) = a.text
       WHERE a.text IS NOT NULL AND b.text IS NOT NULL
         AND length(a.text) > 0""",
)
def x138(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return dedup.prefix_containment(docs, "text", "doc_id", block_len=20)


# --------------------------------------------------------------------------
# x139 — per-document trigram novelty: fraction of a doc's DISTINCT word
# trigrams that no smaller-id document contains (curation contribution
# score).  Docs with < 3 tokens have no trigrams and drop out.
@register(
    "x139_ngram_novelty",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents
                     WHERE text IS NOT NULL),
        g AS (SELECT DISTINCT doc_id,
                     ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS gram
              FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r),
        f AS (SELECT gram, MIN(doc_id) AS first_id FROM g GROUP BY gram),
        p AS (SELECT g.doc_id, COUNT(*) AS n_grams,
                     SUM(CASE WHEN f.first_id = g.doc_id THEN 1 ELSE 0 END)
                         AS n_novel
              FROM g JOIN f USING (gram) GROUP BY g.doc_id)
       SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
              CAST(n_novel AS BIGINT) AS n_novel,
              ROUND(n_novel * 1.0 / n_grams, 6) AS novelty
       FROM p""",
)
def x139(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.ngram_novelty(docs, "text", "doc_id", n=3)


# --------------------------------------------------------------------------
# x140 — Jensen-Shannon divergence between every pair of sources' unigram
# distributions: the corpus-drift audit (0 = identical, ln 2 = disjoint).
@register(
    "x140_source_jsd",
    f"""WITH tok AS (SELECT source AS g, unnest({_TOK}) AS token
                     FROM documents WHERE text IS NOT NULL),
        tc AS (SELECT g, token, CAST(COUNT(*) AS DOUBLE) AS n
               FROM tok GROUP BY g, token),
        tot AS (SELECT g, SUM(n) AS total FROM tc GROUP BY g),
        pairs AS (SELECT a.g AS src_a, b.g AS src_b
                  FROM tot a, tot b WHERE a.g < b.g),
        ua AS (SELECT p.src_a, p.src_b, c.token, c.n AS na
               FROM pairs p JOIN tc c ON c.g = p.src_a),
        ub AS (SELECT p.src_a, p.src_b, c.token, c.n AS nb
               FROM pairs p JOIN tc c ON c.g = p.src_b),
        j AS (SELECT COALESCE(ua.src_a, ub.src_a) AS src_a,
                     COALESCE(ua.src_b, ub.src_b) AS src_b,
                     COALESCE(ua.token, ub.token) AS token,
                     COALESCE(na, 0) AS na, COALESCE(nb, 0) AS nb
              FROM ua FULL OUTER JOIN ub
                ON ua.src_a = ub.src_a AND ua.src_b = ub.src_b
               AND ua.token = ub.token),
        wp AS (SELECT j.src_a, j.src_b,
                      j.na / ta.total AS p, j.nb / tb.total AS q
               FROM j JOIN tot ta ON ta.g = j.src_a
                      JOIN tot tb ON tb.g = j.src_b)
       SELECT src_a, src_b,
              ROUND(SUM(CASE WHEN p > 0
                             THEN 0.5 * p * ln(p / ((p + q) / 2)) ELSE 0 END
                      + CASE WHEN q > 0
                             THEN 0.5 * q * ln(q / ((p + q) / 2)) ELSE 0 END),
                    6) AS jsd
       FROM wp GROUP BY src_a, src_b""",
)
def x140(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("source", "text")
    return textops.source_js_divergence(docs, "text", "source")


# --------------------------------------------------------------------------
# x141 — last-touch conversion attribution: credit each purchase to the
# user's most recent PRIOR non-purchase event type.
@register(
    "x141_last_touch",
    """WITH t AS (SELECT event_type, value,
                         LAST_VALUE(CASE WHEN event_type <> 'purchase'
                                         THEN event_type END IGNORE NULLS)
                             OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS channel
                  FROM events)
       SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_conversions,
              ROUND(SUM(value), 2) AS total_value
       FROM t WHERE event_type = 'purchase' GROUP BY channel""",
)
def x141(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "ts", "value"
    )
    return events.last_touch_attribution(ev)


# --------------------------------------------------------------------------
# x142 — deterministic weighted interleave of five sources into one
# training stream (head of the schedule): row r of a weight-w source sits
# at virtual position (r - 0.5) / w; positions are pure functions of the
# id hash, so the schedule is reproducible anywhere.
_ILV_WEIGHTS = {"src0": 5.0, "src1": 4.0, "src2": 3.0, "src3": 2.0, "src4": 1.0}

@register(
    "x142_weighted_interleave",
    """WITH f AS (SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS h
                  FROM documents
                  WHERE source IN ('src0', 'src1', 'src2', 'src3', 'src4')),
        r AS (SELECT doc_id, source,
                     ROW_NUMBER() OVER (PARTITION BY source
                                        ORDER BY h, doc_id) AS rk
              FROM f),
        w AS (SELECT doc_id, source,
                     ROUND((rk - 0.5) / (CASE source
                         WHEN 'src0' THEN 5.0 WHEN 'src1' THEN 4.0
                         WHEN 'src2' THEN 3.0 WHEN 'src3' THEN 2.0
                         ELSE 1.0 END), 6) AS pos
              FROM r)
       SELECT doc_id, source, pos FROM w
       ORDER BY pos, source, doc_id LIMIT 50""",
)
def x142(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "source")
    out = sampling.weighted_interleave(docs, "source", "doc_id", _ILV_WEIGHTS)
    return out.orderBy("pos", "source", "doc_id").limit(50)
