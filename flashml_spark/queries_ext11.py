"""Extension queries, round 4 seventh-through-ninth batches
(x135..x150): the retrieval / data-mixing / statistical-audit surface —
BM25 full-text ranking, temperature-scaled mixture weights, a
deterministic bottom-k-hash sample, strict-prefix containment dedup
(truncated duplicates), n-gram novelty scoring, Jensen-Shannon drift
between sources, last-touch conversion attribution, a deterministic
weighted interleave of sources into one training stream, BPE tokenizer
training (unrolled-CTE oracle), a minhash sketch-calibration audit,
Heaps'-law vocabulary growth, per-dimension Fisher class separation,
grouped-data split-leakage auditing, Mann-Whitney U drift testing,
a Benford first-digit audit, and series autocorrelation.

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
from flashml_spark.sources.readers import load_table, local_rows

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


# --------------------------------------------------------------------------
# x143 — BPE tokenizer training, first 5 merge rules: the driver-side
# loop holds ONE row per round; the oracle unrolls the same 5 rounds as
# CTEs (pair count -> argmax -> greedy left-to-right merge).  Symbols
# are each wrapped in their OWN sentinel spaces (' a  b  c ', double
# space between neighbors) so one literal replace of ' a  b ' -> ' ab '
# is EXACTLY canonical greedy BPE in both engines: a match consumes
# only its own wrapper spaces, so disjoint adjacent occurrences all
# merge in one round while self-overlap still merges left-to-right.
def _bpe_oracle(k: int = 5) -> str:
    parts = [
        f"""WITH tok AS (SELECT unnest({_TOK}) AS word FROM documents
                     WHERE text IS NOT NULL),
        wf AS (SELECT word, COUNT(*) AS freq FROM tok GROUP BY word),
        w0 AS (SELECT regexp_replace(word, '(.)', ' \\1 ', 'g') AS r,
                      freq FROM wf)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""p{i} AS (SELECT s[j] || ' ' || s[j + 1] AS pair, SUM(freq) AS n
              FROM (SELECT string_split(trim(r), '  ') AS s, freq FROM w{i - 1}) t,
                   LATERAL (SELECT unnest(range(1, len(s))) AS j) L
              GROUP BY 1),
        b{i} AS (SELECT pair, replace(pair, ' ', '') AS merged, n
               FROM p{i} ORDER BY n DESC, pair LIMIT 1),
        w{i} AS (SELECT replace(r, ' ' || replace(b{i}.pair, ' ', '  ') || ' ',
                               ' ' || b{i}.merged || ' ') AS r, freq
               FROM w{i - 1}, b{i})"""
        )
    selects = " UNION ALL ".join(
        f"SELECT {i} AS merge_round, pair, merged, CAST(n AS BIGINT) AS n FROM b{i}"
        for i in range(1, k + 1)
    )
    return ",\n        ".join(parts) + f"\n       {selects}"


@register("x143_bpe_learn", _bpe_oracle(5))
def x143(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("text")
    return textops.bpe_learn(docs, "text", n_merges=5)


# --------------------------------------------------------------------------
# x144 — minhash sketch-calibration audit: on the EXACT near-dup pairs
# (lossless prefix-filter join), how far is the 8-hash minhash Jaccard
# estimate from the truth?  The measurement that sizes an LSH dedup's
# hash budget.  Threshold 0.8 — the high-similarity band LSH dedup
# actually targets; higher thresholds shrink prefixes, so the truth-set
# join is strictly cheaper than x132's 0.6 sweep.
def _mh_bigram_comp(i: int) -> str:
    # hash i = 8-hex slice i%4 of md5 digest block i//4, over BIGRAM shingles
    block, slot = i // 4, i % 4
    return (
        f"list_min(list_transform(sh, t -> substr(md5('{block}:' || t),"
        f" {slot * 8 + 1}, 8)))"
    )


def _x144_oracle(num_hashes: int = 8) -> str:
    comps = ",\n               ".join(
        f"{_mh_bigram_comp(i)} AS sig{i}" for i in range(num_hashes)
    )
    eq = " + ".join(
        f"(CASE WHEN a.sig{i} = b.sig{i} THEN 1 ELSE 0 END)"
        for i in range(num_hashes)
    )
    return f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        shl AS (SELECT doc_id,
                       list_transform(range(1, len(ts)),
                                      i -> ts[i] || ' ' || ts[i + 1]) AS sh
                FROM tok),
        sig AS (SELECT doc_id,
               {comps}
                FROM shl),
        shd AS (SELECT DISTINCT doc_id, unnest(sh) AS s FROM shl),
        sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM shd GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                   FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
        pairs AS (SELECT id_a, id_b,
                         ROUND(c * 1.0 / (sa.n_tok + sb.n_tok - c), 6) AS jaccard
                  FROM common
                  JOIN sizes sa ON common.id_a = sa.doc_id
                  JOIN sizes sb ON common.id_b = sb.doc_id
                  WHERE ROUND(c * 1.0 / (sa.n_tok + sb.n_tok - c), 6) >= 0.8),
        err AS (SELECT ({eq}) * 1.0 / {num_hashes} - p.jaccard AS e
                FROM pairs p JOIN sig a ON p.id_a = a.doc_id
                             JOIN sig b ON p.id_b = b.doc_id)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
              ROUND(AVG(ABS(e)), 6) AS mean_abs_err,
              ROUND(MAX(ABS(e)), 6) AS max_abs_err,
              ROUND(AVG(e), 6) AS bias
       FROM err"""


@register("x144_minhash_accuracy", _x144_oracle(8))
def x144(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return dedup.minhash_accuracy_audit(
        docs, "text", "doc_id", threshold=0.8, shingle_n=2, num_hashes=8
    )


# --------------------------------------------------------------------------
# x145 — Heaps'-law vocabulary growth: distinct token types introduced by
# each decile of the corpus (docs in id order) and the running total.
# Spark side buckets via the scale-safe global NTILE and accumulates via
# global_cumsum with a 10-row hint — no single-partition window over data.
@register(
    "x145_vocab_growth",
    f"""WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents
                     WHERE text IS NOT NULL),
        f AS (SELECT token, MIN(doc_id) AS first_doc FROM tok GROUP BY token),
        d AS (SELECT doc_id, CAST(NTILE(10) OVER (ORDER BY doc_id) AS BIGINT)
                     AS bucket
              FROM documents),
        n AS (SELECT d.bucket, COUNT(*) AS new_types
              FROM f JOIN d ON f.first_doc = d.doc_id GROUP BY d.bucket)
       SELECT bucket, CAST(new_types AS BIGINT) AS new_types,
              CAST(SUM(new_types) OVER (ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS cum_types
       FROM n""",
)
def x145(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.vocab_growth_curve(docs, "text", "doc_id", n_buckets=10)


# --------------------------------------------------------------------------
# x146 — per-dimension Fisher separation of the labeled embedding table:
# between-class over within-class variance, all moments spelled as
# explicit (n, Σv, Σv²) sums so both engines walk identical arithmetic.
@register(
    "x146_fisher_separation",
    """WITH comp AS (SELECT label, i AS dim, CAST(embedding[i] AS DOUBLE) AS v
                     FROM embeddings,
                          LATERAL (SELECT unnest(range(1, len(embedding) + 1))
                                   AS i) L),
        pc AS (SELECT label, dim, CAST(COUNT(*) AS DOUBLE) AS n_c,
                      SUM(v) AS s1, SUM(v * v) AS s2
               FROM comp GROUP BY label, dim),
        st AS (SELECT dim, n_c, s1, s1 / n_c AS mu_c,
                      s2 / n_c - (s1 / n_c) * (s1 / n_c) AS var_c
               FROM pc),
        o AS (SELECT dim, SUM(n_c) AS n, SUM(s1) AS t1,
                     SUM(n_c * var_c) AS w_num,
                     SUM(n_c * mu_c * mu_c) AS b_raw
              FROM st GROUP BY dim)
       SELECT CAST(dim AS BIGINT) AS dim,
              ROUND(b_raw / n - (t1 / n) * (t1 / n), 6) AS between_var,
              ROUND(w_num / n, 6) AS within_var,
              CASE WHEN w_num <> 0
                   THEN ROUND((b_raw / n - (t1 / n) * (t1 / n))
                              / (w_num / n), 6) END AS fisher
       FROM o""",
)
def x146(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding", "label")
    return similarity.fisher_separation(emb, "embedding", "label", "vec_id")


# --------------------------------------------------------------------------
# x147 — eval-leakage audit on grouped event data: ROW-level hash
# splitting scatters a user's events across folds (leaked_groups > 0);
# GROUP-level splitting keeps them together (leaked_groups = 0).
@register(
    "x147_split_leakage",
    """WITH r AS (SELECT user_id,
                         CASE WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                                   AS BIGINT) % 100 < 80 THEN 'train'
                              WHEN CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))
                                   AS BIGINT) % 100 < 90 THEN 'val'
                              ELSE 'test' END AS s
                  FROM events),
        rg AS (SELECT user_id, COUNT(DISTINCT s) AS ns FROM r GROUP BY user_id),
        g AS (SELECT user_id,
                     CASE WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 100 < 80 THEN 'train'
                          WHEN CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 100 < 90 THEN 'val'
                          ELSE 'test' END AS s
              FROM events),
        gg AS (SELECT user_id, COUNT(DISTINCT s) AS ns FROM g GROUP BY user_id)
       SELECT 'row_hash' AS method, CAST(COUNT(*) AS BIGINT) AS n_groups,
              CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                  AS leaked_groups
       FROM rg
       UNION ALL
       SELECT 'group_hash', CAST(COUNT(*) AS BIGINT),
              CAST(SUM(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
       FROM gg""",
)
def x147(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("event_id", "user_id")
    return sampling.split_leakage_audit(ev, "user_id", "event_id")


# --------------------------------------------------------------------------
# x148 — Mann-Whitney U between English and non-English document lengths:
# the rank-sum drift audit, computed over the VALUE DOMAIN (per-value
# counts + |distinct lengths| cumulative), never a global data rank.
@register(
    "x148_mannwhitney_u",
    """WITH c AS (SELECT n_chars AS v,
                         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) * 1.0 AS a,
                         SUM(CASE WHEN lang = 'en' THEN 0 ELSE 1 END) * 1.0 AS b
                  FROM documents GROUP BY n_chars),
        cu AS (SELECT a, b,
                      SUM(b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) - b AS b_below,
                      a + b AS t
               FROM c),
        ag AS (SELECT SUM(a * (b_below + b / 2)) AS u, SUM(a) AS na,
                      SUM(b) AS nb, SUM(t * t * t - t) AS tie3
               FROM cu)
       SELECT ROUND(u, 6) AS u_stat,
              CASE WHEN na * nb / 12 * ((na + nb + 1)
                        - tie3 / ((na + nb) * (na + nb - 1))) > 0
                   THEN ROUND((u - na * nb / 2)
                              / sqrt(na * nb / 12 * ((na + nb + 1)
                                     - tie3 / ((na + nb) * (na + nb - 1)))), 6)
              END AS z,
              CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b
       FROM ag""",
)
def x148(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import relational

    docs = load_table(spark, sf, "documents").select("n_chars", "lang")
    return relational.mann_whitney_u(docs, "n_chars", F.col("lang") == "en")


# --------------------------------------------------------------------------
# x149 — Benford first-digit audit of order totals.  The digit comes from
# floor -> bigint -> string (exact on every engine); float formatting and
# log10-of-value arithmetic both differ across engines and are avoided.
@register(
    "x149_benford_audit",
    """WITH c AS (SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT)
                                     AS VARCHAR), 1, 1) AS BIGINT) AS digit,
                         COUNT(*) * 1.0 AS n
                  FROM orders WHERE o_totalprice >= 1 GROUP BY 1),
        t AS (SELECT SUM(n) AS total FROM c)
       SELECT digit, CAST(n AS BIGINT) AS n,
              ROUND(n / total, 6) AS p_obs,
              ROUND(log10(1 + 1.0 / digit), 6) AS p_exp,
              ROUND((n - total * log10(1 + 1.0 / digit))
                    * (n - total * log10(1 + 1.0 / digit))
                    / (total * log10(1 + 1.0 / digit)), 6) AS chi2_term
       FROM c, t""",
)
def x149(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import relational

    orders = load_table(spark, sf, "orders").select("o_totalprice")
    return relational.benford_audit(orders, "o_totalprice")


# --------------------------------------------------------------------------
# x150 — lag-1 autocorrelation of daily revenue: the series is the
# |days|-sized post-aggregation frame (accepted whole-frame posture);
# moments are explicit sums for float parity.
@register(
    "x150_revenue_autocorr",
    """WITH d AS (SELECT CAST(o_orderdate AS DATE) AS day,
                         SUM(o_totalprice) AS rev
                  FROM orders GROUP BY 1),
        p AS (SELECT rev AS y, LAG(rev) OVER (ORDER BY day) AS x FROM d),
        q AS (SELECT * FROM p WHERE x IS NOT NULL),
        ag AS (SELECT COUNT(*) * 1.0 AS n, SUM(x) AS sx, SUM(y) AS sy,
                      SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
               FROM q)
       SELECT CAST(n AS BIGINT) AS n_pairs,
              CASE WHEN n >= 2 AND sxx / n - (sx / n) * (sx / n) > 0
                        AND syy / n - (sy / n) * (sy / n) > 0
                   THEN ROUND((sxy / n - (sx / n) * (sy / n))
                              / sqrt((sxx / n - (sx / n) * (sx / n))
                                     * (syy / n - (sy / n) * (sy / n))), 6)
              END AS autocorr
       FROM ag""",
)
def x150(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import relational

    orders = load_table(spark, sf, "orders").select("o_orderdate", "o_totalprice")
    daily = orders.groupBy(
        F.to_date("o_orderdate").alias("day")
    ).agg(F.sum("o_totalprice").alias("rev"))
    return relational.series_autocorr(daily, "day", "rev", lag=1)


# --------------------------------------------------------------------------
# x151 — BFS hop labels on the customer-supplier bipartite graph (nodes
# encoded cust*2 / supp*2+1), 3 hops from customer 1: the blast-radius /
# account-linking primitive as a bounded DataFrame loop, oracle'd by a
# recursive CTE with set semantics.
@register(
    "x151_bfs_hops",
    """WITH RECURSIVE e AS (SELECT DISTINCT o.o_custkey * 2 AS a,
                                   l.l_suppkey * 2 + 1 AS b
                            FROM lineitem l
                            JOIN orders o ON l.l_orderkey = o.o_orderkey),
        sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        reach(n, hop) AS (
            SELECT CAST(2 AS BIGINT), 0
            UNION
            SELECT s.b, r.hop + 1 FROM reach r
            JOIN sym s ON s.a = r.n WHERE r.hop < 3)
       SELECT n AS node, CAST(MIN(hop) AS BIGINT) AS hop
       FROM reach GROUP BY n""",
)
def x151(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import graph

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_suppkey")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    edges = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .select(
            (F.col("o_custkey") * 2).alias("src"),
            (F.col("l_suppkey") * 2 + 1).alias("dst"),
        )
        .distinct()
    )
    seeds = local_rows(spark, [(2,)], "node long")
    return graph.bfs_hops(edges, seeds, max_hops=3)


# --------------------------------------------------------------------------
# x152 — exact WEIGHTED (idf) Jaccard pairs at 0.6 on bigram shingles:
# rare shared shingles count more than boilerplate.  Weighted prefix
# filtering (prefix = shortest head whose suffix weighs < t·W(A)),
# lossless by the suffix-weight contradiction; hypothesis re-proves it.
@register(
    "x152_weighted_jaccard",
    """WITH tok0 AS (SELECT doc_id,
                            string_split_regex(lower(trim(text)), '\\s+') AS ts
                     FROM documents),
        tok AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] AS s
                FROM tok0, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r),
        dfq AS (SELECT s, COUNT(*) AS df FROM tok GROUP BY s),
        nd AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM documents),
        w AS (SELECT s, ln(1 + nd.n / df) AS w FROM dfq, nd),
        tw AS (SELECT t.doc_id, t.s, w.w FROM tok t JOIN w USING (s)),
        sizes AS (SELECT doc_id, SUM(w) AS wt FROM tw GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, SUM(a.w) AS cw
                   FROM tw a JOIN tw b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
       SELECT id_a, id_b,
              ROUND(cw / (sa.wt + sb.wt - cw), 6) AS wjaccard
       FROM common
       JOIN sizes sa ON common.id_a = sa.doc_id
       JOIN sizes sb ON common.id_b = sb.doc_id
       WHERE ROUND(cw / (sa.wt + sb.wt - cw), 6) >= 0.6""",
)
def x152(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return dedup.weighted_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.6, shingle_n=2
    )


# --------------------------------------------------------------------------
# x153 — retrieval over chunks (the RAG indexing shape): overlapping
# 32-token windows (stride 24, x93 geometry), each chunk scored as its
# own BM25 unit, top-10 chunks with (doc, chunk) provenance.
@register(
    "x153_chunk_retrieval",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents
                     WHERE text IS NOT NULL),
        st AS (SELECT doc_id, ts,
                      unnest(range(0, GREATEST(len(ts), 1), 24)) AS s
               FROM tok),
        ct AS (SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_idx,
                      unnest(ts[s + 1 : s + 32]) AS token
               FROM st),
        dl AS (SELECT doc_id, chunk_idx, COUNT(*) AS dl
               FROM ct GROUP BY doc_id, chunk_idx),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                         AVG(dl) AS avgdl FROM dl),
        q AS (SELECT * FROM ct
              WHERE token IN ('spark', 'hash', 'window')),
        dfq AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS df
                FROM (SELECT DISTINCT token, doc_id, chunk_idx FROM q)
                GROUP BY token),
        tf AS (SELECT doc_id, chunk_idx, token, COUNT(*) AS tf
               FROM q GROUP BY doc_id, chunk_idx, token),
        sc AS (SELECT tf.doc_id, tf.chunk_idx,
                      ROUND(SUM(ln((stats.n_docs - dfq.df + 0.5)
                                   / (dfq.df + 0.5) + 1.0)
                                * tf.tf * (1.2 + 1.0)
                                / (tf.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * dl.dl / stats.avgdl))), 6)
                          AS bm25
               FROM tf JOIN dfq USING (token)
                       JOIN dl ON tf.doc_id = dl.doc_id
                              AND tf.chunk_idx = dl.chunk_idx
                       CROSS JOIN stats
               GROUP BY tf.doc_id, tf.chunk_idx)
       SELECT doc_id, chunk_idx, bm25 FROM sc
       ORDER BY bm25 DESC, doc_id, chunk_idx LIMIT 10""",
)
def x153(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.chunk_bm25_topk(
        docs, "text", "doc_id", _BM25_TERMS, chunk_size=32, stride=24, k=10
    )


# --------------------------------------------------------------------------
# x154 — CUPED variance-reduced experiment readout: per-user pre-period
# value (before Jan 16) as the covariate, theta pooled across arms,
# arm = user_id % 2.  Explicit moment sums for engine float parity.
@register(
    "x154_cuped_readout",
    """WITH pu AS (SELECT user_id,
                          CAST(user_id % 2 AS INTEGER) AS variant,
                          COALESCE(SUM(CASE WHEN ts < TIMESTAMP '2024-01-16'
                                            THEN value END), 0) AS pre,
                          COALESCE(SUM(CASE WHEN ts >= TIMESTAMP '2024-01-16'
                                            THEN value END), 0) AS post
                   FROM events GROUP BY user_id),
        st AS (SELECT COUNT(*) * 1.0 AS n, SUM(pre) AS sx,
                      SUM(pre * pre) AS sxx, SUM(post) AS sy,
                      SUM(pre * post) AS sxy
               FROM pu),
        th AS (SELECT n, sx / n AS mx,
                      CASE WHEN sxx / n - (sx / n) * (sx / n) > 0
                           THEN (sxy / n - (sx / n) * (sy / n))
                                / (sxx / n - (sx / n) * (sx / n)) END AS theta
               FROM st)
       SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
              ROUND(AVG(post), 6) AS mean_post,
              ROUND(AVG(post - COALESCE(theta, 0) * (pre - mx)), 6)
                  AS mean_adjusted,
              ROUND(ANY_VALUE(theta), 6) AS theta
       FROM pu, th GROUP BY variant""",
)
def x154(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts", "value")
    return events.cuped_adjusted_means(
        ev, "user_id", "ts", "value", split_ts="2024-01-16"
    )


# --------------------------------------------------------------------------
# x155 — time-window funnel conversion (click -> purchase within 1 h):
# next-conversion timestamp carried by a keyed window, never a per-user
# pair join.
@register(
    "x155_conversion_window",
    """WITH w AS (SELECT user_id, event_type, ts,
                         MIN(CASE WHEN event_type = 'purchase' THEN ts END)
                             OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS BETWEEN 1 FOLLOWING
                                        AND UNBOUNDED FOLLOWING) AS next_p
                  FROM events),
        c AS (SELECT user_id,
                     CASE WHEN next_p IS NOT NULL
                               AND next_p <= ts + INTERVAL 1 HOUR
                          THEN 1 ELSE 0 END AS conv
              FROM w WHERE event_type = 'click'),
        u AS (SELECT user_id, MAX(conv) AS conv FROM c GROUP BY user_id)
       SELECT CAST(COUNT(*) AS BIGINT) AS n_clickers,
              CAST(SUM(conv) AS BIGINT) AS n_converted,
              ROUND(SUM(conv) * 1.0 / COUNT(*), 6) AS conv_rate
       FROM u""",
)
def x155(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return events.conversion_within_window(ev)


# --------------------------------------------------------------------------
# x156 — the dataset card: one-row corpus-health summary a curation run
# publishes next to the data (sizes, exact dup rate, token volume,
# short-doc share, diversity, head-language concentration).
@register(
    "x156_corpus_card",
    f"""WITH b AS (SELECT doc_id,
                          CASE WHEN text IS NULL THEN 1 ELSE 0 END AS nulltxt,
                          CASE WHEN text IS NOT NULL THEN md5(text) END AS h,
                          CASE WHEN text IS NOT NULL
                               THEN len({_TOK}) END AS nt,
                          lang, source
                   FROM documents),
        lt AS (SELECT MAX(c) * 1.0 / SUM(c) AS top_share
               FROM (SELECT lang, COUNT(*) AS c FROM b GROUP BY lang))
       SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(nulltxt) AS BIGINT) AS n_null_text,
              CAST(COUNT(DISTINCT h) AS BIGINT) AS n_distinct_texts,
              ROUND(CASE WHEN COUNT(*) - SUM(nulltxt) > 0
                         THEN 1.0 - COUNT(DISTINCT h) * 1.0
                              / (COUNT(*) - SUM(nulltxt)) END, 6) AS dup_rate,
              CAST(SUM(nt) AS BIGINT) AS total_tokens,
              ROUND(AVG(nt), 6) AS mean_tokens,
              ROUND(AVG(CASE WHEN nt IS NULL THEN NULL
                             WHEN nt < 10 THEN 1.0 ELSE 0.0 END), 6)
                  AS short_doc_share,
              CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
              CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
              ROUND(ANY_VALUE(lt.top_share), 6) AS top_lang_share
       FROM b, lt""",
)
def x156(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.corpus_card(docs)


# --------------------------------------------------------------------------
# x157 — TTL dedup audit: duplicate submissions (same user+type+payload)
# within a 1-hour horizon measured from the LAST occurrence — the batch
# twin of streaming dropDuplicatesWithinWatermark state semantics.
@register(
    "x157_ttl_dedup",
    """WITH k AS (SELECT event_id, event_type, ts,
                         md5(CAST(user_id AS VARCHAR) || '|' || event_type
                             || '|' || COALESCE(props, '')) AS h
                  FROM events),
        l AS (SELECT event_type,
                     epoch_us(ts) - LAG(epoch_us(ts))
                         OVER (PARTITION BY h ORDER BY ts, event_id) AS gap_us
              FROM k)
       SELECT event_type,
              CAST(SUM(CASE WHEN gap_us IS NOT NULL
                                 AND gap_us <= 3600000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS dropped,
              CAST(SUM(CASE WHEN gap_us IS NULL OR gap_us > 3600000000
                            THEN 1 ELSE 0 END) AS BIGINT) AS kept
       FROM l GROUP BY event_type""",
)
def x157(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_id", "user_id", "event_type", "ts", "props"
    )
    flagged = dedup.ttl_dedup_flags(
        ev, ["user_id", "event_type", "props"], "ts", "event_id",
        horizon_seconds=3600,
    )
    return flagged.groupBy("event_type").agg(
        F.sum("is_dup").cast("bigint").alias("dropped"),
        F.sum(1 - F.col("is_dup")).cast("bigint").alias("kept"),
    )


# --------------------------------------------------------------------------
# x158 — batch retrieval: BM25 top-5 for three queries in ONE corpus pass
# (term-at-a-time over a broadcast query dim; per-query bounded window).
_BATCH_QUERIES = {
    1: ["spark", "hash"],
    2: ["window", "scan"],
    3: ["customer", "order", "merge"],
}

@register(
    "x158_batch_retrieval",
    f"""WITH qd(query_id, token) AS (VALUES
            (1, 'spark'), (1, 'hash'),
            (2, 'window'), (2, 'scan'),
            (3, 'customer'), (3, 'order'), (3, 'merge')),
        tok AS (SELECT doc_id, unnest({_TOK}) AS token
                FROM documents WHERE text IS NOT NULL),
        dl AS (SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY doc_id),
        stats AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
                         AVG(dl) AS avgdl FROM dl),
        dfq AS (SELECT token, CAST(COUNT(DISTINCT doc_id) AS DOUBLE) AS df
                FROM tok WHERE token IN (SELECT token FROM qd)
                GROUP BY token),
        tf AS (SELECT qd.query_id, tok.doc_id, tok.token, COUNT(*) AS tf
               FROM tok JOIN qd USING (token)
               GROUP BY qd.query_id, tok.doc_id, tok.token),
        sc AS (SELECT tf.query_id, tf.doc_id,
                      ROUND(SUM(ln((stats.n_docs - dfq.df + 0.5)
                                   / (dfq.df + 0.5) + 1.0)
                                * tf.tf * (1.2 + 1.0)
                                / (tf.tf + 1.2 * (1.0 - 0.75
                                   + 0.75 * dl.dl / stats.avgdl))), 6)
                          AS bm25
               FROM tf JOIN dfq USING (token)
                       JOIN dl ON tf.doc_id = dl.doc_id
                       CROSS JOIN stats
               GROUP BY tf.query_id, tf.doc_id),
        r AS (SELECT query_id, doc_id, bm25,
                     CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                                             ORDER BY bm25 DESC, doc_id)
                          AS BIGINT) AS rn
              FROM sc)
       SELECT query_id, doc_id, bm25, rn FROM r WHERE rn <= 5""",
)
def x158(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.multi_query_bm25(docs, "text", "doc_id", _BATCH_QUERIES, k=5)


# --------------------------------------------------------------------------
# x159 — referential-integrity audit between orders and lineitem: the
# foreign-key health check (childless parents + orphan children) as two
# keyed anti-join counts over distinct keys.
@register(
    "x159_referential_integrity",
    """SELECT CAST((SELECT COUNT(*) FROM orders) AS BIGINT) AS n_parents,
              CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_children,
              CAST((SELECT COUNT(*)
                    FROM (SELECT DISTINCT o_orderkey FROM orders) p
                    WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                                      WHERE l.l_orderkey = p.o_orderkey))
                   AS BIGINT) AS childless_parents,
              CAST((SELECT COUNT(*) FROM lineitem l
                    WHERE NOT EXISTS (SELECT 1 FROM orders o
                                      WHERE o.o_orderkey = l.l_orderkey))
                   AS BIGINT) AS orphan_children""",
)
def x159(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import relational

    o = load_table(spark, sf, "orders").select("o_orderkey")
    li = load_table(spark, sf, "lineitem").select("l_orderkey")
    return relational.referential_integrity_audit(o, li, "o_orderkey", "l_orderkey")


# --------------------------------------------------------------------------
# x160 — column-profile audit of the events table: per-column rows,
# nulls, null fraction, exact distinct — ONE aggregation pass, long form
# via a struct-array explode (never per-column scans).
@register(
    "x160_column_profile",
    """WITH s AS (SELECT COUNT(*) AS n,
                         COUNT(user_id) AS c_user, COUNT(DISTINCT user_id) AS d_user,
                         COUNT(event_type) AS c_type, COUNT(DISTINCT event_type) AS d_type,
                         COUNT(value) AS c_value, COUNT(DISTINCT value) AS d_value,
                         COUNT(props) AS c_props, COUNT(DISTINCT props) AS d_props
                  FROM events)
       SELECT 'user_id' AS col_name, CAST(n AS BIGINT) AS n_rows,
              CAST(n - c_user AS BIGINT) AS n_nulls,
              ROUND((n - c_user) * 1.0 / n, 6) AS null_frac,
              CAST(d_user AS BIGINT) AS n_distinct FROM s
       UNION ALL
       SELECT 'event_type', CAST(n AS BIGINT), CAST(n - c_type AS BIGINT),
              ROUND((n - c_type) * 1.0 / n, 6), CAST(d_type AS BIGINT) FROM s
       UNION ALL
       SELECT 'value', CAST(n AS BIGINT), CAST(n - c_value AS BIGINT),
              ROUND((n - c_value) * 1.0 / n, 6), CAST(d_value AS BIGINT) FROM s
       UNION ALL
       SELECT 'props', CAST(n AS BIGINT), CAST(n - c_props AS BIGINT),
              ROUND((n - c_props) * 1.0 / n, 6), CAST(d_props AS BIGINT) FROM s""",
)
def x160(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import relational

    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "value", "props"
    )
    return relational.profile_columns(ev, ["user_id", "event_type", "value", "props"])
