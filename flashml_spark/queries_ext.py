"""Extension queries: LLM-training-data-pipeline operators over the
``documents`` / ``embeddings`` / ``events`` tables (beyond the reference's
surface; see BASELINE.json north star).

Every oracle uses only engine-portable primitives (md5, hex→int casts,
list lambdas, window functions) so DuckDB reproduces the Spark result
bit-for-bit (floats rounded to 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import dedup, events, multimodal, similarity, textops
from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table

# shared DuckDB snippets -----------------------------------------------------
_TOK = "string_split_regex(lower(trim(text)), '\\s+')"


# --------------------------------------------------------------------------
# x01 — exact dedup groups (hash-groupBy on content digest)
@register(
    "x01_dedup_exact",
    """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
       FROM documents GROUP BY md5(text)""",
)
def x01(spark: SparkSession, sf: str) -> DataFrame:
    return dedup.exact_dedup_groups(load_table(spark, sf, "documents"), "text", "doc_id")


# x02 — minhash signatures (4 hashes, unigram shingles), per doc
def _mh_comp(i: int) -> str:
    # mirror of hashing.minhash_components_from_digests: hash i = 8-hex slice
    # i%4 of md5 digest block i//4 (4 32-bit hashes per md5 call)
    block, slot = i // 4, i % 4
    return (
        f"list_min(list_transform({_TOK},"
        f" t -> substr(md5('{block}:' || t), {slot * 8 + 1}, 8)))"
    )


def _mh_oracle(num_hashes: int) -> str:
    comps = ",\n              ".join(
        f"{_mh_comp(i)} AS sig{i}" for i in range(num_hashes)
    )
    return f"SELECT doc_id, {comps} FROM documents ORDER BY doc_id"


@register("x02_minhash_signature", _mh_oracle(4))
def x02(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    sigged = dedup.with_minhash_signature(docs, "text", num_hashes=4, shingle_n=1)
    return sigged.select("doc_id", "sig0", "sig1", "sig2", "sig3")


# x03 — minhash dedup buckets (full-signature match)
def _mh_dedup_oracle() -> str:
    comps = ",\n                ".join(f"{_mh_comp(i)} AS sig{i}" for i in range(4))
    return f"""WITH sig AS (
         SELECT doc_id,
                {comps}
         FROM documents)
       SELECT MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt, sig0, sig1, sig2, sig3
       FROM sig GROUP BY sig0, sig1, sig2, sig3"""


@register("x03_minhash_dedup", _mh_dedup_oracle())
def x03(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return dedup.minhash_dedup_groups(docs, "text", "doc_id", num_hashes=4, shingle_n=1)


# x04 — simhash fingerprint buckets
def _simhash_fp_sql(bits: int = 16) -> str:
    """``doc_id, simhash`` fingerprint subquery — shared by x04 (exact
    buckets) and x53 (Hamming-radius pairs)."""
    terms = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {j}) & 1 = 1 "
        f"THEN 1 ELSE -1 END)) > 0 THEN {1 << j} ELSE 0 END)"
        for j in range(bits)
    )
    return f"""SELECT doc_id, CAST({terms} AS BIGINT) AS simhash
       FROM (SELECT doc_id,
                    list_transform({_TOK},
                       t -> CAST(('0x' || substr(md5(t), 1, 12)) AS BIGINT)) AS hs
             FROM documents) th"""


def _simhash_oracle(bits: int = 16) -> str:
    return f"""WITH fp AS ({_simhash_fp_sql(bits)})
       SELECT simhash, MIN(doc_id) AS keep_id, COUNT(*) AS dup_cnt
       FROM fp GROUP BY simhash"""


@register("x04_simhash_dedup", _simhash_oracle(16))
def x04(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return dedup.simhash_dedup_groups(docs, "text", "doc_id", bits=16)


# x05 — n-gram (bigram) Jaccard near-dup pairs
@register(
    "x05_ngram_jaccard",
    """WITH tok AS (SELECT doc_id, {tok} AS ts FROM documents),
       sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] AS s
              FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r),
       cap AS (SELECT s FROM sh GROUP BY s HAVING COUNT(*) <= 100),
       kept AS (SELECT sh.doc_id, sh.s FROM sh JOIN cap USING (s)),
       sizes AS (SELECT doc_id, COUNT(*) AS n_sh FROM kept GROUP BY doc_id),
       common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS common
                  FROM kept a JOIN kept b ON a.s = b.s AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
       SELECT id_a, id_b,
              ROUND(common / (sa.n_sh + sb.n_sh - common), 6) AS jaccard
       FROM common
       JOIN sizes sa ON common.id_a = sa.doc_id
       JOIN sizes sb ON common.id_b = sb.doc_id
       WHERE ROUND(common / (sa.n_sh + sb.n_sh - common), 6) >= 0.2""".format(tok=_TOK),
)
def x05(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=2, threshold=0.2, max_df=100)


# x06 — brute-force cosine top-10 to the vec_id=0 embedding
_KNN_ORACLE = """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
    c AS (SELECT vec_id,
            list_dot_product(CAST(embedding AS DOUBLE[]), qv)
              / (sqrt(list_dot_product(CAST(embedding AS DOUBLE[]), CAST(embedding AS DOUBLE[])))
                 * sqrt(list_dot_product(qv, qv))) AS raw_sim
          FROM embeddings, q)
    SELECT vec_id, ROUND(raw_sim, 6) AS sim FROM c
    ORDER BY ROUND(raw_sim, 6) DESC, vec_id LIMIT 10"""


@register("x06_knn_brute", _KNN_ORACLE)
def x06(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    return similarity.knn_brute_force(emb, "embedding", "vec_id", list(qrow["embedding"]), k=10)


# x07 — LSH-bucketed ANN (scale path), upgraded r8 from rows-only to a
# PLANTED-FIXTURE oracle (r07 VERDICT item 7, the x233 pattern): plant
# 10 exact clones of the query vector (ids max_id+1..max_id+10); a
# clone hashes to the query's own bucket — always in the probe set —
# so the top-10 at (sim desc, id asc) is EXACTLY the query row itself
# plus the 9 smallest clone ids, all at sim 1.0, derivable in pure SQL.
# A hash-match certifies bucketing + probing + exact-rescore end to
# end; the probed buckets still contain the real corpus rows, so the
# operator's work is unchanged.  (The raw-recall gate vs brute force
# stays in tests/test_features_training.py::
# test_knn_lsh_multiprobe_recall_gate.)
_ANN_LSH_SQL = """
WITH m AS (SELECT MAX(vec_id) AS mx FROM embeddings)
SELECT CAST(0 AS BIGINT) AS vec_id, CAST(1.0 AS DOUBLE) AS sim FROM m
UNION ALL
SELECT CAST(m.mx + 1 + i AS BIGINT), CAST(1.0 AS DOUBLE)
FROM m, range(9) t(i) ORDER BY vec_id"""


@register("x07_ann_lsh", _ANN_LSH_SQL)
def x07(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    mx = emb.agg(F.max("vec_id")).first()[0]  # scalar: clone id offset
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    clones = emb.filter(F.col("vec_id") == 0).select(
        F.explode(
            F.array(*[F.lit(int(mx) + 1 + i) for i in range(10)])
        ).alias("vec_id"),
        "embedding",
    )
    return similarity.knn_lsh(
        emb.unionByName(clones), "embedding", "vec_id",
        list(qrow["embedding"]), k=10, n_probes=8,
    )


# x08 — token counting rolled up per language
@register(
    "x08_token_count",
    f"""SELECT lang, COUNT(*) AS n_docs,
               CAST(SUM(len({_TOK})) AS BIGINT) AS total_tokens,
               ROUND(AVG(len({_TOK})), 6) AS avg_tokens
        FROM documents GROUP BY lang ORDER BY lang""",
)
def x08(spark: SparkSession, sf: str) -> DataFrame:
    docs = textops.with_token_count(load_table(spark, sf, "documents"), "text")
    return (
        docs.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
            F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        )
        
    )


# x09 — document quality scoring
_QUALITY_ORACLE = f"""
    WITH base AS (
      SELECT doc_id, text, {_TOK} AS ts,
             CAST(len(text) AS DOUBLE) AS n_chars
      FROM documents),
    m AS (
      SELECT doc_id,
             CAST(len(ts) AS DOUBLE) AS n_tok,
             list_sum(list_transform(ts, t -> len(t))) / CAST(len(ts) AS DOUBLE) AS mwl,
             (n_chars - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) / n_chars AS punct,
             (n_chars - len(regexp_replace(text, '[0-9]', '', 'g'))) / n_chars AS digit,
             len(list_filter(ts, t -> list_contains(
                 ['the','and','of','to','a','in','is','that','it','for'], t)))
               / CAST(len(ts) AS DOUBLE) AS sw
      FROM base)
    SELECT doc_id,
           ROUND(0.4 * LEAST(n_tok / 200.0, 1.0)
               + 0.2 * LEAST(sw / 0.3, 1.0)
               + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.0 END)
               + 0.2 * (1.0 - LEAST(punct * 2.0 + digit * 2.0, 1.0)), 6) AS quality
    FROM m ORDER BY doc_id"""


@register("x09_quality_score", _QUALITY_ORACLE)
def x09(spark: SparkSession, sf: str) -> DataFrame:
    docs = textops.with_quality_score(load_table(spark, sf, "documents"), "text")
    return docs.select("doc_id", "quality")


# x10 — language-ID heuristic vs the labeled lang column
def _langid_oracle(min_ratio: float = 0.05) -> str:
    langs = sorted(textops.LANG_STOPWORDS)
    ratio_cols = ",\n             ".join(
        "len(list_filter(ts, t -> list_contains([{words}], t))) / CAST(len(ts) AS DOUBLE)"
        " AS r_{lang}".format(
            words=",".join(f"'{w}'" for w in textops.LANG_STOPWORDS[lang]), lang=lang
        )
        for lang in langs
    )
    best = "GREATEST(" + ", ".join(f"r_{lang}" for lang in langs) + ")"
    firstmax = " ".join(f"WHEN r_{lang} = m THEN '{lang}'" for lang in langs)
    return f"""
    WITH tok AS (SELECT doc_id, lang, {_TOK} AS ts FROM documents),
    r AS (SELECT doc_id, lang,
             {ratio_cols}
          FROM tok),
    p AS (SELECT lang,
             CASE WHEN {best} > {min_ratio}
                  THEN (CASE {firstmax} END)
                  ELSE 'und' END AS pred_lang
          FROM (SELECT lang, {best} AS m,
                       {", ".join(f"r_{lang}" for lang in langs)} FROM r) s)
    SELECT lang, pred_lang, COUNT(*) AS n FROM p GROUP BY lang, pred_lang
    ORDER BY lang, pred_lang"""


@register("x10_lang_id", _langid_oracle())
def x10(spark: SparkSession, sf: str) -> DataFrame:
    docs = textops.with_lang_id(load_table(spark, sf, "documents"), "text")
    return (
        docs.groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        
    )


# x11 — normalized fingerprint uniqueness per source
@register(
    "x11_fingerprint",
    """SELECT source, COUNT(*) AS n_docs,
              COUNT(DISTINCT md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))))) AS n_unique
       FROM documents GROUP BY source ORDER BY source""",
)
def x11(spark: SparkSession, sf: str) -> DataFrame:
    docs = textops.with_fingerprint(load_table(spark, sf, "documents"), "text")
    return (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.countDistinct("fp").alias("n_unique"))
        
    )


# x12 — multimodal decode plumbing (Arrow-batched mapInPandas, fake codec)
@register(
    "x12_multimodal_decode",
    """SELECT doc_id AS media_id, 'application/octet-stream' AS mime,
              CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
              CAST(64 + CAST(('0x' || substr(md5(text), 1, 4)) AS BIGINT) % 1856 AS INT) AS width,
              CAST(64 + CAST(('0x' || substr(md5(text), 5, 4)) AS BIGINT) % 1016 AS INT) AS height,
              substr(md5(text), 1, 16) AS phash
       FROM documents ORDER BY media_id""",
)
def x12(spark: SparkSession, sf: str) -> DataFrame:
    media = multimodal.documents_as_media(load_table(spark, sf, "documents"))
    return multimodal.decode_media(media, fake=True)


# x13 — tumbling-window event aggregation (streaming-shaped, batch-checked)
@register(
    "x13_event_window",
    """SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
              ROUND(SUM(value), 6) AS total
       FROM events GROUP BY 1, 2 ORDER BY 1, 2""",
)
def x13(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return events.tumbling_window_agg(ev, "ts", "event_type", "value", "1 hour")


# x14 — gap-based sessionization stats
@register(
    "x14_sessionize",
    """WITH s AS (
         SELECT user_id, event_id, ts,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                             - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                     THEN 1 ELSE 0 END AS new_s
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT user_id, CAST(SUM(new_s) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
       FROM s GROUP BY user_id ORDER BY user_id""",
)
def x14(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return events.session_stats(ev, "user_id", "ts", "event_id", gap_minutes=30)
