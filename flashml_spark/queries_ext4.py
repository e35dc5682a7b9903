"""Extension queries, round 2 batch 2 (x49..x62): corpus statistics and
curation operators — within-doc repetition, per-language vocabulary,
deterministic quota sampling, scale-safe NTILE, SimHash Hamming-radius
near-dup, a numeric correlation matrix, contamination scanning, quality
percentiles, keep-best dedup, quantization error, JSON extraction,
diurnal histograms, rank-statistics windows, and weighted sampling.

Same oracle discipline as the earlier batches: engine-portable DuckDB
SQL built from the literals the Spark operators ship, identical aliases
both sides, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.functions.windows import global_ntile
from flashml_spark.operators import dedup, sampling, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.queries_ext import _simhash_fp_sql
from flashml_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# x49 — within-doc duplicate-bigram fraction (boilerplate/repetition quality
# signal): 1 - |distinct bigrams| / |bigrams|, 0.0 for sub-n-token docs.
@register(
    "x49_repetition_ratio",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        g AS (SELECT doc_id,
                     list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]) AS gs
              FROM tok)
        SELECT doc_id,
               CASE WHEN len(gs) > 0
                    THEN ROUND(1.0 - len(list_distinct(gs)) / CAST(len(gs) AS DOUBLE), 6)
                    ELSE 0.0 END AS rep_ratio
        FROM g""",
)
def x49(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.with_repetition_ratio(docs, "text", n=2).select("doc_id", "rep_ratio")


# x50 — top-10 tokens per language: per-group vocabulary head, the scan a
# corpus-drift monitor runs per snapshot.  Ties break token-ascending.
@register(
    "x50_token_topk_per_lang",
    f"""WITH tok AS (SELECT lang, unnest({_TOK}) AS token FROM documents),
        c AS (SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token),
        r AS (SELECT lang, token, n,
                     CAST(row_number() OVER (PARTITION BY lang ORDER BY n DESC, token) AS INT) AS rn
              FROM c)
        SELECT lang, token, n, rn FROM r WHERE rn <= 10""",
)
def x50(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    out = textops.token_topk_per_group(docs, "text", "lang", k=10)
    return out.select("lang", "token", "n", F.col("rn").cast("int").alias("rn"))


# x51 — deterministic per-source corpus quota: first 8 docs of each source
# in md5(doc_id) order (fixed pseudo-random shuffle, engine-portable).
@register(
    "x51_source_quota_sample",
    """WITH r AS (SELECT doc_id, source,
                         row_number() OVER (PARTITION BY source
                                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
                  FROM documents)
       SELECT doc_id, source FROM r WHERE rn <= 8""",
)
def x51(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return sampling.quota_per_group(docs, "source", "doc_id", k=8).select(
        "doc_id", "source"
    )


# x52 — document-length deciles WITHOUT a single-partition window:
# global_ntile range-repartitions on the order key and reconstructs the
# global rank from per-partition offsets (|partitions| scalars to the
# driver) — bit-identical to ANSI NTILE with the deterministic tie-break.
@register(
    "x52_length_deciles",
    """WITH d AS (SELECT doc_id, n_chars,
                         ntile(10) OVER (ORDER BY n_chars, doc_id) AS bucket
                  FROM documents)
       SELECT bucket, COUNT(*) AS n,
              MIN(n_chars) AS lo, MAX(n_chars) AS hi FROM d GROUP BY bucket""",
)
def x52(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "n_chars")
    tiled = global_ntile(docs, "n_chars", 10, tiebreak_cols=["doc_id"])
    return tiled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("n_chars").alias("lo"),
        F.max("n_chars").alias("hi"),
    )


# x53 — SimHash Hamming-radius near-dup pairs via bit-band LSH (48-bit
# fingerprint, 4 bands of 12 bits; pigeonhole ⇒ exact recall for radius 3).
# Width matters: a 16-bit space saturates at corpus scale (25% of ALL pairs
# land within radius 3 at sf0.1) — 48 bits keeps "near" selective.
@register(
    "x53_simhash_hamming_pairs",
    f"""WITH fp AS ({_simhash_fp_sql(48)}),
        bnd AS (SELECT doc_id, simhash,
                       unnest([{", ".join(f"'{b}|' || CAST((simhash >> {b * 12}) & 4095 AS VARCHAR)" for b in range(4))}]) AS band_key
                FROM fp),
        cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
                        CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
                 FROM bnd a JOIN bnd b USING (band_key)
                 WHERE a.doc_id < b.doc_id)
        SELECT id_a, id_b, hamming FROM cand WHERE hamming <= 3""",
)
def x53(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    out = dedup.simhash_hamming_pairs(
        docs, "text", "doc_id", bits=48, bands=4, max_hamming=3
    )
    return out.select("id_a", "id_b", F.col("hamming").cast("long").alias("hamming"))


# x54 — numeric correlation matrix over the fact table: one scan, all six
# pairwise moments as a single hash-agg (map-side partials — the shape a
# feature-selection pass runs at 100 TB).
@register(
    "x54_corr_matrix",
    """SELECT ROUND(corr(l_quantity, l_extendedprice), 6) AS c_qty_price,
              ROUND(corr(l_quantity, l_discount), 6) AS c_qty_disc,
              ROUND(corr(l_extendedprice, l_discount), 6) AS c_price_disc,
              ROUND(covar_samp(l_quantity, l_extendedprice), 6) AS cov_qty_price,
              ROUND(stddev_samp(l_quantity), 6) AS sd_qty,
              ROUND(stddev_samp(l_extendedprice), 6) AS sd_price
       FROM lineitem""",
)
def x54(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.agg(
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("c_qty_price"),
        F.round(F.corr("l_quantity", "l_discount"), 6).alias("c_qty_disc"),
        F.round(F.corr("l_extendedprice", "l_discount"), 6).alias("c_price_disc"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 6).alias("cov_qty_price"),
        F.round(F.stddev_samp("l_quantity"), 6).alias("sd_qty"),
        F.round(F.stddev_samp("l_extendedprice"), 6).alias("sd_price"),
    )


# --------------------------------------------------------------------------
# x55 — test-set contamination scan: corpus docs (doc_id % 10 != 0) sharing
# at least one distinct trigram with any held-out probe doc (% 10 == 0).
# Real decontamination uses n=13 where the join is sparse; n=3 keeps the
# synthetic check non-vacuous.
@register(
    "x55_contamination_scan",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS s
               FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r),
        probe AS (SELECT DISTINCT s FROM sh WHERE doc_id % 10 = 0),
        corpus AS (SELECT doc_id, s FROM sh WHERE doc_id % 10 <> 0)
        SELECT c.doc_id, COUNT(*) AS n_shared
        FROM corpus c JOIN probe USING (s) GROUP BY c.doc_id""",
)
def x55(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    corpus = docs.filter(F.col("doc_id") % 10 != 0)
    probe = docs.filter(F.col("doc_id") % 10 == 0)
    return dedup.ngram_overlap_contamination(corpus, probe, "text", "doc_id", n=3)


# x56 — per-language quality quartiles: exact percentile_cont parity
# (same linear interpolation on both engines), grouped one-pass agg.
_X56_Q = """ROUND(0.4 * LEAST(CAST(len(ts) AS DOUBLE) / 200.0, 1.0)
    + 0.2 * LEAST((len(list_filter(ts, t -> list_contains(
          ['the','and','of','to','a','in','is','that','it','for'], t)))
          / CAST(len(ts) AS DOUBLE)) / 0.3, 1.0)
    + 0.2 * (CASE WHEN list_sum(list_transform(ts, t -> len(t))) / CAST(len(ts) AS DOUBLE)
                  BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.0 END)
    + 0.2 * (1.0 - LEAST(((n_chars - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) / n_chars) * 2.0
                       + ((n_chars - len(regexp_replace(text, '[0-9]', '', 'g'))) / n_chars) * 2.0, 1.0)), 6)"""


@register(
    "x56_quality_percentiles_by_lang",
    f"""WITH base AS (SELECT lang, text, {_TOK} AS ts,
                            CAST(len(text) AS DOUBLE) AS n_chars
                     FROM documents),
        q AS (SELECT lang, {_X56_Q} AS quality FROM base)
        SELECT lang,
               ROUND(quantile_cont(quality, 0.25), 6) AS q25,
               ROUND(quantile_cont(quality, 0.50), 6) AS q50,
               ROUND(quantile_cont(quality, 0.75), 6) AS q75,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM q GROUP BY lang""",
)
def x56(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    scored = textops.with_quality_score(docs, "text", out_col="__q").withColumn(
        "__q", F.round("__q", 6)
    )
    return scored.groupBy("lang").agg(
        F.round(F.percentile("__q", F.lit(0.25)), 6).alias("q25"),
        F.round(F.percentile("__q", F.lit(0.50)), 6).alias("q50"),
        F.round(F.percentile("__q", F.lit(0.75)), 6).alias("q75"),
        F.count(F.lit(1)).alias("n"),
    )


# x57 — keep-BEST-per-group dedup: full-minhash-signature duplicate groups
# keep the highest-quality member (ties -> min id) instead of the min id —
# one max_by hash-agg, no ranked window, no join-back.
@register(
    "x57_keep_best_dedup",
    f"""WITH tok AS (SELECT doc_id, text, {_TOK} AS ts,
                            CAST(len(text) AS DOUBLE) AS n_chars
                     FROM documents),
        q AS (SELECT doc_id, {_X56_Q} AS quality,
                     list_min(list_transform(ts, s -> substr(md5('0:' || s), 1, 8))) AS sig0,
                     list_min(list_transform(ts, s -> substr(md5('0:' || s), 9, 8))) AS sig1,
                     list_min(list_transform(ts, s -> substr(md5('0:' || s), 17, 8))) AS sig2,
                     list_min(list_transform(ts, s -> substr(md5('0:' || s), 25, 8))) AS sig3
              FROM tok),
        r AS (SELECT doc_id, quality, sig0, sig1, sig2, sig3,
                     row_number() OVER (PARTITION BY sig0, sig1, sig2, sig3
                                        ORDER BY quality DESC, doc_id) AS rn,
                     COUNT(*) OVER (PARTITION BY sig0, sig1, sig2, sig3) AS dup_cnt
              FROM q)
        SELECT doc_id AS keep_id, CAST(dup_cnt AS BIGINT) AS dup_cnt, quality
        FROM r WHERE rn = 1""",
)
def x57(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    sigged = dedup.with_minhash_signature(docs, "text", num_hashes=4, shingle_n=1)
    scored = textops.with_quality_score(sigged, "text", out_col="__q").withColumn(
        "__q", F.round("__q", 6)
    )
    best = dedup.keep_best_per_group(
        scored, [f"sig{i}" for i in range(4)], "doc_id", "__q"
    )
    quality = scored.select(F.col("doc_id").alias("keep_id"), F.col("__q").alias("quality"))
    return best.join(quality, "keep_id").select("keep_id", "dup_cnt", "quality")


# x58 — int8 scalar-quantization error per embedding: the storage-sizing
# question (4x smaller column) as one shuffle-free HOF pass; rounding is
# pinned to floor(x+0.5) so both engines agree bit-for-bit.
@register(
    "x58_quantization_error",
    """WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (SELECT vec_id, v,
                     list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
              FROM e),
        m AS (SELECT vec_id,
                     list_sum(list_transform(v, x -> x * x)) AS n2,
                     list_sum(list_transform(v, x -> (x - floor(x / scale + 0.5) * scale)
                                                   * (x - floor(x / scale + 0.5) * scale))) AS e2
              FROM s)
        SELECT vec_id,
               CASE WHEN n2 > 0 THEN ROUND(sqrt(e2 / n2), 6) ELSE 0.0 END AS rel_err
        FROM m""",
)
def x58(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings")
    return similarity.quantization_error(emb, "embedding", "vec_id", bits=8)


# --------------------------------------------------------------------------
# x59 — semi-structured extraction: per-event-type stats of the JSON props
# field, extracted JVM-side (get_json_object), no Python round-trip.
@register(
    "x59_json_extract",
    """SELECT event_type,
              COUNT(*) AS n,
              ROUND(AVG(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 6) AS avg_k,
              MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
       FROM events GROUP BY event_type""",
)
def x59(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import relational

    ev = load_table(spark, sf, "events")
    # extract ONCE as string; cast per-aggregate so avg uses double
    # semantics (oracle casts the raw string to DOUBLE) and max uses
    # bigint — a bigint-first cast would NULL/truncate fractional k.
    parsed = relational.with_json_field(ev, "props", "$.k", "k")
    return parsed.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(F.col("k").cast("double")), 6).alias("avg_k"),
        F.max(F.col("k").cast("bigint")).alias("max_k"),
    )


# x60 — diurnal profile: count + mean value by hour of day (UTC on both
# engines — the session timezone is pinned).
@register(
    "x60_hour_histogram",
    """SELECT CAST(extract(hour FROM ts) AS BIGINT) AS hour,
              COUNT(*) AS n, ROUND(AVG(value), 6) AS avg_value
       FROM events GROUP BY 1""",
)
def x60(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events as ev_ops

    ev = load_table(spark, sf, "events")
    return ev_ops.hour_of_day_histogram(ev)


# x61 — rank-statistics windows: percent_rank + cume_dist of order value
# within each customer (bounded partitions — never a global one-task sort).
@register(
    "x61_percent_rank",
    """SELECT o_custkey, o_orderkey,
              ROUND(percent_rank() OVER w, 6) AS pr,
              ROUND(cume_dist() OVER w, 6) AS cd
       FROM orders
       WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)""",
)
def x61(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.round(F.percent_rank().over(w), 6).alias("pr"),
        F.round(F.cume_dist().over(w), 6).alias("cd"),
    )


# x62 — deterministic weighted sample (Efraimidis-Spirakis): md5-seeded
# uniforms, selection key ln(u)/w, top-20 keys = the sample.
@register(
    "x62_weighted_sample",
    """WITH s AS (SELECT o_orderkey, o_totalprice,
                         ln((CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT) + 1.0)
                            / 4294967296.0) / o_totalprice AS es_key
                  FROM orders WHERE o_totalprice > 0)
       SELECT o_orderkey, o_totalprice FROM s
       ORDER BY es_key DESC, o_orderkey LIMIT 20""",
)
def x62(spark: SparkSession, sf: str) -> DataFrame:
    out = sampling.weighted_sample_topk(
        load_table(spark, sf, "orders"), "o_totalprice", "o_orderkey", k=20
    )
    return out.select("o_orderkey", "o_totalprice")
