"""Extension queries, round 2 batch 2 (x49..x54): corpus statistics and
curation operators — within-doc repetition, per-language vocabulary,
deterministic quota sampling, scale-safe NTILE, SimHash Hamming-radius
near-dup, and a numeric correlation matrix.

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


# x53 — SimHash Hamming-radius near-dup pairs via bit-band LSH (16-bit
# fingerprint, 4 bands of 4 bits; pigeonhole ⇒ exact recall for radius 3).
@register(
    "x53_simhash_hamming_pairs",
    f"""WITH fp AS ({_simhash_fp_sql(16)}),
        bnd AS (SELECT doc_id, simhash,
                       unnest([{", ".join(f"'{b}|' || CAST((simhash >> {b * 4}) & 15 AS VARCHAR)" for b in range(4))}]) AS band_key
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
        docs, "text", "doc_id", bits=16, bands=4, max_hamming=3
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
