"""Extension queries, round 4 (x84..x92): order-lifecycle join/agg shapes
(TPC-H Q4/Q12/Q14 analogues on the synthetic star schema), training-
mixture weighting, PMI collocation mining, duplication-audit histograms,
log-scale length distributions, per-key moving averages, and daily
audience accession on distributed prefix sums.

Same oracle discipline as earlier batches: engine-portable DuckDB SQL
sharing every literal with the Spark side, identical aliases, and
deterministic tie-breaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import dedup, events, relational, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# x84 — priority order check (TPC-H Q4 shape): orders in a date range with
# at least one returned line item, counted per priority class.  The EXISTS
# becomes a LEFT SEMI join — the lineitem side never widens the output, and
# the filters on both sides push to their scans.
@register(
    "x84_priority_exists",
    """SELECT o_orderpriority,
              CAST(COUNT(*) AS BIGINT) AS order_count
       FROM orders o
       WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
         AND o.o_orderdate < TIMESTAMP '1997-01-01'
         AND EXISTS (SELECT 1 FROM lineitem l
                     WHERE l.l_orderkey = o.o_orderkey
                       AND l.l_returnflag = 'R')
       GROUP BY o_orderpriority""",
)
def x84(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    li = (
        load_table(spark, sf, "lineitem")
        .filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
    )
    return (
        o.join(li, "o_orderkey", "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# x85 — line-status priority split (TPC-H Q12 shape): per line status in a
# ship-date year, how many lines belong to high- vs low-priority orders.
# One co-keyed join (orders dim side broadcast-able at any SF where
# |orders in range| ≪ |lineitem|), then conditional aggregation.
@register(
    "x85_linestatus_priority",
    """SELECT l_linestatus,
              CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS high_cnt,
              CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                            THEN 1 ELSE 0 END) AS BIGINT) AS low_cnt
       FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
       GROUP BY l_linestatus""",
)
def x85(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderpriority"
    )
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, "l_orderkey")
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).cast("bigint").alias("high_cnt"),
            F.sum(F.when(~high, 1).otherwise(0)).cast("bigint").alias("low_cnt"),
        )
    )


# x86 — promo revenue share (TPC-H Q14 shape): revenue fraction from promo
# parts in a ship-date quarter.  Part dim broadcast; single conditional agg.
@register(
    "x86_promo_revenue_share",
    """SELECT ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                                     THEN l_extendedprice * (1 - l_discount)
                                     ELSE 0 END)
                   / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_share
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1996-04-01'""",
)
def x86(spark: SparkSession, sf: str) -> DataFrame:
    p = load_table(spark, sf, "part").select(
        F.col("p_partkey").alias("l_partkey"), "p_type"
    )
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1996-04-01")
    )
    rev = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(F.broadcast(p), "l_partkey")
        .agg(
            F.round(
                100.0
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / F.sum(rev),
                6,
            ).alias("promo_share")
        )
    )


# x87 — training-mixture weights: per-source token share vs a uniform
# target; weight = target/actual is the resampling multiplier.
@register(
    "x87_mixture_weights",
    f"""WITH t AS (SELECT source, len({_TOK}) AS nt FROM documents),
        s AS (SELECT source, CAST(SUM(nt) AS BIGINT) AS tokens
              FROM t GROUP BY source),
        tot AS (SELECT SUM(tokens) AS total, COUNT(*) AS n FROM s)
        SELECT source, tokens,
               ROUND(tokens / total, 6) AS actual_share,
               ROUND(1.0 / n, 6) AS target_share,
               ROUND((1.0 / n) / (tokens / total), 6) AS weight
        FROM s, tot""",
)
def x87(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.mixture_weights(docs, "text", "source")


# x88 — PMI collocations: top-20 adjacent pairs by pointwise mutual
# information with a min-count floor, vocabulary-sized frames throughout.
@register(
    "x88_pmi_pairs",
    f"""WITH tok AS (SELECT {_TOK} AS ts FROM documents),
        g AS (SELECT unnest(list_transform(range(1, len(ts)),
                                           i -> ts[i] || ' ' || ts[i + 1])) AS g
              FROM tok),
        bi AS (SELECT string_split(g, ' ')[1] AS w1,
                      string_split(g, ' ')[2] AS w2,
                      COUNT(*) AS c
               FROM g GROUP BY 1, 2 HAVING COUNT(*) >= 5),
        uni AS (SELECT w, COUNT(*) AS cw
                FROM (SELECT unnest(ts) AS w FROM tok) GROUP BY w),
        nb AS (SELECT COUNT(*) AS total_b FROM g),
        nu AS (SELECT SUM(cw) AS total_u FROM uni)
        SELECT w1, w2, CAST(c AS BIGINT) AS c,
               ROUND(LN((c / total_b)
                        / ((u1.cw / total_u) * (u2.cw / total_u))), 6) AS pmi
        FROM bi
        JOIN uni u1 ON bi.w1 = u1.w
        JOIN uni u2 ON bi.w2 = u2.w, nb, nu
        ORDER BY pmi DESC, w1, w2 LIMIT 20""",
)
def x88(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.pmi_top_pairs(docs, "text", k=20, min_count=5)


# x89 — duplication-audit histogram: exact-dup cluster size distribution.
# The synthetic corpus is dup-free, so the audited frame is documents plus
# a re-ingested copy of every 5th doc (offset ids) — the "same shard loaded
# twice" incident this audit exists to catch; sizes {1, 2} must come back.
@register(
    "x89_dup_cluster_histogram",
    """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        corpus AS (SELECT doc_id, text FROM documents
                   UNION ALL
                   SELECT doc_id + m + 1, text FROM documents, mx
                   WHERE doc_id % 5 = 0),
        g AS (SELECT md5(text) AS h, COUNT(*) AS c FROM corpus GROUP BY 1)
       SELECT CAST(c AS BIGINT) AS cluster_size,
              CAST(COUNT(*) AS BIGINT) AS n_clusters
       FROM g GROUP BY 1""",
)
def x89(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id")).first()[0]
    dupes = docs.filter(F.col("doc_id") % 5 == 0).select(
        (F.col("doc_id") + mx + 1).alias("doc_id"), "text"
    )
    return dedup.dup_cluster_size_histogram(docs.unionAll(dupes), "text", "doc_id")


# x90 — log2 length histogram: heavy-tailed doc-length audit buckets.
@register(
    "x90_log2_length_histogram",
    """SELECT CASE WHEN n_chars > 0
                   THEN CAST(FLOOR(LOG2(n_chars)) AS BIGINT) END AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n,
              MIN(n_chars) AS min_v, MAX(n_chars) AS max_v
       FROM documents GROUP BY 1""",
)
def x90(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("n_chars")
    return relational.log2_histogram(docs, "n_chars")


# x91 — per-user trailing moving average (3 events) in event-time order;
# partitioned window, deterministic event_id tie-break.
@register(
    "x91_user_moving_avg",
    """SELECT event_id, user_id,
              ROUND(AVG(value) OVER (PARTITION BY user_id
                                     ORDER BY ts, event_id
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                    6) AS moving_avg
       FROM events""",
)
def x91(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts", "value")
    return events.moving_agg(
        ev, "user_id", "ts", "value", n_rows=3, id_col="event_id"
    ).select("event_id", "user_id", "moving_avg")


# x92 — daily audience accession: DAU, first-seen users, cumulative
# distinct users via cumulative-sum-of-first-seen (|days|-bounded frame).
@register(
    "x92_daily_user_accession",
    """WITH e AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day, user_id
                  FROM events),
        dau AS (SELECT day, COUNT(DISTINCT user_id) AS dau FROM e GROUP BY day),
        fs AS (SELECT user_id, MIN(day) AS day FROM e GROUP BY user_id),
        nu AS (SELECT day, COUNT(*) AS new_users FROM fs GROUP BY day)
       SELECT CAST(d.day AS VARCHAR) AS day,
              CAST(d.dau AS BIGINT) AS dau,
              CAST(COALESCE(nu.new_users, 0) AS BIGINT) AS new_users,
              CAST(SUM(COALESCE(nu.new_users, 0))
                   OVER (ORDER BY d.day) AS BIGINT) AS cum_users
       FROM dau d LEFT JOIN nu ON d.day = nu.day""",
)
def x92(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("ts", "user_id")
    return events.daily_user_accession(ev, "user_id", "ts")


# x93 — context-window chunking: fixed-token chunks with overlap, pure
# per-row array work (zero shuffle).
@register(
    "x93_doc_chunking",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        st AS (SELECT doc_id, ts, unnest(range(0, GREATEST(len(ts), 1), 24)) AS s
               FROM tok)
        SELECT doc_id, CAST(s // 24 AS BIGINT) AS chunk_idx,
               CAST(LEAST(32, len(ts) - s) AS BIGINT) AS n_tok,
               ts[s + 1] AS head
        FROM st""",
)
def x93(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.chunk_documents(docs, "text", "doc_id", chunk_size=32, stride=24)


# x94 — content-addressed train/val/test split: md5-bucket assignment,
# stable across runs/engines; per-split doc and token totals.
@register(
    "x94_hash_split",
    f"""WITH b AS (SELECT doc_id, len({_TOK}) AS nt,
                          CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                               AS BIGINT) % 100 AS bk
                   FROM documents)
        SELECT CASE WHEN bk < 80 THEN 'train'
                    WHEN bk < 90 THEN 'val' ELSE 'test' END AS split,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(nt) AS BIGINT) AS tokens
        FROM b GROUP BY 1""",
)
def x94(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import sampling

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    split = sampling.deterministic_hash_split(docs, "doc_id", 80, 10)
    counted = textops.with_token_count(split, "text")
    return counted.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("tokens"),
    )


# x95 — per-source dedup rate on the doubled corpus (same re-ingestion
# scenario as x89): how much each source shrinks under exact dedup.
@register(
    "x95_source_dedup_rate",
    """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
        corpus AS (SELECT doc_id, source, text FROM documents
                   UNION ALL
                   SELECT doc_id + m + 1, source, text FROM documents, mx
                   WHERE doc_id % 5 = 0),
        k AS (SELECT MIN(doc_id) AS kid FROM corpus GROUP BY md5(text)),
        j AS (SELECT c.source, CASE WHEN k.kid IS NULL THEN 0 ELSE 1 END AS kept
              FROM corpus c LEFT JOIN k ON c.doc_id = k.kid)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(kept) AS BIGINT) AS n_kept,
              ROUND(1.0 - SUM(kept) / COUNT(*), 6) AS dup_rate
       FROM j GROUP BY source""",
)
def x95(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    mx = docs.agg(F.max("doc_id")).first()[0]
    corpus = docs.unionAll(
        docs.filter(F.col("doc_id") % 5 == 0).select(
            (F.col("doc_id") + mx + 1).alias("doc_id"), "source", "text"
        )
    )
    kept = dedup.exact_dedup(corpus, "text", "doc_id").select(
        "doc_id", F.lit(1).alias("kept")
    )
    return (
        corpus.join(kept, "doc_id", "left")
        .na.fill({"kept": 0})
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("kept").cast("bigint").alias("n_kept"),
            F.round(1.0 - F.sum("kept") / F.count(F.lit(1)), 6).alias("dup_rate"),
        )
    )


# x96 — embedding drift between corpus halves: per-label centroid cosine
# (posexplode centroid agg, |labels|-sized join).
@register(
    "x96_centroid_drift",
    """WITH e AS (SELECT label, vec_id, unnest(CAST(embedding AS DOUBLE[])) AS v,
                         generate_subscripts(embedding, 1) AS pos
                  FROM embeddings),
        ca AS (SELECT label, pos, AVG(v) AS m FROM e WHERE vec_id % 2 = 0
               GROUP BY label, pos),
        cb AS (SELECT label, pos, AVG(v) AS m FROM e WHERE vec_id % 2 = 1
               GROUP BY label, pos),
        va AS (SELECT label, array_agg(m ORDER BY pos) AS c FROM ca GROUP BY label),
        vb AS (SELECT label, array_agg(m ORDER BY pos) AS c FROM cb GROUP BY label),
        j AS (SELECT va.label,
                     list_dot_product(va.c, vb.c)
                     / (sqrt(list_dot_product(va.c, va.c))
                        * sqrt(list_dot_product(vb.c, vb.c))) AS cos
              FROM va JOIN vb ON va.label = vb.label)
       SELECT label, ROUND(cos, 6) AS cos, ROUND(1 - cos, 6) AS shift FROM j""",
)
def x96(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings")
    a = emb.filter(F.col("vec_id") % 2 == 0)
    b = emb.filter(F.col("vec_id") % 2 == 1)
    return similarity.centroid_shift(a, b, "embedding", "label")
