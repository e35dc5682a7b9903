"""Extension queries, round 3 (x63..x72): training-data pipeline
operators — fixed-capacity shard packing on distributed prefix sums,
per-group standardization, quantile winsorization, a six-table star
revenue join, regex scrub counting, bigram language-model counts,
BPE-ish token budgets, perplexity-proxy document scoring, retention
cohorts, and cluster-balanced diversity sampling.

Same oracle discipline as earlier batches: engine-portable DuckDB SQL
built from the literals the Spark operators ship, identical aliases on
both sides, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import relational, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table, local_rows

_SCRUB_PAT = r"\b(value|table)\b"


# --------------------------------------------------------------------------
# x63 — sequence packing: documents assigned, in doc_id order, to
# fixed-capacity training shards by cumulative token count.  The cumsum
# routes through global_cumsum (range-partitioned prefix sums), so the
# packing pass scales without a one-task window.
@register(
    "x63_shard_packing",
    f"""WITH t AS (SELECT doc_id, len({_TOK}) AS n_tokens FROM documents),
        c AS (SELECT doc_id, n_tokens,
                     SUM(n_tokens) OVER (ORDER BY doc_id) AS cum
              FROM t)
        SELECT CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS shard,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
        FROM c GROUP BY 1""",
)
def x63(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    counted = textops.with_token_count(docs, "text").drop("text")
    packed = textops.pack_shards(counted, "doc_id", "n_tokens", capacity=512)
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
    )


# x64 — per-language standardization of document length: group moments
# from one hash agg broadcast back, never a per-row window.
@register(
    "x64_zscore_by_lang",
    """SELECT doc_id, lang,
              ROUND(CASE WHEN stddev_pop(n_chars) OVER (PARTITION BY lang) > 0
                         THEN (n_chars - avg(n_chars) OVER (PARTITION BY lang))
                              / stddev_pop(n_chars) OVER (PARTITION BY lang)
                         ELSE 0.0 END, 6) AS z
       FROM documents""",
)
def x64(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "lang", "n_chars")
    # lang is a ~5-value column: |groups| tiny by construction, so the
    # forced-broadcast profile is the right call here.
    return relational.group_zscore(
        docs, "n_chars", ["lang"], broadcast_moments=True
    ).select("doc_id", "lang", "z")


# x65 — winsorized corpus statistics: clip document length to the global
# exact [p05, p95] (linear-interpolated percentile — identical
# interpolation to quantile_cont), then per-source stats.
@register(
    "x65_winsorized_stats",
    """WITH q AS (SELECT quantile_cont(n_chars, 0.05) AS ql,
                         quantile_cont(n_chars, 0.95) AS qh FROM documents)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(AVG(LEAST(GREATEST(n_chars, ql), qh)), 6) AS avg_clipped,
              ROUND(MIN(LEAST(GREATEST(n_chars, ql), qh)), 6) AS lo,
              ROUND(MAX(LEAST(GREATEST(n_chars, ql), qh)), 6) AS hi
       FROM documents, q GROUP BY source""",
)
def x65(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("source", "n_chars")
    clipped = relational.winsorize(docs, "n_chars", 0.05, 0.95, exact=True)
    c = F.col("n_chars_clipped")
    return clipped.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg(c), 6).alias("avg_clipped"),
        F.round(F.min(c), 6).alias("lo"),
        F.round(F.max(c), 6).alias("hi"),
    )


# x66 — six-table star revenue (TPC-H Q5 shape): customer/supplier nation
# co-membership within one region.  Fact-fact joins shuffle on their keys;
# nation/region broadcast; AQE upgrades the rest when small.
@register(
    "x66_region_revenue",
    """SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_items,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM customer
       JOIN orders ON c_custkey = o_custkey
       JOIN lineitem ON l_orderkey = o_orderkey
       JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       WHERE r_name = 'ASIA'
       GROUP BY n_name""",
)
def x66(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    orders = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = load_table(spark, sf, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            sup,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("c_nationkey") == F.col("s_nationkey")),
        )
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# x67 — regex scrub counting (the counting pass of PII redaction): per
# source, documents containing the pattern and total occurrences.  The
# pattern here is synthetic (the corpus has no PII) — the contract under
# test is regexp semantics parity and the codegen'd scan shape.
@register(
    "x67_scrub_counts",
    f"""SELECT source,
               CAST(SUM(CASE WHEN len(regexp_extract_all(text, '{_SCRUB_PAT}')) > 0
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit,
               CAST(SUM(len(regexp_extract_all(text, '{_SCRUB_PAT}'))) AS BIGINT)
                   AS n_matches
        FROM documents GROUP BY source""",
)
def x67(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.pattern_counts(docs, "text", _SCRUB_PAT, "source")


# x68 — bigram language-model counts: per-language top-5 bigrams with
# conditional probability p = c(w1,w2)/c(w1,·).  The w1 marginal is
# re-aggregated from the (vocabulary-sized) bigram counts, not the corpus.
@register(
    "x68_bigram_lm",
    f"""WITH tok AS (SELECT lang, {_TOK} AS ts FROM documents),
        bg AS (SELECT lang,
                      unnest(list_transform(range(1, len(ts)),
                                            i -> ts[i] || ' ' || ts[i + 1])) AS g
               FROM tok),
        sp AS (SELECT lang, split_part(g, ' ', 1) AS w1,
                      split_part(g, ' ', 2) AS w2 FROM bg),
        c AS (SELECT lang, w1, w2, CAST(COUNT(*) AS BIGINT) AS c
              FROM sp GROUP BY 1, 2, 3),
        t AS (SELECT lang, w1, SUM(c) AS c_w1 FROM c GROUP BY 1, 2),
        r AS (SELECT c.*, ROW_NUMBER() OVER (PARTITION BY lang
                                             ORDER BY c DESC, w1, w2) AS rn
              FROM c)
        SELECT r.lang, r.w1, r.w2, r.c,
               ROUND(r.c / CAST(t.c_w1 AS DOUBLE), 6) AS p, r.rn
        FROM r JOIN t ON r.lang = t.lang AND r.w1 = t.w1
        WHERE rn <= 5""",
)
def x68(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.bigram_conditional_topk(docs, "text", "lang", k=5)


# x69 — BPE-ish token budget per source: regex pre-tokenization (letter
# runs | digits | punctuation) alongside the whitespace count — the cheap
# proxy for a real tokenizer's shard budget.
@register(
    "x69_bpe_token_count",
    f"""SELECT source,
               CAST(SUM(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]'))) AS BIGINT)
                   AS bpe_tokens,
               CAST(SUM(len({_TOK})) AS BIGINT) AS ws_tokens
        FROM documents GROUP BY source""",
)
def x69(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    counted = textops.with_bpe_token_count(
        textops.with_token_count(docs, "text", "ws"), "text", "bpe"
    )
    return counted.groupBy("source").agg(
        F.sum("bpe").cast("bigint").alias("bpe_tokens"),
        F.sum("ws").cast("bigint").alias("ws_tokens"),
    )


# x70 — perplexity-proxy quality signal: per-document bigram NLL under the
# corpus's own bigram LM (KenLM-style filtering without external models).
@register(
    "x70_lm_doc_nll",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        inst AS (SELECT doc_id,
                        unnest(list_transform(range(1, len(ts)),
                                              i -> ts[i] || ' ' || ts[i + 1])) AS g
                 FROM tok),
        sp AS (SELECT doc_id, split_part(g, ' ', 1) AS w1,
                      split_part(g, ' ', 2) AS w2 FROM inst),
        c AS (SELECT w1, w2, COUNT(*) AS c FROM sp GROUP BY 1, 2),
        t AS (SELECT w1, SUM(c) AS c_w1 FROM c GROUP BY 1),
        p AS (SELECT c.w1, c.w2, c.c / CAST(t.c_w1 AS DOUBLE) AS p
              FROM c JOIN t ON c.w1 = t.w1)
        SELECT sp.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
               ROUND(AVG(-ln(p.p)), 6) AS nll
        FROM sp JOIN p ON sp.w1 = p.w1 AND sp.w2 = p.w2
        GROUP BY sp.doc_id""",
)
def x70(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.lm_doc_nll(docs, "text", "doc_id")


# x71 — retention cohorts: users bucketed by first-seen day, activity
# counted per day offset.  Two shuffle-bounded aggs + one broadcast-able
# join on the (|users|-sized) cohort frame.
@register(
    "x71_retention_cohorts",
    """WITH first AS (SELECT user_id,
                             CAST(MIN(date_trunc('day', ts)) AS DATE) AS cohort_day
                      FROM events GROUP BY user_id)
       SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
              CAST(datediff('day', cohort_day, date_trunc('day', ts)) AS BIGINT)
                  AS day_offset,
              CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_users
       FROM events e JOIN first USING (user_id)
       GROUP BY 1, 2""",
)
def x71(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events as ev_ops

    ev = load_table(spark, sf, "events")
    return ev_ops.retention_cohorts(ev, "user_id", "ts")


# x72 — cluster-balanced diversity sample, upgraded r10 from rows-only
# to a PLANTED-FIXTURE oracle (the x25/x200 execution-forcing pattern):
# (a) plant 4 tight point clusters (12 points each, centers 100 apart,
#     offsets ±0.2 — any correct k=4 Lloyd solve recovers exactly the
#     planted partition) and run the REAL cluster_balanced_sample
#     pipeline (fit → assign → quota) over them with the recall-robust
#     k-means|| profile; per-group list purity (1 list per group), the
#     total distinct-list count (4) and the kept-row count (48, quota =
#     group size) are all LITERAL SQL pins;
# (b) ONE corpus row measured on the ASSIGNMENT OUTPUT: the x72 fast
#     quantizer profile fits on the real embeddings and every corpus
#     vector is assigned; SUM(ivf_list IN [0,8)) over the output column
#     equals COUNT(*) of embeddings — SQL-derivable from the INPUT, but
#     the Spark value is computed from the argmin's output, forcing the
#     assignment expression to execute on every row.
# A hash match certifies the Lloyd solver finds planted structure, the
# quota keeps every member, and assignment ran corpus-wide.
_X72_CENTERS = [
    (0.0, 0.0, 0.0, 0.0),
    (100.0, 0.0, 0.0, 0.0),
    (0.0, 100.0, 0.0, 0.0),
    (0.0, 0.0, 100.0, 0.0),
]

_X72_SQL = """
WITH corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM embeddings)
SELECT 'corpus_assigned' AS key, v AS value FROM corpus
UNION ALL SELECT 'fixture_rows_kept', CAST(48 AS DOUBLE)
UNION ALL SELECT 'total_distinct_lists', CAST(4 AS DOUBLE)
UNION ALL SELECT 'group_distinct_lists:0', CAST(1 AS DOUBLE)
UNION ALL SELECT 'group_distinct_lists:1', CAST(1 AS DOUBLE)
UNION ALL SELECT 'group_distinct_lists:2', CAST(1 AS DOUBLE)
UNION ALL SELECT 'group_distinct_lists:3', CAST(1 AS DOUBLE)
ORDER BY key"""


@register("x72_cluster_balanced_sample", _X72_SQL)
def x72(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    rows = []
    for g, c in enumerate(_X72_CENTERS):
        for j in range(12):
            off = [(((j * 7 + k * 3) % 5) - 2) * 0.1 for k in range(4)]
            rows.append((g * 12 + j, [c[k] + off[k] for k in range(4)]))
    fix = local_rows(spark, rows, "vec_id bigint, embedding array<double>")
    sampled = similarity.cluster_balanced_sample(
        fix, "embedding", "vec_id", n_lists=4, k_per_cluster=12,
        init_mode="k-means||", max_iter=20,
    )
    per_group = (
        sampled.withColumn("grp", F.floor(F.col("vec_id") / 12).cast("int"))
        .groupBy("grp")
        .agg(F.countDistinct("ivf_list").cast("double").alias("value"))
        .select(
            F.concat(F.lit("group_distinct_lists:"), F.col("grp")).alias("key"),
            "value",
        )
    )
    totals = sampled.agg(
        F.countDistinct("ivf_list").cast("double").alias("dl"),
        F.count(F.lit(1)).cast("double").alias("n"),
    )
    t_lists = totals.select(
        F.lit("total_distinct_lists").alias("key"), F.col("dl").alias("value")
    )
    t_kept = totals.select(
        F.lit("fixture_rows_kept").alias("key"), F.col("n").alias("value")
    )
    # corpus execution-forcing row: x72's fast quantizer profile, full-
    # corpus assignment, measured ON THE OUTPUT column
    emb = load_table(spark, sf, "embeddings")
    cents = similarity.fit_ivf_centroids(
        emb, "embedding", n_lists=8, seed=42, sample_rows=100_000,
        max_iter=10, init_mode="random",
    )
    assigned = similarity.with_ivf_list(emb, "embedding", cents)
    corpus = assigned.agg(
        F.sum(
            F.when(
                (F.col("ivf_list") >= 0) & (F.col("ivf_list") < 8), 1
            ).otherwise(0)
        )
        .cast("double")
        .alias("value")
    ).select(F.lit("corpus_assigned").alias("key"), "value")
    return (
        per_group.unionByName(t_lists)
        .unionByName(t_kept)
        .unionByName(corpus)
        .orderBy("key")
    )


# x73 — the curation pipeline END-TO-END with a fully composed oracle:
# quality/lang filter (x46 semantics) → exact dedup keep-min (x01
# semantics) → fixed-capacity shard packing (x63 semantics) → per-shard
# stats.  One lazy plan on the Spark side; the oracle nests the same three
# stages as CTE subqueries.
def _curation_oracle(capacity: int = 512) -> str:
    from flashml_spark.queries_ext3 import _quality_filter_oracle

    return f"""
    WITH kept AS (
      SELECT d.doc_id, d.text FROM documents d
      JOIN ({_quality_filter_oracle()}) v
        ON d.doc_id = v.doc_id AND v.keep),
    ded AS (
      SELECT doc_id, text FROM (
        SELECT doc_id, text,
               MIN(doc_id) OVER (PARTITION BY md5(text)) AS keep_id
        FROM kept) s
      WHERE doc_id = keep_id),
    t AS (SELECT doc_id, len({_TOK}) AS n_tokens FROM ded),
    c AS (SELECT doc_id, n_tokens,
                 SUM(n_tokens) OVER (ORDER BY doc_id) AS cum FROM t)
    SELECT CAST(FLOOR((cum - n_tokens) / {capacity}.0) AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM c GROUP BY 1"""


@register("x73_curation_pipeline", _curation_oracle())
def x73(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    packed = textops.curate_and_pack(docs, "text", "doc_id", lang_col="lang")
    return packed.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
    )


# x74 — vocabulary coverage cutoff (tokenizer prep): per language, the
# smallest frequency-ranked vocab covering 95% of token occurrences.
# Cumulatives run over the vocabulary (bounded), never the corpus.
@register(
    "x74_vocab_coverage",
    f"""WITH tok AS (SELECT lang, unnest({_TOK}) AS w FROM documents),
        c AS (SELECT lang, w, COUNT(*) AS c FROM tok GROUP BY 1, 2),
        r AS (SELECT lang, c,
                     ROW_NUMBER() OVER (PARTITION BY lang ORDER BY c DESC, w) AS rn,
                     SUM(c) OVER (PARTITION BY lang ORDER BY c DESC, w
                                  ROWS UNBOUNDED PRECEDING) AS cum
              FROM c),
        t AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS total_tokens,
                     CAST(COUNT(*) AS BIGINT) AS distinct_words
              FROM c GROUP BY 1)
        SELECT r.lang, CAST(MIN(rn) AS BIGINT) AS vocab_size,
               t.distinct_words, t.total_tokens
        FROM r JOIN t ON r.lang = t.lang
        WHERE cum >= 0.95 * t.total_tokens
        GROUP BY r.lang, t.distinct_words, t.total_tokens""",
)
def x74(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.vocab_coverage(docs, "text", "lang", coverage=0.95)


# x75 — semantic dedup END-TO-END: embedding near-dup pairs (x17's exact
# bucket/threshold SQL) → transitive components (x35's recursive
# reachability formulation) → keep min id per group.  The semantic twin
# of the minhash flagship, hash-checked the same way.
def _semantic_dedup_oracle() -> str:
    from flashml_spark.queries_ext2 import _neardup_oracle

    return f"""WITH RECURSIVE pairs AS ({_neardup_oracle()}),
       sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
       reach(id, lbl) AS (
         SELECT src, src FROM sym
         UNION
         SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id),
       comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
       SELECT vec_id, label FROM embeddings
       WHERE vec_id NOT IN (SELECT id FROM comp WHERE id <> component)"""


@register("x75_semantic_dedup_e2e", _semantic_dedup_oracle())
def x75(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity
    from flashml_spark.queries_ext2 import _DIM, _NDUP_T, _PLANES_N, _SEED

    emb = load_table(spark, sf, "embeddings")
    return similarity.semantic_dedup(
        emb, "embedding", "vec_id", threshold=_NDUP_T,
        n_planes=_PLANES_N, seed=_SEED, dim=_DIM,
    ).select("vec_id", "label")


# x76 — per-document token entropy (nats): the third quality axis next to
# repetition ratio and LM NLL.  ln n - (Σ c ln c)/n, one agg per doc.
@register(
    "x76_token_entropy",
    f"""WITH tok AS (SELECT doc_id, unnest({_TOK}) AS w FROM documents),
        c AS (SELECT doc_id, w, COUNT(*) AS c FROM tok GROUP BY 1, 2)
        SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
               ROUND(ln(SUM(c)) - SUM(c * ln(c)) / SUM(c), 6) AS entropy
        FROM c GROUP BY doc_id""",
)
def x76(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.token_entropy(docs, "text", "doc_id")


# x77 — pairwise source vocabulary overlap (corpus diversity audit):
# |groups|²-bounded Jaccard matrix off token-keyed distinct joins.
@register(
    "x77_source_overlap",
    f"""WITH v AS (SELECT DISTINCT source AS g, unnest({_TOK}) AS w
                   FROM documents),
        s AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS size FROM v GROUP BY g),
        c AS (SELECT a.g AS g_a, b.g AS g_b, CAST(COUNT(*) AS BIGINT) AS common
              FROM v a JOIN v b USING (w) WHERE a.g < b.g GROUP BY 1, 2)
        SELECT g_a, g_b, common, sa.size AS size_a, sb.size AS size_b,
               ROUND(common / CAST(sa.size + sb.size - common AS DOUBLE), 6)
                   AS jaccard
        FROM c JOIN s sa ON c.g_a = sa.g JOIN s sb ON c.g_b = sb.g""",
)
def x77(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.source_vocab_overlap(docs, "text", "source")


# x78 — pricing summary (TPC-H Q1 shape): the classic wide-aggregate scan.
# Eight aggregates in ONE pass — map-side partials absorb everything;
# the only shuffle carries |groups| rows.
@register(
    "x78_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
              ROUND(SUM(l_quantity), 2) AS sum_qty,
              ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
              ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)
                  AS sum_charge,
              ROUND(AVG(l_quantity), 6) AS avg_qty,
              ROUND(AVG(l_extendedprice), 6) AS avg_price,
              ROUND(AVG(l_discount), 6) AS avg_disc,
              CAST(COUNT(*) AS BIGINT) AS count_order
       FROM lineitem GROUP BY l_returnflag, l_linestatus""",
)
def x78(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
        F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
        F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
        F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
        F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
        F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
        F.round(F.avg("l_discount"), 6).alias("avg_disc"),
        F.count(F.lit(1)).alias("count_order"),
    )


# x79 — snapshot diff audit: two synthetic corpus snapshots derived from
# the documents table (old = ids < 80% max, new = ids > 10% max with a
# deterministic mutation on ids divisible by 7), diffed by content digest
# over a full-outer id join.
@register(
    "x79_snapshot_diff",
    """WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
       old AS (SELECT doc_id, text FROM documents, mx WHERE doc_id < 0.8 * m),
       new AS (SELECT doc_id,
                      CASE WHEN doc_id % 7 = 0 THEN text || ' v2' ELSE text END AS text
               FROM documents, mx WHERE doc_id > 0.1 * m),
       j AS (SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                    o.doc_id IS NOT NULL AS in_old, n.doc_id IS NOT NULL AS in_new,
                    md5(COALESCE(o.text, '')) AS ho, md5(COALESCE(n.text, '')) AS hn
             FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id)
       SELECT CASE WHEN NOT in_old THEN 'added'
                   WHEN NOT in_new THEN 'removed'
                   WHEN ho <> hn THEN 'changed'
                   ELSE 'unchanged' END AS status,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM j GROUP BY 1""",
)
def x79(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    docs = load_table(spark, sf, "documents")
    mx = docs.agg(F.max("doc_id")).first()[0]
    old = docs.filter(F.col("doc_id") < 0.8 * mx).select("doc_id", "text")
    new = docs.filter(F.col("doc_id") > 0.1 * mx).select(
        "doc_id",
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" v2")))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return dedup.snapshot_diff(old, new, "text", "doc_id").groupBy("status").agg(
        F.count(F.lit(1)).alias("n")
    )


# x80 — ANN retrieval quality, oracle-checked: recall@10 of the LSH
# single-probe bucket search against exact brute force, for the corpus's
# own vec_id=0 as the query.  Both engines rank by ROUND(cosine, 6) with
# vec_id tie-break, and the bucket expression inlines the same literal
# hyperplanes the Spark operator broadcasts (x17's machinery).
def _ann_recall_oracle(k: int = 10) -> str:
    from flashml_spark.queries_ext2 import _PLANES

    bucket_terms = " + ".join(
        "(CASE WHEN list_dot_product(v, [{plane}]) > 0 THEN {bit} ELSE 0 END)".format(
            plane=", ".join(repr(x) for x in plane), bit=1 << b
        )
        for b, plane in enumerate(_PLANES)
    )
    cos = ("list_dot_product(e.v, q.v) / (sqrt(list_dot_product(e.v, e.v))"
           " * sqrt(list_dot_product(q.v, q.v)))")
    return f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
               WHERE vec_id = 0),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    brute AS (SELECT e.vec_id FROM e, q
              ORDER BY ROUND({cos}, 6) DESC, e.vec_id LIMIT {k}),
    bkt AS (SELECT vec_id, v, CAST({bucket_terms} AS BIGINT) AS bucket FROM e),
    qb AS (SELECT CAST({bucket_terms.replace("(v,", "(q.v,").replace("list_dot_product(v", "list_dot_product(q.v")} AS BIGINT) AS bucket
           FROM (SELECT v FROM q) q(v)),
    lsh AS (SELECT e.vec_id
            FROM (SELECT vec_id, v FROM bkt, qb WHERE bkt.bucket = qb.bucket) e, q
            ORDER BY ROUND({cos}, 6) DESC, e.vec_id LIMIT {k})
    SELECT CAST(COUNT(*) AS BIGINT) AS hits,
           ROUND(COUNT(*) / {k}.0, 6) AS recall
    FROM lsh WHERE vec_id IN (SELECT vec_id FROM brute)"""


@register("x80_ann_recall", _ann_recall_oracle())
def x80(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity
    from flashml_spark.queries_ext2 import _DIM, _PLANES_N, _SEED

    emb = load_table(spark, sf, "embeddings")
    qvec = [
        float(x)
        for x in emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]
    ]
    brute = similarity.knn_brute_force(emb, "embedding", "vec_id", qvec, k=10)
    lsh = similarity.knn_lsh(
        emb, "embedding", "vec_id", qvec, k=10,
        n_planes=_PLANES_N, seed=_SEED, n_probes=1,
    )
    hits = lsh.join(brute.select("vec_id"), "vec_id", "left_semi").agg(
        F.count(F.lit(1)).alias("hits")
    )
    return hits.select(
        F.col("hits").cast("bigint").alias("hits"),
        F.round(F.col("hits") / 10.0, 6).alias("recall"),
    )


# x81 — cross-document boilerplate fraction: distinct 8-token windows per
# doc, window document-frequency across the corpus, per-doc shared
# fraction.  The inter-document twin of x49's within-doc repetition.
@register(
    "x81_boilerplate_fraction",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        w AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(range(1, len(ts) - 6),
                         i -> ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] || ' ' ||
                              ts[i+3] || ' ' || ts[i+4] || ' ' || ts[i+5] || ' ' ||
                              ts[i+6] || ' ' || ts[i+7])) AS w
              FROM tok),
        d AS (SELECT w, COUNT(*) AS df FROM w GROUP BY w)
        SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
               CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) AS BIGINT) AS shared,
               ROUND(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS bp_frac
        FROM w JOIN d USING (w) GROUP BY doc_id""",
)
def x81(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.boilerplate_fraction(docs, "text", "doc_id", n=8)


# x82 — IVF probe path, oracle-checked with FIXED centroids: assignment
# (argmin L2, first-min tie-break = centroid order), probing the 2 lists
# nearest the query, exact cosine top-10 within them.  Centroids are the
# embeddings of vec_id 1..4 on both engines, so the k-means fit (the one
# non-SQL piece, covered by unit parity) is factored out and everything
# else is hash-checked.
def _ivf_probe_oracle(k: int = 10, n_probe: int = 2) -> str:
    l2 = ("sqrt(list_sum(list_transform(list_zip({a}, {b}),"
          " p -> (p[1] - p[2]) * (p[1] - p[2]))))")
    cos = ("list_dot_product(e.v, q.v) / (sqrt(list_dot_product(e.v, e.v))"
           " * sqrt(list_dot_product(q.v, q.v)))")
    return f"""
    WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
               FROM embeddings WHERE vec_id IN (1, 2, 3, 4)),
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          WHERE vec_id = 0),
    e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    assign AS (
      SELECT vec_id, v, cid,
             ROW_NUMBER() OVER (PARTITION BY vec_id
                 ORDER BY {l2.format(a="v", b="cv")}, cid) AS rn
      FROM e0, c),
    listed AS (SELECT vec_id, v, cid AS ivf_list FROM assign WHERE rn = 1),
    probe AS (
      SELECT cid FROM c, q
      ORDER BY {l2.format(a="q.v", b="cv")}, cid LIMIT {n_probe}),
    e AS (SELECT vec_id, v FROM listed WHERE ivf_list IN (SELECT cid FROM probe))
    SELECT e.vec_id, ROUND({cos}, 6) AS sim
    FROM e, q ORDER BY ROUND({cos}, 6) DESC, e.vec_id LIMIT {k}"""


@register("x82_ivf_probe", _ivf_probe_oracle())
def x82(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings")
    fixed = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id").isin(0, 1, 2, 3, 4))
        .select("vec_id", "embedding")
        .collect()
    }
    centroids = [fixed[i] for i in (1, 2, 3, 4)]  # cid order = list index
    return similarity.knn_ivf(
        emb, "embedding", "vec_id", fixed[0], k=10,
        centroids=centroids, n_probe=2,
    )


# x83 — shipping-priority top-10 (TPC-H Q3 shape): selective date filters
# pushed to both scans, fact-fact join, revenue agg, TakeOrderedAndProject
# for the top-k (per-partition heaps — never a global sort).
@register(
    "x83_shipping_priority",
    """SELECT o_orderkey,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              CAST(o_orderdate AS VARCHAR) AS o_orderdate
       FROM orders JOIN lineitem ON l_orderkey = o_orderkey
       WHERE o_orderdate < TIMESTAMP '1998-01-01'
         AND l_shipdate > TIMESTAMP '1998-01-01'
       GROUP BY o_orderkey, o_orderdate
       ORDER BY revenue DESC, o_orderkey LIMIT 10""",
)
def x83(spark: SparkSession, sf: str) -> DataFrame:
    orders = load_table(spark, sf, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    ).select("o_orderkey", "o_orderdate")
    li = load_table(spark, sf, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
        .select(
            "o_orderkey", "revenue", F.col("o_orderdate").cast("string").alias("o_orderdate")
        )
        .orderBy(F.desc("revenue"), "o_orderkey")
        .limit(10)
    )
