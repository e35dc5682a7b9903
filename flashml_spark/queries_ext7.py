"""Extension queries, round 4 second batch (x97..x105): the remaining
classic decision-support join shapes the engine had not yet exercised
(outer-join distribution, decorrelated per-group scalar compare, HAVING +
join-back top-k, scalar-subquery anti-join, dual-dimension trade matrix,
arg-min join-back) plus three training-data audits (PII scrubbing,
character-n-gram language proximity, embedding-norm drift).

Oracle discipline unchanged: engine-portable DuckDB SQL sharing every
literal and alias with the Spark side, deterministic tie-breaks, money
sums rounded to 2 (sum-order noise stays below a cent), unit-scale
values to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import similarity, textops
from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# x97 — order-count distribution (TPC-H Q13 shape): orders per customer
# including zero-order customers (LEFT join), then the histogram of those
# counts.  Two hash aggs; the second input is |customers|-sized.
@register(
    "x97_order_count_distribution",
    """WITH c AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
                  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
                  GROUP BY c_custkey)
       SELECT CAST(c_count AS BIGINT) AS c_count,
              CAST(COUNT(*) AS BIGINT) AS custdist
       FROM c GROUP BY c_count""",
)
def x97(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").select(
        F.col("o_custkey").alias("c_custkey"), "o_orderkey"
    )
    per_cust = (
        c.join(o, "c_custkey", "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


# x98 — small-quantity revenue (TPC-H Q17 shape): revenue lost to lines
# below half their part's average quantity.  The correlated scalar
# decorrelates into a per-part agg joined back on the part key — co-keyed
# shuffle join, no window, no correlated re-scan.
@register(
    "x98_small_qty_revenue",
    """WITH a AS (SELECT l_partkey, 0.5 * AVG(l_quantity) AS thr
                  FROM lineitem GROUP BY l_partkey)
       SELECT ROUND(SUM(l.l_extendedprice) / 7.0, 2) AS avg_yearly
       FROM lineitem l JOIN a ON l.l_partkey = a.l_partkey
       WHERE l.l_quantity < a.thr""",
)
def x98(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thr = li.groupBy("l_partkey").agg(
        (0.5 * F.avg("l_quantity")).alias("thr")
    )
    return (
        li.join(thr, "l_partkey")
        .filter(F.col("l_quantity") < F.col("thr"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


# x99 — large-volume orders (TPC-H Q18 shape): orders whose total quantity
# clears a floor, joined back to customer detail, top-10 by price.
# HAVING prunes to a tiny frame BEFORE the join; top-k is a TakeOrdered.
@register(
    "x99_large_orders",
    """WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS total_qty
                    FROM lineitem GROUP BY l_orderkey
                    HAVING SUM(l_quantity) > 200)
       SELECT c.c_name, o.o_orderkey,
              CAST(o.o_orderdate AS VARCHAR) AS o_orderdate,
              o.o_totalprice, ROUND(b.total_qty, 2) AS total_qty
       FROM big b
       JOIN orders o ON b.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       ORDER BY o.o_totalprice DESC, o.o_orderkey LIMIT 10""",
)
def x99(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_quantity")
    big = (
        li.groupBy(F.col("l_orderkey").alias("o_orderkey"))
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    o = load_table(spark, sf, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"
    )
    c = load_table(spark, sf, "customer").select("c_custkey", "c_name")
    return (
        big.join(o, "o_orderkey")
        .join(c, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_name",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd HH:mm:ss").alias("o_orderdate"),
            "o_totalprice",
            F.round("total_qty", 2).alias("total_qty"),
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(10)
    )


# x100 — dormant high-balance customers (TPC-H Q22 shape): balance above
# the positive-balance average (scalar subquery → 1-row broadcast) with no
# order since 2000 (anti-join), rolled up by market segment.
@register(
    "x100_dormant_rich_customers",
    """WITH ab AS (SELECT AVG(c_acctbal) AS ab FROM customer
                   WHERE c_acctbal > 0),
        recent AS (SELECT DISTINCT o_custkey FROM orders
                   WHERE o_orderdate >= TIMESTAMP '2000-01-01')
       SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_cust,
              ROUND(SUM(c_acctbal), 2) AS total_bal
       FROM customer c, ab
       WHERE c.c_acctbal > ab.ab
         AND c.c_custkey NOT IN (SELECT o_custkey FROM recent)
       GROUP BY c_mktsegment""",
)
def x100(spark: SparkSession, sf: str) -> DataFrame:
    cust = load_table(spark, sf, "customer").select(
        "c_custkey", "c_mktsegment", "c_acctbal"
    )
    ab = cust.filter(F.col("c_acctbal") > 0).agg(F.avg("c_acctbal").alias("ab"))
    recent = (
        load_table(spark, sf, "orders")
        .filter(F.col("o_orderdate") >= "2000-01-01")
        .select(F.col("o_custkey").alias("c_custkey"))
    )
    return (
        cust.crossJoin(F.broadcast(ab))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(recent, "c_custkey", "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


# x101 — nation trade matrix (TPC-H Q7 shape): revenue between supplier
# and customer nations per ship year.  Fact joins on its keys; both nation
# dims broadcast; output is |nations|² × years bounded.
@register(
    "x101_nation_trade_matrix",
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              CAST(EXTRACT(year FROM l.l_shipdate) AS BIGINT) AS l_year,
              ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
       FROM lineitem l
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       JOIN customer c ON o.o_custkey = c.c_custkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
       JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
       WHERE l.l_shipdate >= TIMESTAMP '1996-01-01'
         AND l.l_shipdate < TIMESTAMP '1998-01-01'
         AND n1.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
         AND n2.n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
       GROUP BY 1, 2, 3""",
)
def x101(spark: SparkSession, sf: str) -> DataFrame:
    nations = ("NATION_1", "NATION_2", "NATION_3")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    sup = (
        load_table(spark, sf, "supplier")
        .join(
            F.broadcast(nat.filter(F.col("n_name").isin(*nations))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    cus = (
        load_table(spark, sf, "customer")
        .join(
            F.broadcast(nat.filter(F.col("n_name").isin(*nations))),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1998-01-01")
    )
    return (
        li.join(F.broadcast(sup), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cus, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )


# x102 — cheapest supplier per part (TPC-H Q2 arg-min shape, adapted to
# the lineitem fact since the synthetic schema carries no partsupp):
# per small part, the supplier observed at the lowest unit price.
# The arg-min is a struct-min (one hash agg) — identical to the
# row_number()=1 window result but without a per-part sort.
@register(
    "x102_cheapest_supplier",
    """WITH u AS (SELECT l_partkey, l_suppkey,
                         l_extendedprice / l_quantity AS unit_price
                  FROM lineitem WHERE l_quantity > 0),
        r AS (SELECT l_partkey, l_suppkey, unit_price,
                     ROW_NUMBER() OVER (PARTITION BY l_partkey
                                        ORDER BY unit_price, l_suppkey) AS rn
              FROM u)
       SELECT p.p_partkey, p.p_name, r.l_suppkey AS best_suppkey,
              ROUND(r.unit_price, 6) AS best_unit_price
       FROM r JOIN part p ON r.l_partkey = p.p_partkey
       WHERE r.rn = 1 AND p.p_size < 10""",
)
def x102(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").filter(F.col("l_quantity") > 0)
    unit = li.select(
        "l_partkey",
        "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
    )
    best = unit.groupBy("l_partkey").agg(
        F.min(F.struct("unit_price", "l_suppkey")).alias("__b")
    )
    p = load_table(spark, sf, "part").filter(F.col("p_size") < 10)
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select(
            "p_partkey",
            "p_name",
            F.col("__b.l_suppkey").alias("best_suppkey"),
            F.round(F.col("__b.unit_price"), 6).alias("best_unit_price"),
        )
    )


# x103 — PII scrub audit: deterministic synthetic PII is injected into
# every 7th document (the corpus itself is PII-free word soup), then the
# scrubber counts and redacts it; per-source roll-up proves the redaction
# accounting balances (chars removed = pre/post length delta).
_PII_INJECT_SQL = """SELECT doc_id, source,
           CASE WHEN doc_id % 7 = 0
                THEN text || ' contact user' || doc_id
                     || '@example.com or 555-010-'
                     || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE text END AS text
    FROM documents"""


@register(
    "x103_pii_scrub",
    f"""WITH injected AS ({_PII_INJECT_SQL}),
        s AS (SELECT source,
                     len(regexp_extract_all(text,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS ne,
                     len(regexp_extract_all(text,
                         '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b')) AS np,
                     length(text)
                     - length(regexp_replace(regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
                           '<EMAIL>', 'g'),
                           '\\b\\d{{3}}-\\d{{3}}-\\d{{4}}\\b',
                           '<PHONE>', 'g')) AS delta
              FROM injected)
       SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN ne + np > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS docs_with_pii,
              CAST(SUM(ne) AS BIGINT) AS n_emails,
              CAST(SUM(np) AS BIGINT) AS n_phones,
              CAST(SUM(delta) AS BIGINT) AS chars_removed
       FROM s GROUP BY source""",
)
def x103(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "source", "text")
    injected = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(
                F.col("text"),
                F.lit(" contact user"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or 555-010-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.col("text")),
    )
    pats = {k: textops.PII_PATTERNS[k] for k in ("email", "phone")}
    scrubbed = textops.scrub_pii(injected, "text", patterns=pats)
    return scrubbed.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(((F.col("n_email") + F.col("n_phone")) > 0).cast("int"))
        .cast("bigint")
        .alias("docs_with_pii"),
        F.sum("n_email").cast("bigint").alias("n_emails"),
        F.sum("n_phone").cast("bigint").alias("n_phones"),
        F.sum(F.length("text") - F.length("scrubbed"))
        .cast("bigint")
        .alias("chars_removed"),
    )


# x104 — language proximity by character trigrams: pairwise cosine between
# per-language trigram count profiles.  Integer counts make the result
# engine-exact; all post-explode frames are vocabulary-sized.
@register(
    "x104_lang_trigram_cosine",
    """WITH d AS (SELECT lang, text FROM documents WHERE length(text) >= 3),
        g AS (SELECT lang,
                     unnest(list_transform(range(1, length(text) - 1),
                                           i -> substr(text, i, 3))) AS gram
              FROM d),
        p AS (SELECT lang, gram, COUNT(*) AS c FROM g GROUP BY lang, gram),
        nrm AS (SELECT lang, sqrt(SUM(c * c)) AS nrm FROM p GROUP BY lang),
        dots AS (SELECT a.lang AS ga, b.lang AS gb, SUM(a.c * b.c) AS dot
                 FROM p a JOIN p b ON a.gram = b.gram AND a.lang < b.lang
                 GROUP BY 1, 2)
       SELECT ga, gb, ROUND(dot / (na.nrm * nb.nrm), 6) AS cos
       FROM dots
       JOIN nrm na ON dots.ga = na.lang
       JOIN nrm nb ON dots.gb = nb.lang""",
)
def x104(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("lang", "text")
    return textops.char_ngram_group_cosine(docs, "text", "lang", n=3)


# x105 — embedding-norm drift audit: per-label L2 norm stats; identical
# per-row fold order on both engines makes min/max exact and the rounded
# moments stable.
@register(
    "x105_embedding_norm_audit",
    """WITH n AS (SELECT label,
                         sqrt(list_dot_product(CAST(embedding AS DOUBLE[]),
                                               CAST(embedding AS DOUBLE[])))
                             AS nrm
                  FROM embeddings)
       SELECT label, CAST(COUNT(*) AS BIGINT) AS n,
              ROUND(AVG(nrm), 6) AS avg_norm,
              ROUND(MIN(nrm), 6) AS min_norm,
              ROUND(MAX(nrm), 6) AS max_norm,
              ROUND(STDDEV_SAMP(nrm), 6) AS sd_norm
       FROM n GROUP BY label""",
)
def x105(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return similarity.embedding_norm_stats(emb, "embedding", "label")


# x106 — change-set application (corpus upsert/delete merge): the
# incremental-update half of corpus maintenance (x79's snapshot_diff is
# the audit half).  A deterministic change-set is derived from the
# documents table itself — revisions for every 10th base doc, inserts for
# ids past the 80% cutoff, deletes for base ids ≡ 3 (mod 17) that are not
# also revised — then merged in one full-outer join; the roll-up proves
# insert/replace/delete accounting balances per id-bucket.
@register(
    "x106_upsert_apply",
    """WITH mx AS (SELECT CAST(0.8 * MAX(doc_id) AS BIGINT) AS m FROM documents),
        base AS (SELECT doc_id, text FROM documents, mx WHERE doc_id <= m),
        changes AS (
          SELECT doc_id, 'rev2: ' || text AS text, 'upsert' AS op
          FROM documents, mx WHERE doc_id <= m AND doc_id % 10 = 0
          UNION ALL
          SELECT doc_id, text, 'upsert' FROM documents, mx WHERE doc_id > m
          UNION ALL
          SELECT doc_id, text, 'delete'
          FROM documents, mx
          WHERE doc_id <= m AND doc_id % 17 = 3 AND doc_id % 10 <> 0),
        merged AS (
          SELECT COALESCE(c.doc_id, b.doc_id) AS doc_id,
                 COALESCE(c.text, b.text) AS text, c.op
          FROM base b FULL OUTER JOIN changes c ON b.doc_id = c.doc_id)
       SELECT CAST(doc_id % 4 AS BIGINT) AS bucket,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(length(text)) AS BIGINT) AS sum_len,
              CAST(SUM(CASE WHEN text LIKE 'rev2: %' THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_revised
       FROM merged WHERE op IS NULL OR op <> 'delete'
       GROUP BY 1""",
)
def x106(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators.dedup import apply_upserts

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    m = int(0.8 * docs.agg(F.max("doc_id")).first()[0])
    base = docs.filter(F.col("doc_id") <= m)
    revisions = base.filter(F.col("doc_id") % 10 == 0).select(
        "doc_id",
        F.concat(F.lit("rev2: "), F.col("text")).alias("text"),
        F.lit("upsert").alias("op"),
    )
    inserts = docs.filter(F.col("doc_id") > m).select(
        "doc_id", "text", F.lit("upsert").alias("op")
    )
    deletes = base.filter(
        (F.col("doc_id") % 17 == 3) & (F.col("doc_id") % 10 != 0)
    ).select("doc_id", "text", F.lit("delete").alias("op"))
    merged = apply_upserts(
        base, revisions.unionAll(inserts).unionAll(deletes), "doc_id"
    )
    return (
        merged.groupBy((F.col("doc_id") % 4).cast("bigint").alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.length("text")).cast("bigint").alias("sum_len"),
            F.sum(F.col("text").startswith("rev2: ").cast("int"))
            .cast("bigint")
            .alias("n_revised"),
        )
    )


# x107 — behavioral path mining: the 20 most common 3-step event-type
# sequences across users, in event-time order.  Two partitioned LEAD
# windows build the paths (no collect_list, no per-user array
# materialization); the count agg is |distinct paths|-sized and the top-k
# is a TakeOrdered.  Ties break on the path string.
@register(
    "x107_event_paths",
    """WITH s AS (SELECT user_id, event_type,
                         LEAD(event_type, 1) OVER w AS e2,
                         LEAD(event_type, 2) OVER w AS e3
                  FROM events
                  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
       SELECT event_type || '>' || e2 || '>' || e3 AS path,
              CAST(COUNT(*) AS BIGINT) AS n
       FROM s WHERE e2 IS NOT NULL AND e3 IS NOT NULL
       GROUP BY 1 ORDER BY n DESC, path LIMIT 20""",
)
def x107(spark: SparkSession, sf: str) -> DataFrame:
    from pyspark.sql import Window

    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    paths = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("e2"),
        F.lead("event_type", 2).over(w).alias("e3"),
    ).filter(F.col("e2").isNotNull() & F.col("e3").isNotNull())
    return (
        paths.select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("path")
        )
        .groupBy("path")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("path"))
        .limit(20)
    )


# x108 — KS drift between English and non-English doc-length
# distributions: exact two-sample Kolmogorov–Smirnov over the value
# domain (|distinct n_chars| ≪ corpus).
@register(
    "x108_ks_length_drift",
    """WITH c AS (SELECT n_chars AS v,
                         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS a,
                         SUM(CASE WHEN lang <> 'en' THEN 1 ELSE 0 END) AS b
                  FROM documents GROUP BY n_chars),
        t AS (SELECT SUM(a) AS na, SUM(b) AS nb FROM c),
        cum AS (SELECT SUM(a) OVER (ORDER BY v) * 1.0 / na AS fa,
                       SUM(b) OVER (ORDER BY v) * 1.0 / nb AS fb
                FROM c, t),
        k AS (SELECT MAX(ABS(fa - fb)) AS ks FROM cum)
       SELECT ROUND(ks, 6) AS ks_stat,
              CAST(t.na AS BIGINT) AS n_a, CAST(t.nb AS BIGINT) AS n_b
       FROM k, t""",
)
def x108(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators.relational import ks_statistic

    docs = load_table(spark, sf, "documents").select("n_chars", "lang")
    return ks_statistic(docs, "n_chars", F.col("lang") == "en")


# x109 — chi-square independence of language × source: did the crawl's
# language mix shift per source?  Exact over every contingency cell,
# including zero-observation cells.
@register(
    "x109_chisq_lang_source",
    """WITH o AS (SELECT lang, source, COUNT(*) AS c
                  FROM documents GROUP BY lang, source),
        ra AS (SELECT lang, SUM(c) AS r FROM o GROUP BY lang),
        cb AS (SELECT source, SUM(c) AS s FROM o GROUP BY source),
        n AS (SELECT SUM(c) AS n FROM o),
        cells AS (SELECT ra.r * cb.s * 1.0 / n.n AS e, COALESCE(o.c, 0) AS c
                  FROM ra CROSS JOIN cb CROSS JOIN n
                  LEFT JOIN o ON o.lang = ra.lang AND o.source = cb.source)
       SELECT ROUND(SUM((c - e) * (c - e) / e), 6) AS chi2,
              CAST(COUNT(*) AS BIGINT) AS n_cells
       FROM cells""",
)
def x109(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators.relational import chisq_independence

    docs = load_table(spark, sf, "documents").select("lang", "source")
    return chisq_independence(docs, "lang", "source")
