"""Extension queries, round 4 third batch (x110..x121): the last classic
decision-support shapes the engine had not exercised — returned-item
customer ranking (Q10), period top-supplier with scalar-max semantics
(Q15), disjunctive multi-clause join pricing (Q19), sole-late-supplier
blame attribution (Q21), and regional market share over time (Q8) — plus
six statistical corpus/traffic audits a training-data pipeline runs
continuously: Zipf-law slope, document-frequency stopword candidates,
prefix-duplicate detection, inter-arrival burstiness, event co-occurrence
lift, daily volume outliers, and revenue-concentration Gini.

Oracle discipline unchanged: engine-portable DuckDB SQL sharing every
literal and alias with the Spark side, deterministic tie-breaks, money
sums rounded to 2, unit-scale values to 6, timestamp arithmetic in exact
integer microseconds where gaps are compared.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import events, relational, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# x110 — returned-item customer ranking (TPC-H Q10 shape): revenue lost to
# returns per customer, with nation detail, top 20.  The lineitem-side agg
# collapses to |customers| BEFORE the dimension joins (both broadcastable);
# the top-k is a TakeOrderedAndProject on the rounded key.
@register(
    "x110_returned_revenue",
    """WITH rev AS (SELECT o_custkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
                    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                    WHERE l_returnflag = 'R'
                    GROUP BY o_custkey)
       SELECT c.c_custkey, c.c_name, n.n_name, rev.revenue
       FROM rev
       JOIN customer c ON rev.o_custkey = c.c_custkey
       JOIN nation n ON c.c_nationkey = n.n_nationkey
       ORDER BY rev.revenue DESC, c.c_custkey LIMIT 20""",
)
def x110(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_custkey")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_name", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = (
        li.filter(F.col("l_returnflag") == "R")
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_custkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        rev.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", "revenue")
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


# x111 — period top supplier (TPC-H Q15 shape): highest revenue supplier
# in 1996Q1.  The scalar-max subquery decorrelates into a TakeOrdered
# top-1 on the rounded revenue with a suppkey tie-break — no second scan,
# no self-join against a MAX().
@register(
    "x111_top_supplier",
    """WITH r AS (SELECT l_suppkey,
                         ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS total_rev
                  FROM lineitem
                  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                    AND l_shipdate < TIMESTAMP '1996-04-01'
                  GROUP BY l_suppkey)
       SELECT s.s_suppkey, s.s_name, r.total_rev
       FROM r JOIN supplier s ON r.l_suppkey = s.s_suppkey
       ORDER BY r.total_rev DESC, s.s_suppkey LIMIT 1""",
)
def x111(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("total_rev")
        )
    )
    return (
        rev.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_rev")
        .orderBy(F.desc("total_rev"), F.asc("s_suppkey"))
        .limit(1)
    )


# x112 — disjunctive pricing (TPC-H Q19 shape): three OR'd brand/size/
# quantity clauses across the join.  Catalyst splits the common
# ``p_partkey`` equi-key out of the disjunction (the join stays hash, not
# nested-loop) and pushes the brand/size disjunction to the part scan.
@register(
    "x112_disjunctive_pricing",
    """SELECT ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_lines
       FROM lineitem JOIN part ON l_partkey = p_partkey
       WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
              AND l_quantity BETWEEN 1 AND 20)
          OR (p_brand = 'Brand#23' AND p_size BETWEEN 10 AND 30
              AND l_quantity BETWEEN 10 AND 30)
          OR (p_brand = 'Brand#34' AND p_size BETWEEN 20 AND 50
              AND l_quantity BETWEEN 20 AND 40)""",
)
def x112(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load_table(spark, sf, "part").select("p_partkey", "p_brand", "p_size")
    clause = (
        (
            (F.col("p_brand") == "Brand#12")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#23")
            & F.col("p_size").between(10, 30)
            & F.col("l_quantity").between(10, 30)
        )
        | (
            (F.col("p_brand") == "Brand#34")
            & F.col("p_size").between(20, 50)
            & F.col("l_quantity").between(20, 40)
        )
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .filter(clause)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.count(F.lit(1)).cast("bigint").alias("n_lines"),
        )
    )


# x113 — sole-late-supplier attribution (TPC-H Q21 semantics): on
# multi-supplier orders where EXACTLY ONE supplier shipped late
# (> 60 days after the order date), blame that supplier.  The
# exists/not-exists pair decorrelates into one per-order conditional
# aggregation — no correlated re-scans, one shuffle on the order key.
@register(
    "x113_sole_late_supplier",
    """WITH po AS (SELECT l_orderkey,
                          COUNT(DISTINCT l_suppkey) AS ns,
                          COUNT(DISTINCT CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                              THEN l_suppkey END) AS nl,
                          MAX(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                                   THEN l_suppkey END) AS late_supp
                   FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                   GROUP BY l_orderkey)
       SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
       FROM po JOIN supplier s ON po.late_supp = s.s_suppkey
       WHERE po.ns > 1 AND po.nl = 1
       GROUP BY s.s_name
       ORDER BY numwait DESC, s.s_name LIMIT 10""",
)
def x113(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    # Two-level aggregation instead of dual COUNT(DISTINCT …): collapsing
    # to (order, supplier) first makes both distinct counts plain
    # count/sum on the second agg — no Expand of the fact — and the
    # second groupBy's key is a prefix of the first's, so it rides the
    # same exchange (partial agg, zero extra shuffle).
    per_pair = (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max(late.cast("int")).alias("late"))
    )
    per_order = per_pair.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("ns"),
        F.sum("late").alias("nl"),
        F.max(F.when(F.col("late") == 1, F.col("l_suppkey"))).alias("late_supp"),
    )
    return (
        per_order.filter((F.col("ns") > 1) & (F.col("nl") == 1))
        .join(F.broadcast(s), F.col("late_supp") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("numwait"))
        .orderBy(F.desc("numwait"), F.asc("s_name"))
        .limit(10)
    )


# x114 — regional market share over time (TPC-H Q8 shape): NATION_2's
# share of supplier revenue within ASIA, by order year.  Four dimension
# joins — every one broadcast — around a single lineitem pass; the share
# is a conditional-sum ratio inside one hash agg keyed by year.
@register(
    "x114_market_share",
    """WITH rev AS (SELECT EXTRACT(year FROM o.o_orderdate) AS yr,
                           n.n_name AS supp_nation,
                           l.l_extendedprice * (1 - l.l_discount) AS vol
                    FROM lineitem l
                    JOIN orders o ON l.l_orderkey = o.o_orderkey
                    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                    JOIN nation n ON s.s_nationkey = n.n_nationkey
                    JOIN region r ON n.n_regionkey = r.r_regionkey
                    WHERE r.r_name = 'ASIA')
       SELECT CAST(yr AS BIGINT) AS yr,
              ROUND(SUM(CASE WHEN supp_nation = 'NATION_2' THEN vol ELSE 0 END)
                    / SUM(vol), 6) AS mkt_share
       FROM rev GROUP BY yr""",
)
def x114(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    r = load_table(spark, sf, "region").select("r_regionkey", "r_name")
    asia_n = n.join(
        F.broadcast(r.filter(F.col("r_name") == "ASIA")),
        F.col("n_regionkey") == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    target = F.when(F.col("n_name") == "NATION_2", vol).otherwise(F.lit(0.0))
    return (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(asia_n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.year("o_orderdate").cast("bigint").alias("yr"))
        .agg(F.round(F.sum(target) / F.sum(vol), 6).alias("mkt_share"))
    )


# --------------------------------------------------------------------------
# x115 — Zipf-law slope of the token-frequency head: the "is this still
# natural language?" corpus audit.
@register(
    "x115_zipf_slope",
    f"""WITH tok AS (SELECT unnest({_TOK}) AS token FROM documents),
        c AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token),
        r AS (SELECT n, token FROM c ORDER BY n DESC, token LIMIT 500),
        rr AS (SELECT ln(CAST(n AS DOUBLE)) AS ln_n,
                      ln(CAST(row_number() OVER (ORDER BY n DESC, token)
                              AS DOUBLE)) AS ln_r
               FROM r)
       SELECT ROUND(regr_slope(ln_n, ln_r), 6) AS slope,
              ROUND(regr_intercept(ln_n, ln_r), 6) AS intercept,
              CAST(COUNT(*) AS BIGINT) AS n_ranks
       FROM rr""",
)
def x115(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("text")
    return textops.zipf_slope(docs, "text", top_n=500)


# x116 — inter-arrival burstiness per event type (Goh-Barabasi index):
# gaps within each (user, type) stream, exact integer-microsecond diffs.
@register(
    "x116_interarrival_stats",
    """WITH g AS (SELECT event_type,
                         (epoch_us(ts) - lag(epoch_us(ts))
                             OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts, event_id)) / 1e6 AS gap_s
                  FROM events)
       SELECT event_type, CAST(COUNT(gap_s) AS BIGINT) AS n_gaps,
              ROUND(AVG(gap_s), 6) AS mean_gap_s,
              ROUND(STDDEV_SAMP(gap_s), 6) AS sd_gap_s,
              ROUND((STDDEV_SAMP(gap_s) - AVG(gap_s))
                    / (STDDEV_SAMP(gap_s) + AVG(gap_s)), 6) AS burstiness
       FROM g WHERE gap_s IS NOT NULL GROUP BY event_type""",
)
def x116(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "event_type", "user_id", "ts", "event_id"
    )
    return events.interarrival_stats(ev)


# x117 — revenue-concentration Gini per nation: how winner-take-all is
# each nation's customer revenue?  Zero-order customers count (LEFT join).
@register(
    "x117_revenue_gini",
    """WITH rev AS (SELECT c.c_custkey, c.c_nationkey,
                           COALESCE(SUM(o.o_totalprice), 0) AS r
                    FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                    GROUP BY c.c_custkey, c.c_nationkey),
        ranked AS (SELECT n.n_name, rev.r,
                          row_number() OVER (PARTITION BY n.n_name
                                             ORDER BY rev.r, rev.c_custkey) AS i
                   FROM rev JOIN nation n ON rev.c_nationkey = n.n_nationkey),
        g AS (SELECT n_name, COUNT(*) AS n, SUM(r) AS total, SUM(i * r) AS sir
              FROM ranked GROUP BY n_name)
       SELECT n_name, CAST(n AS BIGINT) AS n, ROUND(total, 2) AS total,
              ROUND(CASE WHEN total > 0
                         THEN 2.0 * sir / (n * total) - (n + 1.0) / n END,
                    6) AS gini
       FROM g""",
)
def x117(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    o = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    rev = (
        c.join(o, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_nationkey")
        .agg(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)).alias("r"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return relational.gini_coefficient(rev, ["n_name"], "r", "c_custkey")


# x118 — event-type co-occurrence lift across the user population.
@register(
    "x118_event_lift",
    """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        j AS (SELECT a.event_type AS type_a, b.event_type AS type_b,
                     COUNT(*) AS n_joint
              FROM ut a JOIN ut b ON a.user_id = b.user_id
                                 AND a.event_type < b.event_type
              GROUP BY 1, 2),
        s AS (SELECT event_type, COUNT(*) AS n FROM ut GROUP BY event_type),
        nu AS (SELECT COUNT(DISTINCT user_id) AS nu FROM ut)
       SELECT j.type_a, j.type_b, CAST(j.n_joint AS BIGINT) AS n_joint,
              ROUND(j.n_joint * nu.nu * 1.0 / (sa.n * sb.n), 6) AS lift
       FROM j
       JOIN s sa ON j.type_a = sa.event_type
       JOIN s sb ON j.type_b = sb.event_type
       CROSS JOIN nu""",
)
def x118(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "event_type")
    return events.cooccurrence_lift(ev)


# x119 — daily volume outliers: each day's event count z-scored against
# the trailing 7 observed days (current day excluded).
@register(
    "x119_daily_outliers",
    """WITH d AS (SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
                         COUNT(*) AS n
                  FROM events GROUP BY day),
        wd AS (SELECT day, n,
                      AVG(n) OVER w AS mu,
                      STDDEV_SAMP(n) OVER w AS sd,
                      COUNT(n) OVER w AS cnt
               FROM d
               WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING))
       SELECT CAST(day AS VARCHAR) AS day, CAST(n AS BIGINT) AS n,
              ROUND(CASE WHEN cnt = 7 THEN mu END, 6) AS trail_mean,
              ROUND(CASE WHEN cnt = 7 THEN sd END, 6) AS trail_sd,
              ROUND(CASE WHEN cnt = 7 AND sd > 0 THEN (n - mu) / sd END, 6) AS z,
              CASE WHEN cnt = 7 AND sd > 0 THEN ABS((n - mu) / sd) > 2.0 END
                  AS is_outlier
       FROM wd""",
)
def x119(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("ts")
    return events.daily_outlier_zscores(ev, trailing_days=7, z_threshold=2.0)


# x120 — document-frequency head with smoothed IDF: data-driven stopword
# candidates for a new corpus.
@register(
    "x120_doc_freq_stopwords",
    f"""WITH p AS (SELECT DISTINCT doc_id, unnest({_TOK}) AS token
                   FROM documents),
        nd AS (SELECT COUNT(DISTINCT doc_id) AS n FROM documents),
        c AS (SELECT token, COUNT(*) AS df FROM p GROUP BY token)
       SELECT token, CAST(df AS BIGINT) AS df,
              ROUND(ln(nd.n / (1.0 + df)), 6) AS idf
       FROM c CROSS JOIN nd
       ORDER BY df DESC, token LIMIT 20""",
)
def x120(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.doc_frequency_top(docs, "text", "doc_id", k=20)


# x121 — prefix-duplicate audit: documents sharing their first 120
# lowercased characters (mirror pages / templated intros).
@register(
    "x121_prefix_dup_stats",
    """WITH h AS (SELECT md5(lower(substr(text, 1, 120))) AS h
                  FROM documents WHERE text IS NOT NULL),
        g AS (SELECT h, COUNT(*) AS c FROM h GROUP BY h HAVING COUNT(*) > 1)
       SELECT CAST(COUNT(*) AS BIGINT) AS dup_groups,
              CAST(COALESCE(SUM(c), 0) AS BIGINT) AS dup_docs,
              CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS surplus_docs,
              CAST(COALESCE(MAX(c), 0) AS BIGINT) AS max_group
       FROM g""",
)
def x121(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("text")
    return textops.prefix_dup_stats(docs, "text", prefix_len=120)
