"""Extension queries, round 4 fourth batch (x122..x126): the five classic
decision-support shapes still unexercised — forecast revenue change (Q6),
product-type profit by nation and year (Q9), important-part value
concentration with a scalar-subquery HAVING (Q11), supplier-relationship
counting with an exclusion anti-join and COUNT(DISTINCT) (Q16), and the
nested semi-join promotion screen (Q20).

The testdata has no ``partsupp`` table, so the Q9/Q11/Q16/Q20 adaptations
source cost from ``p_retailprice`` and supply facts from ``lineitem``;
each keeps the plan shape that makes the original query interesting
(scan-only agg, multi-dim star with year extraction, scalar-threshold
HAVING, exclusion NOT-IN, nested IN chains).

Oracle discipline unchanged: engine-portable DuckDB SQL sharing every
literal and alias with the Spark side, deterministic tie-breaks, money
sums rounded to 2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# x122 — forecast revenue change (TPC-H Q6 shape): what revenue would be
# lost by eliminating small discounts on small orders in one year.  The
# entire predicate set (shipdate range, discount band, quantity cap) pushes
# into the parquet scan; the plan is scan → single partial+final agg, the
# cheapest possible shape and the canonical pushdown test.
@register(
    "x122_forecast_revenue",
    """SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
              CAST(COUNT(*) AS BIGINT) AS n_lines
       FROM lineitem
       WHERE l_shipdate >= TIMESTAMP '1996-01-01'
         AND l_shipdate < TIMESTAMP '1997-01-01'
         AND l_discount BETWEEN 0.05 AND 0.07
         AND l_quantity < 24""",
)
def x122(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_shipdate", "l_discount", "l_quantity", "l_extendedprice"
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            ),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# x123 — product profit by nation and year (TPC-H Q9 shape, retailprice
# cost proxy): every dimension (part, supplier, nation) broadcasts; the
# fact flows through ONE shuffle, on the (nation, year) agg keys.  Profit
# uses p_retailprice at a 60% cost ratio in place of ps_supplycost.
@register(
    "x123_product_profit",
    """SELECT n.n_name AS nation,
              CAST(EXTRACT(year FROM o.o_orderdate) AS INTEGER) AS o_year,
              ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)
                        - 0.6 * p.p_retailprice * l.l_quantity), 2) AS profit
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       JOIN supplier s ON l.l_suppkey = s.s_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN orders o ON l.l_orderkey = o.o_orderkey
       WHERE p.p_name LIKE '%widget%'
       GROUP BY nation, o_year
       ORDER BY nation, o_year""",
)
def x123(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_extendedprice", "l_discount",
        "l_quantity",
    )
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("%widget%"))
        .select("p_partkey", "p_retailprice")
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    o = load_table(spark, sf, "orders").select("o_orderkey", "o_orderdate")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").alias("o_year"),
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                    - 0.6 * F.col("p_retailprice") * F.col("l_quantity")
                ),
                2,
            ).alias("profit")
        )
        .orderBy("nation", "o_year")
    )


# --------------------------------------------------------------------------
# x124 — important-part value concentration (TPC-H Q11 shape): parts whose
# shipped revenue exceeds a fixed fraction of TOTAL shipped revenue.  The
# threshold is a 1-row scalar frame cross-joined (broadcast) into the
# per-part agg — the HAVING-against-scalar-subquery pattern — and both
# sides derive from the SAME per-part agg, so the fact is scanned once.
@register(
    "x124_important_parts",
    """WITH v AS (SELECT l_partkey,
                         SUM(l_extendedprice * (1 - l_discount)) AS value
                  FROM lineitem GROUP BY l_partkey),
        t AS (SELECT SUM(value) AS total FROM v)
       SELECT v.l_partkey, ROUND(v.value, 2) AS value
       FROM v CROSS JOIN t
       WHERE v.value > 0.005 * t.total
       ORDER BY value DESC, v.l_partkey""",
)
def x124(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount"
    )
    v = li.groupBy("l_partkey").agg(
        F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value")
    )
    total = v.agg(F.sum("value").alias("total"))
    return (
        v.crossJoin(F.broadcast(total))
        .filter(F.col("value") > 0.005 * F.col("total"))
        .select("l_partkey", F.round("value", 2).alias("value"))
        .orderBy(F.col("value").desc(), "l_partkey")
    )


# --------------------------------------------------------------------------
# x125 — supplier-relationship counting (TPC-H Q16 shape): how many
# DISTINCT suppliers ship each (brand, type, size) part family, excluding
# suppliers on a complaint list (negative account balance stands in for
# the '%Customer%Complaints%' scan).  The exclusion is a broadcast LEFT
# ANTI (the NOT IN); the distinct count is a two-level agg — the
# (family, supplier) distinct collapses map-side before the family count,
# so no Expand and no fact-sized exchange of duplicates.
@register(
    "x125_supplier_relationship",
    """WITH bad AS (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
       SELECT p.p_brand, p.p_type, p.p_size,
              CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
       FROM lineitem l
       JOIN part p ON l.l_partkey = p.p_partkey
       WHERE p.p_size IN (1, 2, 3, 4, 5)
         AND p.p_brand <> 'Brand#13'
         AND l.l_suppkey NOT IN (SELECT s_suppkey FROM bad)
       GROUP BY p.p_brand, p.p_type, p.p_size
       ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size""",
)
def x125(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_partkey", "l_suppkey")
    p = (
        load_table(spark, sf, "part")
        .filter(F.col("p_size").isin(1, 2, 3, 4, 5) & (F.col("p_brand") != "Brand#13"))
        .select("p_partkey", "p_brand", "p_type", "p_size")
    )
    bad = (
        load_table(spark, sf, "supplier")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    fam_supp = (
        li.join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .select("p_brand", "p_type", "p_size", "l_suppkey")
        .distinct()
    )
    return (
        fam_supp.groupBy("p_brand", "p_type", "p_size")
        .agg(F.count(F.lit(1)).alias("supplier_cnt"))
        .orderBy(F.col("supplier_cnt").desc(), "p_brand", "p_type", "p_size")
    )


# --------------------------------------------------------------------------
# x126 — promotion-candidate suppliers (TPC-H Q20 shape): suppliers who
# shipped a meaningful volume of a promoted part family in one year.  The
# nested IN chain (parts by name → qualifying lineitem volume → supplier
# keys) decorrelates into a broadcast part prune, one co-keyed volume agg,
# and a LEFT SEMI into the supplier dim — no correlated re-scan.
@register(
    "x126_promotion_suppliers",
    """WITH pp AS (SELECT p_partkey FROM part WHERE p_name LIKE 'blue%'),
        vol AS (SELECT l_suppkey, SUM(l_quantity) AS qty
                FROM lineitem
                WHERE l_partkey IN (SELECT p_partkey FROM pp)
                  AND l_shipdate >= TIMESTAMP '1997-01-01'
                  AND l_shipdate < TIMESTAMP '1998-01-01'
                GROUP BY l_suppkey
                HAVING SUM(l_quantity) > 50)
       SELECT s.s_name, n.n_name, ROUND(v.qty, 2) AS qty
       FROM supplier s
       JOIN vol v ON s.s_suppkey = v.l_suppkey
       JOIN nation n ON s.s_nationkey = n.n_nationkey
       ORDER BY s.s_name""",
)
def x126(spark: SparkSession, sf: str) -> DataFrame:
    pp = (
        load_table(spark, sf, "part")
        .filter(F.col("p_name").like("blue%"))
        .select("p_partkey")
    )
    li = load_table(spark, sf, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    s = load_table(spark, sf, "supplier").select("s_suppkey", "s_name", "s_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    vol = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(F.broadcast(pp), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
    )
    return (
        s.join(vol, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name", F.round("qty", 2).alias("qty"))
        .orderBy("s_name")
    )
