"""Declared oracle-query registry (SURVEY §2.12).

Each entry pairs a Spark implementation — routed through the engine's
operator modules, not ad-hoc SQL — with the ANSI-SQL oracle string DuckDB
runs on the same parquet tables.  Column names/aliases are kept identical
on both sides (the driver's compare sorts columns by name before hashing).

Registry shape:
    QUERIES[name] = (spark_fn(spark, sf_dir) -> DataFrame, oracle_sql | None)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from flashml_spark.functions.stability import psi_from_bucket_counts
from flashml_spark.functions.windows import global_cumsum
from flashml_spark.operators import binning, relational, sampling
from flashml_spark.sources.readers import load_table, run_sql_view_chain

QUERIES: dict[str, tuple[Callable[[SparkSession, str], DataFrame], str | None]] = {}


def register(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = (fn, oracle)
        return fn

    return deco


# --------------------------------------------------------------------------
# Q01 — input filter + column pruning (DataReader.scala:128-140)
@register(
    "q01_filter_project",
    """SELECT l_orderkey, l_partkey, l_quantity FROM lineitem
       WHERE l_quantity IS NOT NULL AND l_discount > 0.02""",
)
def q01(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    li = relational.input_filter(li, "l_quantity IS NOT NULL AND l_discount > 0.02")
    return relational.prune_columns(li, ["l_orderkey", "l_partkey", "l_quantity"])


# Q02 — SQL view chain (DataReader.scala:105-120)
@register(
    "q02_sql_view_chain",
    """WITH t1 AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 1000),
            t2 AS (SELECT o_custkey, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
                   FROM t1 GROUP BY o_custkey)
       SELECT * FROM t2 ORDER BY o_custkey""",
)
def q02(spark: SparkSession, sf: str) -> DataFrame:
    load_table(spark, sf, "orders").createOrReplaceTempView("orders")
    return run_sql_view_chain(
        spark,
        [
            "SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 1000",
            """SELECT o_custkey, COUNT(*) AS cnt, ROUND(SUM(o_totalprice), 2) AS total
               FROM flashml_view_0 GROUP BY o_custkey""",
        ],
    )


# Q03 — window lead / time-on-page (DataReader.scala:143-156)
@register(
    "q03_window_lead",
    """SELECT o_custkey, o_orderkey,
              LEAD(o_totalprice, 1) OVER (PARTITION BY o_custkey ORDER BY o_orderkey)
                - o_totalprice AS delta
       FROM orders ORDER BY o_custkey, o_orderkey""",
)
def q03(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    out = relational.time_on_page(
        o, ["o_custkey"], "o_orderkey", "o_totalprice", out_col="delta"
    )
    # no terminal orderBy: the driver hashes sorted rows, so a global sort
    # here would only add a range shuffle (same policy for all non-LIMIT queries)
    return out.select("o_custkey", "o_orderkey", "delta")


# Q04 — page-level split semantics (PipelineSteps.scala:316-323)
@register(
    "q04_page_bucket",
    """SELECT CASE WHEN l_linenumber < 4 THEN l_linenumber ELSE 4 END AS page,
              COUNT(*) AS n
       FROM lineitem GROUP BY 1 ORDER BY 1""",
)
def q04(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    paged = relational.page_bucket(li, "l_linenumber", 4, out_col="page")
    return paged.groupBy("page").agg(F.count(F.lit(1)).alias("n")).orderBy("page")


# Q05 — min/max agg for binning bounds (FeatureGenerationEngine.scala:284-298)
@register(
    "q05_minmax",
    "SELECT MIN(l_extendedprice) AS mn, MAX(l_extendedprice) AS mx FROM lineitem",
)
def q05(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.agg(F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx"))


# Q06 — interval binning, Bucketizer [lo,hi) semantics (FeatureGenerationEngine.scala:320-332)
@register(
    "q06_interval_binning",
    """SELECT l_orderkey, l_linenumber,
              CASE WHEN l_extendedprice < 1000 THEN 0 WHEN l_extendedprice < 10000 THEN 1
                   WHEN l_extendedprice < 50000 THEN 2 ELSE 3 END AS bucket
       FROM lineitem ORDER BY l_orderkey, l_linenumber""",
)
def q06(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    binned = binning.bin_intervals(li, "l_extendedprice", [1000.0, 10000.0, 50000.0], "bucket")
    return binned.select("l_orderkey", "l_linenumber", "bucket")


# Q07 — minority-label discovery (TrainTestSampler.scala:291-300)
@register(
    "q07_minority_labels",
    """SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem
       GROUP BY l_returnflag ORDER BY cnt, l_returnflag""",
)
def q07(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return sampling.minority_majority_labels(li, "l_returnflag")


# Q08 — class-support stabilizer (TrainTestSampler.scala:72-105)
@register(
    "q08_class_stabilizer",
    """SELECT l_orderkey, l_linenumber,
              CASE WHEN COUNT(*) OVER (PARTITION BY l_returnflag) < 100
                   THEN 'OTHER' ELSE l_returnflag END AS returnflag_stab
       FROM lineitem ORDER BY l_orderkey, l_linenumber""",
)
def q08(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    out = sampling.stabilize_classes(
        li, "l_returnflag", 100, other_label="OTHER", out_col="returnflag_stab"
    )
    return out.select("l_orderkey", "l_linenumber", "returnflag_stab")


# Q09 — union for page-level metric merge (MetricsEvaluator.scala:49-72)
@register(
    "q09_union_pages",
    """SELECT o_orderkey AS k FROM orders WHERE o_totalprice <= 5000
       UNION ALL SELECT o_orderkey FROM orders WHERE o_totalprice > 5000 ORDER BY k""",
)
def q09(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    lo = o.filter("o_totalprice <= 5000").select(F.col("o_orderkey").alias("k"))
    hi = o.filter("o_totalprice > 5000").select(F.col("o_orderkey").alias("k"))
    return relational.union_pages([lo, hi])


# Q10 — EXCEPT / anti-join for stratified test set (StratifiedTrainTestSplitter.scala:39)
@register(
    "q10_except",
    """SELECT c_custkey FROM customer
       EXCEPT SELECT o_custkey FROM orders WHERE o_totalprice > 200000 ORDER BY c_custkey""",
)
def q10(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer").select("c_custkey")
    o = load_table(spark, sf, "orders").filter("o_totalprice > 200000").select("o_custkey")
    return c.subtract(o)


# Q11 — QA join on concatenated key (Publish.scala:424-437)
@register(
    "q11_qa_join",
    """SELECT a.k, a.o_totalprice, b.c_name FROM
        (SELECT CAST(o_custkey AS VARCHAR) || '_' || CAST(o_orderkey AS VARCHAR) AS k,
                o_custkey, o_totalprice FROM orders) a
        JOIN customer b ON a.o_custkey = b.c_custkey ORDER BY a.k""",
)
def q11(spark: SparkSession, sf: str) -> DataFrame:
    o = relational.concat_key(
        load_table(spark, sf, "orders"), ["o_custkey", "o_orderkey"], out_col="k"
    )
    c = load_table(spark, sf, "customer")
    # customer is the small dimension — broadcast so the fact side never shuffles
    joined = o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
    return joined.select("k", "o_totalprice", "c_name")


# Q12 — hotlead earliest-page rollup (WebCustomMetricsEvaluator.scala:132-141)
@register(
    "q12_hotlead_rollup",
    """SELECT sub.minpage, COUNT(*) AS visitors, CAST(SUM(sub.anyflag) AS BIGINT) AS captured
       FROM (SELECT o_custkey, MIN(o_orderkey) AS minpage,
                    MAX(CASE WHEN o_totalprice > 10000 THEN 1 ELSE 0 END) AS anyflag
             FROM orders GROUP BY o_custkey) sub
       GROUP BY sub.minpage ORDER BY sub.minpage""",
)
def q12(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    per_visitor = o.groupBy("o_custkey").agg(
        F.min("o_orderkey").alias("minpage"),
        F.max(F.when(F.col("o_totalprice") > 10000, 1).otherwise(0)).alias("anyflag"),
    )
    return (
        per_visitor.groupBy("minpage")
        .agg(
            F.count(F.lit(1)).alias("visitors"),
            F.sum("anyflag").cast("bigint").alias("captured"),
        )
        .orderBy("minpage")
    )


# Q13 — distinct visitor count (WebCustomMetricsEvaluator.scala:126-131)
@register(
    "q13_distinct_visitors",
    "SELECT COUNT(DISTINCT o_custkey) AS n_visitors FROM orders",
)
def q13(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.agg(F.countDistinct("o_custkey").alias("n_visitors"))


# Q14 — PSI: whole-frame percentage + stability-index sum
#       (ModelHealthMetricsEvaluator.scala:120-135)
@register(
    "q14_psi",
    """SELECT ROUND(SUM((p_new - p_base) * LN(p_new / p_base) * 100), 6) AS psi FROM
        (SELECT bucket,
                CAST(cnt_base AS DOUBLE) / SUM(cnt_base) OVER () AS p_base,
                CAST(cnt_new  AS DOUBLE) / SUM(cnt_new)  OVER () AS p_new
         FROM (SELECT l_linenumber AS bucket,
                      SUM(CASE WHEN l_quantity <= 25 THEN 1 ELSE 0 END) AS cnt_base,
                      SUM(CASE WHEN l_quantity  > 25 THEN 1 ELSE 0 END) AS cnt_new
               FROM lineitem GROUP BY l_linenumber) t) u""",
)
def q14(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    buckets = li.groupBy(F.col("l_linenumber").alias("bucket")).agg(
        F.sum(F.when(F.col("l_quantity") <= 25, 1).otherwise(0)).alias("cnt_base"),
        F.sum(F.when(F.col("l_quantity") > 25, 1).otherwise(0)).alias("cnt_new"),
    )
    return psi_from_bucket_counts(buckets, "cnt_base", "cnt_new", out_col="psi")


# Q15 — VSI value-frequency join (ModelHealthMetricsEvaluator.scala:159-178)
@register(
    "q15_vsi_join",
    """SELECT a.l_returnflag, a.cnt AS base_cnt, b.cnt AS new_cnt FROM
        (SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem WHERE l_linenumber <= 3
         GROUP BY l_returnflag) a
        JOIN
        (SELECT l_returnflag, COUNT(*) AS cnt FROM lineitem WHERE l_linenumber > 3
         GROUP BY l_returnflag) b
        ON a.l_returnflag = b.l_returnflag ORDER BY a.l_returnflag""",
)
def q15(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    base = (
        li.filter("l_linenumber <= 3").groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("base_cnt"))
    )
    new = (
        li.filter("l_linenumber > 3")
        .groupBy("l_returnflag")
        .agg(F.count(F.lit(1)).alias("new_cnt"))
        .withColumnRenamed("l_returnflag", "r2")
    )
    # value-frequency tables are tiny (|distinct values| rows) — broadcast
    return (
        base.join(F.broadcast(new), base["l_returnflag"] == new["r2"])
        .select("l_returnflag", "base_cnt", "new_cnt")
        .orderBy("l_returnflag")
    )


# Q16 — top-1 by metric (F2 threshold selection, WebCustomMetricsEvaluator.scala:50-51)
@register(
    "q16_top1",
    """SELECT o_orderkey, o_totalprice FROM orders
       ORDER BY o_totalprice DESC, o_orderkey LIMIT 1""",
)
def q16(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    # orderBy+limit compiles to TakeOrderedAndProject — per-partition top-k
    # then a k-row driver merge; no full sort at scale.
    return o.select("o_orderkey", "o_totalprice").orderBy(
        F.desc("o_totalprice"), "o_orderkey"
    ).limit(1)


# Q17 — confusion-matrix shape (StandardMetricsEvaluator.scala:262-267)
@register(
    "q17_confusion",
    """SELECT l_returnflag AS label, l_linestatus AS pred, COUNT(*) AS n
       FROM lineitem GROUP BY 1, 2 ORDER BY 1, 2""",
)
def q17(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy(F.col("l_returnflag").alias("label"), F.col("l_linestatus").alias("pred"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy("label", "pred")
    )


# Q18 — deterministic conditional sampling (TrainTestSampler.scala:154-159)
@register(
    "q18_conditional_sample",
    "SELECT COUNT(*) AS n FROM orders WHERE MOD(o_orderkey, 100) <= 80",
)
def q18(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    (train,) = sampling.conditional_split(o, ["MOD(o_orderkey, 100) <= 80"])
    return train.agg(F.count(F.lit(1)).alias("n"))


# Q19 — cumulative threshold sweep (binary metrics by threshold)
@register(
    "q19_threshold_sweep",
    """SELECT thresh, CAST(SUM(tp_at) OVER (ORDER BY thresh DESC) AS BIGINT) AS cum_tp FROM
        (SELECT l_quantity AS thresh,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS tp_at
         FROM lineitem GROUP BY l_quantity) t ORDER BY thresh DESC""",
)
def q19(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    per_thresh = li.groupBy(F.col("l_quantity").alias("thresh")).agg(
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).cast("bigint").alias("tp_at")
    )
    # scale-safe running total: range-partitioned prefix sums, never a
    # single-partition Window.orderBy (SCALE.md no-one-task-window contract).
    # l_quantity is quantized to 1..50, so the post-agg frame is ≤ ~50 rows
    # at ANY scale factor — the caller-supplied bound takes the single-window
    # fast path; data-sized (unhinted) inputs still range-partition.
    swept = global_cumsum(
        per_thresh, "thresh", ["tp_at"], ascending=False, rows_hint=64
    )
    return swept.select(
        "thresh", F.col("cum_tp_at").cast("bigint").alias("cum_tp")
    ).orderBy(F.desc("thresh"))


# extension queries (x01..) register themselves on import — see bottom of file


# Q20 — categorical concat semantics (CategoricalColumnsTransformer.scala:31)
@register(
    "q20_categorical_concat",
    """SELECT o_orderkey, 'o_orderstatus_' || o_orderstatus AS tagged
       FROM orders ORDER BY o_orderkey""",
)
def q20(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.select(
        "o_orderkey",
        F.concat(F.lit("o_orderstatus_"), F.col("o_orderstatus")).alias("tagged"),
    )


# import for registration side-effect (extension queries x01..x26)
from flashml_spark import queries_ext  # noqa: E402,F401
from flashml_spark import queries_ext2  # noqa: E402,F401
from flashml_spark import queries_ext3  # noqa: E402,F401
from flashml_spark import queries_ext4  # noqa: E402,F401
from flashml_spark import queries_ext5  # noqa: E402,F401
from flashml_spark import queries_ext6  # noqa: E402,F401
from flashml_spark import queries_ext7  # noqa: E402,F401
from flashml_spark import queries_ext8  # noqa: E402,F401
from flashml_spark import queries_ext9  # noqa: E402,F401
from flashml_spark import queries_ext10  # noqa: E402,F401
from flashml_spark import queries_ext11  # noqa: E402,F401
from flashml_spark import queries_ext12  # noqa: E402,F401
from flashml_spark import queries_ext13  # noqa: E402,F401
from flashml_spark import queries_ext14  # noqa: E402,F401
from flashml_spark import queries_ext15  # noqa: E402,F401
from flashml_spark import queries_ext16  # noqa: E402,F401
from flashml_spark import queries_ext17  # noqa: E402,F401
from flashml_spark import queries_ext18  # noqa: E402,F401
from flashml_spark import queries_ext19  # noqa: E402,F401
from flashml_spark import queries_ext20  # noqa: E402,F401
from flashml_spark import queries_ext21  # noqa: E402,F401
