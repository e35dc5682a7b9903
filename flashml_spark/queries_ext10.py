"""Extension queries, round 4 fifth batch (x127..x130): window/reshape
capabilities the registry had not exercised — time-RANGE window
frames (irregular streams where "last N rows" ≠ "last N minutes"),
last-observation-carried-forward gap filling (ignore-nulls frames), and
UNPIVOT/melt (wide metrics → long form for generic downstream tooling),
and trailing-window DISTINCT counts via island merge + boundary deltas.

Oracle discipline unchanged: portable SQL, shared literals/aliases,
deterministic tie-breaks, floats rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import events
from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table

_TOK2 = "string_split_regex(lower(trim(text)), '\\s+')"


# --------------------------------------------------------------------------
# x127 — trailing 10-minute average event value per user: a RANGE frame
# over epoch seconds, not a ROWS frame — on an irregular event stream the
# two differ whenever bursts land inside the window.
@register(
    "x127_range_frame_avg",
    """SELECT event_id,
              ROUND(AVG(value) OVER (
                  PARTITION BY user_id
                  ORDER BY CAST(epoch(ts) AS BIGINT)
                  RANGE BETWEEN 600 PRECEDING AND CURRENT ROW), 6) AS range_avg
       FROM events""",
)
def x127(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts", "value")
    out = events.time_range_moving_avg(
        ev, "user_id", "ts", "value", window_seconds=600
    )
    return out.select("event_id", F.round("range_avg", 6).alias("range_avg"))


# --------------------------------------------------------------------------
# x128 — LOCF gap filling: measurements below a noise floor are treated
# as missing and take the user's most recent valid reading.  The NULL
# injection is part of the query so both engines fill the same gaps.
@register(
    "x128_locf_fill",
    """WITH g AS (SELECT event_id, user_id, ts,
                         CASE WHEN value >= 10.0 THEN value END AS v
                  FROM events)
       SELECT event_id,
              ROUND(LAST_VALUE(v IGNORE NULLS) OVER (
                  PARTITION BY user_id
                  ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6)
                  AS filled
       FROM g""",
)
def x128(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("event_id", "user_id", "ts", "value")
    gapped = ev.withColumn(
        "v", F.when(F.col("value") >= 10.0, F.col("value"))
    )
    out = events.locf_fill(gapped, "user_id", "ts", "v", id_col="event_id")
    return out.select("event_id", F.round("filled", 6).alias("filled"))


# --------------------------------------------------------------------------
# x129 — unpivot/melt: per-nation order metrics in wide form rotated to
# (nation, metric, value) long form — the reshape every generic metrics
# sink expects.  Spark side uses the native unpivot (Expand: one pass,
# no union-of-scans); the oracle spells it as UNION ALL, the portable
# equivalent.
@register(
    "x129_unpivot_metrics",
    """WITH w AS (SELECT n.n_name,
                         COUNT(*) * 1.0 AS n_orders,
                         ROUND(SUM(o.o_totalprice), 2) AS revenue,
                         ROUND(AVG(o.o_totalprice), 6) AS avg_price
                  FROM orders o
                  JOIN customer c ON o.o_custkey = c.c_custkey
                  JOIN nation n ON c.c_nationkey = n.n_nationkey
                  GROUP BY n.n_name)
       SELECT n_name, 'n_orders' AS metric, n_orders AS value FROM w
       UNION ALL
       SELECT n_name, 'revenue' AS metric, revenue AS value FROM w
       UNION ALL
       SELECT n_name, 'avg_price' AS metric, avg_price AS value FROM w""",
)
def x129(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").select("o_custkey", "o_totalprice")
    c = load_table(spark, sf, "customer").select("c_custkey", "c_nationkey")
    n = load_table(spark, sf, "nation").select("n_nationkey", "n_name")
    wide = (
        o.join(c, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            (F.count(F.lit(1)) * 1.0).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.round(F.avg("o_totalprice"), 6).alias("avg_price"),
        )
    )
    return wide.unpivot(
        ids=["n_name"],
        values=["n_orders", "revenue", "avg_price"],
        variableColumnName="metric",
        valueColumnName="value",
    )


# --------------------------------------------------------------------------
# x130 — trailing 7-day distinct users per day (rolling reach).  Spark
# windows can't COUNT(DISTINCT) over a moving frame and the day×user
# range join multiplies the fact by the window width; the engine merges
# per-user coverage islands and cumulative-sums ±1 boundary deltas over
# the |days| domain instead (operator docstring).  The oracle pays the
# range join — DuckDB can afford it at oracle scale.
@register(
    "x130_trailing_distinct_users",
    """WITH d AS (SELECT DISTINCT user_id,
                         CAST(date_trunc('day', ts) AS DATE) AS day
                  FROM events),
        span AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM d),
        days AS (SELECT CAST(unnest(generate_series(lo, hi,
                                                    INTERVAL 1 DAY)) AS DATE)
                            AS day
                 FROM span)
       SELECT CAST(days.day AS VARCHAR) AS day,
              CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS active_users
       FROM days LEFT JOIN d
         ON d.day BETWEEN days.day - 6 AND days.day
       GROUP BY days.day""",
)
def x130(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    return events.trailing_distinct_users(ev, "user_id", "ts", window_days=7)


# --------------------------------------------------------------------------
# x131 — event-type centrality: PageRank over the co-occurrence graph
# (types sharing a user are linked).  Three fixed power iterations so the
# oracle is an unrolled-CTE twin; the engine loop is |edges|-join +
# |nodes|-agg per round (graph.py docstring).
_PR_ITER = """SELECT nodes.node,
                     (1 - 0.85) / n.n
                     + 0.85 * COALESCE(SUM({prev}.r / deg.d), 0) AS r
              FROM nodes CROSS JOIN n
              LEFT JOIN edges ON edges.dst = nodes.node
              LEFT JOIN {prev} ON {prev}.node = edges.src
              LEFT JOIN deg ON deg.src = edges.src
              GROUP BY nodes.node, n.n"""


@register(
    "x131_event_pagerank",
    f"""WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        p AS (SELECT a.event_type AS ta, b.event_type AS tb
              FROM ut a JOIN ut b ON a.user_id = b.user_id
                                 AND a.event_type < b.event_type
              GROUP BY 1, 2),
        edges AS (SELECT ta AS src, tb AS dst FROM p
                  UNION ALL SELECT tb, ta FROM p),
        nodes AS (SELECT DISTINCT src AS node FROM edges),
        deg AS (SELECT src, COUNT(*) AS d FROM edges GROUP BY src),
        n AS (SELECT COUNT(*) AS n FROM nodes),
        r0 AS (SELECT node, 1.0 / n.n AS r FROM nodes CROSS JOIN n),
        r1 AS ({_PR_ITER.format(prev="r0")}),
        r2 AS ({_PR_ITER.format(prev="r1")}),
        r3 AS ({_PR_ITER.format(prev="r2")})
       SELECT node, ROUND(r, 6) AS rank FROM r3""",
)
def x131(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators.graph import pagerank

    ev = load_table(spark, sf, "events").select("user_id", "event_type")
    ut = ev.distinct()
    a = ut.select(F.col("user_id").alias("u"), F.col("event_type").alias("ta"))
    b = ut.select(F.col("user_id").alias("u"), F.col("event_type").alias("tb"))
    p = (
        a.join(b, "u")
        .filter(F.col("ta") < F.col("tb"))
        .select("ta", "tb")
        .distinct()
    )
    edges = p.select(F.col("ta").alias("src"), F.col("tb").alias("dst")).unionAll(
        p.select(F.col("tb").alias("src"), F.col("ta").alias("dst"))
    )
    out = pagerank(edges, iterations=3, damping=0.85)
    return out.select("node", F.round("rank", 6).alias("rank"))


# --------------------------------------------------------------------------
# x132 — EXACT shingle-Jaccard near-dup pairs via prefix filtering:
# unlike x05's df-capped join (which changes the result), the prefix
# scheme prunes provably losslessly, so the oracle is the plain exact
# all-pairs SQL with no cap.  Bigram shingles give the unit space that
# makes 0.6 a meaningful near-dup bar on this corpus; DuckDB pays the
# full shingle join at oracle scale, the engine joins only rare-shingle
# prefixes.
@register(
    "x132_prefix_jaccard",
    """WITH tok AS (SELECT doc_id, {tok} AS ts FROM documents),
        sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] AS s
               FROM tok, LATERAL (SELECT unnest(range(1, len(ts))) AS i) r),
        sizes AS (SELECT doc_id, COUNT(*) AS n_tok FROM sh GROUP BY doc_id),
        common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
                   FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
       SELECT id_a, id_b,
              ROUND(c * 1.0 / (sa.n_tok + sb.n_tok - c), 6) AS jaccard
       FROM common
       JOIN sizes sa ON common.id_a = sa.doc_id
       JOIN sizes sb ON common.id_b = sb.doc_id
       WHERE ROUND(c * 1.0 / (sa.n_tok + sb.n_tok - c), 6) >= 0.6""".format(
        tok=_TOK2
    ),
)
def x132(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    docs = load_table(spark, sf, "documents")
    return dedup.prefix_filter_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.6, shingle_n=2
    )


# --------------------------------------------------------------------------
# x133 — robust length-outlier audit: per-language median and MAD (both
# exact interpolated quantiles), and how many documents sit beyond
# 3 scaled MADs — the robust alternative to z-scores when the length
# distribution has heavy tails.
@register(
    "x133_mad_outliers",
    """WITH med AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med
                    FROM documents GROUP BY lang),
        dev AS (SELECT d.lang, d.n_chars, med.med,
                       ABS(d.n_chars - med.med) AS adev
                FROM documents d JOIN med ON d.lang = med.lang),
        mad AS (SELECT lang, quantile_cont(adev, 0.5) AS mad
                FROM dev GROUP BY lang)
       SELECT dev.lang,
              ROUND(dev.med, 6) AS med,
              ROUND(mad.mad, 6) AS mad,
              CAST(COUNT(*) AS BIGINT) AS n_docs,
              CAST(SUM(CASE WHEN mad.mad > 0
                             AND dev.adev > 3 * 1.4826 * mad.mad
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
       FROM dev JOIN mad ON dev.lang = mad.lang
       GROUP BY dev.lang, dev.med, mad.mad""",
)
def x133(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("lang", "n_chars")
    med = docs.groupBy("lang").agg(
        F.expr("percentile(n_chars, 0.5)").alias("med")
    )
    dev = docs.join(F.broadcast(med), "lang").withColumn(
        "adev", F.abs(F.col("n_chars") - F.col("med"))
    )
    mad = dev.groupBy("lang").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "lang")
        .groupBy("lang", F.round("med", 6).alias("med"), F.round("mad", 6).alias("mad"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    (F.col("mad") > 0)
                    & (F.col("adev") > 3 * 1.4826 * F.col("mad")),
                    1,
                ).otherwise(0)
            ).alias("n_outliers"),
        )
    )


# --------------------------------------------------------------------------
# x134 — fuzzy title match: document pairs whose lowercased 40-char
# prefixes are within 3 edits.  The engine prunes losslessly by the
# length bound (ed ≥ length difference → band join); the oracle pays the
# full cross join, affordable at oracle scale.
@register(
    "x134_edit_distance_pairs",
    """WITH p AS (SELECT doc_id, lower(substr(text, 1, 40)) AS pf
                  FROM documents)
       SELECT a.doc_id AS id_a, b.doc_id AS id_b,
              CAST(levenshtein(a.pf, b.pf) AS INTEGER) AS edits
       FROM p a JOIN p b ON a.doc_id < b.doc_id
       WHERE levenshtein(a.pf, b.pf) <= 3""",
)
def x134(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    docs = load_table(spark, sf, "documents")
    out = dedup.edit_distance_pairs(docs, "text", "doc_id", max_edits=3,
                                    prefix_chars=40)
    return out.select("id_a", "id_b", F.col("edits").cast("int").alias("edits"))
