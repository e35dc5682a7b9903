"""Extension queries, round 2: temporal joins, pre-aggregated rollups,
corpus statistics, and the composite curation filter.

Same oracle discipline as ``queries_ext``: engine-portable SQL only
(DuckDB ``ASOF JOIN`` is the reference semantics for x41), aliases
identical on both sides, deterministic tie-breaks everywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import events, joins, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table

# --------------------------------------------------------------------------
# x41 — as-of join: for each purchase, the latest prior click by that user.
# Right side pre-deduped to one row per (user, ts) so the match is
# deterministic (DuckDB ASOF picks an arbitrary row among ts ties).
@register(
    "x41_asof_join",
    """WITH clicks AS (SELECT user_id, ts, MAX(event_id) AS click_id
                       FROM events WHERE event_type = 'click'
                       GROUP BY user_id, ts),
            buys AS (SELECT event_id, user_id, ts
                     FROM events WHERE event_type = 'purchase')
       SELECT b.event_id, b.user_id, b.ts, c.ts AS click_ts, c.click_id
       FROM buys b ASOF LEFT JOIN clicks c
         ON b.user_id = c.user_id AND c.ts <= b.ts""",
)
def x41(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    buys = ev.filter(F.col("event_type") == "purchase").select("event_id", "user_id", "ts")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    return joins.asof_join(
        buys,
        clicks,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols={"click_ts": "ts", "click_id": "click_id"},
        tie_col="click_id",
    )


# x42 — bounded range join: same-user event pairs within 5 minutes.
# The unordered pair appears once: strictly-later b, ties broken by id.
@register(
    "x42_range_join_pairs",
    """SELECT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
              epoch_us(b.ts) - epoch_us(a.ts) AS gap_us
       FROM events a JOIN events b ON a.user_id = b.user_id
       WHERE epoch_us(b.ts) - epoch_us(a.ts) BETWEEN 0 AND 300000000
         AND (b.ts > a.ts OR (b.ts = a.ts AND b.event_id > a.event_id))""",
)
def x42(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    a = ev.select("user_id", F.col("event_id").alias("a_id"), F.col("ts").alias("a_ts"))
    b = ev.select("user_id", F.col("event_id").alias("b_id"), F.col("ts").alias("b_ts"))
    paired = joins.bucketed_range_join(
        a, b, on=["user_id"], left_ts="a_ts", right_ts="b_ts", max_gap=300, unit="s"
    )
    later = (F.col("b_ts") > F.col("a_ts")) | (
        (F.col("b_ts") == F.col("a_ts")) & (F.col("b_id") > F.col("a_id"))
    )
    return paired.filter(later).select(
        "a_id",
        "b_id",
        "user_id",
        (F.unix_micros("b_ts") - F.unix_micros("a_ts")).alias("gap_us"),
    )


# x43 — star-schema enrichment: revenue by region/nation.  The three dim
# tables are explicitly broadcast — at 100 TB the fact scan joins map-side
# with zero shuffles until the final (25-group) aggregation.
@register(
    "x43_star_join_revenue",
    """SELECT r_name, n_name, COUNT(*) AS n_items,
              ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
       FROM lineitem
       JOIN supplier ON l_suppkey = s_suppkey
       JOIN nation ON s_nationkey = n_nationkey
       JOIN region ON n_regionkey = r_regionkey
       GROUP BY r_name, n_name""",
)
def x43(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    sup = load_table(spark, sf, "supplier").select("s_suppkey", "s_nationkey")
    nat = load_table(spark, sf, "nation").select("n_nationkey", "n_name", "n_regionkey")
    reg = load_table(spark, sf, "region")
    return (
        li.join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(nat), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
        )
    )


# x44 — multi-granularity rollup: hourly aggregate built FROM the minutely
# aggregate (mergeable partials).  The oracle aggregates raw events
# directly — the query proves rollup-of-rollup equals scan-of-raw.
@register(
    "x44_rollup_merge",
    """SELECT date_trunc('hour', ts) AS ws, event_type, COUNT(*) AS n,
              ROUND(SUM(value), 6) AS total
       FROM events GROUP BY 1, 2""",
)
def x44(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return events.multi_granularity_rollup(ev, "ts", "event_type", "value")


# x45 — corpus shingle document-frequency: the scan that calibrates the
# max_df stop-shingle cap for jaccard dedup.
@register(
    "x45_shingle_df",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
        sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i + 1] || ' ' || ts[i + 2] AS s
               FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - 1)) AS i) r),
        d AS (SELECT s AS shingle, COUNT(*) AS df FROM sh GROUP BY s)
        SELECT shingle, df FROM d ORDER BY df DESC, shingle LIMIT 20""",
)
def x45(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return textops.shingle_doc_frequency(docs, "text", "doc_id", n=3, top_k=20)


# x46 — composite curation filter: first-failing-reason verdict per doc.
def _quality_filter_oracle(
    min_tokens: int = 5,
    max_tokens: int = 5000,
    min_quality: float = 0.5,
    min_ratio: float = 0.05,
) -> str:
    langs = sorted(textops.LANG_STOPWORDS)
    ratio_cols = ",\n             ".join(
        "len(list_filter(ts, t -> list_contains([{words}], t)))"
        " / CAST(len(ts) AS DOUBLE) AS r_{lang}".format(
            words=",".join(f"'{w}'" for w in textops.LANG_STOPWORDS[lang]), lang=lang
        )
        for lang in langs
    )
    rlist = ", ".join(f"r_{lang}" for lang in langs)
    best = f"GREATEST({rlist})"
    firstmax = " ".join(f"WHEN r_{lang} = m THEN '{lang}'" for lang in langs)
    en_words = ",".join(f"'{w}'" for w in textops.LANG_STOPWORDS["en"])
    return f"""
    WITH base AS (
      SELECT doc_id, lang, text, {_TOK} AS ts,
             CAST(len(text) AS DOUBLE) AS n_chars
      FROM documents),
    m AS (
      SELECT doc_id, lang,
             CAST(len(ts) AS BIGINT) AS n_tok,
             list_sum(list_transform(ts, t -> len(t))) / CAST(len(ts) AS DOUBLE) AS mwl,
             (n_chars - len(regexp_replace(text, '[.,!?;:]', '', 'g'))) / n_chars AS punct,
             (n_chars - len(regexp_replace(text, '[0-9]', '', 'g'))) / n_chars AS digit,
             len(list_filter(ts, t -> list_contains([{en_words}], t)))
               / CAST(len(ts) AS DOUBLE) AS sw,
             {ratio_cols}
      FROM base),
    q AS (
      SELECT doc_id, lang, n_tok,
             ROUND(0.4 * LEAST(n_tok / 200.0, 1.0)
                 + 0.2 * LEAST(sw / 0.3, 1.0)
                 + 0.2 * (CASE WHEN mwl >= 3.0 AND mwl <= 10.0 THEN 1.0 ELSE 0.0 END)
                 + 0.2 * (1.0 - LEAST(punct * 2.0 + digit * 2.0, 1.0)), 6) AS quality,
             CASE WHEN {best} > {min_ratio}
                  THEN (CASE {firstmax} END)
                  ELSE 'und' END AS pred_lang
      FROM (SELECT *, {best} AS m FROM m) s),
    v AS (
      SELECT doc_id,
             CASE WHEN n_tok < {min_tokens} THEN 'too_short'
                  WHEN n_tok > {max_tokens} THEN 'too_long'
                  WHEN quality < {min_quality} THEN 'low_quality'
                  WHEN pred_lang <> lang THEN 'lang_mismatch'
                  ELSE 'ok' END AS reason
      FROM q)
    SELECT doc_id, reason, reason = 'ok' AS keep FROM v"""


@register("x46_quality_filter", _quality_filter_oracle())
def x46(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    verdicts = textops.quality_filter_verdict(docs, "text", lang_col="lang")
    return verdicts.select("doc_id", "reason", "keep")


# x47 — per-label centroid cosine matrix.  Distributed elementwise mean
# (posexplode + hash agg) — never collect_list of whole vectors.
@register(
    "x47_label_centroids",
    """WITH e AS (SELECT label, unnest(CAST(embedding AS DOUBLE[])) AS v,
                         generate_subscripts(embedding, 1) AS pos
                  FROM embeddings),
        c AS (SELECT label, pos, AVG(v) AS m FROM e GROUP BY label, pos),
        cent AS (SELECT label, array_agg(m ORDER BY pos) AS centroid
                 FROM c GROUP BY label)
        SELECT a.label AS label_a, b.label AS label_b,
               ROUND(list_dot_product(a.centroid, b.centroid)
                     / (sqrt(list_dot_product(a.centroid, a.centroid))
                        * sqrt(list_dot_product(b.centroid, b.centroid))), 6) AS cos
        FROM cent a JOIN cent b ON a.label < b.label""",
)
def x47(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings")
    return similarity.label_centroid_similarity(emb, "embedding", "label")


# x48 — sessionized funnel conversion (view -> click -> purchase), weak
# stage ordering by earliest-event timestamps, 30-minute session gap.
@register(
    "x48_session_funnel",
    """WITH s0 AS (
         SELECT user_id, event_id, ts, event_type,
                CASE WHEN lag(ts) OVER w IS NULL
                          OR CAST(FLOOR(epoch(ts)) AS BIGINT)
                             - CAST(FLOOR(epoch(lag(ts) OVER w)) AS BIGINT) > 1800
                     THEN 1 ELSE 0 END AS new_s
         FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
       s AS (SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS UNBOUNDED PRECEDING) - 1 AS session_idx
             FROM s0),
       f AS (SELECT user_id, session_idx,
                    MIN(CASE WHEN event_type = 'view' THEN ts END) AS t0,
                    MIN(CASE WHEN event_type = 'click' THEN ts END) AS t1,
                    MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS t2
             FROM s GROUP BY user_id, session_idx)
       SELECT COUNT(*) AS n_sessions,
              CAST(SUM(CASE WHEN t0 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_s0,
              CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 >= t0 THEN 1 ELSE 0 END) AS BIGINT) AS n_s1,
              CAST(SUM(CASE WHEN t0 IS NOT NULL AND t1 >= t0 AND t2 >= t1 THEN 1 ELSE 0 END) AS BIGINT) AS n_s2
       FROM f""",
)
def x48(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events")
    return events.funnel_stats(ev, stages=("view", "click", "purchase"))
