"""Extension queries, round 5 (x161+): exact-substring span dedup (the
Lee et al. 2022 training-data measurement) and SCD2 change-history
build — two operators a large-scale training-data platform runs daily
that were still missing from the registry.

Oracle discipline unchanged: engine-portable DuckDB SQL sharing every
literal and alias with the Spark side, deterministic tie-breaks,
floats rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from flashml_spark.operators import events, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table

_N = 5  # span-dedup gram width (word tokens)


def _gram_expr(n: int) -> str:
    return " || ' ' || ".join(f"ts[i + {j}]" for j in range(n))


def _span_ctes(n: int) -> str:
    """Shared x161/x163 CTE chain: tokenize -> positional grams -> dup
    claim -> per-doc gaps-and-islands merge -> spans (s, e)."""
    return f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents
                     WHERE text IS NOT NULL),
        g AS (SELECT doc_id, i - 1 AS pos, {_gram_expr(n)} AS gram
              FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - {n} + 2)) AS i) r),
        d AS (SELECT gram FROM g GROUP BY gram HAVING COUNT(*) >= 2),
        c AS (SELECT doc_id, pos FROM g WHERE gram IN (SELECT gram FROM d)),
        w AS (SELECT doc_id, pos,
                     CASE WHEN lag(pos) OVER win IS NULL
                               OR pos > lag(pos) OVER win + {n}
                          THEN 1 ELSE 0 END AS ni
              FROM c WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
        isl AS (SELECT doc_id, pos,
                       SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                                     ROWS UNBOUNDED PRECEDING) AS island
                FROM w),
        sp AS (SELECT doc_id, island, MIN(pos) AS s,
                      MAX(pos) + {n} - 1 AS e
               FROM isl GROUP BY doc_id, island)"""


# --------------------------------------------------------------------------
# x161 — duplicated-span statistics per document (exact substring dedup,
# Lee et al. 2022): word 5-grams occurring at >= 2 positions corpus-wide
# claim their positions; overlapping/adjacent claims merge into maximal
# spans per doc (gaps-and-islands inside a per-doc window).  Every
# non-null-text doc reports, zeros included.
@register(
    "x161_dup_span_stats",
    _span_ctes(_N)
    + """,
        per AS (SELECT doc_id, COUNT(*) AS n_dup_spans,
                       SUM(e - s + 1) AS dup_tokens
                FROM sp GROUP BY doc_id)
       SELECT t.doc_id, CAST(len(t.ts) AS BIGINT) AS n_tokens,
              CAST(COALESCE(p.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
              CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
              ROUND(COALESCE(p.dup_tokens, 0) * 1.0 / len(t.ts), 6) AS dup_frac
       FROM tok t LEFT JOIN per p USING (doc_id)""",
)
def x161(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.dup_span_stats(docs, "text", "doc_id", n=_N)


# --------------------------------------------------------------------------
# x162 — SCD2 change history from the event stream: per user, collapse
# consecutive same-type events into validity intervals (valid_from =
# run's first ts, valid_to = next run's first ts, NULL while open).  A
# type that recurs later opens a NEW interval — true type-2 history.
@register(
    "x162_scd2_intervals",
    """WITH w AS (SELECT user_id, event_type, ts, event_id,
                     CASE WHEN row_number() OVER win = 1
                               OR lag(event_type) OVER win
                                  IS DISTINCT FROM event_type
                          THEN 1 ELSE 0 END AS chg
              FROM events
              WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id)),
        r AS (SELECT user_id, event_type, ts,
                     SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS run
              FROM w),
        p AS (SELECT user_id, run, MIN(event_type) AS event_type,
                     MIN(ts) AS valid_from,
                     CAST(COUNT(*) AS BIGINT) AS n_events
              FROM r GROUP BY user_id, run)
       SELECT user_id, event_type, valid_from,
              lead(valid_from) OVER (PARTITION BY user_id ORDER BY run)
                  AS valid_to,
              n_events
       FROM p""",
)
def x162(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select(
        "user_id", "event_type", "ts", "event_id"
    )
    return events.scd2_run_intervals(ev, "user_id", "ts", "event_type", "event_id")


# --------------------------------------------------------------------------
# x163 — the span-CUTTING transform x161 measures: rebuild each doc's
# text with every duplicated span removed (conservative symmetric cut).
# Docs emptied by the cut survive with empty text.
@register(
    "x163_dedup_span_removal",
    _span_ctes(_N)
    + """,
        cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM sp),
        tp AS (SELECT doc_id, i - 1 AS pos, ts[i] AS token
               FROM tok, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) r),
        kept AS (SELECT tp.doc_id, tp.pos, tp.token FROM tp
                 WHERE NOT EXISTS (SELECT 1 FROM cov
                                   WHERE cov.doc_id = tp.doc_id
                                     AND cov.pos = tp.pos)),
        reb AS (SELECT doc_id, string_agg(token, ' ' ORDER BY pos) AS clean_text,
                       CAST(COUNT(*) AS BIGINT) AS kept_tokens
                FROM kept GROUP BY doc_id)
       SELECT t.doc_id, COALESCE(r.clean_text, '') AS clean_text,
              CAST(len(t.ts) AS BIGINT) AS n_tokens,
              CAST(COALESCE(r.kept_tokens, 0) AS BIGINT) AS kept_tokens
       FROM tok t LEFT JOIN reb r USING (doc_id)""",
)
def x163(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.remove_dup_spans(docs, "text", "doc_id", n=_N)
