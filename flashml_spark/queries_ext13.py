"""Extension queries, round 5 second wave (x164+): graph structure
audits (triangle counting / clustering coefficient over the part
co-order graph), cross-source quantile normalization (score
calibration), and within-document self-repetition (the Gopher quality
rule) — three operators a curation platform runs that were still
missing from the registry.

Oracle discipline unchanged: engine-portable DuckDB SQL sharing every
literal and alias with the Spark side, deterministic tie-breaks,
floats rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.operators import events, graph, relational, sampling, textops
from flashml_spark.queries import register
from flashml_spark.queries_ext import _TOK
from flashml_spark.sources.readers import load_table


# --------------------------------------------------------------------------
# x164 — triangle count + local clustering coefficient over the part
# co-order graph (parts appearing in the same order share an edge; the
# per-order pair fan-out is bounded by basket size).  Degree-ordered
# orientation counts each triangle exactly once; top 20 parts by
# triangle count (part_id tie-break).
_TRI_SQL = """
WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
     deg AS (SELECT node, COUNT(*) AS deg
             FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
             GROUP BY node),
     o AS (SELECT CASE WHEN (da.deg, e0.a) < (db.deg, e0.b)
                       THEN e0.a ELSE e0.b END AS lo,
                  CASE WHEN (da.deg, e0.a) < (db.deg, e0.b)
                       THEN e0.b ELSE e0.a END AS hi,
                  CASE WHEN (da.deg, e0.a) < (db.deg, e0.b)
                       THEN db.deg ELSE da.deg END AS dhi
           FROM e0 JOIN deg da ON da.node = e0.a
                   JOIN deg db ON db.node = e0.b),
     tri AS (SELECT w1.lo AS u, w1.hi AS v, w2.hi AS w
             FROM o w1 JOIN o w2 ON w1.lo = w2.lo
             WHERE (w1.dhi, w1.hi) < (w2.dhi, w2.hi)
               AND EXISTS (SELECT 1 FROM o c
                           WHERE c.lo = w1.hi AND c.hi = w2.hi)),
     pn AS (SELECT node, COUNT(*) AS triangles
            FROM (SELECT u AS node FROM tri UNION ALL
                  SELECT v FROM tri UNION ALL SELECT w FROM tri)
            GROUP BY node)
SELECT deg.node AS part_id,
       CAST(deg.deg AS BIGINT) AS degree,
       CAST(COALESCE(pn.triangles, 0) AS BIGINT) AS triangles,
       ROUND(CASE WHEN deg.deg >= 2
                  THEN 2.0 * COALESCE(pn.triangles, 0)
                       / (deg.deg * (deg.deg - 1.0))
                  ELSE 0.0 END, 6) AS clustering
FROM deg LEFT JOIN pn ON pn.node = deg.node
ORDER BY triangles DESC, part_id ASC
LIMIT 20"""


@register("x164_triangle_parts", _TRI_SQL)
def x164(spark: SparkSession, sf: str) -> DataFrame:
    # Per-order pairs via the basket-bounded HOF builder (r11): one
    # groupBy exchange generates each order's canonical part pairs in
    # place of the distinct + keyed self-join (same SIMPLE-graph edge
    # set; triangle_stats normalizes duplicates downstream as before).
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.co_occurrence_pairs(li, "l_orderkey", "l_partkey")
    stats = graph.triangle_stats(edges)
    return (
        stats.select(
            F.col("node").alias("part_id"),
            "degree",
            "triangles",
            F.round("clustering", 6).alias("clustering"),
        )
        .orderBy(F.desc("triangles"), F.asc("part_id"))
        .limit(20)
    )


# --------------------------------------------------------------------------
# x165 — cross-source quantile normalization of document lengths:
# every doc's n_chars maps to the GLOBAL length distribution's value at
# the same within-source relative rank (grid of 100 cells, exact max-of
# -cell semantics — no interpolation, engine-portable).
_QNORM_SQL = """
WITH d AS (SELECT doc_id, source, n_chars FROM documents
           WHERE n_chars IS NOT NULL),
     s AS (SELECT doc_id, source, n_chars,
                  CAST(floor(percent_rank() OVER
                       (PARTITION BY source ORDER BY n_chars) * 100)
                       AS INT) AS g
           FROM d),
     gl AS (SELECT n_chars,
                   CAST(floor(percent_rank() OVER (ORDER BY n_chars) * 100)
                        AS INT) AS cell
            FROM d),
     cm AS (SELECT cell, MAX(n_chars) AS cmax FROM gl GROUP BY cell),
     grid AS (SELECT unnest(range(0, 101)) AS g),
     b AS (SELECT grid.g, MAX(cm.cmax) AS qnorm
           FROM grid LEFT JOIN cm ON cm.cell <= grid.g
           GROUP BY grid.g)
SELECT s.doc_id, s.source, s.n_chars, b.qnorm
FROM s JOIN b ON s.g = b.g"""


@register("x165_quantile_normalize", _QNORM_SQL)
def x165(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return relational.quantile_normalize(
        docs, "n_chars", "source", "doc_id", buckets=100
    )


# --------------------------------------------------------------------------
# x166 — within-document self-repetition (Gopher "fraction of chars in
# duplicate n-grams", Rae et al. 2021): word 3-grams occurring >= 2
# times IN THE SAME doc claim their positions; merged spans report the
# duplicated token count and the char-weighted fraction.
_N_SELF = 3
_SELF_GRAM = " || ' ' || ".join(f"ts[i + {j}]" for j in range(_N_SELF))
_SELF_SQL = f"""
WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents
             WHERE text IS NOT NULL),
     g AS (SELECT doc_id, i - 1 AS pos, {_SELF_GRAM} AS gram
           FROM tok, LATERAL (SELECT unnest(range(1, len(ts) - {_N_SELF} + 2))
                              AS i) r),
     d AS (SELECT doc_id, gram FROM g
           GROUP BY doc_id, gram HAVING COUNT(*) >= 2),
     c AS (SELECT g.doc_id, g.pos FROM g
           JOIN d ON g.doc_id = d.doc_id AND g.gram = d.gram),
     w AS (SELECT doc_id, pos,
                  CASE WHEN lag(pos) OVER win IS NULL
                            OR pos > lag(pos) OVER win + {_N_SELF}
                       THEN 1 ELSE 0 END AS ni
           FROM c WINDOW win AS (PARTITION BY doc_id ORDER BY pos)),
     isl AS (SELECT doc_id, pos,
                    SUM(ni) OVER (PARTITION BY doc_id ORDER BY pos
                                  ROWS UNBOUNDED PRECEDING) AS island
             FROM w),
     sp AS (SELECT doc_id, island, MIN(pos) AS s,
                   MAX(pos) + {_N_SELF} - 1 AS e
            FROM isl GROUP BY doc_id, island),
     cov AS (SELECT doc_id, unnest(range(s, e + 1)) AS pos FROM sp),
     tp AS (SELECT doc_id, i - 1 AS pos, ts[i] AS token
            FROM tok, LATERAL (SELECT unnest(range(1, len(ts) + 1)) AS i) r),
     dupc AS (SELECT tp.doc_id, COUNT(*) AS dup_tokens,
                     SUM(len(tp.token)) AS dup_chars
              FROM tp JOIN cov ON cov.doc_id = tp.doc_id AND cov.pos = tp.pos
              GROUP BY tp.doc_id),
     tot AS (SELECT doc_id, CAST(len(ts) AS BIGINT) AS n_tokens,
                    list_aggregate(list_transform(ts, x -> len(x)), 'sum')
                        AS tchars
             FROM tok)
SELECT tot.doc_id, tot.n_tokens,
       CAST(COALESCE(dupc.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       ROUND(CASE WHEN tot.tchars > 0
                  THEN CAST(COALESCE(dupc.dup_chars, 0) AS DOUBLE) / tot.tchars
                  ELSE 0.0 END, 6) AS dup_char_frac
FROM tot LEFT JOIN dupc ON dupc.doc_id = tot.doc_id"""


@register("x166_self_repetition", _SELF_SQL)
def x166(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.self_repetition_stats(docs, "text", "doc_id", n=_N_SELF)


# --------------------------------------------------------------------------
# x167 — tokenizer fertility per source under the x143-learned BPE
# merges: the encode half of the BPE loop.  The oracle unrolls the SAME
# learn chain as x143 (threading word identity through every round) and
# then encodes each (source, word) with the final symbol table.
def _bpe_fertility_oracle(k: int = 5) -> str:
    parts = [
        f"""WITH tok AS (SELECT source, unnest({_TOK}) AS word FROM documents
                     WHERE text IS NOT NULL),
        gw AS (SELECT source, word, COUNT(*) AS cnt FROM tok
               GROUP BY source, word),
        wf AS (SELECT word, SUM(cnt) AS freq FROM gw GROUP BY word),
        w0 AS (SELECT word, regexp_replace(word, '(.)', ' \\1 ', 'g') AS r,
                      freq FROM wf)"""
    ]
    for i in range(1, k + 1):
        parts.append(
            f"""p{i} AS (SELECT s[j] || ' ' || s[j + 1] AS pair, SUM(freq) AS n
              FROM (SELECT string_split(trim(r), '  ') AS s, freq FROM w{i - 1}) t,
                   LATERAL (SELECT unnest(range(1, len(s))) AS j) L
              GROUP BY 1),
        b{i} AS (SELECT pair, replace(pair, ' ', '') AS merged, n
               FROM p{i} ORDER BY n DESC, pair LIMIT 1),
        w{i} AS (SELECT word, replace(r, ' ' || replace(b{i}.pair, ' ', '  ') || ' ',
                               ' ' || b{i}.merged || ' ') AS r, freq
               FROM w{i - 1}, b{i})"""
        )
    parts.append(
        f"""enc AS (SELECT word, len(string_split(trim(r), '  ')) AS n_sym
               FROM w{k})"""
    )
    return (
        ",\n        ".join(parts)
        + """
       SELECT gw.source,
              CAST(SUM(gw.cnt) AS BIGINT) AS n_words,
              CAST(SUM(gw.cnt * enc.n_sym) AS BIGINT) AS n_bpe_tokens,
              ROUND(SUM(gw.cnt * enc.n_sym) / CAST(SUM(gw.cnt) AS DOUBLE), 6)
                  AS fertility
       FROM gw JOIN enc ON gw.word = enc.word
       GROUP BY gw.source"""
    )


@register("x167_bpe_fertility", _bpe_fertility_oracle(5))
def x167(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H

    docs = load_table(spark, sf, "documents").select("source", "text")
    # ONE corpus tokenize shared by BOTH halves (r11): the learn loop's
    # word frequencies are the per-source counts summed over sources —
    # integer-exact — so the pinned (source, word) agg feeds bpe_learn
    # via word_freq= and bpe_encode_fertility via group_word_counts=,
    # instead of each tokenizing the corpus separately.
    gw = (
        docs.where(F.col("text").isNotNull())
        .select("source", F.explode(H.tokens(F.col("text"))).alias("word"))
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .localCheckpoint()
    )
    wf = gw.groupBy("word").agg(F.sum("cnt").alias("freq"))
    merges_df = textops.bpe_learn(
        docs.select("text"), "text", n_merges=5, word_freq=wf
    )
    merges = [
        r["pair"] for r in merges_df.orderBy("merge_round").collect()
    ]
    return textops.bpe_encode_fertility(
        docs, "text", "source", merges, group_word_counts=gw
    )


# --------------------------------------------------------------------------
# x168 — degree assortativity of the part co-order graph (Newman 2002):
# do frequently-co-ordered hub parts pair with other hubs or with
# one-off parts?  One corr() row over the symmetrized edge-degree
# frame; shares x164's edge build.
_ASSORT_SQL = """
WITH e0 AS (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
            FROM lineitem a JOIN lineitem b
              ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
     deg AS (SELECT node, COUNT(*) AS deg
             FROM (SELECT a AS node FROM e0 UNION ALL SELECT b FROM e0)
             GROUP BY node),
     k AS (SELECT da.deg AS dx, db.deg AS dy
           FROM e0 JOIN deg da ON da.node = e0.a
                   JOIN deg db ON db.node = e0.b),
     sym AS (SELECT dx, dy FROM k UNION ALL SELECT dy AS dx, dx AS dy FROM k)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM deg) AS n_nodes,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM e0) AS n_edges,
       (SELECT ROUND(corr(CAST(dx AS DOUBLE), CAST(dy AS DOUBLE)), 6)
        FROM sym) AS assortativity"""


@register("x168_part_assortativity", _ASSORT_SQL)
def x168(spark: SparkSession, sf: str) -> DataFrame:
    # Same HOF pair builder as x164 (r11): identical edge SET — the
    # oracle's e0 is DISTINCT-after-join and _degree_keyed_edges
    # distincts internally, so cross-order duplicates collapse as before.
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    edges = graph.co_occurrence_pairs(li, "l_orderkey", "l_partkey")
    return graph.degree_assortativity(edges)


# --------------------------------------------------------------------------
# x169 — reliability diagram / calibration curve: scores and labels are
# hash-derived (score = uniform from md5(orderkey); label drawn with
# probability = score from a second independent hash), so the curve is
# calibrated by construction up to sampling noise — per-decile support,
# mean score, observed rate, and the |gap| (the ECE terms).
_CAL_SQL = """
WITH s AS (SELECT o_orderkey,
                  (CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967296.0 AS score,
                  (CAST(('0x' || substr(md5('lbl:' || CAST(o_orderkey AS VARCHAR)), 1, 8))
                        AS BIGINT) + 1.0) / 4294967296.0 AS u2
           FROM orders),
     lab AS (SELECT score,
                    CASE WHEN u2 < score THEN 1.0 ELSE 0.0 END AS label,
                    GREATEST(0, LEAST(CAST(floor(score * 10) AS INT), 9)) AS bucket
             FROM s)
SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(AVG(score), 6) AS mean_score,
       ROUND(AVG(label), 6) AS pos_rate,
       ROUND(ABS(AVG(score) - AVG(label)), 6) AS abs_gap
FROM lab GROUP BY bucket"""


@register("x169_calibration_curve", _CAL_SQL)
def x169(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.functions import hashing as H
    from flashml_spark.metrics.binary import calibration_curve

    orders = load_table(spark, sf, "orders").select("o_orderkey")
    okey = F.col("o_orderkey").cast("string")

    scored = orders.select(
        H.md5_uniform(okey).alias("score"),
        H.md5_uniform(F.concat(F.lit("lbl:"), okey)).alias("u2"),
    ).select(
        "score",
        F.when(F.col("u2") < F.col("score"), 1.0).otherwise(0.0).alias("label"),
    )
    return calibration_curve(scored, "score", "label", buckets=10)


# --------------------------------------------------------------------------
# x170 — per-language weighted document sample (Efraimidis-Spirakis
# A-ES, keyed): 5 docs per lang, inclusion probability proportional to
# n_chars; u from md5(doc_id) so any engine draws the same sample.
_WSG_SQL = """
WITH s AS (SELECT lang, doc_id, n_chars,
                  ln((CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))
                           AS BIGINT) + 1.0) / 4294967296.0) / n_chars AS es_key
           FROM documents WHERE n_chars > 0),
     r AS (SELECT lang, doc_id, n_chars,
                  ROW_NUMBER() OVER (PARTITION BY lang
                                     ORDER BY es_key DESC, doc_id) AS rk
           FROM s)
SELECT lang, doc_id, n_chars, CAST(rk AS INT) AS rk FROM r WHERE rk <= 5"""


@register("x170_group_weighted_sample", _WSG_SQL)
def x170(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select("lang", "doc_id", "n_chars")
    out = sampling.weighted_sample_per_group(
        docs, "lang", "n_chars", "doc_id", k=5
    )
    return out.select("lang", "doc_id", "n_chars", F.col("rk").cast("int").alias("rk"))


# --------------------------------------------------------------------------
# x171 — market-basket frequent pairs over order baskets: support,
# max-direction confidence, lift; min_support prunes before the joins.
_FP_SQL = """
WITH items AS (SELECT DISTINCT l_orderkey AS bk, l_partkey AS it FROM lineitem),
     pairs AS (SELECT a.it AS ia, c.it AS ib, COUNT(*) AS support
               FROM items a JOIN items c ON a.bk = c.bk AND a.it < c.it
               GROUP BY a.it, c.it HAVING COUNT(*) >= 2),
     isup AS (SELECT it, COUNT(*) AS n_it FROM items GROUP BY it),
     nb AS (SELECT COUNT(DISTINCT bk) AS n_bk FROM items)
SELECT p.ia AS item_a, p.ib AS item_b,
       CAST(p.support AS BIGINT) AS support,
       ROUND(GREATEST(p.support / CAST(sa.n_it AS DOUBLE),
                      p.support / CAST(sb.n_it AS DOUBLE)), 6) AS confidence,
       ROUND(p.support * CAST(nb.n_bk AS DOUBLE)
             / (sa.n_it * CAST(sb.n_it AS DOUBLE)), 6) AS lift
FROM pairs p JOIN isup sa ON sa.it = p.ia
             JOIN isup sb ON sb.it = p.ib, nb
ORDER BY lift DESC, support DESC, item_a, item_b LIMIT 15"""


@register("x171_frequent_pairs", _FP_SQL)
def x171(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    return relational.frequent_pairs(
        li, "l_orderkey", "l_partkey", min_support=2, top_k=15
    )


# --------------------------------------------------------------------------
# x172 — day-of-week seasonal indices per event type: weekday mean over
# overall mean.  dow = pmod(days_since_epoch + 4, 7) (0=Sunday) — integer
# arithmetic, identical in both engines (their dayofweek() bases differ;
# the oracle's double-% is SQL's positive-mod spelling).
_SEAS_SQL = """
WITH e AS (SELECT event_type,
                  ((DATEDIFF('day', DATE '1970-01-01', CAST(ts AS DATE)) + 4) % 7
                   + 7) % 7 AS dow,
                  value FROM events),
     per AS (SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
                    AVG(value) AS a FROM e GROUP BY event_type, dow),
     tot AS (SELECT event_type, AVG(value) AS t FROM e GROUP BY event_type)
SELECT per.event_type, CAST(per.dow AS INT) AS dow, per.n,
       ROUND(per.a, 6) AS avg_value,
       ROUND(per.a / tot.t, 6) AS seasonal_index
FROM per JOIN tot ON per.event_type = tot.event_type"""


@register("x172_seasonal_indices", _SEAS_SQL)
def x172(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("event_type", "ts", "value")
    return events.seasonal_indices(ev, "ts", "event_type", "value")


# --------------------------------------------------------------------------
# x173 — supplier revenue concentration per nation (Herfindahl index):
# sum of squared supplier revenue shares within each nation.
_HHI_SQL = """
WITH rev AS (SELECT s.s_nationkey AS nation, l.l_suppkey AS sup,
                    SUM(l.l_extendedprice * (1 - l.l_discount)) AS v
             FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
             GROUP BY s.s_nationkey, l.l_suppkey),
     tot AS (SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_entities,
                    SUM(v) AS t FROM rev GROUP BY nation)
SELECT rev.nation, tot.n_entities,
       ROUND(tot.t, 2) AS total_value,
       ROUND(SUM((rev.v / tot.t) * (rev.v / tot.t)), 6) AS hhi
FROM rev JOIN tot ON rev.nation = tot.nation
GROUP BY rev.nation, tot.n_entities, tot.t"""


@register("x173_nation_supplier_hhi", _HHI_SQL)
def x173(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem").select(
        "l_suppkey",
        (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("rev"),
    )
    sup = load_table(spark, sf, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), F.col("s_nationkey").alias("nation")
    )
    joined = li.join(sup, "l_suppkey")
    return relational.concentration_hhi(joined, "nation", "l_suppkey", "rev")


# --------------------------------------------------------------------------
# x174 — per-cohort exponential retention decay: OLS of ln(retained
# fraction) on day offset (offsets >= 1), slope + implied half-life.
_RETD_SQL = """
WITH day AS (SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
             FROM events),
     first AS (SELECT user_id, MIN(d) AS cohort FROM day GROUP BY user_id),
     m AS (SELECT CAST(f.cohort AS VARCHAR) AS cohort_day,
                  DATEDIFF('day', f.cohort, day.d) AS off,
                  COUNT(DISTINCT day.user_id) AS n_users
           FROM day JOIN first f ON day.user_id = f.user_id
           GROUP BY f.cohort, DATEDIFF('day', f.cohort, day.d)),
     base AS (SELECT cohort_day, n_users AS n0 FROM m WHERE off = 0),
     pts AS (SELECT m.cohort_day, CAST(m.off AS DOUBLE) AS x,
                    ln(m.n_users / CAST(b.n0 AS DOUBLE)) AS y
             FROM m JOIN base b ON m.cohort_day = b.cohort_day
             WHERE m.off >= 1 AND m.n_users > 0),
     agg AS (SELECT cohort_day, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
                    SUM(x * x) AS sxx, SUM(x * y) AS sxy
             FROM pts GROUP BY cohort_day)
SELECT cohort_day, CAST(n AS BIGINT) AS n_points,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope,
       ROUND(CASE WHEN (n * sxy - sx * sy) / (n * sxx - sx * sx) < 0
                  THEN -ln(2.0) / ((n * sxy - sx * sy) / (n * sxx - sx * sx))
             END, 6) AS half_life_days
FROM agg WHERE n >= 3"""


@register("x174_retention_decay", _RETD_SQL)
def x174(spark: SparkSession, sf: str) -> DataFrame:
    ev = load_table(spark, sf, "events").select("user_id", "ts")
    return events.retention_decay(ev, "user_id", "ts", min_offsets=3)


# --------------------------------------------------------------------------
# x175 — Johnson-Lindenstrauss random projection of the embedding table
# to 8 dims: deterministic Rademacher signs from md5('jl:i:j') parity,
# rebuilt identically by the oracle; 1/sqrt(k) scaling.
_JL_K, _JL_D = 8, 64
_JL_SQL = f"""
WITH m AS (SELECT i.i, j.j,
                  CASE WHEN CAST(('0x' || substr(md5('jl:' || i.i || ':' || j.j), 1, 8))
                            AS BIGINT) % 2 = 0 THEN 1.0 ELSE -1.0 END AS s
           FROM (SELECT unnest(range(0, {_JL_D})) AS i) i,
                (SELECT unnest(range(0, {_JL_K})) AS j) j),
     e AS (SELECT vec_id, u.i - 1 AS i, CAST(u.v AS DOUBLE) AS v
           FROM embeddings,
                LATERAL (SELECT unnest(embedding) AS v,
                                generate_subscripts(embedding, 1) AS i) u)
SELECT e.vec_id, CAST(m.j AS INT) AS out_dim,
       ROUND(SUM(e.v * m.s) / sqrt({_JL_K}.0), 6) AS value
FROM e JOIN m ON e.i = m.i
GROUP BY e.vec_id, m.j"""


@register("x175_random_projection", _JL_SQL)
def x175(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    return similarity.random_projection(
        emb, "embedding", "vec_id", k=_JL_K, dim=_JL_D
    )


# --------------------------------------------------------------------------
# x176 — declarative data-contract validation over lineitem: six rules
# (not-null, two ranges, an allowed set, composite-key uniqueness, a
# cross-field predicate), ALL evaluated in one aggregation pass.
_EXPECT_RULES = [
    {"type": "not_null", "column": "l_shipdate"},
    {"type": "range", "column": "l_quantity", "lo": 1, "hi": 50},
    {"type": "range", "column": "l_discount", "lo": 0.0, "hi": 0.1},
    {"type": "allowed", "column": "l_returnflag", "values": ["A", "N", "R"]},
    {"type": "unique", "columns": ["l_orderkey", "l_linenumber"]},
    {
        "type": "predicate",
        "id": "unit_price_above_one",
        "sql": "l_extendedprice > l_quantity",
    },
]
_EXPECT_SQL = """
WITH a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v0,
                  CAST(SUM(CASE WHEN l_quantity IS NOT NULL
                                 AND l_quantity >= 1 AND l_quantity <= 50
                            THEN 0 ELSE 1 END) AS BIGINT) AS v1,
                  CAST(SUM(CASE WHEN l_discount IS NOT NULL
                                 AND l_discount >= 0.0 AND l_discount <= 0.1
                            THEN 0 ELSE 1 END) AS BIGINT) AS v2,
                  CAST(SUM(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                            THEN 0 ELSE 1 END) AS BIGINT) AS v3,
                  CAST(COUNT(*) - COUNT(DISTINCT (l_orderkey, l_linenumber))
                       AS BIGINT) AS v4,
                  CAST(SUM(CASE WHEN l_extendedprice > l_quantity
                            THEN 0 ELSE 1 END) AS BIGINT) AS v5
           FROM lineitem)
SELECT r.rule_id, r.rule_type, r.violations, a.n AS n_rows,
       r.violations = 0 AS passed
FROM a, LATERAL (VALUES
    ('not_null:l_shipdate', 'not_null', a.v0),
    ('range:l_quantity', 'range', a.v1),
    ('range:l_discount', 'range', a.v2),
    ('allowed:l_returnflag', 'allowed', a.v3),
    ('unique:l_orderkey,l_linenumber', 'unique', a.v4),
    ('unit_price_above_one', 'predicate', a.v5)
) AS r(rule_id, rule_type, violations)"""


@register("x176_expectations_audit", _EXPECT_SQL)
def x176(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return relational.validate_expectations(li, _EXPECT_RULES)


# --------------------------------------------------------------------------
# x177 — privacy release screen: k-anonymity + l-diversity of documents
# under quasi-identifiers (lang, n_chars bucket) with source as the
# sensitive attribute; one go/no-go summary row (k=5).
_KANON_SQL = """
WITH per AS (SELECT lang, CAST(floor(n_chars / 100) AS BIGINT) AS bkt,
                    COUNT(*) AS n, COUNT(DISTINCT source) AS l
             FROM documents GROUP BY lang, CAST(floor(n_chars / 100) AS BIGINT))
SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
       CAST(COUNT(*) AS BIGINT) AS n_groups,
       CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS risky_groups,
       CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS risky_rows,
       ROUND(SUM(CASE WHEN n < 5 THEN n ELSE 0 END)
             / CAST(SUM(n) AS DOUBLE) * 100.0, 6) AS risky_row_pct,
       CAST(MIN(n) AS BIGINT) AS min_group_size,
       CAST(MIN(l) AS BIGINT) AS min_l
FROM per"""


@register("x177_k_anonymity", _KANON_SQL)
def x177(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").select(
        "lang",
        F.floor(F.col("n_chars") / 100).cast("bigint").alias("bkt"),
        "source",
    )
    return relational.k_anonymity_audit(docs, ["lang", "bkt"], "source", k=5)
