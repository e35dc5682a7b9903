"""Extension queries x271+ — round-10 additions.

Closes the last partial §2 component (real baseline JPEG, x271; the
k-means/absorbing-Markov planted-fixture oracles landed directly on
x72/x192), then widens the dedup family with the one modality a
frontier text pipeline still lacked here: exact substring dedup
(suffix-array / Lee et al. 2022 style — x272 per-doc matching-stats
report, x273 corpus longest-repeated-substrings, x274 cross-side
eval decontamination), plus token-stream packing (x275), k-core
(x276), real audio feature extraction (x277), the published
cluster-scoped curation recipes (x278 SemDeDup, x282 prototype
pruning, x283 D4 end-to-end), the documented-out codec variants
(x279 paletted/Adam7 PNG, x280 progressive JPEG) and CCNet quality
buckets (x281).  Oracle discipline
unchanged: exact integer/decimal accumulation before any float, one
written operation order in both engines, Python-computed shared
literals pinned as SQL text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table, local_rows

# --------------------------------------------------------------------------
# x271 — REAL baseline-JPEG encode→decode roundtrip audit over the whole
# corpus (multimodal.jpeg_roundtrip_audit): per doc_id a two-tone image
# with a GUARANTEED luma gap (dark half < 64, bright half ≥ 192 — JPEG
# is lossy, so unlike x255/x270 the construction must make the hash
# decision immune to quantization/ringing error, which is bounded well
# under half the gap at quality 90) is pushed through the full SOF0
# pipeline: RGB→YCbCr, 4:2:0 box subsampling on even ids / 4:4:4 on odd,
# FDCT, Annex-K quantize + Huffman, then Huffman decode, dequant, IDCT,
# upsample, YCbCr→RGB.  Dims come from the decoded SOF0 header and the
# aHash from the luma ORDER of the two halves — both exactly derivable
# from the id arithmetic, so a hash match certifies the whole lossy
# chain on every row (the planted-fixture pattern, corpus as fixture).
_JPEG_SQL = """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(4 + 2 * (doc_id % 3) AS INT) AS height,
       CASE WHEN doc_id % 4 >= 2 THEN '00000000ffffffff'
            ELSE 'ffffffff00000000' END AS phash
FROM documents ORDER BY media_id"""


@register("x271_jpeg_roundtrip_audit", _JPEG_SQL)
def x271(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    return multimodal.jpeg_roundtrip_audit(docs, "doc_id")


# --------------------------------------------------------------------------
# x272/x273 — exact substring dedup, the suffix-array family (Lee et
# al. 2022, arXiv:2107.06499): distributed matching statistics via
# anchor-bucketed suffix sort + neighbor token-LCP extension
# (textops.suffix_matching_stats; no all-pairs, one anchor shuffle).
# The oracle is a FULL twin — the identical construction in DuckDB
# (list_zip/list_position mirror Spark's zip_with/array_position,
# including the shared "position 0 = no mismatch" convention and the
# identical binary sort of the space-joined continuation), so every
# suffix's exact repeat length is certified, not just planted rows.
_SUF_K, _SUF_C = 8, 24


def _lcp_sql(other: str) -> str:
    """DuckDB token-LCP of ``cont`` vs ``{other}`` (-1 when NULL) —
    the exact twin of textops._token_lcp including the shared
    "list_position = 0 means no mismatch" convention."""
    mis = (
        f"list_position(list_transform(list_zip(cont, {other}),"
        " x -> x[1] IS NOT DISTINCT FROM x[2]), false)"
    )
    return (
        f"(CASE WHEN {other} IS NULL THEN -1 ELSE"
        f" (CASE WHEN {mis} = 0 THEN LEAST(len(cont), len({other}))"
        f" ELSE {mis} - 1 END) END)"
    )


def _suffix_cte(k: int, c: int) -> str:
    """Shared suffix/LCP CTE chain (DuckDB) ending in relation ``e``
    with columns doc_id, pos, anchor, cont, ext."""
    lcp = _lcp_sql

    return f"""
toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL),
suf0 AS (
  SELECT doc_id, t, unnest(generate_series(1, len(t) - {k - 1})) AS pos
  FROM toks WHERE len(t) >= {k}),
suf AS (
  SELECT doc_id, pos,
         array_to_string(t[pos : pos + {k - 1}], ' ') AS anchor,
         t[pos + {k} : pos + {k + c - 1}] AS cont
  FROM suf0),
b AS (
  SELECT doc_id, pos, anchor, cont,
         COUNT(*) OVER (PARTITION BY anchor) AS cnt,
         LAG(cont)  OVER w AS prv,
         LEAD(cont) OVER w AS nxt
  FROM suf
  WINDOW w AS (PARTITION BY anchor
               ORDER BY array_to_string(cont, ' '), doc_id, pos)),
e AS (
  SELECT doc_id, pos, anchor, cont,
         GREATEST({lcp("prv")}, {lcp("nxt")}) AS ext
  FROM b WHERE cnt >= 2)"""


_X272_SQL = f"""
WITH {_suffix_cte(_SUF_K, _SUF_C)},
per_doc AS (
  SELECT doc_id, CAST(MAX({_SUF_K} + ext) AS BIGINT) AS max_repeat_len,
         CAST(COUNT(*) AS BIGINT) AS n_repeat_suffixes
  FROM e GROUP BY doc_id)
SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens,
       COALESCE(per_doc.max_repeat_len, 0) AS max_repeat_len,
       COALESCE(per_doc.n_repeat_suffixes, 0) AS n_repeat_suffixes
FROM toks LEFT JOIN per_doc ON toks.doc_id = per_doc.doc_id
ORDER BY toks.doc_id"""


@register("x272_exact_substring_report", _X272_SQL)
def x272(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.exact_substring_report(
        docs, "text", "doc_id", anchor_len=_SUF_K, ext_cap=_SUF_C
    ).orderBy("doc_id")


_X273_SQL = f"""
WITH {_suffix_cte(_SUF_K, _SUF_C)},
reps AS (
  SELECT CASE WHEN ext > 0
              THEN anchor || ' ' || array_to_string(cont[1:ext], ' ')
              ELSE anchor END AS repeat,
         {_SUF_K} + ext AS repeat_len
  FROM e)
SELECT repeat, CAST(MAX(repeat_len) AS BIGINT) AS repeat_len,
       CAST(COUNT(*) AS BIGINT) AS n_positions
FROM reps GROUP BY repeat
ORDER BY repeat_len DESC, repeat LIMIT 10"""


@register("x273_longest_repeated_substrings", _X273_SQL)
def x273(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.longest_repeated_substrings(
        docs, "text", "doc_id", anchor_len=_SUF_K, ext_cap=_SUF_C, top_n=10
    )


# --------------------------------------------------------------------------
# x274 — exact-substring eval-set DECONTAMINATION (cross-side suffix
# matching statistics; GPT-3 appendix C / Lee et al. §6.2): the eval
# shard is x178's doc_id % 17 = 0 split, and each eval doc reports the
# longest exact token run it shares with the TRAIN side (eval-eval
# duplication does not count), flagged at min_len=12.  The best corpus
# match of an eval suffix is its nearest corpus-side row in the sorted
# anchor bucket, found with ignorenulls running frames — no eval x
# corpus join on either engine.  FULL DuckDB twin oracle.
_DEC_K, _DEC_C, _DEC_MIN = 8, 24, 12

_X274_SQL = f"""
WITH toks AS (
  SELECT doc_id, CASE WHEN doc_id % 17 = 0 THEN 1 ELSE 0 END AS side,
         string_split_regex(lower(trim(text)), '\\s+') AS t
  FROM documents WHERE text IS NOT NULL),
suf0 AS (
  SELECT side, doc_id, t,
         unnest(generate_series(1, len(t) - {_DEC_K - 1})) AS pos
  FROM toks WHERE len(t) >= {_DEC_K}),
suf AS (
  SELECT side, doc_id, pos,
         array_to_string(t[pos : pos + {_DEC_K - 1}], ' ') AS anchor,
         t[pos + {_DEC_K} : pos + {_DEC_K + _DEC_C - 1}] AS cont
  FROM suf0),
b AS (
  SELECT side, doc_id, pos, cont,
         last_value(CASE WHEN side = 0 THEN cont END IGNORE NULLS)
           OVER (PARTITION BY anchor
                 ORDER BY array_to_string(cont, ' '), side, doc_id, pos
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS abv,
         first_value(CASE WHEN side = 0 THEN cont END IGNORE NULLS)
           OVER (PARTITION BY anchor
                 ORDER BY array_to_string(cont, ' '), side, doc_id, pos
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS blw
  FROM suf),
hits AS (
  SELECT doc_id,
         {_DEC_K} + GREATEST({_lcp_sql("abv")}, {_lcp_sql("blw")}) AS olen
  FROM b
  WHERE side = 1 AND (abv IS NOT NULL OR blw IS NOT NULL)),
per_doc AS (
  SELECT doc_id, CAST(MAX(olen) AS BIGINT) AS max_overlap_len,
         CAST(COUNT(*) AS BIGINT) AS n_overlap_suffixes
  FROM hits GROUP BY doc_id)
SELECT toks.doc_id, CAST(len(toks.t) AS BIGINT) AS n_tokens,
       COALESCE(per_doc.max_overlap_len, 0) AS max_overlap_len,
       COALESCE(per_doc.n_overlap_suffixes, 0) AS n_overlap_suffixes,
       CAST(CASE WHEN COALESCE(per_doc.max_overlap_len, 0) >= {_DEC_MIN}
                 THEN 1 ELSE 0 END AS INT) AS contaminated
FROM toks LEFT JOIN per_doc ON toks.doc_id = per_doc.doc_id
WHERE toks.side = 1
ORDER BY toks.doc_id"""


@register("x274_exact_substring_decontamination", _X274_SQL)
def x274(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    corpus = docs.where(F.col("doc_id") % 17 != 0)
    eval_df = docs.where(F.col("doc_id") % 17 == 0)
    return textops.exact_substring_decontamination(
        corpus,
        eval_df,
        "text",
        "doc_id",
        anchor_len=_DEC_K,
        ext_cap=_DEC_C,
        min_len=_DEC_MIN,
    ).orderBy("doc_id")


# --------------------------------------------------------------------------
# x275 — token-STREAM packing audit (GPT-style concat-and-chunk): docs
# concatenate in doc_id order into one token stream cut into fixed
# 256-token sequences, docs splitting across boundaries; per sequence,
# how many docs touch / start / end there and the token fill — the
# boundary-crossing numbers behind attention-mask and contamination-
# bleed analyses, complementary to x63's first-fit shard packing
# (which never splits a doc).  All-BIGINT arithmetic; the Spark side's
# stream offset is the range-partitioned global_cumsum, the oracle's a
# plain window cumsum.  FULL DuckDB twin oracle.
_PACK_L = 256

_X275_SQL = f"""
WITH t AS (
  SELECT doc_id,
         CAST(len(string_split_regex(lower(trim(text)), '\\s+')) AS BIGINT)
             AS n
  FROM documents WHERE text IS NOT NULL),
o AS (
  SELECT doc_id, n,
         CAST(SUM(n) OVER (ORDER BY doc_id) - n AS BIGINT) AS s,
         CAST(SUM(n) OVER (ORDER BY doc_id) AS BIGINT) AS e
  FROM t),
spans AS (
  SELECT doc_id, s, e,
         unnest(generate_series(s // {_PACK_L}, (e - 1) // {_PACK_L})) AS seq
  FROM o)
SELECT CAST(seq AS BIGINT) AS seq,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s // {_PACK_L} = seq THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_started,
       CAST(SUM(CASE WHEN (e - 1) // {_PACK_L} = seq THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_ended,
       CAST(SUM(LEAST(e, (seq + 1) * {_PACK_L})
                - GREATEST(s, seq * {_PACK_L})) AS BIGINT) AS tokens_filled
FROM spans GROUP BY seq ORDER BY seq"""


@register("x275_token_stream_packing", _X275_SQL)
def x275(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.token_stream_packing_audit(
        docs, "text", "doc_id", seq_len=_PACK_L
    ).orderBy("seq")


# --------------------------------------------------------------------------
# x276 — k-core of the part co-occurrence graph (x164's edge set): the
# density screen bounding clique/community membership.  k adapts to
# the graph (k = floor(1.4 * E / V), exact integer arithmetic both
# engines) so peeling is non-trivial at every scale of a near-regular
# co-purchase graph.  The Spark side peels to FIXPOINT (raising past
# 40 rounds); the oracle unrolls 16 peeling stages — stages after the
# fixpoint are no-ops, and 16 >> the measured 5-round collapse at the
# gate scale, so the two agree exactly whenever the Spark run
# converged (which it certifies by not raising).  A convergence
# SENTINEL (chk CTE) makes the unroll self-certifying: if stage 15 !=
# stage 16 and stage 16 is non-empty, the oracle raises a named
# DuckDB error('did not converge') instead of silently returning a
# superset — so an oracle-side stage-budget miss at a larger scale is
# distinguishable from a real Spark divergence (r10 ADVICE item).
_KCORE_STAGES = 16


def _kcore_sql(stages: int) -> str:
    cte = [
        """e0 AS MATERIALIZED (SELECT DISTINCT a.l_partkey AS a, b.l_partkey AS b
        FROM lineitem a JOIN lineitem b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)""",
        """kv AS (SELECT CAST((14 * (SELECT COUNT(*) FROM e0))
                   // (10 * (SELECT COUNT(DISTINCT node) FROM
                        (SELECT a AS node FROM e0
                         UNION ALL SELECT b FROM e0)))
                   AS BIGINT) AS k)""",
        "c0 AS MATERIALIZED (SELECT a, b FROM e0)",
    ]
    for i in range(1, stages + 1):
        cte.append(
            f"""d{i} AS MATERIALIZED (SELECT node, COUNT(*) AS d FROM
          (SELECT a AS node FROM c{i - 1}
           UNION ALL SELECT b FROM c{i - 1}) GROUP BY node)"""
        )
        cte.append(
            f"""c{i} AS MATERIALIZED (SELECT c{i - 1}.a, c{i - 1}.b
          FROM c{i - 1}
          JOIN d{i} da ON da.node = c{i - 1}.a
          JOIN d{i} db ON db.node = c{i - 1}.b, kv
          WHERE da.d >= kv.k AND db.d >= kv.k)"""
        )
    return (
        "WITH "
        + ",\n".join(cte)
        + f""",
fin AS (SELECT node, COUNT(*) AS d FROM
          (SELECT a AS node FROM c{stages}
           UNION ALL SELECT b FROM c{stages}) GROUP BY node),
chk AS (SELECT CASE WHEN
          (SELECT COUNT(*) FROM c{stages - 1})
            = (SELECT COUNT(*) FROM c{stages})
          OR (SELECT COUNT(*) FROM c{stages}) = 0
        THEN 1 ELSE error('x276 oracle: {stages} unrolled peeling '
                          'stages did not converge - raise '
                          '_KCORE_STAGES for this scale') END AS ok)
SELECT CAST(node AS BIGINT) AS node,
       CAST(d AS BIGINT) AS core_degree,
       (SELECT k FROM kv) AS k_used
FROM fin, chk WHERE chk.ok = 1 ORDER BY node"""
    )


@register("x276_kcore_parts", _kcore_sql(_KCORE_STAGES))
def x276(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import graph

    li = load_table(spark, sf, "lineitem").select("l_orderkey", "l_partkey")
    # Per-order pairs via the basket-bounded HOF builder (r11) — one
    # groupBy exchange instead of distinct + keyed self-join.
    edges = graph.co_occurrence_pairs(li, "l_orderkey", "l_partkey")
    # SIMPLE graph: two parts sharing several orders still form ONE
    # edge (kcore's degree contract, and the oracle's SELECT DISTINCT).
    # The pair build + distinct is the dominant fixed cost, so pin it
    # ONCE (eager localCheckpoint) — the k computation and every
    # peeling round then read the materialized blocks instead of
    # rebuilding the pair fan-out (3x at sf0.1 before this pin).  The
    # explicit repartition pins the distinct's reduce parallelism (AQE
    # would coalesce the narrow pair frame to 1-2 tasks).
    spread = max(spark.sparkContext.defaultParallelism, 16)
    edges = edges.repartition(spread, "src", "dst").distinct().localCheckpoint()
    # adaptive k from exact counts: one pass over the pinned edge
    # frame for E and V
    ev = (
        edges.select(F.col("src").alias("node"))
        .unionAll(edges.select(F.col("dst").alias("node")))
        .agg(
            (F.count(F.lit(1)) / 2).cast("bigint").alias("e"),
            F.countDistinct("node").alias("v"),
        )
        .first()
    )
    k = int((14 * ev["e"]) // (10 * ev["v"]))
    core = graph.kcore(edges, k)
    return core.select(
        "node", "core_degree", F.lit(k).cast("bigint").alias("k_used")
    ).orderBy("node")


# --------------------------------------------------------------------------
# x277 — REAL audio feature extraction audit (multimodal, one step
# past the codec roundtrips): planted pure-sine WAVs (integer DFT
# periods, zero leakage) per doc_id go through encode -> RIFF chunk
# walk -> PCM unpack -> Goertzel tone detection; every reported column
# is integer-exact from the id arithmetic (amp classes measured once
# at build time: int16 quantization moves RMS by < 1 against a >200
# margin), so a hash match certifies the whole DSP chain on every row.
_AUDIO_SQL = """
SELECT doc_id AS media_id,
       CAST(8000 AS INT) AS sample_rate,
       CAST(160 AS INT) AS n_frames,
       CAST(3 + doc_id % 10 AS INT) AS dominant_bin,
       CAST(CASE doc_id % 5 WHEN 0 THEN 5 WHEN 1 THEN 6 WHEN 2 THEN 7
                            WHEN 3 THEN 7 ELSE 8 END AS INT) AS amp_class
FROM documents ORDER BY media_id"""


@register("x277_audio_tone_audit", _AUDIO_SQL)
def x277(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    return multimodal.audio_tone_audit(docs, "doc_id")


# --------------------------------------------------------------------------
# x278 — SemDeDup (Abbas et al. 2023, arXiv:2303.09540): cluster-scoped
# semantic dedup, the published web-scale recipe.  Planted fixture (the
# x72 construction): three L2-separable clusters (centers 200·e1/e2/e3,
# dim 6) whose members spread ±70 along e4..e6 — intra-cluster cosines
# ≈ 0.78 stay far BELOW the 0.99 threshold, while planted exact copies
# sit at cosine 1.0 far above it, so any correct k=3 Lloyd solve +
# within-cluster linking recovers exactly the planted groups; every pin
# is a SQL literal.  The corpus row runs the full pipeline on the real
# embeddings at a size-adaptive cluster count (SemDeDup's fixed
# ~100-row cluster budget, so Σ|cluster|² stays corpus-linear) and is
# measured ON the is_kept output column (kept + dropped), forcing
# end-to-end execution; its value is SQL-derivable as COUNT(*).
_X278_SQL = """
WITH corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM embeddings)
SELECT 'corpus_rows' AS key, v AS value FROM corpus
UNION ALL SELECT 'fx_group_size:0', CAST(3 AS DOUBLE)
UNION ALL SELECT 'fx_group_size:10', CAST(2 AS DOUBLE)
UNION ALL SELECT 'fx_kept_total', CAST(20 AS DOUBLE)
UNION ALL SELECT 'fx_dropped_total', CAST(3 AS DOUBLE)
ORDER BY key"""


@register("x278_semdedup", _X278_SQL)
def x278(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    # fixture: 23 points, dim 6; clusters at 200*e1 / 200*e2 / 200*e3
    def pt(axis: int, off_axis: int, off: float) -> list:
        v = [0.0] * 6
        v[axis] = 200.0
        v[off_axis] = off
        return v

    rows = []
    spread = [(3, 70.0), (4, 70.0), (5, 70.0), (3, -70.0), (4, -70.0),
              (5, -70.0), (3, 35.0), (4, 35.0)]
    for i, (ax, off) in enumerate(spread):            # cluster 1: ids 0..7
        rows.append((i, pt(0, ax, off)))
    rows += [(8, pt(0, 3, 70.0)), (9, pt(0, 3, 70.0))]  # copies of id 0
    for i, (ax, off) in enumerate(spread[:6]):        # cluster 2: ids 10..15
        rows.append((10 + i, pt(1, ax, off)))
    rows.append((16, pt(1, 3, 70.0)))                 # copy of id 10
    for i, (ax, off) in enumerate(spread[:6]):        # cluster 3: ids 20..25
        rows.append((20 + i, pt(2, ax, off)))
    fix = local_rows(spark, rows, "vec_id bigint, embedding array<double>")
    fx = similarity.semdedup(
        fix, "embedding", "vec_id", n_lists=3, threshold=0.99,
        fit_sample_rows=None, max_iter=20, init_mode="k-means||",
    )
    g0 = fx.where(F.col("group_id") == 0).agg(
        F.lit("fx_group_size:0").alias("key"),
        F.count(F.lit(1)).cast("double").alias("value"),
    )
    g10 = fx.where(F.col("group_id") == 10).agg(
        F.lit("fx_group_size:10").alias("key"),
        F.count(F.lit(1)).cast("double").alias("value"),
    )
    totals = fx.agg(
        F.sum("is_kept").cast("double").alias("kept"),
        F.sum(1 - F.col("is_kept")).cast("double").alias("dropped"),
    )
    kept = totals.select(
        F.lit("fx_kept_total").alias("key"), F.col("kept").alias("value")
    )
    dropped = totals.select(
        F.lit("fx_dropped_total").alias("key"), F.col("dropped").alias("value")
    )
    # corpus execution-forcing row: size-adaptive cluster count (~100
    # rows per cluster), measured on the output column
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    # audit profile: 5 Lloyd iterations — the execution-forcing count
    # row needs a real coarse partition, not a converged one
    out = similarity.semdedup(
        emb, "embedding", "vec_id",
        n_lists=max(8, n // 100), threshold=0.95, seed=42, max_iter=5,
    )
    corpus = out.agg(
        F.lit("corpus_rows").alias("key"),
        (F.sum("is_kept") + F.sum(1 - F.col("is_kept")))
        .cast("double")
        .alias("value"),
    )
    return (
        g0.unionByName(g10)
        .unionByName(kept)
        .unionByName(dropped)
        .unionByName(corpus)
        .orderBy("key")
    )


# --------------------------------------------------------------------------
# x279 — paletted + Adam7 PNG roundtrip audit: the two PNG variants the
# r9 codec documented out, now REAL (PLTE/tRNS expansion, per-pass
# Adam7 unfilter + scatter).  Integer pins only; palette components
# are shared id-arithmetic between the Python builder and the oracle.
def _x279_sql() -> str:
    comps = [
        ("doc_id % 256", "(doc_id * 3) % 256", "(doc_id * 7) % 256"),
        ("(doc_id * 11 + 1) % 256", "(doc_id * 13 + 5) % 256",
         "(doc_id * 17 + 9) % 256"),
        ("(doc_id * 19 + 2) % 256", "(doc_id * 23 + 6) % 256",
         "(doc_id * 29 + 10) % 256"),
        ("(doc_id * 31 + 3) % 256", "(doc_id * 37 + 7) % 256",
         "(doc_id * 41 + 11) % 256"),
    ]

    def luma(sel: str) -> str:
        branches = " ".join(
            f"WHEN {k} THEN (({r}) * 299 + ({g}) * 587 + ({b}) * 114) // 1000"
            for k, (r, g, b) in enumerate(comps)
        )
        return f"(CASE {sel} {branches} END)"

    alpha = (
        "(CASE doc_id % 4 WHEN 0 THEN 200 WHEN 1 THEN 150"
        " WHEN 2 THEN 100 ELSE 50 END)"
    )
    return f"""
SELECT doc_id AS media_id,
       CAST(5 + doc_id % 4 AS INT) AS width,
       CAST(4 + 2 * (doc_id % 2) AS INT) AS height,
       CAST({luma("doc_id % 4")} AS INT) AS luma_top,
       CAST({luma("(doc_id + 1) % 4")} AS INT) AS luma_bot,
       CAST({alpha} AS INT) AS alpha_top
FROM documents ORDER BY media_id"""


@register("x279_png_palette_audit", _x279_sql())
def x279(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    return multimodal.png_palette_audit(docs, "doc_id")


# --------------------------------------------------------------------------
# x280 — progressive-JPEG roundtrip audit: x271's lossy-safe two-tone
# pins through the SOF2 spectral-selection pipeline (multi-scan
# coefficient accumulation, per-scan DHTs, EOBn runs; band split
# varies by id).  Same oracle arithmetic as x271 — JPEG's pins are a
# property of the construction, not the scan order.
_PROG_SQL = """
SELECT doc_id AS media_id,
       CAST(8 + doc_id % 9 AS INT) AS width,
       CAST(4 + 2 * (doc_id % 3) AS INT) AS height,
       CASE WHEN doc_id % 4 >= 2 THEN '00000000ffffffff'
            ELSE 'ffffffff00000000' END AS phash
FROM documents ORDER BY media_id"""


@register("x280_jpeg_progressive_audit", _PROG_SQL)
def x280(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    return multimodal.jpeg_progressive_audit(docs, "doc_id")


# --------------------------------------------------------------------------
# x281 — CCNet head/middle/tail quality split (Wenzek et al. 2020):
# per language, documents ranked by the corpus-unigram LM score
# (x179's avg_logp, already round-6-stable cross-engine) and cut into
# three NTILE tiles; per (lang, tile) the doc/token mass and mean
# score.  Ranking uses the ROUNDED score + id tiebreak so the tile
# boundary is engine-exact.
_CCNET_SQL = """
WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
                    '\\s+')) AS token
             FROM documents WHERE text IS NOT NULL),
     c AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS n_w
           FROM tok GROUP BY token),
     tot AS (SELECT SUM(n_w) AS total FROM c),
     p AS (SELECT t.doc_id, COUNT(*) AS n_tokens,
                  ROUND(AVG(ln(c.n_w)) - ln(tot.total), 6) AS avg_logp
           FROM tok t JOIN c USING (token) CROSS JOIN tot
           GROUP BY t.doc_id, tot.total),
     tiled AS (SELECT d.lang, p.n_tokens, p.avg_logp,
                      NTILE(3) OVER (PARTITION BY d.lang
                                     ORDER BY p.avg_logp DESC, p.doc_id)
                          AS bucket
               FROM p JOIN documents d ON d.doc_id = p.doc_id)
SELECT lang, CAST(bucket AS INT) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       ROUND(AVG(avg_logp), 6) AS mean_logp
FROM tiled GROUP BY lang, bucket
ORDER BY lang, bucket"""


@register("x281_ccnet_buckets", _CCNET_SQL)
def x281(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents").select("doc_id", "text", "lang")
    return textops.ccnet_perplexity_buckets(
        docs, "text", "doc_id", "lang", n_buckets=3
    )


# --------------------------------------------------------------------------
# x282 — D4 prototype pruning (Tirumala et al. 2023 / Sorscher SSL
# prototypes): drop each cluster's most-centroid-proximal fraction.
# Planted fixture: two separable clusters whose ZERO-SUM offsets make
# the fitted centroid exactly the planted center, so every distance —
# and therefore the (rounded-dist, id) prototype ranking and the
# floor(drop_frac*n) cut — is closed-form: cluster A offsets ±10/±20/
# ±30 drops exactly ids {0,1}; cluster B offsets {0,+4,-4} drops id
# 10.  Corpus row: the full pipeline on the real embeddings at the
# ~100-row cluster budget, measured on the is_kept output column.
_X282_SQL = """
WITH corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM embeddings)
SELECT 'corpus_rows' AS key, v AS value FROM corpus
UNION ALL SELECT 'fx_dropped_total', CAST(3 AS DOUBLE)
UNION ALL SELECT 'fx_dropped_sum_ids', CAST(11 AS DOUBLE)
UNION ALL SELECT 'fx_kept_total', CAST(6 AS DOUBLE)
ORDER BY key"""


@register("x282_prototype_prune", _X282_SQL)
def x282(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    rows = []
    for i, off in enumerate([10.0, -10.0, 20.0, -20.0, 30.0, -30.0]):
        rows.append((i, [200.0, 0.0, off, 0.0]))
    for j, off in enumerate([0.0, 4.0, -4.0]):
        rows.append((10 + j, [0.0, 200.0, 0.0, off]))
    fix = local_rows(spark, rows, "vec_id bigint, embedding array<double>")
    fx = similarity.prototype_prune(
        fix, "embedding", "vec_id", n_lists=2, drop_frac=1.0 / 3.0,
        fit_sample_rows=None, max_iter=20, init_mode="k-means||",
    )
    dropped = fx.where(F.col("is_kept") == 0).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum("vec_id").cast("double").alias("s"),
    )
    d_total = dropped.select(
        F.lit("fx_dropped_total").alias("key"), F.col("n").alias("value")
    )
    d_ids = dropped.select(
        F.lit("fx_dropped_sum_ids").alias("key"), F.col("s").alias("value")
    )
    kept = fx.agg(
        F.lit("fx_kept_total").alias("key"),
        F.sum("is_kept").cast("double").alias("value"),
    )
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    out = similarity.prototype_prune(
        emb, "embedding", "vec_id", n_lists=max(8, n // 100), drop_frac=0.2,
        seed=42, max_iter=5,
    )
    corpus = out.agg(
        F.lit("corpus_rows").alias("key"),
        (F.sum("is_kept") + F.sum(1 - F.col("is_kept")))
        .cast("double")
        .alias("value"),
    )
    return (
        d_total.unionByName(d_ids)
        .unionByName(kept)
        .unionByName(corpus)
        .orderBy("key")
    )


# --------------------------------------------------------------------------
# x283 — D4 END-TO-END (SemDeDup then prototype-prune, ONE shared fit;
# Tirumala et al. 2023): the planted fixture exercises BOTH stages
# against each other — cluster A holds a zero-sum wide-angle spread
# (ids 0..5) PLUS two exact copies of id 0 (ids 6,7).  The copies
# shift the fitted centroid by +17.5 along id 0's offset axis (mean
# of +70·3 over 8 members), so after dedup drops {6,7}, the prune
# ranking over the SURVIVORS is closed-form: id 0 sits nearest
# (|70-17.5| = 52.5), ids 2..5 tie at sqrt(17.5²+70²) ≈ 72.16 (cut by
# id → rank 2 = id 2), id 1 sits farthest (87.5) — floor(6/3) = 2
# drops exactly {0, 2}.  Cluster B (zero-sum {0, ±60}) drops id 10.
# Corpus row: the full two-stage pipeline on the real embeddings,
# measured on the stage output column.
_X283_SQL = """
WITH corpus AS (SELECT CAST(COUNT(*) AS DOUBLE) AS v FROM embeddings)
SELECT 'corpus_rows' AS key, v AS value FROM corpus
UNION ALL SELECT 'fx_dedup_dropped', CAST(2 AS DOUBLE)
UNION ALL SELECT 'fx_prune_dropped_sum_ids', CAST(12 AS DOUBLE)
UNION ALL SELECT 'fx_kept_sum_ids', CAST(36 AS DOUBLE)
ORDER BY key"""


@register("x283_d4_curation", _X283_SQL)
def x283(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    def pt(axis: int, off_ax: int, off: float) -> list:
        v = [0.0] * 8
        v[axis] = 200.0
        v[off_ax] = off
        return v

    rows = []
    offs = [(2, 70.0), (2, -70.0), (3, 70.0), (3, -70.0), (4, 70.0),
            (4, -70.0)]
    for i, (ax, off) in enumerate(offs):
        rows.append((i, pt(0, ax, off)))
    rows += [(6, pt(0, 2, 70.0)), (7, pt(0, 2, 70.0))]
    rows += [(10, pt(1, 5, 0.0)), (11, pt(1, 5, 60.0)),
             (12, pt(1, 5, -60.0))]
    fix = local_rows(spark, rows, "vec_id bigint, embedding array<double>")
    fx = similarity.d4_curation(
        fix, "embedding", "vec_id", n_lists=2, dedup_threshold=0.99,
        drop_frac=1.0 / 3.0, fit_sample_rows=None, max_iter=20,
        init_mode="k-means||",
    )
    dd = fx.where(F.col("stage") == "dedup_dropped").agg(
        F.lit("fx_dedup_dropped").alias("key"),
        F.count(F.lit(1)).cast("double").alias("value"),
    )
    pd_ = fx.where(F.col("stage") == "prune_dropped").agg(
        F.lit("fx_prune_dropped_sum_ids").alias("key"),
        F.sum("vec_id").cast("double").alias("value"),
    )
    kp = fx.where(F.col("stage") == "kept").agg(
        F.lit("fx_kept_sum_ids").alias("key"),
        F.sum("vec_id").cast("double").alias("value"),
    )
    emb = load_table(spark, sf, "embeddings")
    n = emb.count()
    out = similarity.d4_curation(
        emb, "embedding", "vec_id", n_lists=max(8, n // 100),
        dedup_threshold=0.95, drop_frac=0.2, seed=42, max_iter=5,
    )
    corpus = out.agg(
        F.lit("corpus_rows").alias("key"),
        F.count("stage").cast("double").alias("value"),
    )
    return dd.unionByName(pd_).unionByName(kp).unionByName(corpus).orderBy(
        "key"
    )


# --------------------------------------------------------------------------
# x284 — curriculum packing audit: the token stream ordered
# best-quality-first (x179's round-6 unigram-LM score DESC, id
# tiebreak — engine-exact order key) and cut into 256-token
# sequences; per sequence the boundary stats plus the min/max member
# score envelope (never a float sum).  FULL DuckDB twin.
_X284_SQL = f"""
WITH tok AS (SELECT doc_id, unnest(string_split_regex(lower(trim(text)),
                    '\\s+')) AS token
             FROM documents WHERE text IS NOT NULL),
     c AS (SELECT token, CAST(COUNT(*) AS DOUBLE) AS n_w
           FROM tok GROUP BY token),
     tot AS (SELECT SUM(n_w) AS total FROM c),
     p AS (SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n,
                  ROUND(AVG(ln(c.n_w)) - ln(tot.total), 6) AS q
           FROM tok t JOIN c USING (token) CROSS JOIN tot
           GROUP BY t.doc_id, tot.total),
     o AS (SELECT doc_id, n, q,
                  CAST(SUM(n) OVER w - n AS BIGINT) AS s,
                  CAST(SUM(n) OVER w AS BIGINT) AS e
           FROM p WINDOW w AS (ORDER BY q DESC, doc_id)),
     spans AS (SELECT doc_id, q, s, e,
                      unnest(generate_series(s // {_PACK_L},
                                             (e - 1) // {_PACK_L})) AS seq
               FROM o)
SELECT CAST(seq AS BIGINT) AS seq,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN s // {_PACK_L} = seq THEN 1 ELSE 0 END) AS BIGINT)
           AS n_docs_started,
       CAST(SUM(CASE WHEN (e - 1) // {_PACK_L} = seq THEN 1 ELSE 0 END)
            AS BIGINT) AS n_docs_ended,
       CAST(SUM(LEAST(e, (seq + 1) * {_PACK_L})
                - GREATEST(s, seq * {_PACK_L})) AS BIGINT) AS tokens_filled,
       MAX(q) AS q_hi, MIN(q) AS q_lo
FROM spans GROUP BY seq ORDER BY seq"""


@register("x284_curriculum_packing", _X284_SQL)
def x284(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents").select("doc_id", "text")
    return textops.curriculum_packing_audit(
        docs, "text", "doc_id", seq_len=_PACK_L
    ).orderBy("seq")
