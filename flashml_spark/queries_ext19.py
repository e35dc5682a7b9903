"""Extension queries x255+ — round-9 additions.

Corpus-OPERATIONS operators: the artifacts a production training-data
pipeline publishes around its corpus — a real PNG decode audit over the
new pure-struct codec (x255), temperature-scaled mixture weights
(x256), an order-free shard checksum manifest (x257), a RAG chunk-plan
audit (x258), a product-quantization codebook balance/distortion
readout (x259), a MAD-robust outlier screen (x260), semi-hard negative
mining off the dedup index (x261), and a per-source dedup survivorship
report (x262).  Oracle discipline unchanged: exact integer/decimal
accumulation before any float, correctly-rounded primitives (sqrt, not
pow) where the default parameterization allows, one written operation
order in both engines, Python-computed shared literals.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table

_TOK = "string_split_regex(lower(trim(text)), '\\s+')"


# --------------------------------------------------------------------------
# x255 — REAL PNG encode→decode roundtrip audit over the whole corpus
# (multimodal.png_roundtrip_audit): per doc_id, a two-tone id-derived
# image is deflate-encoded (scanline filter cycling through all five
# types with id % 5) and decoded back through the same pure-struct path
# decode_media(fake=False) uses.  The oracle derives dims from the
# generation arithmetic and the aHash from the two halves' luma order —
# a hash match certifies the zlib→unfilter→luma→aHash chain bit-exactly
# on every row (the planted-fixture pattern with the corpus as fixture).
_PNG_SQL = """
WITH p AS (SELECT doc_id,
                  8 + doc_id % 9 AS w,
                  4 + 2 * (doc_id % 3) AS h,
                  (((doc_id * 37) % 256) * 299 + ((doc_id * 59) % 256) * 587
                   + ((doc_id * 83) % 256) * 114) // 1000 AS lt,
                  (((doc_id * 41 + 7) % 256) * 299
                   + ((doc_id * 61 + 13) % 256) * 587
                   + ((doc_id * 89 + 29) % 256) * 114) // 1000 AS lb
           FROM documents)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CASE WHEN lt = lb THEN 'ffffffffffffffff'
            WHEN lt > lb THEN '00000000ffffffff'
            ELSE 'ffffffff00000000' END AS phash
FROM p ORDER BY media_id"""


@register("x255_png_roundtrip_audit", _PNG_SQL)
def x255(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    return multimodal.png_roundtrip_audit(docs, "doc_id")


# --------------------------------------------------------------------------
# x256 — temperature-scaled source mixture (alpha = 0.5, i.e. T = 2,
# the XLM-style multilingual sampling rule): p_s ∝ sqrt(n_s) and the
# implied effective epochs per source at a half-budget schedule.  sqrt
# is correctly-rounded IEEE (unlike pow), the scaled masses quantize to
# DECIMAL(18,6) so their total is an order-free exact sum, and the
# final divisions share one written operation order.
_TEMP_SQL = f"""
WITH tok AS (SELECT source, CAST(len({_TOK}) AS BIGINT) AS t FROM documents),
     per AS (SELECT source, CAST(SUM(t) AS BIGINT) AS n_tokens
             FROM tok GROUP BY source),
     sc AS (SELECT source, n_tokens,
                   CAST(ROUND(sqrt(CAST(n_tokens AS DOUBLE)), 6)
                        AS DECIMAL(18,6)) AS s
            FROM per),
     tot AS (SELECT CAST(SUM(s) AS DECIMAL(38,6)) AS ssum,
                    CAST(SUM(n_tokens) AS DOUBLE) AS ntot
             FROM sc)
SELECT source, n_tokens,
       ROUND(CAST(s AS DOUBLE) / CAST(ssum AS DOUBLE), 6) AS weight,
       ROUND(0.5 * ntot * (CAST(s AS DOUBLE) / CAST(ssum AS DOUBLE))
             / CAST(n_tokens AS DOUBLE), 6) AS eff_epochs
FROM sc CROSS JOIN tot ORDER BY source"""


@register("x256_temperature_mixture", _TEMP_SQL)
def x256(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import sampling, textops

    docs = textops.with_token_count(
        load_table(spark, sf, "documents"), "text"
    )
    return sampling.temperature_mixture_weights(
        docs, "source", "n_tokens", alpha=0.5, budget_frac=0.5
    )


# --------------------------------------------------------------------------
# x257 — order-free shard checksum manifest: per shard (doc_id % 8),
# row count, char mass, and a COMMUTATIVE content checksum
# (Σ md5-60-bit-prefix mod 2^61−1) — any single-row difference flips
# it, no per-shard sort/concat needed (the scale argument for not
# hashing an ordered string_agg).
_MANIFEST_SQL = """
SELECT CAST(doc_id % 8 AS BIGINT) AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars,
       CAST(SUM(CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || text),
                                     1, 15)) AS BIGINT))
            % 2305843009213693951 AS BIGINT) AS checksum
FROM documents GROUP BY 1 ORDER BY shard"""


@register("x257_shard_checksum_manifest", _MANIFEST_SQL)
def x257(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.shard_checksum_manifest(docs, "doc_id", "text", n_shards=8)


# --------------------------------------------------------------------------
# x258 — RAG chunk-plan audit: sliding 64-token windows at stride 48;
# per source, index size, overlap duplication fraction, single-chunk
# docs.  All-integer arithmetic (ceil boundaries are exact: integer
# quotients are exactly representable doubles), one ROUND(6) at the end.
_CHUNK_SQL = f"""
WITH tok AS (SELECT source, CAST(len({_TOK}) AS BIGINT) AS n FROM documents),
     per AS (SELECT source, n,
                    CASE WHEN n <= 64 THEN CAST(1 AS BIGINT)
                         ELSE CAST(ceil(CAST(n - 64 AS DOUBLE) / 48)
                                   AS BIGINT) + 1 END AS c
             FROM tok),
     ix AS (SELECT source, n, c,
                   CASE WHEN n <= 64 THEN n
                        ELSE (c - 1) * 64 + (n - (c - 1) * 48) END AS ixt
            FROM per)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(c) AS BIGINT) AS n_chunks,
       CAST(SUM(CASE WHEN n <= 64 THEN 1 ELSE 0 END) AS BIGINT)
           AS single_chunk_docs,
       CAST(SUM(ixt) AS BIGINT) AS indexed_tokens,
       CAST(SUM(n) AS BIGINT) AS raw_tokens,
       ROUND(CAST(SUM(ixt) - SUM(n) AS DOUBLE) / CAST(SUM(ixt) AS DOUBLE), 6)
           AS overlap_frac
FROM ix GROUP BY source ORDER BY source"""


@register("x258_rag_chunk_plan", _CHUNK_SQL)
def x258(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.rag_chunk_plan(
        docs, "text", "source", chunk_tokens=64, stride=48
    )


# --------------------------------------------------------------------------
# x259 — product-quantization codebook audit: 64-dim embeddings split
# into 4×16-dim subspaces, each assigned to the nearest of 4 literal
# centroids (distances expanded dot(x,x) − 2·dot(x,c) + dot(c,c) in the
# SAME written order both engines, ROUNDED before the argmin so the
# code choice can't flip on an ulp; lowest-code tie-break).
def _x259_sql() -> str:
    from flashml_spark.operators.similarity import pq_codebook

    book = pq_codebook(64, 4, 4)
    sub = 16
    pieces = []
    for m in range(4):
        lo, hi = m * sub + 1, (m + 1) * sub
        xm = f"x[{lo}:{hi}]"
        dists = []
        for k in range(4):
            c = book[m][k]
            carr = "[" + ", ".join(f"CAST({v} AS DOUBLE)" for v in c) + "]"
            cc = float(sum(v * v for v in c))
            dists.append(
                f"ROUND(list_dot_product({xm}, {xm})"
                f" - 2.0 * list_dot_product({xm}, {carr}) + {cc!r}, 6)"
            )
        d = dists
        code = (
            f"CASE WHEN {d[0]} <= {d[1]} AND {d[0]} <= {d[2]}"
            f" AND {d[0]} <= {d[3]} THEN 0"
            f" WHEN {d[1]} <= {d[2]} AND {d[1]} <= {d[3]} THEN 1"
            f" WHEN {d[2]} <= {d[3]} THEN 2 ELSE 3 END"
        )
        err = f"least({d[0]}, {d[1]}, {d[2]}, {d[3]})"
        pieces.append(
            f"SELECT {m} AS subspace, {code} AS code,"
            f" CAST({err} AS DECIMAL(18,6)) AS err FROM v"
        )
    union = "\nUNION ALL\n".join(pieces)
    return f"""
WITH v AS (SELECT CAST(embedding AS DOUBLE[]) AS x FROM embeddings),
     e AS ({union})
SELECT subspace, code, COUNT(*) AS n_vecs,
       ROUND(CAST(SUM(err) AS DOUBLE) / COUNT(*), 6) AS mean_err
FROM e GROUP BY subspace, code ORDER BY subspace, code"""


@register("x259_pq_codebook_audit", _x259_sql())
def x259(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings")
    return similarity.pq_codebook_audit(emb, "embedding", subspaces=4, codes=4)


# --------------------------------------------------------------------------
# x260 — MAD-robust outlier screen on n_chars per language: median/MAD
# instead of mean/stddev so the screen isn't dragged by what it hunts.
# Integer inputs ⇒ interpolated percentiles land on the exact 0.5/0.25
# grids — no rounding step anywhere.
_MAD_SQL = """
WITH med AS (SELECT lang, quantile_cont(n_chars, 0.5) AS med
             FROM documents GROUP BY lang),
     dev AS (SELECT d.lang,
                    abs(CAST(n_chars AS DOUBLE) - med.med) AS dv, med.med
             FROM documents d JOIN med ON d.lang = med.lang),
     mad AS (SELECT lang, quantile_cont(dv, 0.5) AS mad
             FROM dev GROUP BY lang)
SELECT dev.lang, COUNT(*) AS n_rows, MIN(dev.med) AS med, MIN(mad.mad) AS mad,
       CAST(SUM(CASE WHEN dv > 3.0 * mad.mad THEN 1 ELSE 0 END) AS BIGINT)
           AS n_outliers
FROM dev JOIN mad ON dev.lang = mad.lang
GROUP BY dev.lang ORDER BY dev.lang"""


@register("x260_mad_outlier_screen", _MAD_SQL)
def x260(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.mad_outlier_screen(docs, "lang", "n_chars", k=3.0)


# --------------------------------------------------------------------------
# x261 — semi-hard negative mining off the dedup index: LSH candidate
# pairs (x16's exact banding) whose signatures agree on 2..5 of 8
# components — informative contrastive negatives below the near-dup
# range.  The oracle mirrors hashing.py's minhash spec verbatim
# (hash i = 8-hex slice i%4 of md5('<i//4>:' || shingle), same as
# queries_ext2._mh_band_oracle).
def _x261_sql(lo: int = 2, hi: int = 5) -> str:
    def comp(i: int) -> str:
        block, slot = i // 4, i % 4
        return (
            f"list_min(list_transform(shs,"
            f" s -> substr(md5('{block}:' || s), {slot * 8 + 1}, 8))) AS sig{i}"
        )

    comps = ",\n                ".join(comp(i) for i in range(8))
    bands = ", ".join(
        f"'{b}|' || sig{2 * b} || '|' || sig{2 * b + 1}" for b in range(4)
    )
    agree = " + ".join(
        f"CASE WHEN sa.sig{i} = sb.sig{i} THEN 1 ELSE 0 END" for i in range(8)
    )
    return f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
       sh AS (SELECT doc_id,
                     list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]) AS shs
              FROM tok),
       sig AS (SELECT doc_id,
                {comps}
               FROM sh),
       bnd AS (SELECT doc_id, unnest([{bands}]) AS band_key FROM sig),
       cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
                FROM bnd a JOIN bnd b USING (band_key)
                WHERE a.doc_id < b.doc_id),
       ag AS (SELECT ({agree}) AS k_agree
              FROM cand
              JOIN sig sa ON sa.doc_id = cand.id_a
              JOIN sig sb ON sb.doc_id = cand.id_b)
SELECT k_agree, COUNT(*) AS n_pairs FROM ag
WHERE k_agree BETWEEN {lo} AND {hi}
GROUP BY k_agree ORDER BY k_agree"""


@register("x261_semihard_negatives", _x261_sql())
def x261(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    docs = load_table(spark, sf, "documents")
    return dedup.semihard_negative_pairs(
        docs, "text", "doc_id", num_hashes=8, bands=4, shingle_n=2,
        lo=2, hi=5,
    )


# --------------------------------------------------------------------------
# x262 — per-source dedup survivorship: the accounting published with a
# deduped corpus.  The oracle composes x16's band SQL with x35's
# recursive-reachability components (imported builders — ONE spec, no
# drift), then the per-source keep/remove/token arithmetic.
def _x262_sql() -> str:
    from flashml_spark.queries_ext2 import _mh_band_oracle

    return f"""WITH RECURSIVE pairs AS ({_mh_band_oracle()}),
       sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
       reach(id, lbl) AS (
         SELECT src, src FROM sym
         UNION
         SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id),
       removed AS (SELECT id FROM reach GROUP BY id
                   HAVING MIN(lbl) <> id),
       tok AS (SELECT doc_id, source, CAST(len({_TOK}) AS BIGINT) AS t
               FROM documents)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN removed.id IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_kept,
       CAST(SUM(CASE WHEN removed.id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
           AS n_removed,
       CAST(SUM(t) AS BIGINT) AS tokens_total,
       CAST(SUM(CASE WHEN removed.id IS NULL THEN t ELSE 0 END) AS BIGINT)
           AS tokens_kept,
       ROUND(CAST(SUM(CASE WHEN removed.id IS NULL THEN 0 ELSE 1 END)
                  AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS removed_frac
FROM tok LEFT JOIN removed ON tok.doc_id = removed.id
GROUP BY source ORDER BY source"""


@register("x262_dedup_survivorship", _x262_sql())
def x262(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    docs = load_table(spark, sf, "documents")
    return dedup.dedup_survivorship(
        docs, "text", "doc_id", "source", num_hashes=8, bands=4, shingle_n=2
    )


# --------------------------------------------------------------------------
# x263 — pairwise source vocabulary divergence: total variation on the
# global-top-20-token (+other) distributions.  TV instead of KL/JS so
# there are NO transcendentals — and the cross-multiplied integer form
# ``Σ|c_i·n_b − d_i·n_a| / (2·n_a·n_b)`` so there is no per-probability
# rounding either (ROUND(c/n, 6) hit a half-boundary ulp skew between
# engines at sf0.001); one final double division + ROUND(6).
_TV_SQL = f"""
WITH toks AS (SELECT source AS g, unnest({_TOK}) AS t FROM documents),
     vocab AS (SELECT t FROM toks GROUP BY t
               ORDER BY COUNT(*) DESC, t LIMIT 20),
     b AS (SELECT g, CASE WHEN t IN (SELECT t FROM vocab) THEN t
                          ELSE '__other__' END AS tok FROM toks),
     per AS (SELECT g, tok, COUNT(*) AS c FROM b GROUP BY g, tok),
     totals AS (SELECT g, COUNT(*) AS n FROM b GROUP BY g),
     grid AS (SELECT totals.g, totals.n, v.tok
              FROM totals CROSS JOIN (SELECT DISTINCT tok FROM b) v),
     cnts AS (SELECT grid.g, grid.tok, grid.n,
                     CAST(COALESCE(per.c, 0) AS BIGINT) AS c
              FROM grid LEFT JOIN per
                ON grid.g = per.g AND grid.tok = per.tok)
SELECT a.g AS src_a, b2.g AS src_b,
       ROUND(CAST(SUM(abs(CAST(a.c AS HUGEINT) * b2.n
                          - CAST(b2.c AS HUGEINT) * a.n)) AS DOUBLE)
             / CAST(2 * CAST(MIN(a.n) AS HUGEINT) * MIN(b2.n) AS DOUBLE), 6)
           AS tv_divergence
FROM cnts a JOIN cnts b2 ON a.tok = b2.tok AND a.g < b2.g
GROUP BY 1, 2 ORDER BY 1, 2"""


@register("x263_source_vocab_divergence", _TV_SQL)
def x263(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.source_vocab_divergence(docs, "text", "source", top_k=20)


# --------------------------------------------------------------------------
# x264 — duplicate-cluster size histogram: the dedup observability
# readout (a giant component = template artifact, not duplication).
# Oracle composes x16's band SQL + the recursive-reachability
# components (same builders as x35/x262).
def _x264_sql() -> str:
    from flashml_spark.queries_ext2 import _mh_band_oracle

    return f"""WITH RECURSIVE pairs AS ({_mh_band_oracle()}),
       sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
       reach(id, lbl) AS (
         SELECT src, src FROM sym
         UNION
         SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id),
       comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id),
       sizes AS (SELECT component, COUNT(*) AS cluster_size
                 FROM comp GROUP BY component)
SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       COUNT(*) AS n_clusters
FROM sizes WHERE cluster_size >= 2
GROUP BY 1 ORDER BY 1"""


@register("x264_neardup_cluster_histogram", _x264_sql())
def x264(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import dedup

    docs = load_table(spark, sf, "documents")
    return dedup.neardup_cluster_size_histogram(
        docs, "text", "doc_id", num_hashes=8, bands=4, shingle_n=2
    )


# --------------------------------------------------------------------------
# x265 — embedding isotropy audit: cosine is scale-invariant, so the
# centroid DIRECTION is the exact per-dim DECIMAL(28,12) sum vector —
# no float Σ, no division inside the plan; per-row cosines round to 6
# and accumulate as exact decimals.
_ISO_SQL = """
WITH x AS (SELECT CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
     e AS (SELECT unnest(v) AS val,
                  unnest(range(1, len(v) + 1)) AS pos
           FROM x),
     cent AS (SELECT pos, SUM(CAST(val AS DECIMAL(28,12))) AS c,
                     COUNT(*) AS n
              FROM e GROUP BY pos),
     carr AS (SELECT list(CAST(c AS DOUBLE) ORDER BY pos) AS cl,
                     MAX(n) AS n
              FROM cent),
     per AS (SELECT CAST(ROUND(sqrt(list_dot_product(v, v)), 6)
                         AS DECIMAL(18,6)) AS nrm,
                    CAST(ROUND(list_dot_product(v, cl)
                               / (sqrt(list_dot_product(v, v))
                                  * sqrt(list_dot_product(cl, cl))), 6)
                         AS DECIMAL(18,6)) AS cs,
                    cl, n
             FROM x CROSS JOIN carr)
SELECT COUNT(*) AS n_vecs,
       ROUND(CAST(SUM(nrm) AS DOUBLE) / COUNT(*), 6) AS mean_norm,
       ROUND(sqrt(list_dot_product(MIN(cl), MIN(cl))) / MIN(n), 6)
           AS centroid_norm,
       ROUND(CAST(SUM(cs) AS DOUBLE) / COUNT(*), 6) AS mean_cos_to_centroid
FROM per"""


@register("x265_embedding_isotropy", _ISO_SQL)
def x265(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import similarity

    emb = load_table(spark, sf, "embeddings")
    return similarity.embedding_isotropy_audit(emb, "embedding")


# --------------------------------------------------------------------------
# x266 — per-source lexical diversity: types, tokens, hapax legomena,
# TTR and hapax fraction.  All-integer counting, two ROUND(6).
_LEX_SQL = f"""
WITH toks AS (SELECT source AS g, unnest({_TOK}) AS t FROM documents),
     freq AS (SELECT g, t, COUNT(*) AS c FROM toks GROUP BY g, t),
     agg AS (SELECT g, CAST(SUM(c) AS BIGINT) AS n_tokens,
                    CAST(COUNT(*) AS BIGINT) AS n_types,
                    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                        AS n_hapax
             FROM freq GROUP BY g)
SELECT g AS source, n_tokens, n_types, n_hapax,
       ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
       ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6)
           AS hapax_frac
FROM agg ORDER BY source"""


@register("x266_lexical_diversity", _LEX_SQL)
def x266(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.lexical_diversity(docs, "text", "source")


# --------------------------------------------------------------------------
# x267 — inter-arrival burstiness per event type: CV of within-(type,
# user) gap distributions over exact µs integers; CV is unit-free, sqrt
# and divisions correctly rounded in one written order.
_BURST_SQL = """
WITH g AS (SELECT event_type AS t,
                  epoch_us(ts) - lag(epoch_us(ts)) OVER (
                      PARTITION BY event_type, user_id
                      ORDER BY ts, event_id) AS d
           FROM events),
     a AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(CAST(d AS HUGEINT)) AS sd,
                  SUM(CAST(d AS HUGEINT) * CAST(d AS HUGEINT)) AS sdd
           FROM g WHERE d IS NOT NULL GROUP BY t)
SELECT t AS event_type, n AS n_gaps,
       ROUND(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) / 1000000.0, 6)
           AS mean_gap_s,
       ROUND(sqrt(CAST(n * sdd - sd * sd AS DOUBLE)
                  / CAST(n * (n - 1) AS DOUBLE))
             / (CAST(sd AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS cv
FROM a WHERE n >= 2 AND sd > 0 ORDER BY event_type"""


@register("x267_interarrival_burstiness", _BURST_SQL)
def x267(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events

    ev = load_table(spark, sf, "events")
    return events.interarrival_burstiness(ev, "event_type", "user_id", "ts")


# --------------------------------------------------------------------------
# x268 — Bloom decontamination screen with MEASURED false positives:
# eval set = docs with doc_id % 97 = 0; their digests populate a
# 4096-bit / 3-hash Bloom filter that probes the whole corpus as a
# broadcast bitmap (64 literal longs).  The oracle derives the flagged
# set from the identical position-set semantics (all k md5-slice
# positions occupied) — membership is equal BY CONSTRUCTION, no bitmap
# mechanics in SQL — and the exact digest join splits flags into true
# contamination vs Bloom collisions.
def _x268_sql(bits: int = 4096, k: int = 3) -> str:
    probes = ", ".join(
        f"CAST(('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' || d), 1, 8))"
        f" AS BIGINT) % {bits}"
        for i in range(k)
    )
    return f"""
WITH ev AS (SELECT DISTINCT md5(text) AS d FROM documents
            WHERE doc_id % 97 = 0),
     pos AS (SELECT DISTINCT unnest([{probes}]) AS p FROM ev),
     tr AS (SELECT doc_id, md5(text) AS d FROM documents),
     tp AS (SELECT doc_id, d, unnest([{probes}]) AS p FROM tr),
     hits AS (SELECT tp.doc_id, MIN(tp.d) AS d,
                     COUNT(pos.p) AS hit
              FROM tp LEFT JOIN pos ON tp.p = pos.p
              GROUP BY tp.doc_id),
     probe AS (SELECT hits.doc_id,
                      CASE WHEN hit = {k} THEN 1 ELSE 0 END AS flagged,
                      CASE WHEN ev.d IS NULL THEN 0 ELSE 1 END AS is_true
               FROM hits LEFT JOIN ev ON hits.d = ev.d)
SELECT CAST(COUNT(*) AS BIGINT) AS n_train,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM ev) AS n_eval_digests,
       CAST(SUM(flagged) AS BIGINT) AS n_flagged,
       CAST(SUM(is_true) AS BIGINT) AS n_true,
       CAST(SUM(CASE WHEN flagged = 1 AND is_true = 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_false_pos,
       ROUND(CAST(SUM(CASE WHEN flagged = 1 AND is_true = 0
                           THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(SUM(CASE WHEN is_true = 0 THEN 1 ELSE 0 END) AS DOUBLE),
             6) AS fp_rate
FROM probe"""


@register("x268_bloom_decontamination", _x268_sql())
def x268(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    ev = docs.where(F.col("doc_id") % 97 == 0)
    return textops.bloom_decontamination_screen(
        docs, ev, "text", bits=4096, k=3
    )


# --------------------------------------------------------------------------
# x269 — constrained water-filling (floors + caps), the mixture policy
# production recipes actually ship.  Same exact-integer discipline as
# x250: floor_frac 0.02 → 20000 µ/token; cap·budget = 0.5·0.9 = 9/20 →
# cap_micro = (total·9·10^6) // 20; residual budget total·880000;
# cross-multiplied cap test; floor-division level; source tie-break.
_CWF_SQL = f"""
WITH tok AS (SELECT source, CAST(len({_TOK}) AS BIGINT) AS t FROM documents),
     per AS (SELECT source, CAST(SUM(t) AS BIGINT) AS avail
             FROM tok GROUP BY source),
     tot AS (SELECT CAST(SUM(avail) AS BIGINT) AS total,
                    CAST(COUNT(*) AS BIGINT) AS n
             FROM per),
     staged AS (SELECT source, avail, n,
                       avail * 20000 AS fl,
                       GREATEST(LEAST(avail * 1000000,
                                      (total * 9 * 1000000) // 20)
                                - avail * 20000, 0) AS resid,
                       total * 880000 AS rbudget
                FROM per CROSS JOIN tot),
     cum AS (SELECT *,
                    CAST(SUM(resid) OVER (ORDER BY resid, source
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS c,
                    CAST(ROW_NUMBER() OVER (ORDER BY resid, source)
                        AS BIGINT) AS i
             FROM staged),
     flagged AS (SELECT *,
                        CASE WHEN resid * (n - i + 1)
                                  <= rbudget - (c - resid)
                             THEN 1 ELSE 0 END AS at_bound
                 FROM cum),
     lvl AS (SELECT CASE WHEN MAX(n) > SUM(at_bound)
                         THEN CAST((MAX(rbudget)
                               - SUM(CASE WHEN at_bound = 1
                                          THEN resid ELSE 0 END))
                              // (MAX(n) - SUM(at_bound)) AS BIGINT)
                         ELSE CAST(0 AS BIGINT) END AS level
             FROM flagged)
SELECT source, avail AS avail_tokens,
       CAST(fl AS BIGINT) AS floor_micro_tokens,
       CAST(fl + CASE WHEN at_bound = 1 THEN resid
                      ELSE LEAST(level, resid) END AS BIGINT)
           AS alloc_micro_tokens,
       at_bound
FROM flagged CROSS JOIN lvl ORDER BY source"""


@register("x269_constrained_waterfill", _CWF_SQL)
def x269(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import sampling, textops

    docs = textops.with_token_count(
        load_table(spark, sf, "documents"), "text"
    )
    return sampling.constrained_waterfill_allocation(
        docs, "source", "n_tokens",
        budget_frac=0.9, floor_frac=0.02, cap_frac=0.5,
    )


# --------------------------------------------------------------------------
# x270 — GIF roundtrip audit (the x255 pattern over the real LZW
# coder): two-tone palette images, dims + aHash SQL-derivable from the
# id arithmetic; a hash match certifies LZW bit-packing / code-width
# escalation / palette materialization corpus-wide.
_GIF_SQL = """
WITH p AS (SELECT doc_id,
                  6 + doc_id % 11 AS w,
                  4 + 2 * (doc_id % 4) AS h,
                  (((doc_id * 37) % 256) * 299 + ((doc_id * 59) % 256) * 587
                   + ((doc_id * 83) % 256) * 114) // 1000 AS lt,
                  (((doc_id * 41 + 7) % 256) * 299
                   + ((doc_id * 61 + 13) % 256) * 587
                   + ((doc_id * 89 + 29) % 256) * 114) // 1000 AS lb
           FROM documents)
SELECT doc_id AS media_id, CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CASE WHEN lt = lb THEN 'ffffffffffffffff'
            WHEN lt > lb THEN '00000000ffffffff'
            ELSE 'ffffffff00000000' END AS phash
FROM p ORDER BY media_id"""


@register("x270_gif_roundtrip_audit", _GIF_SQL)
def x270(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import multimodal

    docs = load_table(spark, sf, "documents")
    return multimodal.gif_roundtrip_audit(docs, "doc_id")
