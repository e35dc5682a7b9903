"""Second extension-query batch (x15..x26): oracle coverage for operators
that previously had only unit tests — random-variable derivation, banded
minhash LSH, embedding-cosine near-dup, skip-gram / gram assembly, null
imputer, the hotlead rule, exact-quantile binning, the preprocessing
chain, word substitution, Porter stemming (planted-fixture oracle since
r9) and TopK intents.

Every oracle is engine-portable DuckDB SQL built from the same literals
the Spark operators ship (hash prefixes, hyperplanes, thresholds), so the
driver's sorted-row hash matches bit-for-bit (floats rounded to 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from flashml_spark.functions import hashing as H
from flashml_spark.operators import binning, dedup, relational, similarity
from flashml_spark.preprocessing.transformers import (
    CaseNormalizer,
    NullImputer,
    PorterStemmer,
    RegexReplacer,
    SentenceMarker,
    StopwordRemover,
    WordSubstituter,
)
from flashml_spark.queries import register
from flashml_spark.sources.readers import load_table, local_rows
from flashml_spark.training.postprocess import hotlead_flag, top_k_intents

_TOK = "string_split_regex(lower(trim(text)), '\\s+')"
_SW = ["the", "and", "of", "to", "a", "in", "is", "that", "it", "for"]


# --------------------------------------------------------------------------
# x15 — deterministic random-variable derivation (DataReader.scala:34-78)
@register(
    "x15_random_variable",
    """SELECT o_orderkey,
              ROUND(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8)) AS BIGINT)
                    * 100.0 / 4294967295.0, 6) AS rv
       FROM orders ORDER BY o_orderkey""",
)
def x15(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").withColumn(
        "sid", F.md5(F.col("o_orderkey").cast("string").cast("binary"))
    )
    out = relational.derive_random_variable(o, "sid", out_col="rv")
    return out.select("o_orderkey", F.round("rv", 6).alias("rv"))


# x16 — banded minhash LSH candidate pairs (8 hashes, 4 bands, bigram shingles)
def _mh_band_oracle() -> str:
    # mirror of hashing: hash i = 8-hex slice i%4 of md5('<i//4>:'||shingle)
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
    return f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
       sh AS (SELECT doc_id,
                     list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]) AS shs
              FROM tok),
       sig AS (SELECT doc_id,
                {comps}
               FROM sh),
       bnd AS (SELECT doc_id, unnest([{bands}]) AS band_key FROM sig)
       SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       FROM bnd a JOIN bnd b USING (band_key) WHERE a.doc_id < b.doc_id"""


@register("x16_minhash_lsh_bands", _mh_band_oracle())
def x16(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return dedup.minhash_lsh_candidates(
        docs, "text", "doc_id", num_hashes=8, bands=4, shingle_n=2
    )


# x17 — embedding-cosine near-dup pairs inside LSH buckets
# synthetic embeddings are ~random (max in-bucket cosine ≈ 0.45 at sf0.01),
# so the demo threshold sits below that to keep the oracle check non-vacuous;
# real dedup runs use the operator default (0.95)
_DIM, _PLANES_N, _SEED, _NDUP_T = 64, 8, 42, 0.35
_PLANES = similarity.random_hyperplanes(_DIM, _PLANES_N, _SEED)


def _neardup_oracle() -> str:
    bucket_terms = " + ".join(
        "(CASE WHEN list_dot_product(v, [{plane}]) > 0 THEN {bit} ELSE 0 END)".format(
            plane=", ".join(repr(x) for x in plane), bit=1 << b
        )
        for b, plane in enumerate(_PLANES)
    )
    return f"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
       b AS (SELECT vec_id, v, CAST({bucket_terms} AS BIGINT) AS bucket FROM e)
       SELECT a.vec_id AS id_a, b2.vec_id AS id_b,
              ROUND(list_dot_product(a.v, b2.v)
                    / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))),
                    6) AS sim
       FROM b a JOIN b b2 USING (bucket)
       WHERE a.vec_id < b2.vec_id
         AND ROUND(list_dot_product(a.v, b2.v)
                   / (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b2.v, b2.v))),
                   6) >= {_NDUP_T}"""


@register("x17_embedding_neardup", _neardup_oracle())
def x17(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings")
    return similarity.embedding_neardup_pairs(
        emb, "embedding", "vec_id", threshold=_NDUP_T,
        n_planes=_PLANES_N, seed=_SEED, dim=_DIM,
    )


# x18 — skip-gram "AND rules" (SkipGramGenerator.scala:28-46), windowSize=4
@register(
    "x18_skipgram",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents)
        SELECT doc_id, array_to_string(
          list_filter(list_transform(range(1, len(ts) - 1),
                        i -> CASE WHEN ts[i] != ts[i + 2]
                                  THEN ts[i] || ' & ' || ts[i + 2] END),
                      x -> x IS NOT NULL)
          || list_filter(list_transform(range(1, len(ts) - 2),
                        i -> CASE WHEN ts[i] != ts[i + 3]
                                  THEN ts[i] || ' & ' || ts[i + 3] END),
                      x -> x IS NOT NULL), '~') AS grams
        FROM tok ORDER BY doc_id""",
)
def x18(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.features.generators import SkipGramGenerator

    docs = load_table(spark, sf, "documents").withColumn("ts", H.tokens(F.col("text")))
    out = SkipGramGenerator(inputCol="ts", outputCol="sg", windowSize=4).transform(docs)
    return out.select("doc_id", F.array_join("sg", "~").alias("grams"))


# x19 — ngram + gram assembler (FeatureGenerationEngine.scala:392-409,
#        GramAssembler.scala:30-36)
@register(
    "x19_gram_assemble",
    f"""WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents)
        SELECT doc_id, array_to_string(
          ts || list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i + 1]),
          '~') AS grams
        FROM tok ORDER BY doc_id""",
)
def x19(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.features.generators import GramAssembler, build_ngram_stages

    docs = load_table(spark, sf, "documents").withColumn("ts", H.tokens(F.col("text")))
    (ng,) = build_ngram_stages("ts", [2])
    with_grams = ng.transform(docs)
    out = GramAssembler(
        inputCols=["ts", ng.getOutputCol()], outputCol="assembled"
    ).transform(with_grams)
    return out.select("doc_id", F.array_join("assembled", "~").alias("grams"))


# x20 — typed null impute + indicator (ImputerCustom.scala:61-73)
@register(
    "x20_null_imputer",
    """SELECT o_orderkey,
              COALESCE(CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_totalprice END,
                       -1.0) AS val,
              CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END AS imputerCol_val
       FROM orders ORDER BY o_orderkey""",
)
def x20(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders").withColumn(
        "val",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(F.col("o_totalprice")),
    )
    out = NullImputer(inputCol="val", fillValue="-1.0").transform(o)
    return out.select("o_orderkey", "val", "imputerCol_val")


# x21 — hotlead business rule (HotleadTransformer.scala; per-page thresholds)
@register(
    "x21_hotlead_rule",
    """SELECT o_orderkey,
              CASE WHEN (CAST(o_custkey % 100 AS DOUBLE) / 100.0) >=
                        (CASE LEAST(GREATEST(CAST(o_orderkey % 5 + 1 AS INT), 1), 3)
                              WHEN 1 THEN 0.2 WHEN 2 THEN 0.5 ELSE 0.8 END)
                   THEN 1 ELSE 0 END AS isHotLead
       FROM orders ORDER BY o_orderkey""",
)
def x21(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    prob = (F.col("o_custkey") % 100).cast("double") / 100.0
    page = F.col("o_orderkey") % 5 + 1
    return o.select(
        "o_orderkey", hotlead_flag(prob, page, [0.2, 0.5, 0.8]).alias("isHotLead")
    )


# x22 — equi-area binning via exact percentiles (FeatureGenerationEngine.scala:310-318)
@register(
    "x22_quantile_binning",
    """WITH q AS (SELECT quantile_cont(l_extendedprice, [0.25, 0.5, 0.75]) AS qs
                  FROM lineitem)
       SELECT l_orderkey, l_linenumber,
              CASE WHEN l_extendedprice < qs[1] THEN 0
                   WHEN l_extendedprice < qs[2] THEN 1
                   WHEN l_extendedprice < qs[3] THEN 2 ELSE 3 END AS bucket
       FROM lineitem, q ORDER BY l_orderkey, l_linenumber""",
)
def x22(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    out = binning.bin_equiarea_exact(li, "l_extendedprice", 4, out_col="bucket")
    return out.select("l_orderkey", "l_linenumber", "bucket")


# x23 — preprocessing chain: case norm → word-class regex → sentence marker
#       → stopword removal (PreprocessingEngine chaining contract, space delim)
def _chain_oracle() -> str:
    sw = ", ".join(f"'{w}'" for w in _SW)
    return f"""SELECT doc_id, array_to_string(
         list_filter(string_split(
             '_class_ss ' || regexp_replace(lower(text), '[0-9]+', '_class_number', 'g')
                          || ' _class_se', ' '),
             t -> NOT list_contains([{sw}], t)), ' ') AS cleaned
       FROM documents ORDER BY doc_id"""


@register("x23_preprocess_chain", _chain_oracle())
def x23(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    stages = [
        CaseNormalizer(inputCol="text", outputCol="s1"),
        RegexReplacer(inputCol="s1", outputCol="s2",
                      patterns=["[0-9]+"], replacements=["_class_number"]),
        SentenceMarker(inputCol="s2", outputCol="s3"),
        StopwordRemover(inputCol="s3", outputCol="cleaned",
                        stopwords=list(_SW), delimiter=" "),
    ]
    out = docs
    for st in stages:
        out = st.transform(out)
    return out.select("doc_id", "cleaned")


# x24 — dictionary word substitution (WordSubstitutionTransformer.scala:50-62),
#       multi-word replacement re-split onto the delimiter
@register(
    "x24_word_substitution",
    """SELECT doc_id, array_to_string(
         list_transform(string_split(lower(text), ' '),
           t -> CASE WHEN t = 'the' THEN 'ze'
                     WHEN t = 'and' THEN 'und'
                     WHEN t = 'data' THEN 'datum point' ELSE t END), ' ') AS sub
       FROM documents ORDER BY doc_id""",
)
def x24(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents").withColumn("lt", F.lower(F.col("text")))
    out = WordSubstituter(
        inputCol="lt", outputCol="sub",
        dictionary={"the": "ze", "and": "und", "data": "datum point"},
        delimiter=" ",
    ).transform(docs)
    return out.select("doc_id", "sub")


# x25 — Porter stemming, upgraded r9 from rows-only to a PLANTED-FIXTURE
# oracle (the x07/x27/x240 pattern from r8): plant fixture words whose
# Porter stems are LITERAL SQL pins (the canonical Porter test vectors,
# covering steps 1a/1b/1b-cleanup/1c/2/3/4/5a/5b), run the REAL
# PorterStemmer transformer over corpus ∪ fixtures, and emit
#   (a) one row per fixture word with its stem, and
#   (b) ONE corpus row: the total stemmed-token count over ALL documents
#       — Porter maps each token to exactly one token, so the count is
#       SQL-derivable from the UNSTEMMED text while the Spark value is
#       computed FROM THE STEMMER'S OUTPUT column, forcing the pandas
#       UDF to run over the full corpus (no pushdown can skip it).
# A hash match certifies both exact stem correctness on the fixture
# vocabulary and that the stemmer ran token-preserving over every doc.
_PORTER_FIXTURES = [
    ("caresses", "caress"), ("ponies", "poni"), ("ties", "ti"),
    ("cats", "cat"), ("feed", "feed"), ("agreed", "agre"),
    ("plastered", "plaster"), ("motoring", "motor"), ("sing", "sing"),
    ("conflated", "conflat"), ("troubled", "troubl"), ("sized", "size"),
    ("hopping", "hop"), ("tanned", "tan"), ("hissing", "hiss"),
    ("fizzed", "fizz"), ("failing", "fail"), ("filing", "file"),
    ("happy", "happi"), ("sky", "sky"), ("relational", "relat"),
    ("conditional", "condit"), ("rational", "ration"),
    ("valency", "valenc"), ("hesitancy", "hesit"),
    ("digitizer", "digit"), ("conformably", "conform"),
    ("radically", "radic"), ("differently", "differ"),
    ("vileness", "vile"), ("triplicate", "triplic"),
    ("formative", "form"), ("formalize", "formal"),
    ("electricity", "electr"), ("electrical", "electr"),
    ("hopefulness", "hope"), ("goodness", "good"), ("revival", "reviv"),
    ("allowance", "allow"), ("inference", "infer"),
    ("airliner", "airlin"), ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"), ("defensible", "defens"),
    ("irritant", "irrit"), ("replacement", "replac"),
    ("adjustment", "adjust"), ("dependent", "depend"),
    ("adoption", "adopt"), ("homologous", "homolog"),
    ("communism", "commun"), ("activate", "activ"),
    ("angularity", "angular"), ("homologies", "homologi"),
    ("effective", "effect"), ("bowdlerize", "bowdler"),
    ("probate", "probat"), ("rate", "rate"), ("cease", "ceas"),
    ("controlling", "control"), ("rolling", "roll"),
    ("generalizations", "gener"), ("oscillators", "oscil"),
]

_X25_SQL = (
    "WITH fix(word, stem) AS (VALUES "
    + ", ".join(f"('{w}', '{s}')" for w, s in _PORTER_FIXTURES)
    + """),
     corpus AS (SELECT CAST(SUM(len(string_split(lower(text), ' ')))
                            AS BIGINT) AS v
                FROM documents)
SELECT 'stem:' || word AS key, stem AS value FROM fix
UNION ALL
SELECT 'corpus_stemmed_tokens' AS key, CAST(v AS VARCHAR) AS value
FROM corpus
ORDER BY key"""
)


@register("x25_porter_stem", _X25_SQL)
def x25(spark: SparkSession, sf: str) -> DataFrame:
    docs = (
        load_table(spark, sf, "documents")
        .select(F.lower(F.col("text")).alias("lt"))
        .withColumn("word", F.lit(None).cast("string"))
    )
    fixtures = local_rows(
        spark, [(w, w) for w, _ in _PORTER_FIXTURES], "lt string, word string"
    )
    stemmed = PorterStemmer(
        inputCol="lt", outputCol="stemmed", delimiter=" "
    ).transform(docs.unionByName(fixtures))
    pins = stemmed.filter(F.col("word").isNotNull()).select(
        F.concat(F.lit("stem:"), F.col("word")).alias("key"),
        F.col("stemmed").alias("value"),
    )
    # token count measured on the OUTPUT column: the stemmer must run
    # over every corpus row to produce this scalar
    total = (
        stemmed.filter(F.col("word").isNull())
        .agg(
            F.sum(F.size(F.split(F.col("stemmed"), " ")))
            .cast("bigint")
            .alias("v")
        )
        .select(
            F.lit("corpus_stemmed_tokens").alias("key"),
            F.col("v").cast("string").alias("value"),
        )
    )
    return pins.unionByName(total).orderBy("key")


# x26 — TopK intents (TopKIntents.scala:90-106) over synthetic per-class probs
@register(
    "x26_topk_intents",
    """WITH p AS (SELECT o_orderkey,
                 CAST((o_orderkey * 13) % 97 AS DOUBLE) / 97.0 AS p_a,
                 CAST((o_orderkey * 29) % 97 AS DOUBLE) / 97.0 AS p_b,
                 CAST((o_orderkey * 43) % 97 AS DOUBLE) / 97.0 AS p_c
          FROM orders),
       e AS (SELECT o_orderkey, unnest(['a', 'b', 'c']) AS label,
                    unnest([p_a, p_b, p_c]) AS raw_prob FROM p),
       r AS (SELECT o_orderkey, label, raw_prob,
                    row_number() OVER (PARTITION BY o_orderkey
                                       ORDER BY raw_prob DESC, label DESC) AS pos
             FROM e)
       SELECT o_orderkey, pos, label, ROUND(raw_prob, 6) AS prob
       FROM r WHERE pos <= 2 ORDER BY o_orderkey, pos""",
)
def x26(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    probs = F.array(
        *[
            ((F.col("o_orderkey") * m) % 97).cast("double") / 97.0
            for m in (13, 29, 43)
        ]
    )
    top = top_k_intents(
        o.withColumn("probability", probs), ["a", "b", "c"], k=2
    )
    ex = top.select(
        "o_orderkey", F.posexplode("topKIntents").alias("pos0", "intent")
    )
    return ex.select(
        "o_orderkey",
        (F.col("pos0") + 1).alias("pos"),
        F.col("intent.label").alias("label"),
        F.round(F.col("intent.prob"), 6).alias("prob"),
    )


# x27 — IVF ANN (k-means coarse quantizer), upgraded r8 from rows-only
# to a PLANTED-FIXTURE oracle (r07 VERDICT item 7, the x233 pattern —
# same construction as x07): 10 exact clones of the query vector get
# assigned to the query's own IVF list no matter where the fitted
# centroids land, so the probed lists always contain them and the
# top-10 is the query row + the 9 smallest clone ids at sim 1.0 —
# derivable in pure SQL, robust to any centroid perturbation.  The
# probe still rescoring the real corpus rows keeps the bench cost.
_ANN_IVF_SQL = """
WITH m AS (SELECT MAX(vec_id) AS mx FROM embeddings)
SELECT CAST(0 AS BIGINT) AS vec_id, CAST(1.0 AS DOUBLE) AS sim FROM m
UNION ALL
SELECT CAST(m.mx + 1 + i AS BIGINT), CAST(1.0 AS DOUBLE)
FROM m, range(9) t(i) ORDER BY vec_id"""


@register("x27_ann_ivf", _ANN_IVF_SQL)
def x27(spark: SparkSession, sf: str) -> DataFrame:
    emb = load_table(spark, sf, "embeddings").select("vec_id", "embedding")
    mx = emb.agg(F.max("vec_id")).first()[0]  # scalar: clone id offset
    qrow = emb.filter(F.col("vec_id") == 0).select("embedding").first()
    clones = emb.filter(F.col("vec_id") == 0).select(
        F.explode(
            F.array(*[F.lit(int(mx) + 1 + i) for i in range(10)])
        ).alias("vec_id"),
        "embedding",
    )
    return similarity.knn_ivf(
        emb.unionByName(clones), "embedding", "vec_id", list(qrow["embedding"]),
        k=10, n_lists=8, n_probe=4, seed=42,
    )


# x28 — text cleanup / normalization chain (URL/HTML/control strip,
#       repeat squeeze, whitespace collapse)
@register(
    "x28_text_normalize",
    r"""SELECT doc_id, trim(regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(
                regexp_replace(text, '[\x00-\x08\x0b\x0c\x0e-\x1f]', '', 'g'),
                'https?://\S+', ' ', 'g'),
              '<[^>]+>', ' ', 'g'),
            '(.)\1{3,}', '\1\1\1', 'g'),
          '\s+', ' ', 'g')) AS norm_text
       FROM documents""",
)
def x28(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import textops

    docs = load_table(spark, sf, "documents")
    return textops.with_normalized_text(docs, "text").select("doc_id", "norm_text")


# x29 — sliding (hopping) window aggregation: 1h windows every 15min.
# Epoch-aligned like F.window; each event belongs to exactly 4 windows
# (timestamps all carry sub-second micros, so boundary ties cannot occur).
@register(
    "x29_sliding_window",
    """SELECT (CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900 AS ws,
              event_type, COUNT(*) AS n, ROUND(SUM(value), 6) AS total
       FROM events, (SELECT unnest([0, 1, 2, 3]) AS k) hops
       GROUP BY 1, 2""",
)
def x29(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import events as ev

    return ev.sliding_window_agg(load_table(spark, sf, "events"))


# x30 — per-group top-N (ranked window): 3 priciest orders per customer
@register(
    "x30_topn_per_group",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
         SELECT o_custkey, o_orderkey, o_totalprice,
                row_number() OVER (PARTITION BY o_custkey
                                   ORDER BY o_totalprice DESC, o_orderkey) AS rn
         FROM orders) t
       WHERE rn <= 3""",
)
def x30(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return relational.top_n_per_group(
        o, ["o_custkey"], "o_totalprice", 3, tiebreak_cols=["o_orderkey"]
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rn")


# x31 — anti-join (VSI missing-values shape, ModelHealthMetricsEvaluator
#       set differences): customers with no orders
@register(
    "x31_anti_join",
    """SELECT c_custkey FROM customer
       WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)""",
)
def x31(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_anti").select("c_custkey")


# x32 — semi-join: customers holding at least one big order
@register(
    "x32_semi_join",
    """SELECT c_custkey, c_name FROM customer
       WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)""",
)
def x32(spark: SparkSession, sf: str) -> DataFrame:
    c = load_table(spark, sf, "customer")
    o = load_table(spark, sf, "orders").filter("o_totalprice > 100000")
    return c.join(o, c["c_custkey"] == o["o_custkey"], "left_semi").select(
        "c_custkey", "c_name"
    )


# x33 — ROLLUP aggregation (subtotal rows carry NULL group keys)
@register(
    "x33_rollup",
    """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
              ROUND(SUM(l_quantity), 2) AS qty
       FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)""",
)
def x33(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("l_quantity"), 2).alias("qty"),
    )


# x34 — pivot (wide per-class aggregation); fixed pivot values keep the
#       schema deterministic on both engines
@register(
    "x34_pivot",
    """SELECT l_returnflag,
              CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
              CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O
       FROM lineitem GROUP BY l_returnflag""",
)
def x34(spark: SparkSession, sf: str) -> DataFrame:
    li = load_table(spark, sf, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(F.count(F.lit(1)))
        .na.fill({"F": 0, "O": 0})
    )


# x35 — end-to-end minhash dedup (LSH candidates → transitive components →
#       keep min id per group).  The iterative min-label propagation IS
#       SQL-expressible as a recursive reachability CTE: every vertex
#       collects the labels of all vertices that can reach it (undirected ⇒
#       reachable set = component), so MIN(label) = min id of the component
#       — exactly what connected_components converges to.  The candidate
#       edges reuse x16's band-key SQL verbatim.
def _minhash_dedup_oracle() -> str:
    return f"""WITH RECURSIVE pairs AS ({_mh_band_oracle()}),
       sym AS (SELECT id_a AS src, id_b AS dst FROM pairs
               UNION ALL SELECT id_b, id_a FROM pairs),
       reach(id, lbl) AS (
         SELECT src, src FROM sym
         UNION
         SELECT s.dst, r.lbl FROM reach r JOIN sym s ON s.src = r.id),
       comp AS (SELECT id, MIN(lbl) AS component FROM reach GROUP BY id)
       SELECT * FROM documents
       WHERE doc_id NOT IN (SELECT id FROM comp WHERE id <> component)"""


@register("x35_minhash_dedup_e2e", _minhash_dedup_oracle())
def x35(spark: SparkSession, sf: str) -> DataFrame:
    docs = load_table(spark, sf, "documents")
    return dedup.minhash_dedup(docs, "text", "doc_id")


# x36 — deterministic conditional data balance (TrainTestSampler.scala:244-281):
#       majority rows kept below a threshold on the random variable
@register(
    "x36_conditional_balance",
    """WITH b AS (SELECT MIN(o_orderkey % 100) AS mn, MAX(o_orderkey % 100) AS mx
                  FROM orders WHERE o_orderstatus = 'O')
       SELECT o_orderstatus, COUNT(*) AS n FROM orders, b
       WHERE o_orderstatus != 'O'
          OR (o_orderkey % 100) < mn + 0.5 * (mx - mn)
       GROUP BY o_orderstatus""",
)
def x36(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.operators import sampling

    o = load_table(spark, sf, "orders").withColumn(
        "rv", (F.col("o_orderkey") % 100).cast("double")
    )
    balanced = sampling.balance_conditional(o, "o_orderstatus", "O", "rv", 0.5)
    return balanced.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n"))


# x37 — word-class regex replacement (RegexReplacementTransformer +
#       PreprocessingStageLoader ordering): longest-word class first,
#       (?i)\b(?:w1|w2)'?s?\b → _class_<name>
@register(
    "x37_word_class_replace",
    r"""SELECT doc_id,
               regexp_replace(
                 regexp_replace(text,
                   '(?i)\b(?:document|record)''?s?\b', '_class_doc', 'g'),
                 '(?i)\b(?:data|text)''?s?\b', '_class_content', 'g') AS replaced
        FROM documents""",
)
def x37(spark: SparkSession, sf: str) -> DataFrame:
    from flashml_spark.preprocessing.transformers import (
        RegexReplacer,
        word_class_patterns,
    )

    pats, reps = word_class_patterns(
        {"doc": ["document", "record"], "content": ["data", "text"]}
    )
    docs = load_table(spark, sf, "documents")
    out = RegexReplacer(
        inputCol="text", outputCol="replaced", patterns=pats, replacements=reps
    ).transform(docs)
    return out.select("doc_id", "replaced")


# x38 — CUBE aggregation (all grouping-set combinations; subtotal rows
#       carry NULL group keys on both engines)
@register(
    "x38_cube",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
              ROUND(SUM(o_totalprice), 2) AS total
       FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)""",
)
def x38(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("o_totalprice"), 2).alias("total"),
    )


# x39 — INTERSECT set op (distinct semantics on both engines): customers
#       holding both an open and a fulfilled order
@register(
    "x39_intersect",
    """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
       INTERSECT
       SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""",
)
def x39(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    open_ = o.filter("o_orderstatus = 'O'").select("o_custkey")
    fulfilled = o.filter("o_orderstatus = 'F'").select("o_custkey")
    return open_.intersect(fulfilled)


# x40 — GROUPING SETS (explicit subtotal lattice; the general form behind
#       rollup/cube). Spark exposes it through SQL — same engine path
#       (Expand operator) as Dataset.rollup/cube.
@register(
    "x40_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
       FROM orders
       GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))""",
)
def x40(spark: SparkSession, sf: str) -> DataFrame:
    o = load_table(spark, sf, "orders")
    o.createOrReplaceTempView("x40_orders")
    return spark.sql(
        """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
           FROM x40_orders
           GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))"""
    )
