"""Unit tests for the round-2 corpus-statistics operators: repetition
ratio, per-group vocabulary head, quota sampling, scale-safe NTILE, and
SimHash Hamming-radius pairs (exact-recall guarantee)."""

from __future__ import annotations

from itertools import combinations

import pytest
from pyspark.sql import functions as F

from flashml_spark.functions.windows import global_ntile
from flashml_spark.operators import dedup, sampling, textops
from flashml_spark.sources.readers import load_table
from tests.conftest import SF_DIR


def test_repetition_ratio_edges(spark):
    df = spark.createDataFrame(
        [
            (1, "a b a b"),      # bigrams: [a b, b a, a b] -> 1 - 2/3
            (2, "x y z"),        # all distinct -> 0.0
            (3, "one"),          # sub-n tokens -> 0.0 (no NULL)
            (4, ""),             # empty -> 0.0
        ],
        ["doc_id", "text"],
    )
    got = {
        r["doc_id"]: r["rep_ratio"]
        for r in textops.with_repetition_ratio(df, "text", n=2).collect()
    }
    assert got[1] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert got[2] == 0.0
    assert got[3] == 0.0
    assert got[4] == 0.0


def test_token_topk_per_group_ties_break_ascending(spark):
    df = spark.createDataFrame(
        [("en", "b a b a c"), ("de", "x x y")], ["lang", "text"]
    )
    rows = textops.token_topk_per_group(df, "text", "lang", k=2).collect()
    en = sorted((r["rn"], r["token"]) for r in rows if r["lang"] == "en")
    # a and b tie at 2; ascending token order ranks a first
    assert en == [(1, "a"), (2, "b")]


def test_quota_per_group_deterministic_and_bounded(spark):
    docs = load_table(spark, SF_DIR, "documents")
    s1 = sampling.quota_per_group(docs, "source", "doc_id", k=3)
    ids1 = sorted(r["doc_id"] for r in s1.select("doc_id").collect())
    ids2 = sorted(
        r["doc_id"]
        for r in sampling.quota_per_group(docs, "source", "doc_id", k=3)
        .select("doc_id")
        .collect()
    )
    assert ids1 == ids2  # same survivors every run
    per_group = (
        s1.groupBy("source").count().agg(F.max("count")).collect()[0][0]
    )
    assert per_group <= 3


def test_global_ntile_matches_single_partition_ntile(spark):
    from pyspark.sql import Window

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "n_chars")
    got = {
        r["doc_id"]: r["bucket"]
        for r in global_ntile(docs, "n_chars", 7, tiebreak_cols=["doc_id"]).collect()
    }
    w = Window.orderBy(F.asc("n_chars"), F.asc("doc_id"))
    want = {
        r["doc_id"]: r["b"]
        for r in docs.withColumn("b", F.ntile(7).over(w)).collect()
    }
    assert got == want


def test_simhash_hamming_pairs_exact_recall_vs_brute_force(spark):
    docs = load_table(spark, SF_DIR, "documents")
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dedup.simhash_hamming_pairs(
            docs, "text", "doc_id", bits=16, bands=4, max_hamming=3
        ).collect()
    }
    fps = {
        r["doc_id"]: r["fp"]
        for r in dedup.with_simhash(docs, "text", 16, out_col="fp")
        .select("doc_id", "fp")
        .collect()
    }
    want = {}
    for a, b in combinations(sorted(fps), 2):
        h = bin(fps[a] ^ fps[b]).count("1")
        if h <= 3:
            want[(a, b)] = h
    # pigeonhole: radius 3 with 4 bands is EXACT, not approximate
    assert got == want


def test_simhash_hamming_pairs_radius_cap_enforced(spark):
    docs = load_table(spark, SF_DIR, "documents")
    with pytest.raises(ValueError, match="exact-recall"):
        dedup.simhash_hamming_pairs(docs, "text", "doc_id", bands=4, max_hamming=4)


# ---------------------------------------------------------------------------
# round-3 operators: shard packing, z-score, winsorize, scrub counts,
# bigram LM
# ---------------------------------------------------------------------------


def test_pack_shards_boundaries(spark):
    from flashml_spark.operators.textops import pack_shards

    # tokens: 4,4,4,4 with capacity 10 -> exclusive cumsums 0,4,8,12
    # -> shards 0,0,0,1 (doc 3 straddles: shard 0 totals 12 >= 10)
    df = spark.createDataFrame(
        [(1, 4), (2, 4), (3, 4), (4, 4)], ["doc_id", "n_tokens"]
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in pack_shards(df, "doc_id", "n_tokens", capacity=10).collect()
    }
    assert got == {1: 0, 2: 0, 3: 0, 4: 1}


def test_pack_shards_contiguous_and_capacity(spark):
    from flashml_spark.operators.textops import pack_shards

    df = spark.createDataFrame(
        [(i, 7 + i % 5) for i in range(200)], ["doc_id", "n_tokens"]
    )
    packed = pack_shards(df, "doc_id", "n_tokens", capacity=100).collect()
    by_shard = {}
    for r in sorted(packed, key=lambda r: r["doc_id"]):
        by_shard.setdefault(r["shard"], []).append(r)
    shards = sorted(by_shard)
    assert shards == list(range(len(shards)))  # dense ids
    for s in shards:
        rows = by_shard[s]
        total = sum(r["n_tokens"] for r in rows)
        # a shard only exceeds capacity by its single straddling last doc
        assert total - rows[-1]["n_tokens"] < 100
        # contiguity: doc ids in a shard form one run
        ids = [r["doc_id"] for r in rows]
        assert ids == list(range(ids[0], ids[-1] + 1))


def test_group_zscore_known_values(spark):
    from flashml_spark.operators.relational import group_zscore

    df = spark.createDataFrame(
        [("a", 1.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)], ["g", "v"]
    )
    got = {
        (r["g"], r["v"]): r["z"] for r in group_zscore(df, "v", ["g"]).collect()
    }
    # group a: mean 2, stddev_pop 1 -> z = -1, +1 ; group b: zero variance -> 0
    assert got == {("a", 1.0): -1.0, ("a", 3.0): 1.0, ("b", 5.0): 0.0}


def test_winsorize_exact_and_sketch(spark):
    from flashml_spark.operators.relational import winsorize

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], ["v"])
    exact = winsorize(df, "v", 0.05, 0.95, exact=True)
    lo = exact.agg(F.min("v_clipped")).first()[0]
    hi = exact.agg(F.max("v_clipped")).first()[0]
    # percentile(0.05) over 1..100 = 5.95 (linear interp), 0.95 -> 95.05
    assert lo == pytest.approx(5.95)
    assert hi == pytest.approx(95.05)
    sketch = winsorize(df, "v", 0.05, 0.95, exact=False)
    s_lo = sketch.agg(F.min("v_clipped")).first()[0]
    s_hi = sketch.agg(F.max("v_clipped")).first()[0]
    assert abs(s_lo - 5.95) <= 1.5 and abs(s_hi - 95.05) <= 1.5


def test_pattern_counts_known(spark):
    from flashml_spark.operators.textops import pattern_counts

    df = spark.createDataFrame(
        [
            ("s1", "the value of the table"),     # 2 matches
            ("s1", "no match here"),              # 0
            ("s2", "value value value"),          # 3
        ],
        ["source", "text"],
    )
    got = {
        r["source"]: (r["n_docs_hit"], r["n_matches"])
        for r in pattern_counts(df, "text", r"\b(value|table)\b", "source").collect()
    }
    assert got == {"s1": (1, 2), "s2": (1, 3)}


def test_bigram_conditional_topk_known(spark):
    from flashml_spark.operators.textops import bigram_conditional_topk

    df = spark.createDataFrame(
        [("en", "a b a b a c")],  # bigrams: ab, ba, ab, ba, ac
        ["lang", "text"],
    )
    rows = bigram_conditional_topk(df, "text", "lang", k=3).collect()
    got = {(r["w1"], r["w2"]): (r["c"], r["p"], r["rn"]) for r in rows}
    # c(a,·)=3 (ab x2 + ac), c(b,·)=2 ; ties break (w1, w2) ascending
    assert got[("a", "b")] == (2, pytest.approx(2 / 3, abs=1e-6), 1)
    assert got[("b", "a")] == (2, pytest.approx(1.0), 2)
    assert got[("a", "c")] == (1, pytest.approx(1 / 3, abs=1e-6), 3)


def test_bpe_token_count_vs_whitespace(spark):
    from flashml_spark.operators.textops import with_bpe_token_count

    df = spark.createDataFrame(
        [(1, "hello world"), (2, "a-b 12 c!")], ["doc_id", "text"]
    )
    got = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in with_bpe_token_count(df, "text").collect()
    }
    # "hello world" -> [hello, world] = 2
    # "a-b 12 c!" -> [a, -, b, 1, 2, c, !] = 7 (digits split, punct split)
    assert got == {1: 2, 2: 7}


def test_lm_doc_nll_known_probs(spark):
    import math

    from flashml_spark.operators.textops import lm_doc_nll

    # corpus: doc1 "a b a c", doc2 "a b"
    # bigrams: d1 [ab, ba, ac], d2 [ab] -> c(ab)=2, c(ba)=1, c(ac)=1
    # p(b|a)=2/3, p(a|b)=1/1, p(c|a)=1/3
    df = spark.createDataFrame([(1, "a b a c"), (2, "a b")], ["doc_id", "text"])
    got = {r["doc_id"]: (r["n_bigrams"], r["nll"]) for r in lm_doc_nll(df, "text", "doc_id").collect()}
    nll1 = -(math.log(2 / 3) + math.log(1.0) + math.log(1 / 3)) / 3
    nll2 = -math.log(2 / 3)
    assert got[1][0] == 3 and abs(got[1][1] - round(nll1, 6)) <= 1e-6
    assert got[2][0] == 1 and abs(got[2][1] - round(nll2, 6)) <= 1e-6


def test_retention_cohorts_known(spark):
    from flashml_spark.operators.events import retention_cohorts

    df = spark.createDataFrame(
        [
            (1, "2024-01-01 10:00:00"),
            (1, "2024-01-03 09:00:00"),
            (2, "2024-01-03 23:59:59"),
            (2, "2024-01-03 05:00:00"),
        ],
        ["user_id", "ts_s"],
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"))
    got = {
        (r["cohort_day"], r["day_offset"]): r["n_users"]
        for r in retention_cohorts(df, "user_id", "ts").collect()
    }
    assert got == {
        ("2024-01-01", 0): 1,
        ("2024-01-01", 2): 1,
        ("2024-01-03", 0): 1,
    }


def test_cluster_balanced_sample_quota_and_determinism(spark):
    from flashml_spark.operators.similarity import cluster_balanced_sample

    emb = load_table(spark, SF_DIR, "embeddings")
    a = cluster_balanced_sample(emb, "embedding", "vec_id", n_lists=4, k_per_cluster=3)
    rows_a = sorted((r["vec_id"], r["ivf_list"], r["rn"]) for r in a.collect())
    rows_b = sorted(
        (r["vec_id"], r["ivf_list"], r["rn"])
        for r in cluster_balanced_sample(
            emb, "embedding", "vec_id", n_lists=4, k_per_cluster=3
        ).collect()
    )
    assert rows_a == rows_b  # fixed-seed determinism end-to-end
    per_cluster = {}
    for _, lst, rn in rows_a:
        per_cluster.setdefault(lst, []).append(rn)
    assert len(per_cluster) >= 2
    for lst, rns in per_cluster.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))
        assert len(rns) <= 3


def test_vocab_coverage_known_cutoff(spark):
    from flashml_spark.operators.textops import vocab_coverage

    # counts: a=4, b=3, c=2, d=1 (total 10); 95% -> need a+b+c=9 <9.5,
    # so vocab_size=4; 50% -> a alone (4) < 5, a+b=7 >= 5 -> 2
    df = spark.createDataFrame(
        [("en", "a a a a b b b c c d")], ["lang", "text"]
    )
    r95 = vocab_coverage(df, "text", "lang", 0.95).first()
    assert (r95["vocab_size"], r95["distinct_words"], r95["total_tokens"]) == (4, 4, 10)
    r50 = vocab_coverage(df, "text", "lang", 0.50).first()
    assert r50["vocab_size"] == 2


def test_token_entropy_known(spark):
    import math

    from flashml_spark.operators.textops import token_entropy

    df = spark.createDataFrame(
        [(1, "a a a a"), (2, "a b c d")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: (r["n_tokens"], r["entropy"]) for r in token_entropy(df, "text", "doc_id").collect()}
    assert got[1] == (4, 0.0)  # single repeated token -> zero entropy
    assert got[2][0] == 4 and got[2][1] == pytest.approx(round(math.log(4), 6), abs=1e-6)


def test_source_vocab_overlap_known(spark):
    from flashml_spark.operators.textops import source_vocab_overlap

    df = spark.createDataFrame(
        [("s1", "a b c"), ("s2", "b c d"), ("s3", "x y")],
        ["source", "text"],
    )
    got = {
        (r["g_a"], r["g_b"]): (r["common"], r["size_a"], r["size_b"], r["jaccard"])
        for r in source_vocab_overlap(df, "text", "source").collect()
    }
    assert got[("s1", "s2")] == (2, 3, 3, 0.5)  # {b,c} / {a,b,c,d}
    assert ("s1", "s3") not in got  # zero-overlap pairs absent (inner join)


def test_training_shards_roundtrip_and_pruning(spark, tmp_path):
    from flashml_spark.operators.textops import pack_shards
    from flashml_spark.sources.savepoint import (
        read_training_shards,
        write_training_shards,
    )

    df = spark.createDataFrame(
        [(i, 10 + i % 7) for i in range(300)], "doc_id int, n_tokens int"
    )
    packed = pack_shards(df, "doc_id", "n_tokens", capacity=200)
    path = str(tmp_path / "shards")
    write_training_shards(packed, path)

    back = read_training_shards(spark, path)
    assert back.count() == 300
    assert sorted(back.columns) == sorted(packed.columns)

    some = read_training_shards(spark, path, shards=[0, 1])
    assert set(r["shard"] for r in some.select("shard").distinct().collect()) == {0, 1}
    # partition pruning reached the scan: shard filter is a PartitionFilter
    plan = some._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters", 1)[1][:200]


def test_incremental_ingestion_manifest(spark, tmp_path):
    from flashml_spark.sources.readers import commit_manifest, read_incremental

    src = str(tmp_path / "incoming")
    manifest = str(tmp_path / "manifest")

    spark.createDataFrame([(i,) for i in range(10)], "v int").repartition(
        2
    ).write.mode("append").parquet(src)
    df1, new1 = read_incremental(spark, src, manifest)
    assert df1.count() == 10 and len(new1) >= 2
    commit_manifest(spark, manifest, new1)

    # second batch lands in the same directory
    spark.createDataFrame([(i,) for i in range(10, 15)], "v int").coalesce(
        1
    ).write.mode("append").parquet(src)
    df2, new2 = read_incremental(spark, src, manifest)
    assert sorted(r["v"] for r in df2.collect()) == list(range(10, 15))
    assert 0 < len(new2) < len(new1) + len(new2)
    commit_manifest(spark, manifest, new2)

    df3, new3 = read_incremental(spark, src, manifest)
    assert df3.count() == 0 and new3 == []
