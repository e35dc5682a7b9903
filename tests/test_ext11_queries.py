"""Round-4 seventh batch (x135..x142): operator-level semantics and plan
shapes for the retrieval / data-mixing surface.  (Oracle parity for every
registered query is covered by test_oracle_queries.py's sweep; here we
pin hand-computed edge cases and the plans we designed for.)
"""

from __future__ import annotations

import contextlib
import io
import math

from pyspark.sql import functions as F

from flashml_spark.operators import dedup, events, sampling, textops


def plan_of(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


# --- BM25 -------------------------------------------------------------------


def test_bm25_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "spark spark is fast"), (2, "spark is a word"), (3, "no match here")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r["bm25"]
        for r in textops.bm25_topk(docs, "text", "doc_id", ["spark"], k=10).collect()
    }
    # doc 3 contains no query term -> absent entirely
    assert set(rows) == {1, 2}
    # N=3, df=2, idf = ln(1 + (3-2+0.5)/(2+0.5)); avgdl = (4+4+3)/3
    idf = math.log(1 + 1.5 / 2.5)
    def score(tf, dl, avgdl=11 / 3, k1=1.2, b=0.75):
        return idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert rows[1] == round(score(2, 4), 6)
    assert rows[2] == round(score(1, 4), 6)
    assert rows[1] > rows[2]


def test_bm25_topk_plan_is_take_ordered(spark):
    docs = spark.createDataFrame([(1, "a b"), (2, "a c")], "doc_id long, text string")
    plan = plan_of(textops.bm25_topk(docs, "text", "doc_id", ["a"], k=5))
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan  # 1-row stats frame broadcasts


# --- n-gram novelty ---------------------------------------------------------


def test_ngram_novelty_hand_computed(spark):
    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c x"), (3, "too short")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in textops.ngram_novelty(docs, "text", "doc_id").collect()}
    # doc 3 has < 3 tokens -> no grams -> absent
    assert set(out) == {1, 2}
    # doc 1: grams {a b c, b c d}, both first-claimed -> novelty 1.0
    assert out[1]["n_grams"] == 2 and out[1]["novelty"] == 1.0
    # doc 2: {a b c (claimed by doc 1), b c x (novel)} -> 0.5
    assert out[2]["n_grams"] == 2 and out[2]["novelty"] == 0.5


def test_ngram_novelty_repeated_gram_counted_once(spark):
    docs = spark.createDataFrame([(1, "a b a b a b")], "doc_id long, text string")
    row = textops.ngram_novelty(docs, "text", "doc_id").collect()[0]
    # grams: "a b a" (x2), "b a b" (x2) -> DISTINCT -> 2 grams, both novel
    assert row["n_grams"] == 2 and row["novelty"] == 1.0


# --- temperature mixture ----------------------------------------------------


def test_temperature_one_is_natural_proportions(spark):
    df = spark.createDataFrame([("en",)] * 6 + [("de",)] * 2, "lang string")
    out = {r["lang"]: r for r in sampling.temperature_mixture(df, "lang", 1.0).collect()}
    assert out["en"]["p_temp"] == out["en"]["p_raw"] == 0.75
    assert out["en"]["epochs"] == 1.0 and out["de"]["epochs"] == 1.0


def test_temperature_upsamples_tail(spark):
    df = spark.createDataFrame([("en",)] * 90 + [("de",)] * 10, "lang string")
    out = {r["lang"]: r for r in sampling.temperature_mixture(df, "lang", 0.5).collect()}
    assert out["de"]["p_temp"] > out["de"]["p_raw"]
    assert out["en"]["p_temp"] < out["en"]["p_raw"]
    assert abs(out["en"]["p_temp"] + out["de"]["p_temp"] - 1.0) < 1e-5
    assert out["de"]["epochs"] > 1.0 > out["en"]["epochs"]


# --- bottom-k hash sample ---------------------------------------------------


def test_bottomk_sample_partitioning_invariant(spark):
    df = spark.createDataFrame(
        [(i, f"s{i % 3}") for i in range(60)], "doc_id long, source string"
    )
    a = sorted(
        (r["doc_id"], r["source"], r["rk"])
        for r in sampling.bottomk_hash_sample(df.repartition(1), "source", "doc_id", 4).collect()
    )
    b = sorted(
        (r["doc_id"], r["source"], r["rk"])
        for r in sampling.bottomk_hash_sample(df.repartition(7), "source", "doc_id", 4).collect()
    )
    assert a == b and len(a) == 12


def test_bottomk_sample_small_group_returns_all(spark):
    df = spark.createDataFrame([(1, "a"), (2, "a")], "doc_id long, source string")
    assert sampling.bottomk_hash_sample(df, "source", "doc_id", 5).count() == 2


def test_bottomk_sample_stable_under_append(spark):
    # KMV property: appending rows only ever displaces the current max.
    df = spark.createDataFrame([(i, "a") for i in range(20)], "doc_id long, source string")
    before = {r["doc_id"] for r in sampling.bottomk_hash_sample(df, "source", "doc_id", 5).collect()}
    grown = df.unionByName(
        spark.createDataFrame([(i, "a") for i in range(20, 40)], "doc_id long, source string")
    )
    after = {r["doc_id"] for r in sampling.bottomk_hash_sample(grown, "source", "doc_id", 5).collect()}
    # every survivor from the smaller corpus that is still sampled kept its
    # membership by hash order; the overlap is at least k - |new winners|
    assert len(after) == 5
    assert before >= after & before


# --- weighted interleave ----------------------------------------------------


def test_weighted_interleave_positions_and_ratio(spark):
    df = spark.createDataFrame(
        [(i, "a") for i in range(20)] + [(100 + i, "b") for i in range(20)],
        "doc_id long, source string",
    )
    out = sampling.weighted_interleave(df, "source", "doc_id", {"a": 2.0, "b": 1.0})
    rows = out.orderBy("pos", "source", "doc_id").collect()
    # weight-2 source: positions 0.25, 0.75, 1.25 ...; weight-1: 0.5, 1.5 ...
    a_pos = [r["pos"] for r in rows if r["source"] == "a"][:3]
    b_pos = [r["pos"] for r in rows if r["source"] == "b"][:2]
    assert a_pos == [0.25, 0.75, 1.25] and b_pos == [0.5, 1.5]
    # in any aligned prefix, "a" appears ~2x as often
    head = [r["source"] for r in rows[:15]]
    assert head.count("a") == 10 and head.count("b") == 5


def test_weighted_interleave_excludes_unweighted_sources(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "zzz")], "doc_id long, source string"
    )
    out = sampling.weighted_interleave(df, "source", "doc_id", {"a": 1.0})
    assert [r["source"] for r in out.collect()] == ["a"]


# --- last-touch attribution -------------------------------------------------


def test_last_touch_hand_sequence(spark):
    rows = [
        # user 1: view -> click -> purchase(10) -> purchase(5) (still click)
        (1, 1, "view", "2024-01-01 00:00:00", 1.0),
        (2, 1, "click", "2024-01-01 00:01:00", 1.0),
        (3, 1, "purchase", "2024-01-01 00:02:00", 10.0),
        (4, 1, "purchase", "2024-01-01 00:03:00", 5.0),
        # user 2: purchase with no prior touch -> NULL channel
        (5, 2, "purchase", "2024-01-01 00:00:00", 7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["channel"]: r for r in events.last_touch_attribution(df).collect()}
    assert out["click"]["n_conversions"] == 2 and out["click"]["total_value"] == 15.0
    assert out[None]["n_conversions"] == 1 and out[None]["total_value"] == 7.0
    assert "view" not in out


# --- prefix containment -----------------------------------------------------


def test_prefix_containment_cases(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the dog"),  # prefix of 2
            (2, "the quick brown fox jumps over the dog and more"),
            (3, "identical text identical text xx"),
            (4, "identical text identical text xx"),  # exact dup: NOT flagged
            (5, "th"),  # short (< block) prefix of 1 and 2 -> side channel
            (6, ""),  # empty: excluded
            (7, "unrelated document body"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"] for r in dedup.prefix_containment(docs, "text", "doc_id", block_len=20).collect()}
    assert out == {1, 5}


def test_prefix_containment_short_side_channel_is_broadcast(spark):
    docs = spark.createDataFrame(
        [(1, "ab"), (2, "abcdefghijklmnopqrstuvwxyz")], "doc_id long, text string"
    )
    op = dedup.prefix_containment(docs, "text", "doc_id", block_len=20)
    assert {r["doc_id"] for r in op.collect()} == {1}
    assert "BroadcastNestedLoopJoin" in plan_of(op)


# --- JS divergence ----------------------------------------------------------


def test_jsd_identical_and_disjoint(spark):
    docs = spark.createDataFrame(
        [
            ("s1", "a b c"), ("s2", "a b c"),      # identical -> 0
            ("s3", "x y z"),                       # disjoint from s1 -> ln 2
        ],
        "source string, text string",
    )
    out = {
        (r["src_a"], r["src_b"]): r["jsd"]
        for r in textops.source_js_divergence(docs, "text", "source").collect()
    }
    assert out[("s1", "s2")] == 0.0
    assert out[("s1", "s3")] == round(math.log(2), 6)
    assert 0.0 <= out[("s2", "s3")] <= round(math.log(2), 6)


# --- BPE learning -----------------------------------------------------------


def test_bpe_learn_hand_corpus(spark):
    # canonical BPE example: 'low' x2 + 'lowest' -> first merges are l+o, lo+w
    docs = spark.createDataFrame(
        [(1, "low low lowest")], "doc_id long, text string"
    )
    rows = textops.bpe_learn(docs, "text", n_merges=2).collect()
    assert [(r["merge_round"], r["pair"], r["merged"]) for r in rows] == [
        (1, "l o", "lo"),
        (2, "lo w", "low"),
    ]
    # round-1 count: 'l o' occurs once in each of the 3 words
    assert rows[0]["n"] == 3


def test_bpe_greedy_merge_overlap(spark):
    # 'aaa' has two overlapping 'a a' pairs but merges only once per scan
    docs = spark.createDataFrame([(1, "aaa aaa")], "doc_id long, text string")
    rows = textops.bpe_learn(docs, "text", n_merges=2).collect()
    assert (rows[0]["pair"], rows[0]["n"]) == ("a a", 4)  # 2 per word, overlap counted
    # after merging: words are ' aa a ' -> round 2 best pair is 'aa a'
    assert rows[1]["pair"] == "aa a"


def test_bpe_disjoint_adjacent_occurrences_merge_in_one_round(spark):
    # r4 ADVICE regression: 'abab' has two DISJOINT adjacent 'a b'
    # occurrences; canonical Sennrich BPE merges BOTH in round 1
    # ('abab' -> 'ab ab').  A shared-single-space replace encoding
    # consumes the boundary space and skips every other occurrence
    # ('ab a b') — the wrapped-symbol encoding must not.
    docs = spark.createDataFrame([(1, "abab abab")], "doc_id long, text string")
    rows = textops.bpe_learn(docs, "text", n_merges=2).collect()
    assert (rows[0]["pair"], rows[0]["n"]) == ("a b", 4)  # 2 per word
    # both occurrences merged -> each word is now 'ab ab', so round 2's
    # best pair is ('ab ab', 2); the buggy encoding would leave
    # 'ab a b' and pick ('ab a', 2) / ('a b', 2) instead
    assert (rows[1]["pair"], rows[1]["merged"], rows[1]["n"]) == (
        "ab ab",
        "abab",
        2,
    )


def test_bpe_stops_when_no_pairs(spark):
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    # single-char words have no adjacent pairs -> empty merge table
    assert textops.bpe_learn(docs, "text", n_merges=3).count() == 0


def test_bpe_learn_driver_matches_distributed(spark):
    """The bounded driver-side merge loop (r11) must produce EXACTLY the
    distributed loop's merge table — pairs, merged symbols, counts and
    round order — including tie-breaks and greedy-overlap semantics."""
    docs = spark.createDataFrame(
        [
            (1, "low low lowest lower"),
            (2, "aaa abab newest widest"),
            (3, "low lowest abab aaa aaa"),
        ],
        "doc_id long, text string",
    )
    drv = [
        tuple(r)
        for r in textops.bpe_learn(docs, "text", n_merges=6)
        .orderBy("merge_round")
        .collect()
    ]
    dist = [
        tuple(r)
        for r in textops.bpe_learn(
            docs, "text", n_merges=6, driver_vocab_budget=0
        )
        .orderBy("merge_round")
        .collect()
    ]
    assert drv == dist and len(drv) == 6


# --- minhash accuracy audit -------------------------------------------------


def test_minhash_audit_identical_docs_zero_error(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma delta"), (2, "alpha beta gamma delta")],
        "doc_id long, text string",
    )
    row = dedup.minhash_accuracy_audit(docs, "text", "doc_id", threshold=0.6).collect()[0]
    # identical shingle sets: jaccard = 1, every signature component equal
    assert row["n_pairs"] == 1
    assert row["mean_abs_err"] == 0.0 and row["max_abs_err"] == 0.0
    assert row["bias"] == 0.0


def test_minhash_audit_empty_population(spark):
    docs = spark.createDataFrame(
        [(1, "totally distinct words here"), (2, "nothing shared anywhere else")],
        "doc_id long, text string",
    )
    row = dedup.minhash_accuracy_audit(docs, "text", "doc_id", threshold=0.6).collect()[0]
    assert row["n_pairs"] == 0 and row["mean_abs_err"] is None


def test_minhash_audit_accepts_precomputed_pairs(spark):
    # amortization path: a pipeline that already ran the exact pair join
    # hands it over via pairs= and gets IDENTICAL audit output — the
    # expensive truth set is not recomputed (r4 VERDICT item 6)
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),
            (2, "alpha beta gamma delta zeta"),
            (3, "alpha beta gamma delta epsilon"),
        ],
        "doc_id long, text string",
    )
    standalone = dedup.minhash_accuracy_audit(
        docs, "text", "doc_id", threshold=0.6
    ).collect()[0]
    pairs = dedup.prefix_filter_jaccard_pairs(docs, "text", "doc_id", 0.6, 2)
    amortized = dedup.minhash_accuracy_audit(
        docs, "text", "doc_id", threshold=0.6, pairs=pairs
    ).collect()[0]
    assert standalone.asDict() == amortized.asDict()
    assert standalone["n_pairs"] >= 1


def test_prefix_jaccard_bitset_matches_array_verify(spark):
    """The small-vocab bitset verification (r11) must return EXACTLY the
    array_intersect path's rows — same pairs, same jaccard values."""
    import random

    rng = random.Random(7)
    vocab = [f"w{i}" for i in range(40)]
    docs = spark.createDataFrame(
        [
            (i, " ".join(rng.choices(vocab, k=rng.randint(5, 30))))
            for i in range(60)
        ],
        "doc_id long, text string",
    )
    bits = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", 0.5, 1
        ).collect()
    }
    arrs = {
        (r["id_a"], r["id_b"], r["jaccard"])
        for r in dedup.prefix_filter_jaccard_pairs(
            docs, "text", "doc_id", 0.5, 1, bitset_max_vocab=0
        ).collect()
    }
    assert bits == arrs and bits


# --- vocabulary growth ------------------------------------------------------


def test_vocab_growth_hand_curve(spark):
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a c"), (3, "d")], "doc_id long, text string"
    )
    rows = {r["bucket"]: r for r in textops.vocab_growth_curve(docs, "text", "doc_id", 3).collect()}
    assert rows[1]["new_types"] == 2 and rows[1]["cum_types"] == 2
    assert rows[2]["new_types"] == 1 and rows[2]["cum_types"] == 3
    assert rows[3]["new_types"] == 1 and rows[3]["cum_types"] == 4


def test_vocab_growth_stale_bucket_absent(spark):
    # bucket 2 introduces nothing -> no row for it (documented contract)
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c")], "doc_id long, text string"
    )
    rows = {r["bucket"]: r for r in textops.vocab_growth_curve(docs, "text", "doc_id", 3).collect()}
    assert set(rows) == {1, 3}
    assert rows[3]["cum_types"] == 3


# --- Fisher separation ------------------------------------------------------


def test_fisher_perfectly_separated_dimension(spark):
    # dim 1 separates labels exactly (within_var = 0 -> fisher null/inf
    # guarded by data); dim 2 is identical across classes (between = 0)
    rows = [
        (1, [0.0, 4.0], 0), (2, [0.0, 6.0], 0),
        (3, [1.0, 4.0], 1), (4, [1.0, 6.0], 1),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    from flashml_spark.operators import similarity
    out = {r["dim"]: r for r in similarity.fisher_separation(df, "embedding", "label", "vec_id").collect()}
    assert out[1]["between_var"] == 0.25 and out[1]["within_var"] == 0.0
    assert out[1]["fisher"] is None  # zero within-class variance -> NULL
    assert out[2]["between_var"] == 0.0 and out[2]["fisher"] == 0.0


def test_split_leakage_group_hash_is_leak_free(spark):
    rows = [(i, i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    out = {r["method"]: r for r in sampling.split_leakage_audit(df, "user_id", "event_id").collect()}
    assert out["group_hash"]["leaked_groups"] == 0
    assert out["row_hash"]["n_groups"] == 7
    # 7 groups x ~28 rows each under independent 80/10/10 assignment:
    # leakage is near-certain; assert the audit actually detects it
    assert out["row_hash"]["leaked_groups"] > 0


# --- Mann-Whitney / Benford / autocorrelation -------------------------------


def test_mannwhitney_hand_values(spark):
    from flashml_spark.operators import relational

    df = spark.createDataFrame(
        [(3.0, 1), (4.0, 1), (1.0, 0), (2.0, 0)], "v double, f int"
    )
    row = relational.mann_whitney_u(df, "v", F.col("f") == 1).collect()[0]
    # every A value beats every B value: U = nA*nB = 4
    assert row["u_stat"] == 4.0 and row["n_a"] == 2 and row["n_b"] == 2
    assert row["z"] > 0


def test_mannwhitney_all_tied_z_is_null(spark):
    from flashml_spark.operators import relational

    df = spark.createDataFrame([(1.0, 1), (1.0, 1), (1.0, 0), (1.0, 0)], "v double, f int")
    row = relational.mann_whitney_u(df, "v", F.col("f") == 1).collect()[0]
    assert row["u_stat"] == 2.0  # all ties count half: 2 * (2/2)
    assert row["z"] is None  # tie-corrected variance collapses to zero


def test_benford_digits_and_exclusions(spark):
    from flashml_spark.operators import relational

    vals = [float(d) for d in range(1, 10)] + [19.5, 0.4]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    out = {r["digit"]: r for r in relational.benford_audit(df, "v").collect()}
    # 0.4 excluded; 19.5 contributes digit 1 -> ten values total
    assert sum(r["n"] for r in out.values()) == 10
    assert out[1]["n"] == 2 and out[9]["n"] == 1
    assert out[1]["p_exp"] == 0.30103  # log10(2) rounded to 6


def test_autocorr_linear_and_constant(spark):
    from flashml_spark.operators import relational

    lin = spark.createDataFrame([(i, float(i)) for i in range(10)], "t int, y double")
    row = relational.series_autocorr(lin, "t", "y").collect()[0]
    assert row["n_pairs"] == 9 and row["autocorr"] == 1.0
    const = spark.createDataFrame([(i, 5.0) for i in range(10)], "t int, y double")
    row = relational.series_autocorr(const, "t", "y").collect()[0]
    assert row["autocorr"] is None  # zero variance


# --- BFS hop labels ---------------------------------------------------------


def test_bfs_hand_graph(spark):
    from flashml_spark.operators import graph

    # path graph 1-2-3-4-5 plus isolated 9
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (9, 9)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hop"] for r in graph.bfs_hops(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops away; 9 unreachable


def test_bfs_min_hop_on_cycle(spark):
    from flashml_spark.operators import graph

    # triangle: both neighbors at hop 1, never revisited at hop 2
    edges = spark.createDataFrame([(1, 2), (2, 3), (3, 1)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = {r["node"]: r["hop"] for r in graph.bfs_hops(edges, seeds, max_hops=5).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


def test_bfs_early_stop_on_empty_frontier(spark):
    from flashml_spark.operators import graph

    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    seeds = spark.createDataFrame([(1,)], "node long")
    out = graph.bfs_hops(edges, seeds, max_hops=50)
    assert {(r["node"], r["hop"]) for r in out.collect()} == {(1, 0), (2, 1)}


def test_bfs_driver_path_matches_distributed(spark):
    # the r11 bounded driver BFS must be row-identical to the
    # distributed loop on the same graph (multi-seed, unreachable
    # component, isolated seed, min-hop ties via two routes)
    import random

    from flashml_spark.operators import graph

    rng = random.Random(7)
    e = {(rng.randrange(40), rng.randrange(40)) for _ in range(120)}
    edges = spark.createDataFrame(
        [(a, b) for a, b in sorted(e)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(0,), (77,)], "node long")  # 77 isolated
    for hops in (0, 1, 3):
        drv = {
            (r["node"], r["hop"])
            for r in graph.bfs_hops(edges, seeds, max_hops=hops).collect()
        }
        dist = {
            (r["node"], r["hop"])
            for r in graph.bfs_hops(
                edges, seeds, max_hops=hops, driver_edge_budget=0
            ).collect()
        }
        assert drv == dist, hops
        assert (77, 0) in drv
    # empty edge frame: seeds at hop 0, nothing else
    empty = spark.createDataFrame([], "src long, dst long")
    out = {
        (r["node"], r["hop"])
        for r in graph.bfs_hops(empty, seeds, max_hops=2).collect()
    }
    assert out == {(0, 0), (77, 0)}


# --- chunk retrieval --------------------------------------------------------


def test_chunk_bm25_prefers_concentrated_chunk(spark):
    # one long doc with the query term buried once vs a short doc that is
    # entirely on-topic: the short chunk must outrank the diluted one
    long_text = " ".join(["filler"] * 30 + ["target"] + ["filler"] * 30)
    docs = spark.createDataFrame(
        [(1, long_text), (2, "target target target")], "doc_id long, text string"
    )
    rows = textops.chunk_bm25_topk(
        docs, "text", "doc_id", ["target"], chunk_size=16, stride=16, k=5
    ).collect()
    assert rows[0]["doc_id"] == 2 and rows[0]["chunk_idx"] == 0
    # only chunks containing the term appear at all
    assert all(r["bm25"] > 0 for r in rows)


def test_chunk_bm25_provenance_points_at_right_window(spark):
    # term sits in tokens 24..27 -> stride-16 windows 1 (16..31) and
    # possibly 0 end-overlap; window 0 covers 0..15 -> no hit
    text = " ".join(["pad"] * 24 + ["needle"] * 4 + ["pad"] * 4)
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = textops.chunk_bm25_topk(
        docs, "text", "doc_id", ["needle"], chunk_size=16, stride=16, k=5
    ).collect()
    assert {r["chunk_idx"] for r in rows} == {1}


# --- CUPED / conversion window ----------------------------------------------


def test_cuped_reduces_variance_when_correlated(spark):
    # post = pre + small noise, variants balanced: adjusted means converge
    rows = []
    for u in range(40):
        pre = float(u % 10)
        rows.append((u, "2024-01-01 00:00:00", pre))
        rows.append((u, "2024-02-01 00:00:00", pre * 2 + (u % 2) * 0.1))
    df = spark.createDataFrame(
        rows, "user_id long, ts string, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["variant"]: r for r in events.cuped_adjusted_means(
        df, "user_id", "ts", "value", split_ts="2024-01-16"
    ).collect()}
    # theta ~ 2 (post tracks pre 2:1); adjusted means strip the pre signal,
    # leaving only the +0.1 arm effect
    assert abs(out[0]["theta"] - 2.0) < 0.05
    gap_raw = abs(out[1]["mean_post"] - out[0]["mean_post"])
    gap_adj = abs(out[1]["mean_adjusted"] - out[0]["mean_adjusted"])
    assert abs(gap_adj - 0.1) < 0.05
    assert gap_adj <= gap_raw + 1e-9


def test_cuped_zero_pre_variance_theta_null(spark):
    df = spark.createDataFrame(
        [(1, "2024-02-01 00:00:00", 5.0), (2, "2024-02-02 00:00:00", 7.0)],
        "user_id long, ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = events.cuped_adjusted_means(df, "user_id", "ts", "value", "2024-01-16").collect()
    assert all(r["theta"] is None for r in out)
    for r in out:
        assert r["mean_adjusted"] == r["mean_post"]  # no covariate, no shift


def test_conversion_window_hand_cases(spark):
    rows = [
        # u1 converts: click 0s, purchase 30m later
        (1, 1, "click", "2024-01-01 00:00:00"),
        (2, 1, "purchase", "2024-01-01 00:30:00"),
        # u2 too late: purchase 2h after click
        (3, 2, "click", "2024-01-01 00:00:00"),
        (4, 2, "purchase", "2024-01-01 02:00:00"),
        # u3 wrong order: purchase BEFORE the click
        (5, 3, "purchase", "2024-01-01 00:00:00"),
        (6, 3, "click", "2024-01-01 00:10:00"),
        # u4 never clicks -> not in the denominator
        (7, 4, "purchase", "2024-01-01 00:00:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    row = events.conversion_within_window(df).collect()[0]
    assert row["n_clickers"] == 3 and row["n_converted"] == 1
    assert row["conv_rate"] == round(1 / 3, 6)


# --- corpus card ------------------------------------------------------------


def test_corpus_card_hand_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "one two three", "en", "s1"),
            (2, "one two three", "en", "s1"),   # exact dup
            (3, "tiny", "de", "s2"),            # short doc (< 10 tokens... all are)
            (4, None, "de", "s2"),              # null text
        ],
        "doc_id long, text string, lang string, source string",
    )
    row = textops.corpus_card(docs).collect()[0]
    assert row["n_docs"] == 4 and row["n_null_text"] == 1
    assert row["n_distinct_texts"] == 2
    assert row["dup_rate"] == round(1 - 2 / 3, 6)
    assert row["total_tokens"] == 7 and row["short_doc_share"] == 1.0
    assert row["n_langs"] == 2 and row["n_sources"] == 2
    assert row["top_lang_share"] == 0.5


# --- TTL dedup --------------------------------------------------------------


def test_ttl_dedup_burst_extends_horizon(spark):
    rows = [
        (1, 9, "submit", "payload", "2024-01-01 00:00:00"),
        (2, 9, "submit", "payload", "2024-01-01 00:50:00"),  # dup of #1
        (3, 9, "submit", "payload", "2024-01-01 01:40:00"),  # 100m from #1 but
                                                             # 50m from #2 -> dup
        (4, 9, "submit", "payload", "2024-01-01 04:00:00"),  # horizon expired
        (5, 9, "submit", "other", "2024-01-01 00:10:00"),    # different payload
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, props string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r["is_dup"] for r in dedup.ttl_dedup_flags(
        df, ["user_id", "event_type", "props"], "ts", "event_id", 3600
    ).collect()}
    assert out == {1: 0, 2: 1, 3: 1, 4: 0, 5: 0}


def test_ttl_dedup_null_payload_is_its_own_key(spark):
    rows = [
        (1, 9, "submit", None, "2024-01-01 00:00:00"),
        (2, 9, "submit", None, "2024-01-01 00:10:00"),  # dup of the NULL key
        (3, 9, "submit", "", "2024-01-01 00:20:00"),    # '' == NULL under the
                                                        # null-safe digest -> dup
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, props string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = {r["event_id"]: r["is_dup"] for r in dedup.ttl_dedup_flags(
        df, ["user_id", "event_type", "props"], "ts", "event_id", 3600
    ).collect()}
    assert out == {1: 0, 2: 1, 3: 1}


def test_ttl_dedup_anchor_first_reemits_long_chain(spark):
    # A retry chain spanning more than one horizon: the default
    # refreshing mode flags it end-to-end; anchor="first"
    # (dropDuplicatesWithinWatermark semantics) re-emits the first row
    # past anchor + horizon as a new anchor.
    rows = [
        (1, 9, "submit", "payload", "2024-01-01 00:00:00"),  # anchor
        (2, 9, "submit", "payload", "2024-01-01 00:50:00"),  # within 1h of #1
        (3, 9, "submit", "payload", "2024-01-01 01:40:00"),  # 100m from #1:
        # beyond the FIRST anchor's horizon -> new anchor under "first",
        # but 50m from #2 -> still dup under refreshing default
        (4, 9, "submit", "payload", "2024-01-01 02:20:00"),  # 40m from #3
        (5, 9, "submit", "payload", "2024-01-01 06:00:00"),  # horizon expired
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, props string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    keys = ["user_id", "event_type", "props"]
    refresh = {r["event_id"]: r["is_dup"] for r in dedup.ttl_dedup_flags(
        df, keys, "ts", "event_id", 3600
    ).collect()}
    first = {r["event_id"]: r["is_dup"] for r in dedup.ttl_dedup_flags(
        df, keys, "ts", "event_id", 3600, anchor="first"
    ).collect()}
    assert refresh == {1: 0, 2: 1, 3: 1, 4: 1, 5: 0}
    assert first == {1: 0, 2: 1, 3: 0, 4: 1, 5: 0}


def test_ttl_dedup_anchor_first_matches_refresh_on_short_chains(spark):
    # When no chain spans the horizon the two anchor modes agree.
    rows = [
        (1, 9, "submit", "p", "2024-01-01 00:00:00"),
        (2, 9, "submit", "p", "2024-01-01 00:30:00"),
        (3, 9, "submit", "p", "2024-01-01 03:00:00"),
        (4, 9, "submit", "q", "2024-01-01 00:10:00"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, props string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    keys = ["user_id", "event_type", "props"]
    refresh = {r["event_id"]: r["is_dup"] for r in dedup.ttl_dedup_flags(
        df, keys, "ts", "event_id", 3600
    ).collect()}
    first = {r["event_id"]: r["is_dup"] for r in dedup.ttl_dedup_flags(
        df, keys, "ts", "event_id", 3600, anchor="first"
    ).collect()}
    assert refresh == first == {1: 0, 2: 1, 3: 0, 4: 0}


# --- batch retrieval --------------------------------------------------------


def test_multi_query_bm25_matches_single_query_path(spark):
    docs = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "alpha alpha delta"), (3, "beta beta beta")],
        "doc_id long, text string",
    )
    batch = textops.multi_query_bm25(docs, "text", "doc_id", {7: ["alpha"]}, k=10)
    single = textops.bm25_topk(docs, "text", "doc_id", ["alpha"], k=10)
    got = sorted((r["doc_id"], r["bm25"]) for r in batch.collect())
    want = sorted((r["doc_id"], r["bm25"]) for r in single.collect())
    assert got == want  # batch path == dedicated single-query path


def test_multi_query_bm25_isolates_queries(spark):
    docs = spark.createDataFrame(
        [(1, "foo only here"), (2, "bar only there")], "doc_id long, text string"
    )
    out = textops.multi_query_bm25(
        docs, "text", "doc_id", {1: ["foo"], 2: ["bar"]}, k=5
    ).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["doc_id"])
    assert by_q == {1: {1}, 2: {2}}


# --- data-quality audits ----------------------------------------------------


def test_referential_integrity_hand_case(spark):
    from flashml_spark.operators import relational

    parent = spark.createDataFrame([(1,), (2,), (3,)], "k long")
    child = spark.createDataFrame([(1,), (1,), (9,)], "fk long")
    row = relational.referential_integrity_audit(parent, child, "k", "fk").collect()[0]
    assert row["n_parents"] == 3 and row["n_children"] == 3
    assert row["childless_parents"] == 2  # keys 2 and 3
    assert row["orphan_children"] == 1    # fk 9


def test_referential_integrity_is_lazy(spark):
    # r4 ADVICE regression: the audit must be ONE deferred plan — no
    # eager .count() jobs at build time, and re-evaluation must see
    # input changes (baked literals would go stale).
    from flashml_spark.operators import relational

    tracker = spark.sparkContext.statusTracker()
    before = len(tracker.getJobIdsForGroup(None) or [])
    parent = spark.createDataFrame([(1,), (2,)], "k long")
    child = spark.createDataFrame([(1,), (9,)], "fk long")
    audit = relational.referential_integrity_audit(parent, child, "k", "fk")
    after = len(tracker.getJobIdsForGroup(None) or [])
    assert after == before, "building the audit frame ran Spark jobs"
    row = audit.collect()[0]
    assert (row["childless_parents"], row["orphan_children"]) == (1, 1)


def test_profile_columns_hand_case(spark):
    from flashml_spark.operators import relational

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "a")], "x long, y string"
    )
    out = {r["col_name"]: r for r in relational.profile_columns(df, ["x", "y"]).collect()}
    assert out["x"]["n_rows"] == 3 and out["x"]["n_nulls"] == 0
    assert out["x"]["n_distinct"] == 2
    assert out["y"]["n_nulls"] == 1 and out["y"]["null_frac"] == round(1 / 3, 6)
    assert out["y"]["n_distinct"] == 1  # distinct skips NULL, SQL semantics


# --- edit-distance regression -----------------------------------------------


def test_edit_distance_cross_length_segmentation_regression(spark):
    """Hypothesis-found soundness bug: 'baa' vs 'b aa' (1 insertion) was
    MISSED when probes used the probing doc's own segment geometry —
    segment boundaries depend on string length, so probes must be
    emitted for every partner length within +-k.  Pinned explicitly so
    the case outlives the hypothesis example database."""
    df = spark.createDataFrame(
        [(0, "baa"), (1, "b aa"), (2, "zzzzz")], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], r["edits"])
        for r in dedup.edit_distance_pairs(df, "text", "doc_id", max_edits=1).collect()
    }
    assert got == {(0, 1, 1)}


def test_edit_distance_cross_length_k2(spark):
    # two inserts spread across both halves: lengths 4 vs 6
    df = spark.createDataFrame(
        [(0, "abcd"), (1, "xabcyd")], "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"], r["edits"])
        for r in dedup.edit_distance_pairs(df, "text", "doc_id", max_edits=2).collect()
    }
    assert got == {(0, 1, 2)}
