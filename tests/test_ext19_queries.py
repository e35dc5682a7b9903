"""Unit tests for the round-9 extension operators (x255-x262) —
constructed-fixture arithmetic, python mirrors, and planted-signal
checks; the SQL oracles are covered by scripts/verify_replay.py."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


# --- x255 PNG roundtrip audit ------------------------------------------------


def test_png_roundtrip_audit_matches_direct_codec_calls(spark):
    from flashml_spark.functions import codecs
    from flashml_spark.operators.multimodal import png_roundtrip_audit

    ids = [0, 1, 2, 3, 4, 7, 12, 23]
    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    got = {r["media_id"]: r for r in png_roundtrip_audit(df).collect()}
    for i in ids:
        w, h = 8 + i % 9, 4 + 2 * (i % 3)
        top = ((i * 37) % 256, (i * 59) % 256, (i * 83) % 256)
        bot = ((i * 41 + 7) % 256, (i * 61 + 13) % 256, (i * 89 + 29) % 256)
        rows = [[top] * w for _ in range(h // 2)] + [
            [bot] * w for _ in range(h // 2)
        ]
        expect = codecs.average_hash(codecs.png_grayscale(rows))
        assert (got[i]["width"], got[i]["height"]) == (w, h)
        assert got[i]["phash"] == expect
    # the id mix above covers all five scanline filter types
    assert {i % 5 for i in ids} == {0, 1, 2, 3, 4}


def test_png_roundtrip_audit_two_tone_hash_logic(spark):
    # the oracle's CASE: all-set when lumas tie, low-32 when top is
    # brighter, high-32 otherwise
    from flashml_spark.operators.multimodal import png_roundtrip_audit

    df = spark.createDataFrame([(i,) for i in range(60)], "doc_id long")
    for r in png_roundtrip_audit(df).collect():
        i = r["media_id"]
        lt = (
            ((i * 37) % 256) * 299
            + ((i * 59) % 256) * 587
            + ((i * 83) % 256) * 114
        ) // 1000
        lb = (
            ((i * 41 + 7) % 256) * 299
            + ((i * 61 + 13) % 256) * 587
            + ((i * 89 + 29) % 256) * 114
        ) // 1000
        expect = (
            "f" * 16
            if lt == lb
            else ("00000000ffffffff" if lt > lb else "ffffffff00000000")
        )
        assert r["phash"] == expect, f"id {i}: lt={lt} lb={lb}"


# --- x256 temperature mixture ------------------------------------------------


def test_temperature_mixture_sqrt_exact_and_epochs(spark):
    from flashml_spark.operators.sampling import temperature_mixture_weights

    # perfect squares: sqrt exact, weights on clean ratios
    rows = [("a", 100), ("b", 400)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {
        r["source"]: r
        for r in temperature_mixture_weights(
            df, "source", "n_tokens", alpha=0.5, budget_frac=0.5
        ).collect()
    }
    assert out["a"]["weight"] == pytest.approx(1 / 3, abs=1e-6)
    assert out["b"]["weight"] == pytest.approx(2 / 3, abs=1e-6)
    # eff_epochs = 0.5 * 500 * w / n: small source oversampled 2x more
    assert out["a"]["eff_epochs"] == pytest.approx(
        0.5 * 500 * (1 / 3) / 100, abs=1e-6
    )
    assert out["b"]["eff_epochs"] == pytest.approx(
        0.5 * 500 * (2 / 3) / 400, abs=1e-6
    )
    assert out["a"]["eff_epochs"] > out["b"]["eff_epochs"]


def test_temperature_mixture_weights_sum_to_one(spark):
    from flashml_spark.operators.sampling import temperature_mixture_weights

    rows = [(f"s{i}", 10 + 37 * i) for i in range(12)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = temperature_mixture_weights(df, "source", "n_tokens").collect()
    assert sum(r["weight"] for r in out) == pytest.approx(1.0, abs=1e-4)
    # alpha < 1 flattens: weight ordering follows n but ratios compress
    ws = {r["source"]: r["weight"] for r in out}
    ns = dict(rows)
    assert ws["s11"] / ws["s0"] < ns["s11"] / ns["s0"]


# --- x257 shard checksum manifest --------------------------------------------


def test_shard_checksum_matches_python_mirror_and_flips_on_change(spark):
    from flashml_spark.operators.textops import shard_checksum_manifest

    rows = [(i, f"doc number {i} body") for i in range(20)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["shard"]: r for r in shard_checksum_manifest(df, "doc_id", "text").collect()}

    mod = (1 << 61) - 1
    expect: dict[int, int] = {}
    for i, t in rows:
        h = int(hashlib.md5(f"{i}:{t}".encode()).hexdigest()[:15], 16)
        expect[i % 8] = (expect.get(i % 8, 0) + h) % mod
    for s, r in out.items():
        assert r["checksum"] == expect[s]
        assert r["n_docs"] == len([i for i, _ in rows if i % 8 == s])
    # single-row content flip changes exactly that shard's checksum
    rows2 = [(i, t if i != 5 else t + "!") for i, t in rows]
    out2 = {
        r["shard"]: r["checksum"]
        for r in shard_checksum_manifest(
            spark.createDataFrame(rows2, "doc_id long, text string"),
            "doc_id",
            "text",
        ).collect()
    }
    assert out2[5 % 8] != out[5 % 8]["checksum"]
    assert all(out2[s] == out[s]["checksum"] for s in out if s != 5 % 8)


# --- x258 RAG chunk plan ------------------------------------------------------


def test_rag_chunk_plan_exact_arithmetic(spark):
    from flashml_spark.operators.textops import rag_chunk_plan

    def doc(n):
        return " ".join(f"t{j}" for j in range(n))

    rows = [
        ("a", doc(10)),   # 1 chunk, indexed 10
        ("a", doc(64)),   # 1 chunk, indexed 64
        ("a", doc(65)),   # 2 chunks, indexed 64 + (65-48) = 81
        ("b", doc(160)),  # ceil(96/48)+1 = 3 chunks, indexed 2*64 + (160-96) = 192
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in rag_chunk_plan(df, "text", "source").collect()}
    a = out["a"]
    assert (a["n_docs"], a["n_chunks"], a["single_chunk_docs"]) == (3, 4, 2)
    assert a["raw_tokens"] == 10 + 64 + 65
    assert a["indexed_tokens"] == 10 + 64 + 81
    assert a["overlap_frac"] == pytest.approx(
        (155 - 139) / 155, abs=1e-6
    )
    b = out["b"]
    assert (b["n_chunks"], b["indexed_tokens"], b["raw_tokens"]) == (3, 192, 160)


def test_rag_chunk_plan_rejects_bad_stride(spark):
    from flashml_spark.operators.textops import rag_chunk_plan

    df = spark.createDataFrame([("a", "x")], "source string, text string")
    with pytest.raises(ValueError, match="stride"):
        rag_chunk_plan(df, "text", "source", chunk_tokens=32, stride=40)


# --- x259 PQ codebook audit ---------------------------------------------------


def test_pq_audit_counts_and_python_mirror(spark):
    import random

    from flashml_spark.operators.similarity import pq_codebook, pq_codebook_audit

    rng = random.Random(5)
    n, dim = 60, 64
    vecs = [[rng.uniform(-1, 1) for _ in range(dim)] for _ in range(n)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    out = pq_codebook_audit(df, "embedding", subspaces=4, codes=4).collect()
    # every vector lands in exactly one cell per subspace
    assert sum(r["n_vecs"] for r in out) == 4 * n

    book = pq_codebook(dim, 4, 4)
    counts: dict[tuple[int, int], int] = {}
    for v in vecs:
        for m in range(4):
            xm = v[m * 16 : (m + 1) * 16]
            best_k, best_d = 0, None
            for k in range(4):
                c = book[m][k]
                d = round(
                    sum(x * x for x in xm)
                    - 2.0 * sum(x * y for x, y in zip(xm, c))
                    + sum(y * y for y in c),
                    6,
                )
                if best_d is None or d < best_d:
                    best_k, best_d = k, d
            counts[(m, best_k)] = counts.get((m, best_k), 0) + 1
    got = {(r["subspace"], r["code"]): r["n_vecs"] for r in out}
    assert got == counts


# --- x260 MAD outlier screen ---------------------------------------------------


def test_mad_screen_flags_planted_outlier(spark):
    from flashml_spark.operators.textops import mad_outlier_screen

    vals = [100, 102, 98, 101, 99, 103, 97, 100, 5000]  # one monster
    rows = [("en", v) for v in vals] + [("de", v) for v in (50, 52, 48)]
    df = spark.createDataFrame(rows, "lang string, n_chars long")
    out = {r["lang"]: r for r in mad_outlier_screen(df, "lang", "n_chars").collect()}
    en = out["en"]
    assert en["med"] == 100.0
    assert en["n_outliers"] == 1  # only the 5000
    de = out["de"]
    assert de["med"] == 50.0 and de["n_outliers"] == 0


def test_mad_screen_median_grid_is_exact(spark):
    # even-count group: interpolated median lands on .5 exactly
    from flashml_spark.operators.textops import mad_outlier_screen

    df = spark.createDataFrame(
        [("x", v) for v in (1, 2, 3, 4)], "lang string, n_chars long"
    )
    r = mad_outlier_screen(df, "lang", "n_chars").first()
    assert r["med"] == 2.5
    assert r["mad"] == 1.0  # devs 1.5,0.5,0.5,1.5 -> median 1.0
    assert r["n_outliers"] == 0


# --- x261 semi-hard negatives ---------------------------------------------------


def test_semihard_negatives_excludes_clones_and_disjoint(spark):
    from flashml_spark.operators.dedup import semihard_negative_pairs

    base = " ".join(f"w{j}" for j in range(30))
    rows = [
        (1, base),
        (2, base),  # exact clone of 1: agrees 8/8 -> excluded (k > hi)
        (3, " ".join(f"q{j}" for j in range(30))),  # disjoint: no band
        # partial overlap with 1: shares a long prefix
        (4, " ".join(f"w{j}" for j in range(18)) + " "
            + " ".join(f"z{j}" for j in range(12))),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = semihard_negative_pairs(df, "text", "doc_id").collect()
    ks = {r["k_agree"] for r in out}
    assert all(2 <= k <= 5 for k in ks)
    # the clone pair (k=8) and disjoint docs never appear; totals are
    # bounded by the possible mixed pairs
    total = sum(r["n_pairs"] for r in out)
    assert total <= 4  # pairs among {1,2,4} minus the k=8 clone pair


def test_semihard_histogram_matches_bruteforce_signatures(spark):
    from flashml_spark.operators.dedup import (
        minhash_lsh_candidates,
        semihard_negative_pairs,
        with_minhash_signature,
    )

    rows = [
        (i, " ".join(f"w{(i * 5 + j) % 40}" for j in range(16)))
        for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["k_agree"]: r["n_pairs"]
        for r in semihard_negative_pairs(df, "text", "doc_id").collect()
    }
    sig = {
        r["doc_id"]: tuple(r[f"sig{i}"] for i in range(8))
        for r in with_minhash_signature(df, "text", 8, 2).collect()
    }
    cands = minhash_lsh_candidates(df, "text", "doc_id", 8, 4, 2).collect()
    expect: dict[int, int] = {}
    for r in cands:
        k = sum(
            1 for x, y in zip(sig[r["id_a"]], sig[r["id_b"]]) if x == y
        )
        if 2 <= k <= 5:
            expect[k] = expect.get(k, 0) + 1
    assert out == expect


# --- x262 dedup survivorship ----------------------------------------------------


def test_dedup_survivorship_accounts_planted_clones(spark):
    from flashml_spark.operators.dedup import dedup_survivorship

    uniq = [
        (i, f"clean {i} " + " ".join(f"u{i}_{j}" for j in range(12)), "clean")
        for i in range(6)
    ]
    base = " ".join(f"d{j}" for j in range(12))
    dupes = [(100 + i, base, "dupey") for i in range(4)]  # 4 exact clones
    df = spark.createDataFrame(
        uniq + dupes, "doc_id long, text string, source string"
    )
    out = {r["source"]: r for r in dedup_survivorship(df, "text", "doc_id", "source").collect()}
    d = out["dupey"]
    assert (d["n_docs"], d["n_kept"], d["n_removed"]) == (4, 1, 3)
    assert d["removed_frac"] == pytest.approx(0.75, abs=1e-6)
    assert d["tokens_kept"] * 4 == d["tokens_total"]
    c = out["clean"]
    assert c["n_removed"] == 0 and c["tokens_kept"] == c["tokens_total"]
    # invariants
    for r in out.values():
        assert r["n_kept"] + r["n_removed"] == r["n_docs"]
        assert r["tokens_kept"] <= r["tokens_total"]


# --- streaming manifest twin ------------------------------------------------


def test_streaming_shard_checksum_converges_to_batch_manifest(spark, tmp_path):
    """The commutative-checksum design pays off: the streaming manifest
    over two micro-batches converges EXACTLY (integer-equal, not
    approx) to the batch manifest of the union — same per-row term
    (functions.hashing.content_checksum_term), summed order-free."""
    import time

    from flashml_spark.operators.textops import shard_checksum_manifest
    from flashml_spark.streaming import streaming_shard_checksum

    rows1 = [(i, f"body {i} alpha") for i in range(0, 30)]
    rows2 = [(i, f"body {i} beta") for i in range(30, 50)]

    def _frame(rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    src = str(tmp_path / "docs_src")
    _frame(rows1).coalesce(1).write.mode("append").parquet(src)
    time.sleep(1.1)
    _frame(rows2).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(_frame(rows1).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        streaming_shard_checksum(stream, "doc_id", "text", n_shards=4)
        .writeStream.format("memory")
        .queryName("manifest_stream")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["shard"]: (r["n_docs"], r["total_chars"], r["checksum"])
        for r in spark.sql(
            "SELECT shard, n_docs, total_chars, checksum FROM manifest_stream "
            "WHERE (shard, n_docs) IN "
            "(SELECT shard, MAX(n_docs) FROM manifest_stream GROUP BY shard)"
        ).collect()
    }
    batch = {
        r["shard"]: (r["n_docs"], r["total_chars"], r["checksum"])
        for r in shard_checksum_manifest(
            _frame(rows1 + rows2), "doc_id", "text", n_shards=4
        ).collect()
    }
    assert got == batch  # integer-exact convergence, all shards


# --- x263 source vocab divergence ---------------------------------------------


def test_tv_divergence_identical_sources_zero_disjoint_near_one(spark):
    from flashml_spark.operators.textops import source_vocab_divergence

    same = "alpha beta gamma delta alpha beta"
    rows = (
        [("a", same)] * 3
        + [("b", same)] * 3
        + [("c", "zeta eta theta iota zeta eta")] * 3
    )
    df = spark.createDataFrame(rows, "source string, text string")
    out = {
        (r["src_a"], r["src_b"]): r["tv_divergence"]
        for r in source_vocab_divergence(df, "text", "source").collect()
    }
    assert out[("a", "b")] == pytest.approx(0.0, abs=1e-6)
    # fully disjoint vocabularies: TV = 1 (both distributions fit in
    # the top-20 vocab, so no mass hides in __other__)
    assert out[("a", "c")] == pytest.approx(1.0, abs=1e-4)
    assert out[("b", "c")] == out[("a", "c")]
    # symmetric pairs emitted once, src_a < src_b
    assert all(a < b for a, b in out)


def test_tv_divergence_counts_missing_vocab_tokens(spark):
    # regression for the densification fix: a token present in one
    # source and absent in the other must contribute its full |p - 0|
    from flashml_spark.operators.textops import source_vocab_divergence

    rows = [("a", "x x x x"), ("b", "x x x y")]
    df = spark.createDataFrame(rows, "source string, text string")
    r = source_vocab_divergence(df, "text", "source", top_k=5).first()
    # p_a = {x:1.0}; p_b = {x:.75, y:.25}; TV = (|1-.75| + |0-.25|)/2 = .25
    assert r["tv_divergence"] == pytest.approx(0.25, abs=1e-6)


# --- x264 dup cluster histogram -------------------------------------------------


def test_dup_cluster_histogram_planted_sizes(spark):
    from flashml_spark.operators.dedup import neardup_cluster_size_histogram

    def words(tag, n=14):
        return " ".join(f"{tag}{j}" for j in range(n))

    rows = (
        [(i, words("a")) for i in range(3)]          # one 3-cluster
        + [(10 + i, words("b")) for i in range(2)]   # one 2-cluster
        + [(20 + i, words("c")) for i in range(2)]   # another 2-cluster
        + [(30 + i, words(f"u{i}")) for i in range(5)]  # singletons
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["cluster_size"]: r["n_clusters"]
        for r in neardup_cluster_size_histogram(df, "text", "doc_id").collect()
    }
    assert out == {2: 2, 3: 1}


# --- x265 embedding isotropy ------------------------------------------------------


def test_isotropy_detects_coned_vs_centered(spark):
    import random

    from flashml_spark.operators.similarity import embedding_isotropy_audit

    rng = random.Random(11)
    centered = [
        (i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(80)
    ]
    coned = [
        (i, [5.0 + rng.gauss(0, 0.3) for _ in range(16)]) for i in range(80)
    ]
    schema = "vec_id long, embedding array<double>"
    r_cent = embedding_isotropy_audit(
        spark.createDataFrame(centered, schema), "embedding"
    ).first()
    r_cone = embedding_isotropy_audit(
        spark.createDataFrame(coned, schema), "embedding"
    ).first()
    assert r_cone["mean_cos_to_centroid"] > 0.98  # everything in a cone
    assert r_cent["mean_cos_to_centroid"] < 0.6   # roughly isotropic
    assert r_cent["n_vecs"] == r_cone["n_vecs"] == 80
    # centroid norm of the centered cloud is near 0 vs the cone's ~20
    assert r_cent["centroid_norm"] < 1.0 < r_cone["centroid_norm"]


# --- x266 lexical diversity -------------------------------------------------------


def test_lexical_diversity_exact_counts(spark):
    from flashml_spark.operators.textops import lexical_diversity

    rows = [
        ("a", "w w w x"),        # tokens 4, types 2, hapax {x}
        ("a", "y"),              # +1 token, +1 type, hapax {y}
        ("b", "p q r"),          # all hapax
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    out = {r["source"]: r for r in lexical_diversity(df, "text", "source").collect()}
    a = out["a"]
    assert (a["n_tokens"], a["n_types"], a["n_hapax"]) == (5, 3, 2)
    assert a["ttr"] == pytest.approx(3 / 5, abs=1e-6)
    assert a["hapax_frac"] == pytest.approx(2 / 3, abs=1e-6)
    b = out["b"]
    assert (b["n_tokens"], b["n_types"], b["n_hapax"]) == (3, 3, 3)
    assert b["ttr"] == 1.0 and b["hapax_frac"] == 1.0


# --- x267 inter-arrival burstiness -------------------------------------------------


def test_burstiness_metronome_vs_bursty(spark):
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import interarrival_burstiness

    t0 = datetime(2024, 1, 1)
    rows = []
    # metronomic: exactly every 10s -> CV = 0
    for i in range(20):
        rows.append((i, t0 + timedelta(seconds=10 * i), 1, "tick", 0.0, "{}"))
    # bursty: gaps alternate 1s and 3600s -> CV >> 1? (CV ~ 1 for
    # alternating two-point; use extreme spread)
    t = t0
    for i in range(20):
        t = t + timedelta(seconds=1 if i % 2 else 3600)
        rows.append((100 + i, t, 2, "burst", 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    out = {r["event_type"]: r for r in interarrival_burstiness(df).collect()}
    assert out["tick"]["cv"] == 0.0
    assert out["tick"]["mean_gap_s"] == pytest.approx(10.0, abs=1e-6)
    assert out["burst"]["cv"] > 0.9
    assert out["tick"]["n_gaps"] == 19 and out["burst"]["n_gaps"] == 19


def test_burstiness_python_mirror(spark):
    import math as m
    import random
    from datetime import datetime, timedelta

    from flashml_spark.operators.events import interarrival_burstiness

    rng = random.Random(3)
    t0 = datetime(2024, 1, 1)
    rows = []
    gaps = []
    t = t0
    for i in range(30):
        g = rng.randint(1, 500)
        gaps.append(g)
        t = t + timedelta(seconds=g)
        rows.append((i, t, 7, "e", 0.0, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    r = interarrival_burstiness(df).first()
    d = [g * 1_000_000 for g in gaps[1:]]  # first row has no gap... 
    # careful: all 30 events are one stream; gaps BETWEEN events = 29,
    # which are gaps[1:] (gaps[0] is vs t0, not an event)
    n = len(d)
    sd, sdd = sum(d), sum(x * x for x in d)
    mean = sd / n
    cv = m.sqrt((n * sdd - sd * sd) / (n * (n - 1))) / mean
    assert r["n_gaps"] == n
    assert r["mean_gap_s"] == pytest.approx(mean / 1e6, abs=1e-5)
    assert r["cv"] == pytest.approx(cv, abs=1e-5)


# --- x268 bloom decontamination ----------------------------------------------


def test_bloom_screen_no_false_negatives_and_exact_accounting(spark):
    from flashml_spark.operators.textops import bloom_decontamination_screen

    train = [(i, f"train doc {i} body text") for i in range(200)]
    df = spark.createDataFrame(train, "doc_id long, text string")
    ev = df.where(F.col("doc_id") % 10 == 0)  # 20 true contaminants
    r = bloom_decontamination_screen(df, ev, "text", bits=4096, k=3).first()
    assert r["n_train"] == 200
    assert r["n_eval_digests"] == 20
    assert r["n_true"] == 20
    # Bloom filters have NO false negatives: every true contaminant is
    # flagged, so n_flagged = n_true + n_false_pos always
    assert r["n_flagged"] == r["n_true"] + r["n_false_pos"]
    assert r["n_flagged"] >= 20
    assert r["fp_rate"] == pytest.approx(r["n_false_pos"] / 180, abs=1e-6)


def test_bloom_screen_tiny_filter_forces_collisions(spark):
    # 64 bits / 3 hashes with 20 eval digests saturates the filter:
    # expected fp rate (1 - e^{-kn/m})^k is large — the MEASURED rate
    # must reflect that, proving the accounting catches collisions
    from flashml_spark.operators.textops import bloom_decontamination_screen

    train = [(i, f"doc {i} payload") for i in range(300)]
    df = spark.createDataFrame(train, "doc_id long, text string")
    ev = df.where(F.col("doc_id") % 15 == 0)
    r = bloom_decontamination_screen(df, ev, "text", bits=64, k=3).first()
    assert r["n_false_pos"] > 0
    assert r["fp_rate"] > 0.1
    assert r["n_flagged"] == r["n_true"] + r["n_false_pos"]


def test_bloom_screen_rejects_non_power_of_two(spark):
    from flashml_spark.operators.textops import bloom_decontamination_screen

    df = spark.createDataFrame([(1, "x")], "doc_id long, text string")
    with pytest.raises(ValueError, match="power of two"):
        bloom_decontamination_screen(df, df, "text", bits=1000)


# --- x269 constrained waterfill ------------------------------------------------


def test_constrained_waterfill_floors_caps_and_budget(spark):
    from flashml_spark.operators.sampling import (
        constrained_waterfill_allocation,
    )

    avail = {"a": 100, "b": 1000, "c": 1000, "d": 50}  # total 2150
    df = spark.createDataFrame(
        list(avail.items()), "source string, n_tokens long"
    )
    out = {
        r["source"]: r
        for r in constrained_waterfill_allocation(
            df, "source", "n_tokens",
            budget_frac=0.9, floor_frac=0.02, cap_frac=0.5,
        ).collect()
    }
    total = sum(avail.values())
    budget_micro = total * 900_000
    cap_micro = (total * 9 * 1_000_000) // 20
    for s, r in out.items():
        # floor honored exactly, cap never exceeded, alloc <= material
        assert r["floor_micro_tokens"] == avail[s] * 20_000
        assert r["alloc_micro_tokens"] >= r["floor_micro_tokens"]
        assert r["alloc_micro_tokens"] <= cap_micro
        assert r["alloc_micro_tokens"] <= avail[s] * 1_000_000
    got = sum(r["alloc_micro_tokens"] for r in out.values())
    # floor-division under-allocates by < n_uncapped micro-units
    assert 0 <= budget_micro - got < 4
    # small sources exhausted, big sources share the level above floor
    assert out["a"]["at_bound"] == 1
    assert out["a"]["alloc_micro_tokens"] == 100_000_000
    assert out["d"]["at_bound"] == 1
    assert (
        out["b"]["alloc_micro_tokens"] == out["c"]["alloc_micro_tokens"]
    )


def test_constrained_waterfill_cap_binds_dominant_source(spark):
    from flashml_spark.operators.sampling import (
        constrained_waterfill_allocation,
    )

    # one source holds ~91% of material; a 30%-of-budget cap must bind
    rows = [("big", 10_000), ("s1", 500), ("s2", 400)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    out = {
        r["source"]: r
        for r in constrained_waterfill_allocation(
            df, "source", "n_tokens",
            budget_frac=0.9, floor_frac=0.02, cap_frac=0.3,
        ).collect()
    }
    total = 10_900
    cap_micro = (total * 27 * 100_000) // 10  # 0.3*0.9 = 27/100
    assert out["big"]["alloc_micro_tokens"] == cap_micro
    assert out["big"]["at_bound"] == 1
    # with the giant capped, the demand is infeasible: everyone ends at
    # their bound and total allocation falls short of the budget
    assert all(r["at_bound"] == 1 for r in out.values())
    got = sum(r["alloc_micro_tokens"] for r in out.values())
    assert got < total * 900_000


def test_constrained_waterfill_rejects_floor_above_budget(spark):
    from flashml_spark.operators.sampling import (
        constrained_waterfill_allocation,
    )

    df = spark.createDataFrame([("a", 10)], "source string, n_tokens long")
    with pytest.raises(ValueError, match="floor_frac"):
        constrained_waterfill_allocation(
            df, "source", "n_tokens", budget_frac=0.5, floor_frac=0.6
        )


def test_constrained_waterfill_rejects_floor_above_cap(spark):
    """r9 ADVICE: floor_frac > cap_frac*budget_frac would let a dominant
    source's floor exceed its cap — must be rejected up front."""
    from flashml_spark.operators.sampling import constrained_waterfill_allocation

    df = spark.createDataFrame([("a", 100), ("b", 50)], "src string, w long")
    with pytest.raises(ValueError, match="floor_frac <= cap_frac"):
        constrained_waterfill_allocation(
            df, "src", "w", budget_frac=0.5, floor_frac=0.4, cap_frac=0.5
        )


def test_burstiness_drops_zero_gap_streams(spark):
    """r9 ADVICE: a type whose gaps are all zero (duplicate timestamps)
    has an undefined CV (mean gap 0) and must be filtered, not emitted
    as an engine-dependent NULL/NaN row."""
    from flashml_spark.operators.events import interarrival_burstiness

    rows = [
        # type z: two events, same ts -> single gap of 0 -> sd = 0
        (1, "2024-01-01 00:00:00", 1, "z"),
        (1, "2024-01-01 00:00:00", 2, "z"),
        # type ok: three events, nonzero gaps
        (2, "2024-01-01 00:00:00", 3, "ok"),
        (2, "2024-01-01 00:00:10", 4, "ok"),
        (2, "2024-01-01 00:00:40", 5, "ok"),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts string, event_id long, event_type string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    out = interarrival_burstiness(df, "event_type", "user_id", "ts").collect()
    assert [r["event_type"] for r in out] == ["ok"]
    assert out[0]["n_gaps"] == 2 and out[0]["cv"] is not None
