"""Scaling probe: measure how the engine's heaviest pipelines scale with
input size, as evidence for the 100 TB posture claims in SCALE.md.

Replicates the sf0.1 tables ×{1,2,4,8} with deterministic perturbations
that preserve each workload's character without degenerating it:

- ``documents``: doc_id offset per replica; ``" rep<k>"`` appended to the
  text so replicas are NEAR each other in shingle space (the dedup
  pipelines keep realistic candidate structure) without collapsing into
  exact cross-replica duplicates that would short-circuit the work.
- ``embeddings``: vec_id offset; first coordinate nudged by
  ``replica * 1e-3`` (cosine structure preserved, no exact clones).
- ``lineitem``/``orders``: orderkey offset by the SAME constant on both
  sides, so the join graph replicates instead of densifying.
- ``events``: event_id/user_id offset per replica, timestamps UNCHANGED —
  the event corpus grows linearly while the calendar span (and with it
  every |days|-bounded post-agg frame) stays fixed, exactly the shape a
  bigger cluster sees.  (Before round 7 events copied through unchanged,
  so events-based probes measured fixed cost only.)
- Small dims (part/supplier/nation/region/customer) copy through
  unchanged — at real scale dims grow sublinearly anyway.

Usage:
    python scripts/scale_probe.py [--factors 1,2,4,8] [--out /tmp/scaleprobe]
Prints one JSON line per (query, factor) and a final slope summary
(log-log OLS fit: sec ~ factor^slope).  slope ≈ 1 is linear scaling; the
probe machine is a single JVM, so slopes meaningfully above 1 flag a
stage whose cost grows superlinearly with data — the thing to chase.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFFSET = 10**12


def replicate(spark, src: str, out: str, k: int) -> None:
    from pyspark.sql import functions as F

    os.makedirs(out, exist_ok=True)
    rep = F.explode(F.sequence(F.lit(0), F.lit(k - 1))).alias("__rep")

    docs = spark.read.parquet(f"{src}/documents.parquet").select("*", rep)
    docs = (
        docs.withColumn("doc_id", F.col("doc_id") + F.col("__rep") * F.lit(OFFSET))
        .withColumn(
            "text",
            F.when(F.col("__rep") == 0, F.col("text")).otherwise(
                F.concat_ws(" ", F.col("text"), F.concat(F.lit("rep"), F.col("__rep")))
            ),
        )
        .drop("__rep")
    )
    docs.write.mode("overwrite").parquet(f"{out}/documents.parquet")

    emb = spark.read.parquet(f"{src}/embeddings.parquet").select("*", rep)
    emb = (
        emb.withColumn("vec_id", F.col("vec_id") + F.col("__rep") * F.lit(OFFSET))
        .withColumn(
            "embedding",
            F.concat(
                F.array(
                    (F.element_at("embedding", 1) + F.col("__rep") * F.lit(1e-3)).cast(
                        "float"
                    )
                ),
                F.slice("embedding", 2, 10**6),
            ),
        )
        .drop("__rep")
    )
    emb.write.mode("overwrite").parquet(f"{out}/embeddings.parquet")

    li = spark.read.parquet(f"{src}/lineitem.parquet").select("*", rep)
    li = li.withColumn(
        "l_orderkey", F.col("l_orderkey") + F.col("__rep") * F.lit(OFFSET)
    ).drop("__rep")
    li.write.mode("overwrite").parquet(f"{out}/lineitem.parquet")

    orders = spark.read.parquet(f"{src}/orders.parquet").select("*", rep)
    orders = orders.withColumn(
        "o_orderkey", F.col("o_orderkey") + F.col("__rep") * F.lit(OFFSET)
    ).drop("__rep")
    orders.write.mode("overwrite").parquet(f"{out}/orders.parquet")

    ev = spark.read.parquet(f"{src}/events.parquet").select("*", rep)
    ev = (
        ev.withColumn("event_id", F.col("event_id") + F.col("__rep") * F.lit(OFFSET))
        .withColumn("user_id", F.col("user_id") + F.col("__rep") * F.lit(OFFSET))
        .drop("__rep")
    )
    ev.write.mode("overwrite").parquet(f"{out}/events.parquet")

    for t in ["part", "supplier", "nation", "region", "customer"]:
        spark.read.parquet(f"{src}/{t}.parquet").write.mode("overwrite").parquet(
            f"{out}/{t}.parquet"
        )


PROBES = [
    "x03_minhash_dedup",
    "x35_minhash_dedup_e2e",
    "x53_simhash_hamming_pairs",
    "x63_shard_packing",
    "x73_curation_pipeline",
    "x75_semantic_dedup_e2e",
    "x78_pricing_summary",
    "x113_sole_late_supplier",
    "x132_prefix_jaccard",
    "x135_bm25_topk",
    "x143_bpe_learn",
    "x145_vocab_growth",
    "x161_dup_span_stats",
    "x163_dedup_span_removal",
    "x165_quantile_normalize",
    "x166_self_repetition",
    "x167_bpe_fertility",
    "x178_decontamination",
    "x179_unigram_logprob",
    "x180_correlation_matrix",
    "x187_bootstrap_ci",
    "x198_table_digest",
    "x204_theil_sen_trend",
    "x214_cross_source_dups",
    "x219_hll_distinct",
    "x220_collocations_g2",
    "x221_cumulative_gains",
    "x222_record_linkage_fs",
    "x223_gopher_rules",
    "x224_dsir_weights",
    "x225_bh_fdr",
    "x226_isotonic_calibration",
    "x227_ttl_dedup_anchored",
    "x228_hll_merge",
    "x229_changepoint_split",
    "x230_mann_kendall",
    "x231_count_min_audit",
    "x232_hll_source_overlap",
    "x233_compression_ordering",
    "x234_moment_quantiles",
    "x235_holt_forecast",
    "x236_reciprocal_nn",
    "x237_diff_in_diff",
    "x238_join_size_sketch",
    "x239_psi_timeline",
    "x240_reciprocal_nn_lsh",
    "x241_contrastive_triplets",
    "x242_cusum_drift",
    "x243_obf_boundary",
    "x244_neyman_allocation",
    "x245_semantic_decontamination",
    # r9: the six r8 additions without committed slope rows (r8 VERDICT
    # item 7; x249/x250/x253 carry SCALE.md shape arguments already)
    "x246_matryoshka_fidelity",
    "x247_shard_interleave",
    "x248_packing_capacity_audit",
    "x251_group_fold_split",
    "x252_embargo_split",
    "x254_bucket_balanced_sample",
    # r9 additions (probed same round — no slope debt carried forward)
    "x255_png_roundtrip_audit",
    "x256_temperature_mixture",
    "x257_shard_checksum_manifest",
    "x258_rag_chunk_plan",
    "x259_pq_codebook_audit",
    "x260_mad_outlier_screen",
    "x261_semihard_negatives",
    "x262_dedup_survivorship",
    "x263_source_vocab_divergence",
    "x264_neardup_cluster_histogram",
    "x265_embedding_isotropy",
    "x266_lexical_diversity",
    "x267_interarrival_burstiness",
    "x268_bloom_decontamination",
    "x269_constrained_waterfill",
    "x270_gif_roundtrip_audit",
    # r10 additions (probed same round — no slope debt carried forward)
    "x271_jpeg_roundtrip_audit",
    "x272_exact_substring_report",
    "x273_longest_repeated_substrings",
    "x274_exact_substring_decontamination",
    "x275_token_stream_packing",
    "x276_kcore_parts",
    "x277_audio_tone_audit",
    "x278_semdedup",
    "x279_png_palette_audit",
    "x280_jpeg_progressive_audit",
    "x281_ccnet_buckets",
    "x282_prototype_prune",
    "x283_d4_curation",
    "x284_curriculum_packing",
    # r11 additions (probed same round)
    "x285_png_subbyte_audit",
    "x286_quality_classifier",
    "x287_tiff_roundtrip_audit",
    "x288_pii_audit",
    "x289_paragraph_dedup",
    "x290_pareto_acceptance",
    "x291_bigram_logprob",
    "x292_packed_attention",
    "x293_span_corruption_plan",
    "x294_curation_pipeline_v2",
]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--factors", default="1,2,4,8")
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    # v2: events now replicate too (new dir so stale replicas can't mix)
    ap.add_argument("--out", default="/tmp/scaleprobe_v2")
    ap.add_argument("--only", default=None,
                    help="comma-separated probe subset (prefix match)")
    args = ap.parse_args()
    factors = [int(f) for f in args.factors.split(",")]

    from flashml_spark.queries import QUERIES
    from flashml_spark.session import get_spark
    from bench import release_storage, run_query

    spark = get_spark("scale-probe")
    spark.sparkContext.setLogLevel("ERROR")

    for k in factors:
        dst = f"{args.out}/x{k}"
        if not os.path.exists(f"{dst}/documents.parquet"):
            replicate(spark, args.src, dst, k)

    probes = PROBES
    if args.only:
        pres = [p.strip() for p in args.only.split(",")]
        probes = [q for q in PROBES if any(q.startswith(p) for p in pres)]
        if not probes:
            raise SystemExit(
                f"--only {args.only!r} matches no probe; valid prefixes: {PROBES}"
            )
    timings: dict[str, dict[int, float]] = {q: {} for q in probes}
    # warm once on the smallest factor so JIT/footer costs don't land on x1
    run_query(QUERIES[probes[0]][0](spark, f"{args.out}/x{factors[0]}"))
    release_storage(spark)
    for k in factors:
        dst = f"{args.out}/x{k}"
        for q in probes:
            t0 = time.perf_counter()
            run_query(QUERIES[q][0](spark, dst))
            dt = time.perf_counter() - t0
            release_storage(spark)
            timings[q][k] = round(dt, 3)
            print(json.dumps({"query": q, "factor": k, "sec": timings[q][k]}))

    slopes = {}
    for q, ts in timings.items():
        xs = [math.log(k) for k in ts]
        ys = [math.log(s) for s in ts.values()]
        n = len(xs)
        mx, my = sum(xs) / n, sum(ys) / n
        denom = sum((x - mx) ** 2 for x in xs)
        slopes[q] = round(
            sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom, 3
        )
    print(json.dumps({"metric": "scaling_slopes", "slopes": slopes}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
