"""CLI `experiment.type = "monitoring"` — the reference's PSI/VSI
model-health job type (`psivsi_config.json`,
`ModelHealthMetricsEvaluator.scala:43-210`) driven end-to-end through
`python -m flashml_spark`."""

from __future__ import annotations

import json

from pyspark.sql import functions as F


def _write(df, path):
    df.coalesce(1).write.mode("overwrite").parquet(path)
    return path


def test_cli_monitoring_psi_vsi(spark, tmp_path):
    from flashml_spark.__main__ import main
    from flashml_spark.metrics import stability

    # base: uniform-ish scores; new: shifted distribution + one browser
    # value missing and one new
    base = spark.range(1000).select(
        (F.col("id") % 100 / 100.0).alias("score"),
        F.when(F.col("id") % 3 == 0, "chrome")
        .when(F.col("id") % 3 == 1, "firefox")
        .otherwise("safari")
        .alias("browser"),
    )
    new = spark.range(1000).select(
        # drifted up; derived from id//4 so the per-day (id%4) score
        # multisets are IDENTICAL -> the drift timeline reads flat
        ((F.floor(F.col("id") / 4) % 100) / 200.0 + 0.5).alias("score"),
        # chrome 50% / firefox 30% / edge 20%: overlap {chrome, firefox}
        # has SHIFTED shares (vsi > 0), safari missing, edge new
        F.when(F.col("id") % 10 < 5, "chrome")
        .when(F.col("id") % 10 < 8, "firefox")
        .otherwise("edge")
        .alias("browser"),
        # serving timestamps spread over 4 days for the drift timeline
        F.timestamp_seconds(
            F.lit(1_700_000_000) + (F.col("id") % 4) * 86_400
        ).alias("served_at"),
    )
    base_p = _write(base, str(tmp_path / "base"))
    new_p = _write(new, str(tmp_path / "new"))
    root = str(tmp_path / "mon_sp")

    cfg = {
        "project": {
            "id": "health_check",
            "logLevel": "ERROR",
            "data": {"location": {"source": f"parquet://{new_p}"}},
        },
        "experiment": {"type": "monitoring"},
        "monitoring": {
            "baseSource": f"parquet://{base_p}",
            "scoreColumn": "score",
            "categoricalVariables": ["browser"],
            "buckets": 10,
            "cardinalityVariables": ["score"],
            "heavyHitterVariables": ["browser"],
            "heavyHitterK": 3,
            "timeline": {
                "tsColumn": "served_at",
                "valueColumn": "score",
                "baseDays": 2,
                "buckets": 10,
            },
        },
        "savepoint": {"root": root},
    }
    cfg_path = tmp_path / "mon.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 0

    with open(f"{root}/metrics/health.json") as f:
        health = json.load(f)
    # the CLI must report exactly what the library computes
    assert health["psi"] == stability.psi(base, new, "score", 10)
    # PSI sums only buckets populated on BOTH sides (reference semantics:
    # ModelHealthMetricsEvaluator reports empty buckets separately), so a
    # drift this extreme shows up mostly as EMPTY low-score buckets while
    # the surviving-bucket PSI stays modest but nonzero
    assert health["psi"] > 0.0
    assert len(health["psiEmptyBuckets"]) >= 3
    v = health["vsi.browser"]
    assert v["missingValues"] == ["safari"]
    assert v["newValues"] == ["edge"]
    assert v["vsi"] > 0.0
    assert v["missingTruncated"] is False

    # sketch metrics (r6 verdict item 5): cardinality drift via HLL —
    # base has 100 distinct scores, new has 100 (both well inside the
    # linear-counting regime, so estimates are near-exact) — and the
    # count-min heavy-hitter list with base-membership churn flags
    from flashml_spark.operators import sketches

    card = health["cardinality.score"]
    assert card["base"] == round(sketches.hll_cardinality(base, "score"), 1)
    assert card["new"] == round(sketches.hll_cardinality(new, "score"), 1)
    assert abs(card["base"] - 100) <= 5 and abs(card["new"] - 100) <= 5
    assert card["ratio"] > 0.0

    hh = health["heavyHitters.browser"]
    assert [h["value"] for h in hh] == ["chrome", "firefox", "edge"]
    assert hh[0]["count"] == 500 and hh[0]["cms_estimate"] >= 500
    # chrome/firefox were base heavy hitters; edge is churn
    assert [h["in_base_topk"] for h in hh] == [True, True, False]

    # drift timeline: the serving data is self-stationary across its 4
    # days (same score distribution every day), so every day's PSI vs
    # the first-2-day base is ~0 — the series exists and is quiet
    tlr = health["psiTimeline"]
    assert len(tlr) == 4 and all(r["n"] == 250 for r in tlr)
    assert all(abs(r["psi"]) < 1e-9 for r in tlr)


def test_cli_monitoring_rejects_missing_base(spark, tmp_path):
    from flashml_spark.__main__ import main

    new = spark.range(10).select((F.col("id") / 10.0).alias("score"))
    new_p = _write(new, str(tmp_path / "new2"))
    cfg = {
        "project": {
            "id": "health_bad",
            "logLevel": "ERROR",
            "data": {"location": {"source": f"parquet://{new_p}"}},
        },
        "experiment": {"type": "monitoring"},
        "monitoring": {"scoreColumn": "score"},
    }
    cfg_path = tmp_path / "mon_bad.json"
    cfg_path.write_text(json.dumps(cfg))
    assert main([str(cfg_path)]) == 2
