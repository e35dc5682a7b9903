"""AQE-independence guard: results must be identical with adaptive
execution disabled — a query whose OUTPUT depends on AQE's runtime
re-planning (e.g. through nondeterministic tie-breaks interacting with
partition counts) would be silently wrong on any cluster with different
AQE decisions."""

from __future__ import annotations

import pytest

from flashml_spark.queries import QUERIES
from tests.conftest import SF_DIR, normalize

HEAVY = [
    "x35_minhash_dedup_e2e",
    "x73_curation_pipeline",
    "x113_sole_late_supplier",
    "x130_trailing_distinct_users",
    "x132_prefix_jaccard",
    "x143_bpe_learn",
    "x144_minhash_accuracy",
    "x151_bfs_hops",
    "x152_weighted_jaccard",
    "x134_edit_distance_pairs",
]


@pytest.mark.parametrize("name", HEAVY)
def test_output_identical_without_aqe(spark, name):
    fn = QUERIES[name][0]
    on = normalize([tuple(r) for r in fn(spark, SF_DIR).collect()])
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        off = normalize([tuple(r) for r in fn(spark, SF_DIR).collect()])
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert on == off


@pytest.mark.parametrize("name", HEAVY)
def test_output_identical_with_tiny_shuffle_width(spark, name):
    """Partition-count independence: the same answer at 3 shuffle
    partitions as at the session default — a query whose output shifted
    with parallelism (ordering leaks, per-partition tie-breaks, salted
    keys surfacing) would be silently wrong on any differently-sized
    cluster."""
    fn = QUERIES[name][0]
    base = normalize([tuple(r) for r in fn(spark, SF_DIR).collect()])
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        tiny = normalize([tuple(r) for r in fn(spark, SF_DIR).collect()])
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert base == tiny
