"""Driver-facing contract guards: the harness reads __spark_entry__ and
bench.py by convention — breakage there silently costs a round, so pin
the invariants."""

from __future__ import annotations

import importlib.util
import json


def _entry():
    spec = importlib.util.spec_from_file_location("entry", "/root/repo/__spark_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_priority_window_is_exactly_50_known_queries():
    e = _entry()
    from flashml_spark.queries import QUERIES

    assert len(e._PRIORITY) == 50  # the harness evaluates the first 50 keys
    assert len(set(e._PRIORITY)) == 50
    unknown = [n for n in e._PRIORITY if n not in QUERIES]
    assert not unknown, f"priority names missing from registry: {unknown}"


def test_queries_and_oracles_are_consistent():
    e = _entry()
    q = e.queries()
    o = e.oracle_sql()
    assert set(o) <= set(q)
    # priority order is the iteration prefix
    assert list(q)[: len(e._PRIORITY)] == e._PRIORITY
    # the documented rows-only set, and nothing else, lacks an oracle
    assert set(q) - set(o) == {
        "x07_ann_lsh",
        "x25_porter_stem",
        "x27_ann_ivf",
        "x72_cluster_balanced_sample",
    }


def test_bench_headline_names_are_registered():
    import bench
    from flashml_spark.queries import QUERIES

    missing = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not missing, f"HEADLINE entries not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE)


def test_bench_totals_line_stays_compact():
    # the driver captures a bounded tail of stdout; the LAST line must be
    # small regardless of how many queries run (r03 lost its totals to a
    # 73-query dict on the final line)
    payload = json.dumps(
        {
            "metric": "headline_queries_total",
            "value": 999.999,
            "unit": "sec",
            "queries": {"n_queries": 999, "max": 99.9, "top3_sum": 99.9},
            "sf": 0.1,
        }
    )
    assert len(payload) < 500
