"""Every registered query with an oracle must hash-match DuckDB — this
mirrors the driver's t2 correctness gate (at sf0.001 for speed)."""

from __future__ import annotations

import pytest

from flashml_spark.queries import QUERIES
from tests.conftest import SF_DIR, assert_frames_match

WITH_ORACLE = [(name, fn, sql) for name, (fn, sql) in QUERIES.items() if sql is not None]
ROWS_ONLY = [(name, fn) for name, (fn, sql) in QUERIES.items() if sql is None]


@pytest.mark.parametrize("name,fn,sql", WITH_ORACLE, ids=[n for n, *_ in WITH_ORACLE])
def test_oracle_match(spark, ddb, name, fn, sql):
    assert_frames_match(fn(spark, SF_DIR), ddb, sql)


@pytest.mark.parametrize("name,fn", ROWS_ONLY, ids=[n for n, _ in ROWS_ONLY])
def test_rows_only(spark, name, fn):
    df = fn(spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0
