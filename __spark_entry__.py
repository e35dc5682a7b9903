"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke check on sf0.001.
``queries()``    — every implemented operator query (SURVEY §2.2.12 + extensions).
``oracle_sql()`` — matching DuckDB oracle SQL per query (omitted for
                   non-SQL-expressible ops → rows-only check).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: hotlead earliest-page rollup (WebCustomMetricsEvaluator
    semantics) over sf0.001 orders, via the engine's operators."""
    from flashml_spark.queries import QUERIES

    fn, _ = QUERIES["q12_hotlead_rollup"]
    return fn(spark, SF_SMOKE)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from flashml_spark.queries import QUERIES

    return {name: fn for name, (fn, _oracle) in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    from flashml_spark.queries import QUERIES

    return {name: oracle for name, (_fn, oracle) in QUERIES.items() if oracle is not None}
