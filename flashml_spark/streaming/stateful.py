"""Custom stateful streaming operator via ``applyInPandasWithState``.

Running per-key aggregates that survive across micro-batches — the
pattern the built-in windowed aggs can't express (e.g. a lifetime
event counter + running value sum per user, emitted on every update).

Scale posture: state is partitioned by the grouping key across the
state store (RocksDB/HDFS-backed on a real cluster); each executor
holds only its keys' state.  The pandas UDF sees one key group per
call with an Arrow batch of that key's new rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (  # noqa: F401
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_STATE_SCHEMA = "n_events LONG, total_value DOUBLE"


def _output_schema(stream: DataFrame, user_col: str) -> StructType:
    """Key column keeps its input type (string/bigint/...)."""
    key_type = stream.schema[user_col].dataType
    return StructType(
        [
            StructField(user_col, key_type),
            StructField("n_events", LongType()),
            StructField("total_value", DoubleType()),
        ]
    )


def running_totals(
    stream: DataFrame,
    user_col: str = "user_id",
    value_col: str = "value",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Lifetime running (count, sum) per user, one output row per key per
    micro-batch that touches it.

    Batch-equivalent oracle: ``SELECT user_id, COUNT(*), SUM(value) GROUP
    BY user_id`` after all batches are processed.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        n, total = (state.get if state.exists else (0, 0.0))
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf[value_col].sum())
        state.update((n, total))
        yield pd.DataFrame(
            {user_col: [key[0]], "n_events": [n], "total_value": [total]}
        )

    return (
        stream.groupBy(user_col)
        .applyInPandasWithState(
            update,
            outputStructType=_output_schema(stream, user_col),
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=getattr(GroupStateTimeout, timeout),
        )
    )
