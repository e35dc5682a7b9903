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
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (  # noqa: F401
    ArrayType,
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


def sessionize_with_timeout(
    stream: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_seconds: int = 1800,
    watermark: str = "2 hours",
) -> DataFrame:
    """Custom stateful sessionization with event-time timeout: one output
    row per CLOSED session — ``user, session_start, session_end,
    n_events`` — closed either by a later event arriving past the gap or
    by the watermark passing session_end + gap (the timeout path, which
    ``session_window`` also takes but without custom per-session state;
    this operator is the template for sessions carrying arbitrary state —
    funnels, carts, feature accumulators).

    State per key: the OPEN session's (start_us, end_us, n) — O(1)
    regardless of event volume.  EventTimeTimeout + ``setTimeoutTimestamp
    (session_end + gap)`` closes idle sessions exactly when a batch
    session-izer with the same gap would.
    """
    from pyspark.sql import functions as F

    out_schema = StructType(
        [
            StructField("user", stream.schema[user_col].dataType),
            StructField("session_start", LongType()),  # epoch micros
            StructField("session_end", LongType()),
            StructField("n_events", LongType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        closed = []
        if state.hasTimedOut:
            s, e, n = state.get
            closed.append((key[0], s, e, n))
            state.remove()
        else:
            rows = []
            for pdf in pdfs:
                # timestamps arrive tz-aware; values are epoch micros
                rows.extend(
                    int(t.value // 1000) for t in pd.to_datetime(pdf[ts_col])
                )
            rows.sort()
            if rows:
                if state.exists:
                    s, e, n = state.get
                else:
                    s, e, n = rows[0], rows[0], 0
                for t in rows:
                    if t - e > gap_us:
                        closed.append((key[0], s, e, n))
                        s, e, n = t, t, 0
                    e = max(e, t)
                    n += 1
                state.update((int(s), int(e), int(n)))
                # close the open session when event time passes end + gap
                state.setTimeoutTimestamp((e + gap_us) // 1000)
        if closed:
            yield pd.DataFrame(
                closed, columns=["user", "session_start", "session_end", "n_events"]
            )

    wm = stream.withColumn(ts_col, F.col(ts_col).cast("timestamp")).withWatermark(
        ts_col, watermark
    )
    return wm.groupBy(user_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="start_us LONG, end_us LONG, n LONG",
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


def decayed_trending_counts(
    stream: DataFrame,
    token_col: str = "token",
    ts_col: str = "ts",
    half_life_seconds: float = 3600.0,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Exponentially-decayed per-key frequency — the "trending now"
    primitive: each occurrence contributes ``2^(-(T - t_i)/half_life)``
    at reference time T, so recent activity dominates without any
    windowed recount.  State per key is O(1): ``(decayed count,
    reference epoch)``; batch events fold in oldest-first (decay the
    stored count forward, +1 per event), and LATE events — older than
    the stored reference — add their already-discounted contribution
    without moving the reference, so out-of-order arrival converges to
    the same closed form.

    Emits one row per touched key per micro-batch:
    ``token, decayed_count, as_of`` (epoch seconds of the key's
    reference time).  Batch-equivalent oracle at time T:
    ``Σ_i 2^(-(T - t_i)/half_life)`` over all of the key's events.
    """

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        c, t_ref = (state.get if state.exists else (0.0, None))
        for pdf in pdfs:
            ts = (
                pdf[ts_col].astype("datetime64[us]").astype("int64") / 1e6
            ).sort_values()
            for t in ts:
                if t_ref is None or t >= t_ref:
                    if t_ref is not None:
                        c *= 2.0 ** (-(t - t_ref) / half_life_seconds)
                    c += 1.0
                    t_ref = t
                else:  # late event: discounted contribution, ref unchanged
                    c += 2.0 ** (-(t_ref - t) / half_life_seconds)
        state.update((c, t_ref))
        yield pd.DataFrame(
            {token_col: [key[0]], "decayed_count": [c], "as_of": [t_ref]}
        )

    key_type = stream.schema[token_col].dataType
    out_schema = StructType(
        [
            StructField(token_col, key_type),
            StructField("decayed_count", DoubleType()),
            StructField("as_of", DoubleType()),
        ]
    )
    return stream.groupBy(token_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="c DOUBLE, t_ref DOUBLE",
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def ewma_monitor(
    stream: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    alpha: float = 0.3,
    z: float = 3.0,
    min_n: int = 5,
) -> DataFrame:
    """Streaming EWMA anomaly monitor: the RECURSIVE (infinite-memory)
    twin of the batch ``events.ewma_anomaly`` detector.  Per key, state
    carries (n, ewma, ewvar) and updates with the RiskMetrics
    exponentially-weighted recursions on every observation in event
    order::

        diff   = x - ewma
        ewma  += alpha * diff
        ewvar  = (1 - alpha) * (ewvar + alpha * diff**2)

    An observation is flagged when it deviates from the PRE-update
    forecast by more than ``z`` EW standard deviations, after a
    ``min_n``-observation warm-up.  The batch operator unrolls a
    bounded-lag approximation of the same forecast so it stays a pure
    relational plan; this one is exact because streaming state makes
    the recursion free.

    Scale posture: O(1) state per key in the state store; one output
    row per key per micro-batch (latest forecast + anomaly count).
    Rows inside a batch are processed in (ts) order per key — Spark
    hands each key's batch rows to one call.
    """
    import pandas as pd

    key_type = stream.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField(key_col, key_type),
            StructField("n", LongType()),
            StructField("ewma", DoubleType()),
            StructField("ewsd", DoubleType()),
            StructField("batch_anomalies", LongType()),
        ]
    )

    def update(key, pdfs, state: GroupState):
        n, ewma, ewvar = (state.get if state.exists else (0, 0.0, 0.0))
        flagged = 0
        for pdf in pdfs:
            pdf = pdf.sort_values(ts_col)
            for x in pdf[value_col].astype(float):
                if n >= min_n and ewvar > 0:
                    if abs(x - ewma) > z * (ewvar ** 0.5):
                        flagged += 1
                if n == 0:
                    ewma = x
                else:
                    diff = x - ewma
                    ewma += alpha * diff
                    ewvar = (1.0 - alpha) * (ewvar + alpha * diff * diff)
                n += 1
        state.update((n, ewma, ewvar))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n": [n],
                "ewma": [float(ewma)],
                "ewsd": [float(ewvar ** 0.5)],
                "batch_anomalies": [flagged],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n LONG, ewma DOUBLE, ewvar DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def streaming_hll_distinct(
    stream: DataFrame,
    key_col: str = "source",
    value_col: str = "token",
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming per-key distinct-cardinality monitor — the stateful
    twin of ``operators.sketches.hll_distinct``: per key, state is the
    256-register HLL array (O(256) ints, CONSTANT regardless of how
    many distinct values stream through — the property that makes a
    lifetime distinct-counter feasible in a state store), updated with
    the SAME md5-derived register/rank arithmetic as the batch sketch,
    so after any sequence of micro-batches the streaming estimate
    equals the batch estimate over the union of the data.

    Emits one row per touched key per micro-batch:
    ``<key>, n_rows, hll_estimate`` (n_rows = lifetime rows seen).
    """
    import hashlib
    import math

    from flashml_spark.operators.sketches import HLL_ALPHA, HLL_M

    def _reg_rank(v: str) -> tuple[int, int]:
        # v is always a string here: value_col is cast to string in the
        # Spark plan below, so the bytes hashed match the batch sketch's
        # CAST(value AS STRING) exactly (Python str() of a double /
        # timestamp / boolean renders differently from Spark's cast —
        # "True" vs "true" — which would silently break the claimed
        # streaming/batch estimate parity for non-string columns).
        hv = int(hashlib.md5(str(v).encode()).hexdigest()[:15], 16)
        w = hv >> 8
        return hv % HLL_M, (53 - w.bit_length()) if w else 53

    def _estimate(regs: list[int]) -> float:
        used = sum(1 for r in regs if r > 0)
        s = sum(2.0 ** -r for r in regs if r > 0)
        raw = HLL_ALPHA * HLL_M * HLL_M / (s + (HLL_M - used))
        v = HLL_M - used
        if raw <= 2.5 * HLL_M and v > 0:
            return HLL_M * math.log(HLL_M / v)
        return raw

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            n, regs = state.get
            regs = list(regs)
        else:
            n, regs = 0, [0] * HLL_M
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(vals)
            for v in vals:
                reg, rank = _reg_rank(v)
                if rank > regs[reg]:
                    regs[reg] = rank
        state.update((n, regs))
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_rows": [n],
                "hll_estimate": [_estimate(regs)],
            }
        )

    key_type = stream.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField(key_col, key_type),
            StructField("n_rows", LongType()),
            StructField("hll_estimate", DoubleType()),
        ]
    )
    # JVM-side cast so the pandas worker receives the same string
    # rendering the batch sketch hashes (CAST(value AS STRING)).
    stream = stream.withColumn(value_col, F.col(value_col).cast("string"))
    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n LONG, regs ARRAY<INTEGER>",
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )


def streaming_count_min(
    stream: DataFrame,
    key_col: str,
    value_col: str,
    targets: list[str],
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Streaming per-key count-min frequency monitor — the stateful twin
    of ``operators.sketches.count_min_audit``: per key, state is the
    d=4 × w=1024 counter grid (O(4096) longs, CONSTANT regardless of
    how many distinct values stream through), updated with the SAME
    md5-derived (row, bucket) arithmetic as the batch sketch, so after
    any sequence of micro-batches each target's estimate equals the
    batch sketch's over the union of the data (CMS updates are
    additive — the merge property streaming state relies on).

    ``targets`` are the values whose lifetime frequency estimates are
    emitted each micro-batch (a monitoring allowlist — hot sentinel
    tokens, known-bad boilerplate ids).  Output per touched key per
    batch: ``<key>, n_rows, estimates array<long>`` (aligned with
    ``targets``).
    """
    import hashlib

    from flashml_spark.operators.sketches import CMS_D, CMS_W

    def _cells(v: str) -> list[tuple[int, int]]:
        # SAME arithmetic as the batch sketch's md5_long(concat('cm<j>:',
        # v), 8) % CMS_W — first 8 hex chars as an int (32 bits), so the
        # streaming grid cells coincide with count_min_audit's exactly
        out = []
        for j in range(CMS_D):
            hv = int(hashlib.md5(f"cm{j}:{v}".encode()).hexdigest()[:8], 16)
            out.append((j, hv % CMS_W))
        return out

    tcells = [_cells(str(t)) for t in targets]

    def update(key, pdfs, state: GroupState):
        import pandas as pd

        if state.exists:
            n, flat = state.get
            grid = list(flat)
        else:
            n, grid = 0, [0] * (CMS_D * CMS_W)
        for pdf in pdfs:
            vals = pdf[value_col].dropna()
            n += len(vals)
            for v in vals:
                for j, b in _cells(v):
                    grid[j * CMS_W + b] += 1
        state.update((n, grid))
        ests = [
            min(grid[j * CMS_W + b] for j, b in cells) for cells in tcells
        ]
        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_rows": [n],
                "estimates": [ests],
            }
        )

    key_type = stream.schema[key_col].dataType
    out_schema = StructType(
        [
            StructField(key_col, key_type),
            StructField("n_rows", LongType()),
            StructField("estimates", ArrayType(LongType())),
        ]
    )
    # JVM-side cast: hash the same string rendering as the batch sketch
    # (CAST(value AS STRING)) — the non-string parity rule shared with
    # streaming_hll_distinct
    stream = stream.withColumn(value_col, F.col(value_col).cast("string"))
    return stream.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="n LONG, grid ARRAY<LONG>",
        outputMode="update",
        timeoutConf=getattr(GroupStateTimeout, timeout),
    )
