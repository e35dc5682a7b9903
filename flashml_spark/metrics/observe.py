"""Zero-extra-scan pipeline metrics via ``DataFrame.observe``.

A production curation run wants row counts, null rates, and quality
aggregates at each stage — but a 100 TB input cannot afford a second
pass per metric.  ``observe`` attaches named aggregate expressions to a
plan node; Spark computes them AS the action runs (accumulator-style,
inside the same tasks) and delivers them through a query-execution
listener.  Cost: near zero.  The alternative — ``df.count()`` /
``df.agg(...)`` per stage — re-executes the upstream plan per metric.

``ObservationSet`` wraps the bookkeeping: attach observations at any
number of stages, run ONE action, then read every stage's metrics.

Batch only (``pyspark.sql.Observation`` is unsupported on streaming
frames; use ``streamingQuery.lastProgress["observedMetrics"]`` there).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Observation


class ObservationSet:
    """Attach named observation points across a pipeline's stages.

    Usage::

        obs = ObservationSet()
        df = obs.attach(df, "ingest", F.count(F.lit(1)).alias("rows"))
        df = obs.attach(clean, "clean", F.count(F.lit(1)).alias("rows"),
                        F.avg("quality").alias("mean_q"))
        df.write.parquet(out)          # ONE action
        obs.get("ingest")["rows"], obs.get("clean")["mean_q"]
    """

    def __init__(self) -> None:
        self._points: dict[str, Observation] = {}

    def attach(self, df: DataFrame, name: str, *metrics: Column) -> DataFrame:
        if name in self._points:
            raise ValueError(f"observation point {name!r} already attached")
        ob = Observation(name)
        self._points[name] = ob
        return df.observe(ob, *metrics)

    def get(self, name: str) -> dict:
        """Metrics for one point — blocks until the action that consumed
        the observed frame has completed."""
        return dict(self._points[name].get)

    def all(self) -> dict[str, dict]:
        return {name: dict(ob.get) for name, ob in self._points.items()}


def observed_keep_rate(
    df: DataFrame,
    keep_col: str,
    obs_name: str = "keep_rate",
) -> tuple[DataFrame, Observation]:
    """Attach kept/total counters to a verdict frame (e.g. the output of
    ``quality_filter_verdict``); read ``kept / total`` after the action.
    Returns (observed frame, observation)."""
    from pyspark.sql import functions as F

    ob = Observation(obs_name)
    out = df.observe(
        ob,
        F.count(F.lit(1)).alias("total"),
        F.sum(F.col(keep_col).cast("long")).alias("kept"),
    )
    return out, ob
