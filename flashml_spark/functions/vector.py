"""Vector math as native column expressions over ``array<float|double>``.

Used by similarity search and embedding dedup.  Everything here is
``F.aggregate`` / ``F.zip_with`` — JVM-side, codegen'd, no Python UDFs in
the hot path.  Sums are sequential left-to-right, which makes results
bit-reproducible across engines that iterate arrays in order.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a: Column, b: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def l2_normalize(a: Column) -> Column:
    n = norm(a)
    return F.transform(a, lambda v: v / n)
