"""Z-order (Morton) curve expressions for multi-dimensional data
clustering.

A range-sorted layout (``write_range_sorted``) prunes on ONE column; a
workload that ranges over TWO columns (customer AND date, lat AND lon)
needs the file layout to be local in both.  Interleaving the bits of
the two key columns maps 2-D proximity onto 1-D proximity — sorting by
the interleaved value gives every output file a narrow min/max box in
BOTH dimensions, so parquet footer stats prune 2-D predicates (the
technique behind Delta/Iceberg ``OPTIMIZE ZORDER BY``).

Everything here is pure integer column arithmetic — whole-stage
codegen, engine-portable (the SQL twin is generated from the same bit
positions), no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def z_value(col_a: Column, col_b: Column, bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of two non-negative
    integer columns: bit j of ``col_a`` lands at position 2j, bit j of
    ``col_b`` at 2j+1.  Callers range-reduce first (``% (1 << bits)``);
    the result fits a bigint for bits <= 31.

    2*bits shift/mask/add terms, all codegen — zero shuffle, zero
    Python.
    """
    a = col_a.cast("bigint")
    b = col_b.cast("bigint")
    out = F.lit(0).cast("bigint")
    for j in range(bits):
        out = out + F.shiftright(a, j).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * j))
        out = out + F.shiftright(b, j).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * j + 1))
    return out


def z_value_sql(a_expr: str, b_expr: str, bits: int = 16) -> str:
    """The engine-portable SQL twin of :func:`z_value` — same bit
    positions, plain ``>> & * +`` integer arithmetic."""
    terms = []
    for j in range(bits):
        terms.append(f"(({a_expr}) >> {j} & 1) * {1 << (2 * j)}")
        terms.append(f"(({b_expr}) >> {j} & 1) * {1 << (2 * j + 1)}")
    return " + ".join(terms)
