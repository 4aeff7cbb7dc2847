"""Z-order (Morton) clustering keys for multi-dimensional data skipping.

A table sorted by one column prunes scans on that column only; sorting
by the bit-interleaved key of TWO columns gives files whose min/max
footer ranges are narrow in BOTH dimensions, so predicates on either
column (or both) skip most files — the Delta/Iceberg ``ZORDER BY``
primitive, here as a pure Column expression (whole-stage codegen'd, no
UDF) plus an identical ANSI-SQL twin for the DuckDB oracle.

The interleave is the classic magic-number bit spread: for 16-bit
inputs, spread(x) places x's bits at even positions via four
shift-or-mask rounds; key = spread(x) | spread(y) << 1. Everything is
int64 arithmetic — bit-identical across engines.

Scale use (``io.write_zordered``): repartitionByRange on the key, sort
within partitions, write parquet — range partitioning keeps files
disjoint in key space, and parquet's per-column min/max stats then make
file skipping effective on every interleaved dimension.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# (shift, mask) rounds spreading a 16-bit value to even bit positions.
_SPREAD_ROUNDS = [
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
]


def _col(c: Column | str) -> Column:
    return c if isinstance(c, Column) else F.col(c)


def spread_bits16(c: Column | str) -> Column:
    """int64 with the low 16 bits of ``c`` moved to even positions
    (bit i → bit 2i); masks to 16 bits first."""
    x = _col(c).cast("long").bitwiseAND(F.lit(0xFFFF))
    for shift, mask in _SPREAD_ROUNDS:
        x = x.bitwiseOR(F.shiftleft(x, shift)).bitwiseAND(F.lit(mask))
    return x


def morton_key_2d(a: Column | str, b: Column | str) -> Column:
    """Interleave the low 16 bits of two non-negative integer columns:
    ``a``'s bits land at even positions, ``b``'s at odd. Inputs beyond
    16 bits are masked.

    Pre-scale both inputs to COMPARABLE bit widths (quantile-bucket
    skewed domains): if one dimension uses far more bits than the
    other, its high bits dominate the key's top bits and the ordering
    degenerates to a plain sort on the wide dimension — the narrow
    dimension's file envelopes stay full-domain and its predicates skip
    nothing (measured in tests/test_scale_plans.py)."""
    return spread_bits16(a).bitwiseOR(F.shiftleft(spread_bits16(b), 1))


def spread_bits16_sql(expr: str) -> str:
    """DuckDB rendering of :func:`spread_bits16` (same rounds, same
    masks — bit-identical int64 arithmetic)."""
    x = f"(CAST({expr} AS BIGINT) & 65535)"
    for shift, mask in _SPREAD_ROUNDS:
        x = f"(({x} | ({x} << {shift})) & {mask})"
    return x


def morton_key_2d_sql(a: str, b: str) -> str:
    return f"({spread_bits16_sql(a)} | ({spread_bits16_sql(b)} << 1))"
