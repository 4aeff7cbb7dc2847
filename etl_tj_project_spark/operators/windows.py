"""Skew-resistant window rewrites.

A window partitioned on a low-cardinality key (3-value status flag, a
handful of regions) serializes: one task per key value sorts and scans
that key's *entire* history, no matter how many executors exist. At
100 TB a running sum over `PARTITION BY returnflag` is three tasks doing
33 TB each.

:func:`chunked_running_sum` is the standard two-phase rewrite, result-
identical to the plain window (pinned by the ``skewed_window_two_phase``
oracle pair):

1. split each key's rows into range-aligned chunks on the ordering
   column (e.g. one chunk per year) — every row of chunk *i* precedes
   every row of chunk *i+1* in window order, so prefix sums compose;
2. run the running sum *within* (key, chunk) — parallelism becomes
   |keys| × |chunks| instead of |keys|;
3. compute per-(key, chunk) totals (tiny: |keys| × |chunks| rows), turn
   them into exclusive prefix offsets with a window over that tiny
   table, and broadcast-join the offset back onto the local sums.

Phase-2 windows shuffle once on (key, chunk); phase 3 adds one
broadcast. No single-partition sort remains (plan-pinned in
tests/test_scale_plans.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def chunked_running_sum(
    df: DataFrame,
    key: str,
    chunk: Column,
    order_cols: list,
    value: Column,
    out_col: str = "running_sum",
) -> DataFrame:
    """Running sum of ``value`` over ``PARTITION BY key ORDER BY
    order_cols`` computed with (key, chunk)-local windows plus a
    broadcast offset join.

    ``chunk`` must be monotone in the window order within each key: all
    rows of a smaller chunk value must sort before all rows of a larger
    one (a date-bucket of the leading order column always qualifies).
    ``order_cols`` must be a deterministic total order (carry a unique
    tiebreak key).
    """
    base = df.withColumn("_chunk", chunk).withColumn("_val", value)

    w_local = (
        Window.partitionBy(key, "_chunk")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = base.withColumn("_local_sum", F.sum("_val").over(w_local))

    totals = base.groupBy(key, "_chunk").agg(F.sum("_val").alias("_chunk_sum"))
    w_prior = (
        Window.partitionBy(key)
        .orderBy("_chunk")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = totals.select(
        key,
        "_chunk",
        F.coalesce(F.sum("_chunk_sum").over(w_prior), F.lit(0)).alias("_offset"),
    )

    joined = local.join(F.broadcast(offsets), [key, "_chunk"], "inner")
    return joined.withColumn(out_col, F.col("_local_sum") + F.col("_offset")).drop(
        "_chunk", "_val", "_local_sum", "_offset"
    )
