"""Join strategies for scale: skew salting and co-located (bucketed) joins.

The reference's joins are all dim-sized (SURVEY §2.3) so Postgres never
faces skew; at 100 TB a handful of hot keys (one viral user_id, one
default route) can pin a whole stage on one task. Two mitigations, both
result-identical to a plain join:

* AQE skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``, on by
  default in session.py) — runtime splitting of oversized partitions;
  works only for sort-merge joins.
* Explicit salting (this module) — deterministic n-way replication that
  also covers aggregations and older planners, and keeps working when one
  key alone exceeds a single executor's memory.

Bucketed co-located joins live in io.py (write side) and are verified
shuffle-free in tests/test_scale_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    num_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant equi-join: split each hot key of ``big`` across
    ``num_salts`` sub-partitions and replicate ``small`` once per salt.

    The salt on the big side is derived deterministically from the whole
    row's shuffle hash (monotonically_increasing_id would break retries),
    so the result is reproducible and exactly equals ``big.join(small,
    key, how)`` — verified by the ``skew_salted_join`` oracle query.

    Cost model: the small side is materialized ``num_salts`` times
    (explode before shuffle), so keep ``num_salts`` modest (8–32) and the
    small side genuinely small; for dim-sized smalls prefer broadcast,
    for balanced keys prefer a plain shuffle join. This is the middle
    path: a medium-sized build side plus a few pathological keys.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side is replicated)")
    # Salting by hash(key) alone would put every copy of a hot key in the
    # same bucket — the salt must vary *within* a key. Mix BOTH the row
    # content and the input split id into the salt: row-content hashing
    # alone sends identical duplicate rows of a hot key (a common skew
    # shape) to one bucket, and split id alone fails when a hot key is
    # concentrated in a single input split. Together, duplicates in
    # different splits spread by split id and distinct rows in one split
    # spread by content. Residual case: identical duplicates inside a
    # single split still share a bucket — at that point only an exploded
    # random salt helps, at the cost of retry determinism
    # (spark_partition_id is stable under task retry, which re-reads the
    # same split; monotonically_increasing_id is not).
    salt: Column = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns], F.spark_partition_id()),
        F.lit(num_salts),
    ).cast("int")
    big_salted = big.withColumn("_salt", salt)
    salts = F.explode(F.sequence(F.lit(0), F.lit(num_salts - 1))).alias("_salt")
    small_salted = small.select("*", salts)
    out = big_salted.join(small_salted, [key, "_salt"], how)
    return out.drop("_salt")


def binned_interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: int,
    how: str = "inner",
) -> DataFrame:
    """Big-big interval-containment join (point ∈ [lo, hi], inclusive)
    as a bin-bucketed EQUI-join.

    A raw ``points.join(intervals, lo <= p AND p <= hi)`` has no equi
    key, so Spark plans BroadcastNestedLoopJoin — O(|points| × |intervals|)
    and only viable when one side broadcasts (the `range_band_join`
    case). When BOTH sides are fact-sized, bucketize: each interval
    replicates to every bin of width ``bin_width`` it overlaps (explode
    of an integer sequence — ceil(span/width)+1 rows per interval), each
    point maps to exactly ONE bin, and the join becomes equi on the bin
    with the original predicate re-applied as a post-filter. Each
    qualifying (point, interval) pair meets in exactly one bin — the
    point's — so no dedup is needed.

    Pick ``bin_width`` ≈ the typical interval span: wider bins replicate
    intervals less but enlarge each bin's candidate cross-product;
    narrower bins do the reverse. Works on any integer key (epoch
    micros, integer cents). Skewed bins (rush-hour timestamps) are
    ordinary equi-join skew — AQE splitting / salting apply.
    """
    if how != "inner":
        raise ValueError("binned_interval_join supports inner joins")

    def floordiv(c: str) -> Column:
        # Exact integer floor division: F.floor(col / lit) goes through
        # DOUBLE division, whose rounding can mis-bin values sitting
        # exactly on a bin edge; (x - pmod(x, w)) / w stays exact for
        # |x| < 2^53 and floors correctly for negatives too.
        x = F.col(c)
        w = F.lit(bin_width)
        return ((x - F.pmod(x, w)) / w).cast("long")

    b_pts = points.withColumn("__bin", floordiv(point_col))
    b_iv = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(floordiv(lo_col), floordiv(hi_col))),
    )
    return (
        b_pts.join(b_iv, on="__bin", how="inner")
        .filter(
            (F.col(point_col) >= F.col(lo_col))
            & (F.col(point_col) <= F.col(hi_col))
        )
        .drop("__bin")
    )


def colocated_join_keys(df: DataFrame, key: str, partitions: int) -> DataFrame:
    """Pre-shuffle a fact onto its join key so several downstream joins /
    aggs on the same key reuse one exchange (the reference's CTE-chain
    pattern, SURVEY §2.10, re-expressed as an explicit co-partitioning)."""
    return df.repartition(partitions, F.col(key))
