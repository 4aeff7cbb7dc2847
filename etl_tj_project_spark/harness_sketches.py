"""Deterministic-sketch pack: count-min and Bloom filter as portable SQL.

Like the KMV distinct sketch (harness_fnpacks4), these two sketches are
built from md5-derived hashes that both engines compute identically, so
— unlike HLL, whose register layout is engine-private — every number
here carries a FULL cross-engine oracle hash check: the sketch contract
itself (count-min never under-counts; Bloom never misses a true member)
is pinned as data, not prose.

Scale design notes:

* Count-min build is ONE keyed shuffle of d×N rows collapsing to d×w
  cells — partial aggregation (map-side combine) makes the exchange
  traffic O(d×w × partitions) regardless of input rows, which is the
  whole point of the sketch at 100 TB. The probe side joins a
  constant-size (d×w ≤ 256-row) sketch, always broadcast.
* The Bloom bit set is a DISTINCT over k×|build| positions bounded by m
  (512 here), broadcast to the probe side — the pre-AQE manual form of
  what the engine's runtime bloom-filter join injection does
  (test_runtime_bloom_filter_join_fires proves the native path fires);
  materializing it as data makes the false-positive arithmetic
  checkable and the filter REUSABLE across queries, which runtime
  injection is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table


def _md5_bucket(salted: F.Column, mod: int) -> F.Column:
    """First 8 md5 hex chars as a non-negative int64, reduced mod ``mod``
    — the same portable-hash idiom as the KMV sketch."""
    return (
        F.conv(F.substring(F.md5(salted), 1, 8), 16, 10).cast("long") % mod
    )


def _md5_bucket_sql(salted: str, mod: int) -> str:
    return (
        f"CAST(('0x' || substr(md5({salted}), 1, 8)) AS BIGINT) % {mod}"
    )


_CMS_D = 4   # hash rows
_CMS_W = 64  # buckets per row


@register(
    "cms_heavy_hitters",
    f"""
    WITH keys AS (SELECT o_custkey AS k FROM orders),
    cells AS (
      SELECT j,
             {_md5_bucket_sql("CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)", _CMS_W)}
               AS bucket,
             COUNT(*) AS cell_cnt
      FROM keys, unnest([0, 1, 2, 3]) AS t(j)
      GROUP BY 1, 2
    ),
    exact AS (SELECT k, COUNT(*) AS exact_cnt FROM keys GROUP BY 1),
    top10 AS (
      SELECT k, exact_cnt FROM exact ORDER BY exact_cnt DESC, k LIMIT 10
    ),
    probes AS (
      SELECT k, exact_cnt, j,
             {_md5_bucket_sql("CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)", _CMS_W)}
               AS bucket
      FROM top10, unnest([0, 1, 2, 3]) AS t(j)
    )
    SELECT p.k AS o_custkey,
           CAST(p.exact_cnt AS BIGINT) AS exact_cnt,
           CAST(min(c.cell_cnt) AS BIGINT) AS cms_est,
           CAST(min(c.cell_cnt) - p.exact_cnt AS BIGINT) AS overcount
    FROM probes p JOIN cells c USING (j, bucket)
    GROUP BY p.k, p.exact_cnt
    """,
    doc="Count-min sketch (d=4, w=64) on the portable md5 hash — point "
        "frequency estimates for the top-10 heavy hitters, with the "
        "overcount surfaced so the one-sided error contract "
        "(est >= exact, always) is hash-checked data. Deterministic "
        "hashes make the whole sketch cross-engine identical (HLL is "
        "not). Build collapses d×N hashed rows to a constant d×w cell "
        "grid via partial aggregation; the probe joins the 256-cell "
        "sketch broadcast-side. Mergeable (cell-wise +), so it partial-"
        "aggregates at 100 TB and is the bounded streaming state for "
        "heavy-hitter tracking",
)
def cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    keys = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("k")
    )
    js = F.array(*[F.lit(j) for j in range(_CMS_D)])
    salted = F.concat(
        F.col("j").cast("string"), F.lit(":"), F.col("k").cast("string")
    )
    hashed = keys.withColumn("j", F.explode(js)).withColumn(
        "bucket", _md5_bucket(salted, _CMS_W)
    )
    cells = hashed.groupBy("j", "bucket").agg(F.count(F.lit(1)).alias("cell_cnt"))
    exact = keys.groupBy("k").agg(F.count(F.lit(1)).alias("exact_cnt"))
    top10 = exact.orderBy(F.col("exact_cnt").desc(), F.col("k")).limit(10)
    probes = top10.withColumn("j", F.explode(js)).withColumn(
        "bucket", _md5_bucket(salted, _CMS_W)
    )
    est = (
        probes.join(F.broadcast(cells), ["j", "bucket"])
        .groupBy("k", "exact_cnt")
        .agg(F.min("cell_cnt").alias("cms_est"))
    )
    return est.select(
        F.col("k").alias("o_custkey"),
        F.col("exact_cnt").cast("long").alias("exact_cnt"),
        F.col("cms_est").cast("long").alias("cms_est"),
        (F.col("cms_est") - F.col("exact_cnt")).cast("long").alias("overcount"),
    )


_BLOOM_M = 512  # bits
_BLOOM_K = 3    # hash functions


@register(
    "bloom_filter_membership",
    f"""
    WITH build AS (SELECT p_partkey AS k FROM part WHERE p_size <= 5),
    bits AS (
      SELECT DISTINCT
             {_md5_bucket_sql("CAST(j AS VARCHAR) || '#' || CAST(k AS VARCHAR)", _BLOOM_M)}
               AS pos
      FROM build, unnest([0, 1, 2]) AS t(j)
    ),
    probe AS (
      SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity >= 45
    ),
    checked AS (
      SELECT p.k,
             min(CASE WHEN b.pos IS NULL THEN 0 ELSE 1 END) AS all_set
      FROM (
        SELECT k, j,
               {_md5_bucket_sql("CAST(j AS VARCHAR) || '#' || CAST(k AS VARCHAR)", _BLOOM_M)}
                 AS pos
        FROM probe, unnest([0, 1, 2]) AS t(j)
      ) p
      LEFT JOIN bits b USING (pos)
      GROUP BY p.k
    ),
    truth AS (
      SELECT c.k, c.all_set,
             CASE WHEN bu.k IS NULL THEN 0 ELSE 1 END AS is_member
      FROM checked c LEFT JOIN (SELECT DISTINCT k FROM build) bu USING (k)
    )
    SELECT CAST((SELECT COUNT(*) FROM build) AS BIGINT) AS n_build,
           CAST((SELECT COUNT(*) FROM bits) AS BIGINT) AS n_bits_set,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(all_set) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(is_member) AS BIGINT) AS n_true_members,
           CAST(SUM(CASE WHEN all_set = 1 AND is_member = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_positives,
           CAST(SUM(CASE WHEN all_set = 0 AND is_member = 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_negatives
    FROM truth
    """,
    doc="Bloom filter as portable SQL data: k=3 md5-derived bit "
        "positions in an m=512 set built from one table's keys, probed "
        "by another's — the manual, REUSABLE form of runtime bloom-join "
        "injection, with the contract surfaced as hash-checked columns: "
        "n_false_negatives is structurally 0 (a Bloom filter never "
        "misses a member), n_false_positives is whatever the load "
        "factor implies and both engines must agree exactly because the "
        "hashes are deterministic. The bit set is a bounded DISTINCT "
        "(≤m rows) broadcast to the probe side; at 100 TB the build is "
        "a map-side-combined shuffle of k×|build| rows capped at m "
        "cells",
)
def bloom_filter_membership(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem")
    build = part.filter(F.col("p_size") <= 5).select(F.col("p_partkey").alias("k"))
    js = F.array(*[F.lit(j) for j in range(_BLOOM_K)])
    salted = F.concat(
        F.col("j").cast("string"), F.lit("#"), F.col("k").cast("string")
    )
    bits = (
        build.withColumn("j", F.explode(js))
        .select(_md5_bucket(salted, _BLOOM_M).alias("pos"))
        .distinct()
    )
    probe = (
        li.filter(F.col("l_quantity") >= 45)
        .select(F.col("l_partkey").alias("k"))
        .distinct()
    )
    checked = (
        probe.withColumn("j", F.explode(js))
        .withColumn("pos", _md5_bucket(salted, _BLOOM_M))
        .join(F.broadcast(bits.withColumn("hit", F.lit(1))), "pos", "left")
        .groupBy("k")
        .agg(F.min(F.coalesce(F.col("hit"), F.lit(0))).alias("all_set"))
    )
    truth = checked.join(
        F.broadcast(build.distinct().withColumn("is_member", F.lit(1))),
        "k",
        "left",
    ).withColumn("is_member", F.coalesce(F.col("is_member"), F.lit(0)))
    # Scalar side-counts stay in-plan (broadcast one-row aggregates), so
    # the whole query is a single job with no driver-side actions.
    n_build = build.agg(F.count(F.lit(1)).cast("long").alias("n_build"))
    n_bits = bits.agg(F.count(F.lit(1)).cast("long").alias("n_bits_set"))
    summary = truth.agg(
        F.count(F.lit(1)).cast("long").alias("n_probes"),
        F.sum("all_set").cast("long").alias("n_bloom_hits"),
        F.sum("is_member").cast("long").alias("n_true_members"),
        F.sum(
            ((F.col("all_set") == 1) & (F.col("is_member") == 0)).cast("int")
        ).cast("long").alias("n_false_positives"),
        F.sum(
            ((F.col("all_set") == 0) & (F.col("is_member") == 1)).cast("int")
        ).cast("long").alias("n_false_negatives"),
    )
    return (
        summary.crossJoin(F.broadcast(n_build))
        .crossJoin(F.broadcast(n_bits))
        .select(
            "n_build",
            "n_bits_set",
            "n_probes",
            "n_bloom_hits",
            "n_true_members",
            "n_false_positives",
            "n_false_negatives",
        )
    )
