"""Lake IO: partitioned Parquet writers with idempotent daily re-runs.

Reference parity: the daily RANGE-partitioned aggregate tables + dynamic
per-day partition DDL (S4/S7; dags/dag_datapelangan.py:118-151) map to
Hive-style ``tanggal=YYYY-MM-DD/`` directory partitioning. Dynamic
partition overwrite replaces exactly the partitions present in the batch,
which (a) makes re-running a day idempotent — deliberately better than the
reference, which duplicates rows on re-run (SURVEY §2.10) — and (b) never
touches the other ~36,500 day-partitions of a 100-year table.

The reference's `TRUNCATE + INSERT` full refresh (S6) is mode("overwrite")
without a partition column; its upsert (S5) is handled in operators/dims.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "tanggal",
    mode: str = "overwrite",
) -> None:
    """Write Hive-partitioned parquet; with the session conf
    ``partitionOverwriteMode=dynamic`` (set by session.tune) `overwrite`
    only replaces the partitions present in ``df``."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def overwrite_table(df: DataFrame, path: str) -> None:
    """Full refresh (TRUNCATE + reload semantics)."""
    df.write.mode("overwrite").parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sorted_by_key: bool = True,
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key. Two tables bucketed on the same key with the same bucket count
    join with ZERO exchange — at 100 TB that removes the dominant shuffle
    of every fact⋈fact join on the bucket key (the bucketing replaces the
    btree join indexes of SURVEY §2.1 S8).

    Bucket count guidance: total_size / buckets ≈ 128-512 MB per bucket
    file per partition; too few buckets re-creates skew, too many makes
    small files. Bucketed layout only pays off when ≥2 queries reuse it —
    one-shot joins should rely on AQE instead.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sorted_by_key:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "tanggal",
) -> None:
    """Small-files compaction for a partitioned table: rewrite every
    day-partition as one file (streaming micro-batches and repeated
    backfills accrete small files; at 100 TB the resulting driver-side
    file listing and per-file open cost dominate scan time long before
    data volume does).

    `repartition(partition_col)` hash-clusters each partition's rows into
    a single task → one output file per partition dir; dynamic partition
    overwrite swaps partitions in place. Run as periodic maintenance, not
    per-write. For multi-GB partitions switch to
    ``repartition(n, partition_col, F.spark_partition_id())``-style
    salting to target ~256 MB files instead of exactly one.
    """
    df = spark.read.parquet(path)
    df.repartition(partition_col).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)
