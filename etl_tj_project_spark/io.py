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
