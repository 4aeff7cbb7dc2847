"""Loaders for the driver's Parquet test tables (/root/testdata/sf*).

One quirk: ``events.ts`` is parquet ``TIMESTAMP(NANOS)``, which Spark has
no native type for — we flip ``spark.sql.legacy.parquet.nanosAsLong`` (a
runtime-settable conf) and convert the int64 nanoseconds to a microsecond
timestamp column. Everything else is a plain schema-preserving scan, so
Catalyst column pruning / filter pushdown reach the parquet reader.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tj_project_spark.session import tune

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table; normalizes ``events.ts`` to TimestampType.

    Calls :func:`tune` first so every registered query is self-sufficient
    on a vanilla session (nanosAsLong for the events scan, UTC timezone
    for date truncation) even if the harness never ran ``entry()``.
    """
    tune(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        from pyspark.sql import types as T

        df = spark.read.parquet(path)
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, T.LongType):
            # Parquet TIMESTAMP(NANOS) surfaced as int64 via nanosAsLong:
            # nanoseconds since epoch → microsecond-precision timestamp.
            # Integer `div` (not `/`) — float division of ~1e18 ns loses
            # µs bits.
            return df.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        if isinstance(ts_type, T.TimestampNTZType):
            # Parquet TIMESTAMP(MICROS, isAdjustedToUTC=false): wall-clock
            # preserving cast; session timezone is pinned UTC by tune().
            return df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {n: load_table(spark, sf_dir, n) for n in names}
