"""Federated (JDBC) source — the reference's dblink cross-database pull
(S2; dags/dag_datapelangan.py:173-186) as a Spark JDBC read.

The reference hand-inlines the day+status filter and 6-column projection
into the remote query string so only one day's rows cross the wire. With
``spark.read.jdbc`` that pushdown is declarative: filters and column
pruning on the returned DataFrame are compiled into the remote SQL by the
JDBC source (predicate pushdown), and ``partition_column`` splits the read
into parallel range queries — the knob the reference lacks entirely (its
dblink pull is a single serial cursor).

Proven end-to-end in tests/test_scale_plans.py against embedded Derby
(the one JDBC engine whose driver ships inside Spark's own jars):
pushdown lands in the remote SQL, the read splits into parallel range
queries, values round-trip exactly. For engines whose driver jar is
absent (e.g. Postgres here), the builder still constructs the lazy
DataFrame and an action raises Spark's clear driver-not-found error —
that gate is tested too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_jdbc_pushdown(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    *,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 10_000,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Lazy JDBC read with parallel range partitioning.

    ``table_or_query`` may be a table name or a ``(SELECT ...) t``
    subquery — prefer the table name and put filters on the returned
    DataFrame instead, so Catalyst decides what to push. With
    ``partition_column`` (a numeric/date column), Spark issues
    ``num_partitions`` bounded range queries in parallel; without it the
    read is one serial cursor (the reference's behavior).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table_or_query)
        .option("fetchsize", str(fetch_size))
    )
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader.load()
