"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

All real logic lives in ``etl_tj_project_spark``; this file is a thin
adapter. Query inventory: etl_tj_project_spark/harness.py (one entry per
operator in SURVEY.md §2 plus the training-data-pipeline extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from etl_tj_project_spark import harness
from etl_tj_project_spark.session import tune

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The flagship is the agg_by_route pipeline shape (SURVEY §3.1): two
    differently-joined fact branches (inner broadcast join with fan-out +
    left cast-key join), unioned, then hash-aggregated with count+decimal
    sum.
    """
    tune(spark)
    fn = harness.parity.pin_spark(harness.REGISTRY["u2_two_branch_union_agg"].spark)
    return fn(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return harness.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each hash-checkable query."""
    return harness.oracle_sql()
