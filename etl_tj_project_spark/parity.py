"""Cross-engine output-representation pinning.

Round-1 lesson (CORRECTNESS_r01 + VERDICT.md): every hash-red query was
value-identical to its oracle — the driver's order-insensitive value hash
is *representation*-sensitive. Two client-side representation families
diverge between engines even when the computed values are equal:

* DECIMAL output columns: Spark collects ``Decimal('23.00')`` while the
  DuckDB client materializes decimal results as float64 (``23.0``), so
  any trailing-zero value hash-mismatches.
* DuckDB ``SUM(INTEGER)`` returns HUGEINT, which the client also turns
  into float64 (``98.0``), while Spark's ``sum(int)`` is BIGINT (``98``).

The fix is mechanical and global, so it lives here instead of in 104
hand-edited query pairs: decimal arithmetic stays *internal* (exactness
is the point — order-independent sums), but every **output** column is
pinned to a representation both engines materialize bit-identically:

* Spark side (:func:`pin_spark_output`): cast top-level DECIMAL (and
  ``array<decimal>``) result columns to DOUBLE. Casting the exact
  decimal to double is deterministic round-to-nearest on both engines,
  so equal decimals produce bit-equal doubles.
* Oracle side (:func:`pin_oracle_sql`): ``DESCRIBE`` the oracle query on
  a schema-only DuckDB connection (tiny sf — parquet footers only) and
  wrap it in one projection that casts DECIMAL→DOUBLE and
  HUGEINT→BIGINT.

Both ``queries()`` and ``oracle_sql()`` in :mod:`.harness` route through
this module, and ``tests/oracle_compare.py`` *forbids* DECIMAL/HUGEINT
in either engine's output so the local gate is at least as strict as the
driver's.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Schema-only describes: the tiniest generated SF is enough (types do not
# depend on scale factor).
DESCRIBE_SF_DIR = os.environ.get("SPARK_GRAFT_DESCRIBE_SF", "/root/testdata/sf0.001")

QueryFn = Callable[[SparkSession, str], DataFrame]


# ---------------------------------------------------------------------------
# Spark side
# ---------------------------------------------------------------------------

def _pinned_type(dt: T.DataType) -> T.DataType | None:
    """The same type with every DECIMAL (at any nesting depth — struct,
    array, map) replaced by DOUBLE; None when nothing needs pinning."""
    if isinstance(dt, T.DecimalType):
        return T.DoubleType()
    if isinstance(dt, T.ArrayType):
        el = _pinned_type(dt.elementType)
        return T.ArrayType(el, dt.containsNull) if el is not None else None
    if isinstance(dt, T.StructType):
        pinned = {f.name: _pinned_type(f.dataType) for f in dt.fields}
        if not any(p is not None for p in pinned.values()):
            return None
        return T.StructType([
            T.StructField(
                f.name,
                pinned[f.name] if pinned[f.name] is not None else f.dataType,
                f.nullable,
            )
            for f in dt.fields
        ])
    if isinstance(dt, T.MapType):
        k, v = _pinned_type(dt.keyType), _pinned_type(dt.valueType)
        if k is None and v is None:
            return None
        return T.MapType(
            k if k is not None else dt.keyType,
            v if v is not None else dt.valueType,
            dt.valueContainsNull,
        )
    return None


def _pin_col(field: T.StructField):
    pinned = _pinned_type(field.dataType)
    if pinned is None:
        return None
    # One cast handles arbitrary nesting: Spark casts struct→struct /
    # array→array / map→map field-wise when the shapes line up.
    return F.col(field.name).cast(pinned).alias(field.name)


def pin_spark_output(df: DataFrame) -> DataFrame:
    """Cast DECIMAL result columns to DOUBLE; no-op when none exist."""
    pinned = {f.name: _pin_col(f) for f in df.schema.fields}
    if not any(c is not None for c in pinned.values()):
        return df
    return df.select(
        *[pinned[f.name] if pinned[f.name] is not None else F.col(f.name)
          for f in df.schema.fields]
    )


def pin_spark(fn: QueryFn) -> QueryFn:
    """Wrap a registry builder so its output representation is pinned."""

    @functools.wraps(fn)
    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        return pin_spark_output(fn(spark, sf_dir))

    return wrapped


# ---------------------------------------------------------------------------
# Oracle (DuckDB) side
# ---------------------------------------------------------------------------

def describe_connection(sf_dir: str = DESCRIBE_SF_DIR):
    """A DuckDB connection with the testdata views, for DESCRIBE only."""
    import duckdb

    from etl_tj_project_spark.schemas import TESTDATA_TABLES

    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _quote(name: str) -> str:
    return '"' + name.replace('"', '""') + '"'


def _oracle_cast(name: str, duck_type: str) -> str | None:
    t = duck_type.upper()
    if t.startswith("DECIMAL") and t.endswith("[]"):
        return f"CAST({_quote(name)} AS DOUBLE[]) AS {_quote(name)}"
    if t.startswith("DECIMAL"):
        return f"CAST({_quote(name)} AS DOUBLE) AS {_quote(name)}"
    if t in ("HUGEINT", "UHUGEINT"):
        return f"CAST({_quote(name)} AS BIGINT) AS {_quote(name)}"
    return None


def pin_oracle_sql(con, sql: str) -> str:
    """Wrap oracle SQL so DECIMAL→DOUBLE and HUGEINT→BIGINT in one
    outer projection. Returns the SQL unchanged when nothing needs
    pinning (keeps the common case readable in CORRECTNESS diffs)."""
    desc = con.sql(f"DESCRIBE {sql}").fetchall()
    casts = [_oracle_cast(name, typ) for name, typ, *_ in desc]
    if not any(casts):
        return sql
    proj = ", ".join(
        cast if cast is not None else _quote(name)
        for cast, (name, *_rest) in zip(casts, desc)
    )
    return f"SELECT {proj} FROM (\n{sql}\n) __pinned"
