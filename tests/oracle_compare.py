"""Local re-implementation of the driver's DuckDB-oracle compare so every
query in the inventory is gated in pytest before the driver ever sees it:
row count, column names, and an order-insensitive value comparison.
"""

from __future__ import annotations

import math
from datetime import date, datetime
from decimal import Decimal

import duckdb

from etl_tj_project_spark.schemas import TESTDATA_TABLES


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NULL"
        # repr round-trips doubles exactly; bit-identical floats match.
        return repr(v)
    if isinstance(v, Decimal):
        # Round 1 proved the driver's hash is representation-sensitive:
        # Spark Decimal('23.00') vs DuckDB client float64 23.0 mismatch
        # even when values are equal. The parity layer must have pinned
        # every decimal output to DOUBLE before it gets here.
        raise AssertionError(
            "DECIMAL value reached the compare — output representation "
            f"not pinned (value={v!r}); route the query through "
            "parity.pin_spark / parity.pin_oracle_sql"
        )
    if isinstance(v, datetime):
        return v.isoformat()
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, bool):
        return str(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def normalize_rows(columns: list[str], rows: list[tuple]) -> list[tuple]:
    """Sort columns by name, normalize cells, sort rows."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm_cell(r[i]) for i in order) for r in rows]
    out.sort()
    return out


def driver_canonicalize_check(columns: list[str], rows: list[tuple]) -> None:
    """Emulate the driver's pandas canonicalization path and reject any
    result shape it would crash on.

    The round-4 ``array_agg_sorted`` lesson: the local gate's
    ``_norm_cell`` happily stringifies list cells, but the driver loads
    both results into pandas, sorts columns by name, lexsorts the rows,
    and hashes cell values — and that crashed with ``TypeError:
    unhashable type: 'numpy.ndarray'`` on an array output column, so a
    query can pass locally and still go red driver-side. Run the same
    factorize/lexsort moves here so the local gate is at least as strict
    as the driver: any column whose cells pandas cannot hash (ndarray,
    list, dict, set, bytearray) is rejected outright.
    """
    import pandas as pd

    df = pd.DataFrame(rows, columns=columns)
    df = df[sorted(df.columns)]
    for c in df.columns:
        try:
            # factorize is pandas' hash-based codepath; unhashable cell
            # values raise TypeError exactly like the driver's hasher.
            pd.factorize(df[c])
        except TypeError as e:
            raise AssertionError(
                f"column {c!r} would crash the driver canonicalizer "
                f"(unhashable cells): {e}"
            ) from e
    if len(df):
        try:
            # The lexsort the driver applies before hashing; mixed
            # incomparable object cells raise here just like driver-side.
            df.sort_values(list(df.columns), kind="mergesort")
        except TypeError as e:
            raise AssertionError(
                "a column would crash the driver canonicalizer's lexsort "
                f"(mixed incomparable cells): {e}"
            ) from e


def compare_pinned(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Pin both sides' output representation (DECIMAL→DOUBLE etc.), then
    compare. For tests whose DataFrames are internal warehouse tables that
    legitimately carry DECIMAL columns."""
    from etl_tj_project_spark import parity

    compare(parity.pin_spark_output(spark_df), con, parity.pin_oracle_sql(con, sql))


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert Spark result == DuckDB oracle result (order-insensitive).

    Also enforces the representation-pinning invariant on both schemas:
    no DECIMAL on the Spark side, no DECIMAL/HUGEINT on the DuckDB side
    (those materialize differently in the two clients — see parity.py).
    """
    from pyspark.sql import types as T

    def _has_decimal(dt) -> bool:
        # Recursive: a DECIMAL nested in a struct/array/map materializes
        # differently across the two clients just like a top-level one.
        if isinstance(dt, T.DecimalType):
            return True
        if isinstance(dt, T.ArrayType):
            return _has_decimal(dt.elementType)
        if isinstance(dt, T.StructType):
            return any(_has_decimal(f.dataType) for f in dt.fields)
        if isinstance(dt, T.MapType):
            return _has_decimal(dt.keyType) or _has_decimal(dt.valueType)
        return False

    bad_spark = [
        f.name for f in spark_df.schema.fields if _has_decimal(f.dataType)
    ]
    assert not bad_spark, f"unpinned DECIMAL output columns (spark): {bad_spark}"
    # Complex-typed output columns crash the driver's pandas canonicalizer
    # (the r4 array_agg_sorted red row) — reject them at the schema level
    # so even a 0-row result can't smuggle one past the gate. Every
    # registry entry returns scalar columns only (flatten arrays to a
    # deterministic CSV string like array_agg_sorted does).
    complex_spark = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType, T.BinaryType)
        )
    ]
    assert not complex_spark, (
        f"complex-typed output columns would crash the driver "
        f"canonicalizer: {complex_spark} — flatten to scalars"
    )
    # Substring, not prefix: catches STRUCT(x DECIMAL(18,2)),
    # MAP(VARCHAR, DECIMAL), DECIMAL[] — any nesting DuckDB can print.
    bad_duck = [
        (name, typ)
        for name, typ, *_ in con.sql(f"DESCRIBE {sql}").fetchall()
        if "DECIMAL" in typ.upper() or "HUGEINT" in typ.upper()
    ]
    assert not bad_duck, f"unpinned DECIMAL/HUGEINT oracle columns: {bad_duck}"

    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.sql(sql)
    d_cols = [c for c in rel.columns]
    d_rows = rel.fetchall()

    # Cell-level driver-canonicalizer emulation on BOTH sides (schema
    # check above can't see what the DuckDB client materializes).
    driver_canonicalize_check(s_cols, s_rows)
    driver_canonicalize_check(d_cols, d_rows)

    assert sorted(c.lower() for c in s_cols) == sorted(
        c.lower() for c in d_cols
    ), f"column mismatch: spark={s_cols} duckdb={d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    )
    sn = normalize_rows([c.lower() for c in s_cols], s_rows)
    dn = normalize_rows([c.lower() for c in d_cols], d_rows)
    if sn != dn:
        diff_s = [r for r in sn if r not in set(dn)][:5]
        diff_d = [r for r in dn if r not in set(sn)][:5]
        raise AssertionError(
            f"value mismatch; spark-only sample={diff_s}; duckdb-only sample={diff_d}"
        )
