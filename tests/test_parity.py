"""Unit tests for the cross-engine representation-pinning layer."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from etl_tj_project_spark import parity


def test_pin_oracle_wraps_decimal_and_hugeint():
    con = parity.describe_connection()
    try:
        sql = ("SELECT CAST(1.50 AS DECIMAL(18,2)) AS money, "
               "SUM(x) AS intsum, 'k' AS tag "
               "FROM (SELECT 1 AS x) t GROUP BY tag")
        pinned = parity.pin_oracle_sql(con, sql)
        assert pinned != sql
        desc = {name: typ for name, typ, *_ in con.sql(f"DESCRIBE {pinned}").fetchall()}
        assert desc["money"] == "DOUBLE"
        assert desc["intsum"] == "BIGINT"
        assert desc["tag"] == "VARCHAR"
        row = con.sql(pinned).fetchone()
        assert row == (1.5, 1, "k")
    finally:
        con.close()


def test_pin_oracle_leaves_clean_sql_unchanged():
    con = parity.describe_connection()
    try:
        sql = "SELECT 1 AS a, 'x' AS b, CAST(2.5 AS DOUBLE) AS c"
        assert parity.pin_oracle_sql(con, sql) == sql
    finally:
        con.close()


def test_pin_spark_output_casts_decimals(spark):
    df = spark.range(2).select(
        F.col("id"),
        F.lit("1.50").cast(T.DecimalType(18, 2)).alias("money"),
        F.array(F.lit("2.25").cast(T.DecimalType(10, 2))).alias("moneys"),
        F.lit("s").alias("tag"),
    )
    pinned = parity.pin_spark_output(df)
    types = {f.name: f.dataType for f in pinned.schema.fields}
    assert types["money"] == T.DoubleType()
    assert types["moneys"] == T.ArrayType(T.DoubleType())
    assert types["tag"] == T.StringType()
    assert types["id"] == T.LongType()
    row = pinned.orderBy("id").first()
    assert row.money == 1.5 and row.moneys == [2.25]


def test_pin_spark_output_noop_without_decimals(spark):
    df = spark.range(1).select("id", F.lit("x").alias("s"))
    assert parity.pin_spark_output(df) is df


def test_oracle_sql_fails_open_per_entry(monkeypatch):
    """A single DESCRIBE failure must degrade that one entry to its raw
    oracle, not destroy the whole dict."""
    from etl_tj_project_spark import harness, parity

    real = parity.pin_oracle_sql
    victim = "p2_equality_filter"

    def flaky(con, sql):
        if sql is harness.REGISTRY[victim].oracle:
            raise RuntimeError("injected describe failure")
        return real(con, sql)

    monkeypatch.setattr(parity, "pin_oracle_sql", flaky)
    out = harness.oracle_sql()
    assert out[victim] == harness.REGISTRY[victim].oracle  # raw fallback
    assert len(out) == sum(1 for e in harness.REGISTRY.values() if e.oracle)
    # Other entries still pinned (p1 has decimal outputs -> wrapped).
    assert out["p1_typed_projection"] != harness.REGISTRY["p1_typed_projection"].oracle


def test_doubles_sql_bit_exact(spark):
    """The one-round-trip F.expr literal builder (r18) must reproduce
    the F.lit-built doubles bit-for-bit: repr() emits the shortest
    round-tripping decimal and the D-suffixed SQL literal parses via
    correctly-rounded Double.parseDouble."""
    import random
    import struct

    from etl_tj_project_spark.operators.similarity import _doubles_sql

    rng = random.Random(20260818)
    vals = (
        [rng.gauss(0.0, 1.0) for _ in range(100)]
        + [rng.uniform(-1e10, 1e10) for _ in range(50)]
        + [rng.gauss(0.0, 1.0) * 10 ** rng.randint(-30, 30) for _ in range(100)]
        + [0.0, -0.0, 1.0, -1.5, 1e-310, 2.0**-1074, -(2.0**1023)]
    )
    got = spark.range(1).select(F.expr(_doubles_sql(vals)).alias("a"))
    want = spark.range(1).select(F.array(*[F.lit(float(v)) for v in vals]).alias("a"))
    ga = got.collect()[0][0]
    wa = want.collect()[0][0]
    assert len(ga) == len(wa) == len(vals)
    for g, w in zip(ga, wa):
        assert struct.pack("<d", g) == struct.pack("<d", w)
