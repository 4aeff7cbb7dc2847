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


def write_jdbc_upsert(
    df: DataFrame,
    url: str,
    table: str,
    key_cols: list[str],
    properties: dict[str, str] | None = None,
    staging_table: str | None = None,
) -> None:
    """ON CONFLICT upsert into a JDBC table (the reference's S5 sink,
    stage_csv_dims_to_pg.py upsert) as stage-then-MERGE:

    1. the DataFrame is written to a staging table through the parallel
       executor-side JDBC writer (the data plane — this is the part that
       must scale);
    2. one driver-side ``MERGE INTO target USING staging`` statement
       asks the database to reconcile keys transactionally (the control
       plane — a single SQL round-trip regardless of data volume,
       exactly how the reference's ON CONFLICT behaves).

    Requires the target table to exist (its schema defines the merge
    contract). ANSI MERGE syntax — works on Derby (tested here),
    Postgres 15+, Oracle, SQL Server; for older Postgres swap step 2
    for INSERT ... ON CONFLICT.

    String KEY columns need ``properties["createTableColumnTypes"]``
    (e.g. ``"day_key VARCHAR(10), kind VARCHAR(16)"``): Spark's JDBC
    writer maps StringType to the engine's unbounded text type (CLOB on
    Derby), and engines typically cannot compare CLOB against the
    target's VARCHAR in the MERGE's ON clause. Non-key string columns
    are unaffected (assignment casts fine).
    """
    spark = df.sparkSession
    staging = staging_table or f"{table}_stg"
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", staging)
        .mode("overwrite")
    )
    for k, v in (properties or {}).items():
        writer = writer.option(k, v)
    writer.save()

    # The Spark JDBC writer creates staging columns QUOTED with the exact
    # DataFrame names (case-sensitive in the DB), so staging refs must be
    # quoted; target refs stay unquoted and resolve with the DB's normal
    # case-folding against the pre-existing table.
    def s_ref(c: str) -> str:
        return 's."' + c.replace('"', '""') + '"'

    non_keys = [c for c in df.columns if c not in key_cols]
    on = " AND ".join(f"t.{k} = {s_ref(k)}" for k in key_cols)
    set_clause = ", ".join(f"t.{c} = {s_ref(c)}" for c in non_keys)
    cols = ", ".join(df.columns)
    vals = ", ".join(s_ref(c) for c in df.columns)
    merge = (
        f"MERGE INTO {table} t USING {staging} s ON ({on}) "
        f"WHEN MATCHED THEN UPDATE SET {set_clause} "
        f"WHEN NOT MATCHED THEN INSERT ({cols}) VALUES ({vals})"
    )
    jvm = spark._jvm
    props = properties or {}
    driver = props.get("driver")
    if driver:
        jvm.java.lang.Class.forName(driver)
    # Forward connection properties (user/password/ssl/...) to the
    # driver-side control connection too — the executor-side writer above
    # already got them via .option(), and an authenticated target
    # (Postgres/Oracle/SQL Server) rejects a bare getConnection(url).
    # Spark-reserved reader/writer options are not JDBC driver properties.
    jprops = jvm.java.util.Properties()
    # Spark treats reader/writer option names case-insensitively and
    # accepts non-string values; java.util.Properties does neither —
    # compare folded and stringify.
    _spark_only = {
        "driver", "dbtable", "url", "fetchsize", "batchsize",
        "createtablecolumntypes", "createtableoptions",
    }
    for k, v in props.items():
        if k.lower() not in _spark_only:
            jprops.setProperty(str(k), str(v))
    con = jvm.java.sql.DriverManager.getConnection(url, jprops)
    try:
        st = con.createStatement()
        st.executeUpdate(merge)
    finally:
        # Drop staging even when the MERGE fails — otherwise a failed run
        # orphans the staging table and the NEXT run's overwrite may
        # conflict with it. A lost connection can make the DROP itself
        # fail; that must not mask the original MERGE error.
        try:
            con.createStatement().executeUpdate(f"DROP TABLE {staging}")
        except Exception:
            pass
        con.close()


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
