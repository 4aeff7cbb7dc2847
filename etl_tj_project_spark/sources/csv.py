"""CSV staging reader — the engine's equivalent of the reference's
``COPY <staging> FROM STDIN WITH CSV HEADER`` (S1;
dags/stage_csv_dims_to_pg.py:106-120).

The reference lands every CSV column as text in a staging table and
promotes types afterwards. We mirror that: read with an explicit
all-string schema (never ``inferSchema`` — inference is a full extra pass
over the data and is nondeterministic across files), then promote with a
typed ``select`` (operators/dims.py, operators/projections.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def read_csv_staging(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    header: bool = True,
    corrupt_col: str | None = None,
) -> DataFrame:
    """Read a CSV into an all-string staging DataFrame.

    ``schema`` must be all-string (schema-on-load staging semantics);
    multiline/quote handling follows RFC-4180 like the reference's COPY.

    ``corrupt_col`` opts into malformed-row auditing: rows whose token
    count disagrees with the schema land with their RAW LINE in that
    extra column (best-effort prefix parse alongside), instead of being
    silently mangled — the production posture for 100 TB ingest, where
    "how many rows failed and what did they look like" must be a query,
    not a log grep. Spark refuses a query that selects ONLY the
    internal corrupt column from raw CSV
    (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) — cache or
    otherwise materialize the staging frame first:
    ``df.cache(); df.filter(col(corrupt_col).isNotNull())``. The
    reference's COPY aborts the whole load on such rows (all-or-
    nothing); this keeps the load running and quarantines instead.
    """
    for f in schema.fields:
        if not isinstance(f.dataType, T.StringType):
            raise ValueError(
                f"staging schema must be all-string; {f.name} is {f.dataType}"
            )
    reader = (
        spark.read.option("header", str(header).lower())
        .option("multiLine", "false")
        .option("mode", "PERMISSIVE")
    )
    if corrupt_col is not None:
        schema = T.StructType(
            list(schema.fields)
            + [T.StructField(corrupt_col, T.StringType(), True)]
        )
        reader = reader.option("columnNameOfCorruptRecord", corrupt_col)
    return reader.schema(schema).csv(path)
