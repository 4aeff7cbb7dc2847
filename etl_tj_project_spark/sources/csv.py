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
) -> DataFrame:
    """Read a CSV into an all-string staging DataFrame.

    ``schema`` must be all-string (schema-on-load staging semantics);
    multiline/quote handling follows RFC-4180 like the reference's COPY.
    """
    for f in schema.fields:
        if not isinstance(f.dataType, T.StringType):
            raise ValueError(
                f"staging schema must be all-string; {f.name} is {f.dataType}"
            )
    return (
        spark.read.schema(schema)
        .option("header", str(header).lower())
        .option("multiLine", "false")
        .option("mode", "PERMISSIVE")
        .csv(path)
    )
