"""JSON-lines corpus reader — the ingest format web-scale text corpora
actually arrive in (one JSON document per line: Common Crawl derivates,
Dolma, RedPajama all ship JSONL/JSONL.gz shards).

Same staging posture as the CSV reader (sources/csv.py): an EXPLICIT
schema (never ``inferSchema`` — an extra full pass, and union-of-keys
inference is nondeterministic across shards), PERMISSIVE mode with the
raw line quarantined into a corrupt column instead of aborting the load.
At 100 TB "how many lines failed and what did they look like" must be a
query, not a log grep; a malformed shard costs its bad lines, not the
ingest.

Reading is fully parallel: JSONL splits on newlines, so each task
parses its own byte range (gzip shards are splittable only per-file —
at scale prefer many ~256 MB shards over few huge ones, or zstd with
seekable framing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    *,
    corrupt_col: str = "_corrupt_record",
) -> DataFrame:
    """Read JSONL with an explicit schema; malformed lines land with
    their raw text in ``corrupt_col`` (other columns NULL) rather than
    killing the read or vanishing.

    As with raw CSV, Spark refuses a query that selects ONLY the
    internal corrupt column (QUERY_ONLY_CORRUPT_RECORD_COLUMN) —
    materialize first (``df.cache()``) before auditing quarantined rows.
    """
    full = T.StructType(
        list(schema.fields) + [T.StructField(corrupt_col, T.StringType(), True)]
    )
    return (
        spark.read.option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corrupt_col)
        .schema(full)
        .json(path)
    )


def read_documents_jsonl(
    spark: SparkSession,
    path: str,
    *,
    require_text: bool = True,
) -> tuple[DataFrame, DataFrame]:
    """Load a JSONL shard set into the engine's ``documents`` shape →
    (clean, quarantine).

    clean: (doc_id bigint, text string, lang string, source string,
    n_chars bigint) — ``n_chars`` recomputed from the text (never
    trusted from the wire), rows with unparseable JSON or (optionally)
    missing text excluded. quarantine: the raw offending lines plus
    which rule they broke — a queryable audit table, written alongside
    the clean load in production.
    """
    raw = read_jsonl(
        spark,
        path,
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("text", T.StringType(), True),
                T.StructField("lang", T.StringType(), True),
                T.StructField("source", T.StringType(), True),
            ]
        ),
    )
    bad_json = F.col("_corrupt_record").isNotNull()
    missing_text = (
        (F.col("text").isNull() | (F.length("text") == 0))
        if require_text
        else F.lit(False)
    )
    bad_id = F.col("doc_id").isNull()
    clean = (
        raw.filter(~bad_json & ~missing_text & ~bad_id)
        .select(
            "doc_id",
            "text",
            "lang",
            "source",
            F.length("text").cast("long").alias("n_chars"),
        )
    )
    quarantine = (
        raw.filter(bad_json | missing_text | bad_id)
        .select(
            F.coalesce(
                F.col("_corrupt_record"),
                F.to_json(F.struct("doc_id", "text", "lang", "source")),
            ).alias("raw_line"),
            F.when(bad_json, F.lit("malformed_json"))
            .when(bad_id, F.lit("missing_doc_id"))
            .otherwise(F.lit("missing_text"))
            .alias("reason"),
        )
    )
    return clean, quarantine
