"""Cross-engine hazard pins, part 2: NULL ordering in windows, regex
replacement dialects, and outer explode.

Like the NOT-IN-with-NULL and month-end-clamp entries, each of these is
a place where two reasonable engines silently disagree unless the query
author pins the semantics explicitly. The pin is a hash-checked
contract: the registered pair states the portable form on each side, so
any engine/version drift in these semantics fails the gate instead of
corrupting results.

* Window NULL ordering: Spark ASC defaults to NULLS FIRST, DuckDB (and
  Postgres) to NULLS LAST — row_number over a nullable key differs on
  every partition containing a NULL unless the ordering is explicit.
* Regex replacement: Spark (Java regex) writes group references as $1
  and replaces ALL occurrences; DuckDB (RE2) writes \\1 and replaces
  only the FIRST unless the 'g' flag is passed. Same logical operation,
  two spellings — and RE2 additionally rejects backreferences in the
  PATTERN, so portable queries keep groups in the replacement only.
* explode vs explode_outer: an inner explode silently DROPS rows whose
  array is empty; the outer form preserves them with NULL. Engines
  without explode_outer state it as unnest(CASE WHEN empty THEN [NULL]
  ELSE arr END).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table


@register(
    "window_null_ordering_pack",
    """
    WITH t AS (
      SELECT event_id, user_id, ts,
             NULLIF(event_type, 'view') AS nk
      FROM events
    )
    SELECT event_id, user_id,
           CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY nk ASC NULLS FIRST, ts, event_id) AS BIGINT)
             AS rn_nulls_first,
           CAST(row_number() OVER (PARTITION BY user_id
                 ORDER BY nk DESC NULLS LAST, ts, event_id) AS BIGINT)
             AS rn_nulls_last
    FROM t
    """,
    doc="NULL placement in window ordering pinned EXPLICITLY on both "
        "sides: Spark's ASC default is NULLS FIRST while DuckDB/"
        "Postgres default to NULLS LAST (and the reverse for DESC), so "
        "any rank over a nullable key silently renumbers every "
        "NULL-containing partition when a query moves engines unless "
        "asc_nulls_first/desc_nulls_last is stated. NULLIF manufactures "
        "the NULLs deterministically so the pin is non-vacuous in every "
        "partition",
)
def window_null_ordering_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    t = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.nullif(F.col("event_type"), F.lit("view")).alias("nk"),
    )
    w_first = Window.partitionBy("user_id").orderBy(
        F.col("nk").asc_nulls_first(), "ts", "event_id"
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("nk").desc_nulls_last(), "ts", "event_id"
    )
    return t.select(
        "event_id",
        "user_id",
        F.row_number().over(w_first).cast("long").alias("rn_nulls_first"),
        F.row_number().over(w_last).cast("long").alias("rn_nulls_last"),
    )


@register(
    "regex_backreference_pack",
    r"""
    SELECT doc_id,
           md5(regexp_replace(lower(text), '([a-z]+) ([a-z]+)', '\2 \1', 'g'))
             AS swapped_fp,
           substr(regexp_replace(lower(text), '([a-z]+) ([a-z]+)', '\2 \1',
                  'g'), 1, 40) AS swapped_head
    FROM documents
    """,
    doc="Regex replacement dialect pin (word-pair swap over every doc): "
        "Spark/Java spells group references $1 and replaces ALL "
        "matches; DuckDB/RE2 spells them \\1 and replaces only the "
        "FIRST without the 'g' flag — the md5 fingerprint hash-checks "
        "that both spellings + the explicit global flag produce "
        "byte-identical rewrites. Pattern-side backreferences are "
        "avoided entirely: RE2 rejects them, so the portable subset "
        "keeps groups in the replacement only",
)
def regex_backreference_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    swapped = F.regexp_replace(
        F.lower(F.col("text")), r"([a-z]+) ([a-z]+)", r"$2 $1"
    )
    return d.select(
        "doc_id",
        F.md5(swapped).alias("swapped_fp"),
        F.substring(swapped, 1, 40).alias("swapped_head"),
    )


@register(
    "explode_outer_empty_preserved",
    """
    WITH arrs AS (
      SELECT doc_id,
             list_filter(regexp_extract_all(lower(text), '[a-z]+'),
                         t -> len(t) >= 8) AS long_toks
      FROM documents
    )
    SELECT doc_id,
           unnest(CASE WHEN len(long_toks) = 0
                       THEN [CAST(NULL AS VARCHAR)]
                       ELSE long_toks END) AS long_token
    FROM arrs
    """,
    doc="explode_outer row preservation: an inner explode silently "
        "DROPS every document whose array is empty (~20% of docs have "
        "no >=8-letter token — a LEFT-JOIN-shaped data loss bug when "
        "the exploded table is later re-joined to the corpus); the "
        "outer form keeps them as NULL rows. The oracle states the "
        "engine-portable rewrite: unnest over CASE WHEN empty THEN "
        "[NULL] ELSE arr END",
)
def explode_outer_empty_preserved(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    long_toks = F.filter(
        F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)"),
        lambda t: F.length(t) >= 8,
    )
    return d.select(
        "doc_id", F.explode_outer(long_toks).alias("long_token")
    )
