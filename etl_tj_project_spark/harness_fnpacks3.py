"""Function-family packs part 3: positional explode, regexp extract-all,
null-safe equality joins, and the map/struct surface.

Oracle convention: the oracle states the *semantics* (what values come
out), not the mechanism — e.g. the map-surface query emits scalars whose
oracle is the direct column expression, which is exactly what makes the
pair a correctness check on Spark's map functions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table


@register(
    "posexplode_tokens",
    r"""
    WITH t AS (
      SELECT doc_id,
             CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END
               AS toks
      FROM documents WHERE doc_id < 50
    )
    SELECT t.doc_id, CAST(x.i - 1 AS INTEGER) AS pos, t.toks[CAST(x.i AS INTEGER)] AS term
    FROM t, UNNEST(range(1, len(t.toks) + 1)) AS x(i)
    """,
    doc="Positional explode (LATERAL VIEW posexplode): token with its "
        "0-based position — the order-preserving explode every sequence "
        "feature (n-gram windows, position embeddings) builds on. "
        "Engine-side explode, no Python",
)
def posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    with_toks = d.select(
        "doc_id",
        F.when(F.trim("text") == "", F.array()).otherwise(toks).alias("toks"),
    )
    return with_toks.select(
        "doc_id", F.posexplode("toks").alias("pos", "term")
    )


@register(
    "regexp_extract_all_numbers",
    r"""
    SELECT doc_id,
           coalesce(array_to_string(regexp_extract_all(text, '[0-9]+'), ','),
                    '') AS nums_csv,
           CAST(len(regexp_extract_all(text, '[0-9]+')) AS INTEGER)
             AS n_nums,
           CASE WHEN len(regexp_extract_all(text, '[0-9]+')) > 0
                THEN regexp_extract_all(text, '[0-9]+')[1] END AS first_num
    FROM documents
    """,
    doc="regexp_extract_all: every digit run per document as an ordered "
        "array (left-to-right in both engines), plus count and first "
        "match — the extraction primitive behind PII scans and numeric "
        "claim mining. The ordered array is surfaced as its CSV string "
        "(scalar columns only — raw array cells break pandas-based "
        "canonicalizers downstream)",
)
def regexp_extract_all_numbers(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    nums = F.regexp_extract_all("text", F.lit("[0-9]+"))
    return d.select(
        "doc_id",
        F.array_join(nums, ",").alias("nums_csv"),
        F.size(nums).alias("n_nums"),
        F.when(F.size(nums) > 0, F.element_at(nums, 1)).alias("first_num"),
    )


@register(
    "null_safe_join_agg",
    """
    WITH c AS (
      SELECT c_custkey, nullif(c_mktsegment, 'BUILDING') AS seg
      FROM customer
    ), labels AS (
      SELECT DISTINCT nullif(c_mktsegment, 'BUILDING') AS seg,
             coalesce(nullif(c_mktsegment, 'BUILDING'), 'SUPPRESSED')
               AS seg_label
      FROM customer
    )
    SELECT l.seg_label, COUNT(*) AS n_customers
    FROM c JOIN labels l ON c.seg IS NOT DISTINCT FROM l.seg
    GROUP BY l.seg_label
    """,
    doc="Null-safe equality join (Spark <=> / eqNullSafe, SQL IS NOT "
        "DISTINCT FROM): NULL keys match each other instead of being "
        "dropped — the semantics needed when NULL is a real category "
        "(suppressed segment) rather than absence. Plain equi-join "
        "machinery applies, so it broadcasts/shuffles like any join",
)
def null_safe_join_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").select(
        "c_custkey", F.nullif("c_mktsegment", F.lit("BUILDING")).alias("seg")
    )
    labels = (
        c.select("seg").distinct()
        .select("seg", F.coalesce("seg", F.lit("SUPPRESSED")).alias("seg_label"))
    )
    return (
        c.join(F.broadcast(labels), c["seg"].eqNullSafe(labels["seg"]))
        .groupBy("seg_label")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "map_struct_pack",
    """
    SELECT o_orderkey,
           o_orderstatus                                   AS status_via_map,
           CAST(2 AS INTEGER)                              AS map_size,
           'prio,status'                                   AS keys_sorted,
           o_orderpriority                                 AS prio_via_struct,
           o_orderstatus || ':' || o_orderpriority         AS packed
    FROM orders
    """,
    doc="Map/struct surface: create_map + element_at, map_keys (sorted "
        "for determinism), struct field access, struct->string packing. "
        "The oracle states the equivalent direct expressions — the pair "
        "checks Spark's map/struct functions produce exactly the "
        "underlying values. Maps/structs never cross the client "
        "boundary (engine reprs differ); only extracted scalars do",
)
def map_struct_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("status"), F.col("o_orderstatus"),
        F.lit("prio"), F.col("o_orderpriority"),
    )
    st = F.struct(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    )
    return o.select(
        "o_orderkey",
        F.element_at(m, "status").alias("status_via_map"),
        F.size(m).alias("map_size"),
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("keys_sorted"),
        st.getField("p").alias("prio_via_struct"),
        F.concat_ws(":", st.getField("s"), st.getField("p")).alias("packed"),
    )
