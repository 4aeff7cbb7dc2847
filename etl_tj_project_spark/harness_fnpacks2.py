"""Function-family packs, part 2: math, NULL semantics, and conditional /
arg-extremum aggregates.

Like the other packs, each query pins the CROSS-ENGINE CONVENTIONS —
the return-type and edge-case differences between Spark and ANSI engines
that silently corrupt results when code is ported (ceil's return type,
null-safe equality spelling, arg-extremum tie behavior). Functions whose
cross-library results are not bit-reproducible (ln/exp/pow with
non-integer args — libm-dependent last-ulp; round-half on arbitrary
doubles — tie-mode differs) are deliberately EXCLUDED from oracle-checked
packs; sqrt and integer powers are IEEE-exact and included.

All pure Column expressions; zero shuffles except the grouped aggregate
pack (one shuffle on a 3-value key after map-side partials).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table


@register(
    "math_function_pack",
    """
    SELECT p_partkey,
           abs(p_retailprice - 1000.0)                    AS abs_delta,
           CAST(ceil(p_retailprice) AS BIGINT)            AS price_ceil,
           CAST(floor(p_retailprice) AS BIGINT)           AS price_floor,
           CAST(sign(p_retailprice - 1000.0) AS INTEGER)  AS delta_sign,
           mod(p_size, 7)                                 AS size_mod7,
           sqrt(p_retailprice)                            AS price_sqrt,
           CAST(power(p_size, 2) AS DOUBLE)               AS size_sq,
           greatest(p_size, 25)                           AS size_hi,
           least(p_size, 25)                              AS size_lo
    FROM part
    """,
    doc="Math family with return types pinned: Spark ceil/floor yield "
        "LONG where DuckDB yields DOUBLE (cast both to BIGINT); sign is "
        "DOUBLE in Spark, pinned to INT; sqrt is IEEE-correctly-rounded "
        "on both engines so it hash-matches; power restricted to integer "
        "bases/exponents (libm-exact). ln/exp/round-half excluded — see "
        "module docstring",
)
def math_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    size = F.col("p_size")
    return p.select(
        "p_partkey",
        F.abs(price - 1000.0).alias("abs_delta"),
        F.ceil(price).cast("long").alias("price_ceil"),
        F.floor(price).cast("long").alias("price_floor"),
        F.signum(price - 1000.0).cast("int").alias("delta_sign"),
        (size % 7).alias("size_mod7"),
        F.sqrt(price).alias("price_sqrt"),
        F.pow(size, 2).cast("double").alias("size_sq"),
        F.greatest(size, F.lit(25)).alias("size_hi"),
        F.least(size, F.lit(25)).alias("size_lo"),
    )


@register(
    "null_semantics_pack",
    """
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING')               AS seg_nb,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_or_na,
           (nullif(c_mktsegment, 'BUILDING')
              IS NOT DISTINCT FROM nullif(c_mktsegment, 'BUILDING'))
                                                          AS nullsafe_self,
           (nullif(c_mktsegment, 'BUILDING') IS NOT DISTINCT FROM 'AUTOMOBILE')
                                                          AS nullsafe_auto,
           (nullif(c_mktsegment, 'BUILDING') IS NULL)     AS was_building,
           CASE WHEN nullif(c_mktsegment, 'BUILDING') IS NOT NULL
                THEN 'kept' ELSE 'dropped' END            AS nvl2_ish
    FROM customer
    """,
    doc="NULL-semantics family: NULLIF-manufactured nulls, COALESCE "
        "defaults, null-safe equality (Spark's <=> / eqNullSafe is ANSI "
        "IS NOT DISTINCT FROM — TRUE on null=null where plain = yields "
        "NULL), IS NULL flags, and the NVL2 conditional. These are the "
        "semantics the reference leans on implicitly (its left-join keys "
        "and to_bool_safe blanks all produce NULL groups, SURVEY §2.5)",
)
def null_semantics_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    seg = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return c.select(
        "c_custkey",
        seg.alias("seg_nb"),
        F.coalesce(seg, F.lit("N/A")).alias("seg_or_na"),
        seg.eqNullSafe(seg).alias("nullsafe_self"),
        seg.eqNullSafe(F.lit("AUTOMOBILE")).alias("nullsafe_auto"),
        seg.isNull().alias("was_building"),
        F.when(seg.isNotNull(), "kept").otherwise("dropped").alias("nvl2_ish"),
    )


@register(
    "conditional_agg_pack",
    """
    SELECT o_orderstatus,
           count_if(CAST(o_totalprice AS DOUBLE) > 200000.0) AS n_big,
           bool_or(o_orderpriority = '1-URGENT')          AS any_urgent,
           bool_and(o_orderpriority <> '5-LOW')           AS none_low,
           max_by(o_totalprice, o_orderkey)               AS price_of_last,
           min_by(o_totalprice, o_orderkey)               AS price_of_first,
           max(o_totalprice)                              AS max_price
    FROM orders
    GROUP BY o_orderstatus
    """,
    doc="Conditional / arg-extremum aggregates: count_if, bool_or/and, "
        "max_by/min_by. The arg-extremum ORDERING KEY is the unique "
        "o_orderkey — max_by over a non-unique key is tie-nondeterministic "
        "on both engines and would never hash-match; keying on the unique "
        "column is the deterministic idiom (the argmin_join_back query "
        "shows the window rewrite for non-unique keys)",
)
def conditional_agg_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    urgent = F.col("o_orderpriority") == "1-URGENT"
    return o.groupBy("o_orderstatus").agg(
        F.count_if(F.col("o_totalprice").cast("double") > 200000.0).alias(
            "n_big"
        ),
        F.bool_or(urgent).alias("any_urgent"),
        F.bool_and(F.col("o_orderpriority") != "5-LOW").alias("none_low"),
        F.max_by("o_totalprice", "o_orderkey").alias("price_of_last"),
        F.min_by("o_totalprice", "o_orderkey").alias("price_of_first"),
        F.max("o_totalprice").alias("max_price"),
    )
