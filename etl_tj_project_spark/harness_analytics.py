"""Analytical query pack: classic warehouse shapes (TPC-H-style) plus the
relational operators the reference's SQL dialect implies but never
exercises (semi/anti joins, CUBE, PIVOT, percentiles, SQL-view surface,
upsert-as-a-query).

These widen the §2 inventory beyond the reference's literal operator set:
the reference is "SQL strings over Postgres" (SURVEY §0), so its *implied*
surface is ANSI SQL; this module demonstrates that surface Spark-side with
DuckDB-oracle twins.

Exactness conventions (same as harness.py): money math is decimal end-to-
end — DOUBLE inputs are cast to bounded decimals *before* arithmetic so
sums are exact and order-insensitive; averages divide an exact decimal sum
by a bigint count in double (deterministic); percentiles use linear
interpolation on both engines and round to 6 places.

Scale notes per query are in each doc string; the shared rules:
* dim joins (nation/region/supplier/customer at dim scale) broadcast;
* top-k goes through TakeOrderedAndProject, never a global sort;
* semi/anti joins stay hash joins on the key, no fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.schemas import AMOUNT
from etl_tj_project_spark.sources.testdata import load_table

# Bounded decimals sized so products stay inside Spark's 38-digit cap with
# zero precision loss: (12,2) * (4,2)-derived factors → scale 4/6 exact.
PRICE = DecimalType(12, 2)
RATE = DecimalType(4, 2)
# Post-multiplication money keeps its full scale (4 or 6) so the final
# cast is exact — a cast down to scale 2 would hit .xx5 ties where Spark
# (HALF_UP) and DuckDB (half-to-even) disagree by one cent.
AMOUNT4 = DecimalType(18, 4)
AMOUNT6 = DecimalType(18, 6)

def _one() -> "F.Column":
    # Built lazily: Column construction needs an active SparkContext, and
    # this module imports before any session exists.
    return F.lit(1).cast(RATE)


def _li_money(li: DataFrame) -> DataFrame:
    """lineitem with exact-decimal money columns (shared projection)."""
    return li.withColumns(
        {
            "qty": F.col("l_quantity").cast(AMOUNT),
            "price": F.col("l_extendedprice").cast(PRICE),
            "disc": F.col("l_discount").cast(RATE),
            "tax": F.col("l_tax").cast(RATE),
        }
    )


# SQL fragment twins of the above (DuckDB dialect = shared ANSI).
_SQL_QTY = "CAST(l_quantity AS DECIMAL(18,2))"
_SQL_PRICE = "CAST(l_extendedprice AS DECIMAL(12,2))"
_SQL_DISC = "CAST(l_discount AS DECIMAL(4,2))"
_SQL_TAX = "CAST(l_tax AS DECIMAL(4,2))"
_SQL_ONE = "CAST(1 AS DECIMAL(4,2))"


# =========================================================================
# TPC-H-style headline queries
# =========================================================================

@register(
    "tpch_q1_pricing_summary",
    f"""
    WITH t AS (
      SELECT l_returnflag, l_linestatus,
             {_SQL_QTY} AS qty, {_SQL_PRICE} AS price,
             {_SQL_DISC} AS disc, {_SQL_TAX} AS tax
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) <= DATE '2001-09-02'
    )
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(qty) AS DECIMAL(18,2))   AS sum_qty,
           CAST(SUM(price) AS DECIMAL(18,2)) AS sum_base_price,
           CAST(SUM(price * ({_SQL_ONE} - disc)) AS DECIMAL(18,4))
             AS sum_disc_price,
           CAST(SUM(price * ({_SQL_ONE} - disc) * ({_SQL_ONE} + tax))
                AS DECIMAL(18,6)) AS sum_charge,
           round(CAST(SUM(qty) AS DOUBLE) / COUNT(*), 6)   AS avg_qty,
           round(CAST(SUM(price) AS DOUBLE) / COUNT(*), 6) AS avg_price,
           round(CAST(SUM(disc) AS DOUBLE) / COUNT(*), 6)  AS avg_disc,
           COUNT(*) AS count_order
    FROM t GROUP BY l_returnflag, l_linestatus
    """,
    doc="TPC-H Q1 pricing summary: wide multi-aggregate scan with exact "
        "decimal money math; single shuffle on a 6-value group key, "
        "map-side partial agg does nearly all the work at 100 TB",
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    disc_price = F.col("price") * (_one() - F.col("disc"))
    charge = disc_price * (_one() + F.col("tax"))
    n = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate").cast("date") <= F.lit("2001-09-02").cast("date"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("qty").cast(AMOUNT).alias("sum_qty"),
            F.sum("price").cast(AMOUNT).alias("sum_base_price"),
            F.sum(disc_price).cast(AMOUNT4).alias("sum_disc_price"),
            F.sum(charge).cast(AMOUNT6).alias("sum_charge"),
            F.round(F.sum("qty").cast("double") / n, 6).alias("avg_qty"),
            F.round(F.sum("price").cast("double") / n, 6).alias("avg_price"),
            F.round(F.sum("disc").cast("double") / n, 6).alias("avg_disc"),
            n.alias("count_order"),
        )
    )


@register(
    "tpch_q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           CAST(SUM({_SQL_PRICE} * ({_SQL_ONE} - {_SQL_DISC}))
                AS DECIMAL(18,4)) AS revenue,
           CAST(o.o_orderdate AS DATE) AS order_date, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND CAST(o.o_orderdate AS DATE) < DATE '1998-03-15'
      AND CAST(l.l_shipdate AS DATE) > DATE '1998-03-15'
    GROUP BY l.l_orderkey, CAST(o.o_orderdate AS DATE), o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
    """,
    doc="TPC-H Q3 shipping priority: selective 3-way join + agg + "
        "deterministic top-10 (exact-decimal revenue breaks ties stably); "
        "customer filter broadcast, lineitem⋈orders shuffle on orderkey",
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") < F.lit("1998-03-15").cast("date")
    )
    li = _li_money(load_table(spark, sf_dir, "lineitem")).filter(
        F.col("l_shipdate").cast("date") > F.lit("1998-03-15").cast("date")
    )
    revenue = F.col("price") * (_one() - F.col("disc"))
    return (
        li.join(
            o.join(F.broadcast(c), c["c_custkey"] == o["o_custkey"], "inner"),
            li["l_orderkey"] == o["o_orderkey"],
            "inner",
        )
        .groupBy(
            "l_orderkey",
            F.col("o_orderdate").cast("date").alias("order_date"),
            "o_orderpriority",
        )
        .agg(F.sum(revenue).cast(AMOUNT4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@register(
    "tpch_q6_forecast_revenue",
    f"""
    SELECT CAST(SUM({_SQL_PRICE} * {_SQL_DISC}) AS DECIMAL(18,4)) AS revenue
    FROM lineitem
    WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
      AND CAST(l_shipdate AS DATE) < DATE '1997-01-01'
      AND {_SQL_DISC} BETWEEN CAST(0.05 AS DECIMAL(4,2))
                          AND CAST(0.07 AS DECIMAL(4,2))
      AND l_quantity < 24
    """,
    doc="TPC-H Q6 forecast revenue: highly selective predicate stack fully "
        "pushed to the parquet scan, then a single global sum — the "
        "pushdown-and-prune stress test",
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    d = F.col("l_shipdate").cast("date")
    return (
        li.filter(
            (d >= F.lit("1996-01-01").cast("date"))
            & (d < F.lit("1997-01-01").cast("date"))
            & F.col("disc").between(
                F.lit(0.05).cast(RATE), F.lit(0.07).cast(RATE)
            )
            & (F.col("l_quantity") < 24)
        )
        .agg((F.sum(F.col("price") * F.col("disc"))).cast(AMOUNT4).alias("revenue"))
    )


@register(
    "tpch_q5ish_regional_revenue",
    f"""
    SELECT n.n_name,
           CAST(SUM({_SQL_PRICE} * ({_SQL_ONE} - {_SQL_DISC}))
                AS DECIMAL(18,4)) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    JOIN region r   ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'ASIA'
      AND CAST(o.o_orderdate AS DATE) >= DATE '1996-01-01'
      AND CAST(o.o_orderdate AS DATE) < DATE '1997-01-01'
    GROUP BY n.n_name
    """,
    doc="TPC-H Q5-style star join: fact ⋈ filtered date dim ⋈ three "
        "broadcast dims (supplier→nation→region chain collapses to one "
        "broadcast stage); one shuffle for lineitem⋈orders, one for the agg",
)
def tpch_q5ish_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1996-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-01-01").cast("date"))
    )
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    # Collapse the dim chain driver-side of the fact join: supplier⋈nation⋈
    # region is dim-sized, broadcast the result once.
    s_dim = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("n_nationkey") == F.col("s_nationkey"))
        .join(F.broadcast(r), F.col("r_regionkey") == F.col("n_regionkey"))
        .select("s_suppkey", "n_name")
    )
    revenue = F.col("price") * (_one() - F.col("disc"))
    return (
        li.join(o, o["o_orderkey"] == li["l_orderkey"], "inner")
        .join(F.broadcast(s_dim), F.col("s_suppkey") == li["l_suppkey"], "inner")
        .groupBy("n_name")
        .agg(
            F.sum(revenue).cast(AMOUNT4).alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# =========================================================================
# Join variants beyond the reference's inner/left: semi / anti
# =========================================================================

@register(
    "semi_join_exists",
    """
    SELECT o_orderkey, o_orderpriority FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
    doc="Left-semi join (EXISTS): emits each qualifying order once "
        "regardless of match multiplicity — no fan-out, build side is the "
        "filtered probe keys only",
)
def semi_join_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_quantity") >= 49)
    return o.join(
        li, li["l_orderkey"] == o["o_orderkey"], "left_semi"
    ).select("o_orderkey", "o_orderpriority")


@register(
    "anti_join_not_exists",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    """,
    doc="Left-anti join (NOT EXISTS): customers with no URGENT orders; "
        "hash-anti on the key, NULL-safe by construction. The predicate "
        "is on the build side, not plain key-absence: in this testdata "
        "every customer has orders, so the unfiltered NOT EXISTS returns "
        "0 rows at every SF — a vacuous check (the tpch_q22ish lesson; "
        "18 rows at sf0.001, 203 at sf0.01 with the filter)",
)
def anti_join_not_exists(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return c.join(o, o["o_custkey"] == c["c_custkey"], "left_anti").select(
        "c_custkey", "c_name"
    )


# =========================================================================
# Grouping-set family (rollup already registered in harness.py)
# =========================================================================

@register(
    "cube_agg",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS qty_sum
    FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
    """,
    doc="CUBE: all 2^k grouping sets in one pass (Expand + single "
        "shuffle, not k separate jobs)",
)
def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.cube("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("l_quantity").cast(AMOUNT)).cast(AMOUNT).alias("qty_sum"),
    )


@register(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS cnt_f,
           SUM(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS cnt_o,
           SUM(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS cnt_p
    FROM orders GROUP BY o_orderpriority
    """,
    doc="PIVOT with a pinned value list: one-pass conditional aggregation, "
        "no per-value jobs; empty cells are 0 not NULL",
)
def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return piv.select(
        "o_orderpriority",
        *[
            F.coalesce(F.col(v), F.lit(0)).cast("long").alias(f"cnt_{v.lower()}")
            for v in ("F", "O", "P")
        ],
    )


# =========================================================================
# Statistical aggregates
# =========================================================================

@register(
    "percentile_by_group",
    """
    SELECT l_linestatus,
           round(quantile_cont(l_quantity, 0.5), 6) AS qty_p50,
           round(quantile_cont(l_quantity, 0.9), 6) AS qty_p90,
           round(min(l_quantity), 6) AS qty_min,
           round(max(l_quantity), 6) AS qty_max
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Exact percentiles (linear interpolation) per group — Spark "
        "`percentile` == DuckDB `quantile_cont`; min/max ride along",
)
def percentile_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.percentile("l_quantity", F.lit(0.5)), 6).alias("qty_p50"),
        F.round(F.percentile("l_quantity", F.lit(0.9)), 6).alias("qty_p90"),
        F.round(F.min("l_quantity"), 6).alias("qty_min"),
        F.round(F.max("l_quantity"), 6).alias("qty_max"),
    )


@register(
    "count_distinct_by_group",
    """
    SELECT l_linestatus,
           COUNT(DISTINCT l_partkey) AS n_parts,
           COUNT(DISTINCT l_suppkey) AS n_supps,
           COUNT(*) AS n_rows
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Multi-column exact COUNT(DISTINCT): Catalyst expands to "
        "partial-distinct aggregates (Expand) in a single job; the "
        "approx_count_distinct variant is the scale path (rows-only twin)",
)
def count_distinct_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.count_distinct("l_partkey").alias("n_parts"),
        F.count_distinct("l_suppkey").alias("n_supps"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "approx_count_distinct",
    None,  # estimator internals differ across engines — rows-only check
    doc="HyperLogLog++ approx distinct at 2% rsd: the 100 TB-scale "
        "replacement for exact COUNT(DISTINCT) (no Expand blow-up, "
        "mergeable sketches); rows-only because HLL estimates are "
        "engine-specific",
)
def approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.approx_count_distinct("l_partkey", 0.02).alias("approx_parts"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# =========================================================================
# Window extensions: lag-delta, ntile
# =========================================================================

@register(
    "window_lag_delta",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS day_total
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT d, day_total,
           CAST(day_total - lag(day_total) OVER (ORDER BY d)
                AS DECIMAL(18,2)) AS delta_vs_prev
    FROM daily
    """,
    doc="Day-over-day delta: agg then lag over the date axis; the "
        "unpartitioned window runs over the already-reduced daily series "
        "(tiny), never over raw facts",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = (
        o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast(AMOUNT)).cast(AMOUNT).alias("day_total"))
    )
    w = Window.orderBy("d")
    return daily.select(
        "d",
        "day_total",
        (F.col("day_total") - F.lag("day_total").over(w))
        .cast(AMOUNT)
        .alias("delta_vs_prev"),
    )


@register(
    "window_ntile_quartiles",
    """
    SELECT o_orderpriority, o_orderkey,
           ntile(4) OVER (PARTITION BY o_orderpriority
                          ORDER BY o_totalprice, o_orderkey) AS quartile
    FROM orders
    """,
    doc="NTILE(4) bucketing per group with a unique tie-break key "
        "(deterministic bucket assignment)",
)
def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderpriority", "o_orderkey", F.ntile(4).over(w).alias("quartile")
    )


# =========================================================================
# S3 (SQL/view surface) and S5 (upsert) as pure queries
# =========================================================================

_VIEW_LAYER_SQL = """
    SELECT rflag, ship_date, COUNT(*) AS n,
           CAST(SUM(qty) AS DECIMAL(18,2)) AS qty_sum
    FROM vw_lineitem_typed
    WHERE ship_date >= DATE '1999-01-01'
    GROUP BY rflag, ship_date
"""


@register(
    "sql_view_layer",
    f"""
    WITH vw_lineitem_typed AS (
      SELECT upper(l_returnflag) AS rflag,
             CAST(l_shipdate AS DATE) AS ship_date,
             CAST(l_quantity AS DECIMAL(18,2)) AS qty
      FROM lineitem
    )
    {_VIEW_LAYER_SQL}
    """,
    doc="S3: typed-view layer + downstream SQL — the reference's "
        "CREATE VIEW src.vw_trx_* surface (dag_datapelangan.py:68-86) as "
        "session-catalog temp views consumed by spark.sql; Catalyst "
        "inlines the view so pushdown crosses the view boundary",
)
def sql_view_layer(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    li.select(
        F.upper("l_returnflag").alias("rflag"),
        F.col("l_shipdate").cast("date").alias("ship_date"),
        F.col("l_quantity").cast(AMOUNT).alias("qty"),
    ).createOrReplaceTempView("vw_lineitem_typed")
    return spark.sql(_VIEW_LAYER_SQL)


@register(
    "skew_salted_join",
    """
    SELECT e.event_id, e.user_id, c.c_mktsegment
    FROM events e
    JOIN customer c ON c.c_custkey = e.user_id % 100
    """,
    doc="Skew-resistant salted equi-join (operators/joins.salted_join): "
        "hot keys of the big side spread across 8 salt buckets, small "
        "side replicated per salt — result identical to the plain join "
        "(this oracle proves it); covers the case AQE skew-split can't: "
        "a single key larger than one executor",
)
def skew_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.operators.joins import salted_join

    # user_id % 100 manufactures heavy key collisions (every user maps
    # into 100 buckets) — the skew shape the salt is for.
    e = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", (F.col("user_id") % 100).alias("join_key")
    )
    c = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("join_key"), "c_mktsegment"
    )
    return salted_join(e, c, "join_key", num_salts=8, how="inner").select(
        "event_id", "user_id", "c_mktsegment"
    )


@register(
    "upsert_dim_delta",
    """
    WITH delta AS (
      SELECT n_nationkey, n_name || '_v2' AS n_name, n_regionkey
      FROM nation WHERE n_nationkey % 5 = 0
    )
    SELECT n_nationkey, n_name, n_regionkey FROM delta
    UNION ALL
    SELECT n.n_nationkey, n.n_name, n.n_regionkey FROM nation n
    WHERE NOT EXISTS (SELECT 1 FROM delta d
                      WHERE d.n_nationkey = n.n_nationkey)
    """,
    doc="S5 upsert on a MERGE-less lake: delta ∪ (base left-anti delta) — "
        "the incremental path of operators/dims.upsert_dim "
        "(ref ON CONFLICT DO UPDATE, stage_csv_dims_to_pg.py:125-140)",
)
def upsert_dim_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    base = load_table(spark, sf_dir, "nation")
    delta = base.filter(F.col("n_nationkey") % 5 == 0).select(
        "n_nationkey",
        F.concat(F.col("n_name"), F.lit("_v2")).alias("n_name"),
        "n_regionkey",
    )
    kept = base.join(delta, "n_nationkey", "left_anti").select(
        "n_nationkey", "n_name", "n_regionkey"
    )
    return delta.unionByName(kept)


# =========================================================================
# Reshaping / temporal patterns: unpivot, SCD2, range join, session window
# =========================================================================

@register(
    "unpivot_melt",
    """
    SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS val
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_retailprice' AS metric,
           CAST(p_retailprice AS DOUBLE) AS val
    FROM part
    """,
    doc="UNPIVOT/melt: wide metrics → long (metric, value) rows; Spark "
        "plans it as Expand (one pass, no join), not k self-unions",
)
def unpivot_melt(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    )
    return p.unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="metric",
        valueColumnName="val",
    )


@register(
    "scd2_validity_ranges",
    """
    SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
             AS valid_to_us
    FROM events WHERE event_type = 'signup'
    """,
    doc="SCD2 emulation on a MERGE-less lake: each change event gets a "
        "[valid_from, valid_to) range via lead() — the guide's "
        "anti-join+window CDC pattern, expressed as one window pass",
)
def scd2_validity_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    return (
        ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
        .select(
            "user_id",
            "event_id",
            F.col("us").alias("valid_from_us"),
            F.lead("us").over(w).alias("valid_to_us"),
        )
    )


@register(
    "range_band_join",
    """
    SELECT o.o_orderkey, b.band
    FROM orders o
    JOIN (VALUES ('b0', 0, 100000), ('b1', 100000, 200000),
                 ('b2', 200000, 300000), ('b3', 300000, 1000000))
         AS b(band, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    """,
    doc="Range (theta) join against a band table: broadcast-nested-loop "
        "on a 4-row build side — the right plan when the non-equi side is "
        "tiny; for big-big range joins, bucketize the range key to an "
        "equi-join first (guide §OLAP patterns)",
)
def range_band_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        [("b0", 0, 100000), ("b1", 100000, 200000),
         ("b2", 200000, 300000), ("b3", 300000, 1000000)],
        "band string, lo long, hi long",
    )
    return o.join(
        F.broadcast(bands),
        (o["o_totalprice"] >= bands["lo"]) & (o["o_totalprice"] < bands["hi"]),
        "inner",
    ).select("o_orderkey", "band")


@register(
    "session_window_agg",
    """
    WITH t AS (
      SELECT user_id, epoch_us(ts) AS us,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY epoch_us(ts))
                  >= 1800000000 THEN 1 ELSE 0 END AS is_new
      FROM events
    ), s AS (
      SELECT user_id, us,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY us
                               ROWS UNBOUNDED PRECEDING) AS sid
      FROM t
    )
    SELECT user_id, min(us) AS sess_start_us, COUNT(*) AS n_events
    FROM s GROUP BY user_id, sid
    """,
    doc="Native session_window (30-min gap) aggregation — Spark's "
        "built-in merging session windows; the oracle twin is the "
        "lag+cumsum formulation, proving both sessionizations agree "
        "(new session iff gap >= 30 min, matching [start, last+gap))",
)
def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("sw"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("sw.start")).alias("sess_start_us"),
            "n_events",
        )
    )


# =========================================================================
# Similarity search: IVF variant (completes brute-force / LSH / IVF trio)
# =========================================================================

_IVF_COS = (
    "CASE WHEN sqrt({na}) * sqrt({nb}) > 0 "
    "THEN {dot} / (sqrt({na}) * sqrt({nb})) END"
)


def _ivf_cos_sql(a: str, b: str) -> str:
    from etl_tj_project_spark.operators.similarity import _dot_sql

    return _IVF_COS.format(
        na=_dot_sql(a, a), nb=_dot_sql(b, b), dot=_dot_sql(a, b)
    )


@register(
    "ann_ivf_topk",
    f"""
    WITH c AS (SELECT vec_id AS cell, embedding AS cvec
               FROM embeddings WHERE vec_id < 8),
    q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
    qprobe AS (
      SELECT c.cell FROM c, q
      ORDER BY {_ivf_cos_sql('q.qv', 'c.cvec')} DESC, c.cell DESC
      LIMIT 2
    ),
    assigned AS (
      SELECT e.vec_id, e.embedding,
             (SELECT c.cell FROM c
              ORDER BY {_ivf_cos_sql('e.embedding', 'c.cvec')} DESC,
                       c.cell DESC
              LIMIT 1) AS cell
      FROM embeddings e
    )
    SELECT vec_id, round(cosine, 9) AS cosine FROM (
      SELECT a.vec_id,
             {_ivf_cos_sql('a.embedding', 'q.qv')} AS cosine
      FROM assigned a, q
      WHERE a.cell IN (SELECT cell FROM qprobe)
      ORDER BY cosine DESC, a.vec_id
      LIMIT 10
    ) t
    """,
    doc="IVF-Flat ANN: vectors assigned to nearest-of-8 centroid cells "
        "(deterministic centroids = first 8 vectors; trained k-means "
        "would swap in without changing the plan), query probes its 2 "
        "nearest cells, exact cosine ranking inside — at scale the cell "
        "is a partition column so a probe reads 2/8 of the data",
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.operators import similarity as sim

    e = load_table(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    top = sim.ivf_topk(e, q, k=10, n_cells=8, n_probe=2)
    return top.select("vec_id", F.round("cosine", 9).alias("cosine"))


# =========================================================================
# JSON columns, grouping sets, statistical aggregates
# =========================================================================

@register(
    "json_extract_typed",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_val
    FROM events
    """,
    doc="Typed JSON field extraction: from_json with an explicit schema "
        "(not schema inference) so the parse is a single vectorized "
        "expression and the struct field prunes like a column",
)
def json_extract_typed(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    parsed = F.from_json(F.col("props"), "k INT")
    return ev.select("event_id", parsed.getField("k").alias("k_val"))


@register(
    "json_agg_by_field",
    """
    SELECT event_type,
           SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS k_sum,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    doc="Aggregate over a JSON-extracted field — parse happens map-side "
        "inside codegen, only (event_type, k) reach the shuffle",
)
def json_agg_by_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").cast("long").alias("k_sum"), F.count(F.lit(1)).alias("n"))
    )


_GROUPING_SETS_SQL = """
    SELECT l_returnflag, l_linestatus,
           grouping(l_returnflag) AS g_rflag,
           grouping(l_linestatus) AS g_lstatus,
           COUNT(*) AS n
    FROM {table}
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
"""


@register(
    "grouping_sets_agg",
    _GROUPING_SETS_SQL.format(table="lineitem"),
    doc="Explicit GROUPING SETS with grouping() markers — same shared SQL "
        "text runs on Spark SQL and DuckDB; planned as one Expand + one "
        "shuffle like rollup/cube",
)
def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_gs")
    df = spark.sql(_GROUPING_SETS_SQL.format(table="li_gs"))
    # Spark's grouping() returns tinyint; align to DuckDB's BIGINT.
    return df.select(
        "l_returnflag",
        "l_linestatus",
        F.col("g_rflag").cast("long").alias("g_rflag"),
        F.col("g_lstatus").cast("long").alias("g_lstatus"),
        "n",
    )


@register(
    "stats_agg_by_group",
    """
    SELECT l_linestatus,
           round(stddev_samp(l_quantity), 4)                   AS qty_sd,
           round(var_samp(l_quantity), 4)                      AS qty_var,
           round(corr(l_quantity, l_extendedprice), 6)         AS qty_price_corr,
           round(regr_slope(l_extendedprice, l_quantity), 4)   AS price_per_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Statistical aggregates (stddev/variance/corr/regression slope): "
        "single-pass mergeable moment sketches — constant memory per "
        "group at any scale",
)
def stats_agg_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.round(F.stddev_samp("l_quantity"), 4).alias("qty_sd"),
        F.round(F.var_samp("l_quantity"), 4).alias("qty_var"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 6).alias("qty_price_corr"),
        F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias(
            "price_per_qty"
        ),
    )


# =========================================================================
# Array aggregation and dataset profiling
# =========================================================================

@register(
    "array_agg_sorted",
    """
    SELECT o_orderpriority,
           array_to_string(list_sort(list(DISTINCT o_orderstatus)), ',')
             AS statuses_csv,
           len(list(DISTINCT o_orderstatus)) AS n_statuses
    FROM orders GROUP BY o_orderpriority
    """,
    doc="collect_set/array_agg made deterministic: collection order is "
        "partition-dependent, so any collected array MUST be array_sort'd "
        "before it is comparable or joinable; listagg = sorted concat_ws. "
        "The result surfaces only scalar columns (CSV string + cardinality) "
        "— raw array columns are kept internal because downstream "
        "comparators/hashers generally can't canonicalize ndarray cells",
)
def array_agg_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    arr = F.array_sort(F.collect_set("o_orderstatus"))
    return o.groupBy("o_orderpriority").agg(
        F.array_join(arr, ",").alias("statuses_csv"),
        F.size(arr).cast("long").alias("n_statuses"),
    )


@register(
    "profile_columns",
    """
    SELECT 'l_quantity' AS col,
           COUNT(*) AS n_rows,
           COUNT(*) - COUNT(l_quantity) AS n_null,
           COUNT(DISTINCT l_quantity) AS n_distinct,
           round(min(l_quantity), 6) AS min_val,
           round(max(l_quantity), 6) AS max_val
    FROM lineitem
    UNION ALL
    SELECT 'l_discount', COUNT(*), COUNT(*) - COUNT(l_discount),
           COUNT(DISTINCT l_discount),
           round(min(l_discount), 6), round(max(l_discount), 6)
    FROM lineitem
    UNION ALL
    SELECT 'l_tax', COUNT(*), COUNT(*) - COUNT(l_tax),
           COUNT(DISTINCT l_tax),
           round(min(l_tax), 6), round(max(l_tax), 6)
    FROM lineitem
    """,
    doc="Column profiler (null count, distinct, min/max per column) — the "
        "dataset-stats pass a training pipeline runs before ingestion; "
        "one scan computes all columns' stats (Spark aggregates them "
        "side by side; the UNION ALL in the oracle is only the output "
        "shape), exact distincts here, HLL at 100 TB",
)
def profile_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_discount", "l_tax"]
    # One aggregation computes every column's stats, then unpivot to the
    # (col, stats...) shape — a single scan regardless of column count.
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__n_rows"),
            (F.count(F.lit(1)) - F.count(c)).alias(f"{c}__n_null"),
            F.count_distinct(c).alias(f"{c}__n_distinct"),
            F.round(F.min(c), 6).alias(f"{c}__min_val"),
            F.round(F.max(c), 6).alias(f"{c}__max_val"),
        ]
    wide = li.agg(*aggs)
    rows = [
        F.struct(
            F.lit(c).alias("col"),
            F.col(f"{c}__n_rows").alias("n_rows"),
            F.col(f"{c}__n_null").alias("n_null"),
            F.col(f"{c}__n_distinct").alias("n_distinct"),
            F.col(f"{c}__min_val").alias("min_val"),
            F.col(f"{c}__max_val").alias("max_val"),
        )
        for c in cols
    ]
    return wide.select(F.explode(F.array(*rows)).alias("p")).select("p.*")


@register(
    "argmin_join_back",
    """
    WITH m AS (
      SELECT o_orderpriority, min(o_totalprice) AS min_price
      FROM orders GROUP BY o_orderpriority
    )
    SELECT o.o_orderpriority, o.o_orderkey, o.o_totalprice
    FROM orders o
    JOIN m ON m.o_orderpriority = o.o_orderpriority
          AND o.o_totalprice = m.min_price
    """,
    doc="Argmin via aggregate + join-back: the cheapest-row-per-group "
        "pattern without a window sort — the agg result is group-count "
        "sized, so the join-back side broadcasts; ties all kept "
        "(deterministic set, unlike row_number which picks one)",
)
def argmin_join_back(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    # The aggregate derives from the same plan as the probe side — alias
    # its columns so the self-join keys are unambiguous.
    m = o.groupBy(F.col("o_orderpriority").alias("prio")).agg(
        F.min("o_totalprice").alias("min_price")
    )
    return o.join(
        F.broadcast(m),
        (o["o_orderpriority"] == m["prio"]) & (o["o_totalprice"] == m["min_price"]),
        "inner",
    ).select("o_orderpriority", "o_orderkey", "o_totalprice")


# =========================================================================
# Set operations beyond the reference's UNION ALL: INTERSECT / EXCEPT
# =========================================================================

@register(
    "intersect_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="INTERSECT (distinct): customers with both a finished and an open "
        "order — planned as a left-semi join over pre-distinct inputs, "
        "one shuffle per side on the compared columns",
)
def intersect_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(op)


@register(
    "except_distinct",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    doc="EXCEPT (distinct): left-anti join over pre-distinct inputs — "
        "same shuffle shape as INTERSECT",
)
def except_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    op = o.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.subtract(op)


@register(
    "tpch_q14_promo_share",
    f"""
    SELECT round(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'PROMO'
                        THEN {_SQL_PRICE} * ({_SQL_ONE} - {_SQL_DISC}) END)
                      AS DOUBLE)
                   / CAST(SUM({_SQL_PRICE} * ({_SQL_ONE} - {_SQL_DISC}))
                      AS DOUBLE), 6) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '1996-09-01'
      AND CAST(l.l_shipdate AS DATE) < DATE '1996-10-01'
    """,
    doc="TPC-H Q14 promo share: conditional-aggregate ratio over a "
        "broadcast dim join — both sums come out of one pass; the "
        "division runs on two exact decimal totals (deterministic), "
        "rounded in double",
)
def tpch_q14_promo_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    d = F.col("l_shipdate").cast("date")
    revenue = F.col("price") * (_one() - F.col("disc"))
    joined = li.filter(
        (d >= F.lit("1996-09-01").cast("date"))
        & (d < F.lit("1996-10-01").cast("date"))
    ).join(F.broadcast(p), p["p_partkey"] == li["l_partkey"], "inner")
    promo = F.sum(F.when(F.col("p_type") == "PROMO", revenue))
    return joined.agg(
        F.round(
            F.lit(100.0) * promo.cast("double") / F.sum(revenue).cast("double"), 6
        ).alias("promo_revenue_pct")
    )


# =========================================================================
# Embedding-table operators: centroids, scalar quantization
# =========================================================================

@register(
    "embedding_centroids_long",
    """
    WITH x AS (
      SELECT label, embedding,
             unnest(generate_series(1, len(embedding))) AS i
      FROM embeddings
    )
    SELECT label, i AS pos,
           round(avg(CAST(embedding[i] AS DOUBLE)), 6) AS mean_val
    FROM x GROUP BY label, i
    """,
    doc="Per-label embedding centroids in long form (label, dim, mean): "
        "posexplode + one partial-aggregated shuffle on (label, dim) — "
        "the centroid-training step an IVF index build runs; long form "
        "avoids both engines' list-reassembly nondeterminism",
)
def embedding_centroids_long(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    return (
        e.select("label", F.posexplode("embedding").alias("pos0", "val"))
        .groupBy("label", (F.col("pos0") + 1).alias("pos"))
        .agg(F.round(F.avg(F.col("val").cast("double")), 6).alias("mean_val"))
    )


@register(
    "embedding_int8_quantize",
    """
    SELECT vec_id,
           array_to_string(list_transform(embedding,
             x -> CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5) AS INTEGER)),
             ',') AS q8_csv,
           CAST(list_sum(list_transform(embedding,
             x -> abs(CAST(floor(CAST(x AS DOUBLE) * 127 + 0.5)
                           AS INTEGER)))) AS BIGINT) AS q8_l1
    FROM embeddings
    """,
    doc="Scalar int8 quantization of unit-range embeddings (floor(x*127 "
        "+ .5) — floor, not round, for identical tie behavior on both "
        "engines): 4x storage/shuffle reduction for the 100 TB embedding "
        "table; dequantize is q/127.0. Surfaced as a CSV string + L1 "
        "checksum — scalar columns only, because raw array cells break "
        "downstream pandas-based canonicalizers (the array_agg_sorted "
        "lesson)",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    q8 = F.transform(
        "embedding",
        lambda x: F.floor(x.cast("double") * 127 + 0.5).cast("int"),
    )
    return e.select(
        "vec_id",
        F.array_join(q8, ",").alias("q8_csv"),
        F.aggregate(
            q8, F.lit(0).cast("long"), lambda acc, x: acc + F.abs(x)
        ).alias("q8_l1"),
    )


# =========================================================================
# Corpus preparation (stages 1-2 of operators/corpus.prepare_corpus)
# =========================================================================

def _corpus_filter_sql() -> str:
    from etl_tj_project_spark.functions import text as _tx

    m = _tx.quality_metrics_sql("text")
    return (
        f"SELECT doc_id, lang FROM documents "
        f"WHERE {m['n_chars']} >= 20 AND {m['n_tokens']} >= 5 "
        f"AND {m['punct_ratio']} <= 0.2 AND {m['alpha_ratio']} >= 0.6 "
        f"AND {m['stopword_ratio']} <= 0.7 "
        f"AND {_tx.lang_id_sql('text')} = 'en'"
    )


@register(
    "corpus_quality_filter",
    _corpus_filter_sql(),
    doc="Corpus prep stages 1-2 (operators/corpus.py): quality thresholds "
        "+ language allowlist as pure row-local filters — they shrink the "
        "corpus before any shuffle (dedup) sees it; the full pipeline "
        "adds exact+near dedup (tested end-to-end, LSH stage not "
        "SQL-expressible)",
)
def corpus_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.operators.corpus import (
        QualityThresholds,
        language_filter,
        quality_filter,
    )

    d = load_table(spark, sf_dir, "documents")
    out = quality_filter(d, "text", QualityThresholds())
    return language_filter(out, "text", ("en",)).select("doc_id", "lang")


@register(
    "tpch_q18_large_orders",
    f"""
    SELECT c.c_name, o.o_orderkey,
           CAST(o.o_totalprice AS DECIMAL(18,2)) AS totalprice,
           big.sum_qty
    FROM orders o
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN (
      SELECT l_orderkey, CAST(SUM({_SQL_QTY}) AS DECIMAL(18,2)) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM({_SQL_QTY}) > 150
    ) big ON big.l_orderkey = o.o_orderkey
    """,
    doc="TPC-H Q18 large-volume orders: HAVING-filtered aggregate joined "
        "back to facts — the aggregate runs first and its selective "
        "output drives the join (semi-join pushback), never the reverse",
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast(AMOUNT)).cast(AMOUNT).alias("sum_qty"))
        .filter(F.col("sum_qty") > 150)
    )
    return (
        o.join(big, big["l_orderkey"] == o["o_orderkey"], "inner")
        .join(F.broadcast(c), c["c_custkey"] == o["o_custkey"], "inner")
        .select(
            "c_name",
            "o_orderkey",
            F.col("o_totalprice").cast(AMOUNT).alias("totalprice"),
            "sum_qty",
        )
    )


# =========================================================================
# Function-family packs: rank windows, datetime, strings
# =========================================================================

@register(
    "window_rank_family",
    """
    SELECT o_orderkey,
           rank()         OVER w AS rnk,
           dense_rank()   OVER w AS drnk,
           round(percent_rank() OVER w, 9) AS prnk,
           round(cume_dist()    OVER w, 9) AS cdist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice, o_orderkey)
    """,
    doc="rank / dense_rank / percent_rank / cume_dist in one window pass "
        "(deterministic: unique tie-break key; ratios are exact rank "
        "fractions, rounded only for safety)",
)
def window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return o.select(
        "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.round(F.percent_rank().over(w), 9).alias("prnk"),
        F.round(F.cume_dist().over(w), 9).alias("cdist"),
    )


@register(
    "datetime_function_pack",
    """
    SELECT o_orderkey,
           year(o_orderdate)                             AS y,
           quarter(o_orderdate)                          AS q,
           month(o_orderdate)                            AS m,
           day(o_orderdate)                              AS d,
           CAST(date_trunc('month', o_orderdate) AS DATE) AS month_start,
           CAST(o_orderdate AS DATE) + INTERVAL 30 DAY    AS plus_30,
           datediff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01')
                                                          AS days_to_y2k,
           CAST(dayofweek(CAST(o_orderdate AS DATE)) + 1 AS INTEGER) AS dow_sun1
    FROM orders
    """,
    doc="Datetime family: extract/trunc/add/diff with the cross-engine "
        "conventions pinned (dayofweek: Spark Sunday=1 vs DuckDB Sunday=0, shifted to agree; datediff "
        "argument order differs and is wrapped accordingly)",
)
def datetime_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year(d).alias("y"),
        F.quarter(d).alias("q"),
        F.month(d).alias("m"),
        F.dayofmonth(d).alias("d"),
        F.date_trunc("month", d).cast("date").alias("month_start"),
        # Spark: date + 30 days stays a date; DuckDB DATE + INTERVAL is a
        # timestamp — cast both to timestamp for identical typing.
        F.date_add(d, 30).cast("timestamp").alias("plus_30"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.dayofweek(d).alias("dow_sun1"),
    )


@register(
    "string_function_pack",
    """
    SELECT p_partkey,
           replace(p_type, ' ', '_')                  AS type_snake,
           split_part(p_name, ' ', 1)                 AS first_word,
           translate(p_brand, '#', '-')               AS brand_dash,
           strpos(p_name, 'a')                        AS first_a,
           levenshtein(p_brand, 'PROMO')              AS lev_to_promo,
           reverse(p_brand)                           AS brand_rev,
           repeat('*', p_size % 4)                    AS stars,
           left(p_name, 5)                            AS name5,
           right(p_brand, 2)                          AS brand2
    FROM part
    """,
    doc="String family: replace/split-head/translate/position/"
        "levenshtein/reverse/repeat/left/right — Spark twins are "
        "substring_index, instr, substring arithmetic; all stay inside "
        "codegen (levenshtein included, for fuzzy dim-key matching)",
)
def string_function_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_snake"),
        F.substring_index("p_name", " ", 1).alias("first_word"),
        F.translate("p_brand", "#", "-").alias("brand_dash"),
        F.instr(F.col("p_name"), "a").cast("long").alias("first_a"),
        F.levenshtein("p_brand", F.lit("PROMO")).cast("long").alias("lev_to_promo"),
        F.reverse("p_brand").alias("brand_rev"),
        F.repeat(F.lit("*"), (F.col("p_size") % 4).cast("int")).alias("stars"),
        F.col("p_name").substr(1, 5).alias("name5"),
        F.col("p_brand").substr(
            F.length("p_brand") - 1, F.lit(2)
        ).alias("brand2"),
    )


@register(
    "array_hof_pack",
    """
    SELECT vec_id,
           len(list_filter(embedding, x -> x > 0)) AS n_pos,
           round(sqrt(list_sum(list_transform(embedding,
                 x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 6) AS l2_norm,
           round(list_sum(list_transform(embedding,
                 x -> greatest(least(CAST(x AS DOUBLE), 0.5), -0.5))), 6)
             AS clipped_sum,
           CAST(list_max(embedding) AS DOUBLE) >= 0.0 AS has_nonneg_max
    FROM embeddings
    """,
    doc="Higher-order array functions (filter/transform/aggregate/max) "
        "over the embedding column — per-row lambda pipelines that stay "
        "JVM-side with zero Python; the building blocks every custom "
        "vector op here composes from",
)
def array_hof_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "embeddings")
    xd = lambda x: x.cast("double")  # noqa: E731
    l2 = F.sqrt(
        F.aggregate(
            F.transform("embedding", lambda x: xd(x) * xd(x)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )
    clipped = F.aggregate(
        F.transform(
            "embedding",
            lambda x: F.greatest(F.least(xd(x), F.lit(0.5)), F.lit(-0.5)),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    return e.select(
        "vec_id",
        F.size(F.filter("embedding", lambda x: x > 0)).cast("long").alias("n_pos"),
        F.round(l2, 6).alias("l2_norm"),
        F.round(clipped, 6).alias("clipped_sum"),
        (F.array_max("embedding").cast("double") >= 0.0).alias("has_nonneg_max"),
    )


@register(
    "partition_content_checksum",
    """
    SELECT CAST(ts AS DATE) AS day,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CAST(('0x' || substring(md5(
                 CAST(event_id AS VARCHAR) || '|' || event_type || '|'
                 || CAST(user_id AS VARCHAR)), 1, 8)) AS BIGINT))
             AS BIGINT) AS content_checksum
    FROM events
    GROUP BY CAST(ts AS DATE)
    """,
    doc="Anti-entropy partition checksum — the replica/table-diff "
        "primitive: every row is canonicalized to a delimited key "
        "string, MD5'd, and the first 32 bits are SUMMED per day "
        "partition. Sum is order-insensitive, so two replicas (or a "
        "source and its copy) agree iff their per-partition checksums "
        "agree — comparing day partitions of a 100 TB table costs one "
        "scan each side plus a days-sized join, no row shipping. 32-bit "
        "terms keep a billion-row partition's sum under 2^62 (bound "
        "comment-audited); MD5-prefix parsing is engine-portable "
        "(conv(_,16,10) / '0x' cast). One partial-aggregatable shuffle "
        "on day",
)
def partition_content_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.col("user_id").cast("string"),
    )
    h32 = F.conv(F.substring(F.md5(canon.cast("binary")), 1, 8), 16, 10).cast(
        "long"
    )
    return (
        ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(h32).alias("content_checksum"),
        )
        .select("day", "n_rows", F.col("content_checksum").cast("long").alias("content_checksum"))
    )


@register(
    "shuffle_key_skew_profile",
    """
    WITH per_key AS (
      SELECT event_type, CAST(ts AS DATE) AS k,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_keys,
           CAST(SUM(m) AS BIGINT) AS total_rows,
           CAST(MAX(m) AS BIGINT) AS max_key_rows,
           CAST(SUM(m * m) AS BIGINT) AS self_join_rows,
           CAST(MAX(m) AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
             / CAST(SUM(m) AS DOUBLE) AS skew_ratio
    FROM per_key GROUP BY event_type
    """,
    doc="Shuffle-key skew pre-flight — the audit a pipeline runs BEFORE "
        "committing to a join/groupBy key at 100 TB: per-key "
        "multiplicities m, their max (the straggler partition), "
        "sum(m^2) (the EXACT output size of a self-join on that key — "
        "the LSH-band blowup predictor), and skew_ratio = max/avg "
        "(>10 means salt the key; the number operators/joins."
        "salted_join acts on). Two partial-aggregatable shuffles "
        "(key-level then group-level), both on shrinking aggregates — "
        "the profile of a petabyte table is KB-sized. All counts are "
        "exact BIGINTs; the single division is the last step on "
        "identical exact operands",
)
def shuffle_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("k")
    ).agg(F.count(F.lit(1)).alias("m"))
    m, nk = F.col("m"), F.count(F.lit(1))
    return per_key.groupBy("event_type").agg(
        nk.cast("long").alias("n_keys"),
        F.sum(m).cast("long").alias("total_rows"),
        F.max(m).cast("long").alias("max_key_rows"),
        F.sum(m * m).cast("long").alias("self_join_rows"),
        (
            F.max(m).cast("double") * nk.cast("double")
            / F.sum(m).cast("double")
        ).alias("skew_ratio"),
    )


def _keyset_boundary(df: DataFrame, keys: list[str], page_size: int) -> DataFrame:
    """Page boundary for keyset pagination, with the cursor contract
    guarded in-query (VERDICT r9 item 6): one row, column ``b`` = the
    STRUCT of the page's last key tuple.

    Reads ``page_size + 1`` rows via two TakeOrderedAndProject steps
    (top-(N+1) asc, then top-2 desc — never a global-order window). If
    the table holds more than ``page_size`` rows AND rows N and N+1
    share the full key tuple, the cursor is ambiguous at the page edge
    — every tuple-equal row beyond the page would be silently SKIPPED
    by the strict seek predicate — so the query raise_error's, listing
    the duplicated cursor tuple. This is the exact skip condition:
    duplicates fully inside a page are harmless (all exported on that
    page), so corpus-wide uniqueness is sufficient but not necessary,
    and the guard costs O(page), never a second table scan."""
    tup = F.struct(*keys)
    topn1 = df.select(*keys).orderBy(*keys).limit(page_size + 1)
    cnt_df = topn1.agg(F.count(F.lit(1)).alias("cnt"))
    last2 = (
        topn1.orderBy(*[F.col(k).desc() for k in keys])
        .limit(2)
        .agg(F.min(tup).alias("lo"), F.max(tup).alias("hi"))
    )
    # cnt > page_size: lo = row N (the boundary), hi = row N+1 — they
    # must differ or the cursor skips. cnt <= page_size: hi IS the last
    # row (no row beyond the page, nothing to skip). cnt = 0: there is
    # no boundary tuple at all — a silent NULL struct would make the
    # downstream strict seek filter EVERY row, indistinguishable from a
    # legitimately empty next page, so fail loudly instead (ADVICE r10).
    guarded = F.when(
        F.col("cnt") == 0,
        F.raise_error(
            F.lit(
                "keyset boundary requested on an empty input table: "
                "no cursor tuple exists (a NULL boundary would filter "
                "all rows downstream)"
            )
        ),
    ).when(
        F.col("cnt") > page_size,
        F.when(F.col("lo") != F.col("hi"), F.col("lo")).otherwise(
            F.raise_error(
                F.concat(
                    F.lit(
                        "keyset cursor tuple duplicated across the page "
                        "boundary (strict seek would skip rows): "
                    ),
                    F.to_json(F.col("hi")),
                )
            )
        ),
    ).otherwise(F.col("hi"))
    return last2.crossJoin(cnt_df).select(guarded.alias("b"))


@register(
    "keyset_pagination_seek",
    """
    WITH page2 AS (
      SELECT l_shipdate, l_orderkey, l_linenumber, l_quantity
      FROM lineitem
      ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
      LIMIT 200
    ),
    boundary AS (
      SELECT l_shipdate AS bd, l_orderkey AS bk, l_linenumber AS bn,
             l_quantity AS bq
      FROM page2
      ORDER BY l_shipdate DESC, l_orderkey DESC, l_linenumber DESC,
               l_quantity DESC
      LIMIT 1
    )
    SELECT l_shipdate, l_orderkey, l_linenumber,
           CAST(l_quantity AS DOUBLE) AS l_quantity
    FROM lineitem, boundary
    WHERE l_shipdate > bd
       OR (l_shipdate = bd AND (l_orderkey > bk
           OR (l_orderkey = bk AND (l_linenumber > bn
               OR (l_linenumber = bn AND l_quantity > bq)))))
    ORDER BY l_shipdate, l_orderkey, l_linenumber, l_quantity
    LIMIT 100
    """,
    doc="Keyset (seek-method) pagination — the scale-correct export "
        "cursor: page N+1 starts strictly after the last key tuple of "
        "page N via a lexicographic seek predicate, NEVER via OFFSET. "
        "At 100 TB the difference is structural: OFFSET re-scans and "
        "re-sorts everything before the page on every request, while "
        "the seek predicate's leading column (l_shipdate > bd) is a "
        "pushable range filter — partition/row-group pruning skips all "
        "already-exported data and the LIMIT plans as "
        "TakeOrderedAndProject. The boundary tuple itself is resolved "
        "once (here: a one-row window subquery standing in for 'page "
        "2's last row'; a real cursor passes it as literals). The "
        "tuple comparison is spelled as the portable OR-expansion so "
        "any ANSI engine executes the identical predicate. The cursor "
        "includes l_quantity because this dataset's "
        "(shipdate, orderkey, linenumber) is NOT unique (8 dupes at "
        "sf0.01) — a non-unique cursor silently skips or repeats rows "
        "at page boundaries, the classic keyset-pagination bug. The "
        "cursor contract is GUARDED IN-QUERY (VERDICT r9 item 6), not "
        "assumed from test-time data audits: _keyset_boundary reads "
        "page_size+1 rows and raise_error's, listing the duplicated "
        "cursor tuple, iff rows 200 and 201 share the 4-tuple — the "
        "exact (necessary and sufficient) skip condition, O(page) "
        "cost, so a regenerated dataset that breaks uniqueness fails "
        "loudly instead of silently dropping export rows",
)
def keyset_pagination_seek(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    keys = ["l_shipdate", "l_orderkey", "l_linenumber", "l_quantity"]
    boundary = _keyset_boundary(li, keys, page_size=200).select(
        F.col("b").getField("l_shipdate").alias("bd"),
        F.col("b").getField("l_orderkey").alias("bk"),
        F.col("b").getField("l_linenumber").alias("bn"),
        F.col("b").getField("l_quantity").alias("bq"),
    )
    seek = (F.col("l_shipdate") > F.col("bd")) | (
        (F.col("l_shipdate") == F.col("bd"))
        & (
            (F.col("l_orderkey") > F.col("bk"))
            | (
                (F.col("l_orderkey") == F.col("bk"))
                & (
                    (F.col("l_linenumber") > F.col("bn"))
                    | (
                        (F.col("l_linenumber") == F.col("bn"))
                        & (F.col("l_quantity") > F.col("bq"))
                    )
                )
            )
        )
    )
    return (
        li.crossJoin(F.broadcast(boundary))
        .filter(seek)
        .select(
            "l_shipdate",
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("l_quantity"),
        )
        .orderBy("l_shipdate", "l_orderkey", "l_linenumber", "l_quantity")
        .limit(100)
    )


# Packing factor for the sorted-export order key: days*2^35 keeps the
# (shipdate, orderkey, linenumber) tuple's lexicographic order as ONE
# BIGINT comparison (days < 2^15, orderkey < 2^32, linenumber < 8 at
# every generated SF; at sf100+ orderkey exceeds 2^32 and the packed
# key gives way to the raw struct key the production writer sorts on).
_PK_DAY_FACTOR = 34359738368  # 2^35


def _sorted_export_pk() -> "F.Column":
    return (
        F.datediff(
            F.col("l_shipdate").cast("date"), F.lit("1970-01-01").cast("date")
        ).cast("long")
        * F.lit(_PK_DAY_FACTOR).cast("long")
        + F.col("l_orderkey").cast("long") * 8
        + F.col("l_linenumber").cast("long")
    )


@register(
    "sorted_export_ntile_ranges",
    f"""
    WITH k AS (
      SELECT (DATEDIFF('day', DATE '1970-01-01', CAST(l_shipdate AS DATE))
                * {_PK_DAY_FACTOR}
              + l_orderkey * 8 + l_linenumber) AS pk
      FROM lineitem
    ), t AS (
      SELECT pk, NTILE(8) OVER (ORDER BY pk) AS file_id FROM k
    )
    SELECT CAST(file_id AS BIGINT) AS file_id,
           COUNT(*) AS n_rows,
           MIN(pk) AS min_pk,
           MAX(pk) AS max_pk
    FROM t GROUP BY file_id
    """,
    doc="Total-order sorted export, row-to-file-range assignment law "
        "(VERDICT r10 item 2): which rows land in which of the 8 "
        "sorted output files, as per-file (count, min_pk, max_pk) — "
        "exact NTILE(8) semantics, hash-checked against DuckDB's "
        "NTILE. The production writer (io.export_sorted) uses sampled "
        "RangePartitioning for row-balanced files; its boundaries are "
        "sampler-dependent, so THIS entry pins the law with a "
        "deterministic equivalent: exact global rank via "
        "bucket-local row_number + bucket prefix-sum offsets, where "
        "the bucket (32-day window of l_shipdate = the packed key's "
        "leading bits) is a PURE FUNCTION of the row — no sampling, "
        "no driver collect, fully declarative. Shape: one narrow "
        "3-column scan -> hash shuffle on ~80 buckets for the "
        "partitioned row_number window (never a global-order window: "
        "the only unpartitioned window runs over the ~80-row "
        "per-bucket count frame), prefix-sum offsets broadcast back, "
        "NTILE arithmetic from the total-count scalar, then one "
        "8-group aggregate. Per-bucket aggregates are tie-insensitive "
        "(duplicate (shipdate,orderkey,linenumber) tuples share pk, "
        "and swapping equal-pk rows across a bucket boundary changes "
        "neither counts nor min/max), so the hash is deterministic on "
        "both engines. At 100 TB the bucket width is the parallelism "
        "knob (day-granular buckets -> thousands of tasks); the "
        "file-boundary monotonicity + content equality of the real "
        "sampled writer are pinned in tests/test_scale_plans.py",
)
def sorted_export_ntile_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    n_files = 8
    proj = li.select(
        _sorted_export_pk().alias("pk"),
        # Bucket = the packed key's leading bits (32-day windows), so
        # bucket order == pk order and buckets never interleave.
        F.floor(
            F.datediff(
                F.col("l_shipdate").cast("date"),
                F.lit("1970-01-01").cast("date"),
            )
            / 32
        )
        .cast("long")
        .alias("ym"),
    )
    per_bucket = proj.groupBy("ym").agg(F.count(F.lit(1)).alias("bn"))
    # ~80 rows: the single-partition prefix-sum window is over the
    # BUCKET COUNT frame, never the data.
    w_off = Window.orderBy("ym").rowsBetween(Window.unboundedPreceding, -1)
    offs = per_bucket.select(
        "ym",
        F.coalesce(F.sum("bn").over(w_off), F.lit(0)).cast("long").alias("off"),
    )
    total = per_bucket.agg(F.sum("bn").cast("long").alias("n_total"))
    w_rn = Window.partitionBy("ym").orderBy("pk")
    ranked = (
        proj.withColumn("rn", F.row_number().over(w_rn))
        .join(F.broadcast(offs), "ym")
        .crossJoin(F.broadcast(total))
        .select(
            "pk",
            (F.col("off") + F.col("rn").cast("long")).alias("rank"),
            "n_total",
        )
    )
    # Exact NTILE(k): the first (n % k) files take ceil(n/k) rows, the
    # rest floor(n/k). floor(double) is exact here (n < 2^52).
    q = F.floor(F.col("n_total") / n_files).cast("long")
    r = F.pmod(F.col("n_total"), F.lit(n_files)).cast("long")
    big = r * (q + F.lit(1))  # rows covered by the (q+1)-sized files
    file_id = F.when(
        F.col("rank") <= big,
        F.floor((F.col("rank") - 1) / (q + F.lit(1))) + F.lit(1),
    ).otherwise(
        # q = 0 only when n < k; then rank <= big always holds and this
        # branch (with its division by q) is never evaluated.
        r + F.floor((F.col("rank") - big - F.lit(1)) / q) + F.lit(1)
    )
    return (
        ranked.select(file_id.cast("long").alias("file_id"), "pk")
        .groupBy("file_id")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("pk").alias("min_pk"),
            F.max("pk").alias("max_pk"),
        )
    )


@register(
    "gdpr_delete_roundtrip",
    """
    WITH staged AS (
      SELECT CAST(ts AS DATE) AS tanggal, event_id, user_id,
             CAST(value AS DECIMAL(18,2)) AS amount
      FROM events WHERE event_type = 'purchase' AND event_id < 10000
    )
    SELECT tanggal, event_id, user_id, amount
    FROM staged
    WHERE NOT (user_id % 7 = 3
               OR tanggal = (SELECT MIN(tanggal) FROM staged))
    """,
    doc="GDPR partition-pruned DELETE under the correctness gate "
        "(VERDICT r11 item 3): stage a day-partitioned parquet table "
        "(same bounded staged frame as partitioned_write_roundtrip), "
        "run io.delete_where_partitioned with a planted predicate that "
        "BOTH partially deletes many days (user_id % 7 = 3 — the "
        "right-to-be-forgotten shape: one user's rows scattered across "
        "days) AND fully clears one day (tanggal = min day — the "
        "dynamic-overwrite delete gap where the emptied partition "
        "directory must be removed explicitly), then hash-check the "
        "SURVIVING content read back from disk against the oracle's "
        "closed-form restatement. Scale: the delete rewrites only "
        "affected day-partitions (O(affected days), never O(table)); "
        "file-level byte-identity of untouched days is pytest-pinned "
        "in tests/test_scale_plans.py; this entry gives the write "
        "primitive its driver hash. Bounded staging (event_id < 10000 "
        "= the full table at the sf0.01 gate, so hashes are "
        "SF-stable) keeps the driver-side materialization O(1) at any "
        "SF (the partitioned_write_roundtrip convention)",
)
def gdpr_delete_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import shutil
    import tempfile

    from etl_tj_project_spark.io import (
        delete_where_partitioned,
        write_partitioned,
    )

    ev = load_table(spark, sf_dir, "events").filter(
        (F.col("event_type") == "purchase") & (F.col("event_id") < 10000)
    )
    df = ev.select(
        F.col("ts").cast("date").alias("tanggal"),
        "event_id",
        "user_id",
        F.col("value").cast(AMOUNT).alias("amount"),
    )
    out = tempfile.mkdtemp(prefix="tj_gdpr_")
    try:
        write_partitioned(df, out, partition_col="tanggal")
        # One-row bounded scalar: the day to clear completely.
        kill_day = df.agg(F.min("tanggal")).collect()[0][0]
        pred = (F.col("user_id") % 7 == 3) | (
            F.col("tanggal") == F.lit(str(kill_day)).cast("date")
        )
        delete_where_partitioned(spark, out, pred, partition_col="tanggal")
        back = spark.read.parquet(out).select(
            "tanggal", "event_id", "user_id", "amount"
        )
        # Materialize so the temp table can be deleted now (survivor set
        # is bounded by the staged cap — the roundtrip convention).
        return spark.createDataFrame(back.collect(), schema=back.schema)
    finally:
        shutil.rmtree(out, ignore_errors=True)


@register(
    "merge_sorted_export_roundtrip",
    """
    WITH base AS (
      SELECT doc_id AS k, CAST(n_chars AS BIGINT) AS payload
      FROM documents WHERE doc_id < 500
    ),
    t AS (SELECT k, payload, NTILE(4) OVER (ORDER BY k) AS f FROM base),
    ranges AS (SELECT f, MIN(k) AS lo FROM t GROUP BY f),
    delta AS (
      SELECT (doc_id * 37) % 500 AS k,
             CAST(n_chars + 1000000 AS BIGINT) AS payload
      FROM documents WHERE doc_id % 100 = 3
    ),
    asg AS (
      SELECT d.k, d.payload,
             COALESCE((SELECT MAX(r.f) FROM ranges r WHERE r.lo <= d.k),
                      (SELECT MIN(f) FROM ranges)) AS f
      FROM delta d
    ),
    merged AS (
      SELECT k, payload, f FROM t UNION ALL SELECT k, payload, f FROM asg
    )
    SELECT CAST(f AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(MIN(k) AS BIGINT) AS min_key,
           CAST(MAX(k) AS BIGINT) AS max_key,
           CAST(SUM(payload) AS BIGINT) AS sum_payload
    FROM merged GROUP BY f
    """,
    doc="Incremental sorted-export maintenance under the correctness "
        "gate (VERDICT r11 item 3): build a 4-file sorted export of "
        "(doc_id, n_chars) with DETERMINISTIC exact-NTILE file "
        "boundaries (the production io.export_sorted samples its "
        "boundaries, so this entry constructs the base with the same "
        "NTILE law sorted_export_ntile_ranges pins — driver-side over "
        "the <=500-row bounded base, the write-path-entry convention), "
        "fold in a planted delta (keys (doc_id*37) % 500 scatter "
        "across the key space; payload offset +1000000 makes delta "
        "rows distinguishable in the per-file sums) via "
        "io.merge_sorted_export, and hash-check the per-file "
        "(n_rows, min, max, sum) stats of the MERGED export read back "
        "from disk. The oracle restates the whole law closed-form: "
        "NTILE(4) base assignment, last-lo-<=-key delta ownership "
        "with below-all-ranges folding into the first file, then "
        "per-file aggregates — so the hash proves the broadcast "
        "range-join assignment, the touched-file rewrite, AND the "
        "untouched-file copy (a dropped or double-counted row anywhere "
        "shifts a file's n_rows/sum). Scale: merge work is O(touched "
        "files + delta), untouched bytes move server-side through the "
        "Hadoop FS API; plan/FS invariants pytest-pinned in "
        "tests/test_scale_plans.py",
)
def merge_sorted_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile

    from pyspark.sql.types import LongType, StructField, StructType

    from etl_tj_project_spark.io import merge_sorted_export

    docs = load_table(spark, sf_dir, "documents")
    # Bounded base (<=500 rows by the key cut): exact NTILE(4) split,
    # driver-side — the base CONSTRUCTION is test scaffolding; the op
    # under test is the distributed merge below.
    base_rows = sorted(
        docs.filter(F.col("doc_id") < 500).select("doc_id", "n_chars").collect(),
        key=lambda r: r.doc_id,
    )
    n, k = len(base_rows), 4
    q, rmd = divmod(n, k)
    sizes = [q + 1] * rmd + [q] * (k - rmd)
    schema = StructType(
        [
            StructField("doc_id", LongType(), True),
            StructField("n_chars", LongType(), True),
        ]
    )
    root = tempfile.mkdtemp(prefix="tj_msort_rt_")
    src_dir = os.path.join(root, "base")
    out_dir = os.path.join(root, "out")
    os.makedirs(src_dir)
    try:
        pos = 0
        for i, sz in enumerate(sizes):
            if sz == 0:
                continue
            chunk = [tuple(r) for r in base_rows[pos : pos + sz]]
            pos += sz
            tmp = os.path.join(root, f"tmp{i}")
            (
                spark.createDataFrame(chunk, schema)
                .coalesce(1)
                .sortWithinPartitions("doc_id")
                .write.parquet(tmp)
            )
            part = next(
                p for p in sorted(os.listdir(tmp)) if p.endswith(".parquet")
            )
            os.replace(
                os.path.join(tmp, part),
                os.path.join(src_dir, f"part-{i:05d}.parquet"),
            )
            shutil.rmtree(tmp, ignore_errors=True)
        delta = docs.filter(F.col("doc_id") % 100 == 3).select(
            ((F.col("doc_id") * 37) % 500).alias("doc_id"),
            (F.col("n_chars") + 1000000).alias("n_chars"),
        )
        merge_sorted_export(spark, src_dir, delta, ["doc_id"], out_dir)
        per_file = sorted(
            spark.read.parquet(out_dir)
            .groupBy(F.input_file_name().alias("f"))
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.min("doc_id").cast("long").alias("min_key"),
                F.max("doc_id").cast("long").alias("max_key"),
                F.sum("n_chars").cast("long").alias("sum_payload"),
            )
            .collect(),  # bounded: one row per export file (<=4)
            key=lambda r: r.f,
        )
        out_schema = StructType(
            [
                StructField("file_id", LongType(), False),
                StructField("n_rows", LongType(), True),
                StructField("min_key", LongType(), True),
                StructField("max_key", LongType(), True),
                StructField("sum_payload", LongType(), True),
            ]
        )
        return spark.createDataFrame(
            [
                (i + 1, r.n_rows, r.min_key, r.max_key, r.sum_payload)
                for i, r in enumerate(per_file)
            ],
            schema=out_schema,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
