"""Incremental-aggregation shapes: partial-aggregate merge (the
materialized-rollup algebra) and time-range window frames.

The reaggregation pattern is the backbone of every 100 TB warehouse: the
daily job computes per-(key, day) partials once; weekly/monthly/yearly
rollups then MERGE PARTIALS instead of rescanning the fact table. The
merge algebra is pinned here: COUNT merges by SUM, SUM by SUM, MIN/MAX by
MIN/MAX, and AVG is NOT mergeable — it must be carried as (sum, count)
and divided at the end (merging averages of unequal groups is the classic
silent-corruption bug this query exists to pin).

Both queries follow the aggregate-first idiom (SCALE.md §2): the window /
merge layer runs over the reduced partial table, never the raw facts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table

PRICE = DecimalType(18, 2)


@register(
    "reaggregate_partials",
    """
    WITH daily AS (
      SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
             COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS sum_price,
             CAST(MIN(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS min_price,
             CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS max_price
      FROM orders GROUP BY o_custkey, CAST(o_orderdate AS DATE)
    )
    SELECT CAST(date_trunc('month', d) AS DATE) AS month,
           CAST(SUM(n_orders) AS BIGINT)  AS n_orders,
           CAST(SUM(sum_price) AS DECIMAL(18,2)) AS sum_price,
           CAST(MIN(min_price) AS DECIMAL(18,2)) AS min_price,
           CAST(MAX(max_price) AS DECIMAL(18,2)) AS max_price,
           round(CAST(SUM(sum_price) AS DOUBLE) / SUM(n_orders), 6)
             AS avg_price
    FROM daily GROUP BY CAST(date_trunc('month', d) AS DATE)
    """,
    doc="Partial-aggregate merge: per-(custkey, day) partials rolled up "
        "to months by the merge algebra (COUNT→SUM, SUM→SUM, MIN→MIN, "
        "MAX→MAX; AVG recomputed from merged sum/count, never averaged "
        "averages). At 100 TB the monthly job reads the partial table — "
        "|keys|×|days| rows — instead of the fact table; the same "
        "two-level plan here IS the incremental plan, just with the "
        "daily CTE materialized",
)
def reaggregate_partials(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast(PRICE)
    daily = o.groupBy(
        "o_custkey", F.col("o_orderdate").cast("date").alias("d")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(price).cast(PRICE).alias("sum_price"),
        F.min(price).cast(PRICE).alias("min_price"),
        F.max(price).cast(PRICE).alias("max_price"),
    )
    return daily.groupBy(
        F.date_trunc("month", "d").cast("date").alias("month")
    ).agg(
        F.sum("n_orders").cast("long").alias("n_orders"),
        F.sum("sum_price").cast(PRICE).alias("sum_price"),
        F.min("min_price").cast(PRICE).alias("min_price"),
        F.max("max_price").cast(PRICE).alias("max_price"),
        F.round(
            F.sum("sum_price").cast("double") / F.sum("n_orders"), 6
        ).alias("avg_price"),
    )


@register(
    "window_range_frame",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS revenue
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    )
    SELECT d, revenue,
           CAST(SUM(revenue) OVER (
             ORDER BY d
             RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS revenue_7d
    FROM daily
    """,
    doc="RANGE-frame window (value-based, not row-based): trailing 7-day "
        "revenue where gaps in the calendar matter — a ROWS frame would "
        "silently include older days across gaps. Spark expresses the "
        "interval frame as rangeBetween over epoch seconds (UTC session, "
        "so day arithmetic is uniform). Aggregate-first: the window runs "
        "over |days| rows, so the unpartitioned frame is safe at any "
        "fact-table scale",
)
def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast(PRICE)).cast(PRICE).alias("revenue")
    )
    day_secs = F.col("d").cast("timestamp").cast("long")
    w = (
        Window.orderBy(day_secs)
        .rangeBetween(-6 * 86400, Window.currentRow)
    )
    return daily.select(
        "d",
        "revenue",
        F.sum("revenue").over(w).cast(PRICE).alias("revenue_7d"),
    )


@register(
    "funnel_stages",
    """
    WITH c AS (
      SELECT user_id, MIN(epoch_us(ts)) AS first_click_us
      FROM events WHERE event_type = 'click' GROUP BY user_id
    ),
    conv AS (
      SELECT c.user_id
      FROM c JOIN events e
        ON e.user_id = c.user_id
       AND e.event_type = 'purchase'
       AND epoch_us(e.ts) >= c.first_click_us
      GROUP BY c.user_id
    )
    SELECT 'clicked' AS stage, COUNT(*) AS n_users FROM c
    UNION ALL
    SELECT 'converted' AS stage, COUNT(*) AS n_users FROM conv
    """,
    doc="Funnel analysis: ordered event-sequence matching — users whose "
        "first click is later followed by a purchase. The order "
        "constraint is a non-equi join conjunct on the per-user first-"
        "click time (aggregate-then-join, one shuffle on user_id); "
        "stage counts union into one result. At 100 TB the funnel is "
        "per-user-partitioned work with no cross-user state",
)
def funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_click"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"), F.col("ts").alias("p_ts")
    )
    converted = (
        clicks.join(
            purchases,
            (F.col("user_id") == F.col("p_user_id"))
            & (F.col("p_ts") >= F.col("first_click")),
        )
        .select("user_id")
        .distinct()
    )
    n_clicked = clicks.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("clicked").alias("stage"), "n_users"
    )
    n_converted = converted.agg(F.count(F.lit(1)).alias("n_users")).select(
        F.lit("converted").alias("stage"), "n_users"
    )
    return n_clicked.unionByName(n_converted)


@register(
    "skewed_window_two_phase",
    """
    SELECT l_orderkey, l_linenumber,
           CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) OVER (
             PARTITION BY l_returnflag
             ORDER BY CAST(l_shipdate AS DATE), l_orderkey, l_linenumber,
                      CAST(l_quantity AS DECIMAL(18,2))
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DECIMAL(18,2)) AS running_qty
    FROM lineitem
    """,
    doc="Skewed-window stress: running sum over a THREE-value partition "
        "key (l_returnflag) — the shape that serializes a naive window "
        "into 3 tasks at any cluster size. Implemented as the two-phase "
        "chunked rewrite (operators/windows.py): per-(key, year-chunk) "
        "local windows + broadcast exclusive-prefix offsets, result-"
        "identical to the plain window the oracle states. Parallelism "
        "|keys|×|chunks|; no single-partition sort (plan-pinned)",
)
def skewed_window_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.operators.windows import chunked_running_sum

    li = load_table(spark, sf_dir, "lineitem")
    ship_date = F.col("l_shipdate").cast("date")
    qty = F.col("l_quantity").cast(PRICE)
    # The testdata carries intentional duplicate (shipdate, orderkey,
    # linenumber) rows with different quantities (dedup fodder), so the
    # summed value itself is the final tiebreak: remaining ties are then
    # value-identical and the prefix-sum multiset is order-invariant.
    out = chunked_running_sum(
        li,
        key="l_returnflag",
        chunk=F.year(ship_date),
        order_cols=[ship_date, F.col("l_orderkey"), F.col("l_linenumber"), qty],
        value=qty,
        out_col="running_qty",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.col("running_qty").cast(PRICE).alias("running_qty"),
    )


@register(
    "window_first_last",
    """
    SELECT o_orderkey, o_custkey,
           first_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
             AS first_price,
           last_value(CAST(o_totalprice AS DECIMAL(18,2))) OVER w
             AS last_price,
           nth_value(CAST(o_totalprice AS DECIMAL(18,2)), 2) OVER w
             AS second_price
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey
      ORDER BY CAST(o_orderdate AS DATE), o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
    doc="first/last/nth_value windows with the full-partition frame "
        "spelled explicitly — the default frame (UNBOUNDED PRECEDING → "
        "CURRENT ROW) makes last_value mean 'current row', the classic "
        "silent bug; the ordering carries the unique orderkey tiebreak "
        "so nth_value is deterministic. One shuffle on custkey",
)
def window_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast(PRICE)
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("date"), "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        F.first(price).over(w).alias("first_price"),
        F.last(price).over(w).alias("last_price"),
        F.nth_value(price, 2).over(w).alias("second_price"),
    )
