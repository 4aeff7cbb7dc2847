"""Time-series pack: interpolation gap-fill, marker-reset running sums,
rolling covariance — the three series shapes the temporal entries
(forward fill, running sums, bounded frames) don't yet exercise.

Numeric policy (same as the rest of the registry): everything that can
round stays DECIMAL until the last step; the only divisions are IEEE
binary64 over exactly-representable operands, which both engines round
identically, so every entry carries a full oracle hash check.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.schemas import AMOUNT
from etl_tj_project_spark.sources.testdata import load_table


@register(
    "time_bucket_interpolate",
    """
    WITH sparse AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS revenue
      FROM orders WHERE o_orderpriority = '1-URGENT'
      GROUP BY CAST(o_orderdate AS DATE)
    ), bounds AS (SELECT min(d) AS mind, max(d) AS maxd FROM sparse),
    spine AS (
      SELECT CAST(unnest(generate_series(mind, maxd, INTERVAL 1 DAY)) AS DATE)
        AS d
      FROM bounds
    ), joined AS (
      SELECT s.d, sp.revenue FROM spine s LEFT JOIN sparse sp ON sp.d = s.d
    ), anchored AS (
      SELECT d, revenue,
             last_value(revenue IGNORE NULLS) OVER wp AS prev_v,
             last_value(CASE WHEN revenue IS NOT NULL THEN d END IGNORE NULLS)
               OVER wp AS prev_d,
             first_value(revenue IGNORE NULLS) OVER wn AS next_v,
             first_value(CASE WHEN revenue IS NOT NULL THEN d END IGNORE NULLS)
               OVER wn AS next_d
      FROM joined
      WINDOW wp AS (ORDER BY d ROWS BETWEEN UNBOUNDED PRECEDING
                    AND CURRENT ROW),
             wn AS (ORDER BY d ROWS BETWEEN CURRENT ROW
                    AND UNBOUNDED FOLLOWING)
    )
    SELECT d, revenue,
           CASE
             WHEN revenue IS NOT NULL THEN CAST(revenue AS DOUBLE)
             WHEN prev_v IS NULL OR next_v IS NULL THEN NULL
             ELSE (CAST(prev_v AS DOUBLE) * (next_d - d)
                   + CAST(next_v AS DOUBLE) * (d - prev_d))
                  / (next_d - prev_d)
           END AS revenue_interp
    FROM anchored
    """,
    doc="Linear-interpolation gap fill (the time_bucket_gapfill / "
        "interpolate operator of timeseries stores): dense spine over a "
        "SPARSE daily series, each missing day filled from its "
        "bracketing known points weighted by day distance. Forward-fill "
        "(date_spine_gap_fill) repeats stale values; interpolation is "
        "what rate-like metrics need. Aggregate-first: windows run over "
        "|days| rows. The fill is one IEEE division of exactly-"
        "representable decimal-scaled operands — deterministic in both "
        "engines, so the hash check covers the interpolated values too; "
        "edge days with no bracket on one side stay NULL",
)
def time_bucket_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    sparse = (
        o.filter(F.col("o_orderpriority") == "1-URGENT")
        .groupBy(F.col("o_orderdate").cast("date").alias("d"))
        .agg(F.sum(F.col("o_totalprice").cast(AMOUNT)).cast(AMOUNT).alias("revenue"))
    )
    bounds = sparse.agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
    spine = bounds.select(F.explode(F.sequence("mind", "maxd")).alias("d"))
    joined = spine.join(sparse, "d", "left")
    wp = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    wn = Window.orderBy("d").rowsBetween(0, Window.unboundedFollowing)
    known_d = F.when(F.col("revenue").isNotNull(), F.col("d"))
    anchored = joined.select(
        "d",
        "revenue",
        F.last("revenue", ignorenulls=True).over(wp).alias("prev_v"),
        F.last(known_d, ignorenulls=True).over(wp).alias("prev_d"),
        F.first("revenue", ignorenulls=True).over(wn).alias("next_v"),
        F.first(known_d, ignorenulls=True).over(wn).alias("next_d"),
    )
    interp = (
        F.col("prev_v").cast("double") * F.datediff("next_d", "d")
        + F.col("next_v").cast("double") * F.datediff("d", "prev_d")
    ) / F.datediff("next_d", "prev_d")
    return anchored.select(
        "d",
        "revenue",
        F.when(F.col("revenue").isNotNull(), F.col("revenue").cast("double"))
        .when(F.col("prev_v").isNull() | F.col("next_v").isNull(), F.lit(None))
        .otherwise(interp)
        .alias("revenue_interp"),
    )


@register(
    "running_sum_reset_on_marker",
    """
    WITH seg AS (
      SELECT event_id, user_id, ts, event_type,
             CAST(value AS DECIMAL(18,2)) AS v,
             COALESCE(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS seg
      FROM events
    )
    SELECT event_id, user_id, CAST(seg AS BIGINT) AS seg,
           CAST(SUM(v) OVER (PARTITION BY user_id, seg
                             ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DECIMAL(18,2)) AS run_val
    FROM seg
    """,
    doc="Running sum that RESETS at marker events (accumulated activity "
        "value since the user's last purchase) — the cursor-style 'reset "
        "accumulator' re-expressed set-based: a strictly-preceding "
        "marker count assigns each row a segment id, then an ordinary "
        "running sum partitioned by (user, segment). The marker row "
        "closes its own segment; the next row starts at zero. Two "
        "window passes over the SAME (user, ts) sort order, so Spark "
        "plans one exchange + one sort for both",
)
def running_sum_reset_on_marker(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    w_mark = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    seg = ev.select(
        "event_id",
        "user_id",
        "ts",
        F.col("value").cast(AMOUNT).alias("v"),
        F.coalesce(
            F.sum((F.col("event_type") == "purchase").cast("int")).over(w_mark),
            F.lit(0),
        ).alias("seg"),
    )
    w_run = (
        Window.partitionBy("user_id", "seg")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return seg.select(
        "event_id",
        "user_id",
        F.col("seg").cast("long").alias("seg"),
        F.sum("v").over(w_run).cast(AMOUNT).alias("run_val"),
    )


@register(
    "rolling_cov_manual",
    """
    WITH t AS (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             CAST(l_quantity AS DECIMAL(9,2))       AS x,
             CAST(l_extendedprice AS DECIMAL(12,2)) AS y,
             CAST(CAST(l_quantity AS DECIMAL(9,2))
                  * CAST(l_extendedprice AS DECIMAL(12,2))
                  AS DECIMAL(18,4)) AS xy
      FROM lineitem
    ), framed AS (
      SELECT l_suppkey, l_orderkey, l_linenumber,
             COUNT(*) OVER w                              AS n,
             CAST(SUM(x) OVER w AS DECIMAL(12,2))         AS sx,
             CAST(SUM(y) OVER w AS DECIMAL(15,2))         AS sy,
             CAST(SUM(xy) OVER w AS DECIMAL(21,4))        AS sxy
      FROM t
      WINDOW w AS (PARTITION BY l_suppkey
                   ORDER BY l_orderkey, l_linenumber, x, y
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT l_suppkey, l_orderkey, l_linenumber,
           CAST(n AS BIGINT) AS n,
           CAST(CAST(n AS DECIMAL(3,0)) * sxy - sx * sy AS DECIMAL(27,4))
             AS cov_num,
           CAST(CAST(CAST(n AS DECIMAL(3,0)) * sxy - sx * sy AS DECIMAL(27,4))
                AS DOUBLE) / (n * n) AS cov_biased
    FROM framed
    """,
    doc="Rolling covariance over a trailing 7-row frame per supplier — "
        "the pairwise-stats twin of rolling_zscore_anomaly. Native "
        "covar_samp over a sliding frame hits FP accumulation-order "
        "divergence between engines, so the moment sums (Σx, Σy, Σxy) "
        "stay DECIMAL inside the frame and combine as "
        "n·Σxy − Σx·Σy, exact at bounded precision; the final biased "
        "covariance is one IEEE division by n². Frame ordering: this "
        "synthetic lineitem has DUPLICATE (l_orderkey, l_linenumber) "
        "pairs within a supplier at sf0.01+, so the measures (x, y) "
        "join the sort key as final tie-breaks — remaining ties are "
        "full duplicates whose exchange cannot change any frame sum",
)
def rolling_cov_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast("decimal(9,2)")
    y = F.col("l_extendedprice").cast("decimal(12,2)")
    t = li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        x.alias("x"),
        y.alias("y"),
        (x * y).cast("decimal(18,4)").alias("xy"),
    )
    w = (
        Window.partitionBy("l_suppkey")
        .orderBy("l_orderkey", "l_linenumber", "x", "y")
        .rowsBetween(-6, Window.currentRow)
    )
    framed = t.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).cast("decimal(12,2)").alias("sx"),
        F.sum("y").over(w).cast("decimal(15,2)").alias("sy"),
        F.sum("xy").over(w).cast("decimal(21,4)").alias("sxy"),
    )
    cov_num = (
        F.col("n").cast("decimal(3,0)") * F.col("sxy")
        - F.col("sx") * F.col("sy")
    ).cast("decimal(27,4)")
    return framed.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        F.col("n").cast("long").alias("n"),
        cov_num.alias("cov_num"),
        (cov_num.cast("double") / (F.col("n") * F.col("n"))).alias("cov_biased"),
    )
