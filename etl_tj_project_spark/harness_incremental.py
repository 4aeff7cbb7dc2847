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


@register(
    "interval_containment_join",
    """
    WITH spans AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             MIN(epoch_us(ts)) AS s_us, MAX(epoch_us(ts)) AS e_us
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), p AS (
      SELECT epoch_us(ts) AS us FROM events WHERE event_type = 'purchase'
    )
    SELECT spans.user_id, spans.day, COUNT(*) AS n_contained
    FROM spans JOIN p ON p.us >= spans.s_us AND p.us <= spans.e_us
    GROUP BY spans.user_id, spans.day
    """,
    doc="Big-big interval-containment join (operators/joins."
        "binned_interval_join): per-(user, day) activity spans joined to "
        "ALL purchase timestamps they contain — no equi key, so a naive "
        "plan is a BroadcastNestedLoopJoin that dies when neither side "
        "broadcasts. The rewrite buckets both sides into 1-hour epoch "
        "bins (intervals explode to overlapped bins, points map to one) "
        "making it a plain equi-join + refine filter; the oracle states "
        "the naive theta-join semantics, proving the rewrite exact",
)
def interval_containment_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.operators.joins import binned_interval_join

    ev = load_table(spark, sf_dir, "events")
    spans = ev.groupBy(
        "user_id", F.col("ts").cast("date").alias("day")
    ).agg(
        F.min(F.unix_micros("ts")).alias("s_us"),
        F.max(F.unix_micros("ts")).alias("e_us"),
    )
    points = ev.filter(F.col("event_type") == "purchase").select(
        F.unix_micros("ts").alias("us")
    )
    joined = binned_interval_join(
        points, spans, "us", "s_us", "e_us", bin_width=3_600_000_000
    )
    return joined.groupBy("user_id", "day").agg(
        F.count(F.lit(1)).alias("n_contained")
    )


@register(
    "asof_join_tolerance",
    """
    SELECT p.event_id, p.user_id,
           (SELECT max(epoch_us(c.ts))
            FROM events c
            WHERE c.event_type = 'click' AND c.user_id = p.user_id
              AND (epoch_us(c.ts) < epoch_us(p.ts)
                   OR (epoch_us(c.ts) = epoch_us(p.ts)
                       AND c.event_id <= p.event_id))
              AND epoch_us(c.ts) >= epoch_us(p.ts) - 21600000000
           ) AS attributed_click_us
    FROM events p WHERE p.event_type = 'purchase'
    """,
    doc="As-of join WITH TOLERANCE (the pandas merge_asof `tolerance` / "
        "kdb wj staleness bound): each purchase takes the user's most "
        "recent click at-or-before it ONLY if within 6 hours, else NULL "
        "— stale attributions are discarded, not silently used. Same "
        "single tagged-union window pass as asof_join (the most recent "
        "click is the only candidate that can satisfy the bound, so the "
        "tolerance is one post-filter, not a second window)",
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    tol_us = 6 * 3600 * 1_000_000
    ev = load_table(spark, sf_dir, "events")
    both = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id", "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tagged = both.withColumn(
        "click_us", F.when(F.col("event_type") == "click", F.col("us"))
    ).withColumn(
        "last_click_us", F.last("click_us", ignorenulls=True).over(w)
    )
    return tagged.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.when(
            F.col("us") - F.col("last_click_us") <= tol_us,
            F.col("last_click_us"),
        ).alias("attributed_click_us"),
    )


@register(
    "scd2_apply_changes",
    """
    SELECT user_id, event_id, epoch_us(ts) AS valid_from_us,
           lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                    ORDER BY epoch_us(ts), event_id)
             AS valid_to_us
    FROM events WHERE event_type = 'signup'
    """,
    doc="Incremental SCD2 maintenance (the MERGE/apply-changes pattern): "
        "an existing SCD2 dim (built from changes before 2024-01-25) "
        "absorbs a delta batch by rewriting ONLY touched users — "
        "untouched users pass through via LEFT ANTI join, touched users "
        "rebuild from (their old rows + delta) via the same window. The "
        "oracle is the FULL recompute over all changes, proving "
        "incremental == recompute exactly. At 100 TB the anti/semi "
        "split is the whole point: the delta touches a fraction of "
        "users, so the rewrite is delta-sized, not dim-sized",
)
def scd2_apply_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.to_timestamp(F.lit("2024-01-25"))
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    sig = ev.select("user_id", "event_id", F.unix_micros("ts").alias("us"))
    cutoff_us = F.unix_micros(cutoff)
    base = sig.filter(F.col("us") < cutoff_us)
    delta = sig.filter(F.col("us") >= cutoff_us)

    w = Window.partitionBy("user_id").orderBy("us", "event_id")

    def ranges(points: DataFrame) -> DataFrame:
        return points.select(
            "user_id",
            "event_id",
            F.col("us").alias("valid_from_us"),
            F.lead("us").over(w).alias("valid_to_us"),
        )

    old_dim = ranges(base)
    touched = delta.select("user_id").distinct()
    untouched = old_dim.join(F.broadcast(touched), "user_id", "left_anti")
    rebuilt_points = (
        old_dim.join(F.broadcast(touched), "user_id", "left_semi")
        .select(
            "user_id", "event_id", F.col("valid_from_us").alias("us")
        )
        .unionByName(delta)
    )
    return untouched.unionByName(ranges(rebuilt_points))


@register(
    "approx_percentile_profile",
    None,  # rows-only: Greenwald-Khanna sketch internals are engine-
    # specific, so cross-engine value equality is not a fair oracle; the
    # local gate instead bounds each estimate's RANK ERROR against the
    # exact sorted data (test_approx_percentile_rank_error_bounded).
    doc="Quantile sketch profile: approx_percentile (GK sketch, "
        "mergeable, single pass) of l_extendedprice at p50/p90/p99 per "
        "l_linestatus — the 100 TB replacement for exact percentile_cont "
        "(which needs a per-group sort); exact twin percentile_by_group "
        "carries the hash check for the same shape. One sketch pass, "
        "three scalar output columns (no array output — driver-side "
        "canonicalizers can't hash array cells)",
)
def approx_percentile_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    pcts = F.percentile_approx(
        F.col("l_extendedprice").cast("double"),
        [0.5, 0.9, 0.99],
        10_000,
    )
    return li.groupBy("l_linestatus").agg(
        pcts.getItem(0).alias("approx_p50"),
        pcts.getItem(1).alias("approx_p90"),
        pcts.getItem(2).alias("approx_p99"),
        F.count(F.lit(1)).alias("n_rows"),
    )


from etl_tj_project_spark.functions import zorder as _z  # noqa: E402


@register(
    "zorder_key_2d",
    f"""
    SELECT o_orderkey,
           {_z.morton_key_2d_sql("o_custkey & 65535", "o_orderkey & 65535")}
             AS zkey
    FROM orders
    """,
    doc="Z-order (Morton) clustering key: bit-interleave of two integer "
        "dimensions as a pure int64 column expression (four shift-or-"
        "mask spread rounds per input — functions/zorder.py), the key "
        "io.write_zordered range-partitions and sorts by so parquet "
        "min/max footer stats prune scans on EITHER dimension. The "
        "oracle renders the identical arithmetic in SQL; bit-exact "
        "across engines",
)
def zorder_key_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        _z.morton_key_2d(
            F.col("o_custkey").bitwiseAND(F.lit(65535)),
            F.col("o_orderkey").bitwiseAND(F.lit(65535)),
        ).alias("zkey"),
    )


@register(
    "incremental_join_maintenance",
    """
    SELECT o.o_orderkey, o.o_custkey,
           CASE WHEN c.c_custkey % 37 = 0
                THEN c.c_mktsegment || '_v2'
                ELSE c.c_mktsegment END AS segment,
           round(o.o_totalprice, 2) AS price
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    """,
    doc="Incremental JOIN maintenance (IVM): a materialized fact-dim "
        "join absorbs BOTH a fact delta (orders after the cutoff) and "
        "dim UPDATES (every 37th customer's segment changes) without "
        "recomputation: dJ = untouched base rows (LEFT ANTI on changed "
        "keys) UNION old facts of changed keys re-joined to the new "
        "dim (SEMI-restricted — delta-sized, not dim-sized) UNION "
        "fact-delta joined to the new dim. The oracle is the FULL "
        "recompute over final state, proving incremental == recompute "
        "exactly — the same contract as scd2_apply_changes/"
        "dedup_incremental_lsh_candidates. At 100 TB the anti/semi "
        "split is the point: maintenance cost scales with "
        "|delta| + |changed-key facts|, never |base join|",
)
def incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-06-01").cast("date")
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")

    changed_pred = F.col("c_custkey") % 37 == 0
    seg_new = F.when(
        changed_pred, F.concat(F.col("c_mktsegment"), F.lit("_v2"))
    ).otherwise(F.col("c_mktsegment"))
    b_old = c.select("c_custkey", F.col("c_mktsegment").alias("segment"))
    b_new = c.select("c_custkey", seg_new.alias("segment"))

    a_old = o.filter(F.col("o_orderdate").cast("date") < cutoff)
    a_delta = o.filter(F.col("o_orderdate").cast("date") >= cutoff)

    def j(facts: DataFrame, dim: DataFrame) -> DataFrame:
        return facts.join(
            F.broadcast(dim), facts.o_custkey == dim.c_custkey
        ).select(
            "o_orderkey",
            "o_custkey",
            "segment",
            F.round("o_totalprice", 2).alias("price"),
        )

    base = j(a_old, b_old)  # the "materialized" state before the batch
    changed = F.broadcast(
        c.filter(changed_pred).select(F.col("c_custkey").alias("o_custkey"))
    )
    untouched = base.join(changed, "o_custkey", "left_anti")
    rebuilt = j(
        a_old.join(changed, "o_custkey", "left_semi"),
        b_new.filter(F.col("c_custkey") % 37 == 0),
    )
    fresh = j(a_delta, b_new)
    return untouched.unionByName(rebuilt).unionByName(fresh)


@register(
    "incremental_agg_retractions",
    """
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DOUBLE) AS revenue
    FROM orders
    WHERE NOT (o_orderkey % 53 = 0
               AND CAST(o_orderdate AS DATE) < DATE '1995-06-01')
    GROUP BY o_orderpriority
    """,
    doc="Incremental AGGREGATE maintenance with RETRACTIONS: a "
        "materialized groupBy absorbs a delta holding inserts (orders "
        "after the cutoff) and deletes (every 53rd pre-cutoff order is "
        "retracted) by merging SIGNED partials — count +/-1, sum "
        "+/-value — never rescanning the base. This is the algebra "
        "streaming update-mode sinks and CDC-fed rollups run on "
        "(reaggregate_partials covers insert-only merge; retraction "
        "is what makes DELETEs O(delta)). DECIMAL partials keep the "
        "merge exact, so incremental == full recompute to the last "
        "cent — which is exactly what the oracle checks. Groups "
        "whose count reaches 0 are dropped (the retraction-algebra "
        "edge case a naive merge forgets)",
)
def incremental_agg_retractions(spark: SparkSession, sf_dir: str) -> DataFrame:
    cutoff = F.lit("1995-06-01").cast("date")
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(18,2)")

    base = o.filter(F.col("o_orderdate").cast("date") < cutoff)
    inserts = o.filter(F.col("o_orderdate").cast("date") >= cutoff)
    deletes = base.filter(F.col("o_orderkey") % 53 == 0)

    def partials(df: DataFrame, sign: int) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            (F.lit(sign) * F.count(F.lit(1))).alias("dn"),
            (F.lit(sign).cast("decimal(18,2)") * F.sum(price))
            .cast("decimal(28,2)")
            .alias("dsum"),
        )

    merged = (
        partials(base, 1)  # the "materialized" state before the batch
        .unionByName(partials(inserts, 1))
        .unionByName(partials(deletes, -1))
        .groupBy("o_orderpriority")
        .agg(F.sum("dn").alias("n"), F.sum("dsum").alias("s"))
        .filter(F.col("n") > 0)
    )
    return merged.select(
        "o_orderpriority",
        F.col("n").cast("long").alias("n_orders"),
        F.col("s").cast("double").alias("revenue"),
    )


@register(
    "cdc_apply_latest",
    """
    WITH log AS (
      SELECT user_id, event_id, epoch_us(ts) AS us, value,
             CASE WHEN event_type = 'error' THEN 'D'
                  WHEN event_type = 'signup' THEN 'I'
                  ELSE 'U' END AS op
      FROM events
    ),
    ranked AS (
      SELECT user_id, event_id, us, value, op,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY us DESC, event_id DESC) AS rn
      FROM log
    )
    SELECT user_id, event_id AS last_event_id, op AS last_op,
           CAST(value AS DOUBLE) AS last_value
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    doc="CDC changelog apply — the MERGE-from-changelog op that turns a "
        "Debezium-style (key, op, payload) stream into the CURRENT "
        "table snapshot: latest op per key wins (ordered by event time, "
        "id-tiebroken), and a key whose latest op is a DELETE vanishes "
        "from the state entirely — the semantics scd2_apply_changes "
        "(validity ranges, no deletes) does not cover. The changelog is "
        "derived deterministically from events (error=>D, signup=>I, "
        "else U). ONE shuffle on the key; at 100 TB the key is the "
        "natural partition and a rank-1 window beats a self-join "
        "max-timestamp lookup (no second shuffle, no late-tie "
        "ambiguity). Compacting a billion-row changelog to current "
        "state is exactly this plan",
)
def cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    log = ev.select(
        "user_id",
        "event_id",
        F.unix_micros("ts").alias("us"),
        "value",
        F.when(F.col("event_type") == "error", "D")
        .when(F.col("event_type") == "signup", "I")
        .otherwise("U")
        .alias("op"),
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("us").desc(), F.col("event_id").desc()
    )
    return (
        log.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("op") != "D"))
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("op").alias("last_op"),
            F.col("value").cast("double").alias("last_value"),
        )
    )
