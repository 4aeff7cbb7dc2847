"""Function-family pack 4: bitwise aggregates, exact median/IQR,
deterministic mode, and BOUNDED rows-frame moving aggregates.

The gap this pack closes (audit of packs 1-3): every windowed aggregate
registered so far uses an UNBOUNDED PRECEDING frame (running sums); the
bounded sliding frame — the shape behind moving averages and rolling
health metrics — exercises a different executor path (Spark keeps a
sliding frame buffer; DuckDB uses segment trees), so FP-order bugs hide
here unless sums are exact. All sliding sums therefore run in
DECIMAL(18,2) (exact, order-independent) with ratios via IEEE division.

Mode is computed MANUALLY (count + row_number with a value tiebreak) in
both engines: native ``mode()`` leaves tie order implementation-defined
in both Spark and DuckDB, which is exactly the nondeterminism the parity
gate exists to catch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table

AMOUNT = DecimalType(18, 2)


@register(
    "bitwise_agg_pack",
    """
    SELECT l_linestatus,
           CAST(bit_and(l_partkey) AS BIGINT) AS pk_and,
           CAST(bit_or(l_partkey)  AS BIGINT) AS pk_or,
           CAST(bit_xor(l_partkey) AS BIGINT) AS pk_xor,
           CAST(bit_xor((l_orderkey % 1000000007) * 2654435761) AS BIGINT)
             AS ok_mix_xor
    FROM lineitem GROUP BY l_linestatus
    """,
    doc="Bitwise aggregates (bit_and/bit_or/bit_xor): order-independent "
        "by algebra, so they partial-aggregate map-side for free. The "
        "xor-of-multiplied-keys column is the classic order-insensitive "
        "set checksum used to verify replication/backfills without "
        "sorting — a useful primitive at 100 TB where sorting to "
        "compare is unaffordable. The key is reduced mod 1e9+7 BEFORE "
        "the Knuth-constant multiply so the product stays under 2^63 "
        "for ANY key magnitude — the unreduced form overflows BIGINT "
        "(an ANSI-mode error, a silent wrap elsewhere) once orderkeys "
        "pass ~3.5e9, i.e. exactly at the scale this checksum exists "
        "for",
)
def bitwise_agg_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_linestatus").agg(
        F.bit_and("l_partkey").cast("long").alias("pk_and"),
        F.bit_or("l_partkey").cast("long").alias("pk_or"),
        F.bit_xor("l_partkey").cast("long").alias("pk_xor"),
        F.bit_xor(
            (F.col("l_orderkey") % F.lit(1000000007)) * F.lit(2654435761)
        ).cast("long").alias("ok_mix_xor"),
    )


@register(
    "median_iqr_pack",
    """
    SELECT l_returnflag,
           round(quantile_cont(l_quantity, 0.5), 6)  AS qty_median,
           round(quantile_cont(l_quantity, 0.25), 6) AS qty_q1,
           round(quantile_cont(l_quantity, 0.75), 6) AS qty_q3,
           round(quantile_cont(l_quantity, 0.75)
                 - quantile_cont(l_quantity, 0.25), 6) AS qty_iqr
    FROM lineitem GROUP BY l_returnflag
    """,
    doc="Exact median + interquartile range per group (the robust "
        "dispersion profile dq checks use where stddev is outlier-"
        "fragile). Spark `percentile` == DuckDB `quantile_cont` (linear "
        "interpolation on the sorted set). Exact percentiles sort "
        "per-group; the 100 TB path swaps in approx_percentile with "
        "bounded error (see approx_percentile_profile) — this entry is "
        "the exactness anchor the approximation is measured against",
)
def median_iqr_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    q = lambda p: F.percentile("l_quantity", F.lit(p))  # noqa: E731
    return li.groupBy("l_returnflag").agg(
        F.round(q(0.5), 6).alias("qty_median"),
        F.round(q(0.25), 6).alias("qty_q1"),
        F.round(q(0.75), 6).alias("qty_q3"),
        F.round(q(0.75) - q(0.25), 6).alias("qty_iqr"),
    )


@register(
    "mode_top1_per_group",
    """
    SELECT o_orderpriority, o_orderstatus AS mode_status, cnt
    FROM (
      SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt,
             row_number() OVER (PARTITION BY o_orderpriority
                                ORDER BY COUNT(*) DESC, o_orderstatus) AS rn
      FROM orders GROUP BY o_orderpriority, o_orderstatus
    ) t WHERE rn = 1
    """,
    doc="Deterministic mode per group: count + row_number with a value "
        "tiebreak, NOT native mode() — both engines leave mode()'s tie "
        "order implementation-defined, the exact nondeterminism the "
        "parity gate exists to catch. Plan: one (group, value) shuffle "
        "of count partials, then a window over the tiny distinct set",
)
def mode_top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderpriority", "o_orderstatus").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("cnt").desc(), "o_orderstatus"
    )
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderpriority",
            F.col("o_orderstatus").alias("mode_status"),
            "cnt",
        )
    )


@register(
    "moving_agg_rows_frame",
    """
    SELECT o_custkey, o_orderkey,
           CAST(n_in_frame AS BIGINT) AS n_in_frame,
           CAST(sum_4 AS DECIMAL(18,2)) AS sum_4,
           CAST(sum_4 AS DOUBLE) / n_in_frame AS avg_4,
           CAST(min_4 AS DECIMAL(18,2)) AS min_4,
           CAST(max_4 AS DECIMAL(18,2)) AS max_4
    FROM (
      SELECT o_custkey, o_orderkey,
             COUNT(*) OVER w AS n_in_frame,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS sum_4,
             MIN(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS min_4,
             MAX(CAST(o_totalprice AS DECIMAL(18,2))) OVER w AS max_4
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
    ) t
    """,
    doc="BOUNDED sliding rows frame (moving sum/avg/min/max over the "
        "last 4 orders per customer) — every other registered window "
        "uses an unbounded running frame; the bounded frame exercises "
        "the sliding-buffer executor path (Spark) vs segment trees "
        "(DuckDB), where FP addition order differs — hence DECIMAL "
        "sums (exact, order-free) and the avg as BIGINT-count IEEE "
        "division. One custkey window shuffle, frame state is O(4)",
)
def moving_agg_rows_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(-3, Window.currentRow)
    )
    amt = F.col("o_totalprice").cast(AMOUNT)
    framed = o.select(
        "o_custkey",
        "o_orderkey",
        F.count(F.lit(1)).over(w).alias("n_in_frame"),
        F.sum(amt).over(w).alias("sum_4"),
        F.min(amt).over(w).alias("min_4"),
        F.max(amt).over(w).alias("max_4"),
    )
    return framed.select(
        "o_custkey",
        "o_orderkey",
        F.col("n_in_frame").cast("long").alias("n_in_frame"),
        F.col("sum_4").cast(AMOUNT).alias("sum_4"),
        (F.col("sum_4").cast("double") / F.col("n_in_frame")).alias("avg_4"),
        F.col("min_4").cast(AMOUNT).alias("min_4"),
        F.col("max_4").cast(AMOUNT).alias("max_4"),
    )


@register(
    "running_distinct_count",
    """
    SELECT event_id, user_id,
           CAST(SUM(is_first) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS distinct_types_so_far
    FROM (
      SELECT event_id, user_id, ts,
             CASE WHEN row_number() OVER (
               PARTITION BY user_id, event_type ORDER BY ts, event_id
             ) = 1 THEN 1 ELSE 0 END AS is_first
      FROM events
    ) t
    """,
    doc="COUNT(DISTINCT) OVER a running window — which neither engine "
        "supports natively — via the standard rewrite: flag each "
        "(user, event_type)'s FIRST occurrence with row_number, then "
        "running-SUM the flags. Two window passes over the same "
        "user-keyed shuffle (Catalyst reuses the exchange when the "
        "partition key matches); integer flags, so cross-engine exact. "
        "The 100 TB property: state per row is one bit, vs the naive "
        "per-frame set materialization that is quadratic in frame size",
)
def running_distinct_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w_first = Window.partitionBy("user_id", "event_type").orderBy(
        "ts", "event_id"
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = e.select(
        "event_id",
        "user_id",
        "ts",
        F.when(F.row_number().over(w_first) == 1, 1).otherwise(0).alias(
            "is_first"
        ),
    )
    return flagged.select(
        "event_id",
        "user_id",
        F.sum("is_first").over(w_run).cast("long").alias(
            "distinct_types_so_far"
        ),
    )


@register(
    "approx_distinct_kmv",
    """
    WITH h AS (
      SELECT DISTINCT l_linestatus,
             CAST(('0x' || substr(md5(CAST(l_partkey AS VARCHAR)), 1, 8))
                  AS BIGINT) AS hv
      FROM lineitem
    ), ranked AS (
      SELECT l_linestatus, hv,
             row_number() OVER (PARTITION BY l_linestatus ORDER BY hv) AS rk,
             COUNT(*) OVER (PARTITION BY l_linestatus) AS n_distinct_hashes
      FROM h
    )
    SELECT l_linestatus,
           CAST(n_distinct_hashes AS BIGINT) AS n_distinct_hashes,
           CAST(hv AS BIGINT) AS kth_hash,
           CASE WHEN n_distinct_hashes >= 64
                THEN CAST(63 * 4294967296.0 / hv AS DOUBLE)
                ELSE CAST(n_distinct_hashes AS DOUBLE) END AS est_distinct
    FROM ranked WHERE rk = least(64, n_distinct_hashes)
    """,
    doc="K-minimum-values distinct sketch (k=64) over md5 — unlike HLL "
        "(whose register layout is engine-private, hence the rows-only "
        "approx_count_distinct), KMV on a portable hash is "
        "DETERMINISTIC: both engines compute identical sketches, so "
        "this sketch entry carries a full oracle hash check. Estimator "
        "(k-1)/u_k with u_k = k-th smallest hash normalized by 2^32; "
        "below k distinct values the sketch IS the exact count. The "
        "sketch is mergeable (union = k smallest of the union), which "
        "is what makes it a partial-aggregatable distinct count at "
        "100 TB and a bounded state for streaming distinct",
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    hv = F.conv(
        F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    h = li.select("l_linestatus", hv.alias("hv")).distinct()
    w_rank = Window.partitionBy("l_linestatus").orderBy("hv")
    w_all = Window.partitionBy("l_linestatus")
    ranked = h.select(
        "l_linestatus",
        "hv",
        F.row_number().over(w_rank).alias("rk"),
        F.count(F.lit(1)).over(w_all).alias("n_distinct_hashes"),
    )
    k = F.least(F.lit(64), F.col("n_distinct_hashes"))
    return ranked.filter(F.col("rk") == k).select(
        "l_linestatus",
        F.col("n_distinct_hashes").cast("long").alias("n_distinct_hashes"),
        F.col("hv").cast("long").alias("kth_hash"),
        F.when(
            F.col("n_distinct_hashes") >= 64,
            (F.lit(63) * F.lit(4294967296.0) / F.col("hv")).cast("double"),
        )
        .otherwise(F.col("n_distinct_hashes").cast("double"))
        .alias("est_distinct"),
    )


@register(
    "full_outer_reconcile",
    """
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             COUNT(*) AS order_cnt
      FROM orders GROUP BY 1
    ), l AS (
      SELECT CAST(l_shipdate AS DATE) AS day,
             COUNT(*) AS line_cnt
      FROM lineitem GROUP BY 1
    )
    SELECT coalesce(o.day, l.day) AS day,
           CAST(coalesce(o.order_cnt, 0) AS BIGINT) AS order_cnt,
           CAST(coalesce(l.line_cnt, 0) AS BIGINT) AS line_cnt,
           CASE WHEN o.day IS NULL THEN 'ship_only'
                WHEN l.day IS NULL THEN 'order_only'
                ELSE 'both' END AS presence
    FROM o FULL OUTER JOIN l ON l.day = o.day
    """,
    doc="FULL OUTER reconciliation — the two-system audit shape "
        "(orders-by-day vs shipments-by-day, which days exist on only "
        "one side) and the one outer-join variant no other registered "
        "query exercises. Both inputs pre-aggregate to day grain "
        "BEFORE the join, so the full-outer shuffle moves day-sized "
        "tables, not facts — at 100 TB that ordering is the difference "
        "between a KB-scale join and a fact-scale one",
)
def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("order_cnt"))
    )
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_shipdate").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).alias("line_cnt"))
    )
    j = o.join(li, "day", "full_outer")
    return j.select(
        "day",
        F.coalesce("order_cnt", F.lit(0)).cast("long").alias("order_cnt"),
        F.coalesce("line_cnt", F.lit(0)).cast("long").alias("line_cnt"),
        F.when(F.col("order_cnt").isNull(), "ship_only")
        .when(F.col("line_cnt").isNull(), "order_only")
        .otherwise("both")
        .alias("presence"),
    )


@register(
    "not_in_null_semantics",
    """
    SELECT
      (SELECT COUNT(*) FROM customer
       WHERE c_nationkey NOT IN
         (SELECT nullif(n_nationkey, 3) FROM nation)) AS cnt_with_null,
      (SELECT COUNT(*) FROM customer
       WHERE c_nationkey NOT IN
         (SELECT nullif(n_nationkey, 3) FROM nation
          WHERE nullif(n_nationkey, 3) IS NOT NULL)) AS cnt_null_filtered
    """,
    doc="NOT IN three-valued-logic trap, pinned cross-engine: when the "
        "subquery list contains a NULL, `x NOT IN (...)` is never TRUE "
        "(x <> NULL is UNKNOWN), so cnt_with_null is 0 no matter the "
        "data — the single most common silent-wrong-answer migration "
        "bug from engines/code that treated NOT IN as an anti-join. "
        "The null-filtered twin column shows the intended count. "
        "Spark plans the null-aware case as a special anti join "
        "(NAAJ); writing the filter explicitly is what keeps the plan "
        "a plain broadcast anti join at scale",
)
def not_in_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    c.createOrReplaceTempView("__niv_customer")
    n.createOrReplaceTempView("__niv_nation")
    return spark.sql(
        """
        SELECT
          (SELECT COUNT(*) FROM __niv_customer
           WHERE c_nationkey NOT IN
             (SELECT nullif(n_nationkey, 3) FROM __niv_nation))
            AS cnt_with_null,
          (SELECT COUNT(*) FROM __niv_customer
           WHERE c_nationkey NOT IN
             (SELECT nullif(n_nationkey, 3) FROM __niv_nation
              WHERE nullif(n_nationkey, 3) IS NOT NULL))
            AS cnt_null_filtered
        """
    )


@register(
    "variant_json_extract",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS INTEGER) AS k_int,
           CAST(CAST(json_extract(props, '$.k') AS INTEGER) % 10 = 0
                AS BOOLEAN) AS k_decade
    FROM events
    """,
    doc="Semi-structured access through Spark 4's VARIANT type "
        "(parse_json -> variant_get) rather than per-query string "
        "parsing — VARIANT parses once into a binary form that "
        "downstream accesses reuse, the engine-native answer to "
        "schema-on-read JSON at scale (the json_extract_typed entry is "
        "the classic get_json_object twin of the same access). Typed "
        "extraction (`$.k` as int) casts inside the variant reader",
)
def variant_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "int")
    return e.select(
        "event_id",
        k.alias("k_int"),
        (k % 10 == 0).alias("k_decade"),
    )


@register(
    "try_arithmetic_pack",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_linenumber - 1 = 0 THEN NULL
                ELSE CAST(l_quantity AS DOUBLE) / (l_linenumber - 1) END
             AS qty_per_prev_line,
           try_cast(l_returnflag AS INTEGER) AS rflag_as_int,
           try_cast(CAST(l_linenumber AS VARCHAR) || '0' AS INTEGER)
             AS synth_int,
           CASE WHEN l_quantity >= 0
                THEN CAST(floor(sqrt(CAST(l_quantity AS DOUBLE)))
                          AS BIGINT) END AS qty_isqrt
    FROM lineitem
    """,
    doc="NULL-on-failure arithmetic — the Spark 4 ANSI-mode migration "
        "surface: under ANSI (ON in any vanilla Spark 4 session), bare "
        "division by zero and failed casts THROW, so production "
        "expressions must be try_divide/try_cast or explicit guards. "
        "This entry pins the try_* semantics cross-engine (DuckDB "
        "try_cast matches; try_divide is stated as the explicit "
        "zero-guard CASE both engines agree on; the failing cast column "
        "proves NULL-not-throw, the succeeding one proves values). The "
        "verify-recipe "
        "gotcha ('any cast that can fail must be try_cast') as a "
        "registered, hash-checked contract instead of tribal knowledge",
)
def try_arithmetic_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_quantity").cast("double"), F.col("l_linenumber") - 1
        ).alias("qty_per_prev_line"),
        F.try_to_number("l_returnflag", F.lit("999")).cast("int").alias(
            "rflag_as_int"
        ),
        F.try_to_number(
            F.concat(F.col("l_linenumber").cast("string"), F.lit("0")),
            F.lit("999"),
        ).cast("int").alias("synth_int"),
        F.when(
            F.col("l_quantity") >= 0,
            F.floor(F.sqrt(F.col("l_quantity").cast("double"))).cast("long"),
        ).alias("qty_isqrt"),
    )


@register(
    "yoy_growth_accounts",
    """
    WITH yearly AS (
      SELECT o_custkey, CAST(strftime(o_orderdate, '%Y') AS INTEGER) AS yr,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS spend
      FROM orders GROUP BY 1, 2
    )
    SELECT o_custkey, yr,
           CAST(spend AS DECIMAL(18,2)) AS spend,
           CAST(prev_spend AS DECIMAL(18,2)) AS prev_spend,
           CASE WHEN prev_yr = yr - 1 AND prev_spend > 0
                THEN CAST(spend AS DOUBLE) / CAST(prev_spend AS DOUBLE)
           END AS yoy_ratio
    FROM (
      SELECT o_custkey, yr, spend,
             lag(spend) OVER w AS prev_spend,
             lag(yr)    OVER w AS prev_yr
      FROM yearly
      WINDOW w AS (PARTITION BY o_custkey ORDER BY yr)
    ) t
    """,
    doc="Year-over-year account growth — the classic warehouse KPI "
        "shape: aggregate to (customer, year) grain FIRST (decimal-"
        "exact), then lag within customer ordered by year, with the "
        "adjacent-year guard (a gap year yields NULL, not a bogus "
        "multi-year ratio — the correctness detail naive lag misses). "
        "One (custkey, yr) aggregation shuffle; the window rides the "
        "same custkey partitioning",
)
def yoy_growth_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    yearly = o.groupBy(
        "o_custkey", F.year("o_orderdate").alias("yr")
    ).agg(F.sum(F.col("o_totalprice").cast(AMOUNT)).cast(AMOUNT).alias("spend"))
    w = Window.partitionBy("o_custkey").orderBy("yr")
    lagged = yearly.select(
        "o_custkey",
        "yr",
        "spend",
        F.lag("spend").over(w).alias("prev_spend"),
        F.lag("yr").over(w).alias("prev_yr"),
    )
    return lagged.select(
        "o_custkey",
        "yr",
        F.col("spend").cast(AMOUNT).alias("spend"),
        F.col("prev_spend").cast(AMOUNT).alias("prev_spend"),
        F.when(
            (F.col("prev_yr") == F.col("yr") - 1) & (F.col("prev_spend") > 0),
            F.col("spend").cast("double") / F.col("prev_spend").cast("double"),
        ).alias("yoy_ratio"),
    )


@register(
    "wau_rolling_distinct",
    """
    WITH active AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
    ), replicated AS (
      SELECT CAST(day + INTERVAL (o.off) DAY AS DATE) AS window_day,
             user_id
      FROM active
      CROSS JOIN (SELECT unnest(range(0, 7)) AS off) o
    ), bounds AS (
      SELECT MIN(CAST(ts AS DATE)) AS min_day,
             MAX(CAST(ts AS DATE)) AS max_day
      FROM events
    )
    SELECT r.window_day,
           CAST(COUNT(DISTINCT r.user_id) AS BIGINT) AS wau
    FROM replicated r, bounds b
    WHERE r.window_day BETWEEN b.min_day AND b.max_day
    GROUP BY r.window_day
    """,
    doc="Rolling 7-day distinct users (WAU) — the engagement KPI that "
        "needs a SLIDING DISTINCT, which windowed count_distinct "
        "cannot express: each (day, user) activity row replicates into "
        "the 7 window-days it contributes to (map-side 7x fan-out of "
        "the already-distinct day-grain table, NOT of raw events), "
        "then one exact count_distinct per window day. At 100 TB the "
        "fan-out input is |days x active users|, orders smaller than "
        "the event stream; the distinct is one (window_day) shuffle "
        "with partial distinct. Trailing semantics: day d counts users "
        "active in (d-6 .. d]; days past the data edge are clipped",
)
def wau_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    active = e.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    replicated = active.select(
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("off"),
        "day",
        "user_id",
    ).select(
        F.date_add(F.col("day"), F.col("off")).alias("window_day"),
        "user_id",
    )
    bounds = e.agg(
        F.min(F.col("ts").cast("date")).alias("min_day"),
        F.max(F.col("ts").cast("date")).alias("max_day"),
    )
    return (
        replicated.crossJoin(F.broadcast(bounds))
        .filter(F.col("window_day").between(F.col("min_day"), F.col("max_day")))
        .groupBy("window_day")
        .agg(F.count_distinct("user_id").cast("long").alias("wau"))
    )


@register(
    "skewed_distinct_two_phase",
    """
    SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events GROUP BY event_type
    """,
    doc="Two-phase COUNT(DISTINCT) under group-key skew: phase 1 "
        "distincts (group, salt, user) partitions — the hot group's "
        "distinct work spreads across 16 salt buckets instead of one "
        "reducer — phase 2 merges per-salt distinct counts (exact: "
        "salting by hash(user) makes per-salt user sets DISJOINT, so "
        "counts ADD). The oracle is the plain single-phase distinct, "
        "proving the rewrite result-identical — same proof pattern as "
        "skew_salted_join / skewed_window_two_phase. A 5-value "
        "event_type over 10^9 users serializes into 5 reducers "
        "without this; with it, parallelism is |groups| x 16",
)
def skewed_distinct_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    salted = e.select(
        "event_type",
        F.pmod(F.xxhash64("user_id"), F.lit(16)).alias("salt"),
        "user_id",
    )
    per_salt = (
        salted.groupBy("event_type", "salt")
        .agg(F.count_distinct("user_id").alias("nd"))
    )
    return per_salt.groupBy("event_type").agg(
        F.sum("nd").cast("long").alias("n_users")
    )


@register(
    "month_end_clamp_pack",
    """
    SELECT o_orderkey,
           CAST(d AS DATE) AS order_day,
           CAST(d + INTERVAL 1 MONTH AS DATE) AS next_month,
           CAST(d - INTERVAL 1 MONTH AS DATE) AS prev_month,
           last_day(d) AS month_end,
           d = last_day(d) AS is_month_end
    FROM (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders) t
    """,
    doc="Month-arithmetic clamping pinned cross-engine: Jan 31 + 1 "
        "month = Feb 29 (clamp to target month end) in BOTH Spark "
        "add_months and DuckDB interval addition — but only because "
        "both clamp; engines that overflow into March silently shift "
        "every month-end billing row. last_day and the is-month-end "
        "flag ride along (the month-grain partition boundary used by "
        "retention/billing rollups)",
)
def month_end_clamp_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        d.alias("order_day"),
        F.add_months(d, 1).alias("next_month"),
        F.add_months(d, -1).alias("prev_month"),
        F.last_day(d).alias("month_end"),
        (d == F.last_day(d)).alias("is_month_end"),
    )


@register(
    "array_setops_pack",
    r"""
    WITH t AS (
      SELECT doc_id,
             list_distinct(CASE WHEN trim(text) = ''
                  THEN CAST([] AS VARCHAR[])
                  ELSE regexp_split_to_array(trim(lower(text)), '\s+') END)
               AS toks,
             list_distinct(regexp_split_to_array(
               'the scan join order window batch', ' ')) AS probe
      FROM documents
    )
    SELECT doc_id,
           coalesce(array_to_string(list_sort(list_intersect(toks, probe)),
             ','), '') AS inter_csv,
           coalesce(array_to_string(list_sort(list_filter(toks,
             x -> NOT list_contains(probe, x))), ','), '') AS minus_csv,
           CAST(len(list_intersect(toks, probe)) AS BIGINT) AS n_common
    FROM t
    """,
    doc="Array set operations (intersect / except over per-doc token "
        "sets vs a probe vocabulary) — surfaced as SORTED CSV strings "
        "because the engines' native set ops disagree on element ORDER "
        "(Spark preserves first-argument order, DuckDB does not "
        "guarantee one): sort-then-join is the only hashable contract. "
        "All in-row higher-order functions, no shuffle",
)
def array_setops_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = F.array_distinct(
        F.when(F.trim("text") == "", F.array()).otherwise(
            F.split(F.trim(F.lower(F.col("text"))), r"\s+")
        )
    )
    probe = F.array_distinct(
        F.split(F.lit("the scan join order window batch"), " ")
    )
    with_sets = d.select(
        "doc_id",
        toks.alias("toks"),
        probe.alias("probe"),
    )
    inter = F.array_sort(F.array_intersect("toks", "probe"))
    minus = F.array_sort(F.array_except("toks", "probe"))
    return with_sets.select(
        "doc_id",
        F.array_join(inter, ",").alias("inter_csv"),
        F.array_join(minus, ",").alias("minus_csv"),
        F.size(F.array_intersect("toks", "probe")).cast("long").alias(
            "n_common"
        ),
    )


@register(
    "window_nth_lead_pack",
    """
    SELECT o_custkey, o_orderkey,
           nth_value(o_orderkey, 3) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS third_order_so_far,
           lead(o_orderkey, 1, -1) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS next_order_or_sentinel,
           lead(o_orderkey, 2) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
           ) AS order_after_next
    FROM orders
    """,
    doc="nth_value + lead-with-default — the two navigation functions "
        "the window packs hadn't pinned. nth_value runs over the "
        "RUNNING frame (NULL until the partition's 3rd row arrives — "
        "frame-sensitivity is the classic porting bug: the default "
        "full-partition frame would backfill it); lead's explicit "
        "default (-1) vs NULL-default two-step lead shows both "
        "out-of-partition behaviors. Deterministic order keys, one "
        "custkey window shuffle",
)
def window_nth_lead_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        F.nth_value("o_orderkey", 3).over(w_run).alias("third_order_so_far"),
        F.lead("o_orderkey", 1, -1).over(w).alias("next_order_or_sentinel"),
        F.lead("o_orderkey", 2).over(w).alias("order_after_next"),
    )


@register(
    "scan_lineage_per_file",
    """
    SELECT 'lineitem.parquet' AS file_name,
           CAST(COUNT(*) AS BIGINT) AS n_rows
    FROM lineitem
    """,
    doc="Scan lineage via METADATA COLUMNS: rows-per-source-file from "
        "Spark's hidden _metadata.file_name (DuckDB: the filename "
        "option) — the zero-cost provenance an ingest audit needs "
        "(which shard produced these rows) without writing a lineage "
        "column into the data. The oracle pins the testdata layout's "
        "known basename plus the per-file count, so the metadata VALUE "
        "is verified, not just its presence (the oracle's view surface "
        "cannot read filenames itself)",
)
def scan_lineage_per_file(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.select(F.col("_metadata.file_name").alias("file_name"))
        .groupBy("file_name")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )


@register(
    "share_of_parent_rollup",
    """
    WITH leaf AS (
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
    )
    SELECT l_returnflag, l_linestatus,
           CAST(qty AS DECIMAL(18,2)) AS qty,
           CAST(qty AS DOUBLE)
             / CAST(SUM(qty) OVER (PARTITION BY l_returnflag) AS DOUBLE)
             AS share_of_flag,
           CAST(qty AS DOUBLE) / CAST(SUM(qty) OVER () AS DOUBLE)
             AS share_of_total
    FROM leaf
    """,
    doc="Share-of-parent analytics: leaf aggregate once (decimal-"
        "exact), then ratio-to-parent and ratio-to-grand-total via windows OVER "
        "THE AGGREGATE — the drill-down report shape. The empty-frame "
        "SUM() OVER () runs on the already-reduced leaf table (tens of "
        "rows), never the fact; computing shares by re-scanning per "
        "level would read the fact once per hierarchy level",
)
def share_of_parent_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    leaf = li.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast(AMOUNT)).cast(AMOUNT).alias("qty")
    )
    w_flag = Window.partitionBy("l_returnflag")
    w_all = Window.partitionBy()
    return leaf.select(
        "l_returnflag",
        "l_linestatus",
        F.col("qty").cast(AMOUNT).alias("qty"),
        (
            F.col("qty").cast("double")
            / F.sum("qty").over(w_flag).cast("double")
        ).alias("share_of_flag"),
        (
            F.col("qty").cast("double")
            / F.sum("qty").over(w_all).cast("double")
        ).alias("share_of_total"),
    )


@register(
    "moment_stats_manual",
    """
    WITH sums AS (
      SELECT l_returnflag,
             COUNT(*) AS n,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))
                      * CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s2,
             CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))
                      * CAST(l_quantity AS DECIMAL(38,6))
                      * CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS s3
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, CAST(n AS BIGINT) AS n,
           round(s1 / n, 9) AS mean_qty,
           round(s2 / n - (s1 / n) * (s1 / n), 9) AS var_pop,
           round(
             (s3 / n - 3 * (s1 / n) * (s2 / n) + 2
              * (s1 / n) * (s1 / n) * (s1 / n))
             / pow(s2 / n - (s1 / n) * (s1 / n), 1.5), 9) AS skew_pop
    FROM sums
    """,
    doc="Population mean/variance/skewness from RAW POWER SUMS "
        "(sum x, x^2, x^3 in exact DECIMAL, moments derived in double "
        "from the exact sums) — the one-pass MERGEABLE formulation: "
        "power sums partial-aggregate map-side and ADD across "
        "partitions/partials, which is how a 100 TB profile computes "
        "higher moments in a single scan. Native skewness()/kurtosis() "
        "differ between engines (sample vs population corrections); "
        "deriving from exact sums pins ONE definition bit-identically. "
        "round(9) absorbs the last-ulp of pow(x, 1.5)",
)
def moment_stats_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    li = load_table(spark, sf_dir, "lineitem")
    q = F.col("l_quantity").cast(DecimalType(38, 6))
    sums = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(q).cast("double").alias("s1"),
        F.sum(q * q).cast("double").alias("s2"),
        F.sum(q * q * q).cast("double").alias("s3"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n")
    m3 = F.col("s3") / F.col("n")
    var_pop = m2 - m1 * m1
    return sums.select(
        "l_returnflag",
        F.col("n").cast("long").alias("n"),
        F.round(m1, 9).alias("mean_qty"),
        F.round(var_pop, 9).alias("var_pop"),
        F.round(
            (m3 - F.lit(3) * m1 * m2 + F.lit(2) * m1 * m1 * m1)
            / F.pow(var_pop, F.lit(1.5)),
            9,
        ).alias("skew_pop"),
    )


@register(
    "rfm_customer_segments",
    """
    WITH cust AS (
      SELECT o_custkey,
             MAX(CAST(o_orderdate AS DATE)) AS last_order,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS monetary
      FROM orders GROUP BY o_custkey
    )
    SELECT o_custkey, last_order,
           CAST(frequency AS BIGINT) AS frequency,
           CAST(monetary AS DECIMAL(18,2)) AS monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM (
      SELECT *,
             ntile(5) OVER (ORDER BY last_order, o_custkey) AS r_score,
             ntile(5) OVER (ORDER BY frequency, o_custkey) AS f_score,
             ntile(5) OVER (ORDER BY monetary, o_custkey) AS m_score
      FROM cust
    ) t
    """,
    doc="RFM customer segmentation — the classic CRM shape: per-"
        "customer recency/frequency/monetary aggregates (decimal-"
        "exact), then quintile scores via ntile with custkey "
        "tie-breaks (engines order ties differently; an undetermined "
        "tie order flips segment labels). The global ntile runs over "
        "the CUSTOMER aggregate (one row per customer), not the fact "
        "— at 10^9 customers swap ntile for approx-quantile cutoffs "
        "joined back, same labels within sketch error",
)
def rfm_customer_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.max(F.col("o_orderdate").cast("date")).alias("last_order"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum(F.col("o_totalprice").cast(AMOUNT)).cast(AMOUNT).alias(
            "monetary"
        ),
    )
    r = F.ntile(5).over(Window.orderBy("last_order", "o_custkey"))
    fr = F.ntile(5).over(Window.orderBy("frequency", "o_custkey"))
    mo = F.ntile(5).over(Window.orderBy("monetary", "o_custkey"))
    scored = cust.select(
        "o_custkey",
        "last_order",
        F.col("frequency").cast("long").alias("frequency"),
        F.col("monetary").cast(AMOUNT).alias("monetary"),
        r.alias("r_score"),
        fr.alias("f_score"),
        mo.alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register(
    "basket_part_pairs_top50",
    """
    SELECT p_a, p_b, CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM (
      SELECT DISTINCT a.l_orderkey,
             a.l_partkey AS p_a, b.l_partkey AS p_b
      FROM lineitem a JOIN lineitem b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
    ) pairs
    GROUP BY p_a, p_b
    ORDER BY n_orders DESC, p_a, p_b LIMIT 50
    """,
    doc="Market-basket co-occurrence: part pairs appearing in the same "
        "order, top-50 by support with deterministic tie-breaks. The "
        "self-join fans out quadratically ONLY within an order (TPC-H "
        "baskets hold ~4 lines, so the blow-up is bounded ~16x per "
        "order regardless of table size — same per-group-bounded "
        "pattern as the LSH band join); one orderkey co-located "
        "self-join + one pair shuffle + TakeOrdered",
)
def basket_part_pairs_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    a = li.select("l_orderkey", F.col("l_partkey").alias("p_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p_a") < F.col("p_b"))
        .select("l_orderkey", "p_a", "p_b")
        .distinct()
    )
    return (
        pairs.groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).cast("long").alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), "p_a", "p_b")
        .limit(50)
    )


@register(
    "activity_heatmap_dow_hour",
    """
    SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INTEGER) AS dow_sun1,
           CAST(hour(ts) AS INTEGER) AS hr,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
    FROM events
    GROUP BY 1, 2
    """,
    doc="Day-of-week x hour activity heatmap — the ops-dashboard grid: "
        "one (dow, hour) shuffle over 168 cells with map-side partials "
        "plus an exact per-cell distinct. The dow convention is the "
        "datetime pack's pinned shift (Spark Sunday=1 vs DuckDB "
        "Sunday=0); hour() is UTC-pinned by the session timezone, so "
        "both engines bucket identically",
)
def activity_heatmap_dow_hour(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.dayofweek(F.col("ts").cast("date")).alias("dow_sun1"),
            F.hour("ts").cast("int").alias("hr"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.count_distinct("user_id").cast("long").alias("n_users"),
        )
    )


@register(
    "pareto_revenue_concentration",
    """
    WITH cust AS (
      SELECT o_custkey,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(18,2)) AS spend
      FROM orders GROUP BY o_custkey
    ), tot AS (
      SELECT CAST(SUM(spend) AS DECIMAL(18,2)) AS total,
             COUNT(*) AS n_cust
      FROM cust
    )
    SELECT o_custkey,
           CAST(spend AS DECIMAL(18,2)) AS spend,
           rk,
           CAST(rk AS DOUBLE) / n_cust AS cust_share,
           CAST(cum_spend AS DOUBLE) / CAST(total AS DOUBLE) AS rev_share,
           CAST(cum_spend AS DOUBLE) / CAST(total AS DOUBLE) <= 0.8
             AS in_top80
    FROM (
      SELECT o_custkey, spend,
             row_number() OVER w AS rk,
             CAST(SUM(spend) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                   AND CURRENT ROW) AS DECIMAL(18,2))
               AS cum_spend
      FROM cust
      WINDOW w AS (ORDER BY spend DESC, o_custkey)
    ) ranked CROSS JOIN tot
    """,
    doc="Pareto / Lorenz revenue concentration — 'which customers "
        "drive 80% of revenue': rank customers by spend (deterministic "
        "custkey tie-break), decimal-exact running revenue vs the "
        "1-row broadcast total, shares via IEEE division. The global "
        "window runs over the CUSTOMER aggregate (one row each), and "
        "at 10^9 customers becomes the two-phase chunked rewrite "
        "skewed_window_two_phase already proves",
)
def pareto_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    cust = o.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast(AMOUNT)).cast(AMOUNT).alias("spend")
    )
    tot = cust.agg(
        F.sum("spend").cast(AMOUNT).alias("total"),
        F.count(F.lit(1)).alias("n_cust"),
    )
    w = Window.orderBy(F.col("spend").desc(), "o_custkey")
    w_run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = cust.select(
        "o_custkey",
        F.col("spend").cast(AMOUNT).alias("spend"),
        F.row_number().over(w).alias("rk"),
        F.sum("spend").over(w_run).cast(AMOUNT).alias("cum_spend"),
    )
    rev_share = F.col("cum_spend").cast("double") / F.col("total").cast(
        "double"
    )
    return ranked.crossJoin(F.broadcast(tot)).select(
        "o_custkey",
        "spend",
        "rk",
        (F.col("rk").cast("double") / F.col("n_cust")).alias("cust_share"),
        rev_share.alias("rev_share"),
        (rev_share <= 0.8).alias("in_top80"),
    )


@register(
    "rolling_zscore_anomaly",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1
    ), framed AS (
      SELECT day, n,
             COUNT(*) OVER w AS w_n,
             CAST(SUM(CAST(n AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s1,
             CAST(SUM(CAST(n AS DECIMAL(38,6))
                      * CAST(n AS DECIMAL(38,6))) OVER w AS DOUBLE) AS s2
      FROM daily
      WINDOW w AS (ORDER BY day ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
    )
    SELECT day, CAST(n AS BIGINT) AS n,
           CAST(w_n AS BIGINT) AS w_n,
           round(CASE WHEN w_n >= 3 AND s2 / w_n - (s1 / w_n) * (s1 / w_n) > 0
                THEN (n - s1 / w_n)
                     / sqrt(s2 / w_n - (s1 / w_n) * (s1 / w_n)) END, 9)
             AS zscore,
           coalesce(abs(CASE WHEN w_n >= 3
                          AND s2 / w_n - (s1 / w_n) * (s1 / w_n) > 0
                THEN (n - s1 / w_n)
                     / sqrt(s2 / w_n - (s1 / w_n) * (s1 / w_n)) END) > 2,
             FALSE) AS is_anomaly
    FROM framed
    """,
    doc="Rolling z-score anomaly detection over the daily event series: "
        "trailing-7-day mean/std from DECIMAL-EXACT power sums in a "
        "bounded window frame (the moment_stats_manual trick composed "
        "with moving_agg_rows_frame's frame discipline — FP sums in a "
        "sliding frame are engine-order-dependent, exact sums are not), "
        "z in double via IEEE division and correctly-rounded sqrt. The "
        "frame EXCLUDES the current row (1 PRECEDING) so a spike can't "
        "mask itself by inflating its own baseline. Window runs over "
        "the day-grain aggregate, never the event stream",
)
def rolling_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.types import DecimalType

    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.count(F.lit(1)).alias("n")
    )
    nd = F.col("n").cast(DecimalType(38, 6))
    w = Window.orderBy("day").rowsBetween(-7, -1)
    framed = daily.select(
        "day",
        "n",
        F.count(F.lit(1)).over(w).alias("w_n"),
        F.sum(nd).over(w).cast("double").alias("s1"),
        F.sum(nd * nd).over(w).cast("double").alias("s2"),
    )
    m = F.col("s1") / F.col("w_n")
    var = F.col("s2") / F.col("w_n") - m * m
    z = F.when(
        (F.col("w_n") >= 3) & (var > 0), (F.col("n") - m) / F.sqrt(var)
    )
    return framed.select(
        "day",
        F.col("n").cast("long").alias("n"),
        F.col("w_n").cast("long").alias("w_n"),
        F.round(z, 9).alias("zscore"),
        F.coalesce(F.abs(z) > 2, F.lit(False)).alias("is_anomaly"),
    )


@register(
    "gaps_and_islands_daily",
    """
    WITH active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), grouped AS (
      SELECT user_id, day,
             day - CAST(row_number() OVER (
               PARTITION BY user_id ORDER BY day) AS INTEGER) AS island_key
      FROM active
    )
    SELECT user_id,
           MIN(day) AS streak_start,
           MAX(day) AS streak_end,
           CAST(COUNT(*) AS BIGINT) AS streak_days
    FROM grouped
    GROUP BY user_id, island_key
    """,
    doc="Gaps-and-islands: consecutive-active-day streaks per user via "
        "the date-minus-row_number trick (consecutive days share a "
        "constant island key; any gap shifts it) — the streak/retention "
        "shape every engagement system computes, and the set-based "
        "rewrite of what procedural code does with cursors. One "
        "user-keyed window over the (user, day) DISTINCT grain + one "
        "island aggregate; never touches the raw event stream twice",
)
def gaps_and_islands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    active = e.select(
        "user_id", F.col("ts").cast("date").alias("day")
    ).distinct()
    w = Window.partitionBy("user_id").orderBy("day")
    grouped = active.select(
        "user_id",
        "day",
        F.date_sub(F.col("day"), F.row_number().over(w)).alias("island_key"),
    )
    return grouped.groupBy("user_id", "island_key").agg(
        F.min("day").alias("streak_start"),
        F.max("day").alias("streak_end"),
        F.count(F.lit(1)).cast("long").alias("streak_days"),
    ).drop("island_key")


@register(
    "event_transition_matrix",
    """
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
             ) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(*) AS DOUBLE)
             / SUM(COUNT(*)) OVER (PARTITION BY event_type)
             AS p_transition
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
    doc="First-order event-transition matrix (the Markov view of user "
        "behavior: P(next event | current event)): lead within user "
        "ordered by (ts, event_id), pair counts, row-normalized via a "
        "window over the transition AGGREGATE (|types|^2 rows, never "
        "the event stream). One user-keyed window shuffle + one pair "
        "aggregate; probabilities are BIGINT-count IEEE divisions",
)
def event_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "event_type",
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = seq.groupBy(
        F.col("event_type").alias("from_type"),
        F.col("next_type").alias("to_type"),
    ).agg(F.count(F.lit(1)).cast("long").alias("n"))
    w_from = Window.partitionBy("from_type")
    return counts.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w_from)).alias(
            "p_transition"
        ),
    )


@register(
    "relational_division",
    """
    WITH probe AS (SELECT DISTINCT o_orderstatus FROM orders),
    hits AS (
      SELECT DISTINCT o_custkey, o_orderstatus FROM orders
    )
    SELECT o_custkey,
           CAST(COUNT(*) AS BIGINT) AS n_statuses
    FROM hits
    GROUP BY o_custkey
    HAVING COUNT(*) = (SELECT COUNT(*) FROM probe)
    """,
    doc="Relational DIVISION — 'customers with orders in EVERY status', "
        "the classic for-all quantifier SQL has no operator for: "
        "distinct (customer, status) pairs, keep customers whose "
        "distinct-hit count equals the probe cardinality broadcast as "
        "one row (count-match beats nested NOT EXISTS NOT EXISTS — one "
        "aggregate vs two correlated rescans). The probe derives from "
        "the data itself, so the entry is non-vacuous at every SF "
        "(~90% of customers qualify, and not 100% — both directions "
        "proven)",
)
def relational_division(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    probe_n = o.select("o_orderstatus").distinct().agg(
        F.count(F.lit(1)).alias("n_probe")
    )
    hits = o.select("o_custkey", "o_orderstatus").distinct()
    return (
        hits.groupBy("o_custkey")
        .agg(F.count(F.lit(1)).cast("long").alias("n_statuses"))
        .crossJoin(F.broadcast(probe_n))
        .filter(F.col("n_statuses") == F.col("n_probe"))
        .select("o_custkey", "n_statuses")
    )


@register(
    "mad_robust_dispersion",
    """
    WITH med AS (
      SELECT l_returnflag,
             quantile_cont(l_quantity, 0.5) AS med_qty
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l.l_returnflag,
           round(any_value(m.med_qty), 6) AS med_qty,
           round(quantile_cont(abs(l.l_quantity - m.med_qty), 0.5), 6)
             AS mad_qty
    FROM lineitem l JOIN med m ON m.l_returnflag = l.l_returnflag
    GROUP BY l.l_returnflag
    """,
    doc="Median absolute deviation — the robust dispersion measure "
        "(stddev moves with one outlier; MAD needs ~50% contamination): "
        "per-group median, then the median of absolute deviations via "
        "a broadcast join of the tiny median table back onto the scan. "
        "Two exact-percentile passes by construction — MAD is not "
        "one-pass computable; the approx_percentile twin is the "
        "100 TB single-extra-pass path",
)
def mad_robust_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    med = li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("med_qty")
    )
    joined = li.join(F.broadcast(med), "l_returnflag")
    return joined.groupBy("l_returnflag").agg(
        F.round(F.any_value("med_qty"), 6).alias("med_qty"),
        F.round(
            F.percentile(
                F.abs(F.col("l_quantity") - F.col("med_qty")), F.lit(0.5)
            ),
            6,
        ).alias("mad_qty"),
    )


@register(
    "interval_merge_overlaps",
    """
    WITH iv AS (
      SELECT o_custkey,
             CAST(o_orderdate AS DATE) AS s,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 7 DAY AS DATE) AS e
      FROM orders
    ), flagged AS (
      SELECT o_custkey, s, e,
             CASE WHEN s > coalesce(MAX(e) OVER (
               PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
             ), DATE '0001-01-01') THEN 1 ELSE 0 END AS new_island
      FROM iv
    ), grouped AS (
      SELECT o_custkey, s, e,
             SUM(new_island) OVER (
               PARTITION BY o_custkey ORDER BY s, e
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
             ) AS island
      FROM flagged
    )
    SELECT o_custkey, island,
           MIN(s) AS window_start,
           MAX(e) AS window_end,
           CAST(COUNT(*) AS BIGINT) AS n_intervals
    FROM grouped GROUP BY o_custkey, island
    """,
    doc="Merge overlapping intervals (7-day activity windows per "
        "customer): an interval starts a new merged window iff its "
        "start exceeds the running MAX(end) of everything before it — "
        "the running-max formulation handles CONTAINED intervals that "
        "the naive 'compare to previous row' lag approach merges "
        "wrongly. Running sum of new-window flags numbers the islands; "
        "one customer-keyed window shuffle + one island aggregate. The "
        "temporal complement of gaps_and_islands (ranges, not points)",
)
def interval_merge_overlaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    iv = o.select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(F.col("o_orderdate").cast("date"), 7).alias("e"),
    )
    w_prev = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("o_custkey")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    flagged = iv.select(
        "o_custkey",
        "s",
        "e",
        F.when(
            F.col("s")
            > F.coalesce(
                F.max("e").over(w_prev), F.lit("0001-01-01").cast("date")
            ),
            1,
        )
        .otherwise(0)
        .alias("new_island"),
    )
    grouped = flagged.withColumn("island", F.sum("new_island").over(w_run))
    return grouped.groupBy("o_custkey", "island").agg(
        F.min("s").alias("window_start"),
        F.max("e").alias("window_end"),
        F.count(F.lit(1)).cast("long").alias("n_intervals"),
    )


@register(
    "dense_grid_zero_fill",
    """
    WITH grid AS (
      SELECT d.dow_sun1, h.hr
      FROM (SELECT unnest(range(1, 8)) AS dow_sun1) d
      CROSS JOIN (SELECT unnest(range(0, 24)) AS hr) h
    ), obs AS (
      SELECT CAST(dayofweek(CAST(ts AS DATE)) + 1 AS INTEGER) AS dow_sun1,
             CAST(hour(ts) AS INTEGER) AS hr,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2
    )
    SELECT CAST(g.dow_sun1 AS INTEGER) AS dow_sun1,
           CAST(g.hr AS INTEGER) AS hr,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_events
    FROM grid g LEFT JOIN obs o
      ON o.dow_sun1 = g.dow_sun1 AND o.hr = g.hr
    """,
    doc="Dense dimension-grid completion: the 7x24 heatmap INCLUDING "
        "zero cells — a grid built from sequence() cross-joined "
        "dimensions, left-joined to the observed aggregate (the "
        "date_spine_gap_fill pattern in two dimensions). Downstream "
        "charts/models need the dense grid; the sparse aggregate "
        "silently drops quiet cells. The grid is 168 literal rows — "
        "broadcast — and the fact is touched once",
)
def dense_grid_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    dows = spark.range(1, 8).select(F.col("id").cast("int").alias("dow_sun1"))
    hrs = spark.range(0, 24).select(F.col("id").cast("int").alias("hr"))
    grid = dows.crossJoin(hrs)
    obs = e.groupBy(
        F.dayofweek(F.col("ts").cast("date")).alias("dow_sun1"),
        F.hour("ts").cast("int").alias("hr"),
    ).agg(F.count(F.lit(1)).alias("n"))
    return (
        F.broadcast(grid)
        .join(obs, ["dow_sun1", "hr"], "left")
        .select(
            "dow_sun1",
            "hr",
            F.coalesce("n", F.lit(0)).cast("long").alias("n_events"),
        )
    )


@register(
    "topk_with_ties",
    """
    SELECT o_orderpriority, o_orderkey, o_totalprice, rk
    FROM (
      SELECT o_orderpriority, o_orderkey, o_totalprice,
             rank() OVER (PARTITION BY o_orderpriority
                          ORDER BY CAST(o_totalprice AS DECIMAL(18,2)) DESC)
               AS rk
      FROM orders
    ) t WHERE rk <= 3
    """,
    doc="Top-k WITH TIES (rank() <= k) vs w1's row_number top-k: rank "
        "admits every row tied at the boundary, so the result size is "
        "data-dependent — the SQL:2008 FETCH ... WITH TIES semantic. "
        "Ranking on the DECIMAL value (not double) so ties are exact "
        "value equality in both engines. No extra tie-break column "
        "needed for determinism: ties are INCLUDED, which is exactly "
        "what makes the output well-defined without one",
)
def topk_with_ties(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").cast(AMOUNT).desc()
    )
    return (
        o.withColumn("rk", F.rank().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "iso_week_rollup",
    """
    SELECT CAST(isoyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_year,
           CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INTEGER) AS iso_week,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                AS DECIMAL(18,2)) AS revenue
    FROM orders GROUP BY 1, 2
    """,
    doc="ISO-week revenue rollup keyed by (ISO YEAR, week) — the "
        "year-boundary trap pinned: Jan 1 can belong to week 52/53 of "
        "the PREVIOUS iso year (2021-01-01 is 2020-W53 in both "
        "engines), so grouping by calendar year + week double-counts "
        "boundary weeks; YEAROFWEEK/isoyear is the correct pairing "
        "and both engines agree on it. Decimal-exact revenue, one "
        "~52-cells-per-year shuffle",
)
def iso_week_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.groupBy(
        F.expr("extract(YEAROFWEEK FROM CAST(o_orderdate AS DATE))")
        .cast("int")
        .alias("iso_year"),
        F.weekofyear(d).cast("int").alias("iso_week"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_orders"),
        F.sum(F.col("o_totalprice").cast(AMOUNT)).cast(AMOUNT).alias("revenue"),
    )


@register(
    "union_by_name_schema_evolution",
    """
    SELECT o_orderkey, o_totalprice, o_orderpriority, src FROM (
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
             o_orderpriority,
             'current' AS src
      FROM orders WHERE o_orderstatus = 'O'
      UNION ALL BY NAME
      SELECT o_orderkey,
             CAST(o_totalprice AS DECIMAL(18,2)) AS o_totalprice,
             'legacy' AS src
      FROM orders WHERE o_orderstatus = 'F'
    ) t
    """,
    doc="Schema-evolution UNION: a legacy extract lacking a column "
        "unions with the current shape, absent fields NULL-filled — "
        "Spark unionByName(allowMissingColumns=True) == DuckDB UNION "
        "ALL BY NAME. Positional UNION would silently misalign the "
        "columns instead (the migration bug this pins against); "
        "name-based resolution is the only union that survives schema "
        "evolution in long-lived pipelines",
)
def union_by_name_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    current = o.filter(F.col("o_orderstatus") == "O").select(
        "o_orderkey",
        F.col("o_totalprice").cast(AMOUNT).alias("o_totalprice"),
        "o_orderpriority",
        F.lit("current").alias("src"),
    )
    legacy = o.filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey",
        F.col("o_totalprice").cast(AMOUNT).alias("o_totalprice"),
        F.lit("legacy").alias("src"),
    )
    return current.unionByName(legacy, allowMissingColumns=True).select(
        "o_orderkey", "o_totalprice", "o_orderpriority", "src"
    )


@register(
    "timezone_dst_pack",
    """
    WITH m AS (
      SELECT event_id, ts + INTERVAL 66 DAY AS mts
      FROM events WHERE event_id < 2000
    ),
    conv AS (
      SELECT event_id, mts,
             timezone('America/New_York', CAST(mts AS TIMESTAMPTZ))
               AS ny_local,
             timezone('Asia/Kolkata', CAST(mts AS TIMESTAMPTZ))
               AS kolkata_local
      FROM m
    )
    SELECT event_id, mts, ny_local,
           CAST(date_diff('minute', mts, ny_local) AS BIGINT)
             AS ny_offset_min,
           kolkata_local,
           CAST(date_diff('minute', mts, kolkata_local) AS BIGINT)
             AS kolkata_offset_min,
           (timezone('America/New_York', ny_local) = CAST(mts AS TIMESTAMPTZ))
             AS ny_roundtrip_ok
    FROM conv
    """,
    doc="Timezone conversion across a DST transition — the warehouse "
        "hazard every daily-local-report query hits twice a year: "
        "event timestamps shifted +66 days straddle the 2024-03-10 US "
        "spring-forward, converted UTC->America/New_York (offset "
        "flips -300 -> -240 minutes mid-dataset) and UTC->Asia/Kolkata "
        "(the +330 FRACTIONAL-hour offset that breaks hour-granular "
        "assumptions). Offsets are exact integer minutes; the "
        "local->UTC round-trip flag must be TRUE everywhere here "
        "(UTC->local is total; only fall-back-ambiguous local times "
        "can break the round-trip, pinned out of range). Cross-engine "
        "value: Spark's JSR-310 tz rules vs DuckDB's ICU must agree "
        "on every row or the hash fails — the entry is the canary for "
        "tz-database skew between engines. Pure row-local expressions; "
        "event_id < 2000 bounds gate output, not semantics",
)
def timezone_dst_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 2000)
    mts = F.col("ts") + F.expr("INTERVAL 66 DAYS")
    m = ev.select("event_id", mts.alias("mts"))
    conv = m.select(
        "event_id",
        "mts",
        F.from_utc_timestamp("mts", "America/New_York").alias("ny_local"),
        F.from_utc_timestamp("mts", "Asia/Kolkata").alias("kolkata_local"),
    )
    def mins(a, b):
        return (
            (F.unix_timestamp(a) - F.unix_timestamp(b)) / 60
        ).cast("long")
    return conv.select(
        "event_id",
        "mts",
        "ny_local",
        mins("ny_local", "mts").alias("ny_offset_min"),
        "kolkata_local",
        mins("kolkata_local", "mts").alias("kolkata_offset_min"),
        (
            F.to_utc_timestamp("ny_local", "America/New_York")
            == F.col("mts")
        ).alias("ny_roundtrip_ok"),
    )
