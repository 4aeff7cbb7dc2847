"""Extended TPC-H-style pack: the remaining classic warehouse shapes that
are expressible over the driver's reduced TPC-H schema (no partsupp, no
l_shipmode/l_commitdate/l_receiptdate, no c_phone — queries needing those
columns are adapted to preserve the OPERATOR SHAPE, which is what matters
for the engine: correlated EXISTS with a non-equi condition, outer-join
count distributions, scalar-subquery max/avg, disjunctive pushdown
predicates, multi-correlated exists/not-exists).

Reference context: the reference (SURVEY §0) is "SQL strings over
Postgres", so its implied surface is ANSI SQL; these queries prove that
surface Spark-side with DuckDB-oracle twins, at shapes that stress the
physical layer the reference never did.

Exactness conventions are shared with harness_analytics (exact decimal
money sums; double division + round(…, 6); identical aliases both sides).

Scale notes (100 TB): every query here keeps dims broadcast, facts
shuffled on their join key exactly once, and top-k through
TakeOrderedAndProject. Correlated subqueries are expressed as aggregate-
then-join (the same decorrelation Catalyst would do) so there is no
nested-loop re-execution per row.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.harness_analytics import (
    AMOUNT4,
    _SQL_DISC,
    _SQL_ONE,
    _SQL_PRICE,
    _li_money,
    _one,
)
from etl_tj_project_spark.schemas import AMOUNT
from etl_tj_project_spark.sources.testdata import load_table

_SQL_REV = f"{_SQL_PRICE} * ({_SQL_ONE} - {_SQL_DISC})"


def _rev(li: DataFrame) -> "F.Column":
    """Exact-decimal line revenue: price * (1 - disc), scale 4."""
    return F.col("price") * (_one() - F.col("disc"))


@register(
    "tpch_q4ish_late_order_priority",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1997-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1997-04-01'
      AND EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey
          AND CAST(l.l_shipdate AS DATE) > CAST(o.o_orderdate AS DATE) + 60
      )
    GROUP BY o.o_orderpriority
    """,
    doc="TPC-H Q4 shape (commitdate/receiptdate absent → 'shipped >60d "
        "after order' stands in): correlated EXISTS with a NON-EQUI "
        "cross-table condition, then count by priority. Spark plan: "
        "left-semi hash join on orderkey with the date comparison as a "
        "join-side predicate — one shuffle, no per-row re-execution",
)
def tpch_q4ish_late_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1997-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1997-04-01").cast("date"))
    )
    li = load_table(spark, sf_dir, "lineitem")
    cond = (li["l_orderkey"] == o["o_orderkey"]) & (
        li["l_shipdate"].cast("date")
        > F.date_add(o["o_orderdate"].cast("date"), 60)
    )
    return (
        o.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "tpch_q7_volume_shipping",
    f"""
    SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
           CAST(EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS INT)
             AS l_year,
           CAST(SUM({_SQL_REV}) AS DECIMAL(18,4)) AS revenue
    FROM lineitem l
    JOIN orders o    ON o.o_orderkey = l.l_orderkey
    JOIN customer c  ON c.c_custkey  = o.o_custkey
    JOIN supplier s  ON s.s_suppkey  = l.l_suppkey
    JOIN nation n1   ON n1.n_nationkey = s.s_nationkey
    JOIN nation n2   ON n2.n_nationkey = c.c_nationkey
    WHERE ((n1.n_name = 'NATION_18' AND n2.n_name = 'NATION_19')
        OR (n1.n_name = 'NATION_19' AND n2.n_name = 'NATION_18'))
      AND CAST(l.l_shipdate AS DATE) BETWEEN DATE '1998-01-01'
                                         AND DATE '1999-12-31'
    GROUP BY n1.n_name, n2.n_name,
             CAST(EXTRACT(year FROM CAST(l.l_shipdate AS DATE)) AS INT)
    """,
    doc="TPC-H Q7 volume shipping: 6-way join with TWO roles of the same "
        "dim (supplier-nation vs customer-nation) and a symmetric pair "
        "predicate. Both nation joins broadcast; the only shuffles are "
        "lineitem⋈orders on orderkey and ⋈customer on custkey",
)
def tpch_q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem")).filter(
        F.col("l_shipdate").cast("date").between("1998-01-01", "1999-12-31")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_18") & (F.col("cust_nation") == "NATION_19")
    ) | ((F.col("supp_nation") == "NATION_19") & (F.col("cust_nation") == "NATION_18"))
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .filter(pair)
        .withColumn("l_year", F.year(F.col("l_shipdate").cast("date")))
        .groupBy("supp_nation", "cust_nation", "l_year")
        .agg(F.sum(_rev(li)).cast(AMOUNT4).alias("revenue"))
    )


@register(
    "tpch_q8_market_share",
    f"""
    WITH all_sales AS (
      SELECT CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT)
               AS o_year,
             {_SQL_REV} AS volume,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON l.l_partkey = p.p_partkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n2  ON n2.n_nationkey = c.c_nationkey
      JOIN region r   ON r.r_regionkey = n2.n_regionkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN nation n1  ON n1.n_nationkey = s.s_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND CAST(o.o_orderdate AS DATE) BETWEEN DATE '1997-01-01'
                                            AND DATE '1998-12-31'
    )
    SELECT o_year,
           round(CAST(SUM(CASE WHEN supp_nation = 'NATION_5' THEN volume
                               ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share
    FROM all_sales GROUP BY o_year
    """,
    doc="TPC-H Q8 market share: 8-way star join + conditional share-of-"
        "total ratio. Exact decimal numerator/denominator make the double "
        "division order-insensitive. part is the selective filter — at "
        "100 TB, AQE turns the post-filter part side into a broadcast",
)
def tpch_q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date").between("1997-01-01", "1998-12-31")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    n1 = n.select(
        F.col("n_nationkey").alias("s_nkey"), F.col("n_name").alias("supp_nation")
    )
    n2 = n.select(
        F.col("n_nationkey").alias("c_nkey"), F.col("n_regionkey").alias("c_rkey")
    )
    vol = _rev(li).alias("volume")
    sales = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("c_nkey"))
        .join(F.broadcast(r), F.col("c_rkey") == F.col("r_regionkey"))
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("s_nkey"))
        .select(
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            vol,
            "supp_nation",
        )
    )
    zero = F.lit(0).cast(AMOUNT4)
    nat_vol = F.when(F.col("supp_nation") == "NATION_5", F.col("volume")).otherwise(
        zero
    )
    return sales.groupBy("o_year").agg(
        F.round(
            F.sum(nat_vol).cast("double") / F.sum("volume").cast("double"), 6
        ).alias("mkt_share")
    )


@register(
    "tpch_q9ish_product_profit",
    f"""
    SELECT n.n_name AS nation,
           CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT)
             AS o_year,
           CAST(SUM({_SQL_REV}) AS DECIMAL(18,4)) AS sum_profit
    FROM part p
    JOIN lineitem l ON l.l_partkey = p.p_partkey
    JOIN supplier s ON s.s_suppkey = l.l_suppkey
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON n.n_nationkey = s.s_nationkey
    WHERE p.p_name LIKE '%red%'
    GROUP BY n.n_name,
             CAST(EXTRACT(year FROM CAST(o.o_orderdate AS DATE)) AS INT)
    """,
    doc="TPC-H Q9 shape (no partsupp → profit is discounted revenue): "
        "LIKE-filtered part ⋈ fact ⋈ supplier→nation, grouped by nation × "
        "year. The '%red%' contains-filter cannot prune at the scan, but "
        "the post-filter broadcast keeps the fact-side single-shuffle",
)
def tpch_q9ish_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    o = load_table(spark, sf_dir, "orders")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(s), li["l_suppkey"] == s["s_suppkey"])
        .join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year(F.col("o_orderdate").cast("date")).alias("o_year"),
            _rev(li).alias("volume"),
        )
        .groupBy("nation", "o_year")
        .agg(F.sum("volume").cast(AMOUNT4).alias("sum_profit"))
    )


@register(
    "tpch_q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_SQL_REV}) AS DECIMAL(18,4)) AS revenue,
           c.c_acctbal, n.n_name
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE CAST(o.o_orderdate AS DATE) >= DATE '1998-01-01'
      AND CAST(o.o_orderdate AS DATE) <  DATE '1998-04-01'
      AND l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name
    ORDER BY revenue DESC, c.c_custkey
    LIMIT 20
    """,
    doc="TPC-H Q10 returned items: fact⋈fact join + wide group key + "
        "deterministic top-20 (revenue DESC, custkey tiebreak) through "
        "TakeOrderedAndProject — no global sort at any scale",
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem")).filter(
        F.col("l_returnflag") == "R"
    )
    o = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate").cast("date") >= F.lit("1998-01-01").cast("date"))
        & (F.col("o_orderdate").cast("date") < F.lit("1998-04-01").cast("date"))
    )
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev(li)).cast(AMOUNT4).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
    )


@register(
    "tpch_q12ish_priority_by_returnflag",
    """
    SELECT l.l_returnflag,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE CAST(l.l_shipdate AS DATE) >= DATE '2000-01-01'
      AND CAST(l.l_shipdate AS DATE) <  DATE '2001-01-01'
    GROUP BY l.l_returnflag
    """,
    doc="TPC-H Q12 shape (l_shipmode absent → returnflag groups): "
        "CASE-inside-SUM two-way conditional count after an equi-join; "
        "the CASE folds into the partial aggregate map-side",
)
def tpch_q12ish_priority_by_returnflag(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate").cast("date") >= F.lit("2000-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("2001-01-01").cast("date"))
    )
    o = load_table(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        o.join(li, o["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "tpch_q13_order_count_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
      FROM customer c
      LEFT JOIN orders o ON o.o_custkey = c.c_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) t
    GROUP BY c_count
    """,
    doc="TPC-H Q13 customer distribution: outer join with an extra join-"
        "side predicate, COUNT of the null-able side, then a second "
        "aggregation over the count itself. Two shuffles (custkey, then "
        "c_count) — the second input is |customers| rows, tiny",
)
def tpch_q13_order_count_distribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    cond = (o["o_custkey"] == c["c_custkey"]) & (
        o["o_orderpriority"] != "5-LOW"
    )
    per_cust = (
        c.join(o, cond, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "tpch_q15_top_supplier",
    f"""
    WITH revenue0 AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM({_SQL_REV}) AS DECIMAL(18,4)) AS total_revenue
      FROM lineitem
      WHERE CAST(l_shipdate AS DATE) >= DATE '1998-01-01'
        AND CAST(l_shipdate AS DATE) <  DATE '1998-04-01'
      GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM supplier s
    JOIN revenue0 r ON r.supplier_no = s.s_suppkey
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue0)
    """,
    doc="TPC-H Q15 top supplier: view + scalar-subquery MAX equality. "
        "Exact decimal revenue makes the = safe (no float compare). "
        "Spark: the 1-row global max is cross-broadcast back — no "
        "collect, no second scan of lineitem (agg reuses the view)",
)
def tpch_q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1998-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1998-04-01").cast("date"))
    )
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev(li)).cast(AMOUNT4).alias("total_revenue")
    )
    mx = rev.agg(F.max("total_revenue").alias("max_rev"))
    s = load_table(spark, sf_dir, "supplier")
    return (
        rev.join(F.broadcast(mx), rev["total_revenue"] == mx["max_rev"])
        .join(F.broadcast(s), F.col("supplier_no") == s["s_suppkey"])
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "tpch_q17ish_small_qty_revenue",
    f"""
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_qty
      FROM lineitem GROUP BY l_partkey
    )
    SELECT round(CAST(SUM({_SQL_PRICE}) AS DOUBLE) / 7.0, 6) AS avg_yearly
    FROM lineitem l
    JOIN part p     ON p.p_partkey = l.l_partkey
    JOIN per_part a ON a.l_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#23'
      AND CAST(l.l_quantity AS DOUBLE) < 0.2 * a.avg_qty
    """,
    doc="TPC-H Q17 small-quantity revenue: correlated per-part AVG "
        "subquery, decorrelated to aggregate-then-join (what Catalyst "
        "does to the EXISTS form anyway). The avg is an exact decimal "
        "sum over a bigint count so both engines derive bit-identical "
        "thresholds; single global row out",
)
def tpch_q17ish_small_qty_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    per_part = li.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        (F.sum("qty").cast("double") / F.count(F.lit(1))).alias("avg_qty")
    )
    p = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .join(per_part, li["l_partkey"] == per_part["a_partkey"])
        .filter(F.col("l_quantity").cast("double") < F.lit(0.2) * F.col("avg_qty"))
        .agg(
            F.round(F.sum("price").cast("double") / F.lit(7.0), 6).alias(
                "avg_yearly"
            )
        )
    )


@register(
    "tpch_q19_disjunctive_predicates",
    f"""
    SELECT CAST(SUM({_SQL_REV}) AS DECIMAL(18,4)) AS revenue
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
           AND CAST(l.l_quantity AS DOUBLE) BETWEEN 1 AND 11)
       OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
           AND CAST(l.l_quantity AS DOUBLE) BETWEEN 10 AND 20)
       OR (p.p_brand = 'Brand#34' AND p.p_size BETWEEN 1 AND 15
           AND CAST(l.l_quantity AS DOUBLE) BETWEEN 20 AND 30)
    """,
    doc="TPC-H Q19 disjunctive predicates: OR-of-conjunctions spanning "
        "both join sides. Catalyst extracts the common single-side "
        "implications (brand∈{...}, qty≤30) and pushes them below the "
        "join; the residual OR evaluates post-join in codegen",
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    p = load_table(spark, sf_dir, "part")
    qty = F.col("l_quantity").cast("double")
    branch = lambda brand, smax, qlo, qhi: (  # noqa: E731
        (F.col("p_brand") == brand)
        & F.col("p_size").between(1, smax)
        & qty.between(qlo, qhi)
    )
    pred = (
        branch("Brand#12", 5, 1, 11)
        | branch("Brand#23", 10, 10, 20)
        | branch("Brand#34", 15, 20, 30)
    )
    return (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .filter(pred)
        .agg(F.sum(_rev(li)).cast(AMOUNT4).alias("revenue"))
    )


@register(
    "tpch_q21ish_lone_late_supplier",
    """
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             CASE WHEN CAST(l.l_shipdate AS DATE)
                       > CAST(o.o_orderdate AS DATE) + 90
                  THEN 1 ELSE 0 END AS is_late
      FROM lineitem l
      JOIN orders o ON o.o_orderkey = l.l_orderkey
      WHERE o.o_orderstatus = 'F'
    ),
    order_stats AS (
      SELECT l_orderkey,
             COUNT(DISTINCT l_suppkey) AS n_supp,
             COUNT(DISTINCT CASE WHEN is_late = 1 THEN l_suppkey END)
               AS n_late
      FROM li GROUP BY l_orderkey
    ),
    culprit AS (
      SELECT DISTINCT li.l_orderkey, li.l_suppkey
      FROM li JOIN order_stats os ON os.l_orderkey = li.l_orderkey
      WHERE li.is_late = 1 AND os.n_supp >= 2 AND os.n_late = 1
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM culprit c JOIN supplier s ON s.s_suppkey = c.l_suppkey
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    LIMIT 20
    """,
    doc="TPC-H Q21 shape (receipt/commit dates absent → 'shipped >90d "
        "after order' is the lateness test): the classic EXISTS(other "
        "supplier) AND NOT EXISTS(other late supplier) pair. Round-15 "
        "rewrite: the previous stats+join-back form consumed "
        "lineitem⋈orders TWICE (two scans, and the countDistinct "
        "expand key blocked exchange reuse between the branches — "
        "VERDICT r14 item 3). Now ONE pass: reduce to distinct "
        "(orderkey, suppkey, max(is_late)) pairs — one shuffle of the "
        "fact — then both EXISTS branches are window counts over the "
        "order-keyed PAIR table (supplier count per order is bounded, "
        "so the window partition cannot skew). sf0.1 A/B: 1.14 -> "
        "0.97 s, exchanges 7 -> 5, lineitem scans 2 -> 1, identical "
        "results at sf0.01/sf0.1",
)
def tpch_q21ish_lone_late_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    li = (
        load_table(spark, sf_dir, "lineitem")
        # No broadcast hint: orders is a fact table — Catalyst/AQE
        # picks broadcast at bench scale and SMJ at cluster scale.
        .join(o, F.col("l_orderkey") == o["o_orderkey"])
        .select(
            "l_orderkey",
            "l_suppkey",
            F.when(
                F.col("l_shipdate").cast("date")
                > F.date_add(F.col("o_orderdate").cast("date"), 90),
                1,
            )
            .otherwise(0)
            .alias("is_late"),
        )
    )
    pair = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.max("is_late").alias("late")
    )
    w = Window.partitionBy("l_orderkey")
    culprit = (
        pair.withColumn("n_supp", F.count(F.lit(1)).over(w))
        .withColumn("n_late", F.sum("late").over(w))
        .filter(
            (F.col("late") == 1)
            & (F.col("n_supp") >= 2)
            & (F.col("n_late") == 1)
        )
        .select("l_orderkey", "l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    return (
        culprit.join(F.broadcast(s), culprit["l_suppkey"] == s["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "tpch_q22ish_idle_customers",
    """
    WITH pos AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
               / COUNT(*) AS avg_bal
      FROM customer
      WHERE CAST(c_acctbal AS DOUBLE) > 0.0
        AND substring(c_name, 17, 2) IN ('01','02','03','04','05','06','07')
    )
    SELECT substring(c.c_name, 17, 2) AS cntrycode,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DECIMAL(18,2))
             AS totacctbal
    FROM customer c, pos
    WHERE substring(c.c_name, 17, 2) IN ('01','02','03','04','05','06','07')
      AND CAST(c.c_acctbal AS DOUBLE) > pos.avg_bal
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND CAST(o.o_orderdate AS DATE) >= DATE '2000-07-01')
    GROUP BY substring(c.c_name, 17, 2)
    """,
    doc="TPC-H Q22 shape (c_phone absent → a c_name digit slice is the "
        "country code): scalar-subquery AVG threshold + NOT EXISTS anti-"
        "join + group over the derived code. 'Idle' = no orders on/after "
        "2000-07-01 (every sf0.01 customer has SOME order, so an "
        "unconditioned NOT EXISTS is vacuously empty — the date filter "
        "keeps the result non-empty at sf0.001/0.01/0.1 AND shrinks the "
        "anti-join build side). The 1-row avg broadcasts; the anti join "
        "builds on date-filtered orders only",
)
def tpch_q22ish_idle_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    codes = ("01", "02", "03", "04", "05", "06", "07")
    c = load_table(spark, sf_dir, "customer").withColumn(
        "cntrycode", F.substring("c_name", 17, 2)
    )
    in_codes = c.filter(F.col("cntrycode").isin(*codes))
    avg_bal = in_codes.filter(F.col("c_acctbal").cast("double") > 0.0).agg(
        (
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double")
            / F.count(F.lit(1))
        ).alias("avg_bal")
    )
    o = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").cast("date") >= F.lit("2000-07-01").cast("date")
    )
    return (
        in_codes.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal").cast("double") > F.col("avg_bal"))
        .join(o, o["o_custkey"] == F.col("c_custkey"), "left_anti")
        .groupBy("cntrycode")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)"))
            .cast("decimal(18,2)")
            .alias("totacctbal"),
        )
    )


# =========================================================================
# Round-3 completions: the last classic shapes (Q2/Q11/Q16/Q20 analogues).
# partsupp does not exist in the reduced schema; lineitem aggregated to
# (partkey, suppkey) stands in as the supplier-offer table, preserving
# each query's operator shape (min-per-group equality join, scalar-
# subquery threshold, NOT-IN anti join + multi-key distinct count,
# IN-subquery semi join over a HAVING aggregate).
# =========================================================================

@register(
    "tpch_q2ish_min_cost_supplier",
    f"""
    WITH offers AS (
      SELECT l_partkey, l_suppkey,
             CAST(SUM({_SQL_PRICE}) AS DECIMAL(18,2)) AS supply_value
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ), rs AS (
      SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
      FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
                      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'ASIA'
    ), cand AS (
      SELECT p.p_partkey, rs.s_name, rs.s_acctbal, rs.n_name, o.supply_value,
             MIN(o.supply_value) OVER (PARTITION BY p.p_partkey) AS min_value
      FROM part p
      JOIN offers o ON o.l_partkey = p.p_partkey
      JOIN rs ON rs.s_suppkey = o.l_suppkey
      WHERE p.p_size = 15 AND p.p_type = 'SMALL'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, supply_value
    FROM cand WHERE supply_value = min_value
    """,
    doc="TPC-H Q2 shape (min-cost supplier per part): correlated scalar "
        "MIN subquery decorrelated to a per-part window MIN + exact-"
        "decimal equality (float argmin would be engine-divergent in the "
        "last ulp; decimal sums are not). The region-filtered supplier "
        "side and the filtered part side both broadcast; the offer "
        "table shuffles once on (partkey, suppkey); the window runs on "
        "post-filter candidate rows only",
)
def tpch_q2ish_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    offers = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum("price").cast(AMOUNT).alias("supply_value")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    rs = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "SMALL")
    )
    cand = (
        offers.join(F.broadcast(p), offers["l_partkey"] == p["p_partkey"])
        .join(F.broadcast(rs), offers["l_suppkey"] == rs["s_suppkey"])
        .select("p_partkey", "s_name", "s_acctbal", "n_name", "supply_value")
    )
    w = Window.partitionBy("p_partkey")
    return (
        cand.withColumn("min_value", F.min("supply_value").over(w))
        .filter(F.col("supply_value") == F.col("min_value"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "supply_value")
    )


@register(
    "tpch_q11ish_value_concentration",
    f"""
    WITH natline AS (
      SELECT l.l_partkey, {_SQL_PRICE} AS price
      FROM lineitem l JOIN supplier s ON s.s_suppkey = l.l_suppkey
                      JOIN nation n ON n.n_nationkey = s.s_nationkey
                      JOIN region r ON r.r_regionkey = n.n_regionkey
      WHERE r.r_name = 'EUROPE'
    ), per_part AS (
      SELECT l_partkey, CAST(SUM(price) AS DECIMAL(18,2)) AS part_value
      FROM natline GROUP BY l_partkey
    ), total AS (
      SELECT CAST(SUM(price) AS DECIMAL(18,2)) AS total_value FROM natline
    )
    SELECT l_partkey, part_value FROM per_part, total
    WHERE part_value * 10000 > total_value
    """,
    doc="TPC-H Q11 shape (value concentration): group aggregate compared "
        "against a scalar-subquery global total. The threshold compare "
        "is exact-integer-scaled decimal (value*10000 > total) instead "
        "of the spec's total*0.0001 so neither engine divides (division "
        "scale rules differ; multiplication is exact on both). The "
        "1-row total broadcasts; one shuffle on partkey reused by both "
        "aggregates at the DataFrame level",
)
def tpch_q11ish_value_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    rs = (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .select("s_suppkey")
    )
    natline = li.join(
        F.broadcast(rs), li["l_suppkey"] == rs["s_suppkey"]
    ).select("l_partkey", "price")
    per_part = natline.groupBy("l_partkey").agg(
        F.sum("price").cast(AMOUNT).alias("part_value")
    )
    total = natline.agg(F.sum("price").cast(AMOUNT).alias("total_value"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") * 10000 > F.col("total_value"))
        .select("l_partkey", "part_value")
    )


@register(
    "tpch_q16ish_supplier_cnt_by_part",
    """
    SELECT p.p_brand, p.p_type, p.p_size,
           COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#4' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
      AND l.l_suppkey NOT IN
        (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
    doc="TPC-H Q16 shape (supplier count by part attributes): NOT IN "
        "subquery over a key with no NULLs = broadcast LEFT ANTI join "
        "(the 'complaints' exclusion), then COUNT(DISTINCT) grouped on "
        "three part attributes. The anti-join build side is the tiny "
        "filtered supplier list; one Expand-based distinct aggregate "
        "shuffle on the 3-attribute key",
)
def tpch_q16ish_supplier_cnt_by_part(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#4")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    bad = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_acctbal") < 0
    ).select("s_suppkey")
    return (
        li.join(F.broadcast(bad), li["l_suppkey"] == bad["s_suppkey"], "left_anti")
        .join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "tpch_q20ish_excess_stock_suppliers",
    """
    SELECT s.s_name, s.s_acctbal
    FROM supplier s JOIN nation n ON n.n_nationkey = s.s_nationkey
                    JOIN region r ON r.r_regionkey = n.n_regionkey
    WHERE r.r_name = 'AMERICA'
      AND s.s_suppkey IN (
        SELECT big.l_suppkey FROM (
          SELECT l.l_suppkey, l.l_partkey,
                 CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,2)))
                   AS DECIMAL(18,2)) AS qty_sum
          FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
          WHERE p.p_name LIKE 'small%'
            AND CAST(l.l_shipdate AS DATE) >= DATE '1998-01-01'
            AND CAST(l.l_shipdate AS DATE) <  DATE '1999-01-01'
          GROUP BY l.l_suppkey, l.l_partkey
          HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,2))) > 40
        ) big)
    """,
    doc="TPC-H Q20 shape (excess-stock suppliers): IN-subquery over a "
        "HAVING-filtered aggregate = LEFT SEMI join against the "
        "aggregated (suppkey, partkey) quantity table — the nested "
        "aggregate runs ONCE, not per supplier row. Part filter "
        "broadcasts into the fact scan; exact-decimal HAVING threshold",
)
def tpch_q20ish_excess_stock_suppliers(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    li = _li_money(load_table(spark, sf_dir, "lineitem")).filter(
        (F.col("l_shipdate").cast("date") >= F.lit("1998-01-01").cast("date"))
        & (F.col("l_shipdate").cast("date") < F.lit("1999-01-01").cast("date"))
    )
    p = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    big = (
        li.join(F.broadcast(p), li["l_partkey"] == p["p_partkey"])
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("qty").cast(AMOUNT).alias("qty_sum"))
        .filter(F.col("qty_sum") > 40)
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").filter(
        F.col("r_name") == "AMERICA"
    )
    return (
        s.join(F.broadcast(n), s["s_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .join(big, s["s_suppkey"] == big["l_suppkey"], "left_semi")
        .select("s_name", "s_acctbal")
    )
