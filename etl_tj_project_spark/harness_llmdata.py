"""LLM-training-data analytics pack 2: TF-IDF term scoring, n-gram
statistics, edit-distance near-dup verification, calendar gap-fill,
histograms, cohort retention, and sliding windows.

Cross-engine notes (see parity.py and the round-1 lessons):
* no libm functions in outputs — TF-IDF uses the *linear* idf variant
  ``tf * N / df`` (IEEE division of exactly-representable integers is
  correctly rounded, so both engines emit bit-identical doubles; ``ln``
  differs in the last ulp between libms);
* double sums go through DECIMAL internally (exact, order-independent)
  and are pinned to DOUBLE on output by the parity layer;
* every top-k carries a deterministic tiebreak.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import DecimalType

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table

PRICE = DecimalType(18, 2)

# Shared tokenization, stated identically in both engines: lowercase,
# trim, split on whitespace runs, drop empties.
_TOKENS_SQL = r"""
  SELECT doc_id,
         unnest(CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
                ELSE regexp_split_to_array(trim(lower(text)), '\s+') END)
           AS term
  FROM documents
"""


def _tokens(docs: DataFrame) -> DataFrame:
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    return (
        docs.select(
            "doc_id",
            F.explode(
                F.when(F.trim("text") == "", F.array()).otherwise(toks)
            ).alias("term"),
        )
    )


@register(
    "tfidf_top_terms",
    f"""
    WITH tok AS ({_TOKENS_SQL}),
    tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
      SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.doc_id, tf.term, tf.tf, df.df,
             CAST(tf.tf * n.n_docs AS DOUBLE) / df.df AS score
      FROM tf JOIN df USING (term) CROSS JOIN n
      WHERE tf.doc_id < 100
    )
    SELECT doc_id, term, tf, df, score FROM (
      SELECT *, row_number() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, term) AS rn
      FROM scored
    ) t WHERE rn <= 3
    """,
    doc="TF-IDF term scoring: per-doc term frequency x corpus rarity "
        "(linear idf tf*N/df — libm-free, so both engines emit identical "
        "doubles), top-3 terms per doc. Plan shape at 100 TB: tf is one "
        "(doc,term) shuffle, df one term shuffle, N a 1-row broadcast; "
        "the doc_id<100 probe bounds output, not compute semantics",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = _tokens(docs)
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.filter(F.col("doc_id") < 100)
        .join(df, "term")
        .crossJoin(F.broadcast(n))
        .withColumn(
            "score", (F.col("tf") * F.col("n_docs")).cast("double") / F.col("df")
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "term")
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "term", "tf", "df", "score")
    )


@register(
    "bigram_top50",
    r"""
    WITH t AS (
      SELECT CASE WHEN trim(text) = '' THEN CAST([] AS VARCHAR[])
             ELSE regexp_split_to_array(trim(lower(text)), '\s+') END AS toks
      FROM documents
    ), b AS (
      SELECT unnest(CASE WHEN len(toks) < 2 THEN CAST([] AS VARCHAR[])
             ELSE list_transform(range(1, len(toks)),
                                 i -> toks[i] || ' ' || toks[i + 1]) END)
        AS bigram
      FROM t
    )
    SELECT bigram, COUNT(*) AS n FROM b
    GROUP BY bigram ORDER BY n DESC, bigram LIMIT 50
    """,
    doc="Corpus bigram statistics: word-pair explode -> count -> "
        "deterministic top-50. The explode happens inside the engine "
        "(no Python), one (bigram) shuffle, TakeOrdered for the top-k",
)
def bigram_top50(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    with_toks = docs.select(
        F.when(F.trim("text") == "", F.array()).otherwise(toks).alias("toks")
    )
    bigrams = with_toks.select(
        F.explode(
            F.when(F.size("toks") < 2, F.array()).otherwise(
                F.expr(
                    "transform(sequence(0, size(toks) - 2), "
                    "i -> concat(toks[i], ' ', toks[i + 1]))"
                )
            )
        ).alias("bigram")
    )
    return (
        bigrams.groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(50)
    )


@register(
    "dedup_levenshtein_pairs",
    """
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substr(lower(a.text), 1, 80),
                       substr(lower(b.text), 1, 80)) AS edit_distance
    FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
    """,
    doc="Edit-distance verification over candidate pairs (consecutive "
        "ids stand in for LSH candidates, as in the jaccard query). The "
        "80-char prefix bounds the O(len^2) DP cost per pair — at scale "
        "Levenshtein runs only on candidate pairs, never all-pairs",
)
def dedup_levenshtein_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    a = d.select(
        F.col("doc_id").alias("doc_a"),
        F.substring(F.lower("text"), 1, 80).alias("ta"),
    )
    b = d.select(
        F.col("doc_id").alias("doc_b"),
        F.substring(F.lower("text"), 1, 80).alias("tb"),
    )
    return (
        a.join(b, F.col("doc_b") == F.col("doc_a") + 1)
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("ta", "tb").alias("edit_distance"),
        )
    )


@register(
    "date_spine_gap_fill",
    """
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(18,2))
               AS revenue
      FROM orders GROUP BY CAST(o_orderdate AS DATE)
    ), bounds AS (SELECT min(d) AS mind, max(d) AS maxd FROM daily),
    spine AS (
      SELECT CAST(unnest(generate_series(mind, maxd, INTERVAL 1 DAY)) AS DATE)
        AS d
      FROM bounds
    )
    SELECT s.d, dd.revenue,
           (SELECT d2.revenue FROM daily d2
            WHERE d2.d <= s.d ORDER BY d2.d DESC LIMIT 1) AS revenue_filled
    FROM spine s LEFT JOIN daily dd ON dd.d = s.d
    """,
    doc="Calendar gap-fill: dense date spine (sequence + explode) left-"
        "joined to daily revenue, missing days forward-filled with "
        "last(ignorenulls). Aggregate-first: the spine and the window "
        "run over |days| rows, so the unpartitioned frame is safe at "
        "any fact scale",
)
def date_spine_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    daily = o.groupBy(F.col("o_orderdate").cast("date").alias("d")).agg(
        F.sum(F.col("o_totalprice").cast(PRICE)).cast(PRICE).alias("revenue")
    )
    bounds = daily.agg(F.min("d").alias("mind"), F.max("d").alias("maxd"))
    spine = bounds.select(
        F.explode(F.sequence("mind", "maxd")).alias("d")
    )
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (
        spine.join(daily, "d", "left")
        .select(
            "d",
            "revenue",
            F.last("revenue", ignorenulls=True).over(w).alias("revenue_filled"),
        )
    )


@register(
    "histogram_fixed_buckets",
    """
    SELECT CAST(least(floor(o_totalprice / 25000), 19) AS INTEGER) AS bucket,
           CAST(least(floor(o_totalprice / 25000), 19) * 25000 AS DOUBLE)
             AS bucket_lo,
           COUNT(*) AS n
    FROM orders
    GROUP BY 1, 2
    """,
    doc="Fixed-width histogram: bucket index from integer-floor division "
        "(IEEE-exact in both engines, unlike width_bucket which DuckDB "
        "lacks), one small-key shuffle — the profiling primitive for "
        "any numeric column at scale",
)
def histogram_fixed_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 25000), F.lit(19)).cast("int")
    return (
        o.select(
            bucket.alias("bucket"),
            (bucket * 25000).cast("double").alias("bucket_lo"),
        )
        .groupBy("bucket", "bucket_lo")
        .agg(F.count(F.lit(1)).alias("n"))
    )


@register(
    "cohort_retention",
    """
    WITH user_days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), cohorts AS (
      SELECT user_id, min(d) AS cohort_day FROM user_days GROUP BY user_id
    )
    SELECT c.cohort_day, CAST(u.d - c.cohort_day AS BIGINT) AS day_offset,
           COUNT(*) AS active_users
    FROM user_days u JOIN cohorts c USING (user_id)
    GROUP BY c.cohort_day, CAST(u.d - c.cohort_day AS BIGINT)
    """,
    doc="Cohort retention triangle: users bucketed by first-active day, "
        "activity counted per (cohort, day-offset). Two user_id "
        "shuffles (distinct + min) that AQE coalesces, then one small "
        "aggregate — integer counts only, no cross-engine float risk",
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    user_days = ev.select(
        "user_id", F.col("ts").cast("date").alias("d")
    ).distinct()
    cohorts = user_days.groupBy("user_id").agg(F.min("d").alias("cohort_day"))
    return (
        user_days.join(cohorts, "user_id")
        .select(
            "cohort_day",
            F.datediff("d", "cohort_day").cast("long").alias("day_offset"),
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


@register(
    "sliding_window_counts",
    """
    WITH slid AS (
      SELECT event_type,
             date_trunc('hour', ts) - to_hours(CAST(k AS BIGINT))
               AS window_start,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events CROSS JOIN range(3) r(k)
    )
    SELECT window_start, event_type, COUNT(*) AS n,
           CAST(SUM(v) AS DECIMAL(18,2)) AS value_sum
    FROM slid GROUP BY window_start, event_type
    """,
    doc="Sliding windows (3h length / 1h step): every event lands in 3 "
        "overlapping windows. Spark assigns via F.window(slideDuration); "
        "the oracle states the same assignment as an explicit k=0..2 "
        "replication. Map-side replicate -> one (window,type) shuffle; "
        "decimal sums keep the overlap exact",
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "3 hours", "1 hour").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(PRICE)).cast(PRICE).alias("value_sum"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "value_sum",
        )
    )


@register(
    "ann_ivf_trained_topk",
    None,  # rows-only: Lloyd means are shuffle-order dependent in the
    # last ulp (mean of doubles), so trained centroids are value- but
    # not bitwise-reproducible — an equality-hash oracle would flap.
    # The untrained-centroid twin (ann_ivf_topk) carries the hash check
    # for the identical plan shape; train_kmeans convergence is pinned
    # in tests/test_scale_plans.py on planted clusters.
    doc="IVF-Flat ANN with TRAINED centroids: Lloyd k-means "
        "(operators/similarity.train_kmeans — per iteration one "
        "(cell,dim) shuffle of partial sums + a constant k x dim "
        "collect) feeds the same IVF probe/rank plan as ann_ivf_topk",
)
def ann_ivf_trained_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.operators import similarity as sim

    e = load_table(spark, sf_dir, "embeddings")
    cents = sim.train_kmeans(e, k=8, iters=3)
    q = e.filter(F.col("vec_id") == 0)
    top = sim.ivf_topk(e, q, k=10, centroids=cents)
    return top.select("vec_id", F.round("cosine", 9).alias("cosine"))


@register(
    "dq_expectations",
    """
    SELECT 'orders.o_custkey.not_null' AS rule,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.o_totalprice.range' AS rule,
           CAST(SUM(CASE WHEN o_totalprice IS NULL
                          OR o_totalprice < 0
                          OR o_totalprice > 1000000 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders.o_orderkey.unique' AS rule,
           CAST(SUM(n - 1) AS BIGINT) AS n_violations
    FROM (SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey) t
    UNION ALL
    SELECT 'lineitem.l_orderkey.ref_orders' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_violations
    FROM lineitem l
    WHERE l.l_orderkey IS NOT NULL
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_orderkey = l.l_orderkey)
    """,
    doc="Data-quality publish gate (operators/quality.py): row-level "
        "rules (not-null, range) fold into ONE conditional-agg scan — a "
        "new rule is a new column, not a new pass; uniqueness is one "
        "keyed groupBy; referential integrity one broadcast anti-join. "
        "Exact violation counts, so the whole report is hash-checked. "
        "Pairs with the atomic day commit: red report, no publish",
)
def dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from etl_tj_project_spark.operators import quality as dq

    o = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    rows = dq.row_rules_report(
        o,
        {
            "orders.o_custkey.not_null": F.col("o_custkey").isNull(),
            "orders.o_totalprice.range": (
                F.col("o_totalprice").isNull()
                | (F.col("o_totalprice") < 0)
                | (F.col("o_totalprice") > 1_000_000)
            ),
        },
    )
    uniq = dq.unique_report(o, ["o_orderkey"], "orders.o_orderkey.unique")
    ref = dq.ref_integrity_report(
        li, "l_orderkey", o, "o_orderkey", "lineitem.l_orderkey.ref_orders"
    )
    return dq.combine_reports(rows, uniq, ref)
