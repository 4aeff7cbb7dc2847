"""Search & ranking pack: inverted index, positional phrase search,
Pareto frontier, and Gini-impurity diversity.

The retrieval-side operators of a corpus pipeline (the dedup/curation
packs are the ingest side): build the term→postings index, answer a
positional phrase query through index joins rather than string scans,
and two ranking/profile shapes (2-D skyline, exact-rational diversity)
that stay fully hash-checkable because they avoid libm.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.sources.testdata import load_table

_TOKENS = "regexp_extract_all(lower(text), '[a-z]+', 0)"
_TOKENS_SQL = "regexp_extract_all(lower(text), '[a-z]+')"


@register(
    "inverted_index_postings",
    f"""
    WITH toks AS (
      SELECT doc_id, unnest({_TOKENS_SQL}) AS term FROM documents
    )
    SELECT term,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df,
           CAST(COUNT(*) AS BIGINT) AS tf,
           array_to_string(
             list_transform(list_sort(list(DISTINCT doc_id)),
                            x -> CAST(x AS VARCHAR)), ',') AS postings_csv
    FROM toks GROUP BY term HAVING COUNT(DISTINCT doc_id) >= 25
    """,
    doc="Inverted-index build: term → (document frequency, term "
        "frequency, sorted posting list) — the search-engine core "
        "structure, one token shuffle keyed by term. Postings surface "
        "as a sorted CSV because collection order is partition-"
        "dependent (the array_agg_sorted rule); at 100 TB postings "
        "for head terms are block-compressed per shard rather than "
        "concatenated, but the build shuffle is identical. df >= 25 "
        "keeps the checked slice to the head of the vocabulary",
)
def inverted_index_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.expr(_TOKENS)).alias("term"))
    return (
        toks.groupBy("term")
        .agg(
            F.count_distinct("doc_id").cast("long").alias("df"),
            F.count(F.lit(1)).cast("long").alias("tf"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_set("doc_id")),
                    lambda x: x.cast("string"),
                ),
                ",",
            ).alias("postings_csv"),
        )
        .filter(F.col("df") >= 25)
    )


@register(
    "phrase_search_positional",
    f"""
    WITH pos AS (
      SELECT doc_id,
             unnest({_TOKENS_SQL}) AS term,
             unnest(range(1, len({_TOKENS_SQL}) + 1)) AS p
      FROM documents
    ),
    bigrams AS (
      SELECT a.term AS w1, b.term AS w2, COUNT(*) AS n
      FROM pos a JOIN pos b ON a.doc_id = b.doc_id AND b.p = a.p + 1
      GROUP BY a.term, b.term
    ),
    phrase AS (
      SELECT w1, w2 FROM bigrams ORDER BY n DESC, w1, w2 LIMIT 1
    )
    SELECT a.doc_id, any_value(ph.w1) AS w1, any_value(ph.w2) AS w2,
           CAST(COUNT(*) AS BIGINT) AS n_occurrences
    FROM pos a
    JOIN phrase ph ON a.term = ph.w1
    JOIN pos b ON b.doc_id = a.doc_id AND b.p = a.p + 1 AND b.term = ph.w2
    GROUP BY a.doc_id
    """,
    doc="Positional phrase search through the index, not a string scan: "
        "tokens keep their positions, the phrase (chosen in-query as "
        "the corpus's top bigram, deterministic tie-break) matches via "
        "a (doc, position+1) self-join — the adjacency-join formulation "
        "every positional inverted index uses. Spark plans the phrase "
        "as a one-row broadcast against the position table; at 100 TB "
        "the position table is the stored index, bucketed by term, and "
        "the join touches only the two terms' postings",
)
def phrase_search_positional(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pos = d.select(
        "doc_id",
        F.posexplode(F.expr(_TOKENS)).alias("p0", "term"),
    ).select("doc_id", (F.col("p0") + 1).alias("p"), "term")
    adj = pos.alias("a").join(
        pos.alias("b"),
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.p") == F.col("a.p") + 1),
    )
    bigrams = adj.groupBy(
        F.col("a.term").alias("w1"), F.col("b.term").alias("w2")
    ).agg(F.count(F.lit(1)).alias("n"))
    phrase = bigrams.orderBy(F.col("n").desc(), "w1", "w2").limit(1).select(
        "w1", "w2"
    )
    hits = (
        pos.alias("a")
        .join(F.broadcast(phrase.alias("ph")), F.col("a.term") == F.col("ph.w1"))
        .join(
            pos.alias("b"),
            (F.col("b.doc_id") == F.col("a.doc_id"))
            & (F.col("b.p") == F.col("a.p") + 1)
            & (F.col("b.term") == F.col("ph.w2")),
        )
    )
    return hits.groupBy(F.col("a.doc_id").alias("doc_id")).agg(
        F.any_value(F.col("ph.w1")).alias("w1"),
        F.any_value(F.col("ph.w2")).alias("w2"),
        F.count(F.lit(1)).cast("long").alias("n_occurrences"),
    )


@register(
    "pareto_frontier_2d",
    """
    WITH pts AS (
      SELECT DISTINCT CAST(p_retailprice AS DECIMAL(12,2)) AS price, p_size
      FROM part
    ),
    ranked AS (
      SELECT price, p_size,
             MIN(p_size) OVER (ORDER BY price, p_size
                               ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS best_size_so_far
      FROM pts
    )
    SELECT CAST(price AS DOUBLE) AS price, CAST(p_size AS INTEGER) AS p_size
    FROM ranked
    WHERE best_size_so_far IS NULL OR p_size < best_size_so_far
    """,
    doc="Pareto frontier / skyline (minimize price AND size): the 2-D "
        "case collapses to sort-by-x + running-min-of-y — a point "
        "survives iff it strictly improves the best y seen so far, one "
        "window pass instead of the quadratic NOT-EXISTS dominance "
        "scan. Distinct pairs first so duplicate points can't self-"
        "dominate. The window is over DISTINCT (price, size) pairs — "
        "bounded by value-domain size, not table size, so the "
        "unpartitioned frame is safe at scale",
)
def pareto_frontier_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load_table(spark, sf_dir, "part")
    pts = p.select(
        F.col("p_retailprice").cast("decimal(12,2)").alias("price"), "p_size"
    ).distinct()
    w = Window.orderBy("price", "p_size").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = pts.withColumn("best_size_so_far", F.min("p_size").over(w))
    return ranked.filter(
        F.col("best_size_so_far").isNull()
        | (F.col("p_size") < F.col("best_size_so_far"))
    ).select(
        F.col("price").cast("double").alias("price"),
        F.col("p_size").cast("int").alias("p_size"),
    )


@register(
    "gini_impurity_by_group",
    """
    WITH cnt AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY user_id, event_type
    ),
    agg AS (
      SELECT user_id,
             SUM(c) AS total,
             SUM(c * c) AS sum_sq,
             COUNT(*) AS n_types
      FROM cnt GROUP BY user_id
    )
    SELECT user_id,
           CAST(n_types AS BIGINT) AS n_types,
           CAST(total * total - sum_sq AS BIGINT) AS gini_num,
           CAST(total * total AS BIGINT) AS gini_den,
           CAST(total * total - sum_sq AS DOUBLE) / (total * total)
             AS gini_impurity
    FROM agg
    """,
    doc="Gini impurity (1 - sum p_i^2) of each user's event-type mix — "
        "the diversity/concentration metric that needs NO logarithm, "
        "unlike Shannon entropy whose libm ln() is not bit-portable "
        "across engines. Kept exact-rational (numerator, denominator "
        "as BIGINT) with one IEEE division at the end, so the hash "
        "check covers the ratio too. Two aggregations, both keyed on "
        "user — the second collapses type-level counts, so the heavy "
        "shuffle is the first and only fact-sized one",
)
def gini_impurity_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c")
    )
    agg = cnt.groupBy("user_id").agg(
        F.sum("c").alias("total"),
        F.sum(F.col("c") * F.col("c")).alias("sum_sq"),
        F.count(F.lit(1)).alias("n_types"),
    )
    num = F.col("total") * F.col("total") - F.col("sum_sq")
    den = F.col("total") * F.col("total")
    return agg.select(
        "user_id",
        F.col("n_types").cast("long").alias("n_types"),
        num.cast("long").alias("gini_num"),
        den.cast("long").alias("gini_den"),
        (num.cast("double") / den).alias("gini_impurity"),
    )
