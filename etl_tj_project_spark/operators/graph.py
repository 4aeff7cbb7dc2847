"""Graph primitives over candidate-pair edge lists.

The near-dup candidate graph (LSH band buckets -> distinct doc pairs)
is the one graph a curation pipeline actually materializes at corpus
scale, and the statistics it asks of that graph — degree profile,
connected components, triangle density — all reduce to joins over the
(doc_a, doc_b) edge table. This module holds the shared edge-table
algorithms so harness packs can compose them without importing each
other (the r12/r13 circular-import lesson).

Scale notes (100 TB): every algorithm here is bounded by the EDGE
table, never by node-degree^2 fan-out. Triangle counting uses the
degree-oriented wedge formulation (each edge points low->high
(degree, id), wedges form only at each edge's lower endpoint), which
caps per-node wedge fan-out at O(sqrt(|E|)) — the property that keeps
it runnable when boilerplate hub documents give the candidate graph a
heavy-tailed degree distribution.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _closed_triangles(pairs: DataFrame) -> DataFrame:
    """The shared core of both triangle statistics: one row
    ``(u, a, b)`` per triangle of the undirected edge list, each
    triangle produced exactly once.

    ``pairs`` must be a canonical distinct edge table with columns
    ``doc_a < doc_b``. The standard MapReduce formulation: orient
    every edge from its lower (degree, id) endpoint to its higher one,
    form wedges only at the lower endpoint of each edge pair, then
    close them with a left-semi join against the edge set. Per-node
    wedge fan-out is bounded by O(sqrt(|E|)) instead of degree^2 — on
    a graph with hub nodes the difference between a runnable job and a
    combinatorial explosion. Wedges form only at the oriented-lowest
    vertex, so no triple is double-counted. Callers should pre-narrow/
    persist ``pairs`` (see ``dedup.narrow_persisted``): the four
    downstream joins each launch one map task per cached partition.

    Factored (ADVICE r15) so the total-count and per-node entries are
    thin aggregations over the SAME frame and can never drift.
    """
    ends = pairs.select(F.col("doc_a").alias("n")).unionAll(
        pairs.select(F.col("doc_b").alias("n"))
    )
    deg = ends.groupBy("n").agg(F.count(F.lit(1)).alias("degree"))
    p = (
        pairs.join(deg.withColumnRenamed("n", "doc_a"), "doc_a")
        .withColumnRenamed("degree", "deg_a")
        .join(
            deg.withColumnRenamed("n", "doc_b").withColumnRenamed(
                "degree", "deg_b"
            ),
            "doc_b",
        )
    )
    low_is_a = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("doc_a") < F.col("doc_b"))
    )
    oriented = p.select(
        F.when(low_is_a, F.col("doc_a")).otherwise(F.col("doc_b")).alias("u"),
        F.when(low_is_a, F.col("doc_b")).otherwise(F.col("doc_a")).alias("v"),
    )
    e1 = oriented.select(F.col("u"), F.col("v").alias("a"))
    e2 = oriented.select(F.col("u"), F.col("v").alias("b"))
    wedges = e1.join(e2, "u").filter(F.col("a") < F.col("b"))
    closing = pairs.select(
        F.col("doc_a").alias("ca"), F.col("doc_b").alias("cb")
    )
    return wedges.join(
        closing,
        (F.least("a", "b") == F.col("ca"))
        & (F.greatest("a", "b") == F.col("cb")),
        "left_semi",
    )


def triangle_count_oriented(pairs: DataFrame) -> DataFrame:
    """Count triangles of an undirected edge list via degree-oriented
    wedge counting (see :func:`_closed_triangles` for the shape and
    the O(sqrt(|E|)) bound).

    ``pairs`` must be a canonical distinct edge table with columns
    ``doc_a < doc_b``. Returns a single-row frame with one BIGINT
    column ``n_triangles``.
    """
    return _closed_triangles(pairs).agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )


def triangles_per_node(pairs: DataFrame) -> DataFrame:
    """(node, n_triangles) — how many triangles each node belongs to,
    for every node in at least one triangle.

    Same degree-oriented wedge core as :func:`triangle_count_oriented`
    (:func:`_closed_triangles` — each triangle formed exactly once);
    instead of counting closed wedges it explodes each closed triangle
    {u, a, b} to its three members and aggregates per node."""
    members = _closed_triangles(pairs).select(
        F.explode(F.array("u", "a", "b")).alias("node")
    )
    return members.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
