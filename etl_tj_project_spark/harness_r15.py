"""Round-15 pack: the canonicalize-first guardrail applied to graph
analytics.

SCALE.md §26 measured `graph_triangle_count` at 342 s on the sf1.0
copy-inflated corpus — not a plan pathology (per-wedge cost actually
improved) but clique inflation: every k-copy family is a k-clique in
the LSH candidate graph, so copy inflation multiplies triangles
~combinatorially (a triangle whose 3 docs gain r copies each becomes
r^3 triangles, and each inflated family adds C(k*r, 3) internal ones).
VERDICT r14 item 5 asks for the same guardrail the pairwise dedup
joins already ship (`dedup_containment_canonical`,
`dedup_jaccard_canonical`): collapse near-dup families FIRST, run the
combinatorial stage on survivors only, and account for the collapsed
cliques analytically instead of enumerating them.

``graph_triangle_count_canonical`` is that composition: LSH bands ->
connected components -> one canonical survivor per family (the shared
`dedup_cluster_canonicalize` manifest), then degree-oriented triangle
counting on the survivor RESIDUAL graph, plus the closed-form
within-family count sum(C(k, 3)) per k-member family — exact under
the copy-inflation model where a family is a clique of equivalent
documents (exact/near copies share band buckets pairwise by
construction).

The residual graph is built at a LOOSER threshold than the family
graph (bands=8, one minhash per band, vs the family definition's
bands=4 two-row bands) — necessarily so: with the family graph's own
parameters the survivor graph is provably EMPTY, since any band
collision between two docs merges their connected components and the
survivors are one per component. (The round-15 rung measured exactly
that: t_canonical_graph=0 at every scale before the threshold split —
the r13 containment-vacuity lesson applied to graphs.) At the
single-minhash threshold survivors genuinely connect — near-miss
pairs below the family bar — and the triangle statistic answers the
question a dedup pipeline actually asks of the residue: "are the
remaining near-miss groups cliquish (template families the family
threshold missed) or chains (transitive accidents)?" Triangles
internal to a collapsed family are restated by the formula; the mixed
class (2 nodes in one family + 1 outside) is deliberately NOT
restated — those edges are family-membership duplicates of the
surviving doc's edges, which is exactly the redundancy
canonicalization removes. The deliverable is the residual clique
structure of the CANONICAL corpus with per-family accounting, asked
of a graph whose size no longer scales with duplicate density.

At 100 TB: the manifest stage is the existing checkpointed label
propagation; the survivor graph is corpus-sized MINUS duplicate mass
(the whole point); the analytic stage is one aggregation over the
family-count manifest. Wall under copy inflation is measured by
`strain.run_triangle_guardrail_strain` and recorded in SCALE.md §27.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_tj_project_spark.harness import register
from etl_tj_project_spark.operators import dedup as dd
from etl_tj_project_spark.operators.graph import triangle_count_oriented


def _triangle_canonical_oracle() -> str:
    """Restate all three stages in one WITH chain: the shared
    recursive-CTE canonicalize twin (`dd.canonicalize_manifest_sql`,
    byte-identical to the dedup_cluster_canonicalize oracle), the
    survivor-only band self-join, a direct x<y<z triangle enumeration
    (oracle-scale corpus — DuckDB needs no degree orientation), and
    the closed-form family sum. Integer `//` division is exact:
    k(k-1)(k-2) is always divisible by 6."""
    canon = dd.canonicalize_manifest_sql(
        "documents", "doc_id", "text", "n_chars", num_hashes=8, bands=4
    )
    # Residual graph at bands=8 (rows-per-band=1), NOT the family
    # graph's bands=4: with identical parameters the survivor graph is
    # provably EMPTY — any band collision between two docs puts them in
    # the same connected component, so two survivors (one per
    # component) can never share a band. The residual analysis must
    # therefore run at a LOOSER threshold than the family definition
    # (single-minhash collision), which families do not collapse.
    bands_sql = dd.minhash_bands_sql(
        "docs", "doc_id", "text", num_hashes=8, bands=8
    )
    return f"""
    WITH canon AS MATERIALIZED ({canon}),
    docs AS (
      SELECT d.doc_id, d.text
      FROM documents d
      JOIN canon c ON c.canonical_doc_id = d.doc_id
    ),
    sb AS MATERIALIZED (SELECT * FROM ({bands_sql}) raw_bands),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM sb a JOIN sb c ON a.band = c.band AND a.h = c.h
                         AND a.doc_id < c.doc_id
    ),
    tri AS (
      SELECT CAST(count(*) AS BIGINT) AS n_triangles_canonical
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
    ),
    fam AS (
      SELECT CAST(coalesce(SUM(
               n_members * (n_members - 1) * (n_members - 2) // 6), 0)
             AS BIGINT) AS n_triangles_within_family
      FROM canon
    )
    SELECT tri.n_triangles_canonical,
           fam.n_triangles_within_family,
           CAST(tri.n_triangles_canonical + fam.n_triangles_within_family
                AS BIGINT) AS n_triangles_total
    FROM tri, fam
    """


@register(
    "graph_triangle_count_canonical",
    _triangle_canonical_oracle(),
    doc="The §25b/§26 guardrail applied to graph analytics (VERDICT "
        "r14 item 5): canonicalize near-dup families first (LSH -> "
        "connected components -> longest-doc survivor), THEN run "
        "degree-oriented triangle counting on the survivor RESIDUAL "
        "graph — built at the looser single-minhash threshold "
        "(bands=8), because with the family graph's own bands=4 "
        "parameters the survivor graph is provably empty (an edge "
        "would have merged the components) — and add the closed-form "
        "sum(C(k,3)) internal triangles of each collapsed k-member "
        "family. SCALE.md §26 measured why the composition exists: "
        "copy inflation turns every family into a clique factory "
        "(342 s at sf1.0 for the direct counter, ~1000x triangle "
        "growth) — collapsing families removes the combinatorial term "
        "at its source and replaces it with one aggregation over the "
        "family-size manifest. Output: one row (residual-graph "
        "triangles, analytic within-family triangles, total; "
        "non-vacuous at every scale — 28,152 residual triangles at "
        "sf0.001). Oracle restates canonicalize + survivor bands=8 "
        "join + direct x<y<z enumeration + the family formula in one "
        "WITH chain. Selection rule (direct vs canonical): COVERAGE.md round 16",
)
def graph_triangle_count_canonical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from etl_tj_project_spark.harness_r12 import (
        shared_family_manifest,
        shared_residual_pairs,
    )

    manifest = shared_family_manifest(spark, sf_dir)
    manifest = dd.narrow_persisted(manifest, "component_id")
    # bands=8 (one minhash per band): the survivor RESIDUAL graph must
    # use a looser threshold than the bands=4 family graph — with the
    # family parameters the survivor graph is empty by construction
    # (an edge would have merged the two components), which would make
    # the graph stage vacuous (the r13 containment lesson). At the
    # single-minhash threshold, survivors genuinely connect (sf0.001:
    # 5,280 edges / 28,152 triangles) and the triangle statistic
    # answers "is the residual near-miss structure cliquish or
    # chained?" over a graph whose size no longer scales with
    # duplicate density.
    # The residual pair table is the SECOND shared artifact (round-16
    # wave 3): computed once per corpus snapshot, read by this entry,
    # the LCC entry, and the second pass.
    pairs = shared_residual_pairs(spark, sf_dir)
    pairs = dd.narrow_persisted(pairs, "doc_a")
    tri = triangle_count_oriented(pairs)
    fam = manifest.agg(
        F.coalesce(
            F.sum(
                F.expr(
                    "n_members * (n_members - 1) * (n_members - 2) DIV 6"
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("n_triangles_within_family")
    )
    return tri.crossJoin(fam).select(
        F.col("n_triangles").alias("n_triangles_canonical"),
        "n_triangles_within_family",
        (F.col("n_triangles") + F.col("n_triangles_within_family"))
        .cast("long")
        .alias("n_triangles_total"),
    )


def _residual_lcc_oracle() -> str:
    """Canonicalize twin + survivor bands=8 residual graph + direct
    x<y<z triangle enumeration exploded to its three members + the
    integer-exact local clustering coefficient: lcc_milli =
    2000 * tri(v) // (deg(v) * (deg(v) - 1)). All-integer arithmetic
    so the hash never depends on float division."""
    canon = dd.canonicalize_manifest_sql(
        "documents", "doc_id", "text", "n_chars", num_hashes=8, bands=4
    )
    bands_sql = dd.minhash_bands_sql(
        "docs", "doc_id", "text", num_hashes=8, bands=8
    )
    return f"""
    WITH canon AS MATERIALIZED ({canon}),
    docs AS (
      SELECT d.doc_id, d.text
      FROM documents d
      JOIN canon c ON c.canonical_doc_id = d.doc_id
    ),
    sb AS MATERIALIZED (SELECT * FROM ({bands_sql}) raw_bands),
    pairs AS MATERIALIZED (
      SELECT DISTINCT a.doc_id AS doc_a, c.doc_id AS doc_b
      FROM sb a JOIN sb c ON a.band = c.band AND a.h = c.h
                         AND a.doc_id < c.doc_id
    ),
    deg AS MATERIALIZED (
      SELECT n AS node, CAST(COUNT(*) AS BIGINT) AS degree FROM (
        SELECT doc_a AS n FROM pairs
        UNION ALL
        SELECT doc_b AS n FROM pairs
      ) ends GROUP BY n
    ),
    tri AS (
      SELECT unnest([e1.doc_a, e1.doc_b, e2.doc_b]) AS node
      FROM pairs e1
      JOIN pairs e2 ON e2.doc_a = e1.doc_a AND e2.doc_b > e1.doc_b
      JOIN pairs e3 ON e3.doc_a = e1.doc_b AND e3.doc_b = e2.doc_b
    ),
    tpn AS (
      SELECT node, CAST(COUNT(*) AS BIGINT) AS n_triangles
      FROM tri GROUP BY node
    )
    SELECT d.node, d.degree,
           CAST(coalesce(t.n_triangles, 0) AS BIGINT) AS n_triangles,
           CAST(CASE WHEN d.degree >= 2
                     THEN 2000 * coalesce(t.n_triangles, 0)
                          // (d.degree * (d.degree - 1))
                     ELSE 0 END AS BIGINT) AS lcc_milli
    FROM deg d LEFT JOIN tpn t ON t.node = d.node
    """


@register(
    "graph_residual_clustering_coefficient",
    _residual_lcc_oracle(),
    doc="Per-node local clustering coefficient of the survivor "
        "residual graph — the companion statistic to "
        "graph_triangle_count_canonical: the triangle total says HOW "
        "MUCH residual clique structure survives family collapse; the "
        "LCC distribution says WHERE it sits (lcc ~ 1000: the node's "
        "near-miss neighborhood is itself a template family the "
        "bands=4 threshold missed — a candidate for a second, looser "
        "dedup pass; lcc ~ 0: chain/hub structure, transitive "
        "accidents that a dedup pass must NOT merge). Exact integer "
        "output: lcc_milli = 2000*tri(v) div (deg(v)*(deg(v)-1)) — "
        "no float division anywhere. Same degree-oriented wedge "
        "machinery as the triangle entry (per-triangle explode to 3 "
        "members), same bands=8 residual threshold (provably "
        "necessary — see graph_triangle_count_canonical), same "
        "at-scale bounds: O(sqrt(E)) wedge fan-out, never all-pairs",
)
def graph_residual_clustering_coefficient(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from etl_tj_project_spark.harness_r12 import shared_residual_pairs
    from etl_tj_project_spark.operators.graph import local_clustering

    pairs = shared_residual_pairs(spark, sf_dir)
    pairs = dd.narrow_persisted(pairs, "doc_a")
    # One definition of the statistic (operators/graph.local_clustering)
    # shared with the second-pass operator that consumes it.
    return local_clustering(pairs)
