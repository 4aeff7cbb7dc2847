"""Property-based check for the §28 star-edge lever: on
Hypothesis-generated corpora (tiny vocabulary so band-bucket
collisions actually happen, duplicates and empty docs included), the
connected components of the per-bucket STAR graph must equal the
components of the all-pairs candidate graph — and BOTH must equal an
independent pure-Python union-find over the collected band table.
Three witnesses, two of them different Spark plans, one of them not
Spark at all.

Batch-per-example like the other property suites; example count kept
small because every example runs two CC jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etl_tj_project_spark.operators import dedup as dd

# Long-ish words so 8-char shingles straddle word boundaries and
# different docs genuinely share shingles (and therefore minhash
# bands); short lists so full-doc duplicates occur often.
VOCAB = ["abcdefgh", "ijklmnop", "qrstuvwx", "abcdwxyz"]
DOC = st.lists(st.sampled_from(VOCAB), min_size=0, max_size=4).map(" ".join)
CORPUS = st.lists(DOC, min_size=2, max_size=9)


def _python_components(band_rows):
    """Union-find over (doc_id, band, h) rows: the model both Spark
    formulations must match. Nodes = docs sharing a non-NULL bucket
    with at least one other doc; labels = min reachable doc id."""
    buckets: dict = {}
    for r in band_rows:
        if r["h"] is None:
            continue
        buckets.setdefault((r["band"], r["h"]), []).append(r["doc_id"])
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    nodes = set()
    for members in buckets.values():
        if len(members) < 2:
            continue
        nodes.update(members)
        head = members[0]
        for m in members[1:]:
            union(head, m)
    return {n: find(n) for n in nodes}


@settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=CORPUS)
def test_star_and_pair_components_match_python_union_find(spark, corpus):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    want = _python_components(
        dd.minhash_bands(df, "doc_id", "text", 8, 4).collect()
    )
    for builder in (dd.lsh_candidate_pairs, dd.lsh_star_edges):
        edges = builder(df, "doc_id", "text", 8, 4)
        if not want:
            assert edges.count() == 0, builder.__name__
            continue
        labels = dd.materialize_labels(
            dd.connected_components(edges, "doc_a", "doc_b")
        )
        got = {r["node"]: r["component_id"] for r in labels.collect()}
        assert got == want, builder.__name__
