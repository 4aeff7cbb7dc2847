"""Round-13 pack invariants: the containment guardrail's composition
properties and the streaming dedup entry's batch equality.

Oracle-hash parity for both entries runs in the replay/driver gate
(verified green at sf0.01); these tests pin the claims the oracles
can't express — the guardrail's candidate-input drop and
identical-output guarantee on an adversarial copy-inflated corpus, the
subset/closure relations of the composed entry, and the streaming
run's exact multiset equality with the batch table it replays.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tj_project_spark import strain
from etl_tj_project_spark.harness_r12 import dedup_cluster_canonicalize
from etl_tj_project_spark.harness_r13 import (
    dedup_containment_canonical,
    stream_dedup_watermark,
)
from etl_tj_project_spark.operators import dedup as dd
from etl_tj_project_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


# -------------------------------------------------------------------------
# Composed entry: structural relations to its two stages
# -------------------------------------------------------------------------

def test_containment_canonical_is_containment_on_survivors(spark):
    """The composed entry must equal prefix-filtered containment run
    over exactly the canonical-survivor subset — no more, no less —
    and must therefore be a subset of full-corpus containment."""
    out = dedup_containment_canonical(spark, SF_SMOKE).persist()
    manifest = dedup_cluster_canonicalize(spark, SF_SMOKE)
    canonical = {
        r.canonical_doc_id for r in manifest.select("canonical_doc_id").collect()
    }

    got_ids = {
        v
        for r in out.select("doc_a", "doc_b").collect()
        for v in (r.doc_a, r.doc_b)
    }
    assert got_ids <= canonical

    d = load_table(spark, SF_SMOKE, "documents")
    reps = d.filter(F.col("doc_id").isin([int(x) for x in canonical]))
    want = dd.prefix_filter_containment_pairs(
        reps, "doc_id", "text", ngram=3, t_num=4, t_den=5
    )
    assert out.exceptAll(want).count() == 0
    assert want.exceptAll(out).count() == 0

    full = dd.prefix_filter_containment_pairs(
        d, "doc_id", "text", ngram=3, t_num=4, t_den=5
    ).select("doc_a", "doc_b")
    assert out.select("doc_a", "doc_b").exceptAll(full).count() == 0
    out.unpersist()


def test_canonicalize_clusters_df_level_matches_entry(spark):
    """The DataFrame-level canonicalize building block must reproduce
    the registry entry's manifest exactly (same LSH params, same keep
    rule) — it is the strain's stand-in for the entry."""
    d = load_table(spark, SF_SMOKE, "documents")
    got = dd.canonicalize_near_dup_clusters(d, "doc_id", "text", "n_chars")
    want = dedup_cluster_canonicalize(spark, SF_SMOKE)
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0


# -------------------------------------------------------------------------
# Guardrail strain: candidate drop + identical output, deterministically
# -------------------------------------------------------------------------

def test_containment_guardrail_strain(spark):
    """On a 3x exact-copy corpus the direct candidate-join input must
    be >= 9x the canonical-first input (the runner asserts the floor
    internally — this drives it and checks the record's shape), and
    the final pair set must be identical to the base run (asserted
    inside via both exceptAll directions)."""
    row = strain.run_containment_guardrail_strain(spark, SF_SMOKE, replicas=3)
    assert row["replicas"] == 3
    assert row["cand_direct"] >= 9 * row["cand_canonical"]
    assert row["cand_drop_x"] >= 9
    assert 0 < row["n_canonical"] <= row["docs"] // 3
    assert row["sec_direct_candidates"] > 0
    assert row["sec_guardrail_e2e"] > 0


# -------------------------------------------------------------------------
# Streaming dedup entry: exact multiset equality with the batch table
# -------------------------------------------------------------------------

def test_stream_dedup_watermark_equals_batch(spark):
    """The streaming run over the duplicate-injected source must give
    back exactly the original events multiset (injected rows are
    byte-identical copies, so dedup-by-event_id restores the table)."""
    got = stream_dedup_watermark(spark, SF_SMOKE)
    want = load_table(spark, SF_SMOKE, "events").select(
        F.col("event_id").cast("long"),
        F.col("user_id").cast("long"),
        "event_type",
        F.col("value").cast("double"),
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0
    assert want.exceptAll(got).count() == 0
