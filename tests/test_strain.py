"""Strain-dataset harness (strain.py): the derived expansions must (a)
have exactly the advertised shape, (b) genuinely cross the dispatch
budgets at bench settings, and (c) produce distributed-strategy answers
equal to the local strategy — the runners assert (c) internally, so the
tests here exercise those assertions end-to-end at a reduced scale that
still crosses the budgets against TEMPORARILY lowered thresholds
(monkeypatched: the dispatch maths is the same, the data is smaller, so
the suite stays fast)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tj_project_spark import strain
from etl_tj_project_spark.operators import dedup as dd
from etl_tj_project_spark.operators import similarity as sim
from tests.conftest import SF_SMOKE


def test_strain_edges_shape(spark):
    """Per doc: replicas-1 candidate links minus one per chain
    boundary; every edge stays inside its doc's node block."""
    edges = strain.strain_edges(spark, SF_SMOKE, replicas=10, chain=4)
    n_docs = strain.load_table(spark, SF_SMOKE, "documents").count()
    per_doc = 9 - 9 // 4  # 9 links minus boundaries at r=3,7
    assert edges.count() == n_docs * per_doc
    bad = edges.filter(
        (F.col("doc_a") / 10).cast("long")
        != (F.col("doc_b") / 10).cast("long")
    ).count()
    assert bad == 0
    # Chains of 4 -> components {0..3}, {4..7}, {8,9} per block.
    labels = dd.connected_components(edges, strategy="local")
    comp = {r["node"]: r["component_id"] for r in labels.collect()}
    dd.release_components(labels)
    base = min(comp)
    assert comp[base + 3] == base
    assert comp[base + 4] == base + 4
    assert comp[base + 9] == base + 8


def test_strain_embeddings_shape(spark):
    e = strain.strain_embeddings(spark, SF_SMOKE, replicas=3)
    n_src = strain.load_table(spark, SF_SMOKE, "embeddings").count()
    assert e.count() == n_src * 3
    # Replica 0 of vector 0 gets perturbation ((0*31+i)%13)*0.01 on
    # dim i — spot-check dims 0 and 12 against the source vector.
    src = (
        strain.load_table(spark, SF_SMOKE, "embeddings")
        .filter(F.col("vec_id") == 0)
        .collect()[0]["embedding"]
    )
    got = e.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    assert got[0] == pytest.approx(float(src[0]), abs=1e-9)
    assert got[12] == pytest.approx(float(src[12]) + 0.12, abs=1e-9)


def test_cc_strain_runner_crosses_budget_and_matches_local(
    spark, monkeypatch
):
    """With the budget lowered to what a small expansion crosses, the
    runner must take the distributed path AND its internal block
    equality check against local union-find must pass."""
    monkeypatch.setattr(dd, "_CC_SINGLE_TASK_EDGES", 1000)
    out = strain.run_cc_strain(
        spark, SF_SMOKE, replicas=12, chain=5
    )
    assert out["edges_sym"] > 1000
    # Full-graph equality: every node's label compared vs the
    # block-parallel numpy reference.
    assert out["equality_checked_nodes"] == out["nodes"]
    assert out["sec_equality_check"] > 0


def test_trainer_strain_runners_cross_budget_and_match_local(
    spark, monkeypatch
):
    monkeypatch.setattr(sim, "_KMEANS_SINGLE_TASK_ELEMENTS", 5000)
    ivf = strain.run_ivf_strain(spark, SF_SMOKE, replicas=2)
    assert ivf["vectors"] * 64 > 5000
    assert ivf["centroid_max_abs_diff"] < 1e-6
    assert ivf["topk_rows"] == 10
    pq = strain.run_pq_strain(spark, SF_SMOKE, replicas=2)
    assert pq["codebook_max_abs_diff"] < 1e-6
    assert pq["topk_rows"] == 10


def test_streaming_strain_drains_and_matches_batch_twin(spark):
    """The streaming drain runner must process every staged row through
    the real micro-batch pipeline and converge the exactly-once sink to
    the batch twin (the runner asserts group equality internally)."""
    out = strain.run_streaming_strain(spark, SF_SMOKE)
    assert out["rows_in"] > 0
    assert out["groups_out"] > 0
    assert out["sec_drain"] > 0


def test_daily_pipeline_strain_runs(spark):
    out = strain.run_daily_pipeline_strain(spark, SF_SMOKE)
    assert out["rows_agg_by_card"] > 0
    assert out["rows_agg_by_route"] > 0
    assert out["rows_agg_by_tariff"] > 0


def test_lsh_strain_within_family_completeness(spark):
    """Identical replica texts share every band hash, so the candidate
    set must contain ALL within-family pairs — the runner asserts the
    exact count internally; this drives it at smoke scale."""
    out = strain.run_lsh_strain(spark, SF_SMOKE, replicas=3)
    n_docs = strain.load_table(spark, SF_SMOKE, "documents").count()
    assert out["within_family_pairs"] == n_docs * 3
    assert out["pairs"] >= out["within_family_pairs"]


def test_u2_cold_io_strain_runs_and_variants_agree(spark):
    """Drives the cold-IO A/B at smoke scale (2x inflation, 1 rep): the
    runner must build distinct inflated copies, evict, time both plans,
    and assert value equality internally (it raises on divergence).
    Timings at this size are meaningless — the per-round measurement
    happens in bench.py at sf0.1 with 8x inflation."""
    out = strain.run_u2_cold_io_strain(spark, SF_SMOKE, inflate=2, reps=1)
    assert out["agg_rows"] > 0
    assert out["sec_single_scan_cold"] > 0
    assert out["sec_default_cold"] > 0
    assert out["inflate_x"] == 2
    # throttle is best-effort: applied on hosts with writable cgroup-v1
    # blkio, no-op elsewhere — either way the key must report it.
    assert out["read_bps"] == 40_000_000
    assert isinstance(out["throttle_applied"], bool)


def test_star_cc_strategy_matches_local(spark):
    """Large-star/small-star (strategy='star', the VERDICT r8 item-5
    A/B alternative) must produce identical labels to the pinned
    single-task strategy on the LSH graph AND on an adversarial
    chain+clique graph (chains need many folds, cliques one)."""
    from etl_tj_project_spark.operators import dedup as dd

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 60)]
        + [(200, 201), (201, 202), (200, 202), (500, 999)],
        "doc_a long, doc_b long",
    )
    star = dd.connected_components(edges, "doc_a", "doc_b", strategy="star")
    loc = dd.connected_components(edges, "doc_a", "doc_b", strategy="local")
    a = {t["node"]: t["component_id"] for t in star.collect()}
    b = {t["node"]: t["component_id"] for t in loc.collect()}
    assert a == b
    assert len(set(a.values())) == 3
    dd.release_components(star)
    dd.release_components(loc)


def test_paragraph_dedup_under_replica_skew(spark):
    """dedup_paragraph_chunks under boilerplate skew (round 9): a
    corpus where every document is replicated 5x (the lsh_skew shape)
    must keep each distinct chunk EXACTLY once — replica copies
    contribute zero survivors, and the survivor set equals what the
    unreplicated corpus produces. This is the completeness/minimality
    pair that makes chunk dedup safe to run before doc-level dedup at
    corpus scale."""
    from pyspark.sql import functions as F

    from etl_tj_project_spark import harness
    from etl_tj_project_spark.sources.testdata import load_table

    d = load_table(spark, SF_SMOKE, "documents")
    n_docs = d.count()
    # Deterministic replica ids: doc_id*10 + r is unique and stable
    # across partition layouts (monotonically_increasing_id is neither).
    replicated = d.select(
        F.explode(F.sequence(F.lit(0), F.lit(4))).alias("r"),
        "doc_id",
        "text",
    ).select(
        (F.col("doc_id") * 10 + F.col("r")).alias("doc_id"), "text"
    )
    # Register nothing — call the entry's builder on a temp view twin by
    # reusing its logic through a parquet staging dir.
    import shutil
    import tempfile

    out = tempfile.mkdtemp(prefix="tj_chunk_skew_")
    try:
        base_dir = f"{out}/sf"
        import os

        os.makedirs(base_dir)
        for t in ("documents",):
            replicated.withColumn("lang", F.lit("en")).withColumn(
                "source", F.lit("s")
            ).withColumn("n_chars", F.length("text")).write.parquet(
                f"{base_dir}/{t}.parquet"
            )
        res = harness.REGISTRY["dedup_paragraph_chunks"].spark(spark, base_dir)
        total_kept = res.agg(F.sum("n_kept")).collect()[0][0]
        base_res = harness.REGISTRY["dedup_paragraph_chunks"].spark(
            spark, SF_SMOKE
        )
        base_kept = base_res.agg(F.sum("n_kept")).collect()[0][0]
        assert total_kept == base_kept, (
            f"replicated corpus kept {total_kept} chunks, "
            f"unreplicated {base_kept} — replicas must add zero survivors"
        )
        assert res.count() == 5 * n_docs
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_containment_strain_per_copy_completeness(spark):
    """The runner's internal floor: rotated copies each reproduce the
    base qualifying-pair set exactly (containment runs on true shingle
    strings — a character bijection is invisible to it), and cross-copy
    pairs are impossible. The runner asserts both; this drives it."""
    row = strain.run_containment_strain(spark, SF_SMOKE, replicas=3)
    # The testdata corpus is confined to the [a-z0-9 ] ring (after the
    # lowercase that the operator itself applies), so the STRICT
    # equality branch must be the one exercised here (ADVICE r12: the
    # alphabet assumption is now checked in code, not assumed).
    assert row["ring_clean"] is True
    assert row["pairs"] == 3 * row["base_pairs"]
    assert row["docs"] > 0 and row["sec_pairs"] > 0
    assert row["id_space"] >= row["docs"]
