"""The local correctness gate: every query in the harness registry must
hash-match its DuckDB oracle at sf0.001 (the driver repeats this at
sf0.01). A query without an oracle gets a rows-run smoke check.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from etl_tj_project_spark import harness
from tests.conftest import SF_SMOKE
from tests.oracle_compare import (
    compare,
    driver_canonicalize_check,
    duck_connection,
)


@pytest.fixture(scope="module")
def duck():
    con = duck_connection(SF_SMOKE)
    yield con
    con.close()


@pytest.fixture(scope="module")
def pinned_pairs():
    # Exactly what the driver sees: pinned builders + pinned oracle SQL,
    # in driver-window order.
    return harness.queries(), harness.oracle_sql()


# Queries that legitimately return 0 rows at sf0.001 (the smoke scale is
# too small to populate their predicate). Each must still be non-vacuous
# at the driver's sf0.01 — keep this list empty unless a query PROVES it
# has rows at sf0.01 and genuinely cannot at sf0.001.
NONEMPTY_EXEMPT: set[str] = set()


@pytest.mark.parametrize("name", sorted(harness.REGISTRY))
def test_query_matches_oracle(spark, duck, name, pinned_pairs):
    qs, oracles = pinned_pairs
    df = qs[name](spark, SF_SMOKE)
    if name not in oracles:
        # Non-SQL-expressible: execute and require a stable schema + rows.
        # The driver still pandas-canonicalizes rows-only results for its
        # row-count record, so they must survive that path too.
        rows = [tuple(r) for r in df.collect()]
        assert df.columns, name
        assert rows, f"{name}: rows-only entry returned 0 rows (vacuous)"
        driver_canonicalize_check(df.columns, rows)
        return
    # Non-vacuity (the tpch_q22ish lesson): a hash match on an empty
    # result proves nothing — require rows unless explicitly exempted.
    if name not in NONEMPTY_EXEMPT:
        assert df.limit(1).count() == 1, (
            f"{name}: 0 rows at sf0.001 — vacuous oracle check"
        )
    compare(df, duck, oracles[name])


def test_driver_window_is_first_50():
    ordered = list(harness.ordered_registry())
    assert ordered[:50] == harness.DRIVER_WINDOW
    assert len(harness.DRIVER_WINDOW) == 50
    assert set(ordered) == set(harness.REGISTRY)


def test_driver_window_has_no_rows_only_slots():
    """Round-5 lesson: a window slot burned on err=no_oracle proves
    nothing, so rows-only entries are barred from the window — EXCEPT
    during a declared, bounded refresh (the round-7 precedent, repeated
    r16-r17 per VERDICT r15 item 4: the 7 rows-only sketch/trained-ANN
    entries' last driver `spark_rows > 0` rows dated to round 7, three
    driver eras old). The exception is pinned, not open-ended: the
    window's rows-only slots must be EXACTLY harness.ROWS_ONLY_REFRESH
    (at most 4 — the free-slot budget after the mandated stalest cohort
    and never-attested entries), and every refresh name must really be
    a rows-only registry entry."""
    rows_only = {
        n for n in harness.DRIVER_WINDOW if harness.REGISTRY[n].oracle is None
    }
    declared = set(harness.ROWS_ONLY_REFRESH)
    assert len(declared) <= 4, (
        f"rows-only refresh exceeds its slot budget: {sorted(declared)}"
    )
    assert all(
        harness.REGISTRY[n].oracle is None for n in declared
    ), "ROWS_ONLY_REFRESH names an oracle-backed entry"
    assert rows_only == declared, (
        f"window rows-only slots != declared refresh: "
        f"window={sorted(rows_only)} declared={sorted(declared)}"
    )


def test_driver_window_is_oldest_green_first():
    """The rotation's point (VERDICT r7 item 2): beyond the stability
    core and this round's changed entries, window slots go to the
    entries whose last driver green is OLDEST. Computed DYNAMICALLY
    from the CORRECTNESS_r*.json files that existed when the window was
    composed — rounds < harness.WINDOW_ROUND. Records from
    WINDOW_ROUND onward are IGNORED: the driver lands CORRECTNESS_r{N}
    after the builder's last commit of round N, so a test reading every
    file demands the round-(N+1) window before round N+1 exists and
    fails at the start of every round (the r9 failure mode, VERDICT r9
    item 1b). The window is pinned to its composition ledger instead."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    newest: dict[str, int] = {}
    recorded_rounds: set[int] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        recorded_rounds.add(rnd)
        if rnd >= harness.WINDOW_ROUND:
            continue
        with open(path) as fh:
            rec = json.load(fh)
        for name, row in rec.items():
            if row.get("err") is None and row.get("rows_match"):
                newest[name] = max(newest.get(name, 0), rnd)
    if not newest:
        pytest.skip("no CORRECTNESS records present")
    # WINDOW_ROUND is bumped by hand each round; a missed bump (or a
    # bump without recomposition) would make this test silently
    # validate against a STALE ledger and pass while rotation coverage
    # stalls — the inverse of the r9 failure mode it fixes (ADVICE
    # r10). Pin the invariant loosely enough to survive the landing of
    # the current round's own ledger file (ADVICE r11: the strict
    # `== max + 1` form failed the suite the moment the driver wrote
    # CORRECTNESS_r{N}.json, re-creating the r9 between-rounds redness
    # it was meant to replace): WINDOW_ROUND may equal the newest
    # recorded round + 1 (recomposed against the full ledger — the
    # steady state) or the newest recorded round itself (this round's
    # record just landed; recomposition is the next round's first
    # commit). Anything older is a stalled rotation and fails.
    assert harness.WINDOW_ROUND in (
        max(recorded_rounds),
        max(recorded_rounds) + 1,
    ), (
        f"WINDOW_ROUND={harness.WINDOW_ROUND} but newest recorded "
        f"CORRECTNESS round is r{max(recorded_rounds)}: recompose "
        f"DRIVER_WINDOW against the full ledger and bump WINDOW_ROUND "
        f"to {max(recorded_rounds) + 1}"
    )
    # Oracle-backed entries only (rows-only slots are barred above) and
    # only names still in the registry.
    stale_pool = {
        n: r
        for n, r in newest.items()
        if n in harness.REGISTRY and harness.REGISTRY[n].oracle is not None
    }
    oldest_round = min(stale_pool.values())
    stalest = {n for n, r in stale_pool.items() if r == oldest_round}
    missing = stalest - set(harness.DRIVER_WINDOW)
    # The stalest cohort can exceed the non-core window capacity (e.g.
    # 40+ entries sharing one round); then the window must spend every
    # non-core, non-changed slot on it. With 50 slots and <=6 reserved,
    # 44 is the capacity floor.
    if len(stalest) <= 44:
        assert not missing, (
            f"entries with oldest green r{oldest_round} missing from "
            f"window: {sorted(missing)}"
        )
    else:
        assert len(stalest & set(harness.DRIVER_WINDOW)) >= 44


def test_canonicalizer_rejects_array_cells():
    """Regression for the r4 array_agg_sorted driver crash: a raw array
    column must be REJECTED by the local gate (the driver's pandas
    canonicalizer dies on unhashable cells; the local gate must be at
    least as strict)."""
    import numpy as np

    with pytest.raises(AssertionError, match="driver canonicalizer"):
        driver_canonicalize_check(
            ["k", "vals"], [(1, [1, 2]), (2, [3])]
        )
    with pytest.raises(AssertionError, match="driver canonicalizer"):
        driver_canonicalize_check(
            ["k", "vals"], [(1, np.array([1.0, 2.0])), (2, np.array([3.0]))]
        )
    # Scalar shapes (incl. None/NaN) must keep passing.
    driver_canonicalize_check(
        ["a", "b"], [(1, "x"), (None, "y"), (2, None)]
    )


# ---------------------------------------------------------------------------
# The two rows-only-by-policy entries still get VALUE constraints locally:
# "rows-only" exempts them from bit-equality with the oracle, not from
# being right.
# ---------------------------------------------------------------------------

def test_approx_count_distinct_within_5pct_of_exact(spark):
    """HLL++ at rsd=0.02 must land within ±5% of the exact distinct count
    per group (measured: ≤1% at sf0.001/sf0.01 — 5% leaves sketch noise
    headroom without ever accepting a wrong-shape estimate)."""
    approx = {
        r.l_linestatus: r.approx_parts
        for r in harness.REGISTRY["approx_count_distinct"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    exact = {
        r.l_linestatus: r.n_parts
        for r in harness.REGISTRY["count_distinct_by_group"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    assert set(approx) == set(exact) and exact
    for grp, n in exact.items():
        assert abs(approx[grp] - n) <= 0.05 * n, (grp, approx[grp], n)


def test_trained_ivf_recall_floor(spark):
    """Trained-centroid IVF top-10 must keep recall ≥ 0.8 against exact
    brute-force cosine top-10 (measured: 1.0 at sf0.001, 0.9 at sf0.01 —
    2-probe of 8 trained cells can drop a boundary neighbor, but an
    implementation bug drops most of them)."""
    from pyspark.sql import functions as F

    from etl_tj_project_spark.operators import similarity as sim
    from etl_tj_project_spark.sources.testdata import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    exact_ids = {r.vec_id for r in sim.brute_force_topk(e, q, k=10).collect()}
    trained_ids = {
        r.vec_id
        for r in harness.REGISTRY["ann_ivf_trained_topk"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    assert len(exact_ids) == 10
    assert len(trained_ids & exact_ids) / 10 >= 0.8


def test_kmv_estimate_within_30pct_of_exact(spark):
    """The KMV (k=64) estimate must land within ±30% of the exact
    distinct count per group (theoretical relative stderr is
    1/sqrt(k-2) ~= 12.7%; 30% leaves two-sigma-plus headroom without
    accepting a wrong-shape estimate). Unlike HLL this sketch is
    oracle-hash-checked too — this test pins VALUE quality, the hash
    pins determinism."""
    est = {
        r.l_linestatus: r.est_distinct
        for r in harness.REGISTRY["approx_distinct_kmv"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    from pyspark.sql import functions as F

    from etl_tj_project_spark.sources.testdata import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    exact = {
        r.l_linestatus: r.n
        for r in li.groupBy("l_linestatus")
        .agg(F.count_distinct("l_partkey").alias("n"))
        .collect()
    }
    assert set(est) == set(exact) and exact
    for grp, n in exact.items():
        assert abs(est[grp] - n) <= 0.30 * n, (grp, est[grp], n)


def test_pq_recall_floor(spark):
    """PQ-ADC top-10 with 4x oversample + exact rerank must keep recall
    >= 0.8 against exact brute-force cosine top-10 (the embeddings are
    planted-cluster data — see the kmeans recovery test — so a correct
    PQ keeps most true neighbors in the 40-candidate ADC set; an
    encode/LUT indexing bug drops nearly all of them)."""
    from pyspark.sql import functions as F

    from etl_tj_project_spark.operators import similarity as sim
    from etl_tj_project_spark.sources.testdata import load_table

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(F.col("vec_id") == 0)
    exact_ids = {r.vec_id for r in sim.brute_force_topk(e, q, k=10).collect()}
    pq_ids = {
        r.vec_id
        for r in harness.REGISTRY["ann_pq_trained_topk"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    assert len(exact_ids) == 10
    assert len(pq_ids & exact_ids) / 10 >= 0.8


def test_approx_percentile_rank_error_bounded(spark):
    """approx_percentile(accuracy=1e4) guarantees rank error <= n/1e4;
    assert each estimate's true rank is within that bound (+1 for
    discreteness) of the target rank — a VALUE constraint for the
    rows-only sketch entry, like the HLL/IVF bounds above."""
    rows = (
        harness.REGISTRY["approx_percentile_profile"]
        .spark(spark, SF_SMOKE)
        .collect()
    )
    assert rows
    from pyspark.sql import functions as F

    from etl_tj_project_spark.sources.testdata import load_table

    li = load_table(spark, SF_SMOKE, "lineitem")
    by_status = {
        r.l_linestatus: sorted(r.vals)
        for r in li.groupBy("l_linestatus")
        .agg(
            F.collect_list(
                F.col("l_extendedprice").cast("double")
            ).alias("vals")
        )
        .collect()
    }
    import bisect

    for r in rows:
        vals = by_status[r.l_linestatus]
        n = len(vals)
        assert n == r.n_rows
        tol = n / 10_000 + 1
        ests = (r.approx_p50, r.approx_p90, r.approx_p99)
        for target, est in zip((0.5, 0.9, 0.99), ests):
            lo = bisect.bisect_left(vals, est)
            hi = bisect.bisect_right(vals, est)
            target_rank = target * (n - 1)
            # est's occupied rank interval must overlap the target ± tol.
            assert lo - tol <= target_rank <= hi + tol, (
                r.l_linestatus, target, est, lo, hi, n
            )


def test_systematic_sample_point_budget_invariant(spark):
    """corpus_systematic_weighted_sample (round 9): per source, the
    selected multiplicities must sum EXACTLY to floor(total_chars /
    stride) — the systematic sampler's defining budget property (one
    point per full stride of cumulative mass, never more, never
    fewer)."""
    from etl_tj_project_spark.sources.testdata import load_table

    out = harness.REGISTRY["corpus_systematic_weighted_sample"].spark(
        spark, SF_SMOKE
    )
    got = {
        r["source"]: r["pts"]
        for r in out.groupBy("source")
        .agg(F.sum("n_points").alias("pts"))
        .collect()
    }
    want = {
        r["source"]: int(r["total"]) // 4096
        for r in load_table(spark, SF_SMOKE, "documents")
        .groupBy("source")
        .agg(F.sum(F.col("n_chars").cast("long")).alias("total"))
        .collect()
    }
    assert got == {s: v for s, v in want.items() if v > 0} or got == want


def test_paragraph_dedup_keeps_each_distinct_chunk_once(spark):
    """dedup_paragraph_chunks: across the corpus, the kept-chunk count
    must equal the number of DISTINCT chunk texts — first-occurrence
    dedup keeps exactly one copy of every distinct chunk, and document
    reassembly must not drop or duplicate any survivor."""
    from etl_tj_project_spark.sources.testdata import load_table

    out = harness.REGISTRY["dedup_paragraph_chunks"].spark(spark, SF_SMOKE)
    total_kept = out.agg(F.sum("n_kept")).collect()[0][0]
    d = load_table(spark, SF_SMOKE, "documents")
    ws = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(ws) / F.lit(12.0)).cast("int")
    distinct_chunks = (
        d.select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(0), n_chunks - 1),
                    lambda i: F.array_join(F.slice(ws, i * 12 + 1, 12), " "),
                )
            ).alias("c")
        )
        .select("c")
        .distinct()
        .count()
    )
    assert total_kept == distinct_chunks


def test_cdc_apply_latest_deletes_win(spark):
    """cdc_apply_latest: a user whose LATEST event is an 'error'
    (mapped to op D) must be absent from the applied state; every
    other user with events must be present exactly once."""
    from etl_tj_project_spark.sources.testdata import load_table

    out = harness.REGISTRY["cdc_apply_latest"].spark(spark, SF_SMOKE)
    assert out.groupBy("user_id").count().filter("count > 1").count() == 0
    ev = load_table(spark, SF_SMOKE, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.unix_micros("ts").desc(), F.col("event_id").desc()
    )
    latest = (
        ev.withColumn("rn", F.row_number().over(w))
        .filter("rn = 1")
        .select("user_id", "event_type")
    )
    deleted = {r["user_id"] for r in latest.filter("event_type = 'error'").collect()}
    surviving = {r["user_id"] for r in out.select("user_id").collect()}
    assert deleted.isdisjoint(surviving)
    kept = {r["user_id"] for r in latest.filter("event_type <> 'error'").collect()}
    assert surviving == kept


def test_partition_checksum_detects_single_row_change(spark):
    """partition_content_checksum: flipping ONE row's content in one
    partition must change THAT partition's checksum and no other —
    the anti-entropy property the op exists for."""
    from etl_tj_project_spark.sources.testdata import load_table

    base = harness.REGISTRY["partition_content_checksum"].spark(
        spark, SF_SMOKE
    )
    ev = load_table(spark, SF_SMOKE, "events")
    first_id = ev.agg(F.min("event_id")).collect()[0][0]
    mutated = ev.withColumn(
        "event_type",
        F.when(F.col("event_id") == first_id, F.lit("__tampered__"))
        .otherwise(F.col("event_type")),
    )
    canon = F.concat_ws(
        "|",
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.col("user_id").cast("string"),
    )
    h32 = F.conv(
        F.substring(F.md5(canon.cast("binary")), 1, 8), 16, 10
    ).cast("long")
    mut = mutated.groupBy(F.col("ts").cast("date").alias("day")).agg(
        F.sum(h32).alias("content_checksum")
    )
    diff = (
        base.select("day", "content_checksum")
        .join(mut.withColumnRenamed("content_checksum", "mut_sum"), "day")
        .filter(F.col("content_checksum") != F.col("mut_sum"))
        .count()
    )
    assert diff == 1


def test_driver_window_leads_with_never_attested_entries():
    """Rule (b) of the window policy, pinned (round 15 — the other
    half of the r13/r14 register-after-proof slip): every oracle-backed
    registry entry with NO driver CORRECTNESS row in any round before
    WINDOW_ROUND must occupy a window slot, or it can never receive its
    first attestation. The replay tripwire (test_driver_contract)
    guards the committed replay log; this guards the window
    composition itself."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    attested: set[str] = set()
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        import re

        rnd = int(re.search(r"CORRECTNESS_r(\d+)\.json$", path).group(1))
        if rnd >= harness.WINDOW_ROUND:
            continue
        with open(path) as fh:
            attested.update(json.load(fh).keys())
    never = {
        n
        for n, e in harness.REGISTRY.items()
        if e.oracle is not None and n not in attested
    }
    missing = never - set(harness.DRIVER_WINDOW)
    assert not missing, (
        f"never-attested entries absent from DRIVER_WINDOW (they can "
        f"never get their first driver row): {sorted(missing)}"
    )
