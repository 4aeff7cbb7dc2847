"""Round-16 decomposition of the canonicalize stage's scaling constant
(VERDICT r15 item 1): SCALE.md §27 measured both guardrail entries
growing 6.4-8.2x wall for 10x data while the suite-wide median is
1.49x, with the canonicalize stage (LSH -> CC -> survivor window)
dominating. This tool times each stage SEPARATELY at sf0.1 and on the
§26 10x near-dup corpus, records the stage's output cardinality, and
then times the guardrail entries end-to-end WITH the round-16 shared
manifest artifact — naming where the super-unit ratio lives and what
the sharing lever recovers.

Stages, in pipeline order (each forced by count, cache cleared
between):
  lsh4      — family-graph candidate pairs (bands=4): band gen +
              self-join + distinct. The candidate edge list is
              quadratic in family size (a k-copy family contributes
              ~C(k,2) pairs), so this is the prime suspect.
  cc        — connected components over those pairs (records the
              size-dispatched strategy actually chosen).
  manifest  — survivor window + member counts (the
              canonicalize_near_dup_clusters tail).
  lsh8      — survivor residual pairs (bands=8) for the graph entries.
  jaccard   — prefix-filtered Jaccard over survivors (the
              dedup_jaccard_canonical tail).
  triangle  — degree-oriented triangle count over the residual pairs
              (the graph_triangle_count_canonical tail).
  entry_*   — the three registered guardrail entries end-to-end,
              run back-to-back so the 2nd/3rd hit the shared manifest
              memo (the r16 lever measured as a user sees it).

Usage: python tools/scale_canonicalize_decompose.py [out_json]
Run on an idle host (bench._cpu_calibration_parallel() ~ 0.08 first).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import bench
    from etl_tj_project_spark import harness
    from etl_tj_project_spark.operators import dedup as dd
    from etl_tj_project_spark.operators.graph import triangle_count_oriented
    from etl_tj_project_spark.sources.testdata import load_table
    from tools.scale_proof import build_sf1

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"calib_par_pre": bench._cpu_calibration_parallel()}

    def timed(fn):
        t0 = time.perf_counter()
        v = fn()
        return round(time.perf_counter() - t0, 2), v

    def profile(sf_dir: str) -> dict:
        rec: dict = {}
        d = load_table(spark, sf_dir, "documents").select(
            "doc_id", "text", "n_chars"
        )
        rec["docs"] = d.count()

        # Stage 1: family-graph LSH candidate pairs (bands=4).
        pairs4 = dd.lsh_candidate_pairs(d, "doc_id", "text", 8, 4)
        pairs4 = dd._persist_once(pairs4)
        rec["lsh4_sec"], _ = timed(pairs4.count)
        rec["lsh4_pairs"] = pairs4.count()

        # Stage 1b (round-16 lever): star edges for the SAME graph —
        # O(docs x bands) regardless of duplicate density.
        stars = dd.lsh_star_edges(d, "doc_id", "text", 8, 4)
        stars = dd._persist_once(stars)
        rec["star_sec"], _ = timed(stars.count)
        rec["star_edges"] = stars.count()
        t0 = time.perf_counter()
        star_labels = dd.connected_components(stars, "doc_a", "doc_b")
        star_labels = dd._persist_once(star_labels)
        rec["cc_star_nodes"] = star_labels.count()
        rec["cc_star_sec"] = round(time.perf_counter() - t0, 2)

        # Stage 2: connected components over the family pairs.
        sym_edges = 2 * rec["lsh4_pairs"]
        rec["cc_strategy"] = (
            "local" if sym_edges <= dd._CC_SINGLE_TASK_EDGES else "distributed"
        )
        t0 = time.perf_counter()
        labels = dd.connected_components(pairs4, "doc_a", "doc_b")
        labels = dd._persist_once(labels)
        n_labeled = labels.count()
        rec["cc_sec"] = round(time.perf_counter() - t0, 2)
        rec["cc_nodes"] = n_labeled

        # Stage 3: survivor window + member counts (manifest tail).
        def manifest_tail():
            from pyspark.sql import Window as _W

            full = (
                d.select("doc_id", "n_chars")
                .join(labels, d["doc_id"] == labels["node"], "left")
                .select(
                    "doc_id",
                    "n_chars",
                    F.coalesce(F.col("component_id"), F.col("doc_id")).alias(
                        "component_id"
                    ),
                )
            )
            w = _W.partitionBy("component_id").orderBy(
                F.col("n_chars").desc(), "doc_id"
            )
            members = full.groupBy("component_id").agg(
                F.count(F.lit(1)).cast("long").alias("n_members")
            )
            canon = (
                full.withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select(
                    "component_id",
                    F.col("doc_id").alias("canonical_doc_id"),
                    F.col("n_chars").cast("long").alias("canonical_n_chars"),
                )
            )
            return canon.join(members, "component_id")

        manifest = dd._persist_once(manifest_tail())
        rec["manifest_sec"], rec["survivors"] = timed(manifest.count)

        reps = dd._persist_once(
            d.join(
                manifest.select(F.col("canonical_doc_id").alias("doc_id")),
                "doc_id",
                "left_semi",
            )
        )
        reps.count()

        # Stage 4: survivor residual pairs (bands=8).
        pairs8 = dd.lsh_candidate_pairs(reps, "doc_id", "text", 8, 8)
        pairs8 = dd._persist_once(pairs8)
        rec["lsh8_sec"], _ = timed(pairs8.count)
        rec["lsh8_pairs"] = pairs8.count()

        # Stage 5: the two downstream consumers.
        rec["jaccard_sec"], rec["jaccard_pairs"] = timed(
            lambda: dd.prefix_filter_jaccard_pairs(
                reps, "doc_id", "text", 4, 5
            ).count()
        )
        rec["triangle_sec"], rec["triangles"] = timed(
            lambda: triangle_count_oriented(pairs8).first()[0]
        )

        for fr in (pairs4, stars, star_labels, labels, manifest, reps,
                   pairs8):
            fr.unpersist()
        dd.release_components(labels)
        dd.release_components(star_labels)
        spark.catalog.clearCache()
        return rec

    def entries_e2e(sf_dir: str) -> dict:
        """The three guardrail entries back-to-back: #1 pays the
        manifest compute + memo write, #2/#3 read the artifact."""
        rec = {}
        for name in (
            "dedup_jaccard_canonical",
            "graph_triangle_count_canonical",
            "graph_residual_clustering_coefficient",
        ):
            fn = harness.REGISTRY[name].spark
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            rows = df.count()
            rec[name] = {
                "sec": round(time.perf_counter() - t0, 2),
                "rows": rows,
            }
            spark.catalog.clearCache()
        return rec

    sf01 = "/root/testdata/sf0.1"
    out["sf01"] = profile(sf01)
    out["sf01_entries"] = entries_e2e(sf01)

    work = tempfile.mkdtemp(prefix="tj_canon_decomp_sf1_")
    try:
        t0 = time.perf_counter()
        build_sf1(spark, work)
        out["build_sec"] = round(time.perf_counter() - t0, 1)
        out["sf1"] = profile(work)
        out["sf1_entries"] = entries_e2e(work)
    finally:
        shutil.rmtree(work, ignore_errors=True)

    # Stage ratios (sf1/sf01) for the report.
    ratios = {}
    for k in ("lsh4_sec", "star_sec", "cc_sec", "cc_star_sec",
              "manifest_sec", "lsh8_sec", "jaccard_sec", "triangle_sec"):
        a, b = out["sf01"].get(k), out["sf1"].get(k)
        if a and b:
            ratios[k] = round(b / max(a, 1e-9), 2)
    out["stage_ratios_sf1_over_sf01"] = ratios

    out["calib_par_post"] = bench._cpu_calibration_parallel()
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "scale_canonicalize_decompose_r16.json",
    )
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
