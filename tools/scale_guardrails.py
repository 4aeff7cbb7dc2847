"""Round-15 guardrail rung (VERDICT r14 items 4 + 5): measure the
canonicalize-first guardrails against their direct counterparts under
copy inflation, at two regimes:

1. **Exact-copy strain at sf0.1, replicas=4** — the deterministic
   regime: `strain.run_jaccard_guardrail_strain` and
   `strain.run_triangle_guardrail_strain` assert the replicas^2 output
   floor / the clique-lift closed form / identical guardrail output,
   and record the direct-vs-guardrail walls.

2. **The §26 corpus: 10x key-shifted near-dup inflation of sf0.1**
   (`tools/scale_proof.build_sf1` — one sentinel token per copy, the
   same corpus on which §26 measured direct prefix-filter Jaccard at
   873.7 s / 197.6M pairs and direct triangle counting at 342 s) —
   run the two REGISTERED guardrail entries end-to-end
   (`dedup_jaccard_canonical`, `graph_triangle_count_canonical`) at
   sf0.1 and at the inflation, recording walls, output sizes, and the
   ratio vs the §26 direct rows.

Usage: python tools/scale_guardrails.py [out_json]
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

    import bench
    from etl_tj_project_spark import harness, strain
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

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    out: dict = {"calib_par_pre": bench._cpu_calibration_parallel()}
    sf01 = "/root/testdata/sf0.1"

    # ---- regime 1: exact-copy strain at sf0.1, replicas=4 ----------
    t0 = time.perf_counter()
    out["jaccard_strain_sf01_x4"] = strain.run_jaccard_guardrail_strain(
        spark, sf01, replicas=4
    )
    out["jaccard_strain_wall"] = round(time.perf_counter() - t0, 1)
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    out["triangle_strain_sf01_x4"] = strain.run_triangle_guardrail_strain(
        spark, sf01, replicas=4
    )
    out["triangle_strain_wall"] = round(time.perf_counter() - t0, 1)
    spark.catalog.clearCache()

    # ---- regime 2: the §26 near-dup 10x corpus ---------------------
    work = tempfile.mkdtemp(prefix="tj_guardrail_sf1_")
    try:
        t0 = time.perf_counter()
        build_sf1(spark, work)
        out["build_sec"] = round(time.perf_counter() - t0, 1)

        for name in (
            "dedup_jaccard_canonical",
            "graph_triangle_count_canonical",
            # Round 16: the two LCC entries join the rung (VERDICT r15
            # item 3). Order matters and is the production order: the
            # FIRST entry pays the shared family-manifest compute +
            # memo write, the rest read the artifact.
            "graph_residual_clustering_coefficient",
            "dedup_lcc_second_pass",
        ):
            fn = harness.REGISTRY[name].spark
            rec: dict = {}
            # warm codegen at smoke scale; a warm-up failure must be
            # VISIBLE in the artifact (ADVICE r15) — a silently-cold
            # first timing skews the recorded wall, and the entry's
            # real failure should surface here, not three stages later.
            try:
                force(fn(spark, "/root/testdata/sf0.001"))
            except Exception as e:  # noqa: BLE001
                print(f"warm-up failed for {name}: {e!r}")
                rec["warm_failed"] = repr(e)
            spark.catalog.clearCache()
            pre = bench._cpu_calibration_parallel()
            t0 = time.perf_counter()
            df = fn(spark, sf01)
            rows01 = df.count()
            rec["sf01_sec"] = round(time.perf_counter() - t0, 2)
            rec["sf01_rows"] = rows01
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            df = fn(spark, work)
            rows10 = df.count()
            rec["sf1_sec"] = round(time.perf_counter() - t0, 2)
            rec["sf1_rows"] = rows10
            post = bench._cpu_calibration_parallel()
            rec["calib_par_bracket"] = [pre, post]
            rec["ratio"] = round(rec["sf1_sec"] / max(rec["sf01_sec"], 1e-9), 2)
            out[name] = rec
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(work, ignore_errors=True)

    out["calib_par_post"] = bench._cpu_calibration_parallel()
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scale_guardrails_r16.json"
    )
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
