"""Round-17 bracketed re-measure (VERDICT r16 item 4) of the two
headline queries drifting upward across r14-r16 with no source change:
boilerplate_chunk_removal (floor 0.66, r16 1.28 = 1.94x) and
dedup_incremental_lsh_candidates (floor 0.92, r16 1.50 = 1.63x).

Context from the ledger: BOTH floors date to round 13 — the round the
two untouched controls ALSO hit their all-time floors (j2 0.17, a3
0.19; r16 read them at 0.25/0.32 = 1.47x/1.68x). The null hypothesis
is therefore host-wide ambient drift, not a query-specific regression.
Protocol = the q10/q21ish re-measure: best-of-N on an idle host, the
two untouched controls timed identically, parallel-calibration
brackets around every block, plus a 10x-less-data probe (sf0.01, same
plan) per subject to separate fixed per-query latency from data-path
cost.

Usage: python tools/bracket_drift_r17.py [out_json]
Run on an idle host (bench._cpu_calibration_parallel() ~ 0.08 first).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4
FLOORS = {
    "boilerplate_chunk_removal": 0.66,
    "dedup_incremental_lsh_candidates": 0.92,
    "j2_left_join_code_to_name": 0.17,
    "a3_agg_by_tariff": 0.19,
}
SUBJECTS = [
    "boilerplate_chunk_removal",
    "dedup_incremental_lsh_candidates",
]
QUERIES = SUBJECTS + [
    "j2_left_join_code_to_name",   # untouched control
    "a3_agg_by_tariff",            # untouched control
]


def main() -> None:
    import bench
    from etl_tj_project_spark import harness
    from etl_tj_project_spark.session import get_spark

    spark = get_spark("tj_bracket_drift")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    sf01 = "/root/testdata/sf0.1"
    out: dict = {"reps": REPS, "floors": FLOORS}
    for name in QUERIES:
        force(harness.REGISTRY[name].spark(spark, "/root/testdata/sf0.001"))
    spark.catalog.clearCache()

    for name in QUERIES:
        fn = harness.REGISTRY[name].spark
        pre = bench._cpu_calibration_parallel()
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            force(fn(spark, sf01))
            walls.append(round(time.perf_counter() - t0, 4))
        post = bench._cpu_calibration_parallel()
        best = min(walls)
        out[name] = {
            "walls": walls,
            "best": best,
            "vs_floor": round(best / FLOORS[name], 3),
            "calib_par_bracket": [pre, post],
        }
        spark.catalog.clearCache()

    # Fixed-latency probe: same plan, 10x less data. A subject whose
    # sf0.01 wall ~= its sf0.1 wall is latency-bound (planning +
    # broadcast builds), the q10 mechanism; one whose wall scales with
    # data is paying in the data path.
    for name in SUBJECTS:
        fn = harness.REGISTRY[name].spark
        walls = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            force(fn(spark, "/root/testdata/sf0.01"))
            walls.append(round(time.perf_counter() - t0, 4))
        out[name]["sf001_best"] = min(walls)
        spark.catalog.clearCache()

    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bracket_drift_r17.json"
    )
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
