"""Round-16 bracketed re-measure of tpch_q10_returned_items (VERDICT
r15 item 2): the only headline query still >2x its all-time floor
(2.05x raw in the r15 record). Protocol = the §27 q21ish re-measure:
best-of-N on an idle host, two UNTOUCHED controls (j2, a3) timed the
same way, parallel-calibration brackets around every block, so the
residual decomposes into plan vs ambient.

Plan audit first (r16, sf0.1 static plan): 4 exchanges = 3 broadcasts
(orders post-filter, customer, nation) + the single group-key shuffle,
ONE lineitem scan, partial agg map-side, TakeOrderedAndProject — no
missed ReusedExchange (there is no repeated subtree to reuse, unlike
q21ish), nothing left on the table at this shape. If the bracketed
number still reads >~1.1x floor calibration-normalized, the residual
is the machine.

Usage: python tools/bracket_q10_r16.py [out_json]
Run on an idle host (bench._cpu_calibration_parallel() ~ 0.08 first).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPS = 4
QUERIES = [
    "tpch_q10_returned_items",   # the subject
    "j2_left_join_code_to_name",  # untouched control (floor 0.17)
    "a3_agg_by_tariff",           # untouched control (floor 0.19)
]


def main() -> None:
    import bench
    from etl_tj_project_spark import harness
    from etl_tj_project_spark.session import get_spark

    spark = get_spark("tj_bracket_q10")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    sf01 = "/root/testdata/sf0.1"
    out: dict = {"reps": REPS}
    # warm codegen at smoke scale
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
        out[name] = {
            "walls": walls,
            "best": min(walls),
            "calib_par_bracket": [pre, post],
        }
        spark.catalog.clearCache()
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bracket_q10_r16.json"
    )
    with open(dst, "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out, indent=1))
    spark.stop()


if __name__ == "__main__":
    main()
