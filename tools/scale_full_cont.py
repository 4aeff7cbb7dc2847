"""Continuation of tools/scale_full.py after the round-14 PPJoin/array-
verify rewrite: measure the queries the first pass had not finished
(the old Jaccard verify ran >50 min at sf1.0 before the rewrite) plus a
re-measure of the two rewritten containment/Jaccard plans, then merge
with the first pass's salvaged RESULT rows into the final JSON record.

Usage: python tools/scale_full_cont.py <first_pass_log> <out_json>
"""

from __future__ import annotations

import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REMEASURE = [
    "dedup_containment_ngram",      # array-verify rewrite landed after pass 1
    "dedup_prefix_filter_jaccard",  # never finished pre-rewrite
    "ann_knn_join_topk",
    "scd2_apply_changes",
]

_ROW = re.compile(
    r"^RESULT (\S+) sf0\.1=([\d.]+) sf1\.0=([\d.]+) ratio=([\d.]+)"
    r" inflated=(True|False)"
)


def main() -> None:
    from pyspark.sql import SparkSession

    import bench
    from etl_tj_project_spark import harness
    from tools.scale_full import INFLATED_TABLES, _entry_tables
    from tools.scale_proof import SRC, build_sf1

    log_path, out_path = sys.argv[1], sys.argv[2]
    salvaged: dict[str, dict] = {}
    with open(log_path) as fh:
        for ln in fh:
            m = _ROW.match(ln.strip())
            if m:
                salvaged[m.group(1)] = {
                    "sf0.1": float(m.group(2)),
                    "sf1.0": float(m.group(3)),
                    "ratio": float(m.group(4)),
                    "inflated_input": m.group(5) == "True",
                }
    for n in REMEASURE:
        salvaged.pop(n, None)

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

    calib_pre = bench._cpu_calibration_parallel()
    work = tempfile.mkdtemp(prefix="tj_sf1_cont_")
    out = dict(salvaged)
    try:
        t0 = time.perf_counter()
        build_sf1(spark, work)
        build_sec = round(time.perf_counter() - t0, 1)
        for n in REMEASURE:
            force(harness.REGISTRY[n].spark(spark, "/root/testdata/sf0.001"))
        run_anchor = min(calib_pre, bench._cpu_probe_parallel())
        contended = 0
        probe = bench._cpu_probe_parallel()

        def bracketed(n: str, d: str, pre: float) -> tuple[float, float]:
            nonlocal run_anchor, contended
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                force(harness.REGISTRY[n].spark(spark, d))
                best = min(best, time.perf_counter() - t0)
            post = bench._cpu_probe_parallel()
            run_anchor = min(run_anchor, post)
            if max(pre, post) > 1.30 * run_anchor:
                contended += 1
                t0 = time.perf_counter()
                force(harness.REGISTRY[n].spark(spark, d))
                best = min(best, time.perf_counter() - t0)
            return best, post

        for n in REMEASURE:
            s01, probe = bracketed(n, SRC, probe)
            s10, probe = bracketed(n, work, probe)
            tabs = _entry_tables(harness.REGISTRY[n].spark)
            inflated = bool(tabs & INFLATED_TABLES) or not tabs
            out[n] = {
                "sf0.1": round(s01, 4),
                "sf1.0": round(s10, 4),
                "ratio": round(s10 / max(s01, 1e-9), 2),
                "inflated_input": inflated,
            }
            print(
                f"RESULT {n} sf0.1={out[n]['sf0.1']} sf1.0={out[n]['sf1.0']}"
                f" ratio={out[n]['ratio']} inflated={inflated}",
                flush=True,
            )
        calib_post = bench._cpu_calibration_parallel()
        infl = {k: v for k, v in out.items() if v["inflated_input"]}
        rec = {
            "queries": out,
            "n_queries": len(out),
            "build_sec": build_sec,
            "calib_par_pre": calib_pre,
            "calib_par_post": calib_post,
            "contended_retries_cont": contended,
            "note": (
                "54 rows salvaged from the pass-1 log; "
                f"{REMEASURE} (re)measured after the round-14 "
                "PPJoin/array-verify rewrite in a second session"
            ),
            "total_sf0.1": round(sum(v["sf0.1"] for v in out.values()), 2),
            "total_sf1.0": round(sum(v["sf1.0"] for v in out.values()), 2),
            "total_sf1.0_inflated_only": round(
                sum(v["sf1.0"] for v in infl.values()), 2
            ),
            "median_ratio_inflated": round(
                sorted(v["ratio"] for v in infl.values())[len(infl) // 2], 2
            ),
        }
        print("RESULT SUMMARY " + json.dumps(
            {k: v for k, v in rec.items() if k != "queries"}), flush=True)
        with open(out_path, "w") as fh:
            json.dump(rec, fh, indent=1, sort_keys=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
