"""Full-headline sf1.0 rung (VERDICT r12 item 5, carried to r14): run
EVERY bench HEADLINE query at a 10x key-shifted inflation of sf0.1 and
at sf0.1 itself, interleaved per query in one session, each timing
wrapped in bench.py's per-query contention brackets (chained all-cores
probes, 1.30x threshold, one bracketed retry) — the "bracketed
defense". Writes the complete per-query sf0.1 / sf1.0 / ratio record.

Inflation reuses tools/scale_proof.build_sf1 (l_orderkey/o_orderkey
shift together, doc_id shifts with a sentinel token per copy, dims
byte-copied). events/embeddings are byte-copied UNinflated — entries
whose input is only those tables are expected at ratio ~1 and are
annotated `inflated_input: false` (detected from the entry source's
load_table calls), not read as scaling evidence.

Usage: python tools/scale_full.py [out_json]
Run on an idle host (bench._cpu_calibration_parallel() ~ 0.08 first).
"""

from __future__ import annotations

import inspect
import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

INFLATED_TABLES = {"lineitem", "orders", "documents"}
_LOAD_RE = re.compile(r"load_table\(\s*\w+\s*,\s*\w+\s*,\s*\"(\w+)\"")


def _entry_tables(fn) -> set[str]:
    """Tables an entry reads, from its source's load_table literals.
    Follows one level of helper indirection (entries that call pack
    helpers); unresolvable sources conservatively count as inflated."""
    try:
        src = inspect.getsource(fn)
    except (OSError, TypeError):
        return set(INFLATED_TABLES)
    return set(_LOAD_RE.findall(src))


def main() -> None:
    from pyspark.sql import SparkSession

    import bench
    from etl_tj_project_spark import harness
    from tools.scale_proof import SRC, build_sf1

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

    names = [n for n in bench.HEADLINE if n in harness.REGISTRY]
    calib_pre = bench._cpu_calibration_parallel()
    work = tempfile.mkdtemp(prefix="tj_sf1_full_")
    try:
        t0 = time.perf_counter()
        build_sf1(spark, work)
        build_sec = round(time.perf_counter() - t0, 1)

        # Warm codegen at smoke scale.
        warm = "/root/testdata/sf0.001"
        for n in names:
            try:
                force(harness.REGISTRY[n].spark(spark, warm))
            except Exception:
                pass

        run_anchor = min(calib_pre, bench._cpu_probe_parallel())
        contended = 0

        # Shared-artifact cold/warm accounting (ADVICE r16, mirrored
        # from bench.py): the guardrail family's snapshot artifacts
        # make per-query timings order-dependent — only the first
        # consumer at each scale dir pays the artifact compute. Flag
        # each timing cold (paid a miss) / warm (FileScan only) so the
        # SCALE.md decomposition can condition on who paid.
        from etl_tj_project_spark import harness_r12 as _hr12

        artifact_flags: dict[str, str] = {}

        def bracketed(n: str, d: str, pre: float) -> tuple[float, float]:
            """Best-of-2 wall for query n at dir d, with the chained
            contention bracket; returns (sec, post_probe)."""
            nonlocal run_anchor, contended
            best = float("inf")
            ev0 = len(_hr12.ARTIFACT_EVENTS)
            for _ in range(2):
                t0 = time.perf_counter()
                force(harness.REGISTRY[n].spark(spark, d))
                best = min(best, time.perf_counter() - t0)
            events = _hr12.ARTIFACT_EVENTS[ev0:]
            if events:
                artifact_flags[f"{n}@{d}"] = (
                    "cold"
                    if any(kind == "miss" for _, kind in events)
                    else "warm"
                )
            post = bench._cpu_probe_parallel()
            run_anchor = min(run_anchor, post)
            if max(pre, post) > 1.30 * run_anchor:
                contended += 1
                t0 = time.perf_counter()
                force(harness.REGISTRY[n].spark(spark, d))
                best = min(best, time.perf_counter() - t0)
            return best, post

        out: dict[str, dict] = {}
        probe = bench._cpu_probe_parallel()
        run_anchor = min(run_anchor, probe)
        for n in names:
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
            f01 = artifact_flags.get(f"{n}@{SRC}")
            f10 = artifact_flags.get(f"{n}@{work}")
            if f01 or f10:
                out[n]["artifact_flags"] = {
                    "sf0.1": f01,
                    "sf1.0": f10,
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
            "contended_retries": contended,
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
        if len(sys.argv) > 1:
            with open(sys.argv[1], "w") as fh:
                json.dump(rec, fh, indent=1, sort_keys=True)
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
