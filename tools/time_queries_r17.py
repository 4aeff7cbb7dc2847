"""Time a subset of headline queries with the bench's exact methodology.

Usage:
    python tools/time_queries_r17.py [-r REPS] <name> [name ...]

Each query: warmup once at sf0.001 (JIT/codegen), then REPS (default 3)
noop-sink timings at $SPARK_GRAFT_SF_DIR (default sf0.1); prints min/all.
Jobs are labelled (guide §1.5). One JSON line per query to stdout with
prefix TIME so output survives progress-bar interleaving:

    TIME {"name": ..., "best": ..., "reps": [...]}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = sys.argv[1:]
    reps = 3
    if args and args[0] == "-r":
        reps = int(args[1])
        args = args[2:]
    names = args

    from etl_tj_project_spark import harness
    from etl_tj_project_spark.session import get_spark

    # Fail fast on a mistyped query name (ADVICE r17): the warmup's
    # broad `except` used to swallow the KeyError and surface it only
    # in the timed loop, losing every earlier TIME line.
    unknown = [n for n in names if n not in harness.REGISTRY]
    if unknown:
        raise SystemExit(f"unknown query names: {unknown}")

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("time_queries_r17")

    def force(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    warm_dir = "/root/testdata/sf0.001"
    for n in names:
        if os.path.isdir(warm_dir):
            try:
                force(harness.REGISTRY[n].spark(spark, warm_dir))
            except Exception:
                pass
        times = []
        for i in range(reps):
            spark.sparkContext.setJobDescription(f"{n} rep{i}")
            t0 = time.perf_counter()
            force(harness.REGISTRY[n].spark(spark, sf_dir))
            times.append(round(time.perf_counter() - t0, 4))
        spark.sparkContext.setJobDescription(None)
        print(
            "TIME "
            + json.dumps({"name": n, "best": min(times), "reps": times}),
            flush=True,
        )
    spark.stop()


if __name__ == "__main__":
    main()
