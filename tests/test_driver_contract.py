"""Driver-contract robustness: the grading harness imports
``__spark_entry__`` with ITS OWN SparkSession from an arbitrary cwd,
with the repo reachable only via a ``sys.path`` insert. Driver-side
planning survives that; the failure mode this pins down is WORKER-side:
python workers don't inherit the driver's ``sys.path``, so any
mapInPandas closure that references a module-level symbol of this
package dies in ``cloudpickle.loads`` with
``ModuleNotFoundError: etl_tj_project_spark`` — unless session.tune()
ships the package via ``addPyFile`` (the local-mode twin of
``spark-submit --py-files``).

Runs in a subprocess because the point is a fresh interpreter whose cwd
and PYTHONPATH do NOT include the repo.
"""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import sys
sys.path.insert(0, {repo!r})
import importlib
from pyspark.sql import SparkSession

m = importlib.import_module("__spark_entry__")
spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
q = m.queries()
# multimodal_decode's stub closure references a module-level function —
# the exact shape that needs the shipped package on the workers.
n = q["multimodal_decode"](spark, "/root/testdata/sf0.001").count()
assert n > 0, n
print("WORKER_IMPORT_OK", n)
"""


def test_worker_unpickle_without_repo_on_worker_path(tmp_path):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the harness may or may not set it; worst case
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT.format(repo=REPO)],
        cwd=str(tmp_path),  # NOT the repo root
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert "WORKER_IMPORT_OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-2000:]}"
    )


def test_coverage_md_totals_match_registry():
    """VERDICT r7 item 5: COVERAGE.md's totals line went stale once
    (177 vs the real 238). Pin the stated totals to the live registry
    so the doc can never drift silently again."""
    import re

    from etl_tj_project_spark import harness

    text = open(os.path.join(REPO, "COVERAGE.md")).read()
    m = re.search(
        r"Totals: \*\*(\d+) registered queries, (\d+) with DuckDB-oracle",
        text,
    )
    assert m, "COVERAGE.md totals line missing or reformatted"
    stated_total, stated_oracle = int(m.group(1)), int(m.group(2))
    real_total = len(harness.REGISTRY)
    real_oracle = sum(
        1 for e in harness.REGISTRY.values() if e.oracle is not None
    )
    assert (stated_total, stated_oracle) == (real_total, real_oracle), (
        f"COVERAGE.md says {stated_total}/{stated_oracle}, registry has "
        f"{real_total}/{real_oracle} — update the totals line"
    )


def test_bench_headline_names_are_registered():
    """Every bench.py HEADLINE name must exist in the registry — a
    renamed entry silently shrinking the headline cohort would corrupt
    round-over-round comparisons."""
    import sys

    sys.path.insert(0, REPO)
    import bench

    from etl_tj_project_spark import harness

    missing = [n for n in bench.HEADLINE if n not in harness.REGISTRY]
    assert not missing, f"HEADLINE names not in registry: {missing}"


def test_bench_prev_calib_reader_survives_malformed_records(tmp_path):
    """The steal gate and drift retry read the newest parsed
    BENCH_r*.json; the reader must skip unparseable/parsed-null records
    (the r8 failure shape) and return None when nothing usable exists —
    never raise (a crashed bench run records NOTHING for the round)."""
    import json
    import sys

    sys.path.insert(0, REPO)
    import bench

    real = bench._prev_recorded_parallel_calib()
    assert real is None or isinstance(real, float)
    # Simulate the r8 shape in isolation: parsed null + junk + a good
    # record; the reader must pick the good one's value.
    orig = bench.os.path.dirname
    files = {
        "BENCH_r01.json": {"parsed": None},
        "BENCH_r02.json": {"parsed": {"cpu_calib_parallel_sec": 0.08}},
    }
    for name, content in files.items():
        (tmp_path / name).write_text(json.dumps(content))
    (tmp_path / "BENCH_r03.json").write_text("{not json")
    try:
        bench.os.path.dirname = lambda p: str(tmp_path)
        assert bench._prev_recorded_parallel_calib() == 0.08
    finally:
        bench.os.path.dirname = orig


def test_bench_headline_line_fits_driver_tail():
    """The headline object's compact JSON must stay under the 1700-char
    guard even with every current HEADLINE query at 4-decimal
    precision plus worst-case drift fields — the r8 'parsed: null'
    regression, pinned as arithmetic instead of hope. (bench.py also
    degrades precision at runtime if this ever grows past the guard;
    this test says the degradation path is not yet needed.)"""
    import json
    import sys

    sys.path.insert(0, REPO)
    import bench

    fake = {
        "metric": "headline_query_wall_clock_total",
        "value": 9999.9999,
        "unit": "sec",
        "queries": {n: 99.9999 for n in bench.HEADLINE},
        "sf": 0.1,
        "cpu_calib_sec": 0.0485,
        "cpu_calib_parallel_sec": 0.0878,
        "calib_normalized_total": 99999.9,
        "strain_sec": {k: 9999.9 for k in
                       ("cc", "ivf", "pq", "daily", "stream", "lsh",
                        "u2cold")},
        "calib_par_drift_vs_prev": 0.1234,
        "drift_rerun": True,
        "value_pass1": 9999.9999,
        "value_pass2": 9999.9999,
    }
    # Replay bench.py's actual degradation ladder: full precision,
    # then 2-decimal queries, then dropping strain_sec, then (round 12,
    # 52-query cohort) shedding every diagnostic field from the
    # driver-parsed line (they move to their own preceding JSON line) —
    # the FINAL rung must fit even at worst-case numeric widths.
    line = json.dumps(fake, separators=(",", ":"))
    if len(line) > 1700:
        fake["queries"] = {k: round(v, 2) for k, v in fake["queries"].items()}
        line = json.dumps(fake, separators=(",", ":"))
    if len(line) > 1700:
        fake.pop("strain_sec", None)
        line = json.dumps(fake, separators=(",", ":"))
    if len(line) > 1700:
        core = ("metric", "value", "unit", "queries", "sf")
        fake = {k: v for k, v in fake.items() if k in core}
        line = json.dumps(fake, separators=(",", ":"))
    if len(line) > 1950:
        # Rung 4 (round 16, 61-name cohort): integer-second queries,
        # gated at the REAL 1950 budget (the normal post-shedding
        # regime is 1700-1950 and keeps 2-decimal precision) — mirrors
        # bench.py exactly.
        fake["queries"] = {
            k: int(round(v)) for k, v in fake["queries"].items()
        }
        line = json.dumps(fake, separators=(",", ":"))
    # Capacity bound: the driver parses the last ~2000 chars of stdout,
    # and since round 14 the core line is bench.py's FINAL stdout write
    # (printed after spark.stop(), nothing can trail it), so the only
    # margin needed is the trailing newline — 1950 keeps 50 chars of
    # slack. The 57-name round-14 cohort bottoms out at 1838.
    assert len(line) <= 1950, (
        f"headline line bottoms out at {len(line)} chars even after "
        "degradation; trim HEADLINE or add a rung in bench.py"
    )
    # The driver contract core must SURVIVE the last rung intact.
    parsed = json.loads(line)
    assert set(parsed) >= {"metric", "value", "unit", "queries", "sf"}
    assert len(parsed["queries"]) == len(bench.HEADLINE)


def test_suite_and_driver_sessions_run_ansi_on(spark):
    """ANSI posture pin (VERDICT r11 item 6): Spark 4 defaults
    spark.sql.ansi.enabled=true and the grading driver uses a VANILLA
    session, so every oracle-parity replay already executes under ANSI
    — this test keeps it that way. If someone flips the suite session
    (or session.get_spark) to legacy mode, local green would stop
    matching driver behavior exactly where ANSI bites (failing casts,
    overflow, div-by-zero), which is why failable casts in query code
    must use try_* forms rather than rely on session conf."""
    assert spark.conf.get("spark.sql.ansi.enabled") == "true"

    from etl_tj_project_spark.session import get_spark

    # get_spark tunes shuffle/AQE knobs; it must NOT touch ANSI.
    import inspect

    src = inspect.getsource(get_spark)
    assert "ansi" not in src.lower()


def test_replay_log_covers_registry():
    """VERDICT r14 item 2: in BOTH r13 and r14 the final snapshot
    commit registered a new entry AFTER the round's full replay ran,
    leaving the newest entry with no committed proof row. This
    tripwire closes that loophole structurally: every name in
    ``harness.queries()`` must appear as ``RESULT OK`` in the NEWEST
    committed ``tools/replay_r*_final.log``, and that log's SUMMARY
    must record 0 fails. Consequence: registering an entry makes the
    suite red until a fresh full replay log is committed — the replay
    must be the LAST proof artifact of a round, never outrun by a
    registration."""
    import glob
    import re

    from etl_tj_project_spark import harness

    logs = glob.glob(os.path.join(REPO, "tools", "replay_r*_final.log"))
    assert logs, "no committed replay_r*_final.log found"
    newest = max(
        logs,
        key=lambda p: int(re.search(r"replay_r(\d+)", p).group(1)),
    )
    text = open(newest).read()
    ok = set(re.findall(r"^RESULT OK (\S+)$", text, re.M))
    missing = [n for n in harness.queries() if n not in ok]
    assert not missing, (
        f"{os.path.basename(newest)} lacks RESULT OK rows for "
        f"{missing} — run tools/replay_driver.py and commit the new "
        f"replay_r*_final.log AFTER the last registry change"
    )
    m = re.search(r"^RESULT SUMMARY fails: (\d+)", text, re.M)
    assert m, f"{os.path.basename(newest)} has no RESULT SUMMARY line"
    assert int(m.group(1)) == 0, (
        f"{os.path.basename(newest)} records {m.group(1)} replay fails"
    )
