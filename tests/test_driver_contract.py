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
