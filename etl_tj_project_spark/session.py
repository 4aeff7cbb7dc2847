"""SparkSession construction and scale-oriented runtime configuration.

Two layers:

* :func:`get_spark` — builds a local session for tests/bench with the configs
  we would also set cluster-side (AQE, dynamic partition overwrite, Arrow).
* :func:`tune` — applies the *runtime-settable* subset to an externally
  provided session (the driver harness hands us its own ``SparkSession``;
  we must not assume builder-time control).

Scale notes (100 TB target):
* AQE owns runtime shuffle-partition coalescing and skew-join splitting, so
  a static ``spark.sql.shuffle.partitions`` only needs to be a sane upper
  bound (cluster-side you'd set it ~2-3x total cores).
* ``partitionOverwriteMode=dynamic`` makes the daily re-run idempotent per
  partition instead of truncating the whole table (SURVEY §2.10 notes the
  reference duplicates rows on re-run; we deliberately improve on that).
* ``parquet.nanosAsLong`` is required to scan nanosecond-timestamp parquet
  (the ``events`` table) — Spark has no TIMESTAMP(NANOS) type.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Confs that are safe + desirable to set on an already-running session.
RUNTIME_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.sources.partitionOverwriteMode": "dynamic",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # spark.sql.files.maxPartitionBytes stays at the 128 MB default: an
    # interleaved A/B at sf0.1 showed no wall-clock difference vs 4 MB
    # splits (the 11 MB fact files are page-cached and AQE coalesces),
    # and 128-256 MB is the right value on a real cluster — one split
    # per parquet row group.
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Python Data Source filter pushdown (sources/pyds.py) is opt-in in
    # Spark 4; without it a reader implementing pushFilters() errors.
    "spark.sql.python.filterPushdown.enabled": "true",
    # Cap in-flight bytes per task when Python (Pandas-UDF) stages run.
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Date truncation and window alignment must agree with the DuckDB
    # oracle and with partition directory names regardless of machine
    # timezone; runtime-settable, so pin it here (the driver hands us
    # its own session — builder-time confs in get_spark don't reach it).
    "spark.sql.session.timeZone": "UTC",
    # Cap plan DEBUG-STRING rendering (r18). Every InMemoryRelation
    # embeds its child plan text, so a composed pipeline that layers
    # caches (pairs -> lcc -> high/he -> CC) produces plan STRINGS that
    # grow multiplicatively — AQE renders one per plan update
    # (AdaptiveSparkPlanExec.onUpdatePlan), which burned whole seconds
    # per job in the corpus pipeline and OOM'd an 8g heap in
    # StringConcat during an experiment. 4 MB is ~20x the largest real
    # plan text in plans/ (194 KB); only debug output is truncated —
    # execution is unaffected. Measured: build_training_corpus (lcc
    # path, sf0.001, local[4]) 97 -> 73 s from this conf alone.
    "spark.sql.maxPlanStringLength": str(4 * 1024 * 1024),
}


def _ship_package(spark: SparkSession) -> None:
    """Ship this package to executors (the local-mode equivalent of
    ``spark-submit --py-files``).

    Python workers do NOT inherit the driver's ``sys.path`` mutations: a
    harness that does ``sys.path.insert(0, repo)`` from another cwd can
    plan queries fine yet crash at worker unpickle time on any closure
    that references a module-level symbol of this package
    (``ModuleNotFoundError: etl_tj_project_spark`` inside
    ``cloudpickle.loads``). ``addPyFile`` is the supported fix — workers
    put SparkFiles on ``sys.path`` before unpickling — and on a real
    cluster it is exactly how this code would reach executors anyway.
    """
    marker = "spark.etl_tj_project_spark.pyfiles.shipped"
    try:
        if spark.conf.get(marker, None):
            return
    except Exception:
        pass
    try:
        import tempfile
        import zipfile

        pkg_dir = os.path.dirname(os.path.abspath(__file__))
        zip_path = os.path.join(
            tempfile.gettempdir(), "etl_tj_project_spark_pyfiles.zip"
        )
        src_mtime = max(
            os.path.getmtime(os.path.join(root, fn))
            for root, _dirs, files in os.walk(pkg_dir)
            if "__pycache__" not in root
            for fn in files
            if fn.endswith(".py")
        )
        # Rebuild when any source file is newer than the zip — a stale
        # shipped copy would otherwise shadow fresh code on the workers.
        if not os.path.exists(zip_path) or os.path.getmtime(zip_path) < src_mtime:
            tmp = zip_path + f".tmp{os.getpid()}"
            with zipfile.ZipFile(tmp, "w", zipfile.ZIP_DEFLATED) as zf:
                for root, _dirs, files in os.walk(pkg_dir):
                    if "__pycache__" in root:
                        continue
                    for fn in files:
                        if fn.endswith(".py"):
                            full = os.path.join(root, fn)
                            rel = os.path.relpath(full, os.path.dirname(pkg_dir))
                            zf.write(full, rel)
            os.replace(tmp, zip_path)  # atomic: concurrent sessions race safely
        spark.sparkContext.addPyFile(zip_path)
        spark.conf.set(marker, "true")
    except Exception:
        # Best-effort: in the common layouts (cwd = repo root, or PYTHONPATH
        # set) workers resolve the package without shipping.
        pass


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable confs to an existing session (idempotent)."""
    for k, v in RUNTIME_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A conf may be static in some deployments; never fail the query
            # path over tuning.
            pass
    _ship_package(spark)
    return spark


def get_spark(
    app_name: str = "etl_tj_project_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    """Local-mode session used by tests and bench.

    ``SPARK_GRAFT_CPUS`` controls parallelism (defaults to all cores), which
    is how the driver harness sizes the bench run.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if master is None:
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if cpus else 32
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    )
    for k, v in RUNTIME_CONFS.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return tune(spark)
