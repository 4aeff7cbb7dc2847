"""Manifest-based snapshot table format (Delta/Iceberg-style, minimal).

Closes the gap ``io.commit_partitions_atomic`` documents: staged renames
shrink the multi-table visibility window to a few filesystem operations
but cannot make N tables flip in ONE instant. This module can, with the
standard manifest trick those formats use:

* data is immutable — every commit writes each changed table into a
  fresh ``<root>/<table>/snap-<version>/`` directory and NEVER mutates a
  published directory;
* visibility is a single pointer — ``<root>/_manifest.json`` maps every
  table name to the snapshot directory readers should scan. Commits
  build the new manifest in a temp file and ``os.replace`` it over the
  pointer: POSIX rename atomicity means any reader sees the whole old
  snapshot or the whole new one, never a mix, regardless of how many
  tables changed;
* a crash anywhere before the pointer swap leaves only an aborted
  version claim and unreferenced data directories (both invisible to
  readers; reclaimed by :func:`vacuum`), so multi-table commits are
  all-or-nothing with NO rollback logic;
* every manifest is also archived immutably under
  ``<root>/_manifests/manifest-<version>.json`` — time travel is just
  reading an old manifest (:func:`read_table` with ``version=``).

Reference parity: the reference commits its three daily aggregates in a
single Postgres transaction (dag_datapelangan.py:172-244); this is the
lake-native equivalent with the same all-or-nothing contract plus
snapshot isolation and time travel the reference lacks.

Scale notes (100 TB): the manifest holds one small JSON record per
TABLE (not per file — Spark lists the snapshot directory itself), so
pointer-swap cost is independent of data volume; unchanged tables are
carried forward by reference (no rewrite); readers pay one extra
~1 KB read per query. Single-writer by design, like the reference's
serialized DAG runs — concurrent committers are detected by the
archived-manifest collision and the loser raises (optimistic
concurrency, the Delta/Iceberg model without a lock service).
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession

_POINTER = "_manifest.json"
_ARCHIVE = "_manifests"


def _pointer_path(root: str) -> str:
    return os.path.join(root, _POINTER)


def _archive_path(root: str, version: int) -> str:
    return os.path.join(root, _ARCHIVE, f"manifest-{version}.json")


def _load(path: str) -> dict:
    with open(path, encoding="utf-8") as f:
        return json.load(f)


def current_manifest(root: str) -> dict | None:
    """The live manifest, or None for an empty/new root."""
    p = _pointer_path(root)
    return _load(p) if os.path.exists(p) else None


def current_version(root: str) -> int:
    """Live snapshot version; 0 = nothing committed yet."""
    m = current_manifest(root)
    return 0 if m is None else int(m["version"])


def list_versions(root: str) -> list[int]:
    """All archived snapshot versions, ascending (time-travel surface)."""
    d = os.path.join(root, _ARCHIVE)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("manifest-") and name.endswith(".json"):
            out.append(int(name[len("manifest-") : -len(".json")]))
    return sorted(out)


def commit(root: str, tables: dict[str, DataFrame]) -> int:
    """Atomically publish a new snapshot updating ``tables``; returns the
    new version. Tables committed previously but absent from ``tables``
    are carried forward unchanged (by reference, no data rewrite).

    All data directories are fully written BEFORE the pointer swap; a
    crash at any earlier point leaves the live snapshot untouched and
    readers never see partial state — across however many tables the
    commit spans.
    """
    if not tables:
        raise ValueError("commit requires at least one table")
    os.makedirs(os.path.join(root, _ARCHIVE), exist_ok=True)
    prev = current_manifest(root)
    # Version = pointer + 1, claimed exclusively below. Skipping past an
    # existing claim would turn a concurrent commit into a silent lost
    # update (the later writer's manifest lacks the earlier writer's
    # tables); colliding is the safe outcome. A claim orphaned by a
    # CRASHED commit blocks this version until vacuum() clears it —
    # that is the recovery path, not a retry loop here.
    version = (0 if prev is None else int(prev["version"])) + 1
    entries: dict[str, str] = {} if prev is None else dict(prev["tables"])
    for name in tables:
        entries[name] = os.path.join(name, f"snap-{version}")
    manifest = {"version": version, "tables": entries}

    # Claim BEFORE writing any data: snapshot paths are deterministic
    # (snap-<version>), so two racing committers would target the SAME
    # data directories — if data were written first, the loser could
    # overwrite the winner's already-published files before discovering
    # the collision. O_EXCL creation of the archived manifest is the
    # claim; the loser fails here having touched nothing. A crash after
    # the claim leaves an aborted version (> pointer) with missing or
    # partial data dirs — unreferenced by any pointer, cleared by
    # vacuum().
    archived = _archive_path(root, version)
    with open(os.open(archived, os.O_CREAT | os.O_EXCL | os.O_WRONLY), "w",
              encoding="utf-8") as f:
        json.dump(manifest, f)

    for name, df in tables.items():
        df.write.mode("overwrite").parquet(os.path.join(root, entries[name]))
    fd, tmp = tempfile.mkstemp(dir=root, prefix=".manifest-", suffix=".tmp")
    try:
        with os.fdopen(fd, "w", encoding="utf-8") as f:
            json.dump(manifest, f)
        os.replace(tmp, _pointer_path(root))  # THE atomic publish
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise
    return version


def read_table(
    spark: SparkSession, root: str, name: str, version: int | None = None
) -> DataFrame:
    """Scan ``name`` at the live snapshot, or at a pinned historical
    ``version`` (time travel — any archived manifest stays readable
    until vacuumed)."""
    if version is None:
        manifest = current_manifest(root)
        if manifest is None:
            raise FileNotFoundError(f"no snapshot committed at {root}")
    else:
        manifest = _load(_archive_path(root, version))
    try:
        rel = manifest["tables"][name]
    except KeyError:
        raise KeyError(
            f"table {name!r} not in snapshot v{manifest['version']} "
            f"(has: {sorted(manifest['tables'])})"
        ) from None
    return spark.read.parquet(os.path.join(root, rel))


def vacuum(root: str, keep_versions: int = 2) -> list[str]:
    """Delete snapshot directories no manifest in the retained window
    references, plus the expired archived manifests; returns removed
    paths. Readers of retained versions are unaffected — data referenced
    by ANY kept manifest is kept (a snapshot dir is shared by every
    version that carried it forward).

    MUST NOT run concurrently with a commit: vacuum classifies archived
    versions beyond the pointer as aborted claims, and an in-flight
    commit sits in exactly that state between its claim and its pointer
    swap — vacuuming then would delete the claim and the data being
    written. Serialize vacuum in the same single-writer regime as
    commits (it is a maintenance/recovery operation, not a reader-side
    one)."""
    if keep_versions < 1:
        raise ValueError("keep_versions must be >= 1")
    cur = current_version(root)
    versions = list_versions(root)
    # Retention anchors on the POINTER: the window is the last
    # keep_versions COMMITTED manifests (<= cur). Archived versions
    # beyond the pointer are aborted claims — crashed commits whose swap
    # never happened — and expire with their unreferenced data.
    committed = [v for v in versions if v <= cur]
    keep = set(committed[-keep_versions:])
    live: set[str] = set()
    for v in keep:
        live.update(_load(_archive_path(root, v))["tables"].values())
    removed: list[str] = []
    for table in sorted(os.listdir(root)):
        tdir = os.path.join(root, table)
        if table.startswith((".", "_")) or not os.path.isdir(tdir):
            continue
        for snap in sorted(os.listdir(tdir)):
            rel = os.path.join(table, snap)
            if snap.startswith("snap-") and rel not in live:
                shutil.rmtree(os.path.join(root, rel), ignore_errors=True)
                removed.append(rel)
    for v in versions:
        if v not in keep:
            os.unlink(_archive_path(root, v))
            removed.append(os.path.relpath(_archive_path(root, v), root))
    return removed


def diff_table(
    spark: SparkSession,
    root: str,
    name: str,
    v_from: int,
    v_to: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """(added, removed) row-level diff of ``name`` between two snapshot
    versions — the CDC view a consumer uses to process only what a
    commit changed instead of re-reading the table.

    Multiset semantics via ``exceptAll`` (a row committed twice then
    once shows one removal), so the diff is exact for tables with
    duplicate rows too. Cost: one anti-style shuffle over the two
    snapshots per direction — at scale consumers that need cheaper
    diffs add a partition column and diff only partitions whose files
    changed between the manifests (the manifest records per-table
    paths, so changed-partition detection is a metadata read).
    """
    old = read_table(spark, root, name, version=v_from)
    new = read_table(spark, root, name, version=v_to)
    return new.exceptAll(old), old.exceptAll(new)


def schema_diff(
    spark: SparkSession,
    root: str,
    name: str,
    v_from: int,
    v_to: int | None = None,
) -> dict[str, list]:
    """Schema drift between two snapshot versions of ``name``:
    ``{"added": [(col, type)], "removed": [(col, type)],
    "retyped": [(col, old_type, new_type)]}`` — the catalog-level
    companion to :func:`diff_table`'s row-level CDC. Consumers gate
    on it before processing a new snapshot (an added nullable column
    is usually safe; a retyped or removed one breaks readers), and
    union_by_name_schema_evolution is the query-side behavior this
    check decides to allow. Metadata-only: two footer reads, no data
    scan at any table size.
    """
    old = {
        f.name: f.dataType.simpleString()
        for f in read_table(spark, root, name, version=v_from).schema.fields
    }
    new = {
        f.name: f.dataType.simpleString()
        for f in read_table(spark, root, name, version=v_to).schema.fields
    }
    return {
        "added": sorted((c, t) for c, t in new.items() if c not in old),
        "removed": sorted((c, t) for c, t in old.items() if c not in new),
        "retyped": sorted(
            (c, old[c], new[c])
            for c in old.keys() & new.keys()
            if old[c] != new[c]
        ),
    }
