"""Snapshot-manifest table format: atomic multi-table commits, snapshot
isolation, time travel, vacuum, and optimistic concurrency — the
guarantees io.commit_partitions_atomic documents as out of its reach.
"""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from etl_tj_project_spark import manifest as mf


def _df(spark, rows):
    return spark.createDataFrame(rows, ["k", "v"])


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_commit_and_read_multi_table(spark, tmp_path):
    root = str(tmp_path / "wh")
    os.makedirs(root)
    v = mf.commit(root, {
        "a": _df(spark, [(1, "x"), (2, "y")]),
        "b": _df(spark, [(9, "z")]),
    })
    assert v == 1 and mf.current_version(root) == 1
    assert _rows(mf.read_table(spark, root, "a")) == [(1, "x"), (2, "y")]
    assert _rows(mf.read_table(spark, root, "b")) == [(9, "z")]


def test_partial_commit_carries_tables_forward_and_time_travels(spark, tmp_path):
    root = str(tmp_path / "wh")
    os.makedirs(root)
    mf.commit(root, {"a": _df(spark, [(1, "x")]), "b": _df(spark, [(9, "z")])})
    v2 = mf.commit(root, {"a": _df(spark, [(1, "X"), (2, "new")])})
    assert v2 == 2
    # b carried forward by reference; a updated.
    assert _rows(mf.read_table(spark, root, "b")) == [(9, "z")]
    assert _rows(mf.read_table(spark, root, "a")) == [(1, "X"), (2, "new")]
    # Time travel: v1 still reads the original a.
    assert _rows(mf.read_table(spark, root, "a", version=1)) == [(1, "x")]
    assert mf.list_versions(root) == [1, 2]


def test_crash_before_pointer_swap_is_invisible(spark, tmp_path, monkeypatch):
    """Die after ALL data dirs are written but before the pointer swap:
    readers must still see the old snapshot for EVERY table (the
    all-or-nothing property staged renames cannot give)."""
    root = str(tmp_path / "wh")
    os.makedirs(root)
    mf.commit(root, {"a": _df(spark, [(1, "x")]), "b": _df(spark, [(9, "z")])})

    real_replace = os.replace

    def boom(src, dst):
        if dst.endswith("_manifest.json"):
            raise RuntimeError("injected crash before pointer swap")
        return real_replace(src, dst)

    monkeypatch.setattr(os, "replace", boom)
    with pytest.raises(RuntimeError, match="injected crash"):
        mf.commit(root, {
            "a": _df(spark, [(1, "CRASH")]),
            "b": _df(spark, [(9, "CRASH")]),
        })
    monkeypatch.undo()

    assert mf.current_version(root) == 1
    assert _rows(mf.read_table(spark, root, "a")) == [(1, "x")]
    assert _rows(mf.read_table(spark, root, "b")) == [(9, "z")]
    # The aborted commit's data is unreferenced garbage; vacuum reclaims
    # it (and the orphaned v2 archive) without touching live data.
    removed = mf.vacuum(root, keep_versions=1)
    assert any("snap-2" in r for r in removed)
    assert _rows(mf.read_table(spark, root, "a")) == [(1, "x")]
    # Recovery: vacuum cleared the aborted version claim, so the next
    # commit can take version 2 and becomes the live snapshot.
    v = mf.commit(root, {"a": _df(spark, [(1, "recovered")])})
    assert v == 2 and mf.current_version(root) == v
    assert _rows(mf.read_table(spark, root, "a")) == [(1, "recovered")]
    assert _rows(mf.read_table(spark, root, "b")) == [(9, "z")]


def test_vacuum_keeps_referenced_shared_snapshots(spark, tmp_path):
    root = str(tmp_path / "wh")
    os.makedirs(root)
    mf.commit(root, {"a": _df(spark, [(1, "x")]), "b": _df(spark, [(9, "z")])})
    mf.commit(root, {"a": _df(spark, [(1, "X")])})   # v2: b still snap-1
    mf.commit(root, {"a": _df(spark, [(1, "XX")])})  # v3: b still snap-1
    removed = mf.vacuum(root, keep_versions=2)
    # v1's archived manifest and a/snap-1 expire; b/snap-1 is STILL
    # referenced by v2 and v3 and must survive.
    assert os.path.join("a", "snap-1") in removed
    assert not any(r.startswith(os.path.join("b", "snap-1")) for r in removed)
    assert _rows(mf.read_table(spark, root, "b")) == [(9, "z")]
    assert _rows(mf.read_table(spark, root, "a", version=2)) == [(1, "X")]
    with pytest.raises(FileNotFoundError):
        mf.read_table(spark, root, "a", version=1)


def test_concurrent_committer_loses_cleanly(spark, tmp_path):
    """Two writers race for the same version: the second to claim the
    archived manifest raises and the pointer is untouched by it."""
    root = str(tmp_path / "wh")
    os.makedirs(root)
    mf.commit(root, {"a": _df(spark, [(1, "x")])})
    # Simulate the rival having already claimed version 2.
    os.makedirs(os.path.join(root, "_manifests"), exist_ok=True)
    rival = mf._archive_path(root, 2)
    with open(rival, "w", encoding="utf-8") as f:
        f.write('{"version": 2, "tables": {"a": "a/snap-1"}}')
    with pytest.raises(FileExistsError):
        mf.commit(root, {"a": _df(spark, [(1, "loser")])})
    assert mf.current_version(root) == 1
    assert _rows(mf.read_table(spark, root, "a")) == [(1, "x")]


def test_empty_and_error_surfaces(spark, tmp_path):
    root = str(tmp_path / "wh")
    os.makedirs(root)
    assert mf.current_version(root) == 0 and mf.list_versions(root) == []
    with pytest.raises(FileNotFoundError):
        mf.read_table(spark, root, "a")
    with pytest.raises(ValueError):
        mf.commit(root, {})
    mf.commit(root, {"a": _df(spark, [(1, "x")])})
    with pytest.raises(KeyError, match="not in snapshot"):
        mf.read_table(spark, root, "nope")


def test_snapshot_isolation_under_readers(spark, tmp_path):
    """A DataFrame resolved against v1 keeps reading v1's files even
    after v2 commits (immutability — nothing rewrites a published dir)."""
    root = str(tmp_path / "wh")
    os.makedirs(root)
    mf.commit(root, {"a": _df(spark, [(1, "x")])})
    reader_v1 = mf.read_table(spark, root, "a")
    mf.commit(root, {"a": _df(spark, [(1, "CHANGED"), (2, "CHANGED")])})
    assert _rows(reader_v1) == [(1, "x")]
    assert _rows(mf.read_table(spark, root, "a")) == [
        (1, "CHANGED"), (2, "CHANGED"),
    ]


def test_daily_pipeline_style_three_table_commit(spark, tmp_path):
    """The reference's 3-aggregate single-transaction day commit
    (dag_datapelangan.py:172-244) expressed as one manifest commit."""
    root = str(tmp_path / "wh")
    os.makedirs(root)
    base = spark.range(100).select(
        F.col("id").alias("k"),
        (F.col("id") % 5).cast("string").alias("v"),
    )
    aggs = {
        "by_card": base.groupBy("v").count(),
        "by_route": base.filter("k % 2 = 0").groupBy("v").count(),
        "by_tariff": base.groupBy().sum("k"),
    }
    v = mf.commit(root, aggs)
    assert v == 1
    got = {t: mf.read_table(spark, root, t).count() for t in aggs}
    assert got == {"by_card": 5, "by_route": 5, "by_tariff": 1}


def test_diff_table_reports_added_and_removed(spark, tmp_path):
    """Snapshot diff: exactly the rows a commit added/removed, with
    multiset semantics (duplicate-count changes surface)."""
    from etl_tj_project_spark import manifest

    root = str(tmp_path / "difftbl")
    v1 = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (3, "c")], ["id", "v"]
    )
    manifest.commit(root, {"t": v1})
    v2 = spark.createDataFrame(
        [(2, "b"), (3, "c"), (4, "d")], ["id", "v"]
    )
    manifest.commit(root, {"t": v2})

    added, removed = manifest.diff_table(spark, root, "t", v_from=1, v_to=2)
    assert sorted(map(tuple, added.collect())) == [(4, "d")]
    # id=1 gone entirely; one of the two (3,'c') copies gone.
    assert sorted(map(tuple, removed.collect())) == [(1, "a"), (3, "c")]
    # identity: old + added - removed == new (as multisets)
    old = manifest.read_table(spark, root, "t", version=1)
    new = manifest.read_table(spark, root, "t", version=2)
    recon = old.unionAll(added).exceptAll(removed)
    assert sorted(map(tuple, recon.collect())) == sorted(
        map(tuple, new.collect())
    )


def test_schema_diff_reports_added_removed_retyped(spark, tmp_path):
    from pyspark.sql import functions as F

    from etl_tj_project_spark import manifest

    root = str(tmp_path / "snap")
    base = spark.range(5).select(
        F.col("id"), F.lit("x").alias("a"), F.lit(1).alias("b")
    )
    v1 = manifest.commit(root, {"t": base})
    evolved = spark.range(5).select(
        F.col("id"),
        F.lit("x").alias("a"),
        F.lit(1.0).alias("b"),          # retyped int -> double
        F.lit(True).alias("c"),         # added
    ).drop("a").withColumn("a2", F.lit("y"))  # removed a, added a2
    v2 = manifest.commit(root, {"t": evolved})

    d = manifest.schema_diff(spark, root, "t", v1, v2)
    assert ("c", "boolean") in d["added"] and ("a2", "string") in d["added"]
    assert d["removed"] == [("a", "string")]
    assert d["retyped"] == [("b", "int", "double")]
