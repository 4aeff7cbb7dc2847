"""CLI smoke: the command surface a reference user would drive (load-dims
→ run-daily → backfill) end-to-end on generated fixtures.

The CLI builds its own SparkSession; getOrCreate() reuses the test
session, and the CLI's stop() would kill it for later tests — so these
run monkeypatched to keep the shared session alive.
"""

from __future__ import annotations

import pytest

from etl_tj_project_spark import cli
from tests.gen_fixtures import generate


@pytest.fixture(scope="module")
def data_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_fixtures")
    generate(str(d))
    return str(d)


def _run(monkeypatch, spark, argv):
    monkeypatch.setattr(cli, "get_spark", lambda *a, **k: spark)
    monkeypatch.setattr(spark, "stop", lambda: None)
    return cli.main(argv)


def test_cli_load_dims_then_daily_then_backfill(
    monkeypatch, spark, data_dir, tmp_path, capsys
):
    wh = str(tmp_path / "wh")
    assert _run(monkeypatch, spark, [
        "load-dims", "--data-dir", data_dir, "--warehouse", wh,
    ]) == 0
    out = capsys.readouterr().out
    assert "routes:" in out and "realisasi_bus:" in out

    assert _run(monkeypatch, spark, [
        "run-daily", "--ds", "2025-07-15", "--data-dir", data_dir,
        "--warehouse", wh,
    ]) == 0
    out = capsys.readouterr().out
    assert "agg_by_card[2025-07-15]:" in out

    assert _run(monkeypatch, spark, [
        "backfill", "--start", "2025-07-14", "--end", "2025-07-15",
        "--data-dir", data_dir, "--warehouse", wh,
    ]) == 0
    out = capsys.readouterr().out
    assert "2025-07-14:" in out and "2025-07-15:" in out

    # Backfill re-ran 2025-07-15 after run-daily — dynamic partition
    # overwrite must keep it idempotent (no duplicated rows).
    by_card = spark.read.parquet(f"{wh}/dw/agg_by_card")
    per_day = by_card.groupBy("tanggal", "card_type", "gate_in_boo").count()
    assert per_day.filter("count > 1").count() == 0


def test_cli_query_list_and_run(monkeypatch, spark, capsys):
    assert _run(monkeypatch, spark, ["query", "--list"]) == 0
    out = capsys.readouterr().out
    assert "a1_agg_by_card" in out and "tpch_q1_pricing_summary" in out

    from tests.conftest import SF_SMOKE

    assert _run(monkeypatch, spark, [
        "query", "a4_count_probe", "--sf-dir", SF_SMOKE, "--show", "3",
    ]) == 0
    out = capsys.readouterr().out
    assert "a4_count_probe:" in out

    assert _run(monkeypatch, spark, ["query", "nope_not_a_query"]) == 2


def test_cli_build_corpus(monkeypatch, spark, tmp_path, capsys):
    """build-corpus: JSONL shards -> published snapshot via the CLI,
    with the round-11 opt-in stages switched on."""
    from etl_tj_project_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    shards = str(tmp_path / "shards")
    load_table(spark, SF_SMOKE, "documents").select(
        "doc_id", "text", "lang", "source"
    ).coalesce(1).write.json(shards)
    root = str(tmp_path / "published")
    assert _run(monkeypatch, spark, [
        "build-corpus", "--input", shards, "--out", root,
        "--languages", "en", "--boilerplate-min-docs", "3",
        "--classifier",
    ]) == 0
    out = capsys.readouterr().out
    assert "n_published:" in out and "version: 1" in out

    from etl_tj_project_spark import manifest

    corpus = manifest.read_table(spark, root, "corpus")
    n = corpus.count()
    assert 0 < n < 500
    assert set(corpus.select("split").distinct().toPandas()["split"]) <= {
        "train", "val", "test"
    }
