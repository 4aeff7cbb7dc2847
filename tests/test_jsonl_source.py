"""JSONL corpus source: explicit-schema staging read with corrupt-line
quarantine (sources/jsonl.py) — the ingest path for web-scale text
shards."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_tj_project_spark.sources.jsonl import read_documents_jsonl, read_jsonl


@pytest.fixture()
def shard(tmp_path):
    lines = [
        '{"doc_id": 1, "text": "hello world", "lang": "en", "source": "a"}',
        '{"doc_id": 2, "text": "bonjour", "lang": "fr", "source": "a"}',
        # malformed JSON (truncated)
        '{"doc_id": 3, "text": "broken',
        # missing text
        '{"doc_id": 4, "lang": "en", "source": "b"}',
        # empty text
        '{"doc_id": 5, "text": "", "lang": "en", "source": "b"}',
        # missing doc_id
        '{"text": "orphan", "lang": "en", "source": "b"}',
        # wrong type for doc_id → unparseable against the LongType field
        '{"doc_id": "x7", "text": "typed", "lang": "en", "source": "b"}',
    ]
    p = tmp_path / "shard.jsonl"
    p.write_text("\n".join(lines) + "\n")
    return str(p)


def test_documents_jsonl_splits_clean_and_quarantine(spark, shard):
    clean, quarantine = read_documents_jsonl(spark, shard)
    rows = {r.doc_id: r for r in clean.collect()}
    assert set(rows) == {1, 2}
    # n_chars is recomputed from the text, never trusted from the wire.
    assert rows[1].n_chars == len("hello world")
    assert rows[1].lang == "en" and rows[1].source == "a"

    q = quarantine.collect()
    reasons = sorted(r.reason for r in q)
    # 5 bad lines: truncated JSON, missing text, empty text, missing id,
    # mistyped id (PERMISSIVE parsing quarantines the whole line when a
    # field can't meet the declared type).
    assert len(q) == 5
    assert reasons.count("missing_text") == 2
    assert "missing_doc_id" in reasons
    assert reasons.count("malformed_json") >= 1
    # Every quarantined row carries a queryable raw line.
    assert all(r.raw_line for r in q)


def test_documents_jsonl_total_is_conserved(spark, shard):
    """No line is silently dropped: clean + quarantine == input lines."""
    clean, quarantine = read_documents_jsonl(spark, shard)
    assert clean.count() + quarantine.count() == 7


def test_read_jsonl_explicit_schema_no_inference(spark, tmp_path):
    """Fields absent from the declared schema are ignored (no
    union-of-keys inference); declared-but-absent fields are NULL."""
    p = tmp_path / "extra.jsonl"
    p.write_text('{"doc_id": 9, "text": "t", "unexpected": [1,2,3]}\n')
    from pyspark.sql import types as T

    df = read_jsonl(
        spark,
        str(p),
        T.StructType(
            [
                T.StructField("doc_id", T.LongType(), True),
                T.StructField("text", T.StringType(), True),
                T.StructField("lang", T.StringType(), True),
            ]
        ),
    )
    assert "unexpected" not in df.columns
    r = df.collect()[0]
    assert r.doc_id == 9 and r.text == "t" and r.lang is None
    assert r._corrupt_record is None


def test_documents_jsonl_feeds_quality_pipeline(spark, shard):
    """The clean side drops straight into the corpus operators (schema
    parity with the documents table)."""
    clean, _ = read_documents_jsonl(spark, shard)
    from etl_tj_project_spark.sources.testdata import load_table
    from tests.conftest import SF_SMOKE

    ref_cols = load_table(spark, SF_SMOKE, "documents").columns
    assert clean.columns == ref_cols
    # And the standard tokenizing expression runs over it unchanged.
    toks = clean.select(
        F.size(F.split(F.trim(F.lower("text")), r"\s+")).alias("n")
    ).collect()
    assert sorted(r.n for r in toks) == [1, 2]
