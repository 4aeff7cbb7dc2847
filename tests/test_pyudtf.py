"""Python UDTF surface (operators/pyudtf.py): lateral-join usage and
equivalence with the native-expression tokenizer."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_tj_project_spark.operators.pyudtf import TokenSpans
from etl_tj_project_spark.sources.testdata import load_table
from tests.conftest import SF_SMOKE


def test_udtf_lateral_join_matches_expression_tokenizer(spark):
    """UDTF spans must agree with the registered expression tokenizer
    (lower + split on whitespace runs) on (doc, position, term) — the
    proven-safe-promotion contract."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 50
    )
    docs.createOrReplaceTempView("__udtf_docs")
    spark.udtf.register("token_spans", TokenSpans)
    got = spark.sql(
        """
        SELECT d.doc_id, s.pos, s.term
        FROM __udtf_docs d, LATERAL token_spans(d.text) s
        """
    ).collect()
    got_set = {(r.doc_id, r.pos, r.term) for r in got}

    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    want = (
        docs.select(
            "doc_id",
            F.posexplode(
                F.when(F.trim("text") == "", F.array()).otherwise(toks)
            ).alias("pos", "term"),
        )
        .collect()
    )
    want_set = {(r.doc_id, r.pos, r.term) for r in want}
    assert got_set == want_set and len(want_set) > 0


def test_udtf_offsets_slice_back_to_terms(spark):
    """The start offsets must actually address the original text:
    text[start:start+len(term)].lower() == term for every span."""
    docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.col("doc_id") < 20
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    docs.createOrReplaceTempView("__udtf_docs2")
    spark.udtf.register("token_spans2", TokenSpans)
    rows = spark.sql(
        """
        SELECT d.doc_id, s.start, s.term
        FROM __udtf_docs2 d, LATERAL token_spans2(d.text) s
        """
    ).collect()
    assert rows
    for r in rows:
        src = texts[r.doc_id]
        assert src[r.start : r.start + len(r.term)].lower() == r.term
