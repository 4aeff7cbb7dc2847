"""Property-based checks for the round-11 curation/maintenance
operators: boilerplate chunk removal vs a pure-Python model, and
merge_sorted_export's invariants under Hypothesis-generated deltas.

Batch-per-example like the other property suites: each example builds
one small DataFrame and runs one job."""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from etl_tj_project_spark.operators.corpus import boilerplate_chunk_stats

# Tiny vocabulary so cross-document chunk collisions actually happen.
WORD = st.sampled_from(["aa", "bb", "cc", "dd"])
DOC = st.lists(WORD, min_size=1, max_size=10).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=8)
CHUNK_W = st.sampled_from([2, 3])
MIN_DOCS = st.sampled_from([2, 3])


def _model(corpus: list[str], w: int, min_docs: int):
    """Pure-Python model of boilerplate_chunk_stats."""
    chunks = {}
    for did, text in enumerate(corpus):
        ws = text.split(" ")
        n = math.ceil(len(ws) / w)
        chunks[did] = [" ".join(ws[i * w: i * w + w]) for i in range(n)]
    docs_per_chunk: dict[str, set] = {}
    for did, cs in chunks.items():
        for c in cs:
            docs_per_chunk.setdefault(c, set()).add(did)
    out = {}
    for did, cs in chunks.items():
        kept = [c for c in cs if len(docs_per_chunk[c]) < min_docs]
        out[did] = (len(cs), len(kept), " ".join(kept) if kept else None)
    return out


@settings(
    max_examples=20,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(corpus=CORPUS, w=CHUNK_W, min_docs=MIN_DOCS)
def test_boilerplate_stats_match_python_model(spark, corpus, w, min_docs):
    df = spark.createDataFrame(
        list(enumerate(corpus)), "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_chunks, r.n_kept, r.kept_text)
        for r in boilerplate_chunk_stats(
            df, chunk_words=w, min_docs=min_docs
        ).collect()
    }
    assert got == _model(corpus, w, min_docs)


KEYS = st.lists(
    st.integers(min_value=0, max_value=400), min_size=0, max_size=12
)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(delta_keys=KEYS)
def test_merge_sorted_export_invariants_hold(spark, delta_keys, tmp_path_factory):
    """For ANY delta key set (inside ranges, straddling boundaries,
    below min, above max, empty): merged content == full re-sort, and
    per-file ranges stay monotonic in name order."""
    from etl_tj_project_spark.io import export_sorted, merge_sorted_export

    tmp = tmp_path_factory.mktemp("msort")
    base = spark.range(0, 200).select(
        (F.col("id") * 2).alias("k"), F.col("id").alias("v")
    )
    base_dir = str(tmp / "base")
    out_dir = str(tmp / "merged")
    export_sorted(base, base_dir, ["k"], num_files=4)

    delta = spark.createDataFrame(
        [(k, 10_000 + i) for i, k in enumerate(delta_keys)] or [(None, None)],
        "k long, v long",
    ).filter("k IS NOT NULL")
    stats = merge_sorted_export(spark, base_dir, delta, ["k"], out_dir)
    assert stats["files_total"] == 4
    assert stats["files_rewritten"] + stats["files_copied"] == 4
    if not delta_keys:
        assert stats["files_rewritten"] == 0

    want = sorted(map(tuple, base.collect()) ) + sorted(
        (k, 10_000 + i) for i, k in enumerate(delta_keys)
    )
    got = sorted(map(tuple, spark.read.parquet(out_dir).collect()))
    assert got == sorted(want)

    per_file = (
        spark.read.parquet(out_dir)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("k").alias("lo"), F.max("k").alias("hi"))
        .orderBy("f")
        .collect()
    )
    for prev, nxt in zip(per_file, per_file[1:]):
        assert prev.hi <= nxt.lo, (prev, nxt)
