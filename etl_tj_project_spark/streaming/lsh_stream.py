"""Streaming incremental near-dup detection: arriving documents are
MinHash-banded on the fly and probed against the STATIC base band index
(a stream-static equi-join).

This is the streaming twin of
``operators/dedup.incremental_lsh_candidates``: signatures are pure
column expressions (md5 slices + higher-order functions), so they run
unchanged inside the micro-batch plan; the base index is the stored
(id, band, h) table the initial corpus load wrote out, which Spark
re-reads per micro-batch (at scale: a bucketed table on (band, h), so
the probe is co-located and state-free — unlike a stream-stream join,
NO join state accumulates, because the static side is authoritative).

Division of labor this operator assumes: the stream answers "does this
new doc collide with the CORPUS" at arrival time (the
block-before-training use case); delta-vs-delta pairs WITHIN the
arrival window are the nightly batch's job
(``incremental_lsh_candidates`` with the day's accumulated delta), or a
watermarked stream-stream self-join when arrival-time detection across
in-flight docs is genuinely required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from etl_tj_project_spark.operators.dedup import minhash_bands


def stream_lsh_collisions(
    doc_stream: DataFrame,
    base_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 8,
) -> DataFrame:
    """(new_doc, base_doc) candidate collisions of a streaming document
    feed against the static band index.

    Deliberately STATE-FREE: no dropDuplicates — on a stream that is a
    cross-batch stateful operator whose key state grows with every pair
    ever seen, the exact unbounded-state trap this operator exists to
    avoid. A pair may therefore appear up to ``bands`` times (once per
    colliding band); downstream consumers are idempotent about it (a
    quarantine sink keyed on the pair, or the nightly batch distinct).
    """
    delta_bands = minhash_bands(
        doc_stream, id_col, text_col, num_hashes, bands, shingle_k
    )
    probe = base_bands.select(
        F.col(id_col).alias("base_doc"), F.col("band"), F.col("h")
    )
    return (
        delta_bands.select(
            F.col(id_col).alias("new_doc"), F.col("band"), F.col("h")
        )
        .join(probe, on=["band", "h"], how="inner")
        .filter(F.col("new_doc") != F.col("base_doc"))
        .select("new_doc", "base_doc")
    )
