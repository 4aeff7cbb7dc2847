"""Multimodal (image/audio/video) column plumbing.

Treats media payloads as opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side plumbing — schema, Arrow-batched
``mapInPandas`` decode stage, batch shapes, partition sizing — is real
and tested; the actual codec calls are STUBBED (this container has no
image/audio libraries): ``decode_stub`` computes deterministic fake
features from the raw bytes, and :func:`decode_real` raises
``NotImplementedError`` unless PIL/soundfile happen to be importable.

Scale notes: media blobs dominate row size, so the decode stage runs on
``mapInPandas`` with a bounded Arrow batch size (set in session.py via
``spark.sql.execution.arrow.maxRecordsPerBatch``) to cap executor memory;
feature extraction then drops the blob column as early as possible so
downstream exchanges never shuffle raw media bytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# Typed metadata carried next to every media payload.
MEDIA_META = T.StructType([
    T.StructField("media_type", T.StringType(), False),   # image|audio|video
    T.StructField("format", T.StringType(), True),        # png|wav|mp4|...
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("duration_ms", T.LongType(), True),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("byte_len", T.LongType(), False),
    T.StructField("header_hex", T.StringType(), True),
    T.StructField("brightness", T.DoubleType(), True),
])


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the text stand
    in for image bytes) plus a typed metadata struct — the schema/layout a
    real ingest would produce."""
    payload = F.encode(F.col(text_col), "UTF-8")
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.octet_length(payload).cast("int").alias("width"),
        F.lit(1).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )
    return docs.withColumn("media_bytes", payload).withColumn("media_meta", meta)


def _decode_batch_stub(pdf: pd.DataFrame) -> pd.DataFrame:
    """Deterministic fake decode: byte length, first-4-bytes hex, mean
    byte value as 'brightness'. Stands in for a real image decode."""
    payloads = pdf["media_bytes"]
    return pd.DataFrame(
        {
            "doc_id": pdf["doc_id"],
            "byte_len": payloads.map(len).astype("int64"),
            "header_hex": payloads.map(lambda b: b[:4].hex().upper() if len(b) else None),
            "brightness": payloads.map(
                lambda b: (sum(b) / len(b)) if len(b) else None
            ),
        }
    )


def decode_features(media_df: DataFrame) -> DataFrame:
    """The decode stage: Arrow-batched mapInPandas over (doc_id, bytes).

    Real plumbing — the blob column is pruned to exactly the two needed
    columns before the Python exchange, and the output drops the blob so
    no raw media crosses any subsequent shuffle.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch_stub(pdf)

    return media_df.select("doc_id", "media_bytes").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def decode_real(media_df: DataFrame) -> DataFrame:
    """Real codec path — requires an image library, absent here."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "real media decode needs PIL/pillow; this environment has no "
            "image libraries — use decode_features (stub) instead"
        ) from exc
    raise NotImplementedError("real decode not implemented in this round")
