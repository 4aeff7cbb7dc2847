"""Multimodal (image/audio/video) column plumbing.

Treats media payloads as opaque ``binary`` columns with a typed metadata
struct alongside. The Spark-side plumbing — schema, Arrow-batched
``mapInPandas`` decode stage, batch shapes, partition sizing — is real
and tested. Two decode tiers:

* :func:`decode_features` — deterministic stub (byte statistics), always
  available, used where a codec is irrelevant to what is under test;
* :func:`decode_features_real` / :func:`resize_thumbnail_real` — real
  image decode: PIL when importable, else the stdlib
  :mod:`.minipng` PNG codec (zlib inflate + unfilter), so the real
  branch executes even in containers with no image libraries;
* :func:`audio_features` — real audio decode via the stdlib
  :mod:`.miniwav` RIFF/PCM codec (chunk walk + fmt validation + sample
  extraction), integer-exact stats. Video decode remains a stub (the
  frame sampler documents its slice semantics inline).

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
    # Vary the fake height by doc_id so both orientations exist: portrait
    # rows (height > width) are what caught the round-1 clamp-width-only
    # resize bug.
    meta = F.struct(
        F.lit("image").alias("media_type"),
        F.lit("fake").alias("format"),
        F.octet_length(payload).cast("int").alias("width"),
        (F.lit(1) + F.pmod(F.col("doc_id"), F.lit(97))).cast("int").alias("height"),
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


def codec_backend() -> str:
    """'pil' when PIL is importable, else 'minipng' — the stdlib fallback
    codecs (:mod:`.minipng` for PNG, :mod:`.minijpeg` for baseline JPEG,
    dispatched on magic bytes) that let the real-decode branch run in
    containers without image libraries. Dimension and luma math are
    PIL-identical in both backends; only resample pixel values differ
    (bicubic vs nearest), and JPEG pixel values by IDCT rounding."""
    try:
        import PIL.Image  # noqa: F401

        return "pil"
    except ImportError:  # pragma: no cover - environment-dependent
        return "minipng"


def decode_features_real(media_df: DataFrame) -> DataFrame:
    """Real codec decode stage: identical plumbing and output schema to
    :func:`decode_features`, but ``brightness`` is the mean grayscale
    pixel of the actually-decoded image (ITU-R 601-2 integer luma —
    PIL ``convert("L")`` when PIL is present, the stdlib
    :mod:`.minipng` decoder otherwise; both produce the same value for
    PNGs in minipng's scope).

    The codec import happens inside the Arrow batch function so the
    executor-side dependency is resolved where the work runs.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image
        except ImportError:
            Image = None
        from etl_tj_project_spark.operators import minijpeg, minipng

        def luma(b: bytes) -> float | None:
            if Image is not None:
                img = Image.open(io.BytesIO(b)).convert("L")
                px = list(img.getdata())
                return sum(px) / len(px) if px else None
            if minijpeg.is_jpeg(b):
                return minijpeg.mean_luma(b)
            return minipng.mean_luma(b)

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "byte_len": [],
                "header_hex": [],
                "brightness": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["media_bytes"]):
                out["doc_id"].append(doc_id)
                out["byte_len"].append(len(b))
                out["header_hex"].append(b[:4].hex().upper() if len(b) else None)
                try:
                    out["brightness"].append(luma(b))
                except Exception:
                    out["brightness"].append(None)  # undecodable payload
            yield pd.DataFrame(out)

    return media_df.select("doc_id", "media_bytes").mapInPandas(
        run, schema=DECODED_SCHEMA
    )


def resize_thumbnail_real(media_df: DataFrame, max_side: int = 64) -> DataFrame:
    """Real thumbnail stage: decode → aspect-preserving clamp of the
    longer side to ``max_side`` (no upscale, PIL ``thumbnail`` dimension
    math in both backends) → PNG re-encode. Output schema identical to
    the stub's: (doc_id, thumb_w, thumb_h, thumb_len, thumb_header),
    with thumb_len/thumb_header describing the re-encoded thumbnail
    bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        try:
            from PIL import Image
        except ImportError:
            Image = None
        from etl_tj_project_spark.operators import minijpeg, minipng

        def thumb(b: bytes) -> tuple[int, int, bytes]:
            if Image is not None:
                img = Image.open(io.BytesIO(b))
                # Image.thumbnail clamps the longer side and never
                # upscales — the exact semantics minipng mirrors.
                img.thumbnail((max_side, max_side))
                buf = io.BytesIO()
                img.save(buf, format="PNG")
                return img.width, img.height, buf.getvalue()
            if minijpeg.is_jpeg(b):
                return minijpeg.thumbnail(b, max_side)
            return minipng.thumbnail(b, max_side)

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "thumb_w": [],
                "thumb_h": [],
                "thumb_len": [],
                "thumb_header": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["media_bytes"]):
                out["doc_id"].append(doc_id)
                try:
                    tw, th, tb = thumb(b)
                    out["thumb_w"].append(tw)
                    out["thumb_h"].append(th)
                    out["thumb_len"].append(len(tb))
                    out["thumb_header"].append(tb[:4].hex().upper())
                except Exception:
                    out["thumb_w"].append(0)
                    out["thumb_h"].append(0)
                    out["thumb_len"].append(0)
                    out["thumb_header"].append(None)
            yield pd.DataFrame(out)

    return media_df.select("doc_id", "media_bytes").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


def decode_real(media_df: DataFrame) -> DataFrame:
    """Back-compat alias for the real codec decode path."""
    return decode_features_real(media_df)


RESIZED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("thumb_w", T.IntegerType(), False),
    T.StructField("thumb_h", T.IntegerType(), False),
    T.StructField("thumb_len", T.LongType(), False),
    T.StructField("thumb_header", T.StringType(), True),
])


def resize_thumbnail(media_df: DataFrame, max_side: int = 64) -> DataFrame:
    """Thumbnail stage: Arrow-batched mapInPandas that clamps the longer
    side to ``max_side`` preserving aspect ratio (integer arithmetic, so
    the stub is bit-reproducible) and truncates the payload to the kept
    pixels. Same plumbing rules as decode: prune to (doc_id, bytes,
    meta) before the Python exchange, emit no blob wider than the thumb.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].astype("int64")
            h = pdf["height"].astype("int64")
            # Clamp the LONGER side to max_side (no upscale), scale the
            # other by the same integer ratio — portrait and landscape
            # both end ≤ max_side on both axes.
            long_side = w.where(w >= h, h)
            shrink = long_side > max_side
            denom = long_side.where(long_side > 0, 1)
            tw = w.where(~shrink, (w * max_side) // denom).clip(lower=1)
            th = h.where(~shrink, (h * max_side) // denom).clip(lower=1)
            kept = (tw * th).astype("int64")
            payloads = pdf["media_bytes"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "thumb_w": tw.astype("int32"),
                    "thumb_h": th.astype("int32"),
                    "thumb_len": kept,
                    "thumb_header": [
                        b[:4].hex().upper() if len(b) else None
                        for b in payloads
                    ],
                }
            )

    pruned = media_df.select(
        "doc_id",
        "media_bytes",
        F.col("media_meta.width").alias("width"),
        F.col("media_meta.height").alias("height"),
    )
    return pruned.mapInPandas(run, schema=RESIZED_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("frame_idx", T.LongType(), False),
    T.StructField("ts_ms", T.LongType(), False),
    T.StructField("frame_hex", T.StringType(), True),
])


def sample_frames(
    media_df: DataFrame, every_ms: int = 50, frame_bytes: int = 16
) -> DataFrame:
    """Frame-sampling stage: one output row per sampled frame — the
    fan-out batch shape (a pandas batch of N videos yields sum(dur/step)
    frame rows). The stub treats 1 payload byte = 1 ms and a frame = the
    ``frame_bytes``-byte slice at its timestamp; a real implementation
    swaps the slice for a codec seek+decode with identical schema and
    partitioning. Blob pruned before, dropped after — frames travel as
    small hex features, never raw media.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [],
                "frame_idx": [],
                "ts_ms": [],
                "frame_hex": [],
            }
            for doc_id, b in zip(pdf["doc_id"], pdf["media_bytes"]):
                dur = len(b)
                for idx, ts in enumerate(range(0, dur, every_ms)):
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["ts_ms"].append(ts)
                    sl = b[ts : ts + frame_bytes]
                    out["frame_hex"].append(sl.hex().upper() if sl else None)
            yield pd.DataFrame(out)

    return media_df.select("doc_id", "media_bytes").mapInPandas(
        run, schema=FRAMES_SCHEMA
    )


# =========================================================================
# Audio: real WAV decode via the stdlib miniwav codec
# =========================================================================

AUDIO_FEATURES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), False),
    T.StructField("n_channels", T.IntegerType(), False),
    T.StructField("bits", T.IntegerType(), False),
    T.StructField("n_frames", T.LongType(), False),
    T.StructField("duration_ms", T.LongType(), False),
    T.StructField("peak", T.LongType(), False),
    T.StructField("energy", T.LongType(), False),
])

# Deterministic synthesis parameters shared with the oracle's closed form.
_AUDIO_RATE = 8000
_AUDIO_BASE_FRAMES = 100
_AUDIO_FRAME_MOD = 157


def synth_audio_samples(doc_id: int) -> list[int]:
    """The deterministic 8-bit sawtooth used by :func:`attach_fake_audio`:
    ``n = 100 + doc_id % 157`` frames of ``(doc_id*7 + i*13) % 256 - 128``.
    Closed-form enough that a SQL oracle can restate it, yet the bytes
    still round-trip through a REAL RIFF encode/parse on the Spark side.
    """
    n = _AUDIO_BASE_FRAMES + doc_id % _AUDIO_FRAME_MOD
    return [(doc_id * 7 + i * 13) % 256 - 128 for i in range(n)]


def attach_fake_audio(docs: DataFrame) -> DataFrame:
    """Materialize an opaque WAV binary column: actual RIFF/PCM bytes
    built by :mod:`.miniwav` (not a stub tag), so the decode stage
    downstream exercises a real chunk-walking parser. Synthesis happens
    inside the Arrow batch — the driver never holds the corpus's audio.
    """
    from etl_tj_project_spark.operators import miniwav

    out_schema = T.StructType(
        docs.select("doc_id").schema.fields
        + [T.StructField("media_bytes", T.BinaryType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[["doc_id"]].copy()
            pdf["media_bytes"] = pdf["doc_id"].map(
                lambda d: miniwav.encode(
                    _AUDIO_RATE, 1, 8, synth_audio_samples(int(d))
                )
            )
            yield pdf

    return docs.select("doc_id").mapInPandas(run, schema=out_schema)


def audio_features(media_df: DataFrame) -> DataFrame:
    """Real audio decode stage: miniwav RIFF parse + integer-exact
    analysis (centered peak, energy = sum of squared centered samples).
    Same plumbing discipline as the image path — blob pruned to
    (doc_id, media_bytes) before the Python exchange, dropped after, so
    no raw audio crosses a shuffle; stats are integers so downstream
    cross-engine checks never see float accumulation order.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_tj_project_spark.operators import miniwav

        rows: dict[str, list] = {k.name: [] for k in AUDIO_FEATURES_SCHEMA}

        def flush():
            nonlocal rows
            out = pd.DataFrame(rows)
            rows = {k.name: [] for k in AUDIO_FEATURES_SCHEMA}
            return out

        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf["media_bytes"]):
                rate, n_ch, bits, samples = miniwav.decode(bytes(b))
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(rate)
                rows["n_channels"].append(n_ch)
                rows["bits"].append(bits)
                rows["n_frames"].append(miniwav.n_frames(samples, n_ch))
                rows["duration_ms"].append(
                    miniwav.duration_ms(rate, n_ch, samples)
                )
                rows["peak"].append(miniwav.peak(samples))
                rows["energy"].append(miniwav.energy(samples))
            yield flush()

    return media_df.select("doc_id", "media_bytes").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


def audio_downsample_features(media_df: DataFrame, factor: int = 2) -> DataFrame:
    """Audio resample stage (the audio twin of thumbnail resize):
    decode → decimate by ``factor`` with integer pair-averaging → encode
    at the reduced rate → decode AGAIN and emit stats, so both codec
    directions run inside the Arrow batch. Averaging happens in the
    UNSIGNED byte domain (values 0..255) where floor division is
    unambiguous — averaging signed centered samples would hit the
    floor-vs-truncate divergence on negative sums. A trailing partial
    group of samples is dropped, matching the truncated-frame rule.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_tj_project_spark.operators import miniwav

        rows: dict[str, list] = {k.name: [] for k in AUDIO_FEATURES_SCHEMA}
        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf["media_bytes"]):
                rate, n_ch, bits, samples = miniwav.decode(bytes(b))
                if n_ch != 1 or bits != 8:
                    raise ValueError("downsample stage expects 8-bit mono")
                unsigned = [s + 128 for s in samples]
                n_out = len(unsigned) // factor
                dec = [
                    sum(unsigned[k * factor : (k + 1) * factor]) // factor - 128
                    for k in range(n_out)
                ]
                out_rate = rate // factor
                blob = miniwav.encode(out_rate, 1, 8, dec)
                r2, c2, b2, s2 = miniwav.decode(blob)
                rows["doc_id"].append(doc_id)
                rows["sample_rate"].append(r2)
                rows["n_channels"].append(c2)
                rows["bits"].append(b2)
                rows["n_frames"].append(miniwav.n_frames(s2, c2))
                rows["duration_ms"].append(miniwav.duration_ms(r2, c2, s2))
                rows["peak"].append(miniwav.peak(s2))
                rows["energy"].append(miniwav.energy(s2))
            out = pd.DataFrame(rows)
            rows = {k.name: [] for k in AUDIO_FEATURES_SCHEMA}
            yield out

    return media_df.select("doc_id", "media_bytes").mapInPandas(
        run, schema=AUDIO_FEATURES_SCHEMA
    )


# --- real-PNG luma histogram (both codec directions, integer-exact) -------

IMAGE_HIST_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("b0", T.LongType(), False),  # luma in [0, 64)
    T.StructField("b1", T.LongType(), False),  # [64, 128)
    T.StructField("b2", T.LongType(), False),  # [128, 192)
    T.StructField("b3", T.LongType(), False),  # [192, 256)
])

_IMG_W_BASE, _IMG_W_MOD = 8, 9
_IMG_H_BASE, _IMG_H_MOD = 8, 7


def synth_gray_rows(doc_id: int) -> tuple[int, int, list[bytearray]]:
    """Deterministic grayscale gradient: w = 8 + d%9, h = 8 + d%7,
    pixel(x, y) = (d*31 + x*7 + y*13) % 256. Closed-form enough for a
    SQL oracle, yet the bytes round-trip through a REAL PNG
    encode/decode (zlib + scanline filters) on the Spark side."""
    w = _IMG_W_BASE + doc_id % _IMG_W_MOD
    h = _IMG_H_BASE + doc_id % _IMG_H_MOD
    rows = [
        bytearray((doc_id * 31 + x * 7 + y * 13) % 256 for x in range(w))
        for y in range(h)
    ]
    return w, h, rows


def attach_fake_png(docs: DataFrame) -> DataFrame:
    """Materialize an opaque image column holding ACTUAL PNG bytes
    (minipng writer: IHDR/IDAT/IEND, zlib, CRCs) — synthesis happens
    inside the Arrow batch, the driver never holds the corpus's
    images."""
    from etl_tj_project_spark.operators import minipng

    out_schema = T.StructType(
        docs.select("doc_id").schema.fields
        + [T.StructField("media_bytes", T.BinaryType(), False)]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf[["doc_id"]].copy()
            pdf["media_bytes"] = pdf["doc_id"].map(
                lambda d: minipng.encode(*_encode_args(int(d)))
            )
            yield pdf

    def _encode_args(d: int):
        w, h, rows = synth_gray_rows(d)
        return w, h, 1, rows

    return docs.select("doc_id").mapInPandas(run, schema=out_schema)


def image_luma_histogram(media_df: DataFrame) -> DataFrame:
    """Real image decode stage → 4-bucket luma histogram over the
    actually-decoded pixels (grayscale: luma IS the sample). Counts are
    integers, so the stage is cross-engine hash-checkable; the blob is
    pruned to (doc_id, media_bytes) before the Python exchange and
    dropped after, so no raw image crosses a shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from etl_tj_project_spark.operators import minipng

        rows_out: dict[str, list] = {f.name: [] for f in IMAGE_HIST_SCHEMA}
        for pdf in batches:
            for doc_id, b in zip(pdf["doc_id"], pdf["media_bytes"]):
                w, h, ch, rows = minipng.decode(bytes(b))
                if ch != 1:
                    raise ValueError("histogram stage expects grayscale")
                buckets = [0, 0, 0, 0]
                for r in rows:
                    for v in r:
                        buckets[v >> 6] += 1
                rows_out["doc_id"].append(doc_id)
                rows_out["width"].append(w)
                rows_out["height"].append(h)
                for i in range(4):
                    rows_out[f"b{i}"].append(buckets[i])
            out = pd.DataFrame(rows_out)
            rows_out = {f.name: [] for f in IMAGE_HIST_SCHEMA}
            yield out

    return media_df.select("doc_id", "media_bytes").mapInPandas(
        run, schema=IMAGE_HIST_SCHEMA
    )


JPEG_LUMA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), False),
    T.StructField("height", T.IntegerType(), False),
    T.StructField("mean_luma", T.DoubleType(), False),
])


def jpeg_luma_features(docs: DataFrame) -> DataFrame:
    """Real JPEG decode stage: a solid-gray image per doc is encoded
    into ACTUAL baseline-JFIF bytes by the :mod:`.minijpeg` writer
    (FDCT, quantization, per-image Huffman tables, DRI/RSTn framing
    varied by doc) and decoded back by the same codec's full path
    (marker walk, Huffman, dequant, IDCT) inside one Arrow-batched
    ``mapInPandas`` stage — the JPEG twin of the PNG
    :func:`image_luma_histogram` branch.

    Exactness argument (what lets a lossy codec carry a hash-checked
    oracle): a flat 8x8 block has ONLY a DC coefficient, DC = 8*(L-128);
    at quality 50 the luma DC quant step is exactly the Annex-K base 16,
    so the quantized DC is round((L-128)/2) — exact for EVEN gray
    levels — and dequant+IDCT returns 2*DC_q + 128 = L with no rounding
    anywhere. Gray levels are pinned even (2*((doc_id*37) % 128)), so
    decoded mean_luma == synthesized level, closed-form in SQL, while
    Spark's number still came through a genuine encode→decode trip.
    restart_interval = doc_id % 3 additionally exercises the RSTn
    resync path on a third of the corpus."""
    from etl_tj_project_spark.operators import minijpeg

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        rows_out: dict[str, list] = {f.name: [] for f in JPEG_LUMA_SCHEMA}
        for pdf in batches:
            for doc_id in pdf["doc_id"]:
                d = int(doc_id)
                w = 8 * (1 + d % 3)
                h = 8 * (1 + d % 2)
                level = 2 * ((d * 37) % 128)
                img = [bytearray([level] * w) for _ in range(h)]
                blob = minijpeg.encode(
                    w, h, 1, img, quality=50, restart_interval=d % 3
                )
                wd, hd, ch, out = minijpeg.decode(blob)
                if (wd, hd, ch) != (w, h, 1):
                    raise ValueError(
                        f"JPEG roundtrip dims diverged for doc {d}: "
                        f"{(wd, hd, ch)} != {(w, h, 1)}"
                    )
                n = wd * hd
                mean = sum(sum(r) for r in out) / n
                rows_out["doc_id"].append(d)
                rows_out["width"].append(wd)
                rows_out["height"].append(hd)
                rows_out["mean_luma"].append(mean)
            out_pdf = pd.DataFrame(rows_out)
            rows_out = {f.name: [] for f in JPEG_LUMA_SCHEMA}
            yield out_pdf

    return docs.select("doc_id").mapInPandas(run, schema=JPEG_LUMA_SCHEMA)
