"""Real-codec multimodal path: exercised only where PIL is installed
(this container has no media libs, so these tests skip — the driver-
checked stub path covers the plumbing either way). The fixture PNG is
generated with zlib+struct so the test needs no library to *create*
media, only to decode it."""

from __future__ import annotations

import struct
import zlib

import pytest

from pyspark.sql import functions as F


def make_png(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
    """Minimal valid 8-bit RGB PNG: one IHDR, one IDAT, one IEND."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * width  # filter byte 0 + pixels
    idat = zlib.compress(row * height)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )


def _media_df(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "media_bytes"]).select(
        F.col("doc_id").cast("long").alias("doc_id"), "media_bytes"
    )


def test_decode_real_reads_generated_png(spark):
    pytest.importorskip("PIL")
    from etl_tj_project_spark.operators.multimodal import decode_features_real

    png = make_png(6, 4, (10, 200, 30))
    out = {
        r.doc_id: r
        for r in decode_features_real(
            _media_df(spark, [(1, png), (2, b"not an image")])
        ).collect()
    }
    assert out[1].byte_len == len(png)
    assert out[1].header_hex == png[:4].hex().upper()
    # ITU-R 601-2 luma of (10, 200, 30): uniform image, one value.
    want = int(10 * 299 / 1000 + 200 * 587 / 1000 + 30 * 114 / 1000)
    assert abs(out[1].brightness - want) <= 1.0
    assert out[2].brightness is None  # undecodable -> NULL, never raises


def test_resize_real_clamps_longer_side(spark):
    pytest.importorskip("PIL")
    from etl_tj_project_spark.operators.multimodal import resize_thumbnail_real

    portrait = make_png(32, 256, (5, 5, 5))
    landscape = make_png(100, 40, (5, 5, 5))
    small = make_png(10, 8, (5, 5, 5))
    out = {
        r.doc_id: r
        for r in resize_thumbnail_real(
            _media_df(spark, [(1, portrait), (2, landscape), (3, small)]),
            max_side=64,
        ).collect()
    }
    assert (out[1].thumb_w, out[1].thumb_h) == (8, 64)
    assert (out[2].thumb_w, out[2].thumb_h) == (64, 25)
    assert (out[3].thumb_w, out[3].thumb_h) == (10, 8)  # no upscale
    assert all(r.thumb_header == "89504E47" for r in out.values())  # PNG magic


def test_png_generator_is_structurally_valid():
    """Runs everywhere: CRC-checked chunk layout independent of PIL."""
    png = make_png(3, 2, (1, 2, 3))
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    pos = 8
    tags = []
    while pos < len(png):
        (length,) = struct.unpack(">I", png[pos : pos + 4])
        tag = png[pos + 4 : pos + 8]
        payload = png[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", png[pos + 8 + length : pos + 12 + length])
        assert crc == zlib.crc32(tag + payload) & 0xFFFFFFFF
        tags.append(tag)
        pos += 12 + length
    assert tags == [b"IHDR", b"IDAT", b"IEND"]
    w, h, depth, ctype = struct.unpack(">IIBB", png[16:26])
    assert (w, h, depth, ctype) == (3, 2, 8, 2)
    # IDAT payload: after signature(8) + IHDR chunk(25) + IDAT len+tag(8);
    # before IDAT crc(4) + IEND chunk(12).
    raw = zlib.decompress(png[8 + 25 + 8 : -16])
    assert len(raw) == (1 + 3 * 3) * 2
