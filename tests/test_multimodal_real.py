"""Real-codec multimodal path. Runs EVERYWHERE: with PIL when installed,
else through the stdlib minipng backend (zlib+struct decode — a real
pixel decode, not a header peek). The fixture PNG is generated with
zlib+struct so the test needs no library to *create* media either.

Both backends share dimension math (PIL Image.thumbnail round-aspect)
and integer ITU-R 601-2 luma, so these assertions are backend-stable.
"""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F

from etl_tj_project_spark.operators import minipng


def make_png(
    width: int, height: int, rgb: tuple[int, int, int], filter_type: int = 0
) -> bytes:
    """Minimal valid 8-bit RGB PNG: one IHDR, one IDAT, one IEND."""

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    if filter_type == 0:
        row = b"\x00" + bytes(rgb) * width  # filter byte 0 + pixels
    elif filter_type == 1:  # Sub: first pixel raw, rest delta-0
        row = b"\x01" + bytes(rgb) + b"\x00\x00\x00" * (width - 1)
    else:
        raise ValueError(filter_type)
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


def _pil_luma(rgb: tuple[int, int, int]) -> int:
    r, g, b = rgb
    return (r * 19595 + g * 38470 + b * 7471 + 0x8000) >> 16


def test_decode_real_reads_generated_png(spark):
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
    # Integer ITU-R 601-2 luma of uniform (10, 200, 30) — exact in both
    # backends (PIL convert("L") uses the same >>16 fixed-point form).
    assert out[1].brightness == float(_pil_luma((10, 200, 30)))
    assert out[2].brightness is None  # undecodable -> NULL, never raises


def test_resize_real_clamps_longer_side(spark):
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
    # 100x40 → clamp 100→64; 40*0.64 = 25.6, and PIL's round_aspect picks
    # the floor/ceil candidate minimizing aspect error: |2.5 - 64/26| <
    # |2.5 - 64/25| → 26 (both backends implement this rule).
    assert (out[2].thumb_w, out[2].thumb_h) == (64, 26)
    assert (out[3].thumb_w, out[3].thumb_h) == (10, 8)  # no upscale
    assert all(r.thumb_header == "89504E47" for r in out.values())  # PNG magic


def test_minipng_roundtrip_and_filters():
    """Pure-stdlib codec invariants, no Spark: decode(encode(x)) == x,
    Sub-filtered input unfilters to the same pixels as filter-0 input."""
    png0 = make_png(7, 3, (9, 130, 250), filter_type=0)
    png1 = make_png(7, 3, (9, 130, 250), filter_type=1)
    w0, h0, ch0, rows0 = minipng.decode(png0)
    w1, h1, ch1, rows1 = minipng.decode(png1)
    assert (w0, h0, ch0) == (7, 3, 3) == (w1, h1, ch1)
    assert rows0 == rows1  # unfilter reproduces the same pixel bytes
    again = minipng.decode(minipng.encode(w0, h0, ch0, rows0))
    assert again == (w0, h0, ch0, rows0)
    assert minipng.mean_luma(png0) == float(_pil_luma((9, 130, 250)))


def test_minipng_thumbnail_size_matches_pil_rules():
    assert minipng.thumbnail_size(32, 256, 64) == (8, 64)
    assert minipng.thumbnail_size(100, 40, 64) == (64, 26)
    assert minipng.thumbnail_size(10, 8, 64) == (10, 8)
    assert minipng.thumbnail_size(8000, 2, 64) == (64, 1)  # never below 1
    tw, th, tb = minipng.thumbnail(make_png(100, 40, (5, 5, 5)), 64)
    assert (tw, th) == (64, 26)
    assert tb[:8] == b"\x89PNG\r\n\x1a\n"
    assert minipng.decode(tb)[:3] == (64, 26, 3)


def test_png_generator_is_structurally_valid():
    """CRC-checked chunk layout independent of any codec."""
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


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def make_palette_png(
    width: int,
    height: int,
    palette: list[tuple[int, int, int]],
    indices: list[list[int]],
    with_plte: bool = True,
    with_trns: bool = False,
) -> bytes:
    """8-bit color-type-3 PNG: PLTE of RGB triples + index scanlines."""
    ihdr = struct.pack(">IIBBBBB", width, height, 8, 3, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(row) for row in indices)
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if with_plte:
        out += _chunk(b"PLTE", b"".join(bytes(c) for c in palette))
    if with_trns:
        out += _chunk(b"tRNS", bytes([255] * len(palette)))
    return out + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")


def test_minipng_palette_expands_to_rgb():
    pal = [(255, 0, 0), (0, 255, 0), (0, 0, 255)]
    png = make_palette_png(3, 2, pal, [[0, 1, 2], [2, 1, 0]])
    w, h, ch, rows = minipng.decode(png)
    assert (w, h, ch) == (3, 2, 3)
    assert bytes(rows[0]) == b"\xff\x00\x00\x00\xff\x00\x00\x00\xff"
    assert bytes(rows[1]) == b"\x00\x00\xff\x00\xff\x00\xff\x00\x00"
    # Luma via the palette expansion == luma of the equivalent RGB image.
    expected = (
        2 * _pil_luma((255, 0, 0))
        + 2 * _pil_luma((0, 255, 0))
        + 2 * _pil_luma((0, 0, 255))
    ) / 6
    assert minipng.mean_luma(png) == expected


def test_minipng_palette_error_paths():
    import pytest

    pal = [(9, 9, 9)]
    ok = make_palette_png(2, 1, pal, [[0, 0]])
    assert minipng.decode(ok)[:3] == (2, 1, 3)
    with pytest.raises(ValueError, match="missing PLTE"):
        minipng.decode(make_palette_png(2, 1, pal, [[0, 0]], with_plte=False))
    with pytest.raises(ValueError, match="out of range"):
        minipng.decode(make_palette_png(2, 1, pal, [[0, 1]]))
    # tRNS is now SUPPORTED for palette: expands to RGBA with the
    # chunk's alpha (make_palette_png writes alpha=255 per entry).
    w_, h_, ch_, rows_ = minipng.decode(
        make_palette_png(2, 1, pal, [[0, 0]], with_trns=True)
    )
    assert (w_, h_, ch_) == (2, 1, 4)
    assert bytes(rows_[0]) == bytes([9, 9, 9, 255, 9, 9, 9, 255])


def test_minipng_palette_through_spark_decode(spark):
    """The multimodal decode operator reads palette PNGs end-to-end."""
    from etl_tj_project_spark.operators.multimodal import decode_features_real

    pal = [(10, 200, 30), (0, 0, 0)]
    png = make_palette_png(4, 4, pal, [[0, 0, 0, 0]] * 4)
    out = {
        r.doc_id: r
        for r in decode_features_real(_media_df(spark, [(1, png)])).collect()
    }
    assert out[1].brightness == float(_pil_luma((10, 200, 30)))


# --- property-based codec checks (hypothesis) ------------------------------

from hypothesis import given, settings
from hypothesis import strategies as st


def _apply_filter(ftype: int, raw: bytes, prev: bytes, ch: int) -> bytes:
    """Forward PNG filter (the encoder side of what minipng.decode
    reverses) — lets the test produce valid PNGs using ALL filter types,
    which minipng.encode (filter-0 only) cannot."""
    out = bytearray(len(raw))
    for i in range(len(raw)):
        left = raw[i - ch] if i >= ch else 0
        up = prev[i]
        upleft = prev[i - ch] if i >= ch else 0
        if ftype == 0:
            out[i] = raw[i]
        elif ftype == 1:
            out[i] = (raw[i] - left) & 0xFF
        elif ftype == 2:
            out[i] = (raw[i] - up) & 0xFF
        elif ftype == 3:
            out[i] = (raw[i] - ((left + up) >> 1)) & 0xFF
        else:
            from etl_tj_project_spark.operators.minipng import _paeth

            out[i] = (raw[i] - _paeth(left, up, upleft)) & 0xFF
    return bytes(out)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 8),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_minipng_decodes_any_filter_sequence(w, h, channels, data):
    """decode(encode_with_random_filters(pixels)) == pixels for every
    color type and per-row filter choice — the unfilter paths (Sub/Up/
    Average/Paeth) are exercised against a forward-filter reference."""
    rows = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * channels,
                    max_size=w * channels,
                )
            )
        )
        for _ in range(h)
    ]
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    idat = bytearray()
    prev = bytes(w * channels)
    for raw, ftype in zip(rows, filters):
        idat.append(ftype)
        idat += _apply_filter(ftype, raw, prev, channels)
        prev = raw

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0))
        + chunk(b"IDAT", zlib.compress(bytes(idat)))
        + chunk(b"IEND", b"")
    )
    dw, dh, dch, drows = minipng.decode(png)
    assert (dw, dh, dch) == (w, h, channels)
    assert [bytes(r) for r in drows] == rows


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 6),
    n_colors=st.integers(1, 8),
    data=st.data(),
)
def test_minipng_palette_any_filter_sequence(w, h, n_colors, data):
    """Palette decode under every filter type: filters apply to the
    1-byte index stream (not the expanded RGB), and expansion matches a
    python-side palette lookup."""
    palette = [
        tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        for _ in range(n_colors)
    ]
    idx_rows = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, n_colors - 1), min_size=w, max_size=w
                )
            )
        )
        for _ in range(h)
    ]
    filters = [data.draw(st.integers(0, 4)) for _ in range(h)]
    idat = bytearray()
    prev = bytes(w)
    for raw, ftype in zip(idx_rows, filters):
        idat.append(ftype)
        idat += _apply_filter(ftype, raw, prev, 1)
        prev = raw
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", b"".join(bytes(c) for c in palette))
        + _chunk(b"IDAT", zlib.compress(bytes(idat)))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, drows = minipng.decode(png)
    assert (dw, dh, dch) == (w, h, 3)
    expected = [
        b"".join(bytes(palette[i]) for i in row) for row in idx_rows
    ]
    assert [bytes(r) for r in drows] == expected


@settings(max_examples=25, deadline=None)
@given(w=st.integers(1, 300), h=st.integers(1, 300), m=st.integers(1, 128))
def test_minipng_thumbnail_size_invariants(w, h, m):
    """Clamp semantics hold for arbitrary shapes: never upscale, longer
    side <= max_side after shrink, both dims >= 1."""
    tw, th = minipng.thumbnail_size(w, h, m)
    assert 1 <= tw <= max(w, m) and 1 <= th <= max(h, m)
    if w <= m and h <= m:
        assert (tw, th) == (w, h)
    else:
        assert max(tw, th) <= m


# ---------------------------------------------------------------------------
# Adam7 interlace: a test-side forward interlacer (extract passes, filter
# each independently) exercises the deinterlacing scatter path.
# ---------------------------------------------------------------------------

def _adam7_idat(
    rows: list[bytes], w: int, h: int, ch: int, draw_filter
) -> bytes:
    """Forward-interlace a full pixel grid into an Adam7 IDAT stream:
    per pass, gather the sub-image, filter each line (filter type chosen
    by draw_filter()) against the previous line OF THE SAME PASS."""
    from etl_tj_project_spark.operators.minipng import _ADAM7, _pass_dims

    idat = bytearray()
    for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, _pass_dims(w, h)):
        if not pw or not ph:
            continue
        prev = bytes(pw * ch)
        for py in range(ph):
            y = y0 + py * dy
            line = b"".join(
                rows[y][(x0 + px * dx) * ch : (x0 + px * dx + 1) * ch]
                for px in range(pw)
            )
            ftype = draw_filter()
            idat.append(ftype)
            idat += _apply_filter(ftype, line, prev, ch)
            prev = line
    return bytes(idat)


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 12),
    h=st.integers(1, 11),
    channels=st.sampled_from([1, 2, 3, 4]),
    data=st.data(),
)
def test_minipng_adam7_roundtrip(w, h, channels, data):
    """decode(adam7_interlace(pixels)) == pixels for every color type,
    image shape (including shapes where whole passes are empty: w or
    h < 5 skips passes), and per-line filter choice."""
    rows = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255),
                    min_size=w * channels,
                    max_size=w * channels,
                )
            )
        )
        for _ in range(h)
    ]
    idat = _adam7_idat(
        rows, w, h, channels, lambda: data.draw(st.integers(0, 4))
    )
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1))
        + _chunk(b"IDAT", zlib.compress(idat))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, drows = minipng.decode(png)
    assert (dw, dh, dch) == (w, h, channels)
    assert [bytes(r) for r in drows] == rows


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 9),
    n_colors=st.integers(1, 8),
    data=st.data(),
)
def test_minipng_adam7_palette(w, h, n_colors, data):
    """Interlaced palette PNGs: the Adam7 passes carry the 1-byte index
    stream; expansion to RGB happens after deinterlacing and matches a
    python-side palette lookup."""
    palette = [
        tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        for _ in range(n_colors)
    ]
    idx_rows = [
        bytes(
            data.draw(
                st.lists(st.integers(0, n_colors - 1), min_size=w, max_size=w)
            )
        )
        for _ in range(h)
    ]
    idat = _adam7_idat(
        idx_rows, w, h, 1, lambda: data.draw(st.integers(0, 4))
    )
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 1))
        + _chunk(b"PLTE", b"".join(bytes(c) for c in palette))
        + _chunk(b"IDAT", zlib.compress(idat))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, drows = minipng.decode(png)
    assert (dw, dh, dch) == (w, h, 3)
    expected = [
        b"".join(bytes(palette[i]) for i in row) for row in idx_rows
    ]
    assert [bytes(r) for r in drows] == expected


def test_minipng_adam7_truncated_raises():
    """An interlaced PNG whose IDAT is short one pass must raise, not
    return a half-scattered grid."""
    rows = [bytes(range(16)) for _ in range(8)]  # 16x8 gray... w=16
    idat = _adam7_idat(rows, 16, 8, 1, lambda: 0)
    short = zlib.compress(idat[: len(idat) - 5])
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 16, 8, 8, 0, 0, 0, 1))
        + _chunk(b"IDAT", short)
        + _chunk(b"IEND", b"")
    )
    import pytest as _pytest

    with _pytest.raises(ValueError):
        minipng.decode(png)


@settings(max_examples=30, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 6),
    channels=st.sampled_from([1, 2, 3, 4]),
    interlaced=st.booleans(),
    data=st.data(),
)
def test_minipng_16bit_high_byte_downsample(w, h, channels, interlaced, data):
    """16-bit PNGs under every filter type (and Adam7): filters apply
    at bpp = channels*2 bytes, and decoded samples equal each
    big-endian 16-bit sample's HIGH byte (PIL's I;16 -> L rule)."""
    bpp = channels * 2
    rows16 = [
        bytes(
            data.draw(
                st.lists(
                    st.integers(0, 255), min_size=w * bpp, max_size=w * bpp
                )
            )
        )
        for _ in range(h)
    ]
    if interlaced:
        idat = _adam7_idat(
            rows16, w, h, bpp, lambda: data.draw(st.integers(0, 4))
        )
    else:
        idat_b = bytearray()
        prev = bytes(w * bpp)
        for raw in rows16:
            ftype = data.draw(st.integers(0, 4))
            idat_b.append(ftype)
            idat_b += _apply_filter(ftype, raw, prev, bpp)
            prev = raw
        idat = bytes(idat_b)
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(
            b"IHDR",
            struct.pack(">IIBBBBB", w, h, 16, ctype, 0, 0, int(interlaced)),
        )
        + _chunk(b"IDAT", zlib.compress(idat))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, drows = minipng.decode(png)
    assert (dw, dh, dch) == (w, h, channels)
    expected = [bytes(r[0::2]) for r in rows16]
    assert [bytes(r) for r in drows] == expected


def test_minipng_16bit_palette_rejected():
    """Palette color type caps at 8-bit depth (spec 11.2.2)."""
    import pytest as _pytest

    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 16, 3, 0, 0, 0))
        + _chunk(b"PLTE", b"\x00\x00\x00")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="8-bit"):
        minipng.decode(png)


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 8),
    h=st.integers(1, 6),
    n_colors=st.integers(1, 8),
    n_trns=st.integers(0, 8),
    data=st.data(),
)
def test_minipng_palette_trns_expands_to_rgba(w, h, n_colors, n_trns, data):
    """Palette + tRNS decodes to RGBA: alpha comes from the tRNS entry
    for the pixel's palette index, defaulting to 255 past the chunk's
    length (spec 11.3.2) — PIL's P+transparency -> RGBA conversion."""
    n_trns = min(n_trns, n_colors)
    palette = [
        tuple(data.draw(st.integers(0, 255)) for _ in range(3))
        for _ in range(n_colors)
    ]
    alphas = [data.draw(st.integers(0, 255)) for _ in range(n_trns)]
    idx_rows = [
        bytes(
            data.draw(
                st.lists(st.integers(0, n_colors - 1), min_size=w, max_size=w)
            )
        )
        for _ in range(h)
    ]
    idat = bytearray()
    prev = bytes(w)
    for raw in idx_rows:
        ftype = data.draw(st.integers(0, 4))
        idat.append(ftype)
        idat += _apply_filter(ftype, raw, prev, 1)
        prev = raw
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", b"".join(bytes(c) for c in palette))
        + _chunk(b"tRNS", bytes(alphas))
        + _chunk(b"IDAT", zlib.compress(bytes(idat)))
        + _chunk(b"IEND", b"")
    )
    dw, dh, dch, drows = minipng.decode(png)
    assert (dw, dh, dch) == (w, h, 4)
    expected = [
        b"".join(
            bytes(palette[i]) + bytes([alphas[i] if i < n_trns else 255])
            for i in row
        )
        for row in idx_rows
    ]
    assert [bytes(r) for r in drows] == expected


def test_minipng_trns_error_paths():
    import pytest as _pytest

    # tRNS on grayscale: color-key transparency, out of scope.
    png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 0, 0, 0, 0))
        + _chunk(b"tRNS", b"\x00\x00")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="palette"):
        minipng.decode(png)
    # tRNS longer than the palette is malformed.
    png2 = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", b"\x01\x02\x03")
        + _chunk(b"tRNS", b"\x10\x20")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00"))
        + _chunk(b"IEND", b"")
    )
    with _pytest.raises(ValueError, match="tRNS"):
        minipng.decode(png2)


def test_minipng_trns_and_16bit_through_spark_decode(spark):
    """The Arrow-batched decode operator handles tRNS-palette (RGBA)
    and 16-bit PNGs end-to-end — luma ignores alpha and uses the
    high-byte downsample respectively."""
    from etl_tj_project_spark.operators.multimodal import decode_features_real

    # tRNS palette: single color (10,200,30) with alpha 7 everywhere.
    pal = [(10, 200, 30)]
    trns_png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 3, 0, 0, 0))
        + _chunk(b"PLTE", bytes(pal[0]))
        + _chunk(b"tRNS", b"\x07")
        + _chunk(b"IDAT", zlib.compress(b"\x00\x00\x00" * 2))
        + _chunk(b"IEND", b"")
    )
    # 16-bit gray: value 0xAB__ everywhere -> 8-bit 0xAB.
    row16 = b"\xab\xcd" * 3
    idat = b"".join(b"\x00" + row16 for _ in range(2))
    g16_png = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 2, 16, 0, 0, 0, 0))
        + _chunk(b"IDAT", zlib.compress(idat))
        + _chunk(b"IEND", b"")
    )
    out = {
        r.doc_id: r
        for r in decode_features_real(
            _media_df(spark, [(1, trns_png), (2, g16_png)])
        ).collect()
    }
    assert out[1].brightness == float(_pil_luma((10, 200, 30)))
    assert out[2].brightness == float(0xAB)
