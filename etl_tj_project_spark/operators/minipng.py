"""Dependency-free minimal PNG codec (stdlib zlib + struct only).

Exists so the *real* media-decode branch of :mod:`.multimodal` can run in
environments without PIL (this container has no image libraries): decode
is a full PNG read — chunk walk, zlib inflate, per-scanline unfilter
(None/Sub/Up/Average/Paeth) — not a header peek, and the luma and
thumbnail-dimension math reproduces PIL bit-for-bit so swapping backends
never changes results:

* luma: PIL ``convert("L")`` integer ITU-R 601-2 —
  ``(R*19595 + G*38470 + B*7471 + 0x8000) >> 16``
* thumbnail dims: PIL ``Image.thumbnail`` round-aspect selection
  (floor/ceil candidate minimizing aspect error, never below 1; no
  upscale)

Scope (documented, raises ``ValueError`` outside it): 8- and 16-bit
depths (16-bit samples downscale to 8-bit via the high byte — PIL's
I;16→L rule), color types 0/2/3/4/6 (gray, RGB, palette, gray+alpha,
RGBA), Adam7 interlace supported, palette tRNS transparency
(expanded to RGBA like PIL; gray/RGB color-key tRNS stays out of scope). Palette images are expanded
to RGB at decode time — exactly what PIL does on
``convert("L")``/``convert("RGB")`` from mode "P", so luma stays
bit-identical. Interlaced images deinterlace to the same pixel grid PIL
produces (each Adam7 pass is an independently-filtered sub-image whose
samples scatter back by the spec §8.2 offsets/steps; filters — and for
palette images the index stream — apply per pass, before expansion).
Resampling for thumbnails is nearest-neighbor (deterministic and cheap;
PIL's default is bicubic — pixel VALUES may differ between backends,
dimensions and format never do).
"""

from __future__ import annotations

import math
import struct
import zlib

_MAGIC = b"\x89PNG\r\n\x1a\n"
# Channels as stored in the scanline stream (palette stores 1 index byte
# per pixel; decode expands it to RGB afterwards).
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


def _chunks(data: bytes):
    if data[:8] != _MAGIC:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length:
            raise ValueError("truncated PNG chunk")
        yield tag, payload
        pos += 12 + length  # skip CRC — zlib inflate will catch corruption
        if tag == b"IEND":
            return
    raise ValueError("PNG ended without IEND")


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per pass, spec §8.2.
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _pass_dims(width: int, height: int) -> list[tuple[int, int]]:
    """(pass_width, pass_height) for each Adam7 pass; a 0-sized pass
    contributes no scanlines at all (not even filter bytes)."""
    return [
        (
            (width - x0 + dx - 1) // dx if width > x0 else 0,
            (height - y0 + dy - 1) // dy if height > y0 else 0,
        )
        for x0, y0, dx, dy in _ADAM7
    ]


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _unfilter_pass(
    raw: bytes, pos: int, width: int, height: int, ch: int
) -> tuple[list[bytearray], int]:
    """Unfilter one filtered sub-image (``height`` scanlines of
    ``width * ch`` samples each, every line led by its filter byte)
    starting at ``pos`` in ``raw``. → (rows, position after the pass).
    The previous-row reference resets to zeros at the pass boundary —
    each Adam7 pass (and the whole image when not interlaced) filters
    independently."""
    stride = width * ch
    rows: list[bytearray] = []
    prev = bytearray(stride)
    for _ in range(height):
        if pos >= len(raw):
            raise ValueError("PNG pixel data length mismatch")
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        if len(line) != stride:
            raise ValueError("PNG pixel data length mismatch")
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(ch, stride):
                line[i] = (line[i] + line[i - ch]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - ch] if i >= ch else 0
                upleft = prev[i - ch] if i >= ch else 0
                line[i] = (line[i] + _paeth(left, prev[i], upleft)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"bad PNG filter type {ftype}")
        rows.append(line)
        prev = line
    return rows, pos


def decode(data: bytes) -> tuple[int, int, int, list[bytearray]]:
    """→ (width, height, channels, rows of unfiltered samples).

    Each row is ``width * channels`` bytes, top to bottom.
    """
    width = height = None
    ctype = None
    interlace = 0
    idat = bytearray()
    plte: bytes | None = None
    trns: bytes | None = None
    for tag, payload in _chunks(data):
        if tag == b"IHDR":
            width, height, depth, ctype, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", payload
            )
            if depth not in (8, 16):
                raise ValueError(
                    f"unsupported bit depth {depth} (only 8/16)"
                )
            if ctype not in _CHANNELS:
                raise ValueError(f"unsupported color type {ctype}")
            if ctype == 3 and depth != 8:
                raise ValueError("palette PNGs are 8-bit max (spec 11.2.2)")
            if interlace not in (0, 1):
                raise ValueError(f"bad interlace method {interlace}")
            if comp or filt:
                raise ValueError("nonstandard compression/filter method")
        elif tag == b"PLTE":
            if len(payload) % 3 or not 3 <= len(payload) <= 768:
                raise ValueError("bad PLTE length")
            plte = payload
        elif tag == b"tRNS":
            if ctype != 3:
                # gray/RGB tRNS is single-color keying — out of scope.
                raise ValueError("tRNS only supported for palette PNGs")
            trns = payload
        elif tag == b"IDAT":
            idat += payload
    if width is None:
        raise ValueError("PNG missing IHDR")
    if ctype == 3 and plte is None:
        raise ValueError("palette PNG missing PLTE chunk")
    ch = _CHANNELS[ctype]
    # PNG filters operate on BYTES with left-neighbor distance = bytes
    # per pixel, so 16-bit images unfilter with the same code at
    # bpp = channels * 2 (spec 9.2); samples downscale to 8-bit after.
    sample_bytes = depth // 8
    bpp = ch * sample_bytes
    raw = zlib.decompress(bytes(idat))
    if interlace:
        # Adam7: seven independently-filtered sub-images; scatter each
        # pass's samples back to the full grid by the spec offsets.
        dims = _pass_dims(width, height)
        expect = sum((pw * bpp + 1) * ph for pw, ph in dims if pw and ph)
        if len(raw) != expect:
            raise ValueError("PNG pixel data length mismatch")
        rows = [bytearray(width * bpp) for _ in range(height)]
        pos = 0
        for (x0, y0, dx, dy), (pw, ph) in zip(_ADAM7, dims):
            if not pw or not ph:
                continue
            pass_rows, pos = _unfilter_pass(raw, pos, pw, ph, bpp)
            for py, line in enumerate(pass_rows):
                y = y0 + py * dy
                out = rows[y]
                for px in range(pw):
                    x = x0 + px * dx
                    out[x * bpp : (x + 1) * bpp] = line[px * bpp : (px + 1) * bpp]
    else:
        stride = width * bpp
        if len(raw) != (stride + 1) * height:
            raise ValueError("PNG pixel data length mismatch")
        rows, _ = _unfilter_pass(raw, 0, width, height, bpp)
    if sample_bytes == 2:
        # Downsample to 8-bit by keeping each big-endian sample's high
        # byte — PIL's I;16 -> L conversion (value // 256), applied
        # per channel for color types 2/4/6.
        rows = [row[0::2] for row in rows]
    if ctype == 3:
        # Expand palette indices AFTER unfiltering — PNG filters operate
        # on the 1-byte-per-pixel index stream, not the expanded samples
        # (PNG spec §9; expanding first would mis-unfilter). With a
        # tRNS chunk the expansion is RGBA (alpha per palette entry,
        # entries past the chunk's length default to 255 — spec 11.3.2),
        # matching PIL's mode "P" + transparency -> "RGBA" conversion.
        n_entries = len(plte) // 3
        if trns is not None and len(trns) > n_entries:
            raise ValueError("tRNS longer than the palette")
        out_ch = 3 if trns is None else 4
        exp_rows: list[bytearray] = []
        for line in rows:
            out = bytearray(width * out_ch)
            for x, idx in enumerate(line):
                if idx >= n_entries:
                    raise ValueError(
                        f"palette index {idx} out of range ({n_entries} entries)"
                    )
                base = x * out_ch
                out[base : base + 3] = plte[idx * 3 : idx * 3 + 3]
                if out_ch == 4:
                    out[base + 3] = trns[idx] if idx < len(trns) else 255
            exp_rows.append(out)
        return width, height, out_ch, exp_rows
    return width, height, ch, rows


def mean_luma(data: bytes) -> float | None:
    """Mean grayscale value, PIL ``convert("L")``-identical: integer
    ITU-R 601-2 per pixel (alpha ignored), float mean over pixels.
    None for a 0-pixel image."""
    width, height, ch, rows = decode(data)
    n = width * height
    if n == 0:
        return None
    total = 0
    for row in rows:
        if ch >= 3:  # RGB / RGBA
            for i in range(0, len(row), ch):
                total += (
                    row[i] * 19595 + row[i + 1] * 38470 + row[i + 2] * 7471 + 0x8000
                ) >> 16
        else:  # gray / gray+alpha
            for i in range(0, len(row), ch):
                total += row[i]
    return total / n


def _round_aspect(number: float, key) -> int:
    # PIL Image.thumbnail's tie-break: floor vs ceil, whichever keeps the
    # aspect ratio closest; never below 1.
    return max(min(math.floor(number), math.ceil(number), key=key), 1)


def thumbnail_size(width: int, height: int, max_side: int) -> tuple[int, int]:
    """PIL ``Image.thumbnail((max_side, max_side))`` output dims: clamp
    the longer side, aspect-preserving, no upscale."""
    if max_side >= width and max_side >= height:
        return width, height
    aspect = width / height
    x, y = max_side, max_side
    if x / y >= aspect:
        x = _round_aspect(y * aspect, key=lambda n: abs(aspect - n / y))
    else:
        y = _round_aspect(
            x / aspect, key=lambda n: 0 if n == 0 else abs(aspect - x / n)
        )
    return x, y


def encode(width: int, height: int, channels: int, rows: list[bytearray]) -> bytes:
    """Minimal PNG writer: filter 0 scanlines, one IDAT."""
    ctype = {1: 0, 3: 2, 2: 4, 4: 6}[channels]

    def chunk(tag: bytes, payload: bytes) -> bytes:
        return (
            struct.pack(">I", len(payload))
            + tag
            + payload
            + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, ctype, 0, 0, 0)
    raw = b"".join(b"\x00" + bytes(r) for r in rows)
    return (
        _MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def thumbnail(data: bytes, max_side: int) -> tuple[int, int, bytes]:
    """Decode → PIL-dimensioned clamp → nearest-neighbor resample →
    re-encode. → (thumb_w, thumb_h, png_bytes)."""
    width, height, ch, rows = decode(data)
    tw, th = thumbnail_size(width, height, max_side)
    if (tw, th) == (width, height):
        return width, height, encode(width, height, ch, rows)
    out_rows: list[bytearray] = []
    for ty in range(th):
        src = rows[ty * height // th]
        line = bytearray(tw * ch)
        for tx in range(tw):
            sx = tx * width // tw
            line[tx * ch : (tx + 1) * ch] = src[sx * ch : (sx + 1) * ch]
        out_rows.append(line)
    return tw, th, encode(tw, th, ch, out_rows)
