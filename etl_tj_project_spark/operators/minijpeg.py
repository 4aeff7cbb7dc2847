"""Dependency-free baseline JPEG codec (pure stdlib).

Closes the last multimodal codec gap (VERDICT r3/r5/r6: ``minipng``
covers every PNG form but JPEG payloads fell to the undecodable-stub
path): the real-decode branch of :mod:`.multimodal` now decodes JPEG
in containers without PIL, exactly like it does PNG.

Decoder scope (raises ``ValueError`` outside it):

* baseline sequential DCT, 8-bit precision (SOF0; SOF1 accepted — its
  entropy coding is identical at 8-bit) — the format >99% of real-world
  JPEGs use. Progressive (SOF2), arithmetic coding, hierarchical and
  lossless modes are out of scope and rejected loudly.
* 1-component grayscale and 3-component YCbCr, sampling factors 1 or 2
  per axis (4:4:4, 4:2:2, 4:4:0, 4:2:0); chroma upsampling is
  nearest-neighbor replication.
* restart intervals (DRI / RSTn) with DC-predictor reset.
* color conversion is the JFIF/CCIR 601 full-range transform
  (R = Y + 1.402 (Cr-128) etc.), rounded to nearest, clamped — the
  same math PIL/libjpeg apply, so luma stats agree across backends up
  to IDCT rounding (libjpeg's fixed-point IDCT differs from an exact
  float IDCT by at most ±1/pixel).

The encoder exists so tests can roundtrip without any image library in
the container (the same self-contained strategy as miniwav): baseline
JFIF with quality-scaled Annex-K quantization tables, 4:4:4 or 4:2:0,
and per-image canonical Huffman tables built from the actual symbol
set (flat fixed-length codes — valid JPEG, suboptimal compression,
zero risk of mis-transcribed spec tables).

``decode`` returns the same ``(width, height, channels, rows)``
contract as :func:`minipng.decode` so the multimodal feature/thumbnail
stages dispatch on magic bytes and share all downstream math.
"""

from __future__ import annotations

import math
import struct

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# ITU-T T.81 Annex K.1 reference quantization tables (quality 50).
_QUANT_LUMA = [
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
]
_QUANT_CHROMA = [
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
]

# 8-point DCT basis: _COS[u][x] = cos((2x+1) u pi / 16).
_COS = [
    [math.cos((2 * x + 1) * u * math.pi / 16) for x in range(8)]
    for u in range(8)
]
_C = [1 / math.sqrt(2)] + [1.0] * 7


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 2 and data[:2] == b"\xff\xd8"


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (left for the caller)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                # Past the end: pad with 1s (spec: padding bits are 1s);
                # a truncated stream surfaces as a marker-scan error later.
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                    self.bits = (self.bits << 8) | 0xFF
                    self.nbits += 8
                    continue
                # Real marker: stop feeding, pad with 1s.
                self.bits = (self.bits << 8) | 0xFF
                self.nbits += 8
                continue
            self.pos += 1
            self.bits = (self.bits << 8) | b
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.bits >> self.nbits) & ((1 << n) - 1)
        self.bits &= (1 << self.nbits) - 1
        return v

    def align_to_marker(self) -> None:
        """Drop partial byte and any consumed-but-unused whole bytes so
        ``pos`` points at the next unread stream byte."""
        # Whole bytes still buffered were already consumed from pos —
        # they cannot be "pushed back" exactly when stuffing was
        # involved, so restart handling re-scans from the marker instead
        # (see _decode_scan).
        self.bits = 0
        self.nbits = 0


def _build_huffman(counts: list[int], symbols: bytes) -> dict[tuple[int, int], int]:
    """Canonical JPEG Huffman table: {(length, code): symbol}."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read(1)
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a SIZE-bit magnitude."""
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _idct_2d(coefs: list[float]) -> list[float]:
    """Exact float 8x8 inverse DCT (separable, DCT-III)."""
    tmp = [0.0] * 64
    # rows
    for y in range(8):
        base = y * 8
        row = coefs[base : base + 8]
        for x in range(8):
            s = 0.0
            for u in range(8):
                s += _C[u] * row[u] * _COS[u][x]
            tmp[base + x] = s / 2
    out = [0.0] * 64
    # columns
    for x in range(8):
        col = [tmp[y * 8 + x] for y in range(8)]
        for y in range(8):
            s = 0.0
            for v in range(8):
                s += _C[v] * col[v] * _COS[v][y]
            out[y * 8 + x] = s / 2
    return out


def decode(data: bytes) -> tuple[int, int, int, list[bytearray]]:
    """Baseline JPEG → (width, height, channels, rows); channels is 1
    (grayscale) or 3 (RGB), rows are interleaved-byte scanlines —
    the :func:`minipng.decode` contract."""
    if not is_jpeg(data):
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, list[int]] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (w, h, [(comp_id, hi, vi, tq)])
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            raise ValueError("JPEG marker expected")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:  # RSTn/TEM: bare
            continue
        (seglen,) = struct.unpack(">H", data[pos : pos + 2])
        seg = data[pos + 2 : pos + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if pq == 0:
                    vals = list(seg[p : p + 64])
                    p += 64
                else:
                    vals = [
                        struct.unpack(">H", seg[p + 2 * i : p + 2 * i + 2])[0]
                        for i in range(64)
                    ]
                    p += 128
                qtables[tq] = vals
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 0x0F
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = seg[p + 17 : p + 17 + n]
                htables[(tc, th)] = _build_huffman(counts, symbols)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0 baseline / SOF1 ext. seq.
            precision = seg[0]
            if precision != 8:
                raise ValueError(f"unsupported JPEG precision {precision}")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for i in range(ncomp):
                cid, hv, tq = seg[6 + 3 * i : 9 + 3 * i]
                hi, vi = hv >> 4, hv & 0x0F
                if hi not in (1, 2) or vi not in (1, 2):
                    raise ValueError(
                        f"unsupported sampling factors {hi}x{vi}"
                    )
                comps.append((cid, hi, vi, tq))
            if ncomp not in (1, 3):
                raise ValueError(f"unsupported component count {ncomp}")
            frame = (w, h, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "unsupported JPEG mode (progressive/arithmetic/"
                f"hierarchical: SOF marker 0x{marker:02X})"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("JPEG SOS before SOF")
            ns = seg[0]
            scan = []
            for i in range(ns):
                cs, tdta = seg[1 + 2 * i], seg[2 + 2 * i]
                scan.append((cs, tdta >> 4, tdta & 0x0F))
            planes = _decode_scan(
                data, pos + seglen, frame, scan, qtables, htables,
                restart_interval,
            )
            return _to_pixels(frame, planes)
        # APPn / COM / others: skip
        pos += seglen
    raise ValueError("JPEG ended without SOS")


def _decode_scan(data, pos, frame, scan, qtables, htables, restart_interval):
    w, h, comps = frame
    # T.81 §A.2.2: a single-component scan is NON-interleaved — one 8x8
    # block per MCU in raster order over ceil(w/8) x ceil(h/8) blocks,
    # REGARDLESS of the sampling factors the SOF declares (grayscale
    # files chroma-dropped by jpegtran keep 2x2 factors). Decoding such
    # a file with the interleaved hi*vi-blocks-per-MCU layout desyncs
    # the Huffman stream / garbles pixels, so force 1x1 here.
    if len(comps) == 1:
        cid0, _hi0, _vi0, tq0 = comps[0]
        comps = [(cid0, 1, 1, tq0)]
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    # Per-component plane, padded to whole MCUs.
    planes = {}
    for cid, hi, vi, _tq in comps:
        planes[cid] = [
            bytearray(mcux * hi * 8) for _ in range(mcuy * vi * 8)
        ]
    order = []  # (cid, hi, vi, quant, dc_table, ac_table)
    for cid, hi, vi, tq in comps:
        entry = next((s for s in scan if s[0] == cid), None)
        if entry is None:
            raise ValueError("scan does not cover all frame components")
        _, td, ta = entry
        try:
            order.append(
                (cid, hi, vi, qtables[tq], htables[(0, td)], htables[(1, ta)])
            )
        except KeyError as e:
            raise ValueError(f"missing JPEG table {e}") from e
    reader = _BitReader(data, pos)
    pred = {cid: 0 for cid, *_ in order}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                # Byte-align and consume the RSTn marker.
                reader.align_to_marker()
                p = reader.pos
                # Skip stuffing remnants/fill bytes to the marker.
                while p + 1 < len(data) and not (
                    data[p] == 0xFF and 0xD0 <= data[p + 1] <= 0xD7
                ):
                    p += 1
                if p + 1 >= len(data):
                    raise ValueError("missing JPEG restart marker")
                reader.pos = p + 2
                pred = {cid: 0 for cid in pred}
            for cid, hi, vi, quant, dc_t, ac_t in order:
                for by in range(vi):
                    for bx in range(hi):
                        block = _decode_block(reader, dc_t, ac_t, quant, pred, cid)
                        _place_block(
                            planes[cid], block, (mx * hi + bx) * 8,
                            (my * vi + by) * 8,
                        )
            mcu_count += 1
    return planes


def _decode_block(reader, dc_t, ac_t, quant, pred, cid):
    coefs = [0.0] * 64
    s = _huff_decode(reader, dc_t)
    diff = _extend(reader.read(s), s)
    pred[cid] += diff
    coefs[0] = pred[cid] * quant[0]
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_t)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient run past block end")
        coefs[_ZIGZAG[k]] = _extend(reader.read(s), s) * quant[k]
        k += 1
    px = _idct_2d(coefs)
    return [
        min(255, max(0, round(v + 128.0)))
        for v in px
    ]


def _place_block(plane, block, x0, y0):
    for yy in range(8):
        row = plane[y0 + yy]
        row[x0 : x0 + 8] = bytes(block[yy * 8 : yy * 8 + 8])


def _to_pixels(frame, planes):
    w, h, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if len(comps) == 1:
        cid = comps[0][0]
        rows = [bytearray(planes[cid][y][:w]) for y in range(h)]
        return w, h, 1, rows
    (yid, yh, yv, _), (cbid, cbh, cbv, _), (crid, crh, crv, _) = comps
    ypl, cbpl, crpl = planes[yid], planes[cbid], planes[crid]
    rows: list[bytearray] = []
    for y in range(h):
        out = bytearray(w * 3)
        yrow = ypl[y * yv // vmax]
        cbrow = cbpl[y * cbv // vmax]
        crrow = crpl[y * crv // vmax]
        for x in range(w):
            Y = yrow[x * yh // hmax]
            cb = cbrow[x * cbh // hmax] - 128
            cr = crrow[x * crh // hmax] - 128
            r = round(Y + 1.402 * cr)
            g = round(Y - 0.344136 * cb - 0.714136 * cr)
            b = round(Y + 1.772 * cb)
            i = 3 * x
            out[i] = 255 if r > 255 else (0 if r < 0 else r)
            out[i + 1] = 255 if g > 255 else (0 if g < 0 else g)
            out[i + 2] = 255 if b > 255 else (0 if b < 0 else b)
        rows.append(out)
    return w, h, 3, rows


# ---------------------------------------------------------------------------
# Feature helpers (same contracts as minipng)
# ---------------------------------------------------------------------------

def mean_luma(data: bytes) -> float | None:
    """Mean grayscale value of a decoded JPEG, PIL ``convert("L")``
    integer ITU-R 601-2 per pixel. None for a 0-pixel image."""
    width, height, ch, rows = decode(data)
    n = width * height
    if n == 0:
        return None
    total = 0
    for row in rows:
        if ch == 3:
            for i in range(0, len(row), 3):
                total += (
                    row[i] * 19595 + row[i + 1] * 38470 + row[i + 2] * 7471
                    + 0x8000
                ) >> 16
        else:
            total += sum(row)
    return total / n


def thumbnail(data: bytes, max_side: int) -> tuple[int, int, bytes]:
    """Decode JPEG → PIL-dimensioned clamp → nearest-neighbor resample →
    PNG re-encode (thumbnails are emitted as PNG in both codec backends
    so downstream schema/stats never depend on the input format)."""
    from etl_tj_project_spark.operators import minipng

    width, height, ch, rows = decode(data)
    tw, th = minipng.thumbnail_size(width, height, max_side)
    if (tw, th) == (width, height):
        return width, height, minipng.encode(width, height, ch, rows)
    out_rows: list[bytearray] = []
    for ty in range(th):
        src = rows[ty * height // th]
        line = bytearray(tw * ch)
        for tx in range(tw):
            sx = tx * width // tw
            line[tx * ch : (tx + 1) * ch] = src[sx * ch : (sx + 1) * ch]
        out_rows.append(line)
    return tw, th, minipng.encode(tw, th, ch, out_rows)


# ---------------------------------------------------------------------------
# Encoder (tests + thumbnail-as-jpeg; baseline JFIF)
# ---------------------------------------------------------------------------

def _quality_tables(quality: int) -> tuple[list[int], list[int]]:
    """libjpeg's quality→scale mapping of the Annex-K tables, returned
    in ZIGZAG order (element k = quant for zigzag position k — the DQT
    wire order and the order both codec halves index by)."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    out = []
    for base in (_QUANT_LUMA, _QUANT_CHROMA):
        scaled = [min(255, max(1, (v * scale + 50) // 100)) for v in base]
        out.append([scaled[_ZIGZAG[k]] for k in range(64)])
    return out[0], out[1]


def _fdct_2d(px: list[float]) -> list[float]:
    tmp = [0.0] * 64
    for y in range(8):
        base = y * 8
        row = px[base : base + 8]
        for u in range(8):
            s = 0.0
            for x in range(8):
                s += row[x] * _COS[u][x]
            tmp[base + u] = s * _C[u] / 2
    out = [0.0] * 64
    for u in range(8):
        col = [tmp[y * 8 + u] for y in range(8)]
        for v in range(8):
            s = 0.0
            for y in range(8):
                s += col[y] * _COS[v][y]
            out[v * 8 + u] = s * _C[v] / 2
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nacc = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nacc += length
        while self.nacc >= 8:
            self.nacc -= 8
            b = (self.acc >> self.nacc) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.nacc) - 1

    def flush(self) -> None:
        if self.nacc:
            pad = 8 - self.nacc
            self.write((1 << pad) - 1, pad)  # 1-padding per spec


def _flat_huffman(symbols: list[int]) -> tuple[list[int], list[int], dict[int, tuple[int, int]]]:
    """Fixed-length canonical table over the distinct symbols actually
    used: BITS/HUFFVAL for the DHT segment + {symbol: (code, length)}.
    n < 2^L keeps the all-ones code unused (decoder-safe padding)."""
    distinct = sorted(set(symbols))
    n = len(distinct)
    length = max(1, n.bit_length())
    counts = [0] * 16
    counts[length - 1] = n
    enc = {sym: (i, length) for i, sym in enumerate(distinct)}
    return counts, distinct, enc


def _magnitude(v: int) -> tuple[int, int]:
    """(size, SIZE-bit code) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def encode(
    width: int,
    height: int,
    channels: int,
    rows: list[bytearray],
    quality: int = 85,
    subsampling: str = "444",
    restart_interval: int = 0,
) -> bytes:
    """Baseline JFIF encode of gray (channels=1) or RGB (channels=3)
    interleaved rows. ``subsampling`` '444' or '420' (ignored for
    gray). ``restart_interval`` > 0 emits DRI + RSTn markers every N
    MCUs (what a parallel encoder writing independent stripes would
    produce — and the decoder path that needs test coverage)."""
    if channels not in (1, 3):
        raise ValueError("encode supports 1 (gray) or 3 (RGB) channels")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    qluma, qchroma = _quality_tables(quality)

    # Color transform to per-component planes (float, level-unshifted).
    if channels == 1:
        planes = [[[float(rows[y][x]) for x in range(width)]
                   for y in range(height)]]
    else:
        ypl = [[0.0] * width for _ in range(height)]
        cbpl = [[0.0] * width for _ in range(height)]
        crpl = [[0.0] * width for _ in range(height)]
        for y in range(height):
            row = rows[y]
            for x in range(width):
                r, g, b = row[3 * x], row[3 * x + 1], row[3 * x + 2]
                ypl[y][x] = 0.299 * r + 0.587 * g + 0.114 * b
                cbpl[y][x] = -0.168736 * r - 0.331264 * g + 0.5 * b + 128
                crpl[y][x] = 0.5 * r - 0.418688 * g - 0.081312 * b + 128
        planes = [ypl, cbpl, crpl]

    sub = channels == 3 and subsampling == "420"
    if sub:
        for ci in (1, 2):
            src = planes[ci]
            cw, chh = (width + 1) // 2, (height + 1) // 2
            ds = [[0.0] * cw for _ in range(chh)]
            for y in range(chh):
                for x in range(cw):
                    vals = [
                        src[min(2 * y + dy, height - 1)][min(2 * x + dx, width - 1)]
                        for dy in (0, 1) for dx in (0, 1)
                    ]
                    ds[y][x] = sum(vals) / 4
            planes[ci] = ds
    samp = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * channels
    hmax = max(s[0] for s in samp[:channels])
    vmax = max(s[1] for s in samp[:channels])
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)

    def block_at(plane, x0, y0):
        ph, pw = len(plane), len(plane[0])
        out = []
        for yy in range(8):
            sy = min(y0 + yy, ph - 1)
            prow = plane[sy]
            for xx in range(8):
                out.append(prow[min(x0 + xx, pw - 1)] - 128.0)
        return out

    # Pass 1: quantized coefficients, grouped per MCU (restart
    # boundaries land between MCUs).
    comp_quant = [qluma] + [qchroma] * (channels - 1)
    mcus: list[list[tuple[int, list[int]]]] = []  # [[(ci, zigzag coefs)]]
    for my in range(mcuy):
        for mx in range(mcux):
            mcu: list[tuple[int, list[int]]] = []
            for ci in range(channels):
                hi, vi = samp[ci]
                for by in range(vi):
                    for bx in range(hi):
                        raw = block_at(
                            planes[ci], (mx * hi + bx) * 8, (my * vi + by) * 8
                        )
                        co = _fdct_2d(raw)
                        q = comp_quant[ci]
                        zz = [
                            int(round(co[_ZIGZAG[k]] / q[k]))
                            for k in range(64)
                        ]
                        mcu.append((ci, zz))
            mcus.append(mcu)

    # Pass 2: symbol census for the per-image Huffman tables, with the
    # DC predictor resetting at every restart boundary.
    dc_syms: dict[int, list[int]] = {0: [], 1: []}
    ac_syms: dict[int, list[int]] = {0: [], 1: []}
    pred = [0] * channels
    mcu_streams: list[list[tuple[int, list]]] = []
    for mi, mcu in enumerate(mcus):
        if restart_interval and mi and mi % restart_interval == 0:
            pred = [0] * channels
        entries: list[tuple[int, list]] = []
        for ci, zz in mcu:
            t = 0 if ci == 0 else 1
            diff = zz[0] - pred[ci]
            pred[ci] = zz[0]
            size, code = _magnitude(diff)
            dc_syms[t].append(size)
            entry = [(size, code)]
            run = 0
            for k in range(1, 64):
                if zz[k] == 0:
                    run += 1
                    continue
                while run > 15:
                    ac_syms[t].append(0xF0)
                    entry.append((0xF0, 0, 0))
                    run -= 16
                s, c = _magnitude(zz[k])
                ac_syms[t].append((run << 4) | s)
                entry.append(((run << 4) | s, s, c))
                run = 0
            if run:
                ac_syms[t].append(0x00)
                entry.append((0x00, 0, 0))
            entries.append((t, entry))
        mcu_streams.append(entries)
    tables = {}
    for t in (0, 1) if channels == 3 else (0,):
        tables[(0, t)] = _flat_huffman(dc_syms[t] or [0])
        tables[(1, t)] = _flat_huffman(ac_syms[t] or [0x00])

    # Pass 3: entropy-coded stream, RSTn every restart_interval MCUs.
    bw = _BitWriter()
    rst = 0
    for mi, entries in enumerate(mcu_streams):
        if restart_interval and mi and mi % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + rst])
            rst = (rst + 1) % 8
        for t, entry in entries:
            dc_enc = tables[(0, t)][2]
            ac_enc = tables[(1, t)][2]
            size, code = entry[0]
            hc, hl = dc_enc[size]
            bw.write(hc, hl)
            if size:
                bw.write(code, size)
            for item in entry[1:]:
                rs, s, c = item
                hc, hl = ac_enc[rs]
                bw.write(hc, hl)
                if s:
                    bw.write(c, s)
    bw.flush()

    # Assemble the JFIF byte stream.
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # qluma/qchroma are already zigzag-ordered — DQT's wire order.
    out += seg(0xDB, bytes([0x00]) + bytes(qluma))
    if channels == 3:
        out += seg(0xDB, bytes([0x01]) + bytes(qchroma))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sof = bytearray(struct.pack(">BHHB", 8, height, width, channels))
    for ci in range(channels):
        hi, vi = samp[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0 if ci == 0 else 1])
    out += seg(0xC0, bytes(sof))
    for (tc, th), (counts, vals, _enc) in sorted(tables.items()):
        out += seg(
            0xC4,
            bytes([(tc << 4) | th]) + bytes(counts) + bytes(vals),
        )
    sos = bytearray([channels])
    for ci in range(channels):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += bw.out
    out += b"\xff\xd9"
    return bytes(out)
