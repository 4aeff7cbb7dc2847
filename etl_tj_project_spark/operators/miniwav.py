"""Dependency-free minimal WAV (RIFF PCM) codec (stdlib struct only).

Closes the "audio codecs remain out of scope" gap the same way
:mod:`.minipng` closed it for images: the *real* audio-decode branch of
the multimodal surface runs in THIS container, with no optional
dependencies. Decode is a full RIFF read — chunk walk (unknown chunks
like ``LIST``/``fact``/``cue `` are skipped by their declared size, as
the spec requires — naive parsers that assume ``data`` follows ``fmt ``
break on files written by real DAWs), ``fmt `` validation, and PCM
sample extraction — not a header peek.

Scope (documented, raises ``ValueError`` outside it):
* format tag 1 (integer PCM) and 0xFFFE (WAVE_FORMAT_EXTENSIBLE with a
  PCM sub-format GUID);
* 8-bit unsigned and 16/24/32-bit signed little-endian samples;
* any channel count (frames are returned per-channel-interleaved, same
  layout as the byte stream, plus helpers to deinterleave);
* a truncated final frame (data size not a multiple of block align) is
  dropped, matching ffmpeg/libsndfile behavior.

All analysis helpers return INTEGER statistics (centered peak, energy =
sum of squared centered samples) so downstream cross-engine checks stay
exact — no float accumulation order to disagree about.
"""

from __future__ import annotations

import struct

_PCM_GUID_PREFIX = b"\x01\x00\x00\x00\x00\x00\x10\x00"


def _chunks(data: bytes):
    """Yield (tag, payload) for every top-level RIFF chunk."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV (bad RIFF/WAVE header)")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        (size,) = struct.unpack("<I", data[pos + 4 : pos + 8])
        payload = data[pos + 8 : pos + 8 + size]
        yield tag, payload
        # Chunks are word-aligned: an odd-sized payload carries a pad byte.
        pos += 8 + size + (size & 1)


def decode(data: bytes) -> tuple[int, int, int, list[int]]:
    """Parse WAV bytes → ``(sample_rate, n_channels, bits, samples)``.

    ``samples`` are channel-interleaved signed integers (8-bit unsigned
    storage is re-centered to signed by subtracting 128, so every depth
    yields zero-centered values).
    """
    fmt = None
    pcm = None
    for tag, payload in _chunks(data):
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError("fmt chunk too short")
            (audio_fmt, n_ch, rate, _byte_rate, block_align, bits) = struct.unpack(
                "<HHIIHH", payload[:16]
            )
            if audio_fmt == 0xFFFE:
                # WAVE_FORMAT_EXTENSIBLE: the real format is a GUID in
                # the extension block.
                if len(payload) < 40 or payload[24:32] != _PCM_GUID_PREFIX:
                    raise ValueError("extensible WAV is not integer PCM")
            elif audio_fmt != 1:
                raise ValueError(f"unsupported WAV format tag {audio_fmt}")
            if bits not in (8, 16, 24, 32):
                raise ValueError(f"unsupported bit depth {bits}")
            if n_ch < 1 or block_align != n_ch * (bits // 8):
                raise ValueError("inconsistent channel/block-align fields")
            fmt = (rate, n_ch, bits, block_align)
        elif tag == b"data":
            pcm = payload
    if fmt is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    rate, n_ch, bits, block_align = fmt
    # Drop any truncated trailing frame.
    pcm = pcm[: len(pcm) - (len(pcm) % block_align)]
    width = bits // 8
    samples: list[int] = []
    if bits == 8:
        samples = [b - 128 for b in pcm]
    elif bits == 16:
        samples = list(struct.unpack(f"<{len(pcm) // 2}h", pcm))
    else:
        half = 1 << (bits - 1)
        full = 1 << bits
        for i in range(0, len(pcm), width):
            v = int.from_bytes(pcm[i : i + width], "little")
            samples.append(v - full if v >= half else v)
    return rate, n_ch, bits, samples


def encode(sample_rate: int, n_channels: int, bits: int, samples: list[int]) -> bytes:
    """Signed zero-centered samples (channel-interleaved) → WAV bytes."""
    if bits not in (8, 16, 24, 32):
        raise ValueError(f"unsupported bit depth {bits}")
    width = bits // 8
    block_align = n_channels * width
    if bits == 8:
        pcm = bytes((s + 128) & 0xFF for s in samples)
    elif bits == 16:
        pcm = struct.pack(f"<{len(samples)}h", *samples)
    else:
        full = 1 << bits
        pcm = b"".join(
            ((s + full) if s < 0 else s).to_bytes(width, "little") for s in samples
        )
    fmt = struct.pack(
        "<HHIIHH", 1, n_channels, sample_rate, sample_rate * block_align,
        block_align, bits,
    )
    body = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm + (b"\x00" * (len(pcm) & 1))
    )
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def n_frames(samples: list[int], n_channels: int) -> int:
    return len(samples) // n_channels


def duration_ms(sample_rate: int, n_channels: int, samples: list[int]) -> int:
    """Floor-integer milliseconds — exact, no float rounding."""
    return n_frames(samples, n_channels) * 1000 // sample_rate


def peak(samples: list[int]) -> int:
    """Max absolute centered amplitude (0 for an empty stream)."""
    return max((abs(s) for s in samples), default=0)


def energy(samples: list[int]) -> int:
    """Sum of squared centered samples — the RMS numerator, kept as an
    exact integer so cross-engine comparisons never touch float order."""
    return sum(s * s for s in samples)


def channel(samples: list[int], n_channels: int, idx: int) -> list[int]:
    """Deinterleave one channel."""
    return samples[idx::n_channels]
