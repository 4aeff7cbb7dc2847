"""Stdlib WAV codec (operators/miniwav.py) + the real audio decode path.

The audio twin of test_multimodal_real.py: media bytes are REAL RIFF/PCM
files built and parsed with zero optional dependencies, so the real
decode branch executes in this container. Property tests pin the
encode→decode round trip across every supported depth/channel layout;
the Spark test runs the full Arrow-batched synthesize→decode pipeline
and checks the integer stats against an independently computed answer.
"""

from __future__ import annotations

import struct

from hypothesis import given, settings
from hypothesis import strategies as st

import pytest

from etl_tj_project_spark.operators import miniwav, multimodal as mm


@settings(max_examples=40, deadline=None)
@given(
    bits=st.sampled_from([8, 16, 24, 32]),
    n_ch=st.integers(1, 3),
    rate=st.sampled_from([8000, 16000, 44100]),
    data=st.data(),
)
def test_roundtrip_any_depth_channels(bits, n_ch, rate, data):
    lim = 127 if bits == 8 else (1 << (bits - 1)) - 1
    n_frames = data.draw(st.integers(0, 50))
    samples = data.draw(
        st.lists(
            st.integers(-lim, lim),
            min_size=n_frames * n_ch,
            max_size=n_frames * n_ch,
        )
    )
    blob = miniwav.encode(rate, n_ch, bits, samples)
    r, c, b, out = miniwav.decode(blob)
    assert (r, c, b) == (rate, n_ch, bits)
    assert out == samples
    assert miniwav.n_frames(out, c) == n_frames
    assert miniwav.duration_ms(r, c, out) == n_frames * 1000 // rate


def test_unknown_chunks_are_skipped_by_declared_size():
    blob = miniwav.encode(8000, 1, 8, [1, 2, 3])
    fmt_end = 12 + 8 + 16
    # LIST chunk with an odd payload (forces the word-align pad) spliced
    # between fmt and data — real DAWs write these.
    listc = b"LIST" + struct.pack("<I", 5) + b"INFOx" + b"\x00"
    spliced = blob[:fmt_end] + listc + blob[fmt_end:]
    assert miniwav.decode(spliced) == (8000, 1, 8, [1, 2, 3])


def test_truncated_final_frame_is_dropped():
    # Stereo 16-bit: block align 4. Hand-build a data chunk one byte
    # short of two full frames; the partial frame must be dropped.
    good = miniwav.encode(8000, 2, 16, [10, -10, 20, -20])
    body = bytearray(good)
    # shrink declared data size by 1 (data is the last chunk here):
    # 2 stereo frames * 4-byte block align = 8 payload bytes
    data_size_pos = len(good) - 8 - 4
    (declared,) = struct.unpack("<I", good[data_size_pos : data_size_pos + 4])
    assert declared == 8
    body[data_size_pos : data_size_pos + 4] = struct.pack("<I", 7)
    r, c, b, out = miniwav.decode(bytes(body))
    # 7 bytes floor to one whole 4-byte frame; the partial frame is gone
    assert out == [10, -10]
    assert miniwav.n_frames(out, c) == 1


@pytest.mark.parametrize(
    "mutate, msg",
    [
        (lambda b: b"JUNK" + b[4:], "RIFF"),
        (lambda b: b[:8] + b"XXXX" + b[12:], "RIFF"),
        (lambda b: b.replace(b"fmt ", b"fmx ", 1), "missing fmt"),
        (lambda b: b.replace(b"data", b"datx", 1), "missing fmt or data"),
    ],
)
def test_malformed_headers_raise(mutate, msg):
    blob = miniwav.encode(8000, 1, 8, [0])
    with pytest.raises(ValueError):
        miniwav.decode(mutate(blob))


def test_unsupported_format_tag_raises():
    blob = bytearray(miniwav.encode(8000, 1, 16, [0]))
    blob[20:22] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError, match="format tag"):
        miniwav.decode(bytes(blob))


def test_integer_stats_are_exact():
    s = [-128, 127, 0, 64]
    assert miniwav.peak(s) == 128
    assert miniwav.energy(s) == 128 * 128 + 127 * 127 + 64 * 64
    assert miniwav.channel([1, 9, 2, 8, 3, 7], 2, 1) == [9, 8, 7]


def test_audio_features_end_to_end(spark):
    docs = spark.createDataFrame(
        [(7,), (160,)], "doc_id long"
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in mm.audio_features(mm.attach_fake_audio(docs)).collect()
    }
    for doc_id in (7, 160):
        samples = mm.synth_audio_samples(doc_id)
        row = out[doc_id]
        assert row["sample_rate"] == 8000
        assert row["n_channels"] == 1
        assert row["bits"] == 8
        assert row["n_frames"] == len(samples)
        assert row["duration_ms"] == len(samples) * 1000 // 8000
        assert row["peak"] == max(abs(s) for s in samples)
        assert row["energy"] == sum(s * s for s in samples)


def test_audio_downsample_end_to_end(spark):
    docs = spark.createDataFrame([(7,)], "doc_id long")
    out = mm.audio_downsample_features(
        mm.attach_fake_audio(docs), factor=2
    ).collect()[0]
    samples = mm.synth_audio_samples(7)
    unsigned = [s + 128 for s in samples]
    dec = [
        (unsigned[2 * k] + unsigned[2 * k + 1]) // 2 - 128
        for k in range(len(unsigned) // 2)
    ]
    assert out["sample_rate"] == 4000
    assert out["n_frames"] == len(dec)
    assert out["peak"] == max(abs(s) for s in dec)
    assert out["energy"] == sum(s * s for s in dec)


def test_downsample_averages_in_unsigned_domain():
    # Signed-domain floor averaging of (-1, -2) gives -2 (floor of -1.5);
    # the unsigned-domain rule gives (127 + 126)//2 - 128 = -2 as well,
    # but for (-1, 0): signed floor -> -1, unsigned (127+128)//2-128 = -1.
    # The divergent case is any pair whose unsigned sum is odd AND whose
    # signed sum is negative-odd: (-3, 0): signed floor(-1.5) = -2,
    # unsigned (125+128)//2-128 = 126-128 = -2. Python floor matches
    # unsigned because +128 shifts are exact; the rule matters for SQL
    # engines whose integer '/' truncates toward zero (would give -1).
    unsigned = [125, 128]
    assert sum(unsigned) // 2 - 128 == -2
