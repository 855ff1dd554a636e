"""WAV codec (functions/audio.py) + audio decode operators: goldens
against hand-packed RIFF bytes, encode/decode round-trip, malformed-buffer
flagging, and the q142 end-to-end aggregate."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from franzoxide_spark.functions.audio import decode_wav, encode_wav, sniff_audio


def _hand_wav(samples: list[int], rate: int = 8000, channels: int = 1) -> bytes:
    """Independently hand-packed canonical WAV (not via encode_wav)."""
    data = b"".join(struct.pack("<h", s) for s in samples)
    fmt = struct.pack("<HHIIHH", 1, channels, rate, rate * channels * 2,
                      channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", 16) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_decode_hand_packed_golden():
    raw = _hand_wav([0, 1000, -1000, 32767, -32768], rate=16000)
    rate, arr = decode_wav(raw)
    assert rate == 16000 and arr.shape == (5, 1)
    assert arr[:, 0].tolist() == [0, 1000, -1000, 32767, -32768]


def test_round_trip_mono_and_stereo():
    rng = np.random.default_rng(7)
    for ch in (1, 2):
        samples = rng.integers(-32768, 32767, size=(50, ch), dtype=np.int16)
        rate, back = decode_wav(encode_wav(samples, 44100))
        assert rate == 44100
        np.testing.assert_array_equal(back, samples)


def test_extra_chunks_are_tolerated():
    raw = _hand_wav([5, -5])
    # splice a LIST chunk between fmt and data
    head, data_at = raw[:36], raw.find(b"data")
    spliced = head + b"LIST" + struct.pack("<I", 4) + b"INFO" + raw[data_at:]
    rate, arr = decode_wav(spliced)
    assert arr[:, 0].tolist() == [5, -5]


@pytest.mark.parametrize(
    "raw",
    [
        b"",
        b"RIFF\x00\x00\x00\x00WAVE",               # no chunks at all
        _hand_wav([1, 2])[:-1],                      # truncated data
        b"ID3\x03" + b"\x00" * 40,                  # mp3-ish: not RIFF
    ],
)
def test_malformed_buffers_raise(raw):
    with pytest.raises(ValueError):
        decode_wav(raw)


def test_unsupported_tag_is_gated():
    raw = bytearray(_hand_wav([1]))
    raw[20:22] = struct.pack("<H", 3)  # IEEE float tag
    with pytest.raises(ValueError, match="unsupported WAV encoding"):
        decode_wav(bytes(raw))


def test_sniff():
    assert sniff_audio(_hand_wav([0])) == "wav"
    assert sniff_audio(b"BM123456") is None


def test_decode_audio_stats_flags_bad_rows(spark):
    from franzoxide_spark.operators.multimodal import decode_audio_stats

    good = _hand_wav([0, 16384, -16384, 16384], rate=8000)
    rows = [(1, bytearray(good)), (2, bytearray(b"not audio at all"))]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r.asDict() for r in decode_audio_stats(df).collect()}
    assert got[1]["ok"] and got[1]["format"] == "audio/wav"
    assert got[1]["n_samples"] == 4 and got[1]["duration_s"] == 0.0005
    assert got[1]["peak"] == 0.5
    assert got[2]["ok"] is False and got[2]["format"] is None


def test_q142_runs_all_ok(spark, sf_dir):
    from franzoxide_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["q142_audio_decode_stats"](spark, sf_dir).collect()
    assert len(rows) > 0 and all(r["ok"] for r in rows)
    assert {r["channels"] for r in rows} == {1, 2}
