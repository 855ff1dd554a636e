"""AVI container codec (functions/video.py) + video metadata probe:
hand-packed goldens, round-trip, malformed flagging, q161 end-to-end."""

from __future__ import annotations

import struct

import pytest

from franzoxide_spark.functions.video import (
    encode_avi_header,
    parse_avi_header,
    sniff_video,
)


def test_round_trip_golden():
    raw = encode_avi_header(240, 1920, 1080, 24)
    m = parse_avi_header(raw)
    assert m == {
        "n_frames": 240, "width": 1920, "height": 1080,
        "fps": round(1_000_000 / (1_000_000 // 24), 6),
        "duration_s": round(240 / round(1_000_000 / (1_000_000 // 24), 6), 6),
    }
    assert sniff_video(raw) == "avi"


def test_hand_packed_header_parses():
    # independently packed: 30fps (33333 us/frame), 90 frames, 640x480
    avih = struct.pack("<14I", 33333, 0, 0, 0, 90, 0, 1, 0, 640, 480,
                       0, 0, 0, 0)
    hdrl = b"LIST" + struct.pack("<I", 12 + len(avih)) + b"hdrl"
    hdrl += b"avih" + struct.pack("<I", len(avih)) + avih
    body = b"AVI " + hdrl
    raw = b"RIFF" + struct.pack("<I", len(body)) + body
    m = parse_avi_header(raw)
    assert (m["n_frames"], m["width"], m["height"]) == (90, 640, 480)
    assert m["fps"] == pytest.approx(1_000_000 / 33333, abs=1e-4)


@pytest.mark.parametrize(
    "raw",
    [
        b"",
        b"RIFF\x00\x00\x00\x00WAVE",              # audio, not video
        b"RIFF\x10\x00\x00\x00AVI " + b"\x00" * 8,  # no hdrl
        encode_avi_header(10, 64, 48, 24)[:30],     # truncated
    ],
)
def test_malformed_raises(raw):
    with pytest.raises(ValueError):
        parse_avi_header(raw)


def test_probe_flags_bad_rows(spark):
    from franzoxide_spark.operators.multimodal import probe_video_meta

    rows = [
        (1, bytearray(encode_avi_header(48, 320, 240, 24))),
        (2, bytearray(b"certainly not a video")),
    ]
    df = spark.createDataFrame(rows, "doc_id long, media binary")
    got = {r["doc_id"]: r.asDict() for r in probe_video_meta(df).collect()}
    assert got[1]["ok"] and got[1]["format"] == "video/avi"
    assert got[1]["n_frames"] == 48 and got[1]["width"] == 320
    assert got[2]["ok"] is False and got[2]["format"] is None


def test_q161_runs_all_ok(spark, sf_dir):
    from franzoxide_spark.queries import QUERIES, load_all

    load_all()
    rows = QUERIES["q161_video_meta_probe"](spark, sf_dir).collect()
    assert len(rows) > 0 and all(r["ok"] for r in rows)
    assert {(r["width"], r["height"]) for r in rows} <= {
        (320, 240), (640, 480), (1280, 720)
    }
