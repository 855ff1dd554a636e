"""Real raster decode: pure-stdlib BMP/PPM codecs (functions/raster.py)
and the non-fake branches of the multimodal operators they unlock.
Compressed codecs stay gated — those tests live in test_llm_ops.py."""

from __future__ import annotations

import numpy as np
import pytest

from franzoxide_spark.functions.raster import (
    decode_bmp,
    decode_ppm,
    decode_raster,
    encode_bmp,
    encode_ppm,
    sniff_raster,
)

# 2x2 RGB fixture with distinct channel values per pixel
FIX = np.array(
    [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
    dtype=np.uint8,
)


def test_bmp_round_trip_exact():
    assert np.array_equal(decode_bmp(encode_bmp(FIX)), FIX)


def test_ppm_round_trip_exact():
    assert np.array_equal(decode_ppm(encode_ppm(FIX)), FIX)


def test_bmp_row_padding_odd_width():
    # width 3 -> row bytes 9, padded to 12: the classic corruption site
    img = np.arange(3 * 5 * 3, dtype=np.uint8).reshape(5, 3, 3)
    raw = encode_bmp(img)
    assert np.array_equal(decode_bmp(raw), img)
    # bottom-up layout: the LAST raster row in the file is the top row
    assert len(raw) == 14 + 40 + 12 * 5


def test_bmp_golden_bytes():
    """Byte-level golden for a 1x1 red pixel — locks header fields and
    BGR order against the public BMP layout, not just self-consistency."""
    raw = encode_bmp(np.array([[[255, 0, 0]]], dtype=np.uint8))
    assert raw[:2] == b"BM"
    assert raw[10] == 54  # pixel offset
    assert raw[14] == 40  # BITMAPINFOHEADER size
    assert raw[18] == 1 and raw[22] == 1  # 1x1
    assert raw[28] == 24  # bpp
    assert raw[54:57] == b"\x00\x00\xff"  # BGR: red last
    assert len(raw) == 54 + 4  # one row padded to 4


def test_ppm_header_with_comments():
    raw = b"P6\n# a comment\n2 2\n# another\n255\n" + FIX.tobytes()
    assert np.array_equal(decode_ppm(raw), FIX)


def test_decode_rejects_malformed():
    with pytest.raises(ValueError, match="unrecognized"):
        decode_raster(b"plain text, not an image")
    with pytest.raises(ValueError, match="truncated"):
        decode_bmp(encode_bmp(FIX)[:-3])
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(encode_ppm(FIX)[:-3])
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    # 8-bit BMP (palette) is a compressed-family gate, not silent garbage
    bad = bytearray(encode_bmp(FIX))
    bad[28] = 8
    with pytest.raises(ValueError, match="24-bit"):
        decode_bmp(bytes(bad))


def test_sniff():
    assert sniff_raster(encode_bmp(FIX)) == "bmp"
    assert sniff_raster(encode_ppm(FIX)) == "ppm"
    assert sniff_raster(b"\x89PNG\r\n") is None
    assert sniff_raster(b"P6x") is None  # magic needs trailing whitespace


def _media_df(spark, images):
    rows = [
        (i, bytearray(raw), {"width": 0, "height": 0, "format": "?"})
        for i, raw in enumerate(images)
    ]
    return spark.createDataFrame(
        rows,
        "doc_id bigint, media binary,"
        " meta struct<width:int,height:int,format:string>",
    )


def test_decode_image_stats_real_branch(spark):
    from franzoxide_spark.operators.multimodal import decode_image_stats

    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    df = _media_df(spark, [encode_bmp(FIX), encode_ppm(white), b"not an image"])
    by = {r["doc_id"]: r for r in decode_image_stats(df).collect()}
    assert by[0]["ok"] and by[0]["format"] == "image/bmp"
    assert (by[0]["width"], by[0]["height"]) == (2, 2)
    assert by[0]["mean_r"] == round((255 + 0 + 0 + 10) / 4, 4)
    assert by[1]["ok"] and by[1]["format"] == "image/ppm"
    assert by[1]["brightness"] == 255.0
    assert by[2]["ok"] is False and by[2]["width"] is None


def test_extract_features_real_branch_no_fake_flag(spark):
    from franzoxide_spark.operators.multimodal import extract_features

    black = np.zeros((4, 4, 3), dtype=np.uint8)
    white = np.full((4, 4, 3), 255, dtype=np.uint8)
    df = _media_df(spark, [encode_bmp(black), encode_ppm(white)])
    # fake=False: decodable rasters must run, not raise
    feats = {r["doc_id"]: r["feat"] for r in extract_features(df, bins=4).collect()}
    assert feats[0] == [1.0, 0.0, 0.0, 0.0]  # all luma 0 -> first bin
    assert feats[1] == [0.0, 0.0, 0.0, 1.0]  # all luma 255 -> last bin


def test_extract_features_mixed_corpus_still_gates_codecs(spark):
    from franzoxide_spark.operators.multimodal import extract_features

    df = _media_df(spark, [encode_bmp(FIX), b"\x89PNG fake compressed"])
    with pytest.raises(Exception, match="NotImplementedError|compressed"):
        extract_features(df, bins=4).collect()
    # fake=True: raster rows take the real branch, the rest byte-hist
    rows = extract_features(df, bins=4, fake=True).collect()
    assert len(rows) == 2


def test_resize_media_real_branch_round_trips(spark):
    from franzoxide_spark.operators.multimodal import resize_media

    img = np.array([[[0, 0, 0], [255, 255, 255]]], dtype=np.uint8)  # 1x2
    df = _media_df(spark, [encode_bmp(img)])
    out = resize_media(df, width=4, height=2).collect()[0]
    assert out["meta"]["format"] == "image/ppm"
    resized = decode_ppm(bytes(out["media"]))
    assert resized.shape == (2, 4, 3)
    # nearest-neighbor: left half black, right half white, both rows equal
    assert np.array_equal(resized[:, :2], np.zeros((2, 2, 3), np.uint8))
    assert np.array_equal(resized[:, 2:], np.full((2, 2, 3), 255, np.uint8))


def test_synthesize_then_decode_end_to_end(spark, sf_dir):
    """The q113 path: documents -> genuine BMP -> decode, no fake flag."""
    from franzoxide_spark.operators.multimodal import (
        decode_image_stats,
        synthesize_bmp_media,
    )
    from franzoxide_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(20)
    stats = decode_image_stats(synthesize_bmp_media(docs)).collect()
    assert len(stats) == 20
    assert all(r["ok"] for r in stats)
    assert all(r["format"] == "image/bmp" for r in stats)
    # dimensions follow the deterministic doc_id derivation
    for r in stats:
        assert 4 <= r["width"] <= 12 and 4 <= r["height"] <= 10
        assert 0.0 <= r["brightness"] <= 255.0


# ---------------------------------------------------------------------------
# PNG codec (pure stdlib: zlib inflate + un-filter + chunk CRC verify)
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("ft", [0, 1, 2, 3, 4])
def test_png_round_trip_every_filter(ft):
    from franzoxide_spark.functions.raster import decode_png, encode_png

    rng = np.random.default_rng(ft)
    img = rng.integers(0, 256, (11, 7, 3), dtype=np.uint8)
    assert np.array_equal(decode_png(encode_png(img, filter_type=ft)), img)


def test_png_cross_codec_agreement():
    """The independent-construction check: the same pixels through the
    BMP encoder and the PNG encoder decode to identical arrays."""
    from franzoxide_spark.functions.raster import encode_png

    assert np.array_equal(
        decode_raster(encode_bmp(FIX)), decode_raster(encode_png(FIX))
    )


def test_png_grayscale_rgba_palette_decode():
    """Hand-built color-type-0/6/3 streams (direct chunk construction,
    not via encode_png which only emits type 2)."""
    import struct
    import zlib

    from franzoxide_spark.functions.raster import _png_chunk, decode_png

    sig = b"\x89PNG\r\n\x1a\n"

    def png(ctype_n, w, h, scan, extra=b""):
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype_n, 0, 0, 0)
        return (
            sig + _png_chunk(b"IHDR", ihdr) + extra
            + _png_chunk(b"IDAT", zlib.compress(scan))
            + _png_chunk(b"IEND", b"")
        )

    # gray 2x2: values 0,64,128,255 -> replicated across channels
    gray = png(0, 2, 2, b"\x00\x00\x40" + b"\x00\x80\xff")
    out = decode_png(gray)
    assert out.shape == (2, 2, 3)
    assert out[0, 1].tolist() == [64, 64, 64]
    assert out[1, 1].tolist() == [255, 255, 255]

    # RGBA 1x2: alpha dropped
    rgba = png(6, 2, 1, b"\x00" + bytes([10, 20, 30, 255, 40, 50, 60, 0]))
    out = decode_png(rgba)
    assert out[0, 0].tolist() == [10, 20, 30]
    assert out[0, 1].tolist() == [40, 50, 60]

    # palette 2x1: indices 1,0 into a 2-entry PLTE
    plte = _png_chunk(b"PLTE", bytes([255, 0, 0, 0, 0, 255]))
    pal = png(3, 2, 1, b"\x00\x01\x00", extra=plte)
    out = decode_png(pal)
    assert out[0, 0].tolist() == [0, 0, 255]
    assert out[0, 1].tolist() == [255, 0, 0]


def test_png_rejects_malformed():
    import struct
    import zlib

    from franzoxide_spark.functions.raster import _png_chunk, decode_png, encode_png

    good = encode_png(FIX)
    # chunk CRC tamper
    bad = bytearray(good)
    bad[len(good) - 20] ^= 0x01
    with pytest.raises(ValueError, match="crc|truncated|IEND"):
        decode_png(bytes(bad))
    # interlaced rejected
    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 1)
    inter = (
        sig + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00\x00\x00\x00"))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(inter)
    # 16-bit depth rejected with the documented gate message
    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    deep = (
        sig + _png_chunk(b"IHDR", ihdr16)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 7))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported PNG"):
        decode_png(deep)
    # wrong scanline length (valid zlib, wrong size)
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    short = (
        sig + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(b"\x00" * 5))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline"):
        decode_png(short)
    # truncated buffer (signature only)
    with pytest.raises(ValueError, match="IHDR|IEND"):
        decode_png(sig)


def test_png_sniff_and_dispatch():
    from franzoxide_spark.functions.raster import encode_png

    raw = encode_png(FIX)
    assert sniff_raster(raw) == "png"
    assert np.array_equal(decode_raster(raw), FIX)
    # a buffer with a BROKEN signature still routes to the gate path
    assert sniff_raster(b"\x89PNG fake compressed") is None


def test_synthesize_mixed_rasters_end_to_end(spark, sf_dir):
    """The q113 path: documents -> BMP/PPM/PNG/JPEG by doc_id -> decode
    (JPEG joined the rotation in r9 when functions/jpeg.py de-gated)."""
    from franzoxide_spark.operators.multimodal import (
        decode_image_stats,
        synthesize_raster_media,
    )
    from franzoxide_spark.tables import table

    docs = table(spark, sf_dir, "documents").limit(30)
    stats = decode_image_stats(synthesize_raster_media(docs)).collect()
    assert len(stats) == 30
    assert all(r["ok"] for r in stats)
    fmts = {r["format"] for r in stats}
    assert fmts == {"image/bmp", "image/ppm", "image/png", "image/jpeg"}
    # the decoded dims must agree with the doc_id derivation regardless
    # of which codec carried the pixels
    for r in stats:
        assert 4 <= r["width"] <= 12 and 4 <= r["height"] <= 10


def test_png_decompression_bomb_is_bounded():
    """A small buffer declaring tiny dims but carrying a huge zlib
    stream must fail with ValueError BEFORE allocating the inflated
    payload (bounded decompressobj, review r8)."""
    import struct
    import zlib

    from franzoxide_spark.functions.raster import _png_chunk, decode_png

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # needs 14 bytes
    bomb = zlib.compress(b"\x00" * (64 * 1024 * 1024), 9)  # 64 MiB -> ~64 KiB
    raw = (
        sig + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", bomb)
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="scanline"):
        decode_png(raw)
