"""Pure-stdlib raster codecs: uncompressed 24-bit BMP and binary PPM (P6).

The container has no image libraries (PIL/ffmpeg absent), which kept the
multimodal decode path stubbed through round 6. These two formats need
nothing beyond ``struct`` + numpy — headers plus a raw raster — so the
multimodal operators (operators/multimodal.py) get a REAL decode branch
that executes end-to-end in this environment, while compressed codecs
(JPEG/PNG/video) stay gated exactly as before.

Format notes (public specs):
- BMP: BITMAPFILEHEADER (14 bytes, magic ``BM``) + BITMAPINFOHEADER
  (40 bytes), ``biBitCount=24``, ``biCompression=0`` (BI_RGB); pixel rows
  are bottom-up (top-down when ``biHeight`` is negative), BGR order,
  each row padded to a 4-byte boundary.
- PPM P6: ASCII header ``P6 <width> <height> <maxval>`` (whitespace
  separated, ``#`` comments allowed) followed by a single whitespace byte
  and ``width*height*3`` raw RGB bytes; only ``maxval=255`` is supported.
"""

from __future__ import annotations

import struct

import numpy as np

_BMP_INFO_SIZE = 40
_BMP_OFFSET = 14 + _BMP_INFO_SIZE


def sniff_raster(raw: bytes) -> str | None:
    """Cheap magic-byte sniff: 'bmp', 'ppm', or None (not a format this
    module decodes — compressed codecs route to the gated path)."""
    if len(raw) >= 2 and raw[:2] == b"BM":
        return "bmp"
    if len(raw) >= 3 and raw[:2] == b"P6" and raw[2:3].isspace():
        return "ppm"
    return None


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> binary PPM bytes."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {arr.shape}")
    h, w = arr.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + arr.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> uncompressed 24-bit BMP bytes (bottom-up,
    BGR, rows padded to 4 bytes — the canonical layout)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {arr.shape}")
    h, w = arr.shape[:2]
    row_bytes = w * 3
    pad = (-row_bytes) % 4
    image_size = (row_bytes + pad) * h
    header = struct.pack(
        "<2sIHHI", b"BM", _BMP_OFFSET + image_size, 0, 0, _BMP_OFFSET
    ) + struct.pack(
        "<IiiHHIIiiII",
        _BMP_INFO_SIZE, w, h, 1, 24, 0, image_size, 2835, 2835, 0, 0,
    )
    # bottom-up + BGR: flip rows, reverse channels, pad each row
    bgr = arr[::-1, :, ::-1]
    if pad:
        padded = np.zeros((h, row_bytes + pad), dtype=np.uint8)
        padded[:, :row_bytes] = bgr.reshape(h, row_bytes)
        body = padded.tobytes()
    else:
        body = bgr.tobytes()
    return header + body


def decode_bmp(raw: bytes) -> np.ndarray:
    """Uncompressed 24-bit BMP bytes -> (h, w, 3) uint8 RGB."""
    if len(raw) < _BMP_OFFSET or raw[:2] != b"BM":
        raise ValueError("not a BMP buffer")
    (offset,) = struct.unpack_from("<I", raw, 10)
    (info_size,) = struct.unpack_from("<I", raw, 14)
    if info_size < _BMP_INFO_SIZE:
        raise ValueError(f"unsupported BMP header size {info_size}")
    w, h_signed = struct.unpack_from("<ii", raw, 18)
    planes, bpp = struct.unpack_from("<HH", raw, 26)
    (compression,) = struct.unpack_from("<I", raw, 30)
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only 24-bit BI_RGB BMP is supported (bpp={bpp},"
            f" compression={compression})"
        )
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise ValueError(f"bad BMP dimensions {w}x{h_signed}")
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(raw) < offset + stride * h:
        raise ValueError("truncated BMP pixel data")
    rows = np.frombuffer(raw, dtype=np.uint8, count=stride * h, offset=offset)
    bgr = rows.reshape(h, stride)[:, :row_bytes].reshape(h, w, 3)
    rgb = bgr[:, :, ::-1]
    return np.ascontiguousarray(rgb if top_down else rgb[::-1])


def decode_ppm(raw: bytes) -> np.ndarray:
    """Binary PPM (P6, maxval 255) bytes -> (h, w, 3) uint8 RGB."""
    if sniff_raster(raw) != "ppm":
        raise ValueError("not a binary PPM buffer")
    # tokenize the header: P6, width, height, maxval — '#' starts a
    # comment running to end-of-line; a single whitespace byte then
    # separates the header from the raster
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(raw) and raw[pos : pos + 1].isspace():
            pos += 1
        if pos < len(raw) and raw[pos : pos + 1] == b"#":
            while pos < len(raw) and raw[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(raw) and not raw[pos : pos + 1].isspace():
            pos += 1
        if pos == start:
            raise ValueError("truncated PPM header")
        try:
            fields.append(int(raw[start:pos]))
        except ValueError as exc:
            raise ValueError("malformed PPM header") from exc
    pos += 1  # the single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"only maxval=255 PPM supported, got {maxval}")
    if w <= 0 or h <= 0:
        raise ValueError(f"bad PPM dimensions {w}x{h}")
    need = w * h * 3
    if len(raw) - pos < need:
        raise ValueError("truncated PPM pixel data")
    return (
        np.frombuffer(raw, dtype=np.uint8, count=need, offset=pos)
        .reshape(h, w, 3)
        .copy()
    )


def decode_raster(raw: bytes) -> np.ndarray:
    """Decode any supported raster buffer to (h, w, 3) uint8 RGB; raises
    ValueError for unrecognized or malformed buffers."""
    kind = sniff_raster(raw)
    if kind == "bmp":
        return decode_bmp(raw)
    if kind == "ppm":
        return decode_ppm(raw)
    raise ValueError("unrecognized raster format (supported: BMP 24-bit, PPM P6)")
