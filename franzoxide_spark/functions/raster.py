"""Pure-stdlib raster codecs: uncompressed 24-bit BMP, binary PPM (P6),
PNG (zlib is in the stdlib), and baseline JPEG (functions/jpeg.py —
dispatched from here so every consumer goes through one decode_raster).

The container has no image libraries (PIL/ffmpeg absent), which kept the
multimodal decode path stubbed through round 6. These formats need
nothing beyond ``struct`` + ``zlib`` + numpy, so the multimodal
operators (operators/multimodal.py) get REAL decode branches that
execute end-to-end in this environment, while JPEG and video codecs
stay gated exactly as before.

Format notes (public specs):
- BMP: BITMAPFILEHEADER (14 bytes, magic ``BM``) + BITMAPINFOHEADER
  (40 bytes), ``biBitCount=24``, ``biCompression=0`` (BI_RGB); pixel rows
  are bottom-up (top-down when ``biHeight`` is negative), BGR order,
  each row padded to a 4-byte boundary.
- PPM P6: ASCII header ``P6 <width> <height> <maxval>`` (whitespace
  separated, ``#`` comments allowed) followed by a single whitespace byte
  and ``width*height*3`` raw RGB bytes; only ``maxval=255`` is supported.
- PNG (RFC 2083 / W3C spec): 8-byte signature, then chunks
  ``len(4) type(4) data(len) crc32(4)``; IHDR carries dims/depth/color
  type; IDAT chunks concatenate into one zlib stream of filtered
  scanlines (per-row filter byte 0-4: None/Sub/Up/Average/Paeth);
  IEND terminates. Supported here: bit depth 8, color types 0 (gray),
  2 (RGB), 3 (palette + PLTE), 6 (RGBA; alpha dropped on decode to the
  module-wide (h, w, 3) contract), non-interlaced only. Chunk CRCs are
  VERIFIED on decode — a corrupt IDAT is a ValueError, not garbage
  pixels.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_BMP_INFO_SIZE = 40
_BMP_OFFSET = 14 + _BMP_INFO_SIZE


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_raster(raw: bytes) -> str | None:
    """Cheap magic-byte sniff: 'bmp', 'ppm', 'png', 'jpeg', or None (not
    a format this module decodes — unsupported codecs route to the gated
    path)."""
    if len(raw) >= 2 and raw[:2] == b"BM":
        return "bmp"
    if len(raw) >= 3 and raw[:2] == b"P6" and raw[2:3].isspace():
        return "ppm"
    if len(raw) >= 8 and raw[:8] == _PNG_SIG:
        return "png"
    if len(raw) >= 3 and raw[:3] == b"\xff\xd8\xff":
        return "jpeg"
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


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_BPP = {0: 1, 2: 3, 3: 1, 6: 4}  # bytes/pixel at depth 8, by color type


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray, filter_type: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (color type 2, depth 8,
    non-interlaced). ``filter_type`` applies ONE filter (0-4) to every
    scanline — 0 (None) is the fast default; the others exist so decode
    tests exercise each un-filter path against an independent forward
    construction."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected (h, w, 3) array, got {arr.shape}")
    if filter_type not in range(5):
        raise ValueError(f"bad PNG filter type {filter_type}")
    h, w = arr.shape[:2]
    img = arr.astype(np.int32)
    raw = bytearray()
    prev = np.zeros((w, 3), dtype=np.int32)
    for y in range(h):
        row = img[y]
        left = np.vstack([np.zeros((1, 3), np.int32), row[:-1]])
        if filter_type == 0:
            filt = row
        elif filter_type == 1:  # Sub
            filt = row - left
        elif filter_type == 2:  # Up
            filt = row - prev
        elif filter_type == 3:  # Average
            filt = row - (left + prev) // 2
        else:  # Paeth
            ul = np.vstack([np.zeros((1, 3), np.int32), prev[:-1]])
            filt = row - _paeth(left, prev, ul)
        raw.append(filter_type)
        raw += (filt % 256).astype(np.uint8).tobytes()
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized (a=left, b=up, c=upper-left)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))


def decode_png(raw: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB. Supports depth 8, color types
    0/2/3/6, non-interlaced; chunk CRCs verified; RGBA alpha dropped."""
    if len(raw) < 8 or raw[:8] != _PNG_SIG:
        raise ValueError("not a PNG buffer")
    pos, ihdr, plte, idat, ended = 8, None, None, bytearray(), False
    while pos + 8 <= len(raw):
        (length,) = struct.unpack_from(">I", raw, pos)
        ctype = raw[pos + 4 : pos + 8]
        data = raw[pos + 8 : pos + 8 + length]
        if len(data) < length or pos + 12 + length > len(raw):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", raw, pos + 8 + length)
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk crc mismatch in {ctype!r}")
        if ctype == b"IHDR":
            ihdr = data
        elif ctype == b"PLTE":
            plte = data
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            ended = True
            break
        pos += 12 + length
    if ihdr is None or not ended:
        raise ValueError("PNG missing IHDR or IEND")
    w, h, depth, ctype_n, comp, filt_m, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8 or ctype_n not in _PNG_BPP:
        raise ValueError(
            f"unsupported PNG (depth={depth}, color_type={ctype_n});"
            " supported: depth 8, color types 0/2/3/6"
        )
    if comp != 0 or filt_m != 0:
        raise ValueError("unsupported PNG compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced (Adam7) PNG not supported")
    if w <= 0 or h <= 0 or w * h > 100_000_000:
        raise ValueError(f"bad PNG dimensions {w}x{h}")
    bpp = _PNG_BPP[ctype_n]
    stride = w * bpp
    need = (stride + 1) * h
    # bounded inflate: a tiny buffer can declare small dims but carry a
    # multi-GB zlib stream — cap the output at the scanline size the
    # header promises instead of letting zlib.decompress allocate it all
    # (review r8 finding)
    d = zlib.decompressobj()
    try:
        scan = d.decompress(bytes(idat), need)
        extra = d.decompress(b"", 1)
    except zlib.error as exc:
        raise ValueError("corrupt PNG IDAT stream") from exc
    if len(scan) != need or extra or d.unconsumed_tail:
        raise ValueError("PNG scanline data has wrong length")
    flat = np.frombuffer(scan, dtype=np.uint8).reshape(h, stride + 1)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ft = int(flat[y, 0])
        line = flat[y, 1:].astype(np.int32)
        if ft == 0:
            rec = line
        elif ft == 2:  # Up
            rec = (line + prev) % 256
        elif ft in (1, 3, 4):
            # Sub/Average/Paeth depend on the just-reconstructed left
            # pixel -> sequential in x, vectorized across the bpp lanes
            rec = np.zeros(stride, dtype=np.int32)
            px = line.reshape(w, bpp)
            rp = rec.reshape(w, bpp)
            pv = prev.reshape(w, bpp)
            left = np.zeros(bpp, dtype=np.int32)
            ul = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                if ft == 1:
                    pred = left
                elif ft == 3:
                    pred = (left + pv[x]) // 2
                else:
                    pred = _paeth(left, pv[x], ul)
                rp[x] = (px[x] + pred) % 256
                left = rp[x]
                ul = pv[x]
        else:
            raise ValueError(f"bad PNG filter byte {ft}")
        out[y] = rec
        prev = rec
    pix = out.astype(np.uint8).reshape(h, w, bpp)
    if ctype_n == 2:
        return np.ascontiguousarray(pix)
    if ctype_n == 6:
        return np.ascontiguousarray(pix[:, :, :3])
    if ctype_n == 0:
        return np.ascontiguousarray(np.repeat(pix, 3, axis=2))
    # palette
    if plte is None or len(plte) % 3:
        raise ValueError("palette PNG missing/malformed PLTE")
    pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
    idx = pix[:, :, 0]
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("PNG palette index out of range")
    return np.ascontiguousarray(pal[idx])


def decode_raster(raw: bytes) -> np.ndarray:
    """Decode any supported raster buffer to (h, w, 3) uint8 RGB; raises
    ValueError for unrecognized or malformed buffers."""
    kind = sniff_raster(raw)
    if kind == "bmp":
        return decode_bmp(raw)
    if kind == "ppm":
        return decode_ppm(raw)
    if kind == "png":
        return decode_png(raw)
    if kind == "jpeg":
        from franzoxide_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(raw)
    raise ValueError(
        "unrecognized raster format (supported: BMP 24-bit, PPM P6, PNG,"
        " baseline JPEG)"
    )
