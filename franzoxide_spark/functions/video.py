"""Pure-stdlib video CONTAINER metadata codec: AVI (RIFF) main header.

Completes the multimodal triple next to functions/raster.py (images) and
functions/audio.py (audio): AVI is the same RIFF chunk grammar as WAV,
so the main header ('avih' inside the 'hdrl' LIST) parses with
``struct`` alone — frame COUNT, dimensions, and frame rate are real
container metadata a curation pipeline filters on (resolution gates,
duration caps, fps sanity) without ever touching a codec. Actual frame
DECODE needs video codecs not present in this container and stays gated
exactly like JPEG/PNG/MP3.

Format notes (public spec, Microsoft AVI RIFF 1992): ``RIFF <size>
'AVI '`` containing a ``LIST <size> 'hdrl'`` whose first subchunk is
``avih`` (56 bytes): dwMicroSecPerFrame, dwMaxBytesPerSec,
dwPaddingGranularity, dwFlags, dwTotalFrames, dwInitialFrames,
dwStreams, dwSuggestedBufferSize, dwWidth, dwHeight, dwReserved[4].
"""

from __future__ import annotations

import struct


def sniff_video(raw: bytes) -> str | None:
    """'avi' for RIFF/AVI buffers, else None."""
    if len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"AVI ":
        return "avi"
    return None


def encode_avi_header(
    n_frames: int, width: int, height: int, fps: int
) -> bytes:
    """A minimal structurally-valid AVI: RIFF('AVI ', LIST('hdrl', avih),
    LIST('movi')) with an empty movie body — everything a metadata probe
    reads is real."""
    usec = 1_000_000 // fps
    avih = struct.pack(
        "<14I", usec, 0, 0, 0, n_frames, 0, 1, 0, width, height, 0, 0, 0, 0
    )
    hdrl = b"LIST" + struct.pack("<I", 4 + 8 + len(avih)) + b"hdrl"
    hdrl += b"avih" + struct.pack("<I", len(avih)) + avih
    movi = b"LIST" + struct.pack("<I", 4) + b"movi"
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def parse_avi_header(raw: bytes) -> dict:
    """AVI bytes -> {n_frames, width, height, fps, duration_s}; raises
    ValueError on anything that is not a well-formed AVI main header."""
    if sniff_video(raw) != "avi":
        raise ValueError("not a RIFF/AVI buffer")
    pos, end = 12, len(raw)
    while pos + 8 <= end:
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        if cid == b"LIST" and raw[pos + 8 : pos + 12] == b"hdrl":
            sub = pos + 12
            if sub + 8 > end:
                raise ValueError("truncated hdrl list")
            if raw[sub : sub + 4] != b"avih":
                raise ValueError("hdrl does not start with avih")
            (asize,) = struct.unpack("<I", raw[sub + 4 : sub + 8])
            if asize < 56 or sub + 8 + 56 > end:
                raise ValueError("avih chunk too short")
            f = struct.unpack("<14I", raw[sub + 8 : sub + 8 + 56])
            usec, n_frames, width, height = f[0], f[4], f[8], f[9]
            if usec == 0:
                raise ValueError("zero frame interval")
            fps = round(1_000_000 / usec, 6)
            return {
                "n_frames": n_frames,
                "width": width,
                "height": height,
                "fps": fps,
                "duration_s": round(n_frames / fps, 6),
            }
        pos += 8 + size + (size & 1)
    raise ValueError("missing hdrl/avih header")
