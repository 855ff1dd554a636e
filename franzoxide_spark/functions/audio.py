"""Pure-stdlib audio codec: uncompressed 16-bit PCM WAV (RIFF/WAVE).

The audio twin of functions/raster.py: the container has no audio
libraries, but canonical PCM WAV is just a RIFF header plus raw little-
endian int16 samples — ``struct`` + numpy decode it for real, giving the
multimodal operators (operators/multimodal.py) an executable audio branch
while compressed codecs (MP3/AAC/Opus) stay gated exactly like JPEG/PNG.

Format notes (public spec, Microsoft/IBM RIFF 1991): ``RIFF <size> WAVE``
followed by chunks; the ``fmt `` chunk (PCM: 16 bytes — format tag 1,
channels, sample rate, byte rate, block align, bits per sample) must
precede the ``data`` chunk holding the interleaved samples. Only
format-tag 1 (integer PCM) at 16 bits is supported here; other tags and
depths raise ValueError (the gated-codec path).
"""

from __future__ import annotations

import struct

import numpy as np


def sniff_audio(raw: bytes) -> str | None:
    """'wav' for RIFF/WAVE buffers, else None."""
    if len(raw) >= 12 and raw[:4] == b"RIFF" and raw[8:12] == b"WAVE":
        return "wav"
    return None


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 samples -> canonical PCM WAV bytes. ``samples`` is either
    (n,) mono or (n, channels) interleaved-on-write."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2:
        raise ValueError(f"expected (n,) or (n, channels), got {arr.shape}")
    n, channels = arr.shape
    data = np.ascontiguousarray(arr).tobytes()
    block_align = channels * 2
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block_align,
        block_align, 16,
    )
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(raw: bytes) -> tuple[int, np.ndarray]:
    """PCM WAV bytes -> (sample_rate, (n, channels) int16 array).

    Walks the RIFF chunk list (tolerating extra chunks like LIST/fact);
    raises ValueError on anything that is not integer 16-bit PCM or on a
    malformed/truncated buffer."""
    if sniff_audio(raw) != "wav":
        raise ValueError("not a RIFF/WAVE buffer")
    pos, end = 12, len(raw)
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = raw[pos : pos + 4]
        (size,) = struct.unpack("<I", raw[pos + 4 : pos + 8])
        chunk = raw[pos + 8 : pos + 8 + size]
        if len(chunk) < size:
            raise ValueError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", chunk[:16])
        elif cid == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byte_rate, _block, bits = fmt
    if tag != 1 or bits != 16:
        raise ValueError(f"unsupported WAV encoding (tag={tag}, bits={bits})")
    if channels < 1:
        raise ValueError("zero channels")
    n = len(data) // (2 * channels)
    arr = np.frombuffer(data[: n * 2 * channels], dtype="<i2").reshape(
        n, channels
    )
    return rate, arr
