"""Pure-stdlib TFRecord framing: length-delimited records with masked
CRC32C checksums (the TensorFlow training-data container format).

Record layout (public spec, tensorflow/core/lib/io/record_writer.h):

    uint64 length (little-endian)
    uint32 masked_crc32c(length bytes)
    byte   data[length]
    uint32 masked_crc32c(data)

with ``masked_crc = ((crc >> 15 | crc << 17) + 0xa282ead8) & 0xffffffff``.
CRC32C (Castagnoli, reflected polynomial 0x82F63B78) is not in the Python
stdlib (zlib.crc32 is the Ethernet CRC32), so the table-driven
implementation lives here — golden-tested against the published check
value ``crc32c(b"123456789") == 0xE3069283``.

The payload is format-agnostic bytes; writers typically serialize
``tf.train.Example`` protos, but any byte string (e.g. the engine's
envelope JSON lines, packed token buffers) frames identically — TF's
``TFRecordDataset`` reads them back as raw bytes either way.
"""

from __future__ import annotations

import struct

_POLY = 0x82F63B78
_TABLE = []
for _i in range(256):
    _c = _i
    for _ in range(8):
        _c = (_c >> 1) ^ _POLY if _c & 1 else _c >> 1
    _TABLE.append(_c)


def crc32c(data: bytes, crc: int = 0) -> int:
    crc = ~crc & 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ _TABLE[(crc ^ b) & 0xFF]
    return ~crc & 0xFFFFFFFF


def _masked(crc: int) -> int:
    return (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF


def frame_record(payload: bytes) -> bytes:
    """One TFRecord frame for ``payload``."""
    header = struct.pack("<Q", len(payload))
    return (
        header
        + struct.pack("<I", _masked(crc32c(header)))
        + payload
        + struct.pack("<I", _masked(crc32c(payload)))
    )


def read_records(raw: bytes) -> list[bytes]:
    """Parse a TFRecord byte stream back into payloads, verifying BOTH
    checksums per record; raises ValueError on corruption/truncation."""
    out = []
    pos, end = 0, len(raw)
    while pos < end:
        if pos + 12 > end:
            raise ValueError("truncated record header")
        header = raw[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", raw[pos + 8 : pos + 12])
        if hcrc != _masked(crc32c(header)):
            raise ValueError(f"header crc mismatch at offset {pos}")
        pos += 12
        if pos + length + 4 > end:
            raise ValueError("truncated record payload")
        payload = raw[pos : pos + length]
        (pcrc,) = struct.unpack("<I", raw[pos + length : pos + length + 4])
        if pcrc != _masked(crc32c(payload)):
            raise ValueError(f"payload crc mismatch at offset {pos}")
        out.append(payload)
        pos += length + 4
    return out
