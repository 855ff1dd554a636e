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


# ---------------------------------------------------------------------------
# numpy-vectorized batch CRC (r17): the scalar crc32c above dispatches the
# Python interpreter once PER BYTE, which made the CRC the dominant cost of
# the TFRecord export/verify round-trip (q160: ~2x the framing I/O). CRC is
# sequential WITHIN a record, but records are independent — so the batch
# kernel advances all records one byte-position per step: sort records by
# length (desc), pad into a uint8 matrix, and run the identical
# table-driven recurrence on a shrinking row prefix with numpy. Python-level
# work drops from O(total_bytes) to O(max_record_len) iterations of
# whole-batch numpy ops. Bit-identical to crc32c() by construction (same
# table, same recurrence — pinned by tests/test_tfrecord.py).
# ---------------------------------------------------------------------------

_CHUNK_CELLS = 64 << 20  # cap the padded matrix at 64 MB per chunk


def crc32c_batch(payloads: list[bytes]) -> "object":
    """CRC32C of each payload, as a numpy uint32 array (batch-vectorized,
    bit-identical to :func:`crc32c` per element)."""
    import numpy as np

    n = len(payloads)
    table = np.asarray(_TABLE, dtype=np.uint32)
    out = np.empty(n, dtype=np.uint32)
    if n == 0:
        return out
    lens = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    order = np.argsort(-lens, kind="stable")
    sorted_lens = lens[order]
    # chunk the sorted run so rows x padded-width stays bounded: records
    # sorted by length make each chunk's padding waste small, and a batch
    # with one huge outlier cannot force a giant matrix for everyone
    start = 0
    while start < n:
        width = max(int(sorted_lens[start]), 1)
        rows = max(int(_CHUNK_CELLS // width), 1)
        stop = min(start + rows, n)
        idx = order[start:stop]
        w = int(sorted_lens[start])
        m = stop - start
        mat = np.zeros((m, w), dtype=np.uint8)
        for i, oi in enumerate(idx):
            p = payloads[oi]
            if p:
                mat[i, : len(p)] = np.frombuffer(p, dtype=np.uint8)
        crc = np.full(m, 0xFFFFFFFF, dtype=np.uint32)
        chunk_lens = sorted_lens[start:stop]
        # rows are length-desc, so the active set per byte-position is a
        # prefix; k[j] = rows still inside their record at position j
        ks = np.searchsorted(-chunk_lens, -(np.arange(w, dtype=np.int64) + 1),
                             side="right")
        for j in range(w):
            k = int(ks[j])
            if k == 0:
                break
            c = crc[:k]
            crc[:k] = (c >> np.uint32(8)) ^ table[(c ^ mat[:k, j]) & np.uint32(0xFF)]
        out[idx] = ~crc & np.uint32(0xFFFFFFFF)
        start = stop
    return out


def _masked_np(crc: "object") -> "object":
    import numpy as np

    c = crc.astype(np.uint32)
    return (((c >> np.uint32(15)) | (c << np.uint32(17)))
            + np.uint32(0xA282EAD8))  # uint32 arithmetic wraps, as the spec


def frame_records_batch(payloads: list[bytes]) -> bytes:
    """Concatenated TFRecord frames for ``payloads`` — the batch
    equivalent of ``b''.join(frame_record(p) for p in payloads)``,
    byte-identical, with both CRC passes vectorized."""
    import numpy as np

    n = len(payloads)
    if n == 0:
        return b""
    lens = np.fromiter((len(p) for p in payloads), dtype="<u8", count=n)
    hbytes = lens.tobytes()  # little-endian uint64 headers, 8 bytes each
    headers = [hbytes[i * 8:(i + 1) * 8] for i in range(n)]
    hcrc = _masked_np(crc32c_batch(headers)).astype("<u4").tobytes()
    pcrc = _masked_np(crc32c_batch(payloads)).astype("<u4").tobytes()
    parts = []
    for i, p in enumerate(payloads):
        parts.append(headers[i])
        parts.append(hcrc[i * 4:(i + 1) * 4])
        parts.append(p)
        parts.append(pcrc[i * 4:(i + 1) * 4])
    return b"".join(parts)


def read_records_batch(raw: bytes) -> list[bytes]:
    """Parse + verify a TFRecord stream — same result/errors as
    :func:`read_records`, with both checksum passes batch-vectorized
    (the sequential part is only the frame walk, O(records))."""
    import numpy as np

    headers: list[bytes] = []
    payloads: list[bytes] = []
    stored_h: list[int] = []
    stored_p: list[int] = []
    offsets: list[int] = []
    pos, end = 0, len(raw)
    while pos < end:
        if pos + 12 > end:
            raise ValueError("truncated record header")
        header = raw[pos : pos + 8]
        (length,) = struct.unpack("<Q", header)
        (hcrc,) = struct.unpack("<I", raw[pos + 8 : pos + 12])
        if pos + 12 + length + 4 > end:
            # verify the header BEFORE trusting its length field, exactly
            # like the scalar path: a corrupted length must surface as a
            # crc mismatch when the header bytes are bad
            if hcrc != _masked(crc32c(header)):
                raise ValueError(f"header crc mismatch at offset {pos}")
            raise ValueError("truncated record payload")
        offsets.append(pos)
        headers.append(header)
        stored_h.append(hcrc)
        payloads.append(raw[pos + 12 : pos + 12 + length])
        (pcrc,) = struct.unpack(
            "<I", raw[pos + 12 + length : pos + 12 + length + 4]
        )
        stored_p.append(pcrc)
        pos += 12 + length + 4
    if not headers:
        return []
    hc = _masked_np(crc32c_batch(headers))
    bad = np.nonzero(hc != np.asarray(stored_h, dtype=np.uint32))[0]
    if bad.size:
        raise ValueError(f"header crc mismatch at offset {offsets[int(bad[0])]}")
    pc = _masked_np(crc32c_batch(payloads))
    bad = np.nonzero(pc != np.asarray(stored_p, dtype=np.uint32))[0]
    if bad.size:
        raise ValueError(
            f"payload crc mismatch at offset {offsets[int(bad[0])]}"
        )
    return payloads


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
