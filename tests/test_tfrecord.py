"""TFRecord framing (functions/tfrecord.py) + distributed shard export
(operators/export.py): CRC32C golden vectors, frame round-trip,
corruption detection, and the write -> read-back equality proof."""

from __future__ import annotations

import struct

import pytest

from franzoxide_spark.functions.tfrecord import (
    crc32c,
    frame_record,
    read_records,
)


def test_crc32c_golden_vectors():
    # published check value for the Castagnoli polynomial
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # RFC 3720 B.4 test vector


def test_frame_and_read_round_trip():
    payloads = [b"", b"x", b"hello world", bytes(range(256)) * 3]
    stream = b"".join(frame_record(p) for p in payloads)
    assert read_records(stream) == payloads


def test_corruption_is_detected():
    stream = bytearray(frame_record(b"important bytes"))
    stream[14] ^= 0xFF  # flip a payload byte
    with pytest.raises(ValueError, match="crc mismatch"):
        read_records(bytes(stream))
    with pytest.raises(ValueError, match="truncated"):
        read_records(bytes(frame_record(b"abc")[:-2]))


def test_header_crc_detects_length_tamper():
    raw = bytearray(frame_record(b"abcd"))
    raw[0] ^= 0x01  # tamper the length field
    with pytest.raises(ValueError, match="header crc"):
        read_records(bytes(raw))


def test_distributed_export_round_trips(spark, tmp_path):
    from pyspark.sql import functions as F

    from franzoxide_spark.operators.export import (
        export_tfrecord_shards,
        read_tfrecord_shards,
    )

    out = str(tmp_path / "tfr")
    df = spark.range(500).select(
        F.encode(F.concat(F.lit("doc-"), F.col("id")), "UTF-8").alias("payload")
    )
    manifest = export_tfrecord_shards(
        df, "payload", out, n_shards=7
    ).collect()
    assert sum(m["n_records"] for m in manifest) == 500
    assert 1 <= len(manifest) <= 7
    back = read_tfrecord_shards(spark, out)
    got = sorted(bytes(r["payload"]).decode() for r in back.collect())
    assert got == sorted(f"doc-{i}" for i in range(500))
    # shard count on disk matches the manifest exactly
    import os

    assert sorted(os.listdir(out)) == sorted(m["shard"] for m in manifest)


def test_batch_crc_and_framing_match_scalar():
    """r17 optimization guard: the numpy-vectorized batch kernels are
    bit-identical to the scalar reference on varied lengths (empty, 1B,
    unaligned, multi-KB) — the property the q160 export now rests on."""
    import random

    import numpy as np

    from franzoxide_spark.functions.tfrecord import (
        crc32c,
        crc32c_batch,
        frame_record,
        frame_records_batch,
        read_records,
        read_records_batch,
    )

    rng = random.Random(17)
    payloads = [b"", b"x", b"123456789"] + [
        bytes(rng.randrange(256) for _ in range(rng.choice([2, 7, 63, 64, 65, 1000, 4096])))
        for _ in range(50)
    ]
    batch = crc32c_batch(payloads)
    assert list(map(int, batch)) == [crc32c(p) for p in payloads]
    framed = frame_records_batch(payloads)
    assert framed == b"".join(frame_record(p) for p in payloads)
    assert read_records_batch(framed) == payloads
    assert read_records(framed) == payloads


def test_batch_read_detects_corruption():
    import pytest

    from franzoxide_spark.functions.tfrecord import (
        frame_records_batch,
        read_records_batch,
    )

    framed = bytearray(frame_records_batch([b"hello", b"world"]))
    framed[14] ^= 0xFF  # payload byte of record 0
    with pytest.raises(ValueError, match="payload crc mismatch"):
        read_records_batch(bytes(framed))
    with pytest.raises(ValueError, match="truncated"):
        read_records_batch(bytes(frame_records_batch([b"hello"]))[:-2])
