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
