"""JSONL shard export + verifiable manifest (operators/export.py)."""

from __future__ import annotations

import glob
import json

import pytest
from pyspark.sql import functions as F

from franzoxide_spark.operators.export import (
    dataset_checksum,
    export_jsonl_shards,
    shard_manifest,
)
from franzoxide_spark.tables import table


def test_shards_capped_and_manifest_verifies(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export")
    docs = table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    total = docs.count()
    cap = 64
    export_jsonl_shards(docs, out, rows_per_shard=cap)
    manifest = shard_manifest(spark, out).collect()
    # every shard at or under the cap; counts add up
    assert all(r["n_rows"] <= cap for r in manifest)
    assert sum(r["n_rows"] for r in manifest) == total
    assert len(manifest) >= total // cap
    # the consumer-side verification: manifest checksums sum to the
    # whole-dataset checksum regardless of shard assignment
    assert sum(int(r["checksum"]) for r in manifest) == int(
        dataset_checksum(docs)
    )


def test_export_round_trips_through_json(spark, sf_dir, tmp_path):
    out = str(tmp_path / "export_rt")
    docs = table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    export_jsonl_shards(docs, out, rows_per_shard=100)
    files = glob.glob(out + "/*.txt")
    assert files
    # a consumer reading with a plain JSON parser sees the exact rows
    line = open(files[0]).readline()
    rec = json.loads(line)
    assert set(rec) == {"doc_id", "lang", "text"}
    back = spark.read.json(out)
    assert back.count() == docs.count()
    assert (
        back.select("doc_id", "lang", "text")
        .exceptAll(docs.select("doc_id", "lang", "text"))
        .count()
        == 0
    )


def test_manifest_detects_tampering(spark, sf_dir, tmp_path):
    """The point of the checksum: a modified shard no longer matches."""
    out = str(tmp_path / "export_tamper")
    docs = table(spark, sf_dir, "documents").select("doc_id", "text").limit(50)
    export_jsonl_shards(docs, out, rows_per_shard=25)
    before = {r["shard"]: r["checksum"] for r in shard_manifest(spark, out).collect()}
    victim = sorted(glob.glob(out + "/*.txt"))[0]
    lines = open(victim).read().splitlines()
    # same-length edit (Spark validates file sizes against its listing):
    # flip one character inside the first line's payload
    ln = lines[0]
    pos = ln.rindex('"') - 1
    ln = ln[:pos] + ("X" if ln[pos] != "X" else "Y") + ln[pos + 1 :]
    lines[0] = ln
    open(victim, "w").write("\n".join(lines) + "\n")
    # Hadoop's LocalFileSystem wrote a .crc sidecar that would flag the
    # edit before our manifest gets to — object stores (the production
    # target) have no such sidecar, so drop it to exercise OUR check
    import os

    crc = os.path.join(
        os.path.dirname(victim), "." + os.path.basename(victim) + ".crc"
    )
    if os.path.exists(crc):
        os.remove(crc)
    # the session's file-status cache still holds the pre-tamper mtime;
    # a real consumer verifying in a fresh session never hits this
    spark.catalog.refreshByPath(out)
    after = {r["shard"]: r["checksum"] for r in shard_manifest(spark, out).collect()}
    changed = [s for s in before if before[s] != after.get(s)]
    assert len(changed) == 1


def test_export_rejects_bad_cap(spark, sf_dir, tmp_path):
    docs = table(spark, sf_dir, "documents").limit(1)
    with pytest.raises(ValueError, match="rows_per_shard"):
        export_jsonl_shards(docs, str(tmp_path / "x"), rows_per_shard=0)


def test_checksum_is_shard_assignment_invariant(spark, sf_dir, tmp_path):
    """Re-exporting with a different cap (different shard boundaries and
    different file count) leaves the summed checksum identical."""
    docs = table(spark, sf_dir, "documents").select("doc_id", "text")
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    export_jsonl_shards(docs, a, rows_per_shard=33)
    export_jsonl_shards(docs.repartition(7), b, rows_per_shard=200)
    sum_a = sum(int(r["checksum"]) for r in shard_manifest(spark, a).collect())
    sum_b = sum(int(r["checksum"]) for r in shard_manifest(spark, b).collect())
    assert sum_a == sum_b
    assert len(glob.glob(a + "/*.txt")) != len(glob.glob(b + "/*.txt"))
