"""Training-data export: size-capped JSONL shards plus a verifiable
manifest.

The hand-off shape between a curation pipeline and a training run:
newline-delimited JSON shards capped at ``rows_per_shard`` (trainers
stream shards independently; a shard is the unit of retry and of
shuffling), and a manifest the consumer can verify WITHOUT trusting the
producer — per-shard row count and an order-insensitive content
checksum (sum of per-row md5 fingerprints, the q104 construction), so
``sum(manifest.checksum)`` equals the whole-dataset checksum no matter
how rows were distributed into shards.

Scale shape: the write is one pass with ``maxRecordsPerFile`` doing the
capping inside each task (no extra shuffle; shard count = ceil(rows /
cap) summed over tasks); the manifest is one file-grouped aggregation
over the written directory using the ``_metadata`` file column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _row_fingerprint(col: str):
    return F.expr(
        f"cast(conv(substr(md5({col}), 1, 15), 16, 10) as decimal(38,0))"
    )


def export_jsonl_shards(
    df: DataFrame,
    out_path: str,
    rows_per_shard: int,
) -> None:
    """Write ``df`` as JSONL shards of at most ``rows_per_shard`` rows."""
    if rows_per_shard <= 0:
        raise ValueError(f"rows_per_shard must be positive: {rows_per_shard}")
    (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .write.option("maxRecordsPerFile", rows_per_shard)
        .mode("overwrite")
        .text(out_path)
    )


def shard_manifest(spark: SparkSession, out_path: str) -> DataFrame:
    """Manifest of an exported directory: ``(shard, n_rows, checksum)``
    per shard file, checksum = exact decimal sum of per-line md5
    fingerprints (order- and shard-assignment-insensitive: summing the
    column reproduces the whole-dataset checksum)."""
    lines = spark.read.text(out_path).select(
        F.col("value"), F.col("_metadata.file_name").alias("shard")
    )
    return lines.groupBy("shard").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(_row_fingerprint("value"))
        .cast("decimal(38,0)")
        .cast("string")
        .alias("checksum"),
    )


def dataset_checksum(df: DataFrame) -> str:
    """Whole-dataset order-insensitive checksum of the SAME JSONL
    rendering the export writes — the number a consumer compares
    ``sum(manifest checksums)`` against."""
    row = (
        df.select(F.to_json(F.struct(*df.columns)).alias("value"))
        .agg(F.sum(_row_fingerprint("value")).cast("decimal(38,0)").alias("c"))
        .first()
    )
    # SUM over zero rows is NULL -> str(None) == 'None' would spuriously
    # mismatch an empty manifest's sum of 0 (r13 review)
    return str(row["c"]) if row["c"] is not None else "0"


def export_tfrecord_shards(
    df: DataFrame,
    payload_col: str,
    out_path: str,
    *,
    shard_col: str = "__shard",
    n_shards: int | None = None,
) -> DataFrame:
    """Write a binary-payload column as TFRecord shard files
    (functions/tfrecord.py framing: length + masked-CRC32C, the
    TensorFlow container format) — the hand-off a TF/JAX input pipeline
    consumes directly via ``TFRecordDataset``.

    Each task writes ONE shard file (``part-<shard>.tfrecord``) from its
    partition via Arrow batches — the write is embarrassingly parallel
    and adding executors adds shards, the same growth law as every
    object-store sink here. Pass ``n_shards`` to repartition first
    (deterministic by ``payload_col`` hash); otherwise the current
    partitioning is kept. Returns the per-shard manifest
    ``(shard, n_records, n_bytes)`` computed from what was actually
    written (read back from the task, not trusted from the plan).

    Write-once contract: the shard write is a side effect inside the
    plan, so this function MATERIALIZES the manifest exactly once
    (collect + createDataFrame) before returning — re-evaluating the
    returned DataFrame re-reads driver-local rows, never re-runs the
    write. Task retries are safe: each attempt writes an
    attempt-unique temp file (``.part-NNNNN.aAID.inprogress``) and
    publishes with an atomic ``os.replace``, so two racing attempts of
    one partition never interleave bytes — last complete file wins.
    ``out_path`` must be a filesystem visible to driver AND executors
    (local mode, or a shared mount); object stores go through the
    committer-based sinks (sinks/object_sink.py), not this direct path.
    """
    import os

    from pyspark.sql import functions as F  # noqa: F811

    if n_shards is not None:
        df = df.repartition(n_shards, F.col(payload_col))
    os.makedirs(out_path, exist_ok=True)
    # clear prior shards: a re-export with fewer partitions would
    # otherwise leave stale part-NNNNN.tfrecord files that
    # read_tfrecord_shards globs up alongside the new data while the
    # returned manifest lists only the new shards (r13 review) — the
    # jsonl path gets this from mode('overwrite'); mirror it here
    for stale in os.listdir(out_path):
        if stale.endswith(".tfrecord") or stale.endswith(".inprogress"):
            os.remove(os.path.join(out_path, stale))

    def write_shard(batches):
        import pandas as pd
        from pyspark import TaskContext

        from franzoxide_spark.functions.tfrecord import frame_records_batch

        ctx = TaskContext.get()
        shard = f"part-{ctx.partitionId():05d}.tfrecord"
        n, total = 0, 0
        tmp = os.path.join(
            out_path, f".{shard}.a{ctx.taskAttemptId()}.inprogress"
        )
        try:
            with open(tmp, "wb") as f:
                for pdf in batches:
                    # batch-framed (numpy-vectorized CRC32C): the scalar
                    # frame_record paid one Python dispatch per BYTE and
                    # dominated the export wall (r17; bit-identical
                    # output pinned in tests/test_tfrecord.py)
                    payloads = [bytes(p) for p in pdf[payload_col]]
                    framed = frame_records_batch(payloads)
                    f.write(framed)
                    n += len(payloads)
                    total += len(framed)
            if n == 0:
                return iter(())
            os.replace(tmp, os.path.join(out_path, shard))  # atomic publish
        finally:
            if os.path.exists(tmp):
                os.remove(tmp)
        return iter(
            [pd.DataFrame({"shard": [shard], "n_records": [n], "n_bytes": [total]})]
        )

    spark = df.sparkSession
    schema = "shard string, n_records long, n_bytes long"
    rows = df.select(payload_col).mapInPandas(write_shard, schema=schema).collect()
    return spark.createDataFrame(rows, schema)


def read_tfrecord_shards(spark: SparkSession, out_path: str) -> DataFrame:
    """Read TFRecord shards back as ``(shard, payload binary)`` rows,
    verifying every frame checksum — the consumer-side round-trip proof.
    ``binaryFile`` distributes by file, the frame parse is per-shard
    Python over Arrow batches."""
    import os

    files = spark.read.format("binaryFile").load(
        os.path.join(out_path, "*.tfrecord")
    )

    def parse(batches):
        import pandas as pd

        from franzoxide_spark.functions.tfrecord import read_records_batch

        for pdf in batches:
            shards, payloads = [], []
            for path, content in zip(pdf["path"], pdf["content"]):
                name = path.rsplit("/", 1)[-1]
                for payload in read_records_batch(bytes(content)):
                    shards.append(name)
                    payloads.append(payload)
            yield pd.DataFrame({"shard": shards, "payload": payloads})

    return files.select("path", "content").mapInPandas(
        parse, schema="shard string, payload binary"
    )
