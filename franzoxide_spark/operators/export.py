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
    return str(row["c"])
