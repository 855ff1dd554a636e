"""Read-back of parquet sink targets, with schema evolution (B8).

The reference declares schema registry / schema evolution as a gap it
never implemented (GAP.md:12,18; docker-compose.yml:32-44 ships a registry
container nothing talks to). The Spark-native slice that IS real: parquet
footers carry per-file schemas, and ``mergeSchema`` unions them on read —
so sink output written across an evolving record schema (a column added in
a later batch) reads back as one DataFrame with the union schema, old rows
NULL in the new columns.

At 100 TB: ``mergeSchema`` reads every file footer at planning time, which
is exactly why it is an explicit option here and not a default — turn it
on for evolved datasets, leave the single-footer fast path otherwise."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_sink_parquet(
    spark: SparkSession, path: str, merge_schema: bool = True
) -> DataFrame:
    return (
        spark.read.option("mergeSchema", "true" if merge_schema else "false")
        .option("recursiveFileLookup", "false")
        .parquet(path)
    )
