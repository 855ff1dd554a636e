"""Deterministic training-order shuffle + sharding.

The last step before a training run reads the corpus: give every example
a reproducible pseudo-random position so (a) epoch order is decorrelated
from ingest order (adjacent crawl pages are near-duplicates in
distribution — feeding them consecutively hurts optimization), and
(b) the same seed always yields the same order, so a resumed or re-run
job trains on an identical stream.

Spark-first shape — NO global sort: a global ``row_number`` over a
seeded hash would funnel the corpus through one partition (the classic
unpartitioned-window trap), and a global ``orderBy`` is a full
range-exchange. Instead the permutation is shard-major: the seeded
60-bit hash picks a shard (its low bits) AND orders rows inside the
shard (``Window.partitionBy(shard)`` — every partition bounded by
corpus/n_shards), so the only wide operation is one hash exchange on the
shard id. Readers consume shards in id order to realize the
permutation; at 100 TB each shard is one output file/task and n_shards
scales with the cluster, not the data. Shard skew is +-sqrt over the
hash, not data-dependent.

Tier-C LLM-pipeline surface (SURVEY.md §2.3); the reference connector
(src/s3.rs) has no query/ordering surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import HASH60_SEEDED_SPARK, HASH60_SEEDED_SQL


def deterministic_shuffle(
    df: DataFrame,
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 8,
) -> DataFrame:
    """Assign every row a reproducible (shard, pos) training-order slot.

    ``shard = h mod n_shards``, ``pos`` = rank of ``h`` within the shard
    (ties — a 60-bit hash collision — broken by id, so the permutation
    is total and engine-independent). Returns ``id_col, shard int,
    pos int``.
    """
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    h = F.expr(HASH60_SEEDED_SPARK.format(i=seed, s=f"cast(`{id_col}` as string)"))
    with_h = df.select(F.col(id_col), h.alias("__h"))
    w = Window.partitionBy("__shard").orderBy("__h", id_col)
    return (
        with_h.withColumn("__shard", F.pmod("__h", F.lit(n_shards)).cast("int"))
        .withColumn("__pos", F.row_number().over(w) - 1)
        .select(
            id_col,
            F.col("__shard").alias("shard"),
            F.col("__pos").cast("int").alias("pos"),
        )
    )


def sql_deterministic_shuffle(
    table: str = "documents",
    id_col: str = "doc_id",
    seed: int = 42,
    n_shards: int = 8,
) -> str:
    """DuckDB mirror — same seeded hash, same shard-major ranking."""
    h = HASH60_SEEDED_SQL.format(i=seed, s=f"CAST({id_col} AS VARCHAR)")
    return f"""
WITH h AS (SELECT {id_col}, {h} AS hh FROM {table}),
s AS (SELECT {id_col}, hh, CAST(hh % {n_shards} AS INT) AS shard FROM h)
SELECT {id_col}, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY shard ORDER BY hh, {id_col})
            - 1 AS INT) AS pos
FROM s
"""
