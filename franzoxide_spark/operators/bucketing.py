"""Bucketed-table support: shuffle-free co-located joins at scale.

At 100 TB the dominant cost of a fact-fact join is the shuffle of both
sides. Spark's answer is bucketing: write each table hash-clustered into
N buckets on the join key (``DataFrameWriter.bucketBy``), and Catalyst
joins matching bucket specs with NO Exchange on either side — the join
becomes a per-bucket SortMergeJoin over co-located files. The reference
has no analog (it is a connector, not a warehouse); this is part of the
engine's Tier-C scale surface, plan-audited in tests/test_plans.py.

Operational notes that matter at scale:
- both sides must be bucketed on the SAME key into the SAME bucket count
  (or a divisor — Spark 4 can coalesce bucket counts when
  ``spark.sql.bucketing.coalesceBucketsInJoin.enabled`` is set);
- bucketed tables must be saved through the session catalog
  (``saveAsTable``) — plain parquet paths carry no bucket metadata;
- ``spark.sql.sources.bucketing.enabled`` (default true) gates the
  optimization; AQE preserves bucket properties.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_key: str,
    n_buckets: int,
    sort_by: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a catalog table bucketed on ``bucket_key``.

    ``sort_by`` additionally sorts within each bucket file, letting the
    downstream SortMergeJoin skip its sort stage entirely (plan shows
    neither Exchange NOR Sort)."""
    writer = df.write.format("parquet").mode(mode).bucketBy(n_buckets, bucket_key)
    if sort_by is not None:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table_name)


def bucketed_join(
    spark: SparkSession,
    left_table: str,
    right_table: str,
    on: str,
    how: str = "inner",
) -> DataFrame:
    """Join two bucketed catalog tables on their bucket key. When both
    specs match, the physical plan contains no Exchange — verify with
    ``df.explain()`` (audited in tests/test_plans.py)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
