"""Incremental aggregate maintenance: refresh a stored rollup from a
delta instead of rescanning history.

The materialized-view pattern every 100 TB pipeline converges on: daily
(or per-ingest) partial aggregates are tiny and mergeable, so the
refreshed rollup is ``merge(stored_agg, agg(delta))`` — cost
proportional to the DELTA, not the corpus. Works for any
commutative-mergeable measure set; here: counts and exact-decimal sums
(functions/numeric.py), with averages derived at read time (an avg is
NOT mergeable; its (sum, count) parts are — storing the division is the
classic incremental-view bug).

q124 proves the equivalence the pattern rests on: the merge path is
hash-identical to a full recompute (the DuckDB oracle aggregates the
whole table directly).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import dec


def partial_agg(
    df: DataFrame, keys: Sequence[str], value_col: str
) -> DataFrame:
    """The stored/mergeable rollup shape: per key, (n, value_sum) with
    the sum kept in EXACT decimal so merge order can never change it."""
    return df.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec(F.col(value_col))).alias("__dsum"),
    )


def merge_partials(*parts: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Merge any number of partial rollups (stored + deltas): union then
    re-sum — counts and decimal sums are commutative-mergeable, so this
    equals aggregating all underlying rows directly."""
    if not parts:
        raise ValueError("need at least one partial")
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(*keys).agg(
        F.sum("n").alias("n"), F.sum("__dsum").alias("__dsum")
    )


def finalize(agg: DataFrame, keys: Sequence[str]) -> DataFrame:
    """Read-time projection of the stored shape: surface the decimal sum
    as a double and derive the average (sum/count — the mergeable way)."""
    return agg.select(
        *keys,
        F.col("n").cast("bigint").alias("n"),
        F.col("__dsum").cast("double").alias("value_sum"),
        F.round(
            F.col("__dsum").cast("double") / F.col("n").cast("double"), 6
        ).alias("value_avg"),
    )
