"""Single-pass numeric table profiling: the data-quality snapshot a
pipeline takes before trusting a new drop of data (null rates, exact
cardinalities, ranges, deterministic means).

One aggregation job computes every column's stats, then a map-side
explode unpivots the 1-row aggregate into one row per column. Means use
the exact-decimal path (functions/numeric.py) so the cross-engine 6-dp
compare cannot flap on accumulation order.

Scale note: multiple exact COUNT(DISTINCT) in one aggregate triggers
Spark's Expand strategy (input × (#distinct-aggs + 1) before the
shuffle), and Expand replays EVERY aggregate — including the exact-
decimal sums — over the multiplied input (measured 15.6 s vs 2×2.5 s
split at sf0.1). So the profile runs as two jobs: one plain partial
aggregation for counts/min/max/means (whole-stage codegen, no Expand)
and one for the NDVs (Expand over just the profiled columns), crossed
as 1-row × 1-row at the end. At 100 TB swap ``exact_distinct=False``
to ``approx_count_distinct`` (HLL, one pass, no Expand at all) when
±2% NDV is acceptable — that also collapses the profile back to a
single job.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import dec, sql_dec


def profile_numeric(
    df: DataFrame, cols: Sequence[str], exact_distinct: bool = True
) -> DataFrame:
    """One row per column: (col_name, n_rows, n_null, n_distinct,
    min_val, max_val, mean_val) — min/max/mean rounded to 6 dp."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__cnt_{c}"),
            F.round(F.min(c).cast("double"), 6).alias(f"__min_{c}"),
            F.round(F.max(c).cast("double"), 6).alias(f"__max_{c}"),
            F.round(
                F.sum(dec(F.col(c))).cast("double") / F.count(c), 6
            ).alias(f"__mean_{c}"),
        ]
    base = df.agg(*aggs)
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    nds = df.agg(*[nd(c).alias(f"__nd_{c}") for c in cols])
    # 1 row × 1 row — the "cross join" is two scalar subquery results
    one = base.crossJoin(nds)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
                F.col(f"__mean_{c}").alias("mean_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def sql_profile_numeric(table: str, cols: Sequence[str]) -> str:
    parts = [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS min_val,
       ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS max_val,
       ROUND(CAST(SUM({sql_dec(c)}) AS DOUBLE) / COUNT({c}), 6) AS mean_val
FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)
