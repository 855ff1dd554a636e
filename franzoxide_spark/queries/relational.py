"""Batch relational query surface (SURVEY.md §2.4 Q01-Q22).

All-DataFrame-API, no UDFs: every expression stays JVM-side inside
whole-stage codegen, filters/projections push into the parquet scan, and
Catalyst is free to reorder/broadcast. Money aggregates go through the
exact-decimal helpers in ``functions.numeric`` so results are bit-identical
to the DuckDB oracle (see that module's docstring).

Reference scope note: the reference system (a Kafka->S3 connector,
/root/reference/src) has no relational operators at all — this surface is
the driver-mandated Tier C extension (SURVEY.md §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import (
    davg,
    dec,
    dsum,
    sql_davg,
    sql_dec,
    sql_dsum,
)
from franzoxide_spark.queries import register
from franzoxide_spark.tables import table

SHIP_CUTOFF = "1998-09-02"


# --------------------------------------------------------------------------
# Q01 — scan + filter + project (pushdown check)
# --------------------------------------------------------------------------
def q01(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    return li.filter(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp")).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"
    )


Q01_SQL = f"""
SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF}'
"""


# --------------------------------------------------------------------------
# Q02 — hash aggregate + sort (TPC-H Q1 shape)
# --------------------------------------------------------------------------
def q02(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(12,4)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit(SHIP_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(dec("l_quantity"), "sum_qty"),
            dsum(dec("l_extendedprice"), "sum_base_price"),
            dsum(disc_price, "sum_disc_price"),
            dsum(charge, "sum_charge"),
            davg(dec("l_quantity"), "avg_qty"),
            davg(dec("l_extendedprice"), "avg_price"),
            davg(dec("l_discount"), "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_DP = f"{sql_dec('l_extendedprice')} * (CAST(1 AS DECIMAL(12,4)) - {sql_dec('l_discount')})"
_CH = f"({_DP}) * (CAST(1 AS DECIMAL(12,4)) + {sql_dec('l_tax')})"
Q02_SQL = f"""
SELECT
  l_returnflag, l_linestatus,
  {sql_dsum(sql_dec("l_quantity"), "sum_qty")},
  {sql_dsum(sql_dec("l_extendedprice"), "sum_base_price")},
  {sql_dsum(_DP, "sum_disc_price")},
  {sql_dsum(_CH, "sum_charge")},
  {sql_davg(sql_dec("l_quantity"), "avg_qty")},
  {sql_davg(sql_dec("l_extendedprice"), "avg_price")},
  {sql_davg(sql_dec("l_discount"), "avg_disc")},
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{SHIP_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
"""

register("q01_scan_filter_project", q01, Q01_SQL)
register("q02_agg_pricing_summary", q02, Q02_SQL)
