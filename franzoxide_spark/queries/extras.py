"""Extended surface queries (Q44-Q48): GROUPING SETS, pivot/unpivot, the
pandas-UDF scalar path, and a Python UDTF — the remaining API families
from SURVEY.md §2.3's Tier C inventory."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import sql_dec, sql_dsum
from franzoxide_spark.queries import register
from franzoxide_spark.tables import table

# --------------------------------------------------------------------------
# Q44 — GROUPING SETS (SQL surface; Catalyst expands to an Expand node)
# --------------------------------------------------------------------------
def q44(spark: SparkSession, sf_dir: str) -> DataFrame:
    table(spark, sf_dir, "orders").createOrReplaceTempView("v_orders")
    table(spark, sf_dir, "customer").createOrReplaceTempView("v_customer")
    table(spark, sf_dir, "nation").createOrReplaceTempView("v_nation")
    return spark.sql(
        """
        SELECT n_name, o_orderpriority,
               CAST(SUM((CAST(FLOOR(CAST(o_totalprice AS DOUBLE) * 10000 + 0.5) AS DECIMAL(12,0)) * CAST(0.0001 AS DECIMAL(5,4)))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_orders
        FROM v_orders
        JOIN v_customer ON o_custkey = c_custkey
        JOIN v_nation   ON c_nationkey = n_nationkey
        GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
        """
    )


Q44_SQL = f"""
SELECT n_name, o_orderpriority,
       {sql_dsum(sql_dec("o_totalprice"), "revenue")},
       COUNT(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY GROUPING SETS ((n_name), (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# Q45 — pivot (orders count by status x priority)
# --------------------------------------------------------------------------
_PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
_PIVOT_ALIASES = ["p1_urgent", "p2_high", "p3_medium", "p4_not_specified", "p5_low"]


def q45(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    piv = (
        o.groupBy("o_orderstatus")
        .pivot("o_orderpriority", _PRIORITIES)
        .count()
        .na.fill(0)
    )
    return piv.toDF("o_orderstatus", *_PIVOT_ALIASES)


_PIVOT_ARMS = ",\n       ".join(
    f"COUNT(*) FILTER (o_orderpriority = '{p}') AS {a}"
    for p, a in zip(_PRIORITIES, _PIVOT_ALIASES)
)
Q45_SQL = f"""
SELECT o_orderstatus,
       {_PIVOT_ARMS}
FROM orders GROUP BY o_orderstatus
"""


# --------------------------------------------------------------------------
# Q46 — unpivot via stack() (wide measures -> long)
# --------------------------------------------------------------------------
def q46(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = table(spark, sf_dir, "lineitem")
    long = li.selectExpr(
        "stack(3, 'qty', l_quantity, 'price', l_extendedprice,"
        " 'disc', l_discount) as (measure, val)"
    )
    return long.groupBy("measure").agg(
        F.count(F.lit(1)).alias("n"),
        F.min("val").alias("min_val"),
        F.max("val").alias("max_val"),
    )


Q46_SQL = """
WITH long AS (
  SELECT 'qty' AS measure, l_quantity AS val FROM lineitem
  UNION ALL SELECT 'price', l_extendedprice FROM lineitem
  UNION ALL SELECT 'disc', l_discount FROM lineitem
)
SELECT measure, COUNT(*) AS n, MIN(val) AS min_val, MAX(val) AS max_val
FROM long GROUP BY measure
"""


# --------------------------------------------------------------------------
# Q47 — vectorized pandas UDF (Arrow scalar path)
# --------------------------------------------------------------------------
def q47(spark: SparkSession, sf_dir: str) -> DataFrame:
    # defined in-function: pandas_udf resolves types against the active
    # session, so the decorator cannot run at import time
    @F.pandas_udf("double")
    def log_score(v: pd.Series) -> pd.Series:
        import numpy as np

        return np.log1p(v.clip(lower=0.0)) * 2.0

    ev = table(spark, sf_dir, "events")
    return (
        ev.withColumn("score", log_score(F.col("value")))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("score") / F.count("score"), 6).alias("avg_score"),
        )
    )


Q47_SQL = """
SELECT event_type, COUNT(*) AS n,
       ROUND(SUM(2.0 * ln(1.0 + GREATEST(value, 0.0)))
             / COUNT(*), 6) AS avg_score
FROM events GROUP BY event_type
"""


# --------------------------------------------------------------------------
# Q48 — Python UDTF (table function: text -> shingle rows)
# --------------------------------------------------------------------------
def q48(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, shingle string")
    class ShingleUDTF:
        def eval(self, doc_id: int, text: str):
            toks = text.split(" ")
            seen = set()
            for i in range(max(len(toks) - 2, 0)):
                s = " ".join(toks[i : i + 3])
                if s not in seen:
                    seen.add(s)
                    yield (doc_id, s)

    spark.udtf.register("shingle_udtf", ShingleUDTF)
    table(spark, sf_dir, "documents").createOrReplaceTempView("v_documents")
    return spark.sql(
        """
        SELECT s.doc_id, COUNT(*) AS n_shingles,
               MIN(s.shingle) AS first_shingle
        FROM v_documents d, LATERAL shingle_udtf(d.doc_id, d.text) s
        GROUP BY s.doc_id
        """
    )


Q48_SQL = """
WITH sh AS (
  SELECT doc_id,
         unnest(list_distinct(list_transform(
           range(1, greatest(len(string_split(text, ' ')) - 1, 1)),
           i -> array_to_string((string_split(text, ' '))[i:i+2], ' ')))) AS shingle
  FROM documents
)
SELECT doc_id, COUNT(*) AS n_shingles, MIN(shingle) AS first_shingle
FROM sh GROUP BY doc_id
"""

# --------------------------------------------------------------------------
# Q49 — exact percentiles (interpolated), grouped
# --------------------------------------------------------------------------
def q49(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.expr("percentile(o_totalprice, 0.25)"), 6).alias("p25"),
        F.round(F.expr("percentile(o_totalprice, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(o_totalprice, 0.75)"), 6).alias("p75"),
    )


Q49_SQL = """
SELECT o_orderstatus, COUNT(*) AS n,
       ROUND(quantile_cont(o_totalprice, 0.25), 6) AS p25,
       ROUND(quantile_cont(o_totalprice, 0.5), 6) AS p50,
       ROUND(quantile_cont(o_totalprice, 0.75), 6) AS p75
FROM orders GROUP BY o_orderstatus
"""

register("q44_grouping_sets", q44, Q44_SQL)
register("q45_pivot", q45, Q45_SQL)
register("q46_unpivot_stack", q46, Q46_SQL)
register("q47_pandas_udf_score", q47, Q47_SQL)
register("q48_python_udtf_shingles", q48, Q48_SQL)
register("q49_exact_percentiles", q49, Q49_SQL)
