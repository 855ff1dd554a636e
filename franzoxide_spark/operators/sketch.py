"""Count-min sketch as a relation: bounded-memory heavy hitters.

Tier-C extension (SURVEY.md §2.3). Spark ships a `count_min_sketch`
aggregate but no SQL-level probe for the resulting binary blob, which
makes it useless for a declarative pipeline — so this operator keeps the
sketch RELATIONAL: a (depth, bucket, cnt) table of d×w rows. Build is one
map-side-combined aggregation over the item stream; probing is a join of
candidate items against the broadcast sketch with a min over depth rows.
Everything stays in JVM expressions, both legs are deterministic (the
seeded cross-engine hash from functions/text.py), and DuckDB can mirror
the whole thing — so unlike a binary sketch, this one is oracle-checkable.

Scale: the sketch is d×w rows REGARDLESS of corpus size (the point of
CMS); the item stream is shuffled once on (depth, bucket) with map-side
partial aggregation, i.e. each mapper emits at most d×w partial rows. The
standard CMS guarantee holds: estimates never undercount, and overcount
is bounded by eps·N with eps = e/width at the usual confidence for
depth rows. The exact-count leg q72 carries alongside the estimate is
small-data verification convenience — at 100 TB you would keep only the
sketch path (bounded state) and drop the exact aggregation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.functions.text import HASH60_SEEDED_SPARK, HASH60_SEEDED_SQL


def _bucket(depth_idx: int, item_expr: str, width: int) -> F.Column:
    h = HASH60_SEEDED_SPARK.format(i=depth_idx, s=item_expr)
    return F.expr(f"pmod({h}, {width})")


def cms_build(
    items: DataFrame, item_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """(d, b, cnt) sketch rows from an item stream — d×w rows total."""
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(d, item_col, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db")
    ).select("__db.d", "__db.b")
    return rows.groupBy("d", "b").agg(F.count("*").alias("cnt"))


def cms_estimate(
    sketch: DataFrame,
    candidates: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Estimated count per candidate item: min over its depth buckets.

    The sketch (d×w rows) broadcasts; candidates fan out ×depth and
    hash-join it — no shuffle of anything corpus-sized.
    """
    fanned = candidates.select(
        F.col(item_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        _bucket(d, item_col, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("__db"),
    ).select(item_col, "__db.d", "__db.b")
    return (
        fanned.join(F.broadcast(sketch), ["d", "b"])
        .groupBy(item_col)
        .agg(F.min("cnt").alias("cms_est"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    item_col: str,
    k: int = 10,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Top-k items by CMS estimate, with the exact count alongside.

    Output: (item, cms_est, exact_cnt, overestimate) ordered by
    (cms_est DESC, item ASC) — deterministic. ``overestimate`` must be
    true for every row (CMS never undercounts); the oracle re-derives
    the identical sketch, so this is checkable cross-engine.
    """
    items = df.select(item_col)
    sketch = cms_build(items, item_col, depth, width)
    exact = items.groupBy(item_col).agg(F.count("*").alias("exact_cnt"))
    est = cms_estimate(sketch, exact.select(item_col), item_col, depth, width)
    return (
        est.join(exact, item_col)
        .select(
            item_col,
            F.col("cms_est").cast("bigint").alias("cms_est"),
            F.col("exact_cnt").cast("bigint").alias("exact_cnt"),
            (F.col("cms_est") >= F.col("exact_cnt")).alias("overestimate"),
        )
        .orderBy(F.desc("cms_est"), F.asc(item_col))
        .limit(k)
    )


def sql_cms_heavy_hitters(
    table: str, item_col: str, k: int = 10, depth: int = 4, width: int = 256
) -> str:
    bucket_rows = " UNION ALL ".join(
        f"SELECT {item_col} AS item, {d} AS d,"
        f" {HASH60_SEEDED_SQL.format(i=d, s=item_col)} % {width} AS b"
        f" FROM {table}"
        for d in range(depth)
    )
    return f"""
WITH db AS ({bucket_rows}),
sketch AS (SELECT d, b, COUNT(*) AS cnt FROM db GROUP BY d, b),
exact AS (SELECT {item_col} AS item, COUNT(*) AS exact_cnt
          FROM {table} GROUP BY {item_col}),
cand AS (
  SELECT e.item, x.d,
         {HASH60_SEEDED_SQL.format(i="x.d", s="e.item")} % {width} AS b
  FROM exact e, (SELECT UNNEST(range(0, {depth})) AS d) x
),
est AS (
  SELECT c.item, MIN(s.cnt) AS cms_est
  FROM cand c JOIN sketch s ON c.d = s.d AND c.b = s.b
  GROUP BY c.item
)
SELECT e.item AS {item_col},
       CAST(cms_est AS BIGINT) AS cms_est,
       CAST(exact_cnt AS BIGINT) AS exact_cnt,
       cms_est >= exact_cnt AS overestimate
FROM est e JOIN exact x ON e.item = x.item
ORDER BY cms_est DESC, e.item ASC
LIMIT {k}
"""
