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


# --------------------------------------------------------------------------
# Misra-Gries mergeable heavy-hitter sketches
# --------------------------------------------------------------------------


def _mg_fold(stream, capacity: int) -> dict:
    """Textbook Misra-Gries (1982): at most ``capacity`` counters; a full
    table decrements all counters instead of inserting. Estimated counts
    undercount by at most (total decrements) <= n/(capacity+1)."""
    counters: dict = {}
    for item in stream:
        if item in counters:
            counters[item] += 1
        elif len(counters) < capacity:
            counters[item] = 1
        else:
            dead = []
            for k in counters:
                counters[k] -= 1
                if counters[k] == 0:
                    dead.append(k)
            for k in dead:
                del counters[k]
    return counters


def mg_merge(sketches, capacity: int) -> dict:
    """Merge MG sketches (Agarwal et al. 2012, "Mergeable Summaries"):
    sum counters by key, then subtract the (capacity+1)-th largest count
    from all and drop the non-positive — the result obeys the SAME error
    bound as a single sketch built over the concatenated streams."""
    total: dict = {}
    for sk in sketches:
        for k, v in sk.items():
            total[k] = total.get(k, 0) + v
    if len(total) > capacity:
        cut = sorted(total.values(), reverse=True)[capacity]
        total = {k: v - cut for k, v in total.items() if v - cut > 0}
    return total


def mg_sketch_rollup(
    events: DataFrame,
    bucket_col: str,
    rollup_col: str,
    item_col: str,
    capacity: int = 20,
) -> DataFrame:
    """Per-``bucket_col`` (e.g. day) Misra-Gries sketches of ``item_col``,
    merged per ``rollup_col`` (e.g. week) WITHOUT rescanning the raw
    stream — the frequency member of the mergeable-sketch family next to
    the HLL rollup (q120) and the bottom-k quantile state (q126). At
    100 TB the daily sketch is ``capacity`` counters regardless of
    stream size; re-aggregating to any coarser grain touches only
    sketches. Output: ``(rollup, item, est_count, n_days)`` for the
    items surviving the merged sketch, plus the per-rollup stream size
    ``n_total`` for the error bound est >= true - n_total/(capacity+1).

    Plan: ONE shuffle to (bucket) groups; each group folds its stream in
    arrival-independent sorted order (determinism for the tests — MG
    contents are order-dependent in general) inside Arrow batches; the
    merge pass moves only |buckets| x capacity counter rows.
    """
    import pandas as pd

    def day_sketch(pdf: pd.DataFrame) -> pd.DataFrame:
        items = sorted(pdf[item_col].tolist())
        counters = _mg_fold(items, capacity)
        return pd.DataFrame(
            {
                "rollup": pdf["rollup"].iloc[0],
                "bucket": pdf[bucket_col].iloc[0],
                "item": list(counters),
                "cnt": list(counters.values()),
                "n_rows": len(pdf),
            }
        )

    sketches = (
        events.withColumn("rollup", F.col(rollup_col))
        .groupBy(bucket_col, "rollup")
        .applyInPandas(
            day_sketch,
            schema=(
                "rollup string, bucket string, item long, cnt long,"
                " n_rows long"
            ),
        )
    )

    def week_merge(pdf: pd.DataFrame) -> pd.DataFrame:
        by_day: dict = {}
        day_rows: dict = {}
        for _, r in pdf.iterrows():
            by_day.setdefault(r["bucket"], {})[r["item"]] = r["cnt"]
            day_rows[r["bucket"]] = r["n_rows"]
        merged = mg_merge(list(by_day.values()), capacity)
        n_total = int(sum(day_rows.values()))
        return pd.DataFrame(
            {
                "rollup": pdf["rollup"].iloc[0],
                "item": list(merged),
                "est_count": list(merged.values()),
                "n_days": len(by_day),
                "n_total": n_total,
            }
        )

    return sketches.groupBy("rollup").applyInPandas(
        week_merge,
        schema=(
            "rollup string, item long, est_count long, n_days int,"
            " n_total long"
        ),
    )
