"""Frequent co-occurrence pair mining (the A-Priori/market-basket first
pass) over an event log: which item pairs co-occur in the same basket
(here: per-user event-type sets) more than independence predicts.

Output per qualifying unordered pair: basket count, support, and lift
(``support(ab) / (support(a)·support(b))`` — >1 means the pair attracts).
This is the association-rule primitive behind recommendation seeds,
funnel hypothesis generation, and feature-cross candidate mining.

Scale shape:

- ONE shuffle builds the per-basket distinct item set (``collect_set``
  after a (basket, item) distinct — both partial-aggregate map-side).
- Pair generation is a MAP-SIDE explode of each basket's sorted item
  array (i < j positions only), so pair rows are bounded by
  Σ |basket|² with |basket| ≤ |item vocabulary| — never a self-join of
  the event log against itself.
- The pair aggregation and the singleton-count broadcast both live on
  the bounded item/pair key space; the raw log is scanned once.

At 100 TB the only corpus-sized operation remains the first distinct;
everything downstream is vocabulary-bounded. Skewed baskets (a user
touching every item) cap at |vocab|² pair rows, a constant.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def frequent_pairs(
    events: DataFrame,
    key_col: str,
    item_col: str,
    *,
    min_support: float = 0.05,
) -> DataFrame:
    """Unordered item pairs co-occurring in ≥ ``min_support`` of baskets:
    ``(item_a, item_b, n_keys, support, lift)``, 6dp-rounded, item_a <
    item_b. Baskets are the distinct ``key_col`` values; an item counts
    once per basket regardless of repetition."""
    # NULL baskets/items can never PAIR (collect_set skips NULL items;
    # the SQL mirror's a.k = b.k never matches NULL keys) — but they
    # WOULD leak into n_total/singles asymmetrically (groupBy keeps the
    # null group while countDistinct skips it), making support/lift
    # internally inconsistent and engine-divergent (r13 review). Exclude
    # them from every count, in both engines.
    ut = (
        events.select(key_col, item_col)
        .filter(F.col(key_col).isNotNull() & F.col(item_col).isNotNull())
        .distinct()
    )
    totals = ut.agg(
        F.countDistinct(key_col).alias("n_total"),
    )
    singles = ut.groupBy(item_col).agg(F.count("*").alias("c1"))

    baskets = ut.groupBy(key_col).agg(
        F.array_sort(F.collect_set(item_col)).alias("__it")
    )
    # map-side pair explode: element i paired with every later element
    pairs_expr = (
        "flatten(transform(__it, (x, i) ->"
        " transform(slice(__it, i + 2, size(__it)),"
        " y -> struct(x as item_a, y as item_b))))"
    )
    pair_counts = (
        baskets.select(F.explode(F.expr(pairs_expr)).alias("p"))
        .select("p.item_a", "p.item_b")
        .groupBy("item_a", "item_b")
        .agg(F.count("*").alias("n_keys"))
    )
    ca = singles.select(
        F.col(item_col).alias("item_a"), F.col("c1").alias("__ca")
    )
    cb = singles.select(
        F.col(item_col).alias("item_b"), F.col("c1").alias("__cb")
    )
    return (
        pair_counts.join(F.broadcast(ca), "item_a")
        .join(F.broadcast(cb), "item_b")
        .crossJoin(F.broadcast(totals))
        .withColumn(
            "support",
            F.round(F.col("n_keys").cast("double") / F.col("n_total"), 6),
        )
        .filter(F.col("support") >= min_support)
        .select(
            "item_a",
            "item_b",
            F.col("n_keys").cast("int").alias("n_keys"),
            "support",
            F.round(
                F.col("n_keys").cast("double")
                * F.col("n_total").cast("double")
                / (F.col("__ca").cast("double") * F.col("__cb")),
                6,
            ).alias("lift"),
        )
    )


def sql_frequent_pairs(
    table: str, key_col: str, item_col: str, *, min_support: float = 0.05
) -> str:
    return f"""
WITH ut AS (SELECT DISTINCT {key_col} AS k, {item_col} AS it FROM {table}
           WHERE {key_col} IS NOT NULL AND {item_col} IS NOT NULL),
nk AS (SELECT COUNT(DISTINCT k) AS n_total FROM ut),
ic AS (SELECT it, COUNT(*) AS c1 FROM ut GROUP BY it),
p AS (
  SELECT a.it AS item_a, b.it AS item_b, COUNT(*) AS n_keys
  FROM ut a JOIN ut b ON a.k = b.k AND a.it < b.it
  GROUP BY a.it, b.it
)
SELECT item_a, item_b,
       CAST(n_keys AS INT) AS n_keys,
       ROUND(CAST(n_keys AS DOUBLE) / n_total, 6) AS support,
       ROUND(CAST(n_keys AS DOUBLE) * n_total / (ca.c1 * CAST(cb.c1 AS DOUBLE)),
             6) AS lift
FROM p
JOIN ic ca ON ca.it = item_a
JOIN ic cb ON cb.it = item_b
CROSS JOIN nk
WHERE ROUND(CAST(n_keys AS DOUBLE) / n_total, 6) >= {min_support}
"""
