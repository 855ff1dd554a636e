"""Skew-aware join: explicit key salting.

AQE's skew-join handling (enabled in session.py) splits oversized
partitions at runtime, but it only works for sort-merge joins with
statistics; salting is the explicit, always-works fallback for a join
whose key distribution is known-pathological (one hot user, one hot
topic-partition):

- left (big, skewed) side: add a uniform random-free salt derived from a
  row fingerprint — deterministic, no rand() so replays/retries stay
  consistent;
- right side: explode each row into all ``salt`` replicas;
- join on (key, salt): the hot key's rows spread over ``salt`` reducers.

Cost: right side inflated x salt — use for big-x-small-but-hot or
moderate salt factors; results identical to the plain join for the
SUPPORTED join types (inner and the left-sided family — right/full
outer are rejected loudly, since the exploded right side would emit
unmatched right rows once per replica).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    how: str = "inner",
    salt: int = 16,
    fingerprint_cols: list[str] | None = None,
) -> DataFrame:
    # right/full outer are NOT expressible under this salting scheme: the
    # right side is exploded into `salt` replicas, so a right row whose
    # key never matches the left would survive the outer join once PER
    # REPLICA — `salt` duplicate null-padded rows where the plain join
    # emits one (r13 review). Inner and left-sided joins are safe: the
    # left side carries exactly one salt per row, and unmatched RIGHT
    # replicas are dropped by construction.
    if how.lower().replace("_", "") not in (
        "inner", "left", "leftouter", "leftsemi", "leftanti",
    ):
        raise ValueError(
            f"salted_join: how={how!r} is not supported — the exploded "
            "right side would emit unmatched right rows once per salt "
            "replica. Use the plain join (AQE skew handling) for "
            "right/full outer."
        )
    fp_cols = (
        fingerprint_cols
        if fingerprint_cols is not None
        else [c for c in left.columns if c != key]
    )
    if not fp_cols:
        # a keys-only left has nothing row-distinguishing to salt on —
        # every deterministic function of row content is CONSTANT per
        # key, so the hot key would land in one salt bucket and the
        # salting would be a no-op that still pays the x-salt right
        # inflation (and xxhash64() with zero args is an analysis
        # error, r13 review). Fail with the actionable message.
        raise ValueError(
            "salted_join: the left side has no columns besides the join "
            "key to fingerprint — a deterministic salt cannot spread a "
            "hot key without a row-distinguishing column. Pass "
            "fingerprint_cols or keep a distinguishing column in the "
            "left projection."
        )
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fp_cols]), F.lit(salt)).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")


# --------------------------------------------------------------------------
# join-key skew diagnosis (the "measure" half; salted_join is the "fix")
# --------------------------------------------------------------------------


def join_skew_report(df: DataFrame, key: str) -> DataFrame:
    """One-row skew report for a join/groupBy key: total rows, key
    cardinality, the hottest key's row share, the top-10 keys' combined
    share, and the Gini coefficient of the per-key count distribution.
    The numbers that decide between a plain shuffle join, AQE skew
    splitting, and :func:`salted_join` — and what salt factor to pick.

    Scale shape: the corpus shuffles ONCE into per-key counts (map-side
    combined). Everything after runs on count-domain aggregates: the
    Gini rank-sum Σ rank_i·c_i is computed by grouping keys by their
    COUNT VALUE (keys sharing a count take consecutive ranks, and the
    rank-sum over such a run depends only on the run's start — never on
    which key got which rank), so the only window runs over DISTINCT
    count values — bounded by the hottest key's count in the worst case
    and tiny in practice, never key cardinality. The top-10 share is a
    global TakeOrdered (ties at the cutoff have equal counts, so the SUM
    is deterministic even though the pick isn't). Rank-sums accumulate
    in DECIMAL(38,0) — exact far past the ~2^53 where bigint·bigint
    products would silently wobble in double, and past bigint overflow
    at extreme-scale rank·count products.
    """
    counts = df.groupBy(F.col(key).alias("__k")).agg(F.count("*").alias("__c"))
    grp = counts.groupBy("__c").agg(F.count("*").alias("__n"))
    from pyspark.sql import Window

    w = Window.orderBy("__c").rowsBetween(Window.unboundedPreceding, -1)
    ranked = grp.withColumn(
        "__prior", F.coalesce(F.sum("__n").over(w), F.lit(0))
    )
    # keys with count c occupy ranks prior+1 .. prior+n (ascending order);
    # Σ rank over the run = n*prior + n*(n+1)/2, contribution = c * that
    # the rank-run factor itself must be decimal BEFORE the products:
    # with ~4e9 keys sharing one count (every-key-unique is the common
    # case), __n*(__n+1) overflows bigint silently in Spark (duckdb
    # raises) — compute n·prior + n(n+1)/2 in decimal(19,0) operands
    # (products stay well inside 38 digits; n(n+1) is even, so the /2
    # is exact)
    run_sum = F.expr(
        "cast(cast(__n as decimal(19,0)) * cast(__prior as decimal(19,0))"
        " + cast(__n as decimal(19,0))"
        "   * cast(__n + 1 as decimal(19,0)) / 2 as decimal(38,0))"
    )
    s = ranked.agg(
        F.sum(
            F.col("__c").cast("decimal(19,0)") * run_sum
        ).alias("__s"),
        F.sum(F.col("__c").cast("decimal(38,0)") * F.col("__n")).alias("__t"),
        F.sum("__n").alias("__nk"),
        F.max("__c").alias("__mx"),
    )
    top10 = (
        counts.orderBy(F.desc("__c"), "__k")
        .limit(10)
        .agg(F.sum("__c").alias("__t10"))
    )
    t = F.col("__t").cast("double")
    n = F.col("__nk").cast("double")
    return s.crossJoin(top10).select(
        F.col("__t").cast("bigint").alias("n_rows"),
        F.col("__nk").cast("bigint").alias("n_keys"),
        F.round(F.col("__mx").cast("double") / t, 6).alias("max_share"),
        F.round(F.col("__t10").cast("double") / t, 6).alias("top10_share"),
        F.round(
            F.lit(2.0) * F.col("__s").cast("double") / (n * t)
            - (n + F.lit(1.0)) / n,
            6,
        ).alias("gini"),
    )


def sql_join_skew_report(table: str, key: str) -> str:
    return f"""
WITH counts AS (
  SELECT {key} AS k, COUNT(*) AS c FROM {table} GROUP BY {key}
),
grp AS (SELECT c, COUNT(*) AS n FROM counts GROUP BY c),
ranked AS (
  SELECT c, n, COALESCE(SUM(n) OVER (ORDER BY c
    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prior
  FROM grp
),
s AS (
  SELECT SUM(CAST(c AS HUGEINT)
             * (CAST(n AS HUGEINT) * prior
                + (CAST(n AS HUGEINT) * (n + 1)) // 2)) AS s,
         SUM(CAST(c AS HUGEINT) * n) AS t,
         SUM(n) AS nk, MAX(c) AS mx
  FROM ranked
),
top10 AS (
  SELECT SUM(c) AS t10
  FROM (SELECT c FROM counts ORDER BY c DESC, k LIMIT 10)
)
SELECT CAST(t AS BIGINT) AS n_rows, CAST(nk AS BIGINT) AS n_keys,
       ROUND(CAST(mx AS DOUBLE) / CAST(t AS DOUBLE), 6) AS max_share,
       ROUND(CAST(t10 AS DOUBLE) / CAST(t AS DOUBLE), 6) AS top10_share,
       ROUND(2.0 * CAST(s AS DOUBLE)
               / (CAST(nk AS DOUBLE) * CAST(t AS DOUBLE))
             - (CAST(nk AS DOUBLE) + 1.0) / CAST(nk AS DOUBLE), 6) AS gini
FROM s CROSS JOIN top10
"""
