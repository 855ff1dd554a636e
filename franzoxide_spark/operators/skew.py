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
moderate salt factors; results identical to the plain join.
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
    fp_cols = fingerprint_cols or [c for c in left.columns if c != key]
    l = left.withColumn(
        "__salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in fp_cols]), F.lit(salt)).cast("int"),
    )
    r = right.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return l.join(r, [key, "__salt"], how).drop("__salt")
