"""Blocked record linkage (entity resolution) for structured records.

The structured-record sibling of the document dedup family: find rows in
two registries that refer to the same real-world entity despite field
typos. Classic two-phase shape — BLOCK (equi-join on coarse keys: no
all-pairs, candidates only within a block) then VERIFY (edit distance on
the noisy field, a residual on the joined rows).

Scale shape at 100 TB: one shuffle per side on the block key; candidate
volume is bounded by block-key collisions exactly like the LSH band join
in dedup.py (blocking IS manual LSH for structured fields). A hot block
(millions of rows sharing a key) is the same skew problem as any join —
pick finer block keys or salt (operators/skew.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def blocked_linkage(
    left: DataFrame,
    right: DataFrame,
    id_left: str,
    id_right: str,
    block_cols: Sequence[str],
    compare_col: str,
    max_dist: int = 1,
) -> DataFrame:
    """Candidate pairs ``(id_left, id_right, dist)`` where both sides
    agree on every ``block_cols`` value and
    ``levenshtein(compare_col) <= max_dist``.

    Both inputs must carry the named id, block, and compare columns;
    the right side's are suffixed ``_r`` internally so self-linkage
    (left is right) works without alias gymnastics.
    """
    if not block_cols:
        raise ValueError("block_cols must be non-empty")
    r = right.select(
        F.col(id_right).alias("__id_r"),
        F.col(compare_col).alias("__cmp_r"),
        *[F.col(c).alias(f"__blk_r_{i}") for i, c in enumerate(block_cols)],
    )
    l = left.select(
        F.col(id_left),
        F.col(compare_col).alias("__cmp_l"),
        *[F.col(c).alias(f"__blk_l_{i}") for i, c in enumerate(block_cols)],
    )
    cond = None
    for i in range(len(block_cols)):
        eq = F.col(f"__blk_l_{i}") == F.col(f"__blk_r_{i}")
        cond = eq if cond is None else (cond & eq)
    dist = F.levenshtein("__cmp_l", "__cmp_r")
    return (
        l.join(r, cond)
        .filter(dist <= max_dist)
        .select(
            F.col(id_left),
            F.col("__id_r").alias(id_right),
            dist.cast("int").alias("dist"),
        )
    )
