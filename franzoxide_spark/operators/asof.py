"""As-of (point-in-time) join — an operator Spark lacks natively.

Two implementations with identical semantics (for each left row: the
latest right row with ``right_ts <= left_ts`` within the key group;
deterministic tie-break by the right id):

- ``asof_join``          — composition of built-in ops: range-conditioned
  equi-join + per-left-row max(struct) aggregation (r17; formerly a
  row_number window — the aggregate reduces the inflation MAP-SIDE where
  the window had to shuffle and sort all of it). Catalyst plans the
  equi-key as the shuffle/join key and the time bound as a residual
  filter. Fully oracle-checkable. Cost: the join still inflates to
  (left x matching-right) in-task before the partial aggregate eats it —
  fine when per-key fan-out is bounded.

- ``asof_join_pandas``   — the 100 TB path: co-partition both sides by
  key, ``applyInPandas`` with a per-group sort + ``pd.merge_asof``
  (linear merge instead of fan-out+window). One shuffle per side, no
  row inflation. Same results; compared against the first path in tests.

Measured crossover (r12, BASELINE.md borderline-ratio sweep): the
composition path wins at bench SF (0.85 vs 0.57 s is within Arrow-batch
floor) but its inflation term is the linear one — 6.59 vs 2.30 s at
10x, 19.70 vs 5.69 s at 30x. Choose the merge path once per-key
fan-out times data size stops being floor-dominated (~10x the bench
fixture); both registry faces (q43/q43b) oracle-check against ONE SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    left_id: str,
    right_id: str,
) -> DataFrame:
    r = right.select(right_key, right_ts, right_id, *right_cols)
    joined = left.join(
        r,
        (left[left_key] == r[right_key]) & (r[right_ts] <= left[left_ts]),
        "left",
    )
    # Pick the latest matching right row per left row with a hash
    # AGGREGATE, not a row_number window (r17, guide §2.3 "aggregate
    # before you shuffle"): max over struct(right_ts, right_id, ...) is
    # exactly the ORDER BY right_ts DESC, right_id DESC pick — matched
    # rows never carry a null right_ts (they passed the <= bound) and
    # (right_ts, right_id) orders before the payload fields are ever
    # compared. The window shape shuffled the full (left x matching-
    # right) inflation to sort it; the aggregate reduces it map-side and
    # shuffles one partial row per left row. Assumes ``left_id`` is
    # unique per left row (the window shape silently kept one row per
    # left_id; with the aggregate, duplicate FULL left rows collapse
    # too — both are degenerate inputs for an as-of join).
    best = joined.groupBy(*[left[c] for c in left.columns]).agg(
        F.max(F.struct(right_ts, right_id, *right_cols)).alias("__best")
    )
    return best.select(
        *left.columns,
        *[F.col(f"__best.{c}").alias(c) for c in (right_ts, right_id, *right_cols)],
    )


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    out_schema: str,
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Co-partitioned merge_asof. ``right`` columns are suffixed as given
    in out_schema; both frames must share the join key column name.

    ``right_tiebreak`` makes ties deterministic: when several right rows
    share one ``right_ts``, ``merge_asof`` picks the LAST row in sort
    order, so a secondary ascending sort on the tie-break column selects
    the MAX tie-break value — exactly the ``ORDER BY ts DESC, id DESC``
    pick of :func:`asof_join`, making the two paths hash-identical (q43b
    is oracle-checked against the same Q43_SQL as q43).

    Granularity: PARTITION-level, not key-level. ``groupBy(key)
    .applyInPandas`` pays the pandas group dispatch per key — measured
    28.9 s at sf0.1 (~15k tiny groups) vs 0.9 s for the window path,
    and a 100 TB corpus has millions of keys. Instead both sides are
    hash-co-partitioned on the key and each partition runs ONE
    ``pd.merge_asof(..., by=key)`` over all of its keys — per-task cost
    is one linear merge of the partition, and the partition count (not
    the key count) bounds Python overhead. Keys are never split across
    partitions (hash partitioning), so results are identical."""
    import pandas as pd

    lcols = left.columns
    # right columns with integral Spark types: unmatched left rows surface
    # as NaN in pandas (which only exists for floats) — convert those
    # columns to pandas' nullable Int64 so Arrow hands Spark proper NULLs
    # instead of failing to cast non-finite floats to bigint.
    int_rcols = {
        "r_" + f.name
        for f in right.schema.fields
        if f.dataType.simpleString() in ("tinyint", "smallint", "int", "bigint")
        and f.name != key
    }
    r_sort = ["r_" + right_ts] + (
        ["r_" + right_tiebreak] if right_tiebreak else []
    )

    def merge_partition(batches):
        frames = list(batches)
        if not frames:
            return
        pdf = pd.concat(frames, ignore_index=True)
        l = pdf[pdf["__side"] == 0][lcols].sort_values(left_ts)
        if l.empty:
            return
        rcols = [key] + [c for c in pdf.columns if c.startswith("r_")]
        # merge_asof(by=...) needs a global sort on the ON key; the
        # secondary tie-break sort preserves per-key (ts, tiebreak) order,
        # which is what makes the LAST-row pick deterministic.
        r = pdf[pdf["__side"] == 1][rcols].sort_values(r_sort)
        merged = pd.merge_asof(
            l,
            r,
            left_on=left_ts,
            right_on="r_" + right_ts,
            by=key,
            direction="backward",
        )
        for c in int_rcols:
            if c in merged.columns and merged[c].dtype == "float64":
                merged[c] = merged[c].astype("Int64")
        yield merged

    lp = left.withColumn("__side", F.lit(0))
    rp = right.select(
        F.col(key),
        *[F.col(c).alias("r_" + c) for c in right.columns if c != key],
    ).withColumn("__side", F.lit(1))
    both = lp.unionByName(rp, allowMissingColumns=True)
    # one shuffle total: hash-partition the union on the key (keys never
    # split), then a single linear merge per partition. Partition sizing
    # is the operator's memory knob at scale (spark.sql.shuffle.partitions
    # or an explicit repartition before calling).
    return both.repartition(key).mapInPandas(merge_partition, schema=out_schema)
