"""Stream-stream watermarked interval join.

The one Spark-native streaming operator the matrix lacked through round 6
(reference scope is stream-static only — SURVEY §2.4 Q32): two event
streams equi-joined on a key with a time-interval predicate, the shape of
click-to-purchase attribution, request/response pairing, and sensor
correlation.

Batch/streaming duality: ``interval_join`` builds the SAME plan for batch
and streaming inputs — an equi-join on ``on`` plus a range residual on
the two event-time columns. In streaming mode Spark requires watermarks
on both sides to bound join state: each side's buffered rows are evicted
once the OTHER side's watermark passes the interval bound, so state is
``O(key-cardinality-per-horizon)``, never unbounded. Pass ``watermark``
to enable that (ignored semantics-wise in batch: watermarks are a no-op
on batch DataFrames, so the exact same call works for the oracle-checked
batch face, q114).

Scale shape at 100 TB: both sides shuffle ONCE on the join key; the
interval predicate is a residual on the sorted/hashed join, never a
cartesian. Skewed keys (one user with millions of events) are the same
salting problem as any keyed join — operators/skew.py applies.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    upper: str = "2 hours",
    strict_after: bool = True,
    watermark: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` and ``right`` on ``on`` where ``right_ts`` falls in
    (``left_ts``, ``left_ts + upper``] (or [..] when ``strict_after`` is
    False).

    ``left_ts`` / ``right_ts`` must be DISTINCT column names (rename
    before calling) — the joined row carries both, and distinct names
    keep the output unambiguous without alias gymnastics. ``watermark``
    (e.g. ``"2 hours"``) is applied to both sides' event-time columns;
    required by Spark for streaming state eviction, a no-op for batch.

    ``how``: ``"inner"`` (default), ``"left_outer"`` or ``"full_outer"``.
    ``left_outer`` is the attribution ask "every view, with its purchase
    if one came": unmatched left rows emit null-padded right columns.
    ``full_outer`` is the symmetric reconciliation ask "every view AND
    every orphaned purchase": unmatched rows on EITHER side emit with the
    other side's columns null-padded. Streaming semantics (Spark's
    documented outer stream-stream contract): an unmatched row CANNOT
    emit as soon as it's seen — a match might still arrive — so it emits
    null-padded only after the watermark passes its interval bound and
    its state is evicted. That makes ``watermark`` REQUIRED for any
    streaming outer interval join (Spark enforces it at analysis); batch
    outer joins need no watermark and emit unmatched rows immediately,
    and the two faces agree on the final relation.
    """
    if left_ts == right_ts:
        raise ValueError(
            f"left_ts and right_ts must differ (both {left_ts!r}); rename"
            " one side before joining"
        )
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"join key {on!r} missing from an input")
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            f"how must be 'inner', 'left_outer' or 'full_outer', got {how!r}"
        )
    if (
        how in ("left_outer", "full_outer")
        and watermark is None
        and (left.isStreaming or right.isStreaming)
    ):
        raise ValueError(
            f"streaming {how} interval join requires a watermark"
            " (state for unmatched rows must be evictable)"
        )
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    lower_op = ">" if strict_after else ">="
    # the only shared column name is the key — rename the right side's so
    # the join condition and the output are unambiguous
    right_key = f"__{on}_r"
    right = right.withColumnRenamed(on, right_key)
    cond = (
        (F.col(on) == F.col(right_key))
        & F.expr(f"{right_ts} {lower_op} {left_ts}")
        & F.expr(f"{right_ts} <= {left_ts} + interval {upper}")
    )
    joined = left.join(right, cond, how)
    if how == "full_outer":
        # an unmatched RIGHT row carries its key only in the renamed right
        # column — surface one unified key instead of dropping it
        joined = joined.withColumn(on, F.coalesce(F.col(on), F.col(right_key)))
    return joined.drop(right_key)
