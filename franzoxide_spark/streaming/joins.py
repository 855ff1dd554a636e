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


def _lit_col(name: str):
    """A column reference that treats ``name`` fully literally: plain
    ``F.col`` (like ``F.expr``) parses dots as struct-field access, so a
    legal column literally named ``"event.ts"`` would mis-resolve (or
    resolve against an unrelated struct). Backtick-quoting (with Spark's
    double-backtick escape) makes every validated-by-membership name
    resolve as itself."""
    return F.col("`" + name.replace("`", "``") + "`")


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
    upper_col: str | None = None,
) -> DataFrame:
    """Join ``left`` and ``right`` on ``on`` where ``right_ts`` falls in
    (``left_ts``, ``left_ts + upper``] (or [..] when ``strict_after`` is
    False).

    ``upper_col`` (r15 unfreeze #2): a LEFT-side column of SECONDS giving
    each row its own bound — the per-key dynamic-window / asof-style ask.
    When set, the effective window is (``left_ts``, ``left_ts +
    least(upper_col seconds, upper)``]: the constant ``upper`` stays in
    the join condition as a HARD CAP, because Spark derives stream-stream
    state-eviction watermarks only from constant-interval conjuncts — a
    purely column-valued bound would buffer both sides forever. (This is
    how a dynamic-bound stream join must be written on any watermark
    engine, not a Spark quirk: state needs a data-independent bound.)
    Rows whose ``upper_col`` is null match nothing (null predicate) —
    inner drops them, outer null-pads them; batch and streaming faces
    agree on this.

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
    its state is evicted. That makes ``watermark`` REQUIRED for a
    STREAM-STREAM outer interval join (Spark enforces it at analysis);
    a stream-static ``left_outer`` (streaming left, static right) needs
    none — the static side is fully known per micro-batch. Batch outer
    joins need no watermark and emit unmatched rows immediately; the two
    faces agree on every row whose interval bound the watermark has
    passed. On a FINITE stream the tail diverges by construction:
    unmatched rows within ``upper + watermark`` of the last event never
    see the watermark cross their bound, so they are never emitted —
    drain with a closing punctuation event (the q176 test does exactly
    this) before comparing against the batch relation.
    """
    if left_ts == right_ts:
        raise ValueError(
            f"left_ts and right_ts must differ (both {left_ts!r}); rename"
            " one side before joining"
        )
    if on not in left.columns or on not in right.columns:
        raise ValueError(f"join key {on!r} missing from an input")
    if left_ts not in left.columns:
        raise ValueError(f"left_ts {left_ts!r} missing from the left input")
    if right_ts not in right.columns:
        raise ValueError(f"right_ts {right_ts!r} missing from the right input")
    if upper_col is not None and upper_col not in left.columns:
        raise ValueError(
            f"upper_col {upper_col!r} missing from the left input (the"
            " dynamic bound is a LEFT-side column of seconds)"
        )
    # any OTHER shared name would silently duplicate in the output (both
    # survive the join under one name) and poison every downstream
    # reference with AMBIGUOUS_REFERENCE — refuse up front, same as the
    # left_ts == right_ts case above
    overlap = sorted((set(left.columns) & set(right.columns)) - {on})
    if overlap:
        raise ValueError(
            f"left and right share non-key column names {overlap}; rename"
            " them before joining (the output carries both sides' columns)"
        )
    if how not in ("inner", "left_outer", "full_outer"):
        raise ValueError(
            f"how must be 'inner', 'left_outer' or 'full_outer', got {how!r}"
        )
    if how in ("left_outer", "full_outer") and (
        left.isStreaming or right.isStreaming
    ):
        if left.isStreaming and right.isStreaming:
            if watermark is None:
                raise ValueError(
                    f"stream-stream {how} interval join requires a"
                    " watermark (state for unmatched rows must be"
                    " evictable)"
                )
        elif how == "full_outer":
            # stream-static full outer is unsupported by Spark outright —
            # fail here with the real reason instead of letting a
            # confusing AnalysisException surface downstream
            raise ValueError(
                "full_outer interval join needs both sides streaming (or"
                " both batch): Spark does not support stream-static full"
                " outer joins — stage the static side as a stream or use"
                " left_outer"
            )
        elif right.isStreaming:
            raise ValueError(
                "left_outer interval join with a STATIC left and"
                " STREAMING right is not supported by Spark (static rows"
                " cannot be null-padded against unbounded stream state);"
                " swap the sides or stage the stream"
            )
        # streaming left + static right left_outer: supported, no
        # watermark required
    if watermark is not None:
        left = left.withWatermark(left_ts, watermark)
        right = right.withWatermark(right_ts, watermark)
    # the key is the only shared column name (validated above) — rename
    # the right side's so the join condition and the output are
    # unambiguous; guard the synthesized name against a (pathological)
    # pre-existing column rather than silently duplicating it
    right_key = f"__{on}_r"
    if right_key in right.columns:
        raise ValueError(
            f"right input already has a column named {right_key!r} (the"
            " synthesized right-key name); rename it before joining"
        )
    right = right.withColumnRenamed(on, right_key)
    # Backtick-quoted column comparisons, not f-string SQL: interpolating
    # names into F.expr mis-resolves dotted names as struct access and
    # breaks on spaces/hyphens; only the interval literal (a grammar
    # keyword argument, validated by the parser at this very call) goes
    # through expr
    lts, rts = _lit_col(left_ts), _lit_col(right_ts)
    lo = rts > lts if strict_after else rts >= lts
    cond = (
        (_lit_col(on) == _lit_col(right_key))
        & lo
        & (rts <= lts + F.expr(f"interval {upper}"))
    )
    if upper_col is not None:
        # dynamic conjunct ON TOP of the constant cap: the cap conjunct
        # above is what Spark's state-watermark analysis reads, the
        # dynamic one tightens per-row semantics
        cond = cond & (
            rts
            <= lts
            + F.make_dt_interval(
                secs=_lit_col(upper_col).cast("double")
            )
        )
    joined = left.join(right, cond, how)
    if how == "full_outer":
        # an unmatched RIGHT row carries its key only in the renamed right
        # column — surface one unified key instead of dropping it
        joined = joined.withColumn(
            on, F.coalesce(_lit_col(on), _lit_col(right_key))
        )
    return joined.drop(right_key)
