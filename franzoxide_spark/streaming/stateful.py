"""Custom stateful streaming operators via applyInPandasWithState.

The reference has no stateful processing at all; this is the Tier C
surface for operators the built-in windows can't express — arbitrary
per-key state evolved across micro-batches. The state store lives in the
query checkpoint, so recovery is exactly-once.

``running_counts`` is the canonical shape: per-key accumulators updated
per batch, emitting the updated snapshot each time. Real pipelines swap
the accumulator for e.g. a Bloom filter (streaming dedup beyond the
watermark), a CMS sketch, or per-user session state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "key string, n_events bigint, total double"
STATE_SCHEMA = "n bigint, total double"


def _update(key, pdf_iter, state: GroupState):
    import pandas as pd

    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdf_iter:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"key": [key[0]], "n_events": [n], "total": [total]})


DEDUP_OUTPUT_SCHEMA = "key string, member string"
DEDUP_STATE_SCHEMA = "seen array<string>"


def _dedup_update(key, pdf_iter, state: GroupState):
    import pandas as pd

    seen = set(state.get[0]) if state.exists else set()
    fresh: list[str] = []
    for pdf in pdf_iter:
        for m in pdf["member"]:
            if m not in seen:
                seen.add(m)
                fresh.append(m)
    state.update((list(seen),))
    yield pd.DataFrame({"key": [key[0]] * len(fresh), "member": fresh})


def stateful_dedup(events: DataFrame, key_col: str, member_col: str) -> DataFrame:
    """Streaming dedup with UNBOUNDED retention — emits each (key, member)
    exactly once across the whole stream, beyond any watermark horizon
    (``dropDuplicatesWithinWatermark`` forgets after the watermark passes;
    this holds per-key state in the checkpointed store forever).

    At 100 TB the exact seen-set becomes a per-key Bloom filter with the
    same update shape — swap the ``set`` for a bitarray in ``_dedup_update``
    and accept the false-positive rate; the operator contract (state in
    the store, append output of first-seen members) is identical.
    """
    keyed = events.selectExpr(
        f"cast({key_col} as string) as key", f"cast({member_col} as string) as member"
    )
    return keyed.groupBy("key").applyInPandasWithState(
        _dedup_update,
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        stateStructType=DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def running_counts(events: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Per-key running (count, sum) across micro-batches.

    ``events`` must be a streaming DataFrame; output mode 'update' emits
    one refreshed row per key per batch it appears in.
    """
    keyed = events.selectExpr(f"cast({key_col} as string) as key", f"{value_col} as value")
    return keyed.groupBy("key").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
