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
