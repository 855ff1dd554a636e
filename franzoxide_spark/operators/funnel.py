"""Ordered funnel analysis over an event stream.

Tier-C analytics the reference connector (src/s3.rs — transport only, no
query surface) does not have: for each user, walk an ordered stage list
(e.g. view → click → purchase) and record the first time each stage was
reached STRICTLY AFTER the previous one — the standard product-analytics
funnel, and the event-sequence shape a behavioral training pipeline uses
to build positive/negative examples.

Scale shape: one shuffle on the user key; every stage after that is a
chained whole-partition window min over the SAME partitioning (Catalyst
plans one Exchange + N Window nodes, no re-shuffle, no sort — unbounded
frames need no ordering), then a per-user aggregate that is co-partitioned
too. No joins, no Python. Skewed users are one partition's worth of rows
each — AQE's skew handling applies as usual.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: Sequence[str],
) -> DataFrame:
    """Per-user funnel: (user, stage1_ts, ..., stageN_ts, stage_reached).

    ``stage{i}_ts`` is the first ``ts`` of stage i strictly after
    ``stage{i-1}_ts`` (first occurrence overall for stage 1); null once
    the chain breaks. ``stage_reached`` counts completed stages.
    """
    w = Window.partitionBy(user_col)
    df = events.select(user_col, type_col, ts_col)
    prev: F.Column | None = None
    names = []
    for i, stage in enumerate(stages, start=1):
        cond = F.col(type_col) == stage
        if prev is not None:
            cond = cond & (F.col(ts_col) > prev) & prev.isNotNull()
        name = f"stage{i}_ts"
        df = df.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev = F.col(name)
        names.append(name)
    return (
        df.groupBy(user_col)
        .agg(*[F.min(n).alias(n) for n in names])
        .select(
            user_col,
            *names,
            sum(
                (F.when(F.col(n).isNotNull(), 1).otherwise(0) for n in names),
                start=F.lit(0),
            )
            .cast("int")
            .alias("stage_reached"),
        )
    )


def sql_funnel(
    table: str,
    user_col: str,
    type_col: str,
    ts_col: str,
    stages: Sequence[str],
) -> str:
    """DuckDB mirror: the same chained window mins via nested selects."""
    inner = f"SELECT {user_col}, {type_col}, {ts_col} FROM {table}"
    names = []
    for i, stage in enumerate(stages, start=1):
        name = f"stage{i}_ts"
        cond = f"{type_col} = '{stage}'"
        if names:
            prev = names[-1]
            cond += f" AND {ts_col} > {prev} AND {prev} IS NOT NULL"
        inner = (
            f"SELECT *, MIN(CASE WHEN {cond} THEN {ts_col} END)"
            f" OVER (PARTITION BY {user_col}) AS {name} FROM ({inner})"
        )
        names.append(name)
    mins = ", ".join(f"MIN({n}) AS {n}" for n in names)
    reach = " + ".join(
        f"(CASE WHEN MIN({n}) IS NOT NULL THEN 1 ELSE 0 END)" for n in names
    )
    return (
        f"SELECT {user_col}, {mins}, CAST({reach} AS INT) AS stage_reached"
        f" FROM ({inner}) GROUP BY {user_col}"
    )
