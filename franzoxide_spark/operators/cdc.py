"""Change-data-capture apply: materialize a table from a changelog.

The Debezium/binlog shape: a stream of (key, op I/U/D, seq, payload)
rows; the table state is, per key, the payload of the HIGHEST-sequence
op — unless that op is a delete. One window rank per key (single key
shuffle), a filter, done; idempotent over replays (reapplying the same
changelog yields the same state), which is what makes the op safe to
run from a checkpointed stream.

Ties on (key, seq) are broken by op precedence (D > U > I at the same
sequence — a delete co-sequenced with an update must win or replays
resurrect rows) and documented as such.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_OP_RANK = "CASE op WHEN 'D' THEN 3 WHEN 'U' THEN 2 WHEN 'I' THEN 1 ELSE 0 END"


def cdc_apply(
    changelog: DataFrame,
    key_col: str,
    seq_col: str,
    op_col: str = "op",
) -> DataFrame:
    """Latest surviving row per key: highest (seq, op-precedence) wins;
    keys whose winner is a delete are absent from the output. Returns the
    changelog's payload columns (op/seq/rank dropped)."""
    # malformed events (NULL or unrecognized op) are dropped BEFORE the
    # rank: a NULL-op row would otherwise win the rank at the highest
    # seq and then fail the `op != 'D'` filter as NULL — silently
    # ERASING the key (including its earlier valid state) from the
    # materialized table (r13 review). Filtering first keeps the last
    # VALID state; the SQL mirror applies the identical pre-filter.
    clean = changelog.filter(F.col(op_col).isin("I", "U", "D"))
    w = Window.partitionBy(key_col).orderBy(
        F.col(seq_col).desc(), F.expr(_OP_RANK.replace("op", op_col)).desc()
    )
    ranked = clean.withColumn("__rn", F.row_number().over(w))
    latest = ranked.filter(F.col("__rn") == 1).drop("__rn")
    return latest.filter(F.col(op_col) != "D").drop(op_col, seq_col)


def sql_cdc_apply(
    changelog_rel: str,
    key_col: str,
    seq_col: str,
    payload_cols: list[str],
    op_col: str = "op",
) -> str:
    """DuckDB mirror; ``payload_cols`` spelled out (SQL needs the list)."""
    rank = _OP_RANK.replace("op", op_col)
    cols = ", ".join([key_col] + payload_cols)
    return f"""
WITH ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY {key_col}
    ORDER BY {seq_col} DESC, {rank} DESC
  ) AS rn
  FROM {changelog_rel}
  WHERE {op_col} IN ('I', 'U', 'D')
)
SELECT {cols} FROM ranked WHERE rn = 1 AND {op_col} <> 'D'
"""
