"""Query registry — the engine's declared, oracle-checked surface.

Every operator the engine claims is registered here as a named query
(a callable ``(spark, sf_dir) -> DataFrame``) together with the ANSI-SQL
oracle DuckDB runs on the same fixtures. Column names are aliased
identically on both sides (the driver's compare sorts columns by name
before hashing). Queries with no SQL-expressible oracle (streaming-only /
approximate ops) register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle: str | None) -> None:
    if name in QUERIES:
        raise ValueError(f"duplicate query name {name!r}")
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def load_all() -> None:
    """Import every query module (each registers itself on import).

    Import order IS registration order, and the driver records at most 50
    CORRECTNESS rows per round in that order (r01 recorded exactly 50 of 54,
    silently cutting the last 4 registered — q26/q27/q28/q32). Ordering
    policy: the §2.4 streaming-semantics contract queries (windows_batch)
    register first, every oracle-checked query registers before any
    rows-only one, and the rows-only entries (queries/rows_only.py) sit at
    the tail — if the 50-row cap cuts anything, it cuts a weak rows-only
    smoke record (those ops carry their real verification in tests/), never
    an oracle-checked result.
    """
    from franzoxide_spark.queries import (  # noqa: F401
        windows_batch,
        relational,
        envelope,
        extras,
        llm,
        corpus,
        rows_only,
    )
