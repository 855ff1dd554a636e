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
    """Import every query module (each registers itself on import)."""
    from franzoxide_spark.queries import (  # noqa: F401
        envelope,
        extras,
        llm,
        relational,
        windows_batch,
    )
