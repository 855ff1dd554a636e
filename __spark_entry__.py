"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

Implementation lives in ``franzoxide_spark``; this module is a thin
re-export of its query registry.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# the driver may load this module by file path; make the sibling package
# importable regardless of the caller's cwd
_HERE = os.path.dirname(os.path.abspath(__file__))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from franzoxide_spark import queries as _q  # noqa: E402

_q.load_all()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-shaped pricing summary) on sf0.001."""
    return _q.QUERIES["q02_agg_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered by franzoxide_spark.queries.driver_ordering(): the §2.4
    contract entries are always in the driver's 50-row CORRECTNESS
    window, the remaining slots rotate per-round through the rest of the
    oracle-checked registry (so every operator earns a driver-verified
    row within a few rounds), and rows-only entries sit at the tail."""
    order = _q.driver_ordering()
    return {name: _q.QUERIES[name] for name in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted for the few
    non-SQL-expressible ops -> driver records a rows-only check)."""
    order = _q.driver_ordering()
    return {name: _q.ORACLES[name] for name in order if name in _q.ORACLES}
