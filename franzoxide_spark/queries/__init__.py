"""Query registry — the engine's declared, oracle-checked surface.

Every operator the engine claims is registered here as a named query
(a callable ``(spark, sf_dir) -> DataFrame``) together with the ANSI-SQL
oracle DuckDB runs on the same fixtures. Column names are aliased
identically on both sides (the driver's compare sorts columns by name
before hashing). Queries with no SQL-expressible oracle (streaming-only /
approximate ops) register with ``oracle=None`` and get a rows-only check.
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}

# The driver records at most this many CORRECTNESS rows per round, taken
# from the FRONT of the dict __spark_entry__.queries() returns.
DRIVER_WINDOW = 50

# §2.4 contract queries (SURVEY Tier C, Q01-Q32 plus the ops-tool and
# envelope-audit rows that share their modules): ALWAYS inside the driver
# window, every round — the declared query contract never rotates out.
PINNED_CONTRACT = (
    "q25_tumbling_window",
    "q26_sliding_window",
    "q27_session_window",
    "q28_dedup_keys",
    "q32_stream_static_join",
    "q01_scan_filter_project",
    "q02_agg_pricing_summary",
    "q03_join_agg_mktsegment",
    "q04_multijoin_topn",
    "q05_broadcast_dim_chain",
    "q06_semi_join_exists",
    "q07_anti_join_not_exists",
    "q08_left_join_null_agg",
    "q09_range_theta_join",
    "q10_distinct_exact",
    "q11_rollup_cube_gsets",
    "q13_window_rank_lag_lead",
    "q15_window_running_sum",
    "q16_global_sort_limit",
    "q17_set_ops",
    "q18_string_date_functions",
    "q20_math_conditional",
    "q21_array_functions",
    "q22_json_extract_agg",
    "q104_table_checksum",
    "q106_output_layout_plan",
    "q108_join_size_estimate",
    "q23_envelope_encode",
    "q24_time_partition_derive",
    "q107_envelope_branch_audit",
    "q29_exact_dedup",
    "q30_topk_cosine_exact",
    "q31_text_stats_median",
)


# Queries that share non-trivial machinery and should be driver-verified
# TOGETHER once rotation reaches them (r9 verdict item #7: the interval
# join family's batch faces are oracle-checked individually, but a shared
# regression in streaming/joins.py state machinery would only surface in
# tests unless all three hold driver slots in the same round). Members of
# a cohort tie-break by the cohort's FIRST name, so at equal coverage
# they sort adjacent and enter one window together — without ever
# jumping the least-covered-first queue (individual coverage still leads
# the sort key, so a cohort never displaces a less-covered query).
FAMILY_COHORTS: tuple[tuple[str, ...], ...] = (
    (
        "q114_interval_join_attribution",
        "q163_interval_join_outer_conversion",
        "q176_interval_join_full_reconcile",
    ),
)
_COHORT_ANCHOR: dict[str, str] = {
    name: cohort[0] for cohort in FAMILY_COHORTS for name in cohort
}


def driver_coverage() -> dict[str, int]:
    """How many GREEN driver CORRECTNESS rows each query has earned so
    far, read from the recorded CORRECTNESS_r*.json artifacts at the repo
    root (the running round's file is written AFTER verify, so at verify
    time this reflects exactly the previous rounds).

    Only green rows count (err is null and no match flag is false): an
    errored or mismatched row is evidence the query NEEDS re-verification,
    not that it was covered — counting it would park a broken query behind
    the whole zero-covered pool for rounds (round-8 verdict item #1, where
    q111's r7 err row did exactly that)."""
    import json

    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    counts: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        try:
            with open(path) as f:
                rows = json.load(f)
        except (OSError, ValueError):
            continue  # a malformed artifact must not break query listing
        if not isinstance(rows, dict):
            continue  # valid JSON, wrong shape (e.g. an array) — same deal
        for name, row in rows.items():
            if not isinstance(row, dict):
                continue
            green = row.get("err") is None and all(
                row.get(k) is not False
                for k in ("rows_match", "schema_match", "hash_match")
            )
            if green:
                counts[name] = counts.get(name, 0) + 1
    return counts


def driver_ordering(seen_counts: dict[str, int] | None = None) -> list[str]:
    """Driver-facing query order (what __spark_entry__.queries() returns).

    The driver verifies only the first DRIVER_WINDOW entries, so with a
    fixed order the oracle-checked tail beyond slot 50 would NEVER earn a
    driver CORRECTNESS row (round-6 verdict gap #1). Policy:

    1. the §2.4 contract entries (PINNED_CONTRACT) occupy the front of the
       window every round;
    2. the remaining window slots go to the LEAST-driver-covered
       oracle-checked queries first (coverage read from the recorded
       CORRECTNESS artifacts; ties broken by name) — self-balancing even
       as the registry grows between rounds, unlike a modular rotation
       whose offset shifts when the pool size changes;
    3. the not-currently-windowed oracle-checked queries follow (they stay
       verified every round by tests/test_oracle_queries.py — the same
       hash-compare, self-administered);
    4. rows-only entries sit at the tail so the window never spends a slot
       on a weak rows-only smoke record.
    """
    if seen_counts is None:
        seen_counts = driver_coverage()
    pinned = [n for n in PINNED_CONTRACT if n in QUERIES]
    pool = sorted(
        (n for n in QUERIES if n in ORACLES and n not in PINNED_CONTRACT),
        key=lambda n: (
            seen_counts.get(n, 0), _COHORT_ANCHOR.get(n, n), n,
        ),
    )
    rows_only = [n for n in QUERIES if n not in ORACLES]
    return pinned + pool + rows_only


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
