"""Mirror of the driver's t2 gate: every registered query with an oracle is
hash-compared against DuckDB at sf0.001 (fast); set
SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 for the driver-scale check.
Queries registered without an oracle get a rows-run smoke check."""

from __future__ import annotations

import pytest

from franzoxide_spark.oracle import compare, run_oracle
from franzoxide_spark.queries import ORACLES, QUERIES, load_all

load_all()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, sf_dir):
    df = QUERIES[name](spark, sf_dir)
    if name in ORACLES:
        ok, diag = compare(df, run_oracle(ORACLES[name], sf_dir))
        assert ok, f"{name}: {diag}"
    else:
        assert df.count() >= 0  # rows-only smoke (matches driver's weak check)


def test_first_50_registry_entries_are_oracle_checked():
    """The driver records at most 50 CORRECTNESS rows from the front of
    the __spark_entry__.queries() dict. Ordering policy
    (queries/__init__.py:driver_ordering): for EVERY coverage state the
    first 50 entries must all be oracle-checked, so rotation can never
    spend a verified-window slot on a weak rows-only smoke record."""
    from franzoxide_spark.queries import DRIVER_WINDOW, driver_ordering

    states = [
        {},  # fresh repo
        {n: 3 for n in list(QUERIES)[:40]},  # partially covered
        {n: 1 for n in QUERIES},  # everything seen once
    ]
    for seen in states:
        names = driver_ordering(seen)[:DRIVER_WINDOW]
        missing = [n for n in names if n not in ORACLES]
        assert not missing, f"non-oracle entries inside the 50-window: {missing}"


def test_driver_window_rotation_policy():
    """Coverage-driven rotation contract: §2.4 pinned entries never leave
    the window, the free slots always go to the least-driver-covered
    queries, and simulating successive rounds (window -> coverage+1)
    covers the ENTIRE oracle-checked registry in ceil(pool/slots) rounds
    — robust to the registry growing between rounds, which broke the
    earlier modular-offset scheme (pool growth shifted the offset back
    onto already-covered queries)."""
    from franzoxide_spark.queries import (
        DRIVER_WINDOW,
        PINNED_CONTRACT,
        driver_ordering,
    )

    pinned = [n for n in PINNED_CONTRACT if n in QUERIES]
    assert pinned == list(PINNED_CONTRACT), "pinned contract entry missing"
    assert all(n in ORACLES for n in pinned)

    slots = DRIVER_WINDOW - len(pinned)
    pool = sorted(n for n in QUERIES
                  if n in ORACLES and n not in PINNED_CONTRACT)
    need = -(-len(pool) // slots)  # ceil
    coverage: dict[str, int] = {}
    covered: set[str] = set()
    prev_free: set[str] | None = None
    for _round in range(need):
        window = driver_ordering(coverage)[:DRIVER_WINDOW]
        assert window[: len(pinned)] == pinned
        free = set(window[len(pinned):])
        # the free slots must be exactly the least-covered entries: their
        # coverage multiset equals the lowest `slots` coverages in the pool
        got = sorted(coverage.get(n, 0) for n in free)
        want = sorted(coverage.get(n, 0) for n in pool)[: len(free)]
        assert got == want, "window skipped a less-covered query"
        if prev_free is not None and covered != set(pool):
            assert free != prev_free, "window did not rotate"
        prev_free = free
        covered |= free
        for n in window:
            coverage[n] = coverage.get(n, 0) + 1
    assert covered == set(pool), f"never-windowed: {sorted(set(pool) - covered)}"


def test_driver_window_prefers_never_seen_queries_from_real_artifacts():
    """Against the ACTUAL recorded CORRECTNESS artifacts: the free slots
    of the current window contain only queries with minimal real driver
    coverage (i.e. new operators rotate in ahead of already-verified
    ones)."""
    from franzoxide_spark.queries import (
        DRIVER_WINDOW,
        PINNED_CONTRACT,
        driver_coverage,
        driver_ordering,
    )

    cov = driver_coverage()
    window = driver_ordering()[:DRIVER_WINDOW]
    free = window[len(PINNED_CONTRACT):]
    pool = [n for n in QUERIES if n in ORACLES and n not in PINNED_CONTRACT]
    if pool:
        got = sorted(cov.get(n, 0) for n in free)
        want = sorted(cov.get(n, 0) for n in pool)[: len(free)]
        assert got == want


def test_driver_coverage_counts_only_green_rows(tmp_path, monkeypatch):
    """A driver CORRECTNESS row counts toward coverage ONLY if it is green
    (err null, no match flag false). An errored/mismatched row means the
    query still needs a verified run, so it must sort to the FRONT of the
    rotation, not behind the zero-covered pool (round-8 verdict item #1:
    q111's r7 err row deferred its fix's verification ~4 rounds)."""
    import json

    import franzoxide_spark.queries as qmod

    rows = {
        "a_green": {"rows_match": True, "schema_match": True,
                    "hash_match": True, "err": None},
        "b_err": {"rows_match": None, "schema_match": None,
                  "hash_match": None, "err": "Traceback ..."},
        "c_mismatch": {"rows_match": True, "schema_match": True,
                       "hash_match": False, "err": None},
        "d_rows_only": {"rows_match": True, "schema_match": None,
                        "hash_match": None, "err": None},
    }
    (tmp_path / "CORRECTNESS_r99.json").write_text(json.dumps(rows))
    real_glob = qmod.glob.glob
    monkeypatch.setattr(
        qmod.glob, "glob",
        lambda pat: real_glob(str(tmp_path / "CORRECTNESS_r*.json")),
    )
    cov = qmod.driver_coverage()
    assert cov.get("a_green") == 1
    assert "b_err" not in cov, "errored row must not count as coverage"
    assert "c_mismatch" not in cov, "hash-mismatch row must not count"
    assert cov.get("d_rows_only") == 1, "weak rows-only green still counts"

    # malformed artifacts must not break listing (r9 ADVICE): valid JSON
    # of the wrong shape (array), a non-dict row, and unparseable bytes
    (tmp_path / "CORRECTNESS_r98.json").write_text(json.dumps(["x", 1]))
    (tmp_path / "CORRECTNESS_r97.json").write_text(
        json.dumps({"a_green": "not-a-dict"})
    )
    (tmp_path / "CORRECTNESS_r96.json").write_text("{not json")
    cov2 = qmod.driver_coverage()
    assert cov2.get("a_green") == 1, "broken artifacts must be skipped"


def test_spark_entry_exposes_rotated_ordering():
    """__spark_entry__.queries()/oracle_sql() must agree with
    driver_ordering() — the rotation only helps if the driver-facing
    module actually serves it."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod
    from franzoxide_spark.queries import driver_ordering

    assert list(entry_mod.queries()) == driver_ordering()
    oracles = entry_mod.oracle_sql()
    assert list(oracles) == [n for n in driver_ordering() if n in ORACLES]
    assert set(entry_mod.queries()) == set(QUERIES)


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_oracle_query_schema_is_driver_canonicalizable(name, spark, sf_dir):
    """Every oracle-checked query must emit ONLY scalar column types.

    The driver's canonicalizer sorts the result as a pandas frame over
    all columns before hashing; array/map/struct cells are unhashable
    there (`TypeError: unhashable type: 'list'`) and produced r7's only
    red CORRECTNESS row (q111). Serialize nested values (array_join /
    explode) before returning — this guard keeps the rotation from ever
    surfacing another instance."""
    from pyspark.sql import types as T

    schema = QUERIES[name](spark, sf_dir).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType))
    ]
    assert not bad, (
        f"{name} emits non-scalar driver-facing columns {bad}; "
        "array_join/explode them on BOTH engines"
    )


def test_family_cohorts_enter_one_window_together():
    """FAMILY_COHORTS contract (r9 verdict item #7): at equal coverage,
    cohort members sort adjacent, so once rotation's least-covered band
    reaches them they hold driver slots in the SAME round — while never
    displacing a strictly-less-covered query. Simulated from the current
    REAL coverage state: some round within the drain horizon must contain
    all three interval-join queries at once."""
    from franzoxide_spark.queries import (
        DRIVER_WINDOW,
        FAMILY_COHORTS,
        driver_coverage,
        driver_ordering,
    )

    for cohort in FAMILY_COHORTS:
        assert all(n in QUERIES and n in ORACLES for n in cohort), cohort

    from franzoxide_spark.queries import PINNED_CONTRACT

    coverage = dict(driver_coverage())
    pool = [n for n in QUERIES if n in ORACLES and n not in PINNED_CONTRACT]
    # horizon: the rotation only has DRIVER_WINDOW - len(pinned) FREE
    # slots per round (using DRIVER_WINDOW here would under-count the
    # drain time ~3x and fail spuriously once coverage state straddles a
    # cohort across a window boundary); allow two full cycles plus slack
    slots = DRIVER_WINDOW - len(PINNED_CONTRACT)
    together_round = {cohort: None for cohort in FAMILY_COHORTS}
    for rnd in range(1, 2 * (-(-len(pool) // slots)) + 3):
        window = set(driver_ordering(coverage)[:DRIVER_WINDOW])
        for cohort in FAMILY_COHORTS:
            if together_round[cohort] is None and all(
                n in window for n in cohort
            ):
                together_round[cohort] = rnd
        for n in window:
            coverage[n] = coverage.get(n, 0) + 1
    missed = [c for c, r in together_round.items() if r is None]
    assert not missed, f"cohorts never co-windowed: {missed}"
