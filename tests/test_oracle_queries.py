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
    """The driver records at most 50 CORRECTNESS rows in registration
    order (r01 silently cut the last 4). Ordering policy
    (queries/__init__.py:load_all): the first 50 entries must all be
    oracle-checked, so a new registration in the wrong module can never
    silently push a unique operator out of the verified window."""
    names = list(QUERIES)
    missing = [n for n in names[:50] if n not in ORACLES]
    assert not missing, f"non-oracle entries inside the 50-window: {missing}"
