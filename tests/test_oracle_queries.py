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
