"""fd_report contract pins (r17 ADVICE + VERDICT item #8).

Three degenerate-input behaviors the fused one-scan shape (r17) left
unpinned:

- empty ``pairs`` raises ``ValueError`` at entry (previously it failed
  two different ways deep inside plan construction);
- an EMPTY table yields 0 rows — the documented contract of the fused
  shape (the pre-r17 per-pair ungrouped aggregates emitted one
  null-stats row per pair; profiling an empty table is meaningless, and
  the 0-row behavior is now the pinned one);
- IEEE signed zero: ``-0.0`` and ``0.0`` in a float/double candidate
  column group TOGETHER, matching native value grouping and
  ``sql_fd_report`` (the raw string cast rendered them apart and
  inflated n_groups/violating_groups).
"""

from __future__ import annotations

import pytest

from franzoxide_spark.operators.profile import fd_report


def test_empty_pairs_raises():
    with pytest.raises(ValueError, match="pairs must be non-empty"):
        fd_report(None, [])


def test_empty_table_yields_no_rows(spark):
    df = spark.createDataFrame([], "a string, b string")
    out = fd_report(df, [("a", "b")])
    assert out.count() == 0


def test_signed_zero_groups_with_zero(spark):
    # determinant column: -0.0 and 0.0 must be ONE group. With two
    # distinct dependents under that group, the FD is violated by one
    # row (g3 = 1); if the signed zeros split, each sub-group would be
    # internally consistent and the violation silently vanishes.
    df = spark.createDataFrame(
        [(-0.0, "x"), (0.0, "y"), (1.5, "z")], "d double, s string"
    )
    row = fd_report(df, [("d", "s")]).collect()[0]
    assert row["n_groups"] == 2          # {±0.0}, {1.5}
    assert row["violating_groups"] == 1  # the merged-zero group
    assert row["g3_rows"] == 1
    assert row["holds"] is False
    # dependent side canonicalizes too
    df2 = spark.createDataFrame(
        [("k", -0.0), ("k", 0.0)], "s string, d double"
    )
    row2 = fd_report(df2, [("s", "d")]).collect()[0]
    assert row2["violating_groups"] == 0
    assert row2["holds"] is True
