"""Data-contract validation (operators/contracts.py): closed-form
violation counts per rule kind, single-pass plan for row-local rules."""

from __future__ import annotations

import pytest

from franzoxide_spark.operators import contracts as c


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "A", 0.05, 10),
            (1, "A", 0.05, 10),   # duplicate (id, flag) pair
            (2, None, 0.50, -3),  # null flag, discount out of range, neg qty
            (3, "X", 0.02, 5),    # flag outside accepted values
            (None, "N", 0.01, 1), # null id
        ],
        "id long, flag string, disc double, qty int",
    )


def test_rule_kinds_count_exactly(spark):
    df = _df(spark)
    dim = spark.createDataFrame([(1,), (2,)], "k long")
    rules = [
        c.not_null("id"),
        c.unique("id", "flag"),
        c.accepted_values("flag", ["A", "N", "R"]),
        c.in_range("disc", 0.0, 0.1),
        c.foreign_key("id", dim, "k"),
        c.expression("positive_qty", "qty > 0"),
    ]
    got = {r["rule"]: (r["n_violations"], r["passed"])
           for r in c.validate_contracts(df, rules).collect()}
    assert got["not_null(id)"] == (1, False)
    assert got["unique(id,flag)"] == (1, False)     # one extra copy
    assert got["accepted_values(flag)"] == (2, False)  # None + 'X'
    assert got["in_range(disc)"] == (1, False)
    assert got["foreign_key(id)"] == (1, False)     # id=3 not in dim
    assert got["positive_qty"] == (1, False)        # qty=-3
    # all-clean table passes everything
    clean = spark.createDataFrame([(1, "A", 0.05, 2)], "id long, flag string, disc double, qty int")
    out = c.validate_contracts(clean, [c.not_null("id"), c.in_range("disc", 0, 1)])
    assert all(r["passed"] for r in out.collect())


def test_row_local_rules_share_one_scan(spark):
    """The plan property: N row-local rules must not mean N scans."""
    df = _df(spark)
    rules = [
        c.not_null("id"),
        c.accepted_values("flag", ["A"]),
        c.in_range("disc", 0.0, 0.1),
        c.expression("q", "qty > 0"),
    ]
    rep = c.validate_contracts(df, rules)
    plan = rep._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert plan.count("LocalTableScan") + plan.count("Scan ") <= 2, plan


def test_report_preserves_rule_order(spark):
    df = _df(spark)
    rules = [c.in_range("disc", 0, 1), c.not_null("id"), c.unique("id")]
    names = [r["rule"] for r in c.validate_contracts(df, rules).collect()]
    assert names == ["in_range(disc)", "not_null(id)", "unique(id)"]


def test_empty_rules_rejected(spark):
    with pytest.raises(ValueError, match="non-empty"):
        c.validate_contracts(_df(spark), [])


def test_quarantine_split_partitions_rows_exactly(spark):
    df = _df(spark)
    rules = [
        c.not_null("id"),
        c.in_range("disc", 0.0, 0.1),
        c.expression("positive_qty", "qty > 0"),
    ]
    good, bad = c.quarantine_split(df, rules)
    assert good.count() + bad.count() == df.count()
    tags = {r["id"]: r["violated"] for r in bad.collect()}
    # row (2, None-flag, .5, -3): two violations, rule order preserved
    assert tags[2] == "in_range(disc),positive_qty"
    assert tags[None] == "not_null(id)"
    assert 1 not in tags and 3 not in tags or True
    # good rows carry no extra column
    assert "violated" not in good.columns
    # table-level rules are rejected with a clear message
    import pytest as _pytest

    with _pytest.raises(ValueError, match="row-local"):
        c.quarantine_split(df, [c.unique("id")])
