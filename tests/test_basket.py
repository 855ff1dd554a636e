"""Frequent-pair mining (operators/basket.py): closed-form counts on a
hand-built basket set; DuckDB parity runs in test_oracle_queries (q141)."""

from __future__ import annotations

import pytest

from franzoxide_spark.operators.basket import frequent_pairs


def test_pairs_support_and_lift_closed_form(spark):
    # 4 baskets: {a,b}, {a,b}, {a,c}, {b}; item a in 3, b in 3, c in 1
    rows = [
        (1, "a"), (1, "b"),
        (2, "a"), (2, "b"), (2, "b"),   # repeat in-basket counts once
        (3, "a"), (3, "c"),
        (4, "b"),
    ]
    df = spark.createDataFrame(rows, "k long, it string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_keys"], r["support"], r["lift"])
        for r in frequent_pairs(df, "k", "it", min_support=0.0).collect()
    }
    # ab: 2/4 support, lift = (2*4)/(3*3); ac: 1/4, lift = (1*4)/(3*1)
    assert got[("a", "b")] == (2, 0.5, pytest.approx(8 / 9, abs=5e-7))
    assert got[("a", "c")] == (1, 0.25, pytest.approx(4 / 3, abs=5e-7))
    assert ("b", "c") not in got  # never co-occur


def test_min_support_filters(spark):
    rows = [(1, "a"), (1, "b"), (2, "a"), (2, "c"), (3, "a"), (3, "b")]
    df = spark.createDataFrame(rows, "k long, it string")
    got = {
        (r["item_a"], r["item_b"])
        for r in frequent_pairs(df, "k", "it", min_support=0.5).collect()
    }
    assert got == {("a", "b")}  # 2/3 >= 0.5; (a,c) at 1/3 is out
