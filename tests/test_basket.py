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


def test_null_keys_and_items_excluded_consistently(spark):
    """NULL baskets/items can never pair (the SQL mirror's a.k = b.k
    never matches NULL), so they must not leak into n_total or the
    singleton counts either — pre-r13 a NULL-key basket's pairs WERE
    counted while countDistinct skipped the basket, yielding support >
    1 and a cross-engine mismatch."""
    import duckdb
    import pandas as pd

    from franzoxide_spark.operators.basket import sql_frequent_pairs

    rows = [
        (None, "a"), (None, "b"),  # NULL basket: must not pair
        (1, "a"), (1, "b"),
        (2, "a"), (2, None),       # NULL item: must not count
    ]
    df = spark.createDataFrame(rows, "k long, it string")
    got = {
        (r["item_a"], r["item_b"]): (r["n_keys"], r["support"], r["lift"])
        for r in frequent_pairs(df, "k", "it", min_support=0.0).collect()
    }
    # only basket 1 pairs (a,b); n_total=2 (baskets 1 and 2);
    # lift = n_keys*n_total/(ca*cb) = 1*2/(2*1) = 1.0
    assert got == {("a", "b"): (1, 0.5, pytest.approx(1.0, abs=5e-7))}
    con = duckdb.connect()
    con.register(
        "t",
        pd.DataFrame(
            {"k": pd.array([r[0] for r in rows], dtype="Int64"),
             "it": [r[1] for r in rows]}
        ),
    )
    oracle = con.execute(
        sql_frequent_pairs("t", "k", "it", min_support=0.0)
    ).df()
    con.close()
    assert len(oracle) == 1
    r = oracle.iloc[0]
    assert (r["item_a"], r["item_b"], r["n_keys"]) == ("a", "b", 1)
    assert r["support"] == pytest.approx(0.5)
