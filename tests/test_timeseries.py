"""Semantic tests for operators/timeseries.py (q79). Oracle parity runs
in test_oracle_queries.py; these pin the gap semantics on a hand-built
series the oracle's fixture data can't isolate."""

from __future__ import annotations

import datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        [
            (u, datetime.datetime(2024, 1, 1, h, m), v)
            for u, h, m, v in rows
        ],
        "user_id long, ts timestamp, value double",
    )


def test_gap_fill_generates_missing_hours_and_forward_fills(spark):
    from franzoxide_spark.operators.timeseries import gap_fill_hourly

    # user 1: events at 00h (sum 1.5) and 03h (sum 4.0) — hours 01 and 02
    # must appear with 0 events and value_ffill carrying 1.5
    rows = [(1, 0, 10, 1.0), (1, 0, 40, 0.5), (1, 3, 5, 4.0)]
    out = sorted(
        gap_fill_hourly(_ev(spark, rows), "user_id", "ts", "value").collect(),
        key=lambda r: r["bucket_s"],
    )
    assert [r["bucket_s"][-8:] for r in out] == [
        "00:00:00", "01:00:00", "02:00:00", "03:00:00"
    ]
    assert [r["n_events"] for r in out] == [2, 0, 0, 1]
    assert out[0]["value_sum"] == 1.5
    assert out[1]["value_sum"] is None and out[1]["value_ffill"] == 1.5
    assert out[2]["value_ffill"] == 1.5
    assert out[3]["value_ffill"] == 4.0


def test_gap_fill_keys_do_not_bleed_into_each_other(spark):
    from franzoxide_spark.operators.timeseries import gap_fill_hourly

    # user 2 starts later: its first bucket must NOT inherit user 1's fill
    rows = [(1, 0, 0, 9.0), (1, 2, 0, 1.0), (2, 1, 0, 5.0)]
    out = gap_fill_hourly(_ev(spark, rows), "user_id", "ts", "value").collect()
    u2 = [r for r in out if r["user_id"] == 2]
    assert len(u2) == 1 and u2[0]["value_ffill"] == 5.0
    u1 = sorted(
        (r for r in out if r["user_id"] == 1), key=lambda r: r["bucket_s"]
    )
    assert [r["value_ffill"] for r in u1] == [9.0, 9.0, 1.0]
