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


def _ev_id(spark, rows):
    return spark.createDataFrame(
        [
            (i, u, datetime.datetime(2024, 1, 1, h, m, s), v)
            for i, (u, h, m, s, v) in enumerate(rows)
        ],
        "event_id long, user_id long, ts timestamp, value double",
    )


def test_rolling_features_trailing_frames_and_gap(spark):
    from franzoxide_spark.operators.timeseries import rolling_time_features

    # user 0: events at 00:00:00, 00:30:00, 01:30:01 — the third is just
    # outside the first's 1h frame but inside the second's; user 1 isolates
    ev = _ev_id(
        spark,
        [
            (0, 0, 0, 0, 1.0),
            (0, 0, 30, 0, 2.0),
            (0, 1, 30, 1, 4.0),
            (1, 5, 0, 0, 8.0),
        ],
    )
    out = {
        r["event_id"]: r
        for r in rolling_time_features(
            ev, "event_id", "user_id", "ts", "value"
        ).collect()
    }
    assert out[0]["n_1h"] == 1 and out[0]["sum_1h"] == 1.0
    assert out[0]["gap_s"] is None
    assert out[1]["n_1h"] == 2 and out[1]["sum_1h"] == 3.0
    assert out[1]["gap_s"] == 1800
    # 01:30:01 - 3600s = 00:30:01 > 00:30:00 -> first event ages out of
    # the 1h frame, second stays (frame is inclusive [t-w, t])
    assert out[2]["n_1h"] == 1 and out[2]["sum_1h"] == 4.0
    assert out[2]["n_7d"] == 3 and out[2]["sum_7d"] == 7.0
    assert out[3]["n_1h"] == 1 and out[3]["gap_s"] is None


def test_rolling_features_duplicate_timestamps_share_frame(spark):
    from franzoxide_spark.operators.timeseries import rolling_time_features

    ev = _ev_id(spark, [(0, 0, 0, 0, 1.0), (0, 0, 0, 0, 2.0)])
    rows = sorted(
        rolling_time_features(
            ev, "event_id", "user_id", "ts", "value"
        ).collect(),
        key=lambda r: r["event_id"],
    )
    # RANGE frames include ALL timestamp peers for both rows
    assert [r["n_1h"] for r in rows] == [2, 2]
    assert [r["sum_1h"] for r in rows] == [3.0, 3.0]
    # lag breaks the tie on event_id: first has no predecessor, second does
    assert rows[0]["gap_s"] is None and rows[1]["gap_s"] == 0


def test_rolling_features_single_shuffle(spark):
    from franzoxide_spark.operators.timeseries import rolling_time_features

    ev = _ev_id(spark, [(0, 0, 0, 0, 1.0)])
    plan = (
        rolling_time_features(ev, "event_id", "user_id", "ts", "value")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # all three frames ride one hash-partitioning on the key
    assert plan.count("Exchange") == 1


def test_completeness_monitor_emits_and_flags_gap_days(spark):
    """A day with ZERO rows must appear (n=0) and alert against the
    trailing average — the silent-ingestion-gap case the monitor exists
    for; the first day has no trailing window and must not alert."""
    import datetime as dt

    from franzoxide_spark.operators.timeseries import completeness_monitor

    rows = []
    eid = 0
    for d in range(10):
        if d == 6:
            continue  # ingestion gap: no rows at all on day 6
        for i in range(100 if d != 8 else 10):  # day 8: 90% drop
            rows.append((eid, dt.datetime(2024, 3, 1 + d, 12, 0, i % 60)))
            eid += 1
    df = spark.createDataFrame(rows, "event_id long, ts timestamp")
    out = {r["day"]: r for r in completeness_monitor(df, "ts").collect()}
    assert len(out) == 10  # full span, gap day included
    assert out["2024-03-07"]["n_events"] == 0 and out["2024-03-07"]["alert"]
    assert out["2024-03-09"]["n_events"] == 10 and out["2024-03-09"]["alert"]
    assert not out["2024-03-01"]["alert"]  # no trailing window yet
    assert not out["2024-03-05"]["alert"]  # healthy day
