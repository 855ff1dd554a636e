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


def test_kaplan_meier_textbook_example(spark):
    """Closed-form: 7 users — durations/censoring chosen so the
    product-limit steps are exact fractions. Churn at t=0 (1 of 7 at
    risk), t=2 (2 of the 5 with duration >= 2), t=5 (the last one at
    risk); users 5/6/99 are censored (active at the cutoff)."""
    import datetime as dt

    from franzoxide_spark.operators.timeseries import kaplan_meier_retention

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = []
    # observation end driven by user 99 at day 30 -> cutoff = day 23
    def user(uid, start_day, dur):
        rows.append((uid, base + day * start_day))
        if dur > 0:
            rows.append((uid, base + day * (start_day + dur)))

    user(1, 0, 0)    # dur 0, last day 0 < 23 -> churned at 0
    user(2, 0, 2)    # churned at 2
    user(3, 1, 2)    # churned at 2
    user(4, 0, 5)    # churned at 5? last day 5 < 23 -> churn at 5
    user(5, 21, 2)   # last day 23 -> NOT < 23 -> censored at dur 2
    user(6, 28, 2)   # last day 30 -> censored at dur 2
    rows.append((99, base + day * 30))  # sets observation end; dur 0 censored? last=30 not < 23 -> censored
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {
        r["duration_days"]: (r["n_risk"], r["n_churn"], r["survival"])
        for r in kaplan_meier_retention(ev, "user_id", "ts").collect()
    }
    # at-risk: dur0: all 7; dur2: 5 (u2,u3,u4,u5,u6); dur5: 1 (u4)
    assert got[0] == (7, 1, round(1 - 1 / 7, 6))
    s2 = (1 - 1 / 7) * (1 - 2 / 5)
    assert got[2] == (5, 2, round(s2, 6))
    assert got[5] == (1, 1, round(s2 * (1 - 1 / 1), 6))
    # survival is non-increasing in duration
    survs = [got[k][2] for k in sorted(got)]
    assert survs == sorted(survs, reverse=True)


def test_kaplan_meier_censored_users_never_drop_survival(spark):
    """All-censored corpus: no churn events -> S(t) stays exactly 1.0
    at every duration (censoring must not count as death)."""
    import datetime as dt

    from franzoxide_spark.operators.timeseries import kaplan_meier_retention

    base = dt.datetime(2024, 1, 1)
    day = dt.timedelta(days=1)
    rows = []
    for uid in range(5):
        rows.append((uid, base + day * uid))
        rows.append((uid, base + day * 30))  # everyone active at the end
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = kaplan_meier_retention(ev, "user_id", "ts").collect()
    assert all(r["survival"] == 1.0 for r in out)
    assert all(r["n_churn"] == 0 for r in out)


def test_holt_recovers_exact_linear_series(spark):
    """On a perfectly linear series x_t = 5 + 3t, Holt must converge to
    trend == 3 and forecast the true next value (after enough steps the
    level/trend lock onto the line; with integer-day data and a long
    series the 6-dp round shows the converged values)."""
    import datetime as dt

    from franzoxide_spark.operators.timeseries import holt_linear_trend

    base = dt.datetime(2024, 1, 1)
    rows = [
        (1, base + dt.timedelta(days=t), 5.0 + 3.0 * t) for t in range(60)
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    r = holt_linear_trend(ev, "user_id", "ts", "value").collect()[0]
    assert r["n_days"] == 60
    assert abs(r["trend"] - 3.0) < 1e-3
    # next true value is 5 + 3*60 = 185
    assert abs(r["forecast_next"] - 185.0) < 1e-2


def test_holt_reference_fold(spark):
    """Exact equality with a plain-Python fold of the same recurrence
    on a short irregular series."""
    import datetime as dt

    from franzoxide_spark.operators.timeseries import holt_linear_trend

    vals = [10.0, 12.0, 9.0, 20.0, 15.0]
    base = dt.datetime(2024, 1, 1)
    rows = [(7, base + dt.timedelta(days=i), v) for i, v in enumerate(vals)]
    ev = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    a, g = 0.5, 0.3
    l, b = vals[0], 0.0
    for x in vals[1:]:
        nl = a * x + (1 - a) * (l + b)
        b = g * (nl - l) + (1 - g) * b
        l = nl
    r = holt_linear_trend(ev, "user_id", "ts", "value").collect()[0]
    assert r["level"] == round(l, 6)
    assert r["trend"] == round(b, 6)
    # HALF_UP (Spark) vs banker's (Python round) can split a tie on the
    # summed forecast — tolerance, not exact, for this one
    assert abs(r["forecast_next"] - (l + b)) < 1e-6


def test_daily_acf_period_two_alternation(spark):
    """A strict high/low alternating daily series has ACF(1) ~ -1 and
    ACF(2) ~ +1 — the textbook period-2 signature."""
    import datetime as dt

    from franzoxide_spark.operators.timeseries import daily_acf

    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(30):
        n = 10 if d % 2 == 0 else 2
        for i in range(n):
            rows.append((base + dt.timedelta(days=d, minutes=i),))
    ev = spark.createDataFrame(rows, "ts timestamp")
    got = {r["lag"]: r["acf"] for r in daily_acf(ev, "ts").collect()}
    assert got[1] < -0.9 and got[2] > 0.85, got
    # a constant series yields NULL acf (zero variance), not a crash
    const = spark.createDataFrame(
        [(base + dt.timedelta(days=d),) for d in range(10)], "ts timestamp"
    )
    got_c = {r["lag"]: r["acf"] for r in daily_acf(const, "ts").collect()}
    assert all(v is None for v in got_c.values())


def test_daily_acf_gap_days_count_as_zero(spark):
    """An event-free calendar day enters the series as 0 — the weekly
    signature survives a one-day outage instead of smearing (r8 review:
    the compacted form shifted every later lag position)."""
    import datetime as dt

    from franzoxide_spark.operators.timeseries import daily_acf

    base = dt.datetime(2024, 1, 1)
    rows = []
    for d in range(28):
        if d == 9:
            continue  # outage day: NO events at all
        n = 10 if d % 2 == 0 else 2
        for i in range(n):
            rows.append((base + dt.timedelta(days=d, minutes=i),))
    ev = spark.createDataFrame(rows, "ts timestamp")
    got = {r["lag"]: r for r in daily_acf(ev, "ts").collect()}
    # 28 calendar days despite the missing one
    assert got[1]["n_days"] == 28
    # the period-2 alternation still shows: ACF(2) strongly positive,
    # ACF(1) strongly negative (the gap is one perturbed point, not a
    # wholesale phase shift)
    assert got[2]["acf"] > 0.5 and got[1]["acf"] < -0.5, got


def test_daily_acf_empty_input_emits_zero_rows_on_both_engines(spark):
    """Degenerate-case parity (r8 ADVICE): a zero-row input must yield a
    zero-row report on BOTH engines — Spark's global agg would otherwise
    keep one n_days=0 row and explode max_lag NULL-acf rows while the
    DuckDB mirror's fold over an empty dense range emits none."""
    import duckdb

    from franzoxide_spark.operators.timeseries import daily_acf, sql_daily_acf

    empty = spark.createDataFrame([], "ts timestamp")
    assert daily_acf(empty, "ts").count() == 0
    con = duckdb.connect()
    con.execute("CREATE TABLE t (ts TIMESTAMP)")
    assert len(con.execute(sql_daily_acf("t", "ts")).df()) == 0
