"""Semantic tests for operators/stats.py (q80, q81). Oracle parity runs
in test_oracle_queries.py; these pin recovery of known ground truth —
an injected outlier and a constructed linear trend."""

from __future__ import annotations

import datetime

from franzoxide_spark.operators.stats import groupwise_ols, mad_outliers


def test_mad_flags_injected_outlier_and_resists_it(spark):
    # 11 well-behaved points around 10 plus one wild point: the outlier
    # must be counted, and (robustness) the median/MAD must stay those of
    # the clean cluster — unlike mean/stddev, which the outlier drags.
    # devs from the median (10.0): five 0s, then .1,.1,.2,.2,.3,.3 and the
    # outlier's 490 -> MAD = 0.1, threshold 3*1.4826*0.1 ~= 0.44: only the
    # wild point exceeds it
    vals = [10.0] * 5 + [9.9, 10.1, 9.8, 10.2, 9.7, 10.3] + [500.0]
    df = spark.createDataFrame(
        [("a", v) for v in vals], "event_type string, value double"
    )
    out = mad_outliers(df, "event_type", "value", n_sigmas=3.0).collect()[0]
    assert out["n"] == 12
    assert out["n_outliers"] == 1
    assert 9.0 <= out["median"] <= 11.0
    assert out["mad"] <= 1.0


def test_ols_recovers_constructed_slope(spark):
    # value = 100 + 2 per hour => slope_per_day = 48
    base = datetime.datetime(2024, 1, 2, 0, 0, 0)
    rows = [
        ("a", base + datetime.timedelta(hours=h), 100.0 + 2.0 * h)
        for h in range(24)
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    out = groupwise_ols(df, "event_type", "ts", "value").collect()[0]
    assert abs(out["slope_per_day"] - 48.0) < 1e-6
    # intercept is at the fixed 2024-01-01 epoch, one day before base
    assert abs(out["intercept"] - (100.0 - 48.0)) < 1e-6


def test_correlation_matrix_known_values(spark):
    from franzoxide_spark.operators.profile import correlation_matrix

    # y = 2x (corr +1), z = -x (corr -1 with x), w uncorrelated-ish
    rows = [(1.0, 2.0, -1.0), (2.0, 4.0, -2.0), (3.0, 6.0, -3.0), (4.0, 8.0, -4.0)]
    df = spark.createDataFrame(rows, "x double, y double, z double")
    out = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(df, ("x", "y", "z")).collect()
    }
    assert out[("x", "y")] == 1.0
    assert out[("x", "z")] == -1.0
    assert out[("y", "z")] == -1.0
    assert len(out) == 3


def test_correlation_matrix_kernels_agree_and_guard_raises(spark, sf_dir):
    """The int64 hi/lo co-moment kernel (r12) must reproduce the decimal
    kernel's 6-dp correlations on real data, and its engine-side
    overflow guard must raise loudly — not return silently-wrapped
    sums — when max|s| breaks the per-row-product bound."""
    import pytest as _pytest

    from franzoxide_spark.operators.profile import correlation_matrix
    from franzoxide_spark.tables import table

    li = table(spark, sf_dir, "lineitem")
    cols = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
    fast = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(li, cols).collect()
    }
    exact = {
        (r["col_x"], r["col_y"]): r["corr"]
        for r in correlation_matrix(li, cols, kernel="decimal").collect()
    }
    assert set(fast) == set(exact)
    for k, v in exact.items():
        # EXACTLY equal: both kernels cast the same exact integer Σxy
        # to double (the int64 kernel reconstructs it in decimal on the
        # single agg row), so not even the last bit may differ
        assert fast[k] == v, k

    # |x·10⁴| ~ 1e15 > √(2⁶³): per-row product would overflow int64.
    # Under ANSI mode (Spark 4 default) the multiply itself raises
    # ARITHMETIC_OVERFLOW before the kernel's raise_error guard runs;
    # with ANSI off the guard fires. Either way the failure is LOUD —
    # never silently-wrapped sums.
    big = spark.createDataFrame(
        [(1.0e11, 2.0e11), (2.0e11, 3.0e11)], "x double, y double"
    )
    with _pytest.raises(
        Exception, match="bounds exceeded|ARITHMETIC_OVERFLOW"
    ):
        correlation_matrix(big, ("x", "y")).collect()
    # the decimal kernel handles the same data fine
    out = correlation_matrix(big, ("x", "y"), kernel="decimal").collect()
    assert out[0]["corr"] == 1.0
    # ...including magnitudes just past 2^63, where floor(double)->LONG
    # silently SATURATED in the old decimal kernel (r12 review #2:
    # clamped values -> wrong corr with no error). scaled_int now floors
    # in the DECIMAL domain for decimal outputs, so s = 9.5e18 stays
    # exact and a perfectly-correlated pair comes back exactly 1.0.
    # (The decimal kernel's honest ceiling is the decimal(38,0) product
    # width — beyond THAT it raises loudly under ANSI, never clamps.)
    huge = spark.createDataFrame(
        [(9.5e14, 4.75e14), (1.0, 0.5), (2.0, 1.0)], "x double, y double"
    )
    out2 = correlation_matrix(huge, ("x", "y"), kernel="decimal").collect()
    assert out2[0]["corr"] == 1.0
    # NaN must be LOUD in the decimal kernel too (r13 review): NaN
    # orders above 2^53 so it takes scaled_int's wide branch, which now
    # yields NULL (never a fabricated 0) — the null-count guard then
    # sees count(value) != count(scaled) and raises instead of
    # returning a correlation computed with NaN silently dropped
    nanful = spark.createDataFrame(
        [(float("nan"), 1.0), (2.0, 1.0), (3.0, 1.5)], "x double, y double"
    )
    with _pytest.raises(Exception, match="decimal kernel overflow"):
        correlation_matrix(nanful, ("x", "y"), kernel="decimal").collect()


def test_numeric_histogram_bins_and_closed_top(spark):
    from franzoxide_spark.operators.profile import numeric_histogram

    # values 0..10, 5 bins of width 2; the max value (10) folds into the
    # last bin instead of opening bin 5
    df = spark.createDataFrame([(float(i),) for i in range(11)], "x double")
    rows = {r["bin_id"]: r for r in numeric_histogram(df, "x", bins=5).collect()}
    assert len(rows) == 5
    assert [rows[i]["n"] for i in range(5)] == [2, 2, 2, 2, 3]
    assert rows[0]["lo"] == 0.0 and rows[4]["hi"] == 10.0
    # shares are individually rounded to 6 dp before summing
    assert abs(sum(r["share"] for r in rows.values()) - 1.0) < 1e-5


def test_numeric_histogram_emits_empty_bins(spark):
    from franzoxide_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame([(0.0,), (10.0,)], "x double")
    rows = {r["bin_id"]: r["n"] for r in numeric_histogram(df, "x", bins=4).collect()}
    assert rows == {0: 1, 1: 0, 2: 0, 3: 1}


def test_numeric_histogram_constant_column(spark):
    """lo == hi used to make bin width 0 -> floor(0/0) NaN with
    engine-dependent bucketing (ADVICE r6): a constant column now puts
    every row in bin 0 with edges collapsed to [lo, lo]."""
    from franzoxide_spark.operators.profile import numeric_histogram

    df = spark.createDataFrame([(7.0,)] * 5, "x double")
    by = {r["bin_id"]: r for r in numeric_histogram(df, "x", bins=4).collect()}
    assert len(by) == 4
    assert by[0]["n"] == 5 and all(by[i]["n"] == 0 for i in (1, 2, 3))
    assert by[0]["lo"] == 7.0 and by[0]["hi"] == 7.0
    assert by[0]["share"] == 1.0


def test_numeric_histogram_empty_and_all_null(spark):
    from franzoxide_spark.operators.profile import numeric_histogram

    for data in ([], [(None,), (None,)]):
        df = spark.createDataFrame(data, "x double")
        rows = numeric_histogram(df, "x", bins=3).collect()
        assert len(rows) == 3
        assert all(
            r["n"] == 0 and r["lo"] is None and r["hi"] is None
            and r["share"] is None
            for r in rows
        )


def test_numeric_histogram_degenerate_parity_with_sql(spark):
    """Both engines must agree on the degenerate inputs too — the guard
    exists precisely because the unguarded expression diverged."""
    import duckdb

    from franzoxide_spark.operators.profile import (
        numeric_histogram,
        sql_numeric_histogram,
    )

    cases = {
        "constant": "(7.0), (7.0), (7.0)",
        "all_null": "(NULL), (NULL)",
        "empty": None,
    }
    for name, values in cases.items():
        con = duckdb.connect()
        con.execute("CREATE TABLE t (x DOUBLE)")
        if values:
            con.execute(f"INSERT INTO t VALUES {values}")
        exp = sorted(con.execute(sql_numeric_histogram("t", "x", bins=4)).fetchall())
        con.close()
        data = ([(7.0,)] * 3 if name == "constant"
                else [(None,), (None,)] if name == "all_null" else [])
        df = spark.createDataFrame(data, "x double")
        got = sorted(
            tuple(r) for r in numeric_histogram(df, "x", bins=4).collect()
        )
        assert got == exp, f"{name}: spark {got} != duckdb {exp}"


def test_q120_hll_rollup_within_error_bound(spark, sf_dir):
    """The merged weekly HLL estimate must sit within the sketch's error
    bound of the exact weekly distinct count (lgK=12 -> RSE ~1.6%; 5%
    asserted), and merging daily sketches must equal sketching the week
    directly — the mergeability property the rollup pattern rests on."""
    from pyspark.sql import functions as F

    from franzoxide_spark.queries.rows_only import q120
    from franzoxide_spark.tables import table

    est = {r["week"]: r["est_users"] for r in q120(spark, sf_dir).collect()}
    ev = table(spark, sf_dir, "events")
    exact = {
        r["week"]: r["n"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for wk, n in exact.items():
        assert abs(est[wk] - n) <= max(0.05 * n, 2), (wk, est[wk], n)
    # mergeability: union-of-daily == direct weekly sketch, estimate-exact
    direct = {
        r["week"]: r["est"]
        for r in ev.groupBy(
            F.date_format(F.date_trunc("week", "ts"), "yyyy-MM-dd").alias("week")
        )
        .agg(
            F.expr("hll_sketch_estimate(hll_sketch_agg(user_id, 12))")
            .cast("long")
            .alias("est")
        )
        .collect()
    }
    assert est == direct


def test_infer_column_types_edges(spark):
    from franzoxide_spark.operators.profile import infer_column_types

    df = spark.createDataFrame(
        [
            ("1", "x", None),
            ("2", "2.5", None),
            ("-3", "true", None),
            ("4", "2024-01-01", None),
        ],
        "ints string, mixed string, empty string",
    )
    out = {r["col_name"]: r for r in
           infer_column_types(df, ["ints", "mixed", "empty"]).collect()}
    assert out["ints"]["suggested_type"] == "bigint"
    assert out["ints"]["frac_int"] == 1.0
    # mixed column crosses no 99% threshold -> string
    assert out["mixed"]["suggested_type"] == "string"
    # all-null column: no evidence, stays string
    assert out["empty"]["n_values"] == 0
    assert out["empty"]["suggested_type"] == "string"
    # '87.0' is double-shaped, NOT int-shaped (the cross-engine contract)
    d2 = spark.createDataFrame([("87.0",), ("1.5",)], "v string")
    o2 = infer_column_types(d2, ["v"]).collect()[0]
    assert o2["frac_int"] == 0.0 and o2["suggested_type"] == "double"
    # a bare year is NOT date-shaped (r12 sf0.1 sweep: Spark's try_cast
    # accepts '2024' -> 2024-01-01 while DuckDB nulls it, so 4-digit
    # numeric ids inflated frac_date on one engine only; the full
    # yyyy-MM-dd shape guard pins the cross-engine contract)
    d3 = spark.createDataFrame(
        [("2024",), ("2024-06",), ("2024-06-15",), ("9999",)], "v string"
    )
    o3 = infer_column_types(d3, ["v"]).collect()[0]
    assert o3["frac_date"] == 0.25  # only the full ISO rendering counts


def test_welch_report_matches_textbook(spark):
    """q145's Welch t/df against a plain-Python computation on the same
    scale-4-rounded values (the dec() fixed point both engines share)."""
    import math

    from franzoxide_spark.queries import QUERIES, load_all

    load_all()
    # tiny deterministic sample mirroring the fixture layout
    rows = [(i, float(f"{(i * 37 % 100) / 7:.4f}")) for i in range(1, 41)]
    a = [v for u, v in rows if u % 2 == 0]
    b = [v for u, v in rows if u % 2 != 0]

    def stats(x):
        n = len(x)
        m = sum(x) / n
        var = (sum(v * v for v in x) - sum(x) ** 2 / n) / (n - 1)
        return n, m, var

    na, ma, va = stats(a)
    nb, mb, vb = stats(b)
    qa, qb = va / na, vb / nb
    t_ref = (ma - mb) / math.sqrt(qa + qb)
    df_ref = (qa + qb) ** 2 / (qa * qa / (na - 1) + qb * qb / (nb - 1))

    import pandas as pd
    import os, tempfile
    with tempfile.TemporaryDirectory() as d:
        pdf = pd.DataFrame(
            {
                "event_id": range(len(rows)),
                "ts": pd.Timestamp("2024-01-01"),
                "user_id": [u for u, _ in rows],
                "event_type": "view",
                "value": [v for _, v in rows],
                "props": "{}",
            }
        )
        pdf.to_parquet(os.path.join(d, "events.parquet"))
        got = QUERIES["q145_ab_welch_report"](spark, d).collect()[0]
    assert got["n_a"] == na and got["n_b"] == nb
    assert abs(got["welch_t"] - t_ref) < 1e-5
    assert abs(got["welch_df"] - df_ref) < 1e-4


def test_ab_srm_balanced_and_broken_randomizer(spark):
    """Closed-form SRM: a hash-balanced population stays quiet; a
    logging path that drops most of one arm alarms."""
    from franzoxide_spark.operators.stats import ab_srm_check

    rows = [("g", i) for i in range(2000)]
    ev = spark.createDataFrame(rows, "event_type string, user_id long")
    ok = ab_srm_check(ev, "user_id", "event_type").collect()[0]
    assert ok["n_treat"] + ok["n_control"] == 2000
    assert not ok["srm_alarm"], ok  # hash split is ~50/50
    # simulate arm-biased logging: keep only ~10% of treatment rows
    from franzoxide_spark.functions.text import hash60
    from pyspark.sql import functions as F

    arm = F.pmod(hash60(F.concat(F.lit("exp1:"), F.col("user_id"))), 100) < 50
    biased = ev.filter(~arm | (F.col("user_id") % 10 == 0))
    bad = ab_srm_check(biased, "user_id", "event_type").collect()[0]
    assert bad["srm_alarm"] and bad["chi2"] > 100


def test_ab_srm_assignment_is_unit_deterministic(spark):
    """The same unit lands in the same arm regardless of how many event
    rows it has (distinct-unit counting, hash assignment)."""
    from franzoxide_spark.operators.stats import ab_srm_check

    once = spark.createDataFrame(
        [("g", i) for i in range(500)], "event_type string, user_id long"
    )
    thrice = spark.createDataFrame(
        [("g", i) for _ in range(3) for i in range(500)],
        "event_type string, user_id long",
    )
    a = ab_srm_check(once, "user_id", "event_type").collect()[0]
    b = ab_srm_check(thrice, "user_id", "event_type").collect()[0]
    assert (a["n_treat"], a["n_control"]) == (b["n_treat"], b["n_control"])


def test_benford_log_uniform_quiet_uniform_alarms(spark):
    """Log-uniform magnitudes follow Benford (no alarm); uniformly
    distributed 3-digit values have a flat first-digit histogram and
    must trip the chi-square flag."""
    from franzoxide_spark.operators.stats import benford_audit

    log_uniform = [("b", 10 ** (i / 300.0)) for i in range(900)]  # 3 decades
    uniform = [("u", float(100 + i)) for i in range(900)]
    df = spark.createDataFrame(log_uniform + uniform, "g string, v double")
    got = {r["g"]: r for r in benford_audit(df, "v", "g").collect()}
    assert got["b"]["n_values"] == 900 and not got["b"]["benford_alarm"], got["b"]
    assert got["u"]["benford_alarm"] and got["u"]["chi2"] > 100


def test_benford_first_digit_extraction_edge_cases(spark):
    """Sub-1 magnitudes, negatives, and exact powers of ten all yield
    the correct first significant digit; zeros/nulls are excluded."""
    from franzoxide_spark.operators.stats import benford_audit

    rows = [("g", v) for v in [0.00456, -78.0, 0.1, 1000.0, 9.99, 0.0, None]]
    df = spark.createDataFrame(rows, "g string, v double")
    r = benford_audit(df, "v", "g").collect()[0]
    assert r["n_values"] == 5  # zero and null excluded


def test_gini_closed_forms(spark):
    """Exact Gini values: all-equal -> 0; one-holder among n zeros ->
    (n-1)/n; arithmetic sequence 1..n -> (n-1)/(3n) (textbook)."""
    from franzoxide_spark.operators.stats import gini_concentration

    rows = (
        [("eq", 5.0)] * 10
        + [("one", 0.0)] * 9 + [("one", 100.0)]
        + [("seq", float(i)) for i in range(1, 11)]
    )
    df = spark.createDataFrame(rows, "g string, v double")
    got = {r["g"]: r for r in gini_concentration(df, "v", "g").collect()}
    assert got["eq"]["gini"] == 0.0
    assert got["one"]["gini"] == round(9 / 10, 6)
    assert got["one"]["top1pct_share"] == 1.0  # the single holder is the top 1%
    assert got["seq"]["gini"] == round(9 / 30, 6)


def test_correlation_guard_catches_negative_clamp_with_ansi_off(spark):
    """r12 review: with ANSI off, a huge NEGATIVE outlier clamps the
    scaled value to Long.MIN and abs(Long.MIN) wraps negative — the
    magnitude guard must still fire (it derives M from max/min cast to
    double, never integer abs), raising loudly instead of returning
    silently-wrapped correlations."""
    import pytest as _pytest

    from franzoxide_spark.operators.profile import correlation_matrix

    prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "false")
    try:
        big = spark.createDataFrame(
            [(-1.0e20, 2.0), (1.0, 3.0), (2.0, 5.0)], "x double, y double"
        )
        with _pytest.raises(Exception, match="bounds exceeded"):
            correlation_matrix(big, ("x", "y")).collect()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", prev)

    with _pytest.raises(ValueError, match="at least 2"):
        correlation_matrix(big, ())
    with _pytest.raises(ValueError, match="at least 2"):
        correlation_matrix(big, ("x",))


def test_benford_excludes_out_of_domain_magnitudes_symmetrically(spark):
    """r12 review: |x| >= 9e12 is outside the quantized-digit domain —
    excluded on BOTH engines (n_values reflects it) instead of an ANSI
    abort on legit large inputs."""
    from franzoxide_spark.operators.stats import benford_audit

    rows = [(1.0e13, "g"), (2.0e15, "g")] + [
        (float(10 + i), "g") for i in range(20)
    ]
    df = spark.createDataFrame(rows, "v double, g string")
    out = benford_audit(df, "v", "g").collect()
    assert out[0]["n_values"] == 20  # the two >= 9e12 rows are excluded


def test_profile_numeric_long_scaled_means_match_decimal_reference(spark, sf_dir):
    """r17: profile_numeric's means accumulate as scaled BIGINT sums and
    lift to decimal on the final row. Pin identity with the per-row
    exact-decimal reference on the real fixture, plus a null/negative
    hand corpus (the half-up quantization tie cases)."""
    from pyspark.sql import functions as F

    from franzoxide_spark.functions.numeric import dec
    from franzoxide_spark.operators.profile import profile_numeric
    from franzoxide_spark.tables import table

    def ref_means(df, cols):
        aggs = []
        for c in cols:
            aggs.append(
                F.round(
                    F.sum(dec(F.col(c))).cast("double") / F.count(c), 6
                ).alias(c)
            )
        return df.agg(*aggs).collect()[0].asDict()

    li = table(spark, sf_dir, "lineitem")
    cols = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
    got = {
        r["col_name"]: r["mean_val"]
        for r in profile_numeric(li, cols).collect()
    }
    assert got == ref_means(li, cols)

    hand = spark.createDataFrame(
        [(0.00005,), (-0.00005,), (None,), (1.23455,), (-2.5,)], "x double"
    )
    got_h = {
        r["col_name"]: r["mean_val"] for r in profile_numeric(hand, ["x"]).collect()
    }
    assert got_h == ref_means(hand, ["x"])
