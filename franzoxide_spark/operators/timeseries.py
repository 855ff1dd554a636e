"""Time-series regularization: gap filling + forward fill.

Tier-C analytics (SURVEY.md §2.3) the reference connector has no
counterpart for: downstream consumers of an event stream (dashboards,
feature pipelines, anomaly detectors) want a REGULAR series per key —
every bucket present, missing buckets carrying the last observed value.
Spark has no native gap-fill; the composition below is the idiomatic
one: per-key bounds → ``sequence()`` explode generates the missing
buckets → left join the observed aggregates → ``last(ignorenulls)``
window forward-fills.

Scale shape: aggregation and join are both keyed on (key, bucket) —
co-partitioned, partial-aggregated; the bounds table is one row per key;
the generated series is bounded by each key's time span over the bucket
width (a key spanning years at minute buckets fans out accordingly —
pick the bucket for the retention window, same rule as any rollup). The
forward-fill window sorts only within a key's own buckets. Observed
sums go through the exact-decimal path so the cross-engine compare is
accumulation-order-proof.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import dec, sql_dec

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


def gap_fill_hourly(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key hourly series from the key's first to last bucket:
    (key, bucket_s, n_events, value_sum, value_ffill) where missing hours
    have n_events = 0, a null value_sum, and value_ffill carrying the
    last observed hourly sum forward."""
    hourly = events.groupBy(
        F.col(key_col), F.date_trunc("hour", F.col(ts_col)).alias("__h")
    ).agg(
        F.count("*").alias("n_events"),
        F.round(F.sum(dec(F.col(value_col))).cast("double"), 6).alias(
            "value_sum"
        ),
    )
    # One key-partition window over the OBSERVED hourly buckets computes
    # both the forward-fill anchor and the gap to the next observed hour;
    # exploding that gap emits the missing buckets map-side. Each filled
    # bucket inherits its anchor's running last-non-null sum — exactly
    # what a join-then-window over the densified series would produce,
    # but the window sorts |observed buckets| rows (~95k at sf0.1), not
    # the full series (~1M), and the series-sized left join disappears.
    # Measured 1.54 s -> 0.72 s at sf0.1 under the bench protocol,
    # identical output (same-session min-of-5 A/B; an earlier comparison
    # that kept the old shape was skewed by warm shuffle files).
    w = Window.partitionBy(key_col).orderBy("__h")
    wcum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    step = hourly.select(
        key_col,
        "__h",
        "n_events",
        "value_sum",
        F.last("value_sum", ignorenulls=True).over(wcum).alias("__ff"),
        F.lead("__h").over(w).alias("__nxt"),
    )
    return step.select(
        key_col,
        "__h",
        "n_events",
        "value_sum",
        "__ff",
        F.explode(
            F.expr(
                "sequence(__h, coalesce(__nxt - interval 1 hour, __h),"
                " interval 1 hour)"
            )
        ).alias("__b"),
    ).select(
        key_col,
        F.date_format("__b", _TS_FMT).alias("bucket_s"),
        F.when(F.col("__b") == F.col("__h"), F.col("n_events"))
        .otherwise(0)
        .cast("int")
        .alias("n_events"),
        F.when(F.col("__b") == F.col("__h"), F.col("value_sum")).alias(
            "value_sum"
        ),
        F.col("__ff").alias("value_ffill"),
    )


def sql_gap_fill_hourly(
    table: str, key_col: str, ts_col: str, value_col: str
) -> str:
    return f"""
WITH hourly AS (
  SELECT {key_col}, date_trunc('hour', {ts_col}) AS h,
         COUNT(*) AS n_events,
         ROUND(CAST(SUM({sql_dec(value_col)}) AS DOUBLE), 6) AS value_sum
  FROM {table} GROUP BY {key_col}, date_trunc('hour', {ts_col})
),
bounds AS (
  SELECT {key_col}, MIN(h) AS lo, MAX(h) AS hi FROM hourly GROUP BY {key_col}
),
series AS (
  SELECT {key_col}, UNNEST(generate_series(lo, hi, INTERVAL 1 HOUR)) AS h
  FROM bounds
)
SELECT f.{key_col},
       strftime(f.h, '%Y-%m-%d %H:%M:%S') AS bucket_s,
       CAST(COALESCE(n_events, 0) AS INT) AS n_events,
       value_sum,
       last_value(value_sum IGNORE NULLS) OVER (
         PARTITION BY f.{key_col} ORDER BY f.h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
       ) AS value_ffill
FROM series f LEFT JOIN hourly o ON f.{key_col} = o.{key_col} AND f.h = o.h
"""


# --------------------------------------------------------------------------
# rolling time-range features (trailing-window aggregates per key)
# --------------------------------------------------------------------------


def rolling_time_features(
    events: DataFrame,
    id_col: str,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-event trailing-window features: for every event, the count and
    exact value sum over the key's trailing 7 days and trailing hour
    (RANGE frames — inclusive [t-w, t], tie rows with equal timestamps
    all share one frame, so the result is deterministic under duplicate
    timestamps), plus seconds since the key's previous event.

    This is the feature-store shape (``user_7d_event_count`` etc.) that
    a point-in-time-correct training pipeline derives from an event log.

    Scale shape: ONE shuffle on the key (verified: 1 Exchange in the
    executed plan); both RANGE frames share one (key, epoch) sort and
    the tie-broken lag frame adds only a partition-local re-sort, no
    second shuffle. Sums go through the exact-decimal
    path (functions/numeric.py) so trailing sums cannot flap on
    accumulation order. The lag frame breaks timestamp ties on the event
    id for a total order both engines agree on.
    """
    ep = F.col(ts_col).cast("long")
    base = events.select(
        id_col,
        key_col,
        ep.alias("__ep"),
        dec(F.col(value_col)).alias("__v"),
    )
    w7 = Window.partitionBy(key_col).orderBy("__ep").rangeBetween(-604800, 0)
    w1 = Window.partitionBy(key_col).orderBy("__ep").rangeBetween(-3600, 0)
    wl = Window.partitionBy(key_col).orderBy("__ep", id_col)
    return base.select(
        id_col,
        key_col,
        F.col("__ep").alias("epoch_s"),
        F.count("*").over(w7).cast("int").alias("n_7d"),
        F.round(F.sum("__v").over(w7).cast("double"), 6).alias("sum_7d"),
        F.count("*").over(w1).cast("int").alias("n_1h"),
        F.round(F.sum("__v").over(w1).cast("double"), 6).alias("sum_1h"),
        (F.col("__ep") - F.lag("__ep").over(wl)).cast("int").alias("gap_s"),
    )


def sql_rolling_time_features(
    table: str, id_col: str, key_col: str, ts_col: str, value_col: str
) -> str:
    return f"""
WITH base AS (
  SELECT {id_col}, {key_col},
         -- FLOOR before the cast: duckdb's epoch() keeps fractional
         -- seconds and CAST(double AS BIGINT) rounds-to-nearest, while
         -- Spark's timestamp->long cast truncates
         CAST(FLOOR(epoch({ts_col})) AS BIGINT) AS epoch_s,
         {sql_dec(value_col)} AS v
  FROM {table}
)
SELECT {id_col}, {key_col}, epoch_s,
       CAST(COUNT(*) OVER w7 AS INT) AS n_7d,
       ROUND(CAST(SUM(v) OVER w7 AS DOUBLE), 6) AS sum_7d,
       CAST(COUNT(*) OVER w1 AS INT) AS n_1h,
       ROUND(CAST(SUM(v) OVER w1 AS DOUBLE), 6) AS sum_1h,
       CAST(epoch_s - LAG(epoch_s) OVER wl AS INT) AS gap_s
FROM base
WINDOW
  w7 AS (PARTITION BY {key_col} ORDER BY epoch_s
         RANGE BETWEEN 604800 PRECEDING AND CURRENT ROW),
  w1 AS (PARTITION BY {key_col} ORDER BY epoch_s
         RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW),
  wl AS (PARTITION BY {key_col} ORDER BY epoch_s, {id_col})
"""


def with_session_index(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    id_col: str,
    gap_s: int = 1800,
) -> DataFrame:
    """Gap sessionization marker: the input plus a per-key
    ``session_idx`` (1-based, ordered by (ts, id)) where a new session
    starts whenever the gap to the key's previous event exceeds
    ``gap_s``. The single shared implementation behind q74's session
    sequences and the behavioral-features example — one key shuffle,
    lag + running sum over the same sort."""
    wo = Window.partitionBy(key_col).orderBy(ts_col, id_col)
    gap = F.col(ts_col).cast("long") - F.lag(
        F.col(ts_col).cast("long")
    ).over(wo)
    marked = events.withColumn(
        "__new", F.when(gap.isNull() | (gap > gap_s), 1).otherwise(0)
    )
    return marked.withColumn("session_idx", F.sum("__new").over(wo)).drop(
        "__new"
    )


def completeness_monitor(
    events: DataFrame,
    ts_col: str = "ts",
    trailing_days: int = 7,
    drop_factor: float = 0.5,
) -> DataFrame:
    """Ingestion-gap monitor: per-day row counts over the table's full
    date span — MISSING days emitted with n=0, which is precisely the
    alert case a groupBy alone silently hides — compared to the trailing
    ``trailing_days`` average; ``alert`` when the day falls below
    ``drop_factor`` x that average (on the 4-dp-rounded average so both
    engines cut identically).

    Scale shape: the corpus aggregates once into a day-bounded series
    (map-side combine); everything after lives on ~rows = span-in-days,
    bounded by TIME not data volume, so the single-partition window over
    it is a non-issue at any corpus scale.
    """
    daily = events.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("__d")
    ).agg(F.count(F.lit(1)).alias("n_events"))
    bounds = daily.agg(
        F.min("__d").alias("__lo"), F.max("__d").alias("__hi")
    )
    full = bounds.select(
        F.explode(F.expr("sequence(__lo, __hi, interval 1 day)")).alias("__d")
    )
    series = full.join(daily, "__d", "left").select(
        "__d", F.coalesce("n_events", F.lit(0)).alias("n_events")
    )
    w = (
        Window.orderBy("__d").rowsBetween(-trailing_days, -1)
    )
    trail = F.round(F.avg("n_events").over(w), 4)
    return series.select(
        F.date_format("__d", "yyyy-MM-dd").alias("day"),
        F.col("n_events").cast("bigint").alias("n_events"),
        trail.alias("trailing_avg"),
        F.when(
            trail.isNotNull(),
            F.col("n_events").cast("double") < F.lit(drop_factor) * trail,
        ).otherwise(F.lit(False)).alias("alert"),
    )


def sql_completeness_monitor(
    table: str, ts_col: str = "ts", trailing_days: int = 7,
    drop_factor: float = 0.5,
) -> str:
    return f"""
WITH daily AS (
  SELECT date_trunc('day', {ts_col}) AS d, COUNT(*) AS n_events
  FROM {table} GROUP BY 1
),
bounds AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM daily),
grid AS (
  SELECT UNNEST(generate_series(lo, hi, INTERVAL 1 DAY)) AS d FROM bounds
),
series AS (
  SELECT g.d, COALESCE(daily.n_events, 0) AS n_events
  FROM grid g LEFT JOIN daily ON daily.d = g.d
),
win AS (
  SELECT d, n_events,
         ROUND(AVG(n_events) OVER (
           ORDER BY d ROWS BETWEEN {trailing_days} PRECEDING AND 1 PRECEDING
         ), 4) AS trailing_avg
  FROM series
)
SELECT strftime(d, '%Y-%m-%d') AS day,
       CAST(n_events AS BIGINT) AS n_events,
       trailing_avg,
       CASE WHEN trailing_avg IS NOT NULL
            THEN CAST(n_events AS DOUBLE) < {drop_factor} * trailing_avg
            ELSE FALSE END AS alert
FROM win
"""


# --------------------------------------------------------------------------
# Kaplan-Meier survival estimator (user retention with censoring)
# --------------------------------------------------------------------------


def kaplan_meier_retention(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    churn_horizon_days: int = 7,
) -> DataFrame:
    """Kaplan-Meier (1958) survival curve over user lifetimes with
    right-censoring — the estimator q73's cohort grid cannot give you
    when users are still active: a user whose last event is within
    ``churn_horizon_days`` of the observation end is CENSORED (their
    true lifetime is only known to exceed what we saw), not churned,
    and the product-limit estimator uses them in the at-risk counts
    without counting a death.

    Per distinct lifetime t (days, first->last event):
      n_risk(t) = users with lifetime >= t, d(t) = churned at exactly t,
      S(t) = prod_{t_i <= t} (1 - d(t_i)/n_risk(t_i)).

    Determinism: lifetimes are exact integer day counts; the running
    product folds over the LIFETIME-ORDERED per-duration table (the
    q152/q164 fold family) so both engines multiply identical doubles
    in identical order; 6-dp round on output.

    Scale shape: one user-key shuffle (per-user min/max), one aggregate
    over the DURATION domain (bounded by the observation span in days,
    never by user count), and the fold + running n_risk run over that
    bounded table inside a single collect_list group — O(span^2) driver-
    free work on <=span rows.
    """
    per_user = events.groupBy(user_col).agg(
        F.min(ts_col).alias("__first"), F.max(ts_col).alias("__last")
    )
    # observation end from the per-user table (max of per-user maxes ==
    # global max) — re-aggregating raw events would cost a second full
    # fact scan (review r8)
    cutoff = per_user.agg(
        F.date_sub(F.max("__last").cast("date"), churn_horizon_days).alias("__cut")
    )
    flagged = per_user.crossJoin(F.broadcast(cutoff)).select(
        F.datediff(F.col("__last").cast("date"), F.col("__first").cast("date"))
        .alias("dur"),
        (F.col("__last").cast("date") < F.col("__cut")).cast("int").alias("__churn"),
    )
    per_dur = flagged.groupBy("dur").agg(
        F.count(F.lit(1)).alias("__a"),
        F.sum("__churn").alias("__d"),
    )
    # bounded by the day span: single group; the fold is staged through
    # COLUMNS so each stage evaluates once — srt -> enriched (suffix-sum
    # n_risk, O(span^2)) -> rows (prefix product over enriched,
    # O(span^2)). Inlining enriched into the product would recompute it
    # per element and go cubic (review r8).
    lst = per_dur.agg(
        F.expr("array_sort(collect_list(struct(dur, __a, __d)))").alias("__srt")
    )
    enr = lst.select(
        F.expr(
            """
            transform(__srt, (s, i) -> struct(
              s.dur as dur,
              aggregate(slice(__srt, i + 1, size(__srt)), 0L,
                        (acc, x) -> acc + x.__a) as n_risk,
              s.__d as n_churn))
            """
        ).alias("__enr")
    )
    rows = enr.select(
        F.expr(
            """
            transform(__enr, (e, i) -> struct(
              e.dur as dur, e.n_risk as n_risk, e.n_churn as n_churn,
              aggregate(slice(__enr, 1, i + 1), cast(1.0 as double),
                        (acc, x) -> acc * (1.0 - cast(x.n_churn as double)
                                           / cast(x.n_risk as double)))
                as surv))
            """
        ).alias("__rows")
    )
    return rows.select(F.explode("__rows").alias("r")).select(
        F.col("r.dur").cast("int").alias("duration_days"),
        F.col("r.n_risk").cast("bigint").alias("n_risk"),
        F.col("r.n_churn").cast("bigint").alias("n_churn"),
        F.round(F.col("r.surv"), 6).alias("survival"),
    )


def sql_kaplan_meier(
    table: str, user_col: str, ts_col: str, churn_horizon_days: int = 7
) -> str:
    """DuckDB mirror of :func:`kaplan_meier_retention` — the identical
    duration-ordered product fold."""
    return f"""
WITH per_user AS (
  SELECT {user_col}, MIN({ts_col}) AS f, MAX({ts_col}) AS l
  FROM {table} GROUP BY {user_col}
),
cut AS (
  SELECT CAST(MAX(l) AS DATE) - {churn_horizon_days} AS c FROM per_user
),
flagged AS (
  SELECT date_diff('day', CAST(f AS DATE), CAST(l AS DATE)) AS dur,
         CASE WHEN CAST(l AS DATE) < c THEN 1 ELSE 0 END AS churn
  FROM per_user, cut
),
per_dur AS (
  SELECT dur, COUNT(*) AS a, SUM(churn) AS d
  FROM flagged GROUP BY dur
),
lst AS (
  SELECT list(struct_pack(dur := dur, a := a, d := d) ORDER BY dur) AS srt
  FROM per_dur
),
enr AS (
  SELECT list_transform(range(1, len(srt) + 1), i -> struct_pack(
    dur := srt[i].dur,
    n_risk := list_reduce(list_prepend(CAST(0 AS BIGINT),
        list_transform(srt[i:], x -> CAST(x.a AS BIGINT))), (acc, x) -> acc + x),
    n_churn := srt[i].d
  )) AS e FROM lst
),
rows AS (
  SELECT UNNEST(list_transform(range(1, len(e) + 1), i -> struct_pack(
    dur := e[i].dur,
    n_risk := e[i].n_risk,
    n_churn := e[i].n_churn,
    surv := list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
        list_transform(e[1:i], x ->
          1.0 - CAST(x.n_churn AS DOUBLE) / CAST(x.n_risk AS DOUBLE))),
      (acc, x) -> acc * x)
  ))) AS r FROM enr
)
SELECT CAST(r.dur AS INT) AS duration_days,
       CAST(r.n_risk AS BIGINT) AS n_risk,
       CAST(r.n_churn AS BIGINT) AS n_churn,
       ROUND(r.surv, 6) AS survival
FROM rows
"""


# --------------------------------------------------------------------------
# Holt double-exponential smoothing (level + trend forecast)
# --------------------------------------------------------------------------


def holt_linear_trend(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    gamma: float = 0.3,
) -> DataFrame:
    """Holt (1957) double-exponential smoothing per key over the daily
    value series: level l_t = a·x_t + (1-a)(l_{t-1}+b_{t-1}), trend
    b_t = g·(l_t-l_{t-1}) + (1-g)·b_{t-1}, seeded l_1 = x_1, b_1 = 0 —
    the one-step forecast l+b that q152's trendless EWMA under-predicts
    on drifting series. Third member of the recurrence-as-fold family
    (EWMA q152, CUSUM q159): the fold runs over the DAY-ORDERED daily
    sums with a (level, trend) struct accumulator, so both engines
    compute the identical IEEE sequence; daily sums are exact-decimal
    6-dp values like q152's.

    Scale shape: one (user, day) map-side-combined aggregation, then a
    per-user fold over that user's (bounded) day span — no cross-user
    state, no corpus-wide pass.
    """

    daily = events.filter(F.col(value_col).isNotNull()).groupBy(
        user_col, F.date_format(ts_col, "yyyy-MM-dd").alias("__day")
    ).agg(F.round(F.sum(dec(F.col(value_col))).cast("double"), 6).alias("__v"))
    a, g = alpha, gamma
    vs = "transform(array_sort(collect_list(struct(__day, __v))), s -> s.__v)"
    fold = (
        f"aggregate(slice({vs}, 2, size({vs}) - 1),"
        f" named_struct('l', cast(element_at({vs}, 1) as double),"
        f"              'b', cast(0.0 as double)),"
        f" (acc, x) -> named_struct("
        f"   'l', {a} * x + {1 - a} * (acc.l + acc.b),"
        f"   'b', {g} * (({a} * x + {1 - a} * (acc.l + acc.b)) - acc.l)"
        f"        + {1 - g} * acc.b))"
    )
    # one collect_list + one fold per group (referencing the fold in
    # each output column would re-run it per column)
    agg = daily.groupBy(user_col).agg(
        F.size(F.expr(vs)).cast("int").alias("n_days"),
        F.expr(fold).alias("__lb"),
    )
    return agg.select(
        user_col,
        "n_days",
        F.round(F.col("__lb.l"), 6).alias("level"),
        F.round(F.col("__lb.b"), 6).alias("trend"),
        F.round(F.col("__lb.l") + F.col("__lb.b"), 6).alias("forecast_next"),
    )


def sql_holt_linear_trend(
    table: str,
    user_col: str,
    ts_col: str,
    value_col: str,
    alpha: float = 0.5,
    gamma: float = 0.3,
) -> str:
    """DuckDB mirror — the identical fold with a [level, trend] list
    accumulator (the q159 encoding)."""

    a, g = alpha, gamma
    return f"""
WITH daily AS (
  SELECT {user_col}, strftime({ts_col}, '%Y-%m-%d') AS day,
         ROUND(CAST(SUM({sql_dec(value_col)}) AS DOUBLE), 6) AS v
  FROM {table} WHERE {value_col} IS NOT NULL
  GROUP BY {user_col}, strftime({ts_col}, '%Y-%m-%d')
),
series AS (
  SELECT {user_col}, list(v ORDER BY day) AS vs FROM daily
  GROUP BY {user_col}
),
folded AS (
  SELECT {user_col}, len(vs) AS n_days,
         list_reduce(
           list_prepend([vs[1], 0.0],
             list_transform(vs[2:], x -> [x, 0.0])),
           (acc, xe) -> [
             {a} * xe[1] + {1 - a} * (acc[1] + acc[2]),
             {g} * (({a} * xe[1] + {1 - a} * (acc[1] + acc[2])) - acc[1])
               + {1 - g} * acc[2]
           ]
         ) AS lb
  FROM series
)
SELECT {user_col}, CAST(n_days AS INT) AS n_days,
       ROUND(lb[1], 6) AS level,
       ROUND(lb[2], 6) AS trend,
       ROUND(lb[1] + lb[2], 6) AS forecast_next
FROM folded
"""


# --------------------------------------------------------------------------
# autocorrelation function (lag-k ACF of the daily series)
# --------------------------------------------------------------------------


def daily_acf(
    events: DataFrame,
    ts_col: str,
    max_lag: int = 7,
) -> DataFrame:
    """ACF of the daily event-count series at lags 1..``max_lag``:
    r_k = Σ(x_t - x̄)(x_{t+k} - x̄) / Σ(x_t - x̄)² — the periodicity
    diagnostic behind q158's day-of-week strength (a weekly cycle shows
    as a peak at lag 7). Spikes also flag duplicated-ingest days.

    Event-free calendar days COUNT AS ZERO (the series densifies over
    the min..max day range) — compacting them away would shift every
    later lag position and smear true periodicity.

    Determinism: daily counts are exact integers; the mean is one exact
    division; numerator and denominator are DAY-ORDERED folds (the
    q152/q164 family) so both engines add identical doubles in
    identical order.

    Scale shape: one map-side-combined (day) count aggregate — the
    series is span-bounded — then O(span·max_lag) fold work on a single
    row. Nothing user- or event-cardinality-sized survives the first
    aggregate.
    """
    daily = events.groupBy(
        F.date_format(ts_col, "yyyy-MM-dd").alias("__day")
    ).agg(F.count("*").alias("__n"))
    # DENSIFY to the full calendar range: an event-free day must appear
    # as 0, not vanish — compaction would shift every later position and
    # smear a true weekly peak across lags 6/7 (review r8). The day
    # domain comes from one min/max over the (span-bounded) daily table.
    span = daily.agg(
        F.min(F.to_date("__day")).alias("__d0"),
        F.max(F.to_date("__day")).alias("__d1"),
    )
    dense = span.select(
        F.explode(F.expr("sequence(__d0, __d1, interval 1 day)")).alias("__d")
    ).select(F.date_format("__d", "yyyy-MM-dd").alias("__day"))
    daily = dense.join(daily, "__day", "left").select(
        "__day", F.coalesce("__n", F.lit(0)).alias("__n")
    )
    vs = "transform(array_sort(collect_list(struct(__day, __n))), s -> cast(s.__n as double))"
    lst = daily.agg(
        F.expr(vs).alias("__vs"),
        F.sum("__n").alias("__tot"),
        F.count(F.lit(1)).alias("n_days"),
    )
    # empty-input parity: a global agg over zero rows still yields ONE
    # row (n_days=0) that would explode into max_lag NULL-acf rows while
    # the mirror's fold over an empty dense range emits none — drop the
    # degenerate row identically on both engines (r8 ADVICE)
    lst = lst.filter(F.col("n_days") > 0)
    lst = lst.withColumn(
        "__mean", F.col("__tot").cast("double") / F.col("n_days")
    ).withColumn(
        "__den",
        F.expr(
            "aggregate(__vs, cast(0.0 as double),"
            " (a, x) -> a + (x - __mean) * (x - __mean))"
        ),
    )
    rows = lst.select(
        "n_days",
        F.explode(
            F.expr(
                f"""
                transform(sequence(1, {max_lag}), k -> struct(
                  k as lag,
                  case when size(__vs) > k and __den > 0 then
                    round(aggregate(sequence(1, size(__vs) - k),
                              cast(0.0 as double),
                              (a, i) -> a + (element_at(__vs, i) - __mean)
                                  * (element_at(__vs, i + k) - __mean))
                          / __den, 6)
                  end as acf))
                """
            )
        ).alias("r"),
    )
    return rows.select(
        F.col("r.lag").cast("int").alias("lag"),
        F.col("n_days").cast("int").alias("n_days"),
        F.col("r.acf").alias("acf"),
    )


def sql_daily_acf(table: str, ts_col: str, max_lag: int = 7) -> str:
    """DuckDB mirror — identical day-ordered folds."""
    return f"""
WITH raw AS (
  SELECT strftime({ts_col}, '%Y-%m-%d') AS day, COUNT(*) AS n
  FROM {table} GROUP BY strftime({ts_col}, '%Y-%m-%d')
),
dense AS (
  SELECT strftime(UNNEST(generate_series(
           CAST(MIN(day) AS DATE), CAST(MAX(day) AS DATE),
           INTERVAL 1 DAY)), '%Y-%m-%d') AS day
  FROM raw
),
daily AS (
  SELECT dense.day, COALESCE(raw.n, 0) AS n
  FROM dense LEFT JOIN raw USING (day)
),
lst AS (
  SELECT list(CAST(n AS DOUBLE) ORDER BY day) AS vs,
         SUM(n) AS tot, COUNT(*) AS n_days
  FROM daily
  HAVING COUNT(*) > 0
),
stats AS (
  SELECT vs, n_days,
         CAST(tot AS DOUBLE) / n_days AS m,
         list_reduce(list_prepend(0.0,
           list_transform(vs, x -> (x - CAST(tot AS DOUBLE) / n_days)
                                   * (x - CAST(tot AS DOUBLE) / n_days))),
           (a, x) -> a + x) AS den
  FROM lst
),
rows AS (
  SELECT n_days, UNNEST(list_transform(range(1, {max_lag} + 1), k ->
    struct_pack(
      lag := k,
      acf := CASE WHEN len(vs) > k AND den > 0 THEN
        ROUND(list_reduce(list_prepend(0.0,
            list_transform(range(1, len(vs) - k + 1), i ->
              (vs[CAST(i AS INT)] - m) * (vs[CAST(i + k AS INT)] - m))),
          (a, x) -> a + x) / den, 6)
      END))) AS r
  FROM stats
)
SELECT CAST(r.lag AS INT) AS lag, CAST(n_days AS INT) AS n_days,
       r.acf AS acf
FROM rows
"""
