"""Batch equivalents of the streaming window semantics (Q25-Q28, Q32).

These run the exact window/session/dedup logic the streaming engine uses
(``F.window`` / ``F.session_window`` / ``dropDuplicates`` are the same
operators in batch and streaming) so they can be oracle-checked; the
streaming-only behaviors (watermarks, late-data drop, checkpoint recovery)
are covered by Spark-side tests in tests/test_streaming.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import dec, dsum, sql_dec, sql_dsum
from franzoxide_spark.queries import register
from franzoxide_spark.tables import table

_TS_FMT = "yyyy-MM-dd HH:mm:ss"
_TS_FMT_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def _events_rel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events family's shared user-key-bucketed landing (r16) — the
    canonical helper lives with the family's main cohort in
    queries/corpus.py; imported lazily here to keep registration-order
    imports acyclic."""
    from franzoxide_spark.queries.corpus import _events_rel as _er

    return _er(spark, sf_dir)


# --------------------------------------------------------------------------
# Q25 — tumbling window aggregate (1 hour)
# --------------------------------------------------------------------------
def q25(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("value"), "sum_value"))
        .select(
            F.date_format("window.start", _TS_FMT).alias("win_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


Q25_SQL = f"""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS win_start,
       event_type,
       COUNT(*) AS n,
       {sql_dsum(sql_dec("value"), "sum_value")}
FROM events
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# Q26 — sliding window aggregate (1 hour window, 15 minute slide)
# --------------------------------------------------------------------------
def q26(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.window("ts", "1 hour", "15 minutes"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.date_format("window.start", _TS_FMT).alias("win_start"), "n")
    )


# Every event belongs to exactly 4 sliding windows whose starts are the
# 15-min grid bucket of ts minus k*15min, k=0..3 (epoch-aligned grid, same
# alignment Spark uses).
Q26_SQL = """
SELECT strftime(time_bucket(INTERVAL '15 minutes', ts)
                - k * INTERVAL '15 minutes', '%Y-%m-%d %H:%M:%S') AS win_start,
       COUNT(*) AS n
FROM events, (SELECT unnest([0, 1, 2, 3]) AS k)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# Q27 — session windows (30-minute gap) per user
# --------------------------------------------------------------------------
def q27(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_rel(spark, sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes"))
        .agg(F.count(F.lit(1)).alias("n_events"), dsum(dec("value"), "sum_value"))
        .select(
            "user_id",
            F.date_format("session_window.start", _TS_FMT_US).alias("sess_start"),
            F.date_format("session_window.end", _TS_FMT_US).alias("sess_end"),
            "n_events",
            "sum_value",
        )
    )


# Gaps-and-islands with a STRICT > 30min break rule: measured on this
# Spark build (r8 probe), two events exactly gap apart MERGE into one
# session — the merge condition is ts <= prev_ts + gap, inclusive — so
# the SQL break is strictly >. (The earlier >= rule was wrong at the
# exact-boundary case; the microsecond-resolution fixture never hits it,
# which is why parity always passed.)
Q27_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes' THEN 1
              WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL THEN 1
              ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, ts, value,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM ordered
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
       strftime(MAX(ts) + INTERVAL '30 minutes', '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
       COUNT(*) AS n_events,
       {sql_dsum(sql_dec("value"), "sum_value")}
FROM sess
GROUP BY user_id, sess_id
"""


# --------------------------------------------------------------------------
# Q28 — stateful dedup (batch equivalent of dropDuplicates on a key)
# --------------------------------------------------------------------------
def q28(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_rel(spark, sf_dir)
    return (
        ev.select("user_id", "event_type", "ts")
        .dropDuplicates(["user_id", "event_type", "ts"])
        .select(
            "user_id",
            "event_type",
            F.date_format("ts", _TS_FMT_US).alias("ts_s"),
        )
    )


Q28_SQL = """
SELECT DISTINCT user_id, event_type,
       strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s
FROM events
"""


# --------------------------------------------------------------------------
# Q32 — stream-static join (batch equivalent)
# --------------------------------------------------------------------------
def q32(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = table(spark, sf_dir, "events")
    c = table(spark, sf_dir, "customer")
    # In the streaming form `c` is the static side; Spark broadcasts it per
    # micro-batch — same plan shape as this batch broadcast join.
    return (
        ev.join(F.broadcast(c), ev.user_id == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), dsum(dec("value"), "sum_value"))
    )


Q32_SQL = f"""
SELECT c_mktsegment, COUNT(*) AS n,
       {sql_dsum(sql_dec("value"), "sum_value")}
FROM events JOIN customer ON user_id = c_custkey
GROUP BY c_mktsegment
"""

register("q25_tumbling_window", q25, Q25_SQL)
register("q26_sliding_window", q26, Q26_SQL)
register("q27_session_window", q27, Q27_SQL)
register("q28_dedup_keys", q28, Q28_SQL)
register("q32_stream_static_join", q32, Q32_SQL)


# --------------------------------------------------------------------------
# Q168 — DYNAMIC-gap session window (batch face): the per-event gap form
#        of q27 — purchases hold a session open 30 minutes, everything
#        else 10 — Spark's session_window(ts, gap_expression) feature,
#        which no fixed-gap rewrite can express. Measured semantics
#        (r8 probe, locked by tests): events sort by ts; an event MERGES
#        into the open session iff ts <= running_end (inclusive), where
#        running_end = max(running_end, ts + gap(event)); the session's
#        end is the final running max. The oracle is the gaps-and-
#        islands construction with a running MAX(ts + gap) window.
# --------------------------------------------------------------------------
_Q168_GAP = "CASE WHEN event_type = 'purchase' THEN 1800 ELSE 600 END"


def q168(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events_rel(spark, sf_dir)
    gap = F.when(F.col("event_type") == "purchase", F.lit("30 minutes")).otherwise(
        F.lit("10 minutes")
    )
    return (
        ev.groupBy("user_id", F.session_window("ts", gap))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "purchase").cast("int"))
            .cast("int")
            .alias("n_purchases"),
        )
        .select(
            "user_id",
            F.date_format("session_window.start", _TS_FMT_US).alias("sess_start"),
            F.date_format("session_window.end", _TS_FMT_US).alias("sess_end"),
            "n_events",
            "n_purchases",
        )
    )


Q168_SQL = f"""
WITH e AS (
  SELECT user_id, ts, event_type,
         ts + ({_Q168_GAP}) * INTERVAL 1 SECOND AS ev_end
  FROM events
),
marked AS (
  SELECT user_id, ts, event_type, ev_end,
         CASE WHEN ts <= MAX(ev_end) OVER (
                  PARTITION BY user_id ORDER BY ts
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
              THEN 0 ELSE 1 END AS new_sess
  FROM e
),
sess AS (
  SELECT user_id, ts, event_type, ev_end,
         SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS sess_id
  FROM marked
)
SELECT user_id,
       strftime(MIN(ts), '%Y-%m-%d %H:%M:%S.%f') AS sess_start,
       strftime(MAX(ev_end), '%Y-%m-%d %H:%M:%S.%f') AS sess_end,
       COUNT(*) AS n_events,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS INT)
         AS n_purchases
FROM sess
GROUP BY user_id, sess_id
"""

register("q168_dynamic_session_window", q168, Q168_SQL)
