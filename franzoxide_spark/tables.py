"""Table catalog over the driver-generated parquet fixtures (TESTDATA.md).

Parquet scans are the engine's batch source: Catalyst pushes filters and
prunes columns into the scan (verify with ``df.explain`` → ``PushedFilters``
/ ``ReadSchema``), so query functions read via this module and rely on
pushdown rather than pre-filtering.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at ANY scale factor (TPC-H dims
# grow slowly or not at all): always broadcast these in joins.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier", "part", "customer"})


# DataFrame catalog cache: re-reading the same parquet path re-lists files
# and re-reads footers on the driver (~100-200 ms per table). A catalog
# caches that metadata; keyed by session so a new SparkSession re-resolves.
# Keyed on applicationId, NOT id(spark): a GC'd-then-reallocated session
# object can reuse the same id() and would alias a stale entry (and stale
# DataFrames bound to a stopped SparkContext raise on use).
_CATALOG: dict[tuple[str, str, str], DataFrame] = {}

# Correctness-critical runtime confs, re-asserted per session: query
# callables may be invoked with a session the caller built (e.g. the
# driver's own vanilla SparkSession), where missing values would crash the
# events scan (legacy nanos-timestamp fixtures) or drift timestamp
# rendering vs the oracle. All three are runtime-settable SQLConfs.
_REQUIRED_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.mapKeyDedupPolicy": "LAST_WIN",
}
_CONFED_SESSIONS: set[str] = set()


def _session_key(spark: SparkSession) -> str:
    """Stable identity for a live session: the Spark applicationId.

    ``id(spark)`` is unsafe as a cache key — CPython reuses addresses after
    GC, so a new session could silently hit a dead session's entries and
    skip the correctness-critical conf re-assertion (nanosAsLong, UTC).
    applicationId is unique per SparkContext lifetime.
    """
    try:
        app = spark.sparkContext.applicationId
    except Exception:  # Spark Connect or stopped context: degrade per-object
        return f"py-id-{id(spark)}"
    # applicationId alone conflates spark.newSession() children with their
    # parent (same SparkContext, FRESH SQLConf) — the conf assertion would
    # be skipped for the child and nanosAsLong/UTC silently unset (r13
    # review). The py4j target id names the JVM SparkSession object
    # (monotonic per gateway, never reused while live).
    try:
        return f"{app}/{spark._jsparkSession._target_id}"
    except Exception:
        return app


def ensure_session_confs(spark: SparkSession) -> None:
    key = _session_key(spark)
    if key in _CONFED_SESSIONS:
        return
    for k, v in _REQUIRED_CONFS.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # static/locked conf on some deployment: leave as-is
    _CONFED_SESSIONS.add(key)
    # A new application means every older application's cached entries are
    # dead (their DataFrames point at a stopped context) — drop them so the
    # caches cannot grow across sequential sessions in one process.
    for stale in [k for k in _CONFED_SESSIONS if k != key]:
        _CONFED_SESSIONS.discard(stale)
    for ck in [ck for ck in _CATALOG if ck[0] != key]:
        _CATALOG.pop(ck, None)


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    ensure_session_confs(spark)
    key = (_session_key(spark), sf_dir, name)
    cached = _CATALOG.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        # Fixture generations differ: older events.parquet stored ts as
        # TIMESTAMP(NANOS), which Spark (under nanosAsLong, session.py)
        # reads as a bigint of nanoseconds — truncate to micros, matching
        # DuckDB's ns -> TIMESTAMP cast. Newer fixtures store
        # TIMESTAMP(MICROS), which Spark reads as timestamp/timestamp_ntz
        # directly — pass through. Guard on the read dtype so both work.
        from pyspark.sql import functions as F

        ts_dtype = dict(df.dtypes).get("ts")
        if ts_dtype == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_dtype == "timestamp_ntz":
            # Downstream consumers (unix_millis, time windows, watermarks)
            # require TIMESTAMP (ltz) — the type the nanos path also yields.
            # Session tz is UTC (ensure_session_confs), so this cast is
            # value-preserving: the NTZ wall clock IS the UTC instant.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    _CATALOG[key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every fixture table as a temp view (for the SQL surface)."""
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
