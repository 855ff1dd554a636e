"""Regression guard for events fixture timestamp-encoding drift.

Round 5 post-mortem: the driver's events.parquet fixtures changed from
TIMESTAMP(NANOS) (read as bigint under nanosAsLong) to TIMESTAMP(MICROS)
(read as timestamp_ntz), and the unconditional nanos->micros conversion in
tables.table() broke every events consumer at analysis time. This test
writes the SAME instants in BOTH encodings and asserts the loader yields
identical values for each — the seconds-cheap check that would have caught
the drift immediately.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from franzoxide_spark.tables import table

# Deterministic instants, microsecond precision (both encodings can carry
# these exactly; nanos fixtures are truncated to micros by the loader).
_INSTANTS = [
    dt.datetime(2024, 1, 1, 0, 0, 0, 0),
    dt.datetime(2024, 6, 15, 12, 34, 56, 789012),
    dt.datetime(2025, 12, 31, 23, 59, 59, 999999),
]


def _write_events(path: str, ts_type: pa.DataType) -> None:
    n = len(_INSTANTS)
    tbl = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(_INSTANTS, ts_type),
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.5] * n, pa.float64()),
            "props": pa.array(['{"k":1}'] * n, pa.string()),
        }
    )
    pq.write_table(tbl, path)


@pytest.mark.parametrize(
    "ts_type", [pa.timestamp("ns"), pa.timestamp("us")], ids=["nanos", "micros"]
)
def test_events_loader_handles_both_ts_encodings(spark, tmp_path, ts_type):
    d = tmp_path / ts_type.unit
    d.mkdir()
    _write_events(str(d / "events.parquet"), ts_type)
    df = table(spark, str(d), "events")
    # Whichever physical encoding, the loaded column must be a timestamp
    # (the streaming/window family requires a temporal type)...
    assert dict(df.dtypes)["ts"] in ("timestamp", "timestamp_ntz")
    # ...and carry the exact micro-precision instants. Compare epoch
    # micros, not collect()ed datetimes: PySpark renders TIMESTAMP in the
    # Python process's OS timezone on collect, which would skew the naive
    # comparison on any non-UTC host even though the loader is correct.
    import pyspark.sql.functions as F

    got = [
        r.us
        for r in df.orderBy("event_id").select(F.unix_micros("ts").alias("us")).collect()
    ]
    epoch = dt.datetime(1970, 1, 1)
    want = [(i - epoch) // dt.timedelta(microseconds=1) for i in _INSTANTS]
    assert got == want


def test_events_loader_same_instants_across_encodings(spark, tmp_path):
    dirs = {}
    for ts_type in (pa.timestamp("ns"), pa.timestamp("us")):
        d = tmp_path / ts_type.unit
        d.mkdir()
        _write_events(str(d / "events.parquet"), ts_type)
        dirs[ts_type.unit] = str(d)
    nanos = [r.ts for r in table(spark, dirs["ns"], "events").orderBy("event_id").collect()]
    micros = [r.ts for r in table(spark, dirs["us"], "events").orderBy("event_id").collect()]
    assert nanos == micros
