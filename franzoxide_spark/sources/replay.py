"""Kafka-replay source: a custom Python DataSource (Spark 4
``pyspark.sql.datasource``) that serves a staged, GROWING KafkaRecord
parquet log with real broker semantics — per-partition contiguous
offsets, ``latestOffset`` re-scanning the log end each trigger (so
batches track data arrival exactly as they do against a live broker),
offset-dict checkpointing, and one Spark input partition per Kafka
partition.

Why it exists: the environment has no Kafka broker (mirrored by the
reference's own disabled integration CI, .github/workflows/ci.yml:60-69),
so through round 6 the connector pipeline (A5-A13) was exercised with
plain file streams — which have no offset model at all. This source is
the missing middle: the SAME offset-tracking semantics the real
``kafka`` format has (resume-from-checkpoint lands at the exact
per-partition positions, new appends flow as new micro-batches),
implemented against local fixtures. Swapping ``format("kafka_replay")``
for ``format("kafka")`` is a config change.

Contract note: ``latestOffset()`` reports the TRUE end of the log —
rate limiting is deliberately NOT simulated there. An earlier draft
advanced an in-memory frontier by ``batch.size`` per trigger; that
frontier restarts at zero after a crash, Spark then records the
gone-backwards offset in the WAL, and the next batch REPLAYS committed
data (observed as duplicates in the resume test before this was fixed).
The offsets a streaming source reports must be derivable from the
external system, never from reader-process memory.

Offsets are dicts ``{partition(str): next_offset(int)}`` — JSON-encoded
by Spark into the checkpoint WAL.

Scale shape: ``partitions(start, end)`` emits one InputPartition per
Kafka partition; executors read their slice with parquet predicate
pushdown (pyarrow filters on partition + offset range) and yield Arrow
record batches — no per-row Python objects. ``latestOffset`` reads only
the (partition, offset) columns on the driver; a production source gets
this from broker metadata instead of a scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

REPLAY_SCHEMA = (
    "topic string, partition int, offset bigint, timestamp bigint,"
    " key binary, value binary, headers_json string"
)

_COLUMNS = [
    "topic", "partition", "offset", "timestamp", "key", "value",
    "headers_json",
]


def stage_replay(
    spark: SparkSession,
    sf_dir: str,
    out_path: str,
    n_partitions: int = 8,
    min_offset: int | None = None,
    max_offset: int | None = None,
) -> None:
    """Materialize (a slice of) the events fixture as replayable
    KafkaRecord parquet: per-partition CONTIGUOUS offsets starting at 0
    (row_number ordered by event id — deterministic). Slicing by
    ``[min_offset, max_offset)`` with append writes lets a test GROW the
    log between triggers the way a producer would, without ever breaking
    offset contiguity (the full log is numbered first, then sliced)."""
    from pyspark.sql import Window

    from franzoxide_spark.queries.envelope import kafka_records_from_events

    rec = kafka_records_from_events(spark, sf_dir).withColumn(
        "partition", (F.col("offset") % n_partitions).cast("int")
    )
    w = Window.partitionBy("partition").orderBy("offset")
    full = rec.withColumn(
        "offset", F.row_number().over(w).cast("bigint") - 1
    ).select(*_COLUMNS)
    if min_offset is not None:
        full = full.filter(F.col("offset") >= min_offset)
    if max_offset is not None:
        full = full.filter(F.col("offset") < max_offset)
    mode = "overwrite" if not min_offset else "append"
    full.write.mode(mode).parquet(out_path)


@dataclass
class _OffsetRange(InputPartition):
    path: str
    partition: int
    start: int
    end: int


def _read_range(rng: _OffsetRange):
    """Executor-side slice read: parquet predicate pushdown via pyarrow
    filters, yielded as Arrow record batches (no Python row objects)."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(
        rng.path,
        columns=_COLUMNS,
        filters=[
            ("partition", "=", rng.partition),
            ("offset", ">=", rng.start),
            ("offset", "<", rng.end),
        ],
    )
    yield from tbl.to_batches()


def _partition_ends(path: str) -> dict[str, int]:
    """Per-partition end offset (max+1) of the staged log as it exists
    NOW — re-read per call so appended data advances the frontier.

    An empty/not-yet-created log is a VALID start state (a real Kafka
    consumer streams an empty topic fine and picks data up as it
    arrives, r13 review): report no partitions; the next trigger's
    re-scan sees whatever has been staged since."""
    import os

    import pyarrow.parquet as pq

    if not os.path.exists(path):
        return {}
    if os.path.isdir(path) and not any(
        f.endswith(".parquet") for f in os.listdir(path)
    ):
        return {}
    tbl = pq.read_table(path, columns=["partition", "offset"])
    grouped = tbl.group_by("partition").aggregate([("offset", "max")])
    return {
        str(part): int(mx) + 1
        for part, mx in zip(
            grouped["partition"].to_pylist(), grouped["offset_max"].to_pylist()
        )
    }


class _ReplayStreamReader(DataSourceStreamReader):
    def __init__(self, options) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("kafka_replay requires a 'path' option")

    def initialOffset(self) -> dict:
        return {p: 0 for p in _partition_ends(self._path)}

    def latestOffset(self) -> dict:
        # the true current end of the log, re-scanned per trigger: new
        # appends become the next micro-batch; nothing here depends on
        # reader-process memory, so a restarted query resumes exactly
        # from the WAL offsets (see the contract note in the module doc)
        return _partition_ends(self._path)

    def partitions(self, start: dict, end: dict):
        return [
            _OffsetRange(self._path, int(p), int(start.get(p, 0)), int(e))
            for p, e in end.items()
            if int(e) > int(start.get(p, 0))
        ]

    def read(self, partition: _OffsetRange):
        return _read_range(partition)

    def commit(self, end: dict) -> None:
        # offsets live in Spark's checkpoint WAL; nothing external to ack
        pass


class _ReplayBatchReader(DataSourceReader):
    def __init__(self, options) -> None:
        self._path = options.get("path")
        if not self._path:
            raise ValueError("kafka_replay requires a 'path' option")

    def partitions(self):
        return [
            _OffsetRange(self._path, int(p), 0, e)
            for p, e in _partition_ends(self._path).items()
        ]

    def read(self, partition: _OffsetRange):
        return _read_range(partition)


class KafkaReplayDataSource(DataSource):
    """``spark.dataSource.register(KafkaReplayDataSource)`` then
    ``spark.readStream.format("kafka_replay").option("path", ...)`` (or
    ``spark.read`` for the batch face)."""

    @classmethod
    def name(cls) -> str:
        return "kafka_replay"

    def schema(self) -> str:
        return REPLAY_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return _ReplayBatchReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return _ReplayStreamReader(self.options)


def register_replay_source(spark: SparkSession) -> None:
    spark.dataSource.register(KafkaReplayDataSource)


def read_replay_stream(spark: SparkSession, path: str) -> DataFrame:
    register_replay_source(spark)
    return (
        spark.readStream.format("kafka_replay").option("path", path).load()
    )


def replay_record_source(spark, kafka_cfg, connector) -> DataFrame:
    """Connector-registry builder (A10): serve a staged replay log as the
    pipeline's KafkaRecord stream — ``connector_class: kafka_replay`` in
    a connector config drives the full A5-A13 pipeline through real
    offset semantics instead of a plain file stream. headers_json is
    parsed into the map<string,string> the record schema carries."""
    from franzoxide_spark.errors import ConfigError

    path = connector.config.get("path")
    if not path:
        raise ConfigError(
            f"connector {connector.name!r}: kafka_replay source needs 'path'"
        )
    df = read_replay_stream(spark, path)
    return df.select(
        "topic", "partition", "offset", "timestamp", "key", "value",
        F.from_json(
            "headers_json", "map<string,string>"
        ).alias("headers"),
    )
