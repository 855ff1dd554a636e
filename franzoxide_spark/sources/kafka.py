"""Kafka streaming source -> normalized KafkaRecord envelope.

Re-expresses the reference's consumer path (kafka.rs:399-492 subscribe,
kafka.rs:97-132 record decode) on Spark's native Kafka source:

- topic subscription + ``startingOffsets=earliest``    (kafka.rs:459-466)
- ``kafka.*``-prefixed config passthrough, verbatim    (kafka.rs:468-474)
- ``batch.size`` -> ``maxOffsetsPerTrigger``           (kafka.rs:84-85; the
  micro-batch IS the poll batch)
- record normalization: null key/value -> empty bytes  (kafka.rs:104, 107),
  headers array -> map<string,string> with non-UTF8 values dropped and
  last-occurrence-wins                                  (kafka.rs:111-121)

Offset tracking/commit (kafka.rs:357-390) is replaced by the query's
checkpoint WAL — a deliberate semantic upgrade from the reference's
at-most-once (it commits offsets regardless of sink success) to
at-least-once with idempotent sinks = exactly-once end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from franzoxide_spark.config import ConnectorConfig, KafkaConfig
from franzoxide_spark.functions.envelope import normalize_headers

# The engine-wide record IR — KafkaRecord, field-for-field
# (connector.proto:32-40).
KAFKA_RECORD_SCHEMA = (
    "topic string, partition int, offset bigint, timestamp bigint, "
    "key binary, value binary, headers map<string,string>"
)


def normalize_kafka_records(df: DataFrame) -> DataFrame:
    """Spark Kafka-source columns -> KafkaRecord envelope columns."""
    empty = F.encode(F.lit(""), "UTF-8")
    return df.select(
        F.col("topic"),
        F.col("partition"),
        F.col("offset"),
        F.unix_millis("timestamp").alias("timestamp"),
        F.coalesce(F.col("key"), empty).alias("key"),
        F.coalesce(F.col("value"), empty).alias("value"),
        F.when(F.col("headers").isNotNull(), normalize_headers(F.col("headers")))
        .otherwise(F.create_map().cast("map<string,string>"))
        .alias("headers"),
    )


def kafka_reader_options(
    kafka_cfg: KafkaConfig, connector: ConnectorConfig
) -> dict[str, str]:
    """Pure option-map builder (unit-testable without a broker/jar)."""
    opts = {
        "kafka.bootstrap.servers": ",".join(kafka_cfg.bootstrap_servers),
        "subscribe": ",".join(connector.topics),
        "startingOffsets": "earliest",
        "includeHeaders": "true",
        "failOnDataLoss": "false",
    }
    if kafka_cfg.group_id:
        opts["kafka.group.id"] = kafka_cfg.group_id
    # kafka.* passthrough: global properties block, then per-connector
    # kafka.*-prefixed keys (connector keys win, mirroring the reference's
    # later-insert-wins map build).
    for k, v in kafka_cfg.properties.items():
        opts[f"kafka.{k}"] = v
    for k, v in connector.config.items():
        if k.startswith("kafka."):
            opts[k] = v
    batch_size = connector.config.get("batch.size")
    if batch_size is not None:
        opts["maxOffsetsPerTrigger"] = batch_size
    # tasks_max (manager.rs:82-91 spawns N duplicate consumers) -> ask the
    # source for at least N input partitions; Spark then schedules N
    # parallel tasks against the consumer group.
    if connector.tasks_max and connector.tasks_max > 1:
        opts["minPartitions"] = str(connector.tasks_max)
    return opts


def kafka_source(
    spark: SparkSession, kafka_cfg: KafkaConfig, connector: ConnectorConfig
) -> DataFrame:
    reader = spark.readStream.format("kafka")
    for k, v in kafka_reader_options(kafka_cfg, connector).items():
        reader = reader.option(k, v)
    return normalize_kafka_records(reader.load())
