"""File-based streaming sources.

Two roles:
- ``file_record_source``: streams KafkaRecord-schema parquet files from a
  directory — the broker-less stand-in for the Kafka source (same
  downstream pipeline, used by tests and environments without a broker).
- ``rate_source``: Spark's rate source shaped into KafkaRecord envelopes
  (synthetic load for soak/throughput testing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from franzoxide_spark.config import ConnectorConfig, KafkaConfig
from franzoxide_spark.sources.kafka import KAFKA_RECORD_SCHEMA


def file_record_source(
    spark: SparkSession, kafka_cfg: KafkaConfig, connector: ConnectorConfig
) -> DataFrame:
    path = connector.config.get("path")
    if not path:
        from franzoxide_spark.errors import ConfigError

        raise ConfigError(f"connector {connector.name!r}: file source needs 'path'")
    fmt = connector.config.get("file.format", "parquet")
    reader = spark.readStream.schema(KAFKA_RECORD_SCHEMA).format(fmt)
    files_per_trigger = connector.config.get("files.per.trigger")
    if files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", files_per_trigger)
    return reader.load(path)


def rate_source(
    spark: SparkSession, kafka_cfg: KafkaConfig, connector: ConnectorConfig
) -> DataFrame:
    rows_per_sec = connector.config.get("rows.per.second", "1000")
    topic = (connector.topics or ["rate"])[0]
    df = spark.readStream.format("rate").option("rowsPerSecond", rows_per_sec).load()
    return df.select(
        F.lit(topic).alias("topic"),
        (F.col("value") % 8).cast("int").alias("partition"),
        F.col("value").alias("offset"),
        F.unix_millis("timestamp").alias("timestamp"),
        F.encode(F.concat(F.lit("key-"), F.col("value")), "UTF-8").alias("key"),
        F.encode(
            F.concat(F.lit('{"id": '), F.col("value"), F.lit("}")), "UTF-8"
        ).alias("value"),
        F.create_map(F.lit("source"), F.lit("rate")).alias("headers"),
    )
