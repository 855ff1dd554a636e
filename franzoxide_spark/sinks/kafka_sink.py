"""Kafka sink: write a KafkaRecord stream back to a topic.

The inverse of the source — the engine can act as a Kafka->transform->
Kafka processor. Options mirror the source's passthrough convention.
Requires the spark-sql-kafka connector jar (absent in this container, so
``start`` gates with a clear error; the option builder is pure and
unit-tested).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.config import ConnectorConfig, KafkaConfig
from franzoxide_spark.errors import SinkError


def kafka_writer_options(
    kafka_cfg: KafkaConfig, connector: ConnectorConfig
) -> dict[str, str]:
    if not connector.topics:
        from franzoxide_spark.errors import ConfigError

        raise ConfigError(f"kafka sink {connector.name!r} needs a topic")
    opts = {
        "kafka.bootstrap.servers": ",".join(kafka_cfg.bootstrap_servers),
        "topic": connector.topics[0],
    }
    for k, v in kafka_cfg.properties.items():
        opts[f"kafka.{k}"] = v
    for k, v in connector.config.items():
        if k.startswith("kafka."):
            opts[k] = v
    return opts


def start_kafka_sink(
    records: DataFrame,
    kafka_cfg: KafkaConfig,
    connector: ConnectorConfig,
    checkpoint: str,
):
    """records must carry key/value binary columns (KafkaRecord shape)."""
    spark = records.sparkSession
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.spark.sql.kafka010.KafkaSourceProvider"
        )
    except Exception as e:
        raise SinkError(
            "kafka sink requires the spark-sql-kafka connector jar on the"
            " classpath (not present in this environment)"
        ) from e
    out = records.select(F.col("key"), F.col("value"))
    writer = out.writeStream.format("kafka").option("checkpointLocation", checkpoint)
    for k, v in kafka_writer_options(kafka_cfg, connector).items():
        writer = writer.option(k, v)
    return writer.queryName(connector.name).start()
