"""Connector-class registry (A10, manager.rs:93-117).

Maps ``connector_class`` strings -> source builder functions. The
reference's class names are kept for config compatibility; short aliases
are the engine-native names. Unknown classes raise ConfigError, matching
manager.rs:112-116.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from franzoxide_spark.config import ConnectorConfig, KafkaConfig
from franzoxide_spark.errors import ConfigError
from franzoxide_spark.sources.files import file_record_source, rate_source
from franzoxide_spark.sources.kafka import kafka_source
from franzoxide_spark.sources.replay import replay_record_source

SourceBuilder = Callable[[SparkSession, KafkaConfig, ConnectorConfig], DataFrame]

SOURCE_CLASSES: dict[str, SourceBuilder] = {
    "io.rustconnect.KafkaSourceConnector": kafka_source,  # reference name
    "kafka": kafka_source,
    "file": file_record_source,
    "rate": rate_source,
    "kafka_replay": replay_record_source,
}


def build_source(
    spark: SparkSession, kafka_cfg: KafkaConfig, connector: ConnectorConfig
) -> DataFrame:
    try:
        builder = SOURCE_CLASSES[connector.connector_class]
    except KeyError:
        raise ConfigError(
            f"unknown source connector_class {connector.connector_class!r};"
            f" known: {sorted(SOURCE_CLASSES)}"
        ) from None
    return builder(spark, kafka_cfg, connector)
