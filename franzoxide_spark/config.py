"""connect.json-compatible configuration model.

Accepts the reference's config file format verbatim (config.rs:9-81;
shipped example config/connect.json): ``tcp_address`` / ``unix_socket_path``
(control-plane, unused by the Spark engine itself), a ``kafka`` block, and a
``connectors`` list whose per-connector ``config`` map uses the reference's
key names (``s3.bucket.name``, ``format.class``, ``partitioner.class``,
``flush.size``, ``batch.size``, ``poll.timeout.ms``, ...).

Spark mapping of the operational knobs:
- ``flush.size``   -> maxOffsetsPerTrigger (micro-batch == flush unit;
                      s3.rs:522-578's buffer-threshold semantics)
- ``batch.size``   -> also folded into maxOffsetsPerTrigger (kafka.rs:84-85)
- ``rotate.interval.ms`` -> trigger processingTime (B5, connector.proto:214)
- ``kafka.*`` connector-config keys -> passed through to the Kafka source
  verbatim (A2, kafka.rs:468-474)
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

from franzoxide_spark.errors import ConfigError


@dataclass
class KafkaConfig:
    bootstrap_servers: list[str] = field(default_factory=list)
    group_id: str = "franzoxide-spark"
    properties: dict[str, str] = field(default_factory=dict)


@dataclass
class ConnectorConfig:
    name: str
    connector_class: str
    connector_type: str  # "source" | "sink"
    tasks_max: int = 1
    topics: list[str] = field(default_factory=list)
    config: dict[str, str] = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.connector_type not in ("source", "sink"):
            raise ConfigError(
                f"connector {self.name!r}: connector_type must be source|sink,"
                f" got {self.connector_type!r}"
            )


@dataclass
class Config:
    kafka: KafkaConfig = field(default_factory=KafkaConfig)
    connectors: list[ConnectorConfig] = field(default_factory=list)
    tcp_address: str | None = None
    unix_socket_path: str | None = None

    def connector(self, name: str) -> ConnectorConfig:
        for c in self.connectors:
            if c.name == name:
                return c
        raise ConfigError(f"no connector named {name!r}")


def load_config(path: str) -> Config:
    """JSON file -> typed Config with context-wrapped errors (config.rs:72-81)."""
    try:
        with open(path) as f:
            raw = json.load(f)
    except (OSError, json.JSONDecodeError) as e:
        raise ConfigError(f"failed to load config {path!r}: {e}") from e
    return parse_config(raw)


def parse_config(raw: dict) -> Config:
    try:
        kafka = KafkaConfig(**raw.get("kafka", {}))
        connectors = [ConnectorConfig(**c) for c in raw.get("connectors", [])]
    except TypeError as e:
        raise ConfigError(f"malformed config: {e}") from e
    return Config(
        kafka=kafka,
        connectors=connectors,
        tcp_address=raw.get("tcp_address"),
        unix_socket_path=raw.get("unix_socket_path"),
    )
