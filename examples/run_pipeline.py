"""Run the connector pipeline from a connect.json — the engine's
equivalent of the reference daemon's `main` (main.rs:60-177):

    python examples/run_pipeline.py examples/connect.json [checkpoint_dir]

Loads the config (same file format as the reference), initializes the
manager (sources resolved to sinks by topic overlap), starts the
streaming queries, prints status, and blocks until Ctrl-C — on which it
stops cleanly. State (offsets, sink commits) lives in the checkpoint dir,
so a restart resumes exactly-once.

For an environment without a Kafka broker, switch the source's
``connector_class`` to ``"kafka_replay"`` with a ``"path"`` config
pointing at a staged offset log (sources/replay.py — real per-partition
offset semantics, WAL resume), ``"file"`` for plain KafkaRecord-schema
parquet, or ``"rate"`` for synthetic load.

When the config carries ``tcp_address`` / ``unix_socket_path`` (the
reference daemon's dual-transport fields) AND grpcio is installed, the
ConnectorService wire interface starts alongside the pipeline —
SinkStream push-ingest into the first object sink plus
GetConfig/UpdateConfig/GetStatus against the live manager. Without
grpcio the pipeline runs and a one-line notice explains the gate.
"""

from __future__ import annotations

import json
import sys
import time

from franzoxide_spark.config import load_config
from franzoxide_spark.manager import ConnectorManager, SINK_CLASSES
from franzoxide_spark.session import get_spark


def _maybe_serve_grpc(spark, mgr, cfg, ckpt):
    """Reference daemon parity (main.rs:100-157): start the gRPC control/
    data plane when the config asks for it and the env can provide it."""
    if not (cfg.tcp_address or cfg.unix_socket_path):
        return None
    from franzoxide_spark.errors import ConfigError
    from franzoxide_spark.ingest.control import ControlPlaneHandler
    from franzoxide_spark.ingest.grpc_server import serve
    from franzoxide_spark.ingest.push import PushBatchSink, SinkStreamHandler

    sinks = [
        c
        for c in cfg.connectors
        if c.connector_type == "sink" and c.connector_class in SINK_CLASSES
    ]
    if not sinks:
        print("grpc: no object sink to route SinkStream to; skipping")
        return None
    handler = SinkStreamHandler(PushBatchSink(spark, sinks[0], ckpt))
    try:
        server = serve(
            handler,
            address=cfg.tcp_address or "[::]:50051",
            control=ControlPlaneHandler(mgr),
            unix_socket_path=cfg.unix_socket_path,
        )
        print(f"grpc: ConnectorService on {cfg.tcp_address or '[::]:50051'}")
        return server
    except ConfigError as e:
        print(f"grpc: {e}")
        return None


def main() -> int:
    cfg_path = sys.argv[1] if len(sys.argv) > 1 else "examples/connect.json"
    ckpt = sys.argv[2] if len(sys.argv) > 2 else "/tmp/franzoxide_spark_ckpt"
    spark = get_spark(app_name="franzoxide_spark_pipeline")
    cfg = load_config(cfg_path)
    mgr = ConnectorManager(spark, cfg, ckpt)
    mgr.initialize()
    mgr.start()
    grpc_server = _maybe_serve_grpc(spark, mgr, cfg, ckpt)
    print(json.dumps(mgr.status(), indent=2, default=str))
    try:
        while True:
            time.sleep(10)
            for name, st in mgr.status().items():
                if "last_progress" in st and st["last_progress"]:
                    p = st["last_progress"]
                    print(f"{name}: {p.get('numInputRows', 0)} rows in last batch")
    except KeyboardInterrupt:
        print("stopping...")
        if grpc_server is not None:
            grpc_server.stop(0)
        mgr.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
