"""Gated gRPC adapter for the EP2 push-ingest plane.

The wire protocol itself (proto3 messages) lives in
:mod:`franzoxide_spark.ingest.protowire` and the protocol state machine in
:mod:`franzoxide_spark.ingest.push` — both dependency-free and fully
tested. This module is ONLY the grpcio binding: it registers
``/kafka.connect.ConnectorService/SinkStream`` (connector.proto:17) as a
generic stream-stream handler whose serializers are the protowire codec,
so no protoc-generated stubs are required.

``grpcio`` is not installable in this environment (COVERAGE.md A22), so
:func:`serve` is availability-gated exactly like the avro/iceberg sink
formats: a clean ConfigError when the import fails, a working server when
a deployment provides the package."""

from __future__ import annotations

from franzoxide_spark.errors import ConfigError
from franzoxide_spark.ingest import protowire as pw
from franzoxide_spark.ingest.push import SinkStreamHandler

SERVICE_NAME = "kafka.connect.ConnectorService"


def grpc_available() -> bool:
    try:
        import grpc  # noqa: F401

        return True
    except ImportError:
        return False


def serve(handler: SinkStreamHandler, address: str = "[::]:50051"):
    """Start a gRPC server exposing SinkStream backed by ``handler``.

    Returns the started ``grpc.Server`` (caller stops it). Raises
    ConfigError when grpcio is absent — same gating contract as the
    avro/iceberg formats (object_sink.py:_check_format_available)."""
    try:
        import grpc
    except ImportError as e:
        raise ConfigError(
            "EP2 gRPC push-ingest requires the 'grpcio' package, which is"
            " not present in this environment; the wire codec and stream"
            " handler are available in-process via"
            " franzoxide_spark.ingest.push.SinkStreamHandler"
        ) from e

    rpc = grpc.stream_stream_rpc_method_handler(
        lambda request_iterator, context: handler.handle_stream(request_iterator),
        request_deserializer=pw.SinkRequest.decode,
        response_serializer=lambda resp: resp.encode(),
    )
    generic = grpc.method_handlers_generic_handler(
        SERVICE_NAME, {"SinkStream": rpc}
    )
    from concurrent import futures

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((generic,))
    server.add_insecure_port(address)
    server.start()
    return server
