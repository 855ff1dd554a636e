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


def serve(
    handler: SinkStreamHandler,
    address: str = "[::]:50051",
    control=None,
    unix_socket_path: str | None = None,
):
    """Start a gRPC server exposing ConnectorService backed by ``handler``
    (SinkStream) and, when ``control`` (a
    :class:`franzoxide_spark.ingest.control.ControlPlaneHandler`) is given,
    GetConfig / UpdateConfig / GetStatus as unary RPCs.

    ``unix_socket_path`` additionally binds a unix-domain listener next to
    the TCP one — the reference's dual-transport server (A28, main.rs:26-157
    serves tcp_address AND unix_socket_path simultaneously).

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

    def unary(fn, req_decoder):
        """Wrap a control method: KeyError -> NOT_FOUND, ValueError ->
        INVALID_ARGUMENT (the reference's Status choices,
        service.rs:348-352, 375-377)."""

        def call(request, context):
            try:
                return fn(request)
            except KeyError as e:
                context.abort(grpc.StatusCode.NOT_FOUND, str(e))
            except ValueError as e:
                context.abort(grpc.StatusCode.INVALID_ARGUMENT, str(e))

        return grpc.unary_unary_rpc_method_handler(
            call,
            request_deserializer=req_decoder,
            response_serializer=lambda resp: resp.encode(),
        )

    methods = {
        "SinkStream": grpc.stream_stream_rpc_method_handler(
            lambda request_iterator, context: handler.handle_stream(
                request_iterator
            ),
            request_deserializer=pw.SinkRequest.decode,
            response_serializer=lambda resp: resp.encode(),
        )
    }
    if control is not None:
        methods["GetConfig"] = unary(control.get_config, pw.ConfigRequest.decode)
        methods["UpdateConfig"] = unary(
            control.update_config, pw.ConfigUpdateRequest.decode
        )
        methods["GetStatus"] = unary(control.get_status, pw.StatusRequest.decode)
    generic = grpc.method_handlers_generic_handler(SERVICE_NAME, methods)
    from concurrent import futures

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=4))
    server.add_generic_rpc_handlers((generic,))
    server.add_insecure_port(address)
    if unix_socket_path:
        server.add_insecure_port(f"unix:{unix_socket_path}")
    server.start()
    return server
