"""EP2 push-ingest tests: proto3 wire codec goldens + round-trips, the
SinkStream protocol state machine (mirroring the reference's own client
flow, test_grpc_sink.py:26-88), and the grpcio gating contract."""

from __future__ import annotations

import glob
import json
import os

import pytest

from franzoxide_spark.config import ConnectorConfig
from franzoxide_spark.errors import ConfigError
from franzoxide_spark.ingest import protowire as pw
from franzoxide_spark.ingest.grpc_server import grpc_available, serve
from franzoxide_spark.ingest.push import PushBatchSink, SinkStreamHandler


# -- wire codec -------------------------------------------------------------

def test_varint_goldens():
    assert pw.encode_varint(0) == b"\x00"
    assert pw.encode_varint(1) == b"\x01"
    assert pw.encode_varint(127) == b"\x7f"
    assert pw.encode_varint(128) == b"\x80\x01"
    assert pw.encode_varint(300) == b"\xac\x02"
    for n in (0, 1, 127, 128, 300, 2**32, 2**63 - 1, 2**64 - 1):
        v, pos = pw.decode_varint(pw.encode_varint(n), 0)
        assert (v, pos) == (n, len(pw.encode_varint(n)))


def test_kafka_record_wire_golden():
    """Canonical proto3 bytes, hand-computed from connector.proto:32-40 —
    what stock protoc emits for the same message (ascending field order,
    defaults omitted)."""
    r = pw.KafkaRecord(
        topic="t", partition=1, offset=2, timestamp=3,
        key=b"k", value=b"v", headers={"a": "b"},
    )
    expected = bytes(
        [0x0A, 0x01, 0x74]          # 1: "t"
        + [0x10, 0x01]              # 2: 1
        + [0x18, 0x02]              # 3: 2
        + [0x20, 0x03]              # 4: 3
        + [0x2A, 0x01, 0x6B]        # 5: b"k"
        + [0x32, 0x01, 0x76]        # 6: b"v"
        + [0x3A, 0x06, 0x0A, 0x01, 0x61, 0x12, 0x01, 0x62]  # 7: {"a":"b"}
    )
    assert r.encode() == expected
    assert pw.KafkaRecord.decode(expected) == r


def test_negative_int32_is_ten_byte_varint():
    """proto3 intN encodes negatives as 64-bit two's complement (always 10
    varint bytes) — partition=-1 must round-trip as protoc would encode."""
    r = pw.RecordId(topic="t", partition=-1, offset=-2)
    enc = r.encode()
    assert b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01" in enc
    assert pw.RecordId.decode(enc) == r


def test_record_batch_and_oneofs_round_trip():
    recs = [
        pw.KafkaRecord("test-topic", 0, i, 1700000000000 + i,
                       f"test-key-{i}".encode(),
                       json.dumps({"id": i}).encode(),
                       {"content-type": "application/json"})
        for i in range(10)
    ]
    req = pw.SinkRequest(record_batch=pw.RecordBatch(records=recs))
    assert pw.SinkRequest.decode(req.encode()) == req

    # empty flush: oneof PRESENCE must survive encoding even though the
    # member message is all-defaults (test_grpc_sink.py:57 sends exactly
    # this shape)
    flush = pw.SinkRequest(flush=pw.FlushRequest())
    enc = flush.encode()
    assert enc == b"\x1a\x00"
    assert pw.SinkRequest.decode(enc).flush is not None

    resp = pw.SinkResponse(
        ack=pw.RecordAck(
            record_ids=[pw.RecordId("test-topic", 0, i) for i in range(10)],
            success=True,
        )
    )
    back = pw.SinkResponse.decode(resp.encode())
    assert back == resp and len(back.ack.record_ids) == 10


def test_decoder_skips_unknown_fields():
    """Forward compat: a newer client adding field 99 must not break us."""
    r = pw.Heartbeat(timestamp=5)
    extra = pw.encode_varint((99 << 3) | 2) + b"\x03abc"
    assert pw.Heartbeat.decode(r.encode() + extra) == r


# -- protocol state machine -------------------------------------------------

def _push_sink(spark, tmp_path, fmt="json", extra=None):
    snk = ConnectorConfig(
        name="s3-sink",
        connector_class="object",
        connector_type="sink",
        topics=["test-topic"],
        config={
            "path.base": str(tmp_path / "out"),
            "s3.prefix": "data",
            "format.class": fmt,
            "partitioner.class": "default",
            **(extra or {}),
        },
    )
    return PushBatchSink(spark, snk, str(tmp_path / "ckpt"))


def test_sink_stream_put_flush_mirrors_reference_client(spark, tmp_path):
    """The reference's wire test flow (test_grpc_sink.py:26-88): a batch of
    10 JSON records then a flush; per-record acks, a flush response, and
    the records landing under data/<topic>/ — here via the envelope layout
    shared with the streaming sink."""
    handler = SinkStreamHandler(_push_sink(spark, tmp_path))
    recs = [
        pw.KafkaRecord(
            "test-topic", 0, i, 1700000000000,
            f"test-key-{i}".encode(),
            json.dumps({"id": i, "name": f"Test Record {i}"}).encode(),
            {"content-type": "application/json"},
        )
        for i in range(10)
    ]
    responses = list(
        handler.handle_stream(
            iter(
                [
                    pw.SinkRequest(heartbeat=pw.Heartbeat(timestamp=1)),
                    pw.SinkRequest(record_batch=pw.RecordBatch(records=recs)),
                    pw.SinkRequest(flush=pw.FlushRequest(request_id="rq1")),
                ]
            )
        )
    )
    assert responses[0].heartbeat is not None
    ack = responses[1].ack
    assert ack.success and len(ack.record_ids) == 10
    assert ack.record_ids[3] == pw.RecordId("test-topic", 0, 3)
    fr = responses[2].flush_response
    assert fr.success and fr.request_id == "rq1"

    files = glob.glob(
        os.path.join(
            str(tmp_path / "out"), "data", "topic=test-topic", "partition=0", "*.txt"
        )
    )
    assert files, "flush did not write envelope objects"
    lines = [ln for f in files for ln in open(f).read().splitlines() if ln]
    assert len(lines) == 10
    env = json.loads(lines[0])
    assert env["topic"] == "test-topic"
    assert env["headers"] == {"content-type": "application/json"}


def test_push_flush_empty_and_error_paths(spark, tmp_path):
    handler = SinkStreamHandler(_push_sink(spark, tmp_path))
    # flush with nothing buffered: success, no files
    resp = handler.handle(pw.SinkRequest(flush=pw.FlushRequest(request_id="e")))
    assert resp.flush_response.success
    # empty request -> ConnectorError response, not an exception
    resp = handler.handle(pw.SinkRequest())
    assert resp.error is not None and resp.error.error_code == "BAD_REQUEST"


def test_push_probe_error_fails_closed_on_object_store(spark, tmp_path):
    """r14 ADVICE: a failed _spark_metadata probe on a '://' target used
    to silently fall back to the local-only check — i.e. silently skip
    the guard on exactly the remote targets it exists for. It must now
    fail the flush (the client's at-least-once retry re-probes); on a
    LOCAL path the fallback still applies, with a warning."""
    from franzoxide_spark.errors import SinkError

    sink = _push_sink(spark, tmp_path)
    rec = pw.KafkaRecord("test-topic", 0, 0, 1, b"k", b"v", {})

    # object-store target: the s3a probe errors in this env (no
    # hadoop-aws jar / creds) -> flush refuses instead of guessing
    sink.sink.path = "s3a://no-such-bucket-xyz/data"
    sink.put([rec])
    with pytest.raises(SinkError, match="could not probe"):
        sink.flush()
    # the buffer survives the failed flush (at-least-once retry)
    assert len(sink._buffer) == 1

    # local target with a broken JVM probe: falls back to os.path and
    # the flush proceeds
    class _JvmFails:
        def __init__(self, real):
            self._real = real

        def __getattr__(self, name):
            if name == "_jvm":
                raise RuntimeError("jvm gone")
            return getattr(self._real, name)

    sink.sink.path = os.path.join(str(tmp_path / "out"), "data")
    sink.spark = _JvmFails(spark)
    assert sink.flush() == 1
    files = glob.glob(os.path.join(sink.sink.path, "**", "*.txt"),
                      recursive=True)
    assert files


def test_push_flush_time_and_field_partitioners(spark, tmp_path):
    """flush() must run the sink's _prepare so time/field partition
    columns exist before repartition/partitionBy — the call was dropped
    when the _spark_metadata guard landed, breaking every non-default
    partitioner push with an unresolved-column error (r14 advice)."""
    # time partitioner: 2024-01-15T12:xx UTC epoch-millis
    sink = _push_sink(
        spark, tmp_path / "t", extra={"partitioner.class": "time"}
    )
    handler = SinkStreamHandler(sink)
    recs = [
        pw.KafkaRecord(
            "test-topic", 0, i, 1705320000000, b"", b'{"id": 1}', {}
        )
        for i in range(3)
    ]
    handler.handle(pw.SinkRequest(record_batch=pw.RecordBatch(records=recs)))
    resp = handler.handle(pw.SinkRequest(flush=pw.FlushRequest(request_id="t")))
    assert resp.flush_response.success, resp.flush_response.message
    files = glob.glob(
        os.path.join(
            str(tmp_path / "t" / "out"), "data", "topic=test-topic",
            "year=2024", "month=01", "day=15", "hour=*", "*.txt",
        )
    )
    assert files, "time-partitioned push flush wrote nothing"
    assert sum(1 for f in files for ln in open(f) if ln.strip()) == 3

    # field partitioner: directory from the JSON payload field
    sink = _push_sink(
        spark, tmp_path / "f",
        extra={"partitioner.class": "field", "partition.field": "region"},
    )
    handler = SinkStreamHandler(sink)
    recs = [
        pw.KafkaRecord(
            "test-topic", 0, i, 1700000000000, b"",
            json.dumps({"region": r}).encode(), {},
        )
        for i, r in enumerate(["eu", "us", "eu"])
    ]
    handler.handle(pw.SinkRequest(record_batch=pw.RecordBatch(records=recs)))
    resp = handler.handle(pw.SinkRequest(flush=pw.FlushRequest(request_id="f")))
    assert resp.flush_response.success, resp.flush_response.message
    eu = glob.glob(
        os.path.join(
            str(tmp_path / "f" / "out"), "data", "topic=test-topic",
            "region=eu", "*.txt",
        )
    )
    us = glob.glob(
        os.path.join(
            str(tmp_path / "f" / "out"), "data", "topic=test-topic",
            "region=us", "*.txt",
        )
    )
    assert sum(1 for f in eu for ln in open(f) if ln.strip()) == 2
    assert sum(1 for f in us for ln in open(f) if ln.strip()) == 1


def test_push_parquet_format_and_streamed_equivalence(spark, tmp_path):
    """Pushed records through format.class=parquet are readable back with
    the KafkaRecord columns intact."""
    sink = _push_sink(spark, tmp_path, fmt="parquet")
    handler = SinkStreamHandler(sink)
    recs = [
        pw.KafkaRecord("test-topic", p, i, 1700000000000, b"", b"x", {})
        for p in (0, 1)
        for i in range(5)
    ]
    handler.handle(pw.SinkRequest(record_batch=pw.RecordBatch(records=recs)))
    handler.handle(pw.SinkRequest(flush=pw.FlushRequest(request_id="p")))
    back = spark.read.parquet(os.path.join(str(tmp_path / "out"), "data"))
    assert back.count() == 10
    assert set(back.select("partition").distinct().toPandas()["partition"]) == {0, 1}


# -- grpcio gating ----------------------------------------------------------

def test_grpc_serve_gated_or_live(spark, tmp_path):
    """Without grpcio: serve() raises a clean ConfigError (the gating
    contract shared with avro/iceberg). With grpcio: a real server must
    answer the SinkStream flow over an insecure channel."""
    handler = SinkStreamHandler(_push_sink(spark, tmp_path))
    if not grpc_available():
        with pytest.raises(ConfigError, match="grpcio"):
            serve(handler)
        return

    import grpc

    server = serve(handler, "localhost:50099")
    try:
        channel = grpc.insecure_channel("localhost:50099")
        stream = channel.stream_stream(
            "/kafka.connect.ConnectorService/SinkStream",
            request_serializer=lambda r: r.encode(),
            response_deserializer=pw.SinkResponse.decode,
        )
        reqs = iter(
            [
                pw.SinkRequest(
                    record_batch=pw.RecordBatch(
                        records=[pw.KafkaRecord("test-topic", 0, 1, 1, b"k", b"v", {})]
                    )
                ),
                pw.SinkRequest(flush=pw.FlushRequest(request_id="live")),
            ]
        )
        out = list(stream(reqs))
        assert out[0].ack.success and out[1].flush_response.success
    finally:
        server.stop(0)


# -- control plane ----------------------------------------------------------

def test_control_messages_round_trip():
    cfg = pw.ConnectorConfigMsg(
        connector_class="io.rustconnect.S3SinkConnector",
        name="s3-sink",
        config={"s3.bucket.name": "b", "flush.size": "100"},
        tasks_max=2,
    )
    assert pw.ConnectorConfigMsg.decode(cfg.encode()) == cfg
    assert pw.ConfigResponse.decode(pw.ConfigResponse(config=cfg).encode()).config == cfg
    assert (
        pw.ConfigUpdateRequest.decode(pw.ConfigUpdateRequest(config=cfg).encode()).config
        == cfg
    )
    st = pw.StatusResponse(
        state=pw.STATE_RUNNING,
        worker_id="w",
        tasks=[pw.TaskStatus(task_id=1, state=pw.STATE_RUNNING, worker_id="w-1")],
    )
    assert pw.StatusResponse.decode(st.encode()) == st
    assert pw.ConfigRequest.decode(pw.ConfigRequest("x").encode()).connector_name == "x"


def test_control_plane_handler_bridges_manager(spark, sf_dir, tmp_path):
    """GetConfig mirrors the live config (A24); GetStatus maps engine
    states onto the proto enum with per-task fan-out (A25/B15; the
    reference panics unimplemented!, service.rs:384-421); UpdateConfig
    performs the B14 checkpoint-preserving restart (reference panics,
    service.rs:368-381)."""
    from test_streaming import _pipeline_config, _write_record_files

    from franzoxide_spark.ingest.control import ControlPlaneHandler
    from franzoxide_spark.manager import ConnectorManager

    in_dir, total, _ = _write_record_files(spark, sf_dir, str(tmp_path / "in"))
    cfg = _pipeline_config(in_dir, str(tmp_path / "out"))
    mgr = ConnectorManager(spark, cfg, str(tmp_path / "ckpt"))
    mgr.initialize()
    ctl = ControlPlaneHandler(mgr)

    got = ctl.get_config(pw.ConfigRequest(connector_name="json-sink")).config
    assert got.connector_class == "io.rustconnect.S3SinkConnector"
    assert got.config["format.class"] == "json"

    # pre-start: UNASSIGNED; running: RUNNING; stopped: PAUSED
    assert ctl.get_status(pw.StatusRequest("file-source")).state == pw.STATE_UNASSIGNED
    mgr.start()
    st = ctl.get_status(pw.StatusRequest("file-source"))
    assert st.state == pw.STATE_RUNNING and len(st.tasks) == 1
    assert st.tasks[0].state == pw.STATE_RUNNING

    # UpdateConfig = B14 restart with merged options over the wire shape
    resp = ctl.update_config(
        pw.ConfigUpdateRequest(
            config=pw.ConnectorConfigMsg(
                name="file-source", config={"files.per.trigger": "3"}
            )
        )
    )
    assert resp.config.config["files.per.trigger"] == "3"
    assert mgr.config.connector("file-source").config["files.per.trigger"] == "3"
    mgr.process_all_available()
    mgr.stop()
    assert ctl.get_status(pw.StatusRequest("file-source")).state == pw.STATE_PAUSED

    with pytest.raises(KeyError, match="not found"):
        ctl.get_config(pw.ConfigRequest("ghost"))
    with pytest.raises(ValueError, match="Missing"):
        ctl.update_config(pw.ConfigUpdateRequest())


# -- example daemon glue ----------------------------------------------------

def test_example_daemon_grpc_gate(spark, tmp_path):
    """examples/run_pipeline._maybe_serve_grpc mirrors the reference
    daemon's startup (main.rs:100-157): serves only when the config
    carries transport fields AND an object sink exists AND grpcio is
    importable; otherwise degrades to a notice, never an exception."""
    import examples.run_pipeline as rp
    from franzoxide_spark.config import load_config

    def cfg(extra):
        p = tmp_path / "c.json"
        p.write_text(json.dumps({
            "kafka": {"bootstrap_servers": ["localhost:9092"], "group_id": "g"},
            **extra,
        }))
        return load_config(str(p))

    sink = {
        "name": "fs-sink", "connector_class": "io.rustconnect.S3SinkConnector",
        "connector_type": "sink", "topics": ["t1"],
        "config": {"path.base": str(tmp_path / "out"), "format.class": "json",
                   "partitioner.class": "default"},
    }

    # no transport fields -> no server, regardless of sinks
    c = cfg({"connectors": [sink]})
    assert rp._maybe_serve_grpc(spark, None, c, str(tmp_path / "ck")) is None

    # transport fields but no object sink -> skip
    c = cfg({"tcp_address": "127.0.0.1:50097", "connectors": []})
    assert rp._maybe_serve_grpc(spark, None, c, str(tmp_path / "ck")) is None

    # transport fields + sink: gated None without grpcio, live server with
    c = cfg({"tcp_address": "127.0.0.1:50097", "connectors": [sink]})
    server = rp._maybe_serve_grpc(spark, None, c, str(tmp_path / "ck"))
    if grpc_available():
        assert server is not None
        server.stop(0)
    else:
        assert server is None
