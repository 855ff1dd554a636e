"""Pure-Python proto3 wire codec for the EP2 SinkStream message family.

The reference's push-ingest data plane (connector.proto:76-98, served by
src/grpc/service.rs:102-335) speaks protobuf over gRPC. Neither ``grpcio``
nor ``protobuf`` is installable in this environment, so wire compatibility
is provided by hand-implementing the proto3 encoding for exactly the
messages SinkStream uses. The proto3 wire format is a small, stable spec
(varint tags, little-endian length-delimited fields), so this codec is
golden-tested against hand-computed canonical bytes — a client built from
the reference's connector.proto with stock protoc (e.g. the reference's
own test_grpc_sink.py) produces bytes this module decodes, and vice versa.

Field numbers and types mirror connector.proto:
- KafkaRecord      proto:32-40  (topic 1, partition 2, offset 3,
                                 timestamp 4, key 5, value 6, headers 7)
- RecordBatch      proto:148-150 (records 1)
- RecordId         proto:158-162 (topic 1, partition 2, offset 3)
- RecordAck        proto:152-156 (record_ids 1, success 2, error_message 3)
- FlushRequest     proto:168-170 (request_id 1)
- FlushResponse    proto:172-176 (request_id 1, success 2, error_message 3)
- Heartbeat        proto:144-146 (timestamp 1)
- ConnectorError   proto:178-182 (error_message 1, error_code 2,
                                  stack_trace 3)
- SinkRequest      proto:76-85   (oneof: heartbeat 1 | record_batch 2 |
                                  flush 3)
- SinkResponse     proto:87-98   (oneof: heartbeat 1 | ack 2 | error 3 |
                                  flush_response 4)

Only features those messages need are implemented: varint (wire type 0)
and length-delimited (wire type 2) fields, repeated messages, and
map<string,string> (encoded per spec as repeated entry messages with
key=1/value=2). Unknown fields are skipped on decode (forward compat);
proto3 default values are omitted on encode (canonical form).
"""

from __future__ import annotations

from dataclasses import dataclass, field


# -- wire primitives --------------------------------------------------------

def encode_varint(n: int) -> bytes:
    """Unsigned LEB128. proto3 int32/int64 encode negatives as the 64-bit
    two's complement (always 10 bytes) — callers mask before encoding."""
    if n < 0:
        raise ValueError("encode_varint takes the unsigned representation")
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def decode_varint(buf: bytes, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not (b & 0x80):
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("varint too long")


def _signed64(u: int) -> int:
    """Unsigned 64-bit varint payload -> Python int per proto3 intN."""
    return u - (1 << 64) if u >= (1 << 63) else u


def _unsigned64(s: int) -> int:
    return s & 0xFFFFFFFFFFFFFFFF


def _tag(field_no: int, wire_type: int) -> bytes:
    return encode_varint((field_no << 3) | wire_type)


def _varint_field(field_no: int, value: int) -> bytes:
    """intN/bool field; proto3 canonical form omits zero values."""
    if not value:
        return b""
    return _tag(field_no, 0) + encode_varint(_unsigned64(int(value)))


def _len_field(field_no: int, payload: bytes) -> bytes:
    if not payload:
        return b""
    return _tag(field_no, 2) + encode_varint(len(payload)) + payload


def _str_field(field_no: int, value: str) -> bytes:
    return _len_field(field_no, value.encode("utf-8"))


def _map_field(field_no: int, m: dict[str, str]) -> bytes:
    """map<string,string>: repeated entry submessages (key=1, value=2),
    emitted in insertion order (protoc's Python/Rust runtimes emit map
    entries unordered — decoders must not rely on order, and this one
    doesn't)."""
    out = bytearray()
    for k, v in m.items():
        entry = _str_field(1, k) + _str_field(2, v)
        out += _tag(field_no, 2) + encode_varint(len(entry)) + entry
    return bytes(out)


def _skip_field(buf: bytes, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = decode_varint(buf, pos)
        return pos
    if wire_type == 1:
        return pos + 8
    if wire_type == 2:
        n, pos = decode_varint(buf, pos)
        return pos + n
    if wire_type == 5:
        return pos + 4
    raise ValueError(f"unsupported wire type {wire_type}")


def _fields(buf: bytes):
    """Iterate (field_no, wire_type, value) over a message's bytes; value
    is an int for varint fields and bytes for length-delimited ones."""
    pos = 0
    while pos < len(buf):
        tag, pos = decode_varint(buf, pos)
        field_no, wire_type = tag >> 3, tag & 0x7
        if wire_type == 0:
            v, pos = decode_varint(buf, pos)
            yield field_no, wire_type, v
        elif wire_type == 2:
            n, pos = decode_varint(buf, pos)
            if pos + n > len(buf):
                raise ValueError("truncated length-delimited field")
            yield field_no, wire_type, buf[pos : pos + n]
            pos += n
        else:
            yield field_no, wire_type, None
            pos = _skip_field(buf, pos, wire_type)


def _decode_map_entry(buf: bytes) -> tuple[str, str]:
    k = v = ""
    for fno, wt, val in _fields(buf):
        if fno == 1 and wt == 2:
            k = val.decode("utf-8")
        elif fno == 2 and wt == 2:
            v = val.decode("utf-8")
    return k, v


# -- messages ---------------------------------------------------------------

@dataclass
class KafkaRecord:
    topic: str = ""
    partition: int = 0
    offset: int = 0
    timestamp: int = 0
    key: bytes = b""
    value: bytes = b""
    headers: dict[str, str] = field(default_factory=dict)

    def encode(self) -> bytes:
        return (
            _str_field(1, self.topic)
            + _varint_field(2, self.partition)
            + _varint_field(3, self.offset)
            + _varint_field(4, self.timestamp)
            + _len_field(5, self.key)
            + _len_field(6, self.value)
            + _map_field(7, self.headers)
        )

    @classmethod
    def decode(cls, buf: bytes) -> "KafkaRecord":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r.topic = val.decode("utf-8")
            elif fno == 2 and wt == 0:
                r.partition = _signed64(val)
            elif fno == 3 and wt == 0:
                r.offset = _signed64(val)
            elif fno == 4 and wt == 0:
                r.timestamp = _signed64(val)
            elif fno == 5 and wt == 2:
                r.key = bytes(val)
            elif fno == 6 and wt == 2:
                r.value = bytes(val)
            elif fno == 7 and wt == 2:
                k, v = _decode_map_entry(val)
                r.headers[k] = v
        return r


@dataclass
class RecordBatch:
    records: list[KafkaRecord] = field(default_factory=list)

    def encode(self) -> bytes:
        out = bytearray()
        for r in self.records:
            p = r.encode()
            out += _tag(1, 2) + encode_varint(len(p)) + p
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "RecordBatch":
        b = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                b.records.append(KafkaRecord.decode(val))
        return b


@dataclass
class RecordId:
    topic: str = ""
    partition: int = 0
    offset: int = 0

    def encode(self) -> bytes:
        return (
            _str_field(1, self.topic)
            + _varint_field(2, self.partition)
            + _varint_field(3, self.offset)
        )

    @classmethod
    def decode(cls, buf: bytes) -> "RecordId":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r.topic = val.decode("utf-8")
            elif fno == 2 and wt == 0:
                r.partition = _signed64(val)
            elif fno == 3 and wt == 0:
                r.offset = _signed64(val)
        return r


@dataclass
class RecordAck:
    record_ids: list[RecordId] = field(default_factory=list)
    success: bool = False
    error_message: str = ""

    def encode(self) -> bytes:
        out = bytearray()
        for r in self.record_ids:
            p = r.encode()
            out += _tag(1, 2) + encode_varint(len(p)) + p
        out += _varint_field(2, int(self.success))
        out += _str_field(3, self.error_message)
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "RecordAck":
        a = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                a.record_ids.append(RecordId.decode(val))
            elif fno == 2 and wt == 0:
                a.success = bool(val)
            elif fno == 3 and wt == 2:
                a.error_message = val.decode("utf-8")
        return a


@dataclass
class FlushRequest:
    request_id: str = ""

    def encode(self) -> bytes:
        return _str_field(1, self.request_id)

    @classmethod
    def decode(cls, buf: bytes) -> "FlushRequest":
        f = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                f.request_id = val.decode("utf-8")
        return f


@dataclass
class FlushResponse:
    request_id: str = ""
    success: bool = False
    error_message: str = ""

    def encode(self) -> bytes:
        return (
            _str_field(1, self.request_id)
            + _varint_field(2, int(self.success))
            + _str_field(3, self.error_message)
        )

    @classmethod
    def decode(cls, buf: bytes) -> "FlushResponse":
        f = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                f.request_id = val.decode("utf-8")
            elif fno == 2 and wt == 0:
                f.success = bool(val)
            elif fno == 3 and wt == 2:
                f.error_message = val.decode("utf-8")
        return f


@dataclass
class Heartbeat:
    timestamp: int = 0

    def encode(self) -> bytes:
        return _varint_field(1, self.timestamp)

    @classmethod
    def decode(cls, buf: bytes) -> "Heartbeat":
        h = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 0:
                h.timestamp = _signed64(val)
        return h


@dataclass
class ConnectorError:
    error_message: str = ""
    error_code: str = ""
    stack_trace: str = ""

    def encode(self) -> bytes:
        return (
            _str_field(1, self.error_message)
            + _str_field(2, self.error_code)
            + _str_field(3, self.stack_trace)
        )

    @classmethod
    def decode(cls, buf: bytes) -> "ConnectorError":
        e = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                e.error_message = val.decode("utf-8")
            elif fno == 2 and wt == 2:
                e.error_code = val.decode("utf-8")
            elif fno == 3 and wt == 2:
                e.stack_trace = val.decode("utf-8")
        return e


@dataclass
class SinkRequest:
    """oneof request: exactly one of the three is non-None."""

    heartbeat: Heartbeat | None = None
    record_batch: RecordBatch | None = None
    flush: FlushRequest | None = None

    def encode(self) -> bytes:
        # oneof member fields encode like ordinary submessage fields, but a
        # set member is emitted even when empty (presence IS the payload:
        # e.g. SinkRequest(flush=FlushRequest()) from test_grpc_sink.py:57).
        if self.heartbeat is not None:
            p = self.heartbeat.encode()
            return _tag(1, 2) + encode_varint(len(p)) + p
        if self.record_batch is not None:
            p = self.record_batch.encode()
            return _tag(2, 2) + encode_varint(len(p)) + p
        if self.flush is not None:
            p = self.flush.encode()
            return _tag(3, 2) + encode_varint(len(p)) + p
        return b""

    @classmethod
    def decode(cls, buf: bytes) -> "SinkRequest":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r = cls(heartbeat=Heartbeat.decode(val))
            elif fno == 2 and wt == 2:
                r = cls(record_batch=RecordBatch.decode(val))
            elif fno == 3 and wt == 2:
                r = cls(flush=FlushRequest.decode(val))
        return r


@dataclass
class SinkResponse:
    """oneof response (connector.proto:87-98)."""

    heartbeat: Heartbeat | None = None
    ack: RecordAck | None = None
    error: ConnectorError | None = None
    flush_response: FlushResponse | None = None

    def encode(self) -> bytes:
        if self.heartbeat is not None:
            p = self.heartbeat.encode()
            return _tag(1, 2) + encode_varint(len(p)) + p
        if self.ack is not None:
            p = self.ack.encode()
            return _tag(2, 2) + encode_varint(len(p)) + p
        if self.error is not None:
            p = self.error.encode()
            return _tag(3, 2) + encode_varint(len(p)) + p
        if self.flush_response is not None:
            p = self.flush_response.encode()
            return _tag(4, 2) + encode_varint(len(p)) + p
        return b""

    @classmethod
    def decode(cls, buf: bytes) -> "SinkResponse":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r = cls(heartbeat=Heartbeat.decode(val))
            elif fno == 2 and wt == 2:
                r = cls(ack=RecordAck.decode(val))
            elif fno == 3 and wt == 2:
                r = cls(error=ConnectorError.decode(val))
            elif fno == 4 and wt == 2:
                r = cls(flush_response=FlushResponse.decode(val))
        return r


# -- control-plane messages (connector.proto:20-27, 100-141) ----------------
# GetConfig is real in the reference (service.rs:337-365); UpdateConfig and
# GetStatus are declared but panic with unimplemented!() (service.rs:368-381,
# 384-421) — the Spark shim implements all three for real (ingest/control.py).


@dataclass
class ConnectorConfigMsg:
    """proto ConnectorConfig (connector.proto:43-48). Named *Msg to avoid
    clashing with franzoxide_spark.config.ConnectorConfig (the engine-side
    model this message converts to/from in ingest/control.py)."""

    connector_class: str = ""
    name: str = ""
    config: dict[str, str] = field(default_factory=dict)
    tasks_max: int = 0

    def encode(self) -> bytes:
        return (
            _str_field(1, self.connector_class)
            + _str_field(2, self.name)
            + _map_field(3, self.config)
            + _varint_field(4, self.tasks_max)
        )

    @classmethod
    def decode(cls, buf: bytes) -> "ConnectorConfigMsg":
        c = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                c.connector_class = val.decode("utf-8")
            elif fno == 2 and wt == 2:
                c.name = val.decode("utf-8")
            elif fno == 3 and wt == 2:
                k, v = _decode_map_entry(val)
                c.config[k] = v
            elif fno == 4 and wt == 0:
                c.tasks_max = _signed64(val)
        return c


@dataclass
class ConfigRequest:
    connector_name: str = ""

    def encode(self) -> bytes:
        return _str_field(1, self.connector_name)

    @classmethod
    def decode(cls, buf: bytes) -> "ConfigRequest":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r.connector_name = val.decode("utf-8")
        return r


@dataclass
class ConfigUpdateRequest:
    config: ConnectorConfigMsg | None = None

    def encode(self) -> bytes:
        if self.config is None:
            return b""
        p = self.config.encode()
        return _tag(1, 2) + encode_varint(len(p)) + p

    @classmethod
    def decode(cls, buf: bytes) -> "ConfigUpdateRequest":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r.config = ConnectorConfigMsg.decode(val)
        return r


@dataclass
class ConfigResponse:
    config: ConnectorConfigMsg | None = None

    def encode(self) -> bytes:
        if self.config is None:
            return b""
        p = self.config.encode()
        return _tag(1, 2) + encode_varint(len(p)) + p

    @classmethod
    def decode(cls, buf: bytes) -> "ConfigResponse":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r.config = ConnectorConfigMsg.decode(val)
        return r


@dataclass
class StatusRequest:
    connector_name: str = ""

    def encode(self) -> bytes:
        return _str_field(1, self.connector_name)

    @classmethod
    def decode(cls, buf: bytes) -> "StatusRequest":
        r = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 2:
                r.connector_name = val.decode("utf-8")
        return r


# StatusResponse.State enum values (connector.proto:119-126)
STATE_UNKNOWN = 0
STATE_RUNNING = 1
STATE_PAUSED = 2
STATE_FAILED = 3
STATE_UNASSIGNED = 4


@dataclass
class TaskStatus:
    task_id: int = 0
    state: int = STATE_UNKNOWN
    worker_id: str = ""
    error_message: str = ""

    def encode(self) -> bytes:
        return (
            _varint_field(1, self.task_id)
            + _varint_field(2, self.state)
            + _str_field(3, self.worker_id)
            + _str_field(4, self.error_message)
        )

    @classmethod
    def decode(cls, buf: bytes) -> "TaskStatus":
        t = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 0:
                t.task_id = _signed64(val)
            elif fno == 2 and wt == 0:
                t.state = val
            elif fno == 3 and wt == 2:
                t.worker_id = val.decode("utf-8")
            elif fno == 4 and wt == 2:
                t.error_message = val.decode("utf-8")
        return t


@dataclass
class StatusResponse:
    state: int = STATE_UNKNOWN
    worker_id: str = ""
    tasks: list[TaskStatus] = field(default_factory=list)
    error_message: str = ""

    def encode(self) -> bytes:
        out = bytearray(_varint_field(1, self.state))
        out += _str_field(2, self.worker_id)
        for t in self.tasks:
            p = t.encode()
            out += _tag(3, 2) + encode_varint(len(p)) + p
        out += _str_field(4, self.error_message)
        return bytes(out)

    @classmethod
    def decode(cls, buf: bytes) -> "StatusResponse":
        s = cls()
        for fno, wt, val in _fields(buf):
            if fno == 1 and wt == 0:
                s.state = val
            elif fno == 2 and wt == 2:
                s.worker_id = val.decode("utf-8")
            elif fno == 3 and wt == 2:
                s.tasks.append(TaskStatus.decode(val))
            elif fno == 4 and wt == 2:
                s.error_message = val.decode("utf-8")
        return s
