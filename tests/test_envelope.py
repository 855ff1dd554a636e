"""Golden tests for the envelope encoder and partition-key derivations,
ported from the reference's own unit tests (s3.rs:799-851 key goldens;
integration-test payload shapes per SURVEY.md §5 / FIXTURES.md §1)."""

from __future__ import annotations

import base64
import json

from pyspark.sql import Row
from pyspark.sql import functions as F

from franzoxide_spark.functions.envelope import (
    default_partition_key,
    envelope_json,
    normalize_headers,
    time_partition_key,
)


def _one(df, col="out"):
    return df.select(F.col(col)).collect()[0][0]


def test_default_partition_key_golden(spark):
    # s3.rs:836 golden: prefix/test-topic/0_1234567890.json
    df = spark.createDataFrame([Row(topic="test-topic", partition=0, ts=1234567890)])
    out = df.select(
        default_partition_key(
            "prefix", F.col("topic"), F.col("partition"), F.col("ts"), "json"
        ).alias("out")
    )
    assert _one(out) == "prefix/test-topic/0_1234567890.json"


def test_time_partition_key_golden(spark):
    # s3.rs:838-851 shape: prefix/topic/year=Y/month=MM/day=DD/hour=HH/offset.ext
    # 2021-02-03T04:05:06Z = 1612325106000 ms
    df = spark.createDataFrame([Row(topic="test-topic", offset=100, ts=1612325106000)])
    out = df.select(
        time_partition_key("prefix", F.col("topic"), F.col("ts"), F.col("offset"), "json").alias("out")
    )
    assert _one(out) == "prefix/test-topic/year=2021/month=02/day=03/hour=04/100.json"


def test_time_partition_key_zero_ts_is_epoch(spark):
    # deliberate deviation from s3.rs:164 (now() fallback): ts<=0 -> epoch
    df = spark.createDataFrame([Row(topic="t", offset=7, ts=0)])
    out = df.select(
        time_partition_key("p", F.col("topic"), F.col("ts"), F.col("offset"), "json").alias("out")
    )
    assert _one(out) == "p/t/year=1970/month=01/day=01/hour=00/7.json"


def _envelope_for(spark, key: bytes, value: bytes, headers_json=None):
    df = spark.createDataFrame([Row(key=key, value=value)])
    hdr = F.lit(headers_json) if headers_json else F.lit(None).cast("string")
    out = df.select(
        envelope_json(
            F.lit("test-topic"), F.lit(0), F.lit(42), F.lit(1234567890),
            F.col("key"), F.col("value"), hdr,
        ).alias("out")
    )
    return json.loads(_one(out))


def test_envelope_json_value(spark):
    # integration_test payload shape: JSON value, plain-string key -> base64
    val = b'{"id": 1, "name": "Test 1", "value": 100}'
    env = _envelope_for(spark, b"key-1", val)
    assert env["topic"] == "test-topic"
    assert env["partition"] == 0
    assert env["offset"] == 42
    assert env["timestamp"] == 1234567890
    assert env["value"] == {"id": 1, "name": "Test 1", "value": 100}
    assert "value_format" not in env
    assert env["key_format"] == "base64"
    assert base64.b64decode(env["key"]) == b"key-1"


def test_envelope_empty_key_omitted(spark):
    env = _envelope_for(spark, b"", b'{"a":1}', '{"h":"v"}')
    assert "key" not in env and "key_format" not in env
    assert env["value"] == {"a": 1}
    assert env["headers"] == {"h": "v"}


def test_envelope_binary_value_base64(spark):
    env = _envelope_for(spark, b'{"k":1}', b"\xff\xfenot-json")
    assert env["key"] == {"k": 1}
    assert env["value_format"] == "base64"
    assert base64.b64decode(env["value"]) == b"\xff\xfenot-json"


def test_headers_json_always_emits_object(spark):
    """s3.rs:268-279 parity: the sink's headers renderer emits '{}' for
    empty (or null) header maps instead of omitting the member."""
    from franzoxide_spark.sinks.object_sink import _headers_json

    df = spark.createDataFrame(
        [("a", {"h": "v"}), ("b", {}), ("c", None)],
        "tag string, h map<string,string>",
    )
    got = {
        r["tag"]: r["out"]
        for r in df.select("tag", _headers_json(F.col("h")).alias("out")).collect()
    }
    assert json.loads(got["a"]) == {"h": "v"}
    assert got["b"] == "{}"
    assert got["c"] == "{}"


def test_envelope_reader_scalar_and_null_payloads(spark):
    """A payload stored verbatim as a top-level JSON string or null must
    round-trip as valid JSON bytes (get_json_object would unquote the
    string and misread null as omitted)."""
    from franzoxide_spark.sources.envelope_reader import parse_envelope_lines

    lines = [
        '{"topic":"t","partition":0,"offset":1,"timestamp":5,"value":"hello","headers":{}}',
        '{"topic":"t","partition":0,"offset":2,"timestamp":5,"value":null,"headers":{}}',
        '{"topic":"t","partition":0,"offset":3,"timestamp":5,"headers":{}}',
        '{"topic":"t","partition":0,"offset":4,"timestamp":5,"value":{"a":1},"headers":{}}',
        '{"topic":"t","partition":0,"offset":5,"timestamp":5,'
        '"value":"aGk=","value_format":"base64","headers":{}}',
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    got = {r["offset"]: bytes(r["value"]) for r in parse_envelope_lines(df).collect()}
    assert json.loads(got[1]) == "hello"  # quoted string stays valid JSON
    assert json.loads(got[2]) is None     # JSON null preserved, not omitted
    assert got[3] == b""                  # genuinely absent -> empty bytes
    assert json.loads(got[4]) == {"a": 1}
    assert got[5] == b"hi"                # base64 branch stays byte-exact


def test_envelope_reader_verbatim_edge_payloads(spark):
    """Payloads the sink's strict sniff embeds verbatim but VARIANT
    corrupts: duplicate-key objects (try_parse_json of the whole line
    fails -> would read back as omitted) and integers beyond variant's
    decimal range (would re-render as 1.2E39). The flagged-row raw
    extraction must return the exact source text; a clean member on the
    same poisoned line must also survive."""
    from franzoxide_spark.sources.envelope_reader import parse_envelope_lines

    big = "1234567890123456789012345678901234567890"
    lines = [
        # 1: dup-key object payload — whole-line variant parse fails
        '{"topic":"t","partition":0,"offset":1,"timestamp":5,'
        '"value":{"dup":1,"dup":2},"headers":{}}',
        # 2: 40-digit integer payload
        '{"topic":"t","partition":0,"offset":2,"timestamp":5,'
        f'"value":{big},"headers":{{}}}}',
        # 3: big int nested inside an object
        '{"topic":"t","partition":0,"offset":3,"timestamp":5,'
        f'"value":{{"n":{big}}},"headers":{{}}}}',
        # 4: dup-key KEY poisons the line; string VALUE must stay quoted
        '{"topic":"t","partition":0,"offset":4,"timestamp":5,'
        '"key":{"dup":1,"dup":2},"value":"hi","headers":{}}',
        # 5: dup-key key + absent value -> empty bytes, not NULL
        '{"topic":"t","partition":0,"offset":5,"timestamp":5,'
        '"key":{"dup":1,"dup":2},"headers":{}}',
    ]
    df = spark.createDataFrame([(ln,) for ln in lines], "value string")
    rows = {r["offset"]: r for r in parse_envelope_lines(df).collect()}
    assert bytes(rows[1]["value"]) == b'{"dup":1,"dup":2}'
    assert bytes(rows[2]["value"]) == big.encode()
    assert bytes(rows[3]["value"]) == b'{"n":%s}' % big.encode()
    assert bytes(rows[4]["key"]) == b'{"dup":1,"dup":2}'
    assert bytes(rows[4]["value"]) == b'"hi"'
    assert bytes(rows[5]["value"]) == b""


def test_envelope_reader_base64_absent_member(spark):
    """ADVICE r2: {field}_format=='base64' with the member itself absent
    must yield empty bytes (the envelope's empty-payload convention),
    not NULL from unbase64(NULL)."""
    from franzoxide_spark.sources.envelope_reader import parse_envelope_lines

    df = spark.createDataFrame(
        [(
            '{"topic":"t","partition":0,"offset":1,"timestamp":5,'
            '"value_format":"base64","headers":{}}',
        )],
        "value string",
    )
    row = parse_envelope_lines(df).collect()[0]
    assert row["value"] is not None
    assert bytes(row["value"]) == b""


def test_raw_member_text_scanner():
    """Pure-Python scanner unit: exact source spans, strict-JSON shapes."""
    from franzoxide_spark.sources.envelope_reader import raw_member_text

    line = '{"a": {"x":[1,{"y":"}"}]} , "b": "q\\"uote", "c": null, "d": 1e4}'
    assert raw_member_text(line, "a") == '{"x":[1,{"y":"}"}]}'
    assert raw_member_text(line, "b") == '"q\\"uote"'
    assert raw_member_text(line, "c") == "null"
    assert raw_member_text(line, "d") == "1e4"
    assert raw_member_text(line, "zz") is None
    assert raw_member_text("not json", "a") is None
    assert raw_member_text('{"u":"\\u0041b"}', "u") == '"\\u0041b"'


def test_normalize_headers_drops_non_utf8_keeps_last(spark):
    # kafka.rs:111-121: non-UTF8 header values silently dropped; repeated
    # keys keep the last occurrence (HashMap insert).
    rows = [
        Row(
            headers=[
                Row(key="a", value=b"one"),
                Row(key="bad", value=b"\xff\xfe"),
                Row(key="a", value=b"two"),
            ]
        )
    ]
    df = spark.createDataFrame(rows)
    out = df.select(normalize_headers(F.col("headers")).alias("m")).collect()[0]["m"]
    assert out == {"a": "two"}


def test_custom_pattern_quoted_slash_and_validation(spark):
    """ADVICE r3 (functions/envelope.py custom pattern): a quoted '/' is a
    literal character of a date_format segment, not a directory separator;
    duplicate or reserved segment names are config errors."""
    import pytest as _pytest

    from franzoxide_spark.errors import ConfigError
    from franzoxide_spark.functions.envelope import (
        _split_outside_quotes,
        custom_time_partition_cols,
    )

    assert _split_outside_quotes("'dt'=yyyy'/'MM/'hr'=HH") == [
        "'dt'=yyyy'/'MM",
        "'hr'=HH",
    ]
    assert _split_outside_quotes("yyyy/MM") == ["yyyy", "MM"]

    cols = custom_time_partition_cols(F.lit(1704067200000), "'dt'=yyyy'/'MM")
    assert [name for name, _ in cols] == ["dt"]
    rendered = spark.range(1).select(cols[0][1].alias("dt")).collect()[0]["dt"]
    assert rendered == "2024/01"  # quoted slash is literal in the value

    with _pytest.raises(ConfigError, match="duplicate"):
        custom_time_partition_cols(F.lit(0), "'a'=yyyy/'a'=MM")
    with _pytest.raises(ConfigError, match="topic"):
        custom_time_partition_cols(F.lit(0), "'topic'=yyyy")


def test_envelope_newline_json_goes_base64_and_stays_one_line(spark):
    """Strictly-valid JSON with a raw inter-token newline must NOT be
    embedded verbatim — the envelope would span two physical lines and
    break every JSON-lines consumer of the text sink (r13 review).
    Documented deviation: such payloads take the base64 arm."""
    val = b'{"a":\n1}'
    json.loads(val)  # sanity: genuinely valid JSON
    env = _envelope_for(spark, b"k", val)
    assert env["value_format"] == "base64"
    assert base64.b64decode(env["value"]) == val
    out = spark.range(1).select(
        envelope_json(
            F.lit("t"), F.lit(0), F.lit(1), F.lit(2),
            F.lit(b"k"), F.lit(val), F.lit(None).cast("string"),
        ).alias("out")
    )
    assert "\n" not in _one(out)


def test_envelope_null_header_fields_render_json_null(spark):
    """A NULL timestamp (or topic/partition/offset) must render as JSON
    null — previously it NULLed the whole first concat segment, which
    concat_ws silently DROPPED, writing a line missing its opening '{'
    (r13 review)."""
    out = spark.range(1).select(
        envelope_json(
            F.lit("t"), F.lit(0), F.lit(7),
            F.lit(None).cast("long"),
            F.lit(b"k"), F.lit(b'{"a":1}'), F.lit(None).cast("string"),
        ).alias("out")
    )
    env = json.loads(_one(out))
    assert env["timestamp"] is None and env["offset"] == 7


def test_normalize_headers_keeps_last_without_session_policy(spark):
    """The keep-last contract must hold WITHOUT relying on
    spark.sql.mapKeyDedupPolicy=LAST_WIN from the session factory — on
    Spark's default (EXCEPTION) a repeated key previously crashed the
    query (r13 review)."""
    from franzoxide_spark.functions.envelope import normalize_headers

    prev = spark.conf.get("spark.sql.mapKeyDedupPolicy")
    spark.conf.set("spark.sql.mapKeyDedupPolicy", "EXCEPTION")
    try:
        df = spark.createDataFrame(
            [([("h", b"first"), ("h", b"last"), ("x", b"v")],)],
            "headers array<struct<key:string,value:binary>>",
        )
        row = df.select(normalize_headers(F.col("headers")).alias("m")).first()
        assert row["m"] == {"h": "last", "x": "v"}
    finally:
        spark.conf.set("spark.sql.mapKeyDedupPolicy", prev)
