"""Record-envelope encoding and object-key partitioning, Spark-first.

Re-expresses the reference sink's record transforms as pure Catalyst column
expressions (JVM-side, codegen'd — no Python in the hot path):

- JSON-lines envelope with JSON-sniff-else-base64 payload handling
  (reference: /root/reference/src/connector/sink/s3.rs:182-298 — key sniff
  208-236, value sniff 238-266, empty->omitted 208/238, headers 268-279).
- Default object-key naming ``{prefix}/{topic}/{partition}_{timestamp}.{ext}``
  (s3.rs:138-148) and Hive time-partitioned layout
  ``{prefix}/{topic}/year=Y/month=MM/day=DD/hour=HH/{offset}.{ext}``
  (s3.rs:161-177).

Envelope field order is fixed (topic, partition, offset, timestamp, key[,
key_format], value[, value_format], headers) and payload JSON is embedded
verbatim. The reference re-serializes through serde_json (sorted keys); we
deliberately keep the raw bytes — content is compared parsed-JSON-wise, not
byte-wise (SURVEY.md §7 risk 1).

Deviation from the reference, by design: ts<=0 falls back to ``now()`` in
the reference (s3.rs:164) which is nondeterministic; here ts<=0 partitions
to the epoch (1970-01-01) deterministically.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F


def json_strict_valid(payload: Column) -> Column:
    """Strict JSON validity of a binary payload, matching the reference's
    ``serde_json::from_slice`` (and DuckDB's ``json_valid``): requires
    valid UTF-8, rejects trailing garbage and NaN/Infinity literals.

    Spark's JVM-side parsers (get_json_object / try_parse_json) are
    Jackson-lenient where it corrupts (``{} x`` and ``{"a":1}junk`` are
    accepted — embedded verbatim they would break the envelope line) AND
    stricter where it loses data (duplicate-key objects are rejected while
    serde_json/json.loads accept them) — measured divergences in both
    directions, so no JVM expression can be exact and strictness needs the
    Arrow-batched pandas UDF below. It is the only Python in the envelope
    path; three tiers keep it cheap:

    1. first-non-ws-byte prefilter — no JSON value can start outside
       ``{["-0123456789tfn``, so obvious non-JSON (the common sink case)
       rejects without raising an exception;
    2. ``orjson.loads`` (C, ~10x stdlib) — spec-compliant: rejects
       trailing garbage and NaN/Infinity exactly like the reference;
       acceptance is final;
    3. stdlib ``json.loads`` fallback ONLY when orjson rejects, because
       orjson is stricter than the contract in rare cases (integers
       beyond 64-bit, lone surrogate escapes) — the stdlib verdict is
       definitive. Equivalence to pure json.loads is hypothesis-tested
       (tests/test_properties.py).
    """
    import json as _json

    def _reject_const(_):
        raise ValueError("non-standard JSON constant")

    @F.pandas_udf("boolean")
    def _strict(s: pd.Series) -> pd.Series:
        try:
            from orjson import loads as _fast_loads
        except ImportError:  # pragma: no cover - env without orjson
            _fast_loads = None
        first_bytes = frozenset(b'{["-0123456789tfn')

        def ok(b) -> bool:
            if b is None:
                return False
            bb = bytes(b)
            head = bb.lstrip(b" \t\n\r")
            if not head or head[0] not in first_bytes:
                return False
            if _fast_loads is not None:
                try:
                    _fast_loads(bb)
                    return True
                except Exception:
                    pass
            try:
                _json.loads(bb.decode("utf-8"), parse_constant=_reject_const)
                return True
            except Exception:
                return False

        return s.map(ok)

    return _strict(payload)


def _json_or_base64(field: str, payload: Column) -> Column:
    """The sniff operator: emit ``"<field>":<raw json>`` when the payload
    parses as (strict) JSON, else
    ``"<field>":"<base64>","<field>_format":"base64"``;
    NULL (omitted) when the payload is empty — s3.rs:208-266 semantics."""
    txt = payload.cast("string")
    as_json = F.concat(F.lit(f'"{field}":'), txt)
    # Spark's base64() is MIME-chunked: it inserts \r\n every 76 chars,
    # which is an unescaped control character inside a JSON string and
    # corrupts the envelope for payloads > ~57 bytes (hypothesis caught
    # this). Strip to the standard unwrapped alphabet (= reference's
    # base64 crate / DuckDB to_base64).
    as_b64 = F.concat(
        F.lit(f'"{field}":"'),
        F.regexp_replace(F.base64(payload), "[\\r\\n]", ""),
        F.lit(f'","{field}_format":"base64"'),
    )
    # Raw newlines/CRs make the embed arm span multiple PHYSICAL lines,
    # breaking every JSON-lines consumer of the text sink (r13 review).
    # Strict JSON admits them only as inter-token whitespace (raw control
    # chars inside strings are rejected by the sniff), so such payloads
    # are rare — route them through base64, which is line-safe. Deviation
    # from the reference (which re-serializes through serde_json and so
    # never emits raw newlines) documented alongside the keep-raw-bytes
    # deviation; the q23 oracle applies the identical rule.
    line_safe = ~(txt.contains("\n") | txt.contains("\r"))
    return (
        F.when(payload.isNull() | (F.length(payload) == 0), F.lit(None).cast("string"))
        .when(json_strict_valid(payload) & line_safe, as_json)
        .otherwise(as_b64)
    )


def envelope_json(
    topic: Column,
    partition: Column,
    offset: Column,
    timestamp_ms: Column,
    key: Column,
    value: Column,
    headers_json: Column | None = None,
) -> Column:
    """One JSON-lines envelope object per record (s3.rs:182-298).

    ``key``/``value`` are binary; ``headers_json`` is an already-rendered
    JSON object string (or NULL to omit).
    """
    # a NULL in any header field would NULL the whole concat segment and
    # concat_ws would then DROP it — emitting a line without its opening
    # '{' or header fields, silently-malformed JSON in the sink (r13
    # review). Render NULLs as JSON null instead.
    parts = [
        F.concat(
            F.lit('{"topic":'),
            F.when(topic.isNull(), F.lit("null")).otherwise(
                F.concat(F.lit('"'), topic, F.lit('"'))
            ),
            F.lit(',"partition":'),
            F.coalesce(partition.cast("string"), F.lit("null")),
            F.lit(',"offset":'),
            F.coalesce(offset.cast("string"), F.lit("null")),
            F.lit(',"timestamp":'),
            F.coalesce(timestamp_ms.cast("string"), F.lit("null")),
        ),
        _json_or_base64("key", key),
        _json_or_base64("value", value),
        F.when(headers_json.isNotNull(), F.concat(F.lit('"headers":'), headers_json))
        if headers_json is not None
        else F.lit(None).cast("string"),
    ]
    return F.concat(F.concat_ws(",", *parts), F.lit("}"))


def normalize_headers(headers: Column) -> Column:
    """Kafka-source headers (array<struct<key:string, value:binary>>) ->
    map<string,string>, dropping entries whose value is not valid UTF-8 and
    keeping the LAST occurrence of a repeated key — the reference's HashMap
    insert semantics (kafka.rs:111-121).

    UTF-8 validity proxy: a binary->string->binary round-trip is lossless
    iff the bytes were valid UTF-8 (invalid sequences are replaced).
    """
    valid = F.filter(
        headers,
        lambda h: h["value"].isNotNull()
        & (F.encode(h["value"].cast("string"), "UTF-8") == h["value"]),
    )
    # keep-last enforced EXPLICITLY (drop an entry when any LATER entry
    # repeats its key): map_from_entries alone only honors the contract
    # under spark.sql.mapKeyDedupPolicy=LAST_WIN — on Spark's default
    # (EXCEPTION) a repeated header key would kill the query instead
    # (r13 review; session.py sets LAST_WIN, but this function must not
    # depend on the caller's session factory).
    deduped = F.filter(
        valid,
        lambda h, i: ~F.exists(
            F.slice(valid, i + F.lit(2), F.size(valid)),
            lambda h2: h2["key"] == h["key"],
        ),
    )
    return F.map_from_entries(
        F.transform(deduped, lambda h: F.struct(h["key"], h["value"].cast("string")))
    )


def default_partition_key(
    prefix: str, topic: Column, partition: Column, timestamp_ms: Column, ext: str
) -> Column:
    """``{prefix}/{topic}/{partition}_{timestamp}.{ext}`` (s3.rs:138-148).

    Golden: prefix/test-topic/0_1234567890.json (s3.rs:836). The reference
    keys a whole flush group off its FIRST record (s3.rs:636-644), so
    same-timestamp groups overwrite — callers that need the reference's
    group behavior apply this to the group's min-offset record.
    """
    return F.concat_ws(
        "/",
        F.lit(prefix),
        topic,
        F.concat(partition.cast("string"), F.lit("_"), timestamp_ms.cast("string"), F.lit("." + ext)),
    )


def time_partition_cols(timestamp_ms: Column) -> list[Column]:
    """Hive partition columns year/month/day/hour from epoch-millis UTC
    (s3.rs:161-177, chrono UTC conversion). ts<=0 -> epoch, deterministic."""
    ts = F.timestamp_millis(F.when(timestamp_ms > 0, timestamp_ms).otherwise(F.lit(0)))
    return [
        F.year(ts).alias("year"),
        F.month(ts).alias("month"),
        F.dayofmonth(ts).alias("day"),
        F.hour(ts).alias("hour"),
    ]


def custom_time_partition_cols(
    timestamp_ms: Column, pattern: str
) -> list[tuple[str, Column]]:
    """B4 ``time_partition_pattern`` (connector.proto:210 — declared but
    never read by the reference): a '/'-separated list of Java
    ``date_format`` segments, each becoming one Hive partition column.

    A segment of the form ``'name'=fmt`` names its column (directory
    ``name=<rendered>``); bare segments get positional names ``pt0, pt1``.
    Rendering as Hive ``col=value`` directories (Spark's native layout,
    partition-prunable on read-back) rather than the raw rendered path the
    reference's proto implies — same divergence-by-design as A15/A16
    (SURVEY §7 risk 3). ts<=0 -> epoch, deterministic, matching
    :func:`time_partition_cols`."""
    import re

    from franzoxide_spark.errors import ConfigError

    ts = F.timestamp_millis(
        F.when(timestamp_ms > 0, timestamp_ms).otherwise(F.lit(0))
    )
    out: list[tuple[str, Column]] = []
    seen: set[str] = set()
    for i, seg in enumerate(_split_outside_quotes(pattern)):
        m = re.match(r"^'([A-Za-z_][A-Za-z0-9_]*)'=(.+)$", seg)
        name = m.group(1) if m else f"pt{i}"
        fmt = m.group(2) if m else seg
        if name == "topic":
            raise ConfigError(
                "time.partition.pattern segment may not be named 'topic'"
                " (reserved: the sink already partitions by topic)"
            )
        if name in seen:
            raise ConfigError(
                f"time.partition.pattern has duplicate segment name {name!r}"
                " — partition columns must be unique"
            )
        seen.add(name)
        out.append((name, F.date_format(ts, fmt)))
    return out


def _split_outside_quotes(pattern: str) -> list[str]:
    """Split a time.partition.pattern on '/' but never inside a Java
    ``date_format`` single-quoted literal, so ``'dt'=yyyy'/'MM`` stays one
    segment (a quoted '/' is a literal character of the format, not a
    directory separator)."""
    segs: list[str] = []
    buf: list[str] = []
    in_quote = False
    for ch in pattern:
        if ch == "'":
            in_quote = not in_quote
            buf.append(ch)
        elif ch == "/" and not in_quote:
            segs.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    segs.append("".join(buf))
    return segs


def time_partition_key(
    prefix: str, topic: Column, timestamp_ms: Column, offset: Column, ext: str
) -> Column:
    """``{prefix}/{topic}/year=Y/month=MM/day=DD/hour=HH/{offset}.{ext}``
    (s3.rs:161-177; golden shape s3.rs:838-851). Zero-padded month/day/hour."""
    y, m, d, h = time_partition_cols(timestamp_ms)
    return F.concat(
        F.lit(prefix + "/"),
        topic,
        F.lit("/year="),
        y.cast("string"),
        F.lit("/month="),
        F.format_string("%02d", m),
        F.lit("/day="),
        F.format_string("%02d", d),
        F.lit("/hour="),
        F.format_string("%02d", h),
        F.lit("/"),
        offset.cast("string"),
        F.lit("." + ext),
    )
