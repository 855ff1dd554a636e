"""Read JSON-lines envelope objects back into KafkaRecord frames.

The inverse of the sink's A18 encoder: a consumer of the reference's S3
output parses the envelope lines, un-base64s marked payloads, and gets
the original records back. Payloads that were embedded as raw JSON come
back as their (possibly re-serialized) JSON text — byte-exact for the
base64 branch, parsed-JSON-equal for the JSON branch (SURVEY.md §7 risk 1:
envelope content is compared parsed-wise, not byte-wise).

The JSON branch is tiered, mirroring the sink's strict-sniff design:

1. JVM fast path — ``variant_get`` + ``to_json`` over the whole line.
   VARIANT preserves the member's JSON type (strings re-render quoted,
   ``null`` re-renders as ``null``) where ``get_json_object`` corrupts
   both. Member presence is decided by ``json_object_keys`` so a JSON
   ``null`` payload is never misread as omitted.
2. Python raw-extraction fallback — VARIANT itself is lossy on exactly
   the inputs the sink's strict sniff deliberately embeds verbatim:
   it rejects duplicate-key objects (``try_parse_json`` of the whole
   line -> NULL, so ``{"dup":1,"dup":2}`` would read back as omitted)
   and re-renders integers beyond its decimal range lossily (a 40-digit
   int -> ``1.2E39``). Rows flagged as at-risk (whole-line variant parse
   failed, or the raw member text contains a >=16-digit run) take an
   Arrow-batched pandas UDF that scans the line and returns the member's
   exact source text — byte-exact, so stronger than the module contract
   on precisely the rows where the fast path would be weaker.

Works on batch (``spark.read.text``) and streaming (``readStream.text``)
inputs alike — pass the DataFrame of lines.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

_WS = " \t\r\n"
# Digit-runs at or beyond this length can exceed exact int64/decimal
# rendering (2^63 is 19 digits; variant's decimal re-render was observed
# lossy from ~17 significant digits). Conservative: flag at 16. False
# positives (e.g. the run is inside a string) only cost the row a trip
# through the byte-exact fallback.
_RISKY_DIGIT_RUN = "[0-9]{16,}"


def _scan_string(line: str, i: int) -> int:
    """Index just past the closing quote of the string starting at ``i``."""
    i += 1
    n = len(line)
    while i < n:
        c = line[i]
        if c == "\\":
            i += 2
            continue
        if c == '"':
            return i + 1
        i += 1
    raise ValueError("unterminated string")


def _skip_value(line: str, i: int) -> int:
    """Index just past the JSON value starting at ``i`` (strict JSON)."""
    n = len(line)
    c = line[i]
    if c == '"':
        return _scan_string(line, i)
    if c in "{[":
        depth = 0
        while i < n:
            c = line[i]
            if c == '"':
                i = _scan_string(line, i)
                continue
            if c in "{[":
                depth += 1
            elif c in "}]":
                depth -= 1
                if depth == 0:
                    return i + 1
            i += 1
        raise ValueError("unbalanced value")
    # number / true / false / null
    while i < n and line[i] not in ",}]" + _WS:
        i += 1
    return i


def raw_member_text(line: str, field: str) -> str | None:
    """Exact source text of one top-level member of a strict-JSON object
    line — preserves duplicate keys and arbitrary-precision numerals that
    any parse-then-reserialize path would corrupt. None when absent or
    the line is not a JSON object."""
    try:
        n = len(line)
        i = 0
        while i < n and line[i] in _WS:
            i += 1
        if i >= n or line[i] != "{":
            return None
        i += 1
        while i < n:
            while i < n and line[i] in _WS + ",":
                i += 1
            if i >= n or line[i] == "}":
                return None
            if line[i] != '"':
                return None
            key_start = i
            i = _scan_string(line, i)
            key = json.loads(line[key_start:i])
            while i < n and line[i] in _WS:
                i += 1
            if i >= n or line[i] != ":":
                return None
            i += 1
            while i < n and line[i] in _WS:
                i += 1
            start = i
            i = _skip_value(line, i)
            if key == field:
                return line[start:i]
        return None
    except (ValueError, json.JSONDecodeError):
        return None


def _raw_member_udf(field: str):
    @pandas_udf("string")
    def extract(lines: pd.Series, risky: pd.Series) -> pd.Series:
        # Only flagged rows are scanned; the common case pays nothing
        # beyond the Arrow transfer.
        return pd.Series(
            [
                raw_member_text(ln, field) if (rk and ln is not None) else None
                for ln, rk in zip(lines, risky)
            ],
            dtype="object",
        )

    return extract


def _payload(line, field: str):
    """Recover the payload bytes of one envelope member.

    Decision table (fmt = ``{field}_format`` marker written by the sink,
    s3.rs:226-234 / 250-264):

    - fmt == base64 -> unbase64 of the raw string member; coalesced with
      empty bytes so an absent member still reads as empty (the
      envelope's empty-payload convention, s3.rs:208-212).
    - member absent from the line's top-level keys -> empty bytes.
    - at-risk row (see module docstring) -> byte-exact Python extraction.
    - otherwise -> VARIANT re-render (canonical-not-byte-exact, which is
      the module's parsed-JSON-equal contract).
    """
    col = F.col(line)
    fmt = F.get_json_object(col, f"$.{field}_format")
    b64 = F.get_json_object(col, f"$.{field}")
    var_txt = F.to_json(
        F.expr(f"variant_get(try_parse_json(`{line}`), '$.{field}')")
    )
    present = F.array_contains(F.expr(f"json_object_keys(`{line}`)"), field)
    raw_ish = F.get_json_object(col, f"$.{field}")
    risky = var_txt.isNull() | F.coalesce(
        raw_ish.rlike(_RISKY_DIGIT_RUN), F.lit(False)
    )
    py_txt = _raw_member_udf(field)(col, present & risky & (
        F.coalesce(fmt, F.lit("")) != "base64"
    ))
    empty = F.encode(F.lit(""), "UTF-8")
    return (
        F.when(fmt == "base64", F.coalesce(F.unbase64(b64), empty))
        .when(~F.coalesce(present, F.lit(False)), empty)
        # py_txt can be None on a row the strict Python scanner rejects but
        # json_object_keys accepted — fall back to the VARIANT rendering
        # (then empty) instead of introducing a SQL-NULL payload, an
        # outcome the decision table never otherwise produces.
        .when(
            risky,
            F.coalesce(
                F.encode(py_txt, "UTF-8"), F.encode(var_txt, "UTF-8"), empty
            ),
        )
        .otherwise(F.encode(var_txt, "UTF-8"))
    )


def parse_envelope_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    line = F.col(column)
    return lines.select(
        F.get_json_object(line, "$.topic").alias("topic"),
        F.get_json_object(line, "$.partition").cast("int").alias("partition"),
        F.get_json_object(line, "$.offset").cast("bigint").alias("offset"),
        F.get_json_object(line, "$.timestamp").cast("bigint").alias("timestamp"),
        _payload(column, "key").alias("key"),
        _payload(column, "value").alias("value"),
        F.coalesce(
            F.from_json(
                F.get_json_object(line, "$.headers"), "map<string,string>"
            ),
            F.create_map().cast("map<string,string>"),
        ).alias("headers"),
    )


def read_envelope_objects(spark: SparkSession, path: str) -> DataFrame:
    """Batch-read a sink output tree (text files, any partition layout)."""
    return parse_envelope_lines(
        spark.read.option("recursiveFileLookup", "true").text(path)
    )
