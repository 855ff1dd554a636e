"""Read JSON-lines envelope objects back into KafkaRecord frames.

The inverse of the sink's A18 encoder: a consumer of the reference's S3
output parses the envelope lines, un-base64s marked payloads, and gets
the original records back. Payloads that were embedded as raw JSON come
back as their (possibly re-serialized) JSON text — byte-exact for the
base64 branch, parsed-JSON-equal for the JSON branch (SURVEY.md §7 risk 1:
envelope content is compared parsed-wise, not byte-wise).

Works on batch (``spark.read.text``) and streaming (``readStream.text``)
inputs alike — pass the DataFrame of lines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _payload(line, field: str):
    """Recover the payload bytes of one envelope member.

    The JSON branch extracts through VARIANT (``variant_get`` + ``to_json``)
    rather than ``get_json_object``, because the latter unquotes top-level
    strings (a payload stored verbatim as ``"hello"`` would come back as
    the non-JSON bytes ``hello``) and returns SQL NULL for a JSON ``null``
    payload (misread as omitted). VARIANT preserves the member's JSON type:
    strings re-render quoted, ``null`` re-renders as ``null``, and only a
    genuinely absent member yields SQL NULL -> empty bytes. Rendering is
    canonical-not-byte-exact, which is exactly the module's parsed-JSON-
    equal contract; the base64 branch stays byte-exact via the raw string.
    """
    col = F.col(line)
    fmt = F.get_json_object(col, f"$.{field}_format")
    b64 = F.get_json_object(col, f"$.{field}")
    txt = F.to_json(F.expr(f"variant_get(try_parse_json(`{line}`), '$.{field}')"))
    return (
        F.when(fmt == "base64", F.unbase64(b64))
        .when(txt.isNull(), F.encode(F.lit(""), "UTF-8"))  # omitted -> empty
        .otherwise(F.encode(txt, "UTF-8"))
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
