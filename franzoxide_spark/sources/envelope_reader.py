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
    raw = F.get_json_object(line, f"$.{field}")
    fmt = F.get_json_object(line, f"$.{field}_format")
    return (
        F.when(raw.isNull(), F.encode(F.lit(""), "UTF-8"))  # omitted -> empty
        .when(fmt == "base64", F.unbase64(raw))
        .otherwise(F.encode(raw, "UTF-8"))
    )


def parse_envelope_lines(lines: DataFrame, column: str = "value") -> DataFrame:
    line = F.col(column)
    return lines.select(
        F.get_json_object(line, "$.topic").alias("topic"),
        F.get_json_object(line, "$.partition").cast("int").alias("partition"),
        F.get_json_object(line, "$.offset").cast("bigint").alias("offset"),
        F.get_json_object(line, "$.timestamp").cast("bigint").alias("timestamp"),
        _payload(line, "key").alias("key"),
        _payload(line, "value").alias("value"),
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
