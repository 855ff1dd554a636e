"""Multimodal column plumbing: opaque binary media + typed metadata.

The pattern for image/audio/video at 100 TB: media travels as a ``binary``
column next to a typed metadata struct; per-record decode/feature work runs
in Arrow-batched ``mapInPandas`` so bytes never round-trip through Python
row objects. The actual codec step needs media libraries that are NOT in
this container, so decode is STUBBED (raises unless ``fake=True``); all
Spark-side plumbing — schema, batch iteration, partition-parallel
execution, byte-level stats — is real and tested.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id bigint, media binary, "
    "meta struct<width:int, height:int, format:string>"
)


def media_frame_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic fake media: the document text's UTF-8 bytes stand in
    for an encoded image, with synthesized dimensions."""
    return docs.select(
        "doc_id",
        F.encode("text", "UTF-8").alias("media"),
        F.struct(
            (F.col("n_chars") % 640).cast("int").alias("width"),
            (F.col("n_chars") % 480).cast("int").alias("height"),
            F.lit("fake/v1").alias("format"),
        ).alias("meta"),
    )


def byte_stats(media_df: DataFrame) -> DataFrame:
    """Pure-expression byte-level features (no decode needed)."""
    return media_df.select(
        "doc_id",
        F.length("media").alias("byte_len"),
        F.substring(F.sha2("media", 256), 1, 16).alias("sha256_pfx"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.format").alias("format"),
    )


def extract_features(
    media_df: DataFrame, bins: int = 8, fake: bool = False
) -> DataFrame:
    """Decode + feature-extract via mapInPandas.

    ``fake=False`` raises NotImplementedError from the executors (the real
    decoder needs PIL/ffmpeg — not in this container). ``fake=True``
    computes a deterministic byte-histogram 'feature vector' so the full
    Arrow batch path is exercised end-to-end.
    """
    out_schema = "doc_id bigint, feat array<double>"

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires image/audio libraries not present"
                    " in this environment; pass fake=True for the"
                    " deterministic byte-histogram path"
                )
            feats = []
            for blob in pdf["media"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                hist = np.bincount(arr % bins, minlength=bins)
                total = max(len(arr), 1)
                feats.append((hist / total).tolist())
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feat": feats})

    return media_df.mapInPandas(run, schema=out_schema)
