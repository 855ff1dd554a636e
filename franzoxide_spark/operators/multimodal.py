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


def resize_media(
    media_df: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Resize plumbing via mapInPandas: media in, media out, metadata
    updated to the target dimensions.

    ``fake=False`` raises NotImplementedError from the executors (a real
    resize needs PIL/ffmpeg). ``fake=True`` stride-samples the byte
    buffer to exactly ``width*height`` bytes (repeating when the source
    is shorter) — a deterministic stand-in with the same contract a real
    resizer has: output media is a binary column of the target size and
    ``meta`` reflects it. Map-side only; partition-parallel; bytes move
    Arrow-batched, never through Python row objects.
    """
    out_schema = MEDIA_SCHEMA

    def run(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media resize requires image libraries not present in"
                    " this environment; pass fake=True for the deterministic"
                    " stride-sample path"
                )
            out = []
            for blob in pdf["media"]:
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                if len(arr) == 0:
                    arr = np.zeros(1, dtype=np.uint8)
                idx = (np.arange(target) * len(arr)) // target
                out.append(arr[idx].tobytes())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media": out,
                    "meta": [
                        {"width": width, "height": height, "format": "fake/resized"}
                        for _ in out
                    ],
                }
            )

    return media_df.mapInPandas(run, schema=out_schema)


def sample_frames(
    media_df: DataFrame,
    frame_bytes: int = 256,
    every_n: int = 4,
    max_frames: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Frame-sampling plumbing via mapInPandas: one input row (a 'video')
    fans out to ≤ ``max_frames`` frame rows — the 1→N batch shape a real
    frame sampler has.

    ``fake=True`` treats the byte stream as fixed-size ``frame_bytes``
    frames and keeps every ``every_n``-th one; ``fake=False`` raises from
    the executors (a real sampler needs ffmpeg). Output rows carry
    (doc_id, frame_idx, frame) with frame_idx the ORIGINAL stream index,
    so downstream work can reconstruct timing. Fan-out happens inside
    the Arrow batch (no explode shuffle); partition-parallel.
    """
    out_schema = "doc_id bigint, frame_idx int, frame binary"

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires video libraries not present in"
                    " this environment; pass fake=True for the fixed-size"
                    " frame path"
                )
            ids, idxs, frames = [], [], []
            for doc_id, blob in zip(pdf["doc_id"], pdf["media"]):
                raw = bytes(blob)
                n_frames = max((len(raw) + frame_bytes - 1) // frame_bytes, 0)
                kept = 0
                for i in range(0, n_frames, every_n):
                    if kept >= max_frames:
                        break
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(raw[i * frame_bytes : (i + 1) * frame_bytes])
                    kept += 1
            yield pd.DataFrame(
                {"doc_id": ids, "frame_idx": idxs, "frame": frames}
            )

    return media_df.mapInPandas(run, schema=out_schema)
