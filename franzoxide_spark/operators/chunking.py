"""Document chunking: split long documents into overlapping token
windows — the context-window preparation step between curation
(dedup -> quality -> decontaminate, operators/curation.py) and sequence
packing (operators/packing.py) in a training-data pipeline. Also the
standard preprocessing for embedding/retrieval corpora, where the
embedder's context limit forces fixed-size windows with overlap.

Spark-first shape: the whole operator is ONE codegen'd projection —
tokenize, generate chunk starts (``sequence``), drop fully-redundant
tails (``filter``), ``posexplode``, ``slice`` — so it runs inside
WholeStageCodegen with no UDF, no shuffle, and no state. At 100 TB the
plan is a map-only pass whose output partitioning inherits the scan's;
the row multiplication (~n_tokens/stride per doc) happens executor-side
after column pruning, so only ``text`` plus passthrough columns are
ever read. tests/test_chunking.py pins semantics against a DuckDB
mirror (:func:`sql_chunk_documents`) and audits the no-UDF/no-Exchange
plan.

Chunk-start semantics (mirrored exactly in the SQL twin):

- starts are ``0, stride, 2*stride, ...`` with ``stride = window -
  overlap``, while ``start < n_tokens``;
- a tail start with ``start + overlap >= n_tokens`` is dropped (except
  ``start == 0``): such a chunk's tokens are wholly inside the previous
  chunk's window, so it would add no new content;
- every token lands in >= 1 chunk (full coverage), every chunk has
  <= ``window`` tokens, and ``chunk_idx = start / stride`` is derived
  arithmetically so no ordinality bookkeeping is needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import tokens


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    overlap: int = 8,
) -> DataFrame:
    """Explode each document into overlapping ``window``-token chunks.

    Returns one row per chunk: every input column except ``text_col``,
    plus ``chunk_idx`` (0-based, per document), ``chunk_text`` (the
    window re-joined with single spaces) and ``chunk_tokens`` (its token
    count; only the final chunk of a document may be short). The
    original text column is dropped — repeating a multi-KB document per
    chunk row is exactly the write amplification a 100 TB pass cannot
    afford.
    """
    if window <= 0:
        raise ValueError(f"window must be positive, got {window}")
    if not 0 <= overlap < window:
        raise ValueError(
            f"overlap must satisfy 0 <= overlap < window, got {overlap}"
        )
    stride = window - overlap

    toks = tokens(text_col)
    n = F.size(toks)
    starts = F.filter(
        F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0)), F.lit(stride)),
        lambda s: (s == 0) | (s + F.lit(overlap) < n),
    )
    passthrough = [c for c in df.columns if c != text_col]
    exploded = df.select(
        *passthrough,
        F.col(text_col).alias("__text"),
        F.explode(starts).alias("__start"),
    )
    chunk = F.slice(tokens("__text"), F.col("__start") + 1, window)
    return exploded.select(
        *passthrough,
        (F.col("__start") / stride).cast("int").alias("chunk_idx"),
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("chunk_tokens"),
    )


def sql_chunk_documents(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 64,
    overlap: int = 8,
) -> str:
    """DuckDB mirror of :func:`chunk_documents` (same starts, same
    slices), used by the test oracle so the operator's semantics are
    cross-engine-pinned like the rest of the curation family."""
    stride = window - overlap
    return f"""
        WITH t AS (
            SELECT {id_col},
                   string_split({text_col}, ' ') AS toks
            FROM {table}
        ),
        s AS (
            SELECT {id_col}, toks,
                   unnest(list_filter(
                       generate_series(0, greatest(len(toks) - 1, 0), {stride}),
                       s -> s = 0 OR s + {overlap} < len(toks))) AS start
            FROM t
        )
        SELECT {id_col},
               CAST(start / {stride} AS int) AS chunk_idx,
               array_to_string(
                   list_slice(toks, start + 1, start + {window}), ' '
               ) AS chunk_text,
               len(list_slice(toks, start + 1, start + {window}))
                   AS chunk_tokens
        FROM s
    """
