"""Sequence packing: assign documents to fixed token-budget bins — the
batch/context-window construction step that follows curation (dedup ->
quality -> decontaminate -> split -> tokenize -> PACK) in a training-data
pipeline.

Packing is inherently sequential (a bin closes when the next document
would overflow it), so the distributed form shards the corpus into
deterministic chunks and packs each chunk independently with a
first-fit-sequential pass in id order:

- chunking is by ``floor(id / chunk_size)`` — a pure projection, so the
  shard a document lands in depends only on its id, never on partition
  count, input order, or sampling (``repartitionByRange`` would not give
  that guarantee);
- each chunk packs in one Arrow-batched ``applyInPandas`` group — the
  Python loop is bounded by ``chunk_size``, and chunks pack in parallel
  across executors;
- bins never span chunks. The waste this causes is at most one partial
  bin per chunk — with a 1 M-token chunk and an 8 k budget, < 1% — the
  standard trade for making packing embarrassingly parallel;
- the bin id is the smallest document id in the bin: deterministic,
  collision-free across chunks, and meaningful (the bin's head document).

Not SQL-expressible without recursion (first-fit needs a running bin
that RESETS on overflow — a stateful fold, not a window cumsum), so this
operator is property-tested (tests/test_packing.py) rather than
oracle-checked: bins respect the budget unless a single document
overflows alone, bins are contiguous id runs, every document is assigned
exactly once, and assignment survives arbitrary repartitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str = "n_tokens",
    budget: int = 2048,
    chunk_size: int = 100_000,
    out_col: str = "bin_id",
) -> DataFrame:
    """Add ``out_col``: the id of the token-budget bin each row packs
    into. First-fit-sequential in ``id_col`` order within deterministic
    ``floor(id / chunk_size)`` chunks; a document larger than ``budget``
    gets a bin of its own."""
    if budget <= 0:
        raise ValueError(f"budget must be positive, got {budget}")
    if chunk_size <= 0:
        raise ValueError(f"chunk_size must be positive, got {chunk_size}")

    out_schema = df.schema.add(out_col, "long")

    def pack(pdf):
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        bins = []
        head = None
        used = 0
        for doc_id, n in zip(pdf[id_col], pdf[tokens_col]):
            n = int(n)
            if head is None or used + n > budget:
                head = int(doc_id)
                used = 0
            used += n
            bins.append(head)
        pdf[out_col] = bins
        return pdf

    chunked = df.withColumn("__chunk", F.floor(F.col(id_col) / chunk_size))
    return chunked.groupBy("__chunk").applyInPandas(
        pack, schema=out_schema.add("__chunk", "long")
    ).drop("__chunk")
