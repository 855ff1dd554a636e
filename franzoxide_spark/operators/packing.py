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


# --------------------------------------------------------------------------
# length-bucketed batch planning + padding-waste audit
# --------------------------------------------------------------------------


def length_batch_plan(
    docs: DataFrame,
    id_col: str,
    tokens_col: str,
    group_col: str,
    batch_docs: int = 16,
) -> DataFrame:
    """Plan fixed-size training batches of length-sorted documents and
    audit the padding waste: within each group, documents sort by
    (token count, id) and chunk into consecutive runs of ``batch_docs``;
    a batch pads every member to its longest member, so length-sorting
    minimizes the waste. Output one row per batch: (group, batch_id,
    n_docs, max_len, sum_len, pad_tokens, efficiency) — the numbers
    that decide batch size and bucketing granularity before a training
    run (pad_tokens IS the wasted compute).

    Scale shape: ONE shuffle on the group key; the sort and row_number
    run inside each group's partition and the batch aggregation reuses
    the same partitioning (no second exchange). Groups are the
    parallelism unit — for a single giant group, pre-split it with a
    hash shard exactly like operators/ordering.py's shard-major
    permutation (same trade: batches never cross shards).
    """
    from pyspark.sql import Window

    w = Window.partitionBy("grp").orderBy("__len", id_col)
    batched = docs.select(
        F.col(group_col).alias("grp"),
        F.col(id_col),
        F.col(tokens_col).alias("__len"),
    ).withColumn(
        "batch_id",
        ((F.row_number().over(w) - 1) / batch_docs).cast("int"),
    )
    n = F.count("*")
    mx = F.max("__len")
    sm = F.sum("__len")
    return (
        batched.groupBy("grp", "batch_id")
        .agg(
            n.cast("int").alias("n_docs"),
            mx.cast("int").alias("max_len"),
            sm.cast("int").alias("sum_len"),
            (n * mx - sm).cast("int").alias("pad_tokens"),
            F.round(
                sm.cast("double") / (n * mx).cast("double"), 6
            ).alias("efficiency"),
        )
        .withColumnRenamed("grp", group_col)
    )


def sql_length_batch_plan(
    table: str,
    id_col: str,
    tokens_expr: str,
    group_col: str,
    batch_docs: int = 16,
) -> str:
    return f"""
WITH base AS (
  SELECT {group_col} AS grp, {id_col}, {tokens_expr} AS len FROM {table}
),
batched AS (
  SELECT grp, {id_col}, len,
         CAST((ROW_NUMBER() OVER (PARTITION BY grp ORDER BY len, {id_col})
               - 1) // {batch_docs} AS INT) AS batch_id
  FROM base
)
SELECT grp AS {group_col}, batch_id,
       CAST(COUNT(*) AS INT) AS n_docs,
       CAST(MAX(len) AS INT) AS max_len,
       CAST(SUM(len) AS INT) AS sum_len,
       CAST(COUNT(*) * MAX(len) - SUM(len) AS INT) AS pad_tokens,
       ROUND(CAST(SUM(len) AS DOUBLE)
             / CAST(COUNT(*) * MAX(len) AS DOUBLE), 6) AS efficiency
FROM batched GROUP BY grp, batch_id
"""
