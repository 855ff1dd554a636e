"""Corpus-rewrite deduplication: C4-style duplicated-span REMOVAL.

The dedup family so far either drops whole documents (q29/q33/q34/q35/
q57/q63) or measures span duplication (q67's coverage). This operator is
the missing third mode — the one C4 (Raffel et al. 2020, §2.2 "we
discard all but one of any three-sentence span occurring more than once
in the data set") and Lee et al. 2022's ExactSubstr actually ship: keep
every document, but REWRITE its text with the corpus-widely duplicated
spans cut out, preserving exactly one (the first) occurrence.

Adapted to the fixtures (single-space word streams, no sentence
boundaries): the span unit is a non-overlapping ``block``-token window —
the analogue of C4's three-sentence span. Semantics, mirrored exactly by
the SQL twin:

- tokenize; split each document's token stream into consecutive
  ``block``-token blocks (last one may be short);
- a block occurrence survives iff it is the globally FIRST occurrence of
  that block text, ordered by (doc_id, block_idx) — later repeats are
  removed, whether they sit in another document or later in the same
  one;
- each document's cleaned text is its surviving blocks re-joined in
  order; documents whose every block was seen earlier come out empty
  (n_kept = 0) rather than dropped — rewrite, not filter.

Scale notes (the 100 TB shape):
- One corpus-sized explode (map-only, runs in the scan stage), ONE wide
  shuffle keyed on the 60-bit block hash for the first-occurrence
  window, one doc-keyed shuffle to reassemble. No all-pairs work
  anywhere; the heaviest key's partition is bounded by the most-repeated
  block's occurrence count (boilerplate blocks — exactly what AQE skew
  split handles, and the window only needs the global min, so a
  min-aggregate + join rewrite stays available if one block dominates).
- The shuffle payload is (hash, doc_id, block_idx, block) — block text
  rides along only so the survivor can be reassembled without a second
  scan; at 100 TB you can instead re-scan and semi-join on the keeper
  (hash, doc_id, block_idx) triples to trade a scan for shuffle bytes.
- The window partitions on hash60 (md5-derived, identical expression in
  both engines) rather than the raw block string so the sort key is a
  fixed-width long; a 60-bit collision would merge two distinct blocks
  identically in engine and oracle (compare-safe, ~n^2/2^61 odds).

Reference: the connector (src/s3.rs) has no query surface; this is
Tier-C LLM-pipeline surface per SURVEY.md §2.3.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.text import hash60, sql_hash60, sql_tokens, tokens


def block_dedup_rewrite(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 16,
) -> DataFrame:
    """Remove corpus-widely duplicated ``block``-token spans, keeping the
    first occurrence; returns one row per input document:

    ``id_col, n_blocks int, n_kept int, clean_sig string`` — ``clean_sig``
    is the md5 of the rebuilt text (the compare artifact; the rebuilt
    text itself is one ``array_join`` away and intentionally not emitted
    to keep the result narrow).
    """
    if block <= 0:
        raise ValueError(f"block must be positive, got {block}")

    toks = tokens(text_col)
    n_blocks = F.ceil(F.size(toks) / F.lit(block)).cast("int")
    base = df.select(F.col(id_col), n_blocks.alias("n_blocks"))

    blk = df.select(
        F.col(id_col),
        F.posexplode(
            F.expr(
                f"transform(sequence(0, int(ceil(size(split(`{text_col}`, ' '))"
                f" / {block})) - 1),"
                f" i -> array_join(slice(split(`{text_col}`, ' '),"
                f" i * {block} + 1, {block}), ' '))"
            )
        ).alias("block_idx", "block"),
    )
    w = Window.partitionBy(hash60(F.col("block"))).orderBy(id_col, "block_idx")
    kept = (
        blk.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .groupBy(id_col)
        .agg(
            F.count("*").cast("int").alias("n_kept"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.struct("block_idx", "block"))),
                        lambda s: s["block"],
                    ),
                    " ",
                )
            ).alias("clean_sig"),
        )
    )
    return base.join(kept, id_col, "left").select(
        id_col,
        "n_blocks",
        F.coalesce("n_kept", F.lit(0)).cast("int").alias("n_kept"),
        F.coalesce("clean_sig", F.md5(F.lit(""))).alias("clean_sig"),
    )


def sql_block_dedup_rewrite(
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    block: int = 16,
) -> str:
    """DuckDB mirror — same blocks, same hash-keyed first-occurrence
    window, same ordered reassembly (``string_agg ... ORDER BY``)."""
    toks = sql_tokens(text_col)
    return f"""
WITH t AS (
  SELECT {id_col}, {toks} AS toks FROM {table}
),
blk AS (
  SELECT {id_col},
         CAST(i AS INT) AS block_idx,
         array_to_string(list_slice(toks, i * {block} + 1,
                                    (i + 1) * {block}), ' ') AS block
  FROM t, LATERAL unnest(range(CAST(ceil(len(toks) / {block}.0) AS BIGINT)))
           AS u(i)
),
keep AS (
  SELECT {id_col}, block_idx, block,
         ROW_NUMBER() OVER (PARTITION BY {sql_hash60('block')}
                            ORDER BY {id_col}, block_idx) AS rn
  FROM blk
),
agg AS (
  SELECT {id_col}, CAST(COUNT(*) AS INT) AS n_kept,
         md5(string_agg(block, ' ' ORDER BY block_idx)) AS clean_sig
  FROM keep WHERE rn = 1 GROUP BY {id_col}
)
SELECT t.{id_col} AS {id_col},
       CAST(ceil(len(t.toks) / {block}.0) AS INT) AS n_blocks,
       COALESCE(agg.n_kept, 0) AS n_kept,
       COALESCE(agg.clean_sig, md5('')) AS clean_sig
FROM t LEFT JOIN agg ON t.{id_col} = agg.{id_col}
"""
