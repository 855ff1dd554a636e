"""BPE tokenizer training and application.

The tokenizer-construction step of an LLM data pipeline: learn a
byte-pair-encoding merge table from the corpus (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units"; greedy
rank-based application as in GPT-2's public encoder), then encode the
corpus with it.

Scale shape — the part that matters at 100 TB:

- BPE training NEVER iterates over the corpus. It iterates over the
  **word-frequency table**: one corpus-sized shuffle (map-side-combined
  word count, optionally capped to the top-V words, which bounds driver
  state by construction) and every merge decision after that is a pass
  over that bounded table on the driver. This is how production trainers
  work (HuggingFace `tokenizers` trains from word counts too) — the
  corpus is read once regardless of the number of merges.
- Application is embarrassingly parallel: the merge table broadcasts
  (``n_merges`` rows), and each partition encodes via Arrow batches with
  a per-partition memo keyed on the distinct word — repeated words (the
  overwhelming majority at any scale, by Zipf) encode once per partition.
  No shuffle at all on the encode path.

Determinism: merge selection breaks ties (equal pair counts) by the
lexicographically smallest pair, so the learned table is identical across
runs, partitionings, and engines — asserted in tests against a
plain-Python reference implementation.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.functions.text import tokens

END = "</w>"


def word_counts(docs: DataFrame, text_col: str, top_words: int | None) -> DataFrame:
    """The ONE corpus-sized pass: map-side-combined word counts, capped
    to the ``top_words`` most frequent (ties broken by word asc) so the
    driver-side training state is bounded by construction."""
    wc = (
        docs.select(F.explode(tokens(text_col)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if top_words is not None:
        wc = wc.orderBy(F.desc("n"), F.asc("word")).limit(top_words)
    return wc


def train_bpe_from_counts(
    counts: list[tuple[str, int]], n_merges: int
) -> list[tuple[str, str]]:
    """Classic BPE training over a word-frequency table (driver-side —
    the table is bounded, the corpus is not). Deterministic: ties on the
    pair count go to the lexicographically smallest pair."""
    vocab: dict[tuple[str, ...], int] = {
        tuple(w) + (END,): c for w, c in counts if w
    }
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for sym, c in vocab.items():
            for i in range(len(sym) - 1):
                pairs[(sym[i], sym[i + 1])] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        new_vocab: dict[tuple[str, ...], int] = {}
        for sym, c in vocab.items():
            out = []
            i = 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Greedy rank-based BPE encode of one word (the GPT-2 public-encoder
    algorithm): repeatedly merge the present pair with the lowest merge
    rank until none of the word's pairs are in the table."""
    sym = list(word) + [END]
    while len(sym) > 1:
        pairs = {(sym[i], sym[i + 1]) for i in range(len(sym) - 1)}
        ranked = [(ranks[p], p) for p in pairs if p in ranks]
        if not ranked:
            break
        _, best = min(ranked)
        joined = best[0] + best[1]
        out = []
        i = 0
        while i < len(sym):
            if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                out.append(joined)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


# The merge-learning collect is DRIVER-side by design (BPE's argmax over
# pair counts is inherently sequential); its input must therefore be
# hard-bounded, not "usually small". A 100x corpus cannot grow it: the
# row count is min(top_words, distinct words), never corpus size.
_BPE_MAX_DRIVER_WORDS = 1_000_000


def learn_bpe(
    docs: DataFrame,
    text_col: str,
    *,
    n_merges: int = 200,
    top_words: int | None = 50_000,
) -> list[tuple[str, str]]:
    """Word-count shuffle → bounded driver-side merge learning.

    100 TB contract: the ONLY driver materialization is the top-V word
    table — ``top_words`` rows (TakeOrdered, never a global sort), a
    vocabulary-sized bound independent of corpus size. ``top_words=None``
    (unbounded, fine for tests/small corpora) is refused above
    ``_BPE_MAX_DRIVER_WORDS`` distinct words so a silent pass-through
    can never become an OOM-ing driver bottleneck at scale.
    """
    if top_words is not None and top_words > _BPE_MAX_DRIVER_WORDS:
        raise ValueError(
            f"top_words={top_words} exceeds the driver bound"
            f" {_BPE_MAX_DRIVER_WORDS}; BPE merge learning collects one row"
            " per vocabulary word"
        )
    wc = word_counts(docs, text_col, top_words)
    if top_words is None:
        # ONE job: take bound+1 rows — a result longer than the bound
        # proves the violation without a second full count pass
        rows = wc.limit(_BPE_MAX_DRIVER_WORDS + 1).collect()
        if len(rows) > _BPE_MAX_DRIVER_WORDS:
            raise ValueError(
                f"corpus has > {_BPE_MAX_DRIVER_WORDS} distinct words;"
                " pass top_words to bound the driver-side merge-learning"
                " input"
            )
    else:
        rows = wc.collect()
    counts = [(r["word"], r["n"]) for r in rows]
    assert len(counts) <= (top_words or _BPE_MAX_DRIVER_WORDS)
    counts.sort(key=lambda wc: (-wc[1], wc[0]))
    return train_bpe_from_counts(counts, n_merges)


def apply_bpe(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    merges: list[tuple[str, str]],
) -> DataFrame:
    """Encode every document: ``(id_col, n_bpe_tokens)``. Map-only — the
    merge table rides the closure (broadcast-equivalent at ``n_merges``
    rows), Arrow batches in/out, per-partition word memo."""
    ranks = {p: i for i, p in enumerate(merges)}
    out_schema = f"{id_col} long, n_bpe_tokens long"

    def enc(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict[str, int] = {}

        def doc_tokens(text: str) -> int:
            total = 0
            for w in text.split(" "):
                if not w:
                    continue
                n = memo.get(w)
                if n is None:
                    n = len(encode_word(w, ranks))
                    memo[w] = n
                total += n
            return total

        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_bpe_tokens": pdf[text_col].map(doc_tokens).astype("int64"),
                }
            )

    return docs.select(id_col, text_col).mapInPandas(enc, schema=out_schema)
