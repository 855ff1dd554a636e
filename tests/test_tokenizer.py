"""BPE tokenizer (operators/tokenizer.py): the training loop is checked
against the textbook sequential-merge reference, the rank-based encoder is
checked equivalent to applying merges in learned order, and the
distributed apply is checked deterministic and partitioning-independent."""

from __future__ import annotations

from pyspark.sql import functions as F

from franzoxide_spark.operators.tokenizer import (
    END,
    apply_bpe,
    encode_word,
    learn_bpe,
    train_bpe_from_counts,
)


def _ref_apply_in_order(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Reference encoder: apply each merge once, in learned order, over
    the whole symbol sequence (Sennrich et al.'s algorithm 1)."""
    sym = list(word) + [END]
    for a, b in merges:
        out, i = [], 0
        while i < len(sym):
            if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(sym[i])
                i += 1
        sym = out
    return sym


def test_training_matches_hand_computed_merges():
    # classic Sennrich corpus: {'low':5, 'lower':2, 'newest':6, 'widest':3}
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = train_bpe_from_counts(counts, 4)
    # est appears 9x (newest 6 + widest 3): e+s=9 wins first; ties after
    # go lexicographically. First merge must be ('e','s') -> ('es','t')
    # -> ('est','</w>') per the paper's example.
    assert merges[:3] == [("e", "s"), ("es", "t"), ("est", END)]


def test_rank_encoder_equals_sequential_reference():
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3), ("new", 4)]
    merges = train_bpe_from_counts(counts, 8)
    for w in ["low", "lower", "newest", "widest", "new", "lowest", "wider", "n"]:
        assert encode_word(w, {p: i for i, p in enumerate(merges)}) == \
            _ref_apply_in_order(w, merges), w


def test_encoding_round_trips_and_is_monotone():
    counts = [("abab", 10), ("abc", 5), ("baba", 3)]
    merges = train_bpe_from_counts(counts, 6)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["abab", "abc", "baba", "aabb", "cab"]:
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END  # lossless
        # more merges never lengthens an encoding
        for k in range(len(merges)):
            shorter = encode_word(w, {p: i for i, p in enumerate(merges[:k])})
            assert len(toks) <= len(shorter)


def test_distributed_apply_matches_driver_and_partitioning(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the dog sat on the log"),
        (3, "cats and dogs"),
        (4, "the the the cat cat"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    merges = learn_bpe(docs, "text", n_merges=10, top_words=None)
    ranks = {p: i for i, p in enumerate(merges)}
    expected = {
        i: sum(len(encode_word(w, ranks)) for w in t.split(" "))
        for i, t in rows
    }
    for parts in (1, 7):
        got = {
            r["doc_id"]: r["n_bpe_tokens"]
            for r in apply_bpe(
                docs.repartition(parts), "doc_id", "text", merges
            ).collect()
        }
        assert got == expected


def test_top_words_cap_bounds_training_state(spark):
    docs = spark.createDataFrame(
        [(i, f"w{i} common") for i in range(50)], "doc_id long, text string"
    )
    # cap of 1 keeps only 'common' (highest count) — merges never mention wN
    merges = learn_bpe(docs, "text", n_merges=5, top_words=1)
    flat = "".join(a + b for a, b in merges)
    assert "w1" not in flat and all("common".find(s) >= 0 or s == END
                                    for s in {m[0] for m in merges} if len(s) == 1)


def test_q138_runs_and_is_deterministic(spark, sf_dir):
    from franzoxide_spark.queries import QUERIES, load_all

    load_all()
    a = {tuple(r) for r in QUERIES["q138_bpe_tokenizer"](spark, sf_dir).collect()}
    b = {tuple(r) for r in QUERIES["q138_bpe_tokenizer"](spark, sf_dir).collect()}
    assert a == b and len(a) > 0


def test_learn_bpe_driver_bound_enforced(spark):
    """BPE merge learning collects one row per vocab word; the bound is
    explicit (r8) — an oversized top_words is refused up front."""
    import pytest

    from franzoxide_spark.operators.tokenizer import (
        _BPE_MAX_DRIVER_WORDS,
        learn_bpe,
    )

    docs = spark.createDataFrame(
        [(1, "a b a b c")], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="driver bound"):
        learn_bpe(docs, "text", top_words=_BPE_MAX_DRIVER_WORDS + 1)
    # top_words=None is fine when the distinct-word count is small
    merges = learn_bpe(docs, "text", n_merges=2, top_words=None)
    assert isinstance(merges, list)
