"""Semantics of the C4-style block-dedup rewrite (operators/rewrite.py).

The registry-level DuckDB parity (tests/test_oracle_queries.py::q82)
pins the fixture behavior; these tests pin the SEMANTICS on hand-built
corpora where the expected rewrite is known by construction: global
first-occurrence survival, within-document repeats, whole-document
wipeouts, short-tail blocks, and the md5 signature actually matching the
rebuilt text.
"""

from __future__ import annotations

import hashlib

from franzoxide_spark.operators.rewrite import block_dedup_rewrite


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _run(spark, rows, block):
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = block_dedup_rewrite(df, block=block).orderBy("doc_id").collect()
    return {r.doc_id: (r.n_blocks, r.n_kept, r.clean_sig) for r in out}


def test_first_occurrence_survives_later_docs_lose_the_block(spark):
    # doc 1's first block reappears as doc 2's first block -> doc 2 keeps
    # only its distinct second block
    rows = [
        (1, "a b c d"),
        (2, "a b e f"),
    ]
    got = _run(spark, rows, block=2)
    assert got[1] == (2, 2, _md5("a b c d"))
    assert got[2] == (2, 1, _md5("e f"))


def test_within_document_repeat_is_also_removed(spark):
    rows = [(7, "x y x y z w")]
    got = _run(spark, rows, block=2)
    assert got[7] == (3, 2, _md5("x y z w"))


def test_fully_duplicated_document_comes_out_empty_not_dropped(spark):
    rows = [
        (1, "p q r s"),
        (2, "p q r s"),
    ]
    got = _run(spark, rows, block=2)
    assert got[1] == (2, 2, _md5("p q r s"))
    # doc 2 still has a row — rewrite, not filter
    assert got[2] == (2, 0, _md5(""))


def test_short_tail_block_is_its_own_span(spark):
    # 5 tokens at block=2 -> blocks (a b)(c d)(e); the short tail "e"
    # deduplicates against doc 2's tail "e" by the same rule
    rows = [
        (1, "a b c d e"),
        (2, "q r e"),
    ]
    got = _run(spark, rows, block=2)
    assert got[1] == (3, 3, _md5("a b c d e"))
    assert got[2] == (2, 1, _md5("q r"))


def test_tie_break_is_doc_then_position(spark):
    # the same block at (doc 3, idx 0) and (doc 3, idx 1): position
    # breaks the tie; at (doc 3) vs (doc 4): doc id breaks it
    rows = [
        (3, "m n m n"),
        (4, "m n o p"),
    ]
    got = _run(spark, rows, block=2)
    assert got[3] == (2, 1, _md5("m n"))
    assert got[4] == (2, 1, _md5("o p"))


def test_block_must_be_positive(spark):
    import pytest

    df = spark.createDataFrame([(1, "a")], "doc_id int, text string")
    with pytest.raises(ValueError):
        block_dedup_rewrite(df, block=0)
