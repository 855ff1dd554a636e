"""Semantics of bigram PMI phrase mining (operators/corpus_stats.py::
bigram_pmi_topk). Registry-level DuckDB parity runs in
tests/test_oracle_queries.py::q87; these pin the math closed-form.
"""

from __future__ import annotations

import math

import pytest

from franzoxide_spark.operators.corpus_stats import bigram_pmi_topk


def _run(spark, texts, min_count=1, k=10):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    out = bigram_pmi_topk(df, "text", min_count=min_count, k=k).collect()
    return {(r.x, r.y): (r.xy_cnt, r.pmi, r.rnk) for r in out}


def test_pmi_closed_form_single_repeated_bigram(spark):
    # corpus "a b a b": tokens N=4 (a:2, b:2), bigrams M=3 ("a b":2,
    # "b a":1). PMI(a,b) = ln(2 * 16 / (3 * 2 * 2)) = ln(8/3)
    got = _run(spark, ["a b a b"])
    cnt, pmi, _ = got[("a", "b")]
    assert cnt == 2
    assert pmi == round(math.log(8 / 3), 6)


def test_collocation_outranks_frequent_pair(spark):
    # "p q" always co-occur (perfect collocation); "x y" share their
    # words with many other pairs -> PMI must rank (p,q) first even
    # though both bigrams have the same count
    texts = ["p q", "p q", "x y", "x z", "w y", "x y"]
    got = _run(spark, texts, min_count=2)
    assert got[("p", "q")][2] < got[("x", "y")][2]


def test_min_count_filters_noise(spark):
    got = _run(spark, ["a b", "a b", "c d"], min_count=2)
    assert ("a", "b") in got
    assert ("c", "d") not in got


def test_single_token_docs_produce_no_bigrams(spark):
    got = _run(spark, ["solo", "alone"])
    assert got == {}


def test_param_validation(spark):
    with pytest.raises(ValueError):
        bigram_pmi_topk(None, min_count=0)
    with pytest.raises(ValueError):
        bigram_pmi_topk(None, k=0)
