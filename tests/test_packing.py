"""Property tests for sequence packing (operators/packing.py) — the
operator is not SQL-expressible (stateful fold), so its contract is
pinned here instead of via a DuckDB oracle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from franzoxide_spark.operators.packing import pack_sequences


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, n_tokens long")


def test_first_fit_sequential_small_example(spark):
    # budget 10: [4,5] pack together; 3 overflows -> new bin; 12 oversized
    # -> own bin; 2 after it -> new bin again
    df = _df(spark, [(1, 4), (2, 5), (3, 3), (4, 12), (5, 2)])
    out = {r["doc_id"]: r["bin_id"] for r in pack_sequences(df, budget=10).collect()}
    assert out == {1: 1, 2: 1, 3: 3, 4: 4, 5: 5}


def test_budget_respected_and_every_doc_assigned_once(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    )
    n = docs.count()
    packed = pack_sequences(docs, budget=256)
    assert packed.count() == n
    assert packed.select("doc_id").distinct().count() == n
    sums = packed.groupBy("bin_id").agg(
        F.sum("n_tokens").alias("tot"), F.count("*").alias("cnt")
    )
    # a bin may exceed the budget only as a single oversized document
    assert sums.filter((F.col("tot") > 256) & (F.col("cnt") > 1)).count() == 0


def test_bins_are_contiguous_id_runs(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    )
    packed = pack_sequences(docs, budget=256)
    # within a bin, ids form a contiguous run of the corpus id order:
    # no document from another bin falls between a bin's min and max id
    # (true here because fixture ids are dense; the general invariant is
    # "no interleaving", which dense ids make exactly contiguity)
    spans = packed.groupBy("bin_id").agg(
        F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi"), F.count("*").alias("cnt")
    )
    assert spans.filter(F.col("hi") - F.col("lo") + 1 != F.col("cnt")).count() == 0


def test_deterministic_under_repartitioning(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", F.size(F.split("text", " ")).cast("long").alias("n_tokens"))
    )
    a = pack_sequences(docs, budget=512).select("doc_id", "bin_id")
    b = pack_sequences(docs.repartition(13), budget=512).select("doc_id", "bin_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_chunks_bound_bins_and_validation(spark):
    # chunk_size 3: ids 0-2 and 3-5 pack independently even though the
    # budget would let them share a bin
    df = _df(spark, [(i, 1) for i in range(6)])
    out = {r["doc_id"]: r["bin_id"] for r in
           pack_sequences(df, budget=100, chunk_size=3).collect()}
    assert out == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3}
    with pytest.raises(ValueError, match="budget"):
        pack_sequences(df, budget=0)
    with pytest.raises(ValueError, match="chunk_size"):
        pack_sequences(df, chunk_size=0)


def test_length_batch_plan_sorting_minimizes_padding(spark):
    from franzoxide_spark.operators.packing import length_batch_plan

    # 4 docs, batch_docs=2: length-sorted batches are (5,6) and (50,60)
    # -> pad 1 + 10; unsorted arrival order would have paired (5,50)
    docs = spark.createDataFrame(
        [(1, 5, "en"), (2, 50, "en"), (3, 6, "en"), (4, 60, "en")],
        "doc_id long, n_tok int, lang string",
    )
    out = {
        r["batch_id"]: r
        for r in length_batch_plan(
            docs, "doc_id", "n_tok", "lang", batch_docs=2
        ).collect()
    }
    assert out[0]["max_len"] == 6 and out[0]["pad_tokens"] == 1
    assert out[1]["max_len"] == 60 and out[1]["pad_tokens"] == 10
    assert out[0]["n_docs"] == 2 and len(out) == 2


def test_length_batch_plan_tail_batch_and_efficiency(spark):
    from franzoxide_spark.operators.packing import length_batch_plan

    docs = spark.createDataFrame(
        [(i, 10, "en") for i in range(5)], "doc_id long, n_tok int, lang string"
    )
    rows = length_batch_plan(docs, "doc_id", "n_tok", "lang", batch_docs=2).collect()
    sizes = sorted(r["n_docs"] for r in rows)
    assert sizes == [1, 2, 2]  # tail batch holds the remainder
    assert all(r["efficiency"] == 1.0 for r in rows)  # equal lengths: no padding
