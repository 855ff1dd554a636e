"""Tests for document chunking (operators/chunking.py): exact small
examples, coverage invariants, a DuckDB mirror identity on the fixture
corpus, and a plan audit proving the operator is one UDF-free,
shuffle-free codegen'd projection."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from franzoxide_spark.operators.chunking import (
    chunk_documents,
    sql_chunk_documents,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_small_example_exact_chunks(spark):
    # window 4, overlap 1 -> stride 3; 8 tokens -> starts 0,3,6
    df = _docs(spark, [(1, "a b c d e f g h")])
    out = sorted(
        (r["chunk_idx"], r["chunk_text"], r["chunk_tokens"])
        for r in chunk_documents(df, window=4, overlap=1).collect()
    )
    assert out == [
        (0, "a b c d", 4),
        (1, "d e f g", 4),
        (2, "g h", 2),
    ]


def test_redundant_tail_dropped(spark):
    # window 4, overlap 2 -> stride 2; 5 tokens -> raw starts 0,2,4 but
    # start=4 has start+overlap=6 >= 5: its window ("e") is wholly inside
    # chunk 1 ("c d e"), so it is dropped
    df = _docs(spark, [(1, "a b c d e")])
    out = sorted(
        (r["chunk_idx"], r["chunk_text"])
        for r in chunk_documents(df, window=4, overlap=2).collect()
    )
    assert out == [(0, "a b c d"), (1, "c d e")]


def test_short_and_single_token_docs_get_one_chunk(spark):
    df = _docs(spark, [(1, "x"), (2, "x y")])
    out = chunk_documents(df, window=64, overlap=8).collect()
    assert sorted((r["doc_id"], r["chunk_idx"], r["chunk_tokens"]) for r in out) == [
        (1, 0, 1),
        (2, 0, 2),
    ]


def test_coverage_and_bounds_on_fixture(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    window, overlap = 32, 4
    stride = window - overlap
    chunks = chunk_documents(docs, window=window, overlap=overlap)
    stats = (
        chunks.groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.max("chunk_idx").alias("max_idx"),
            F.min("chunk_idx").alias("min_idx"),
            F.max("chunk_tokens").alias("max_tok"),
            # tokens covered = stride per chunk except the last, which
            # contributes its full length
            (F.sum(F.lit(stride)) - F.lit(stride) + F.max("chunk_tokens")).alias(
                "covered"
            ),
        )
        .join(
            docs.select(
                "doc_id", F.size(F.split("text", " ")).alias("n_tokens")
            ),
            "doc_id",
        )
    )
    assert stats.filter(F.col("max_tok") > window).count() == 0
    assert stats.filter(F.col("min_idx") != 0).count() == 0
    # chunk_idx is dense: max_idx = n_chunks - 1
    assert stats.filter(F.col("max_idx") != F.col("n_chunks") - 1).count() == 0
    # full coverage: last chunk ends at or past the last token
    assert stats.filter(F.col("covered") < F.col("n_tokens")).count() == 0


def test_duckdb_mirror_is_identical(spark, sf_dir):
    import duckdb

    sp = sorted(
        tuple(r)
        for r in chunk_documents(
            spark.read.parquet(f"{sf_dir}/documents.parquet").select(
                "doc_id", "text"
            ),
            window=64,
            overlap=8,
        ).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM"
        f" read_parquet('{sf_dir}/documents.parquet')"
    )
    du = sorted(
        tuple(r)
        for r in con.execute(
            sql_chunk_documents(window=64, overlap=8)
        ).fetchall()
    )
    assert sp == du


def test_plan_is_udf_free_and_shuffle_free(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    plan = (
        chunk_documents(docs)
        ._jdf.queryExecution()
        .explainString(spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    )
    assert "Exchange" not in plan, plan
    assert "EvalPython" not in plan, plan  # no Batch/ArrowEvalPython
    # text column is pruned from the output (only chunk_text survives)
    assert "chunk_text" in plan


def test_passthrough_columns_and_text_dropped(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    cols = chunk_documents(docs).columns
    assert "text" not in cols
    assert {"chunk_idx", "chunk_text", "chunk_tokens"} <= set(cols)
    assert "doc_id" in cols


def test_validation(spark):
    df = _docs(spark, [(1, "a b")])
    with pytest.raises(ValueError, match="window"):
        chunk_documents(df, window=0)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, window=4, overlap=4)
    with pytest.raises(ValueError, match="overlap"):
        chunk_documents(df, window=4, overlap=-1)
