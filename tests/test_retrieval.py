"""BM25 retrieval (operators/retrieval.py): closed-form score check on a
hand-built corpus + the inverted-index plan-shape invariants. Cross-engine
parity runs in tests/test_oracle_queries.py (q137)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from franzoxide_spark.operators.retrieval import bm25_topk

K1, B = 1.2, 0.75


def _ref_bm25(docs: dict[int, str], query: str, k1=K1, b=B) -> dict[int, float]:
    """Plain-Python BM25 oracle (Robertson idf, binary query tf)."""
    toks = {d: t.split(" ") for d, t in docs.items()}
    n = len(docs)
    avgdl = sum(len(t) for t in toks.values()) / n
    out = {}
    for d, t in toks.items():
        score = 0.0
        for term in set(query.split(" ")):
            tf = t.count(term)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if term in tt)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if score > 0:
            out[d] = round(score, 6)
    return out


def test_bm25_matches_closed_form(spark):
    docs = {
        1: "the cat sat on the mat",
        2: "the dog sat",
        3: "cat cat cat",
        4: "entirely unrelated words here",
    }
    ddf = spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id int, text string"
    )
    qdf = spark.createDataFrame([(1, "cat sat")], "query_id int, query_text string")
    got = {
        r["doc_id"]: r["bm25"]
        for r in bm25_topk(ddf, qdf, "doc_id", "text", k=10).collect()
    }
    assert got == _ref_bm25(docs, "cat sat")


def test_bm25_rank_order_and_k(spark):
    # doc 3 has the highest tf for "cat" and is shortest -> rank 1
    ddf = spark.createDataFrame(
        [(1, "cat a b c"), (2, "cat cat a b"), (3, "cat cat"), (4, "x y")],
        "doc_id int, text string",
    )
    qdf = spark.createDataFrame([(7, "cat")], "query_id int, query_text string")
    rows = (
        bm25_topk(ddf, qdf, "doc_id", "text", k=2)
        .orderBy("rk")
        .collect()
    )
    assert [r["doc_id"] for r in rows] == [3, 2]
    assert all(r["query_id"] == 7 for r in rows)


def test_bm25_plan_is_inverted_index_shaped(spark, sf_dir):
    """Query terms / df / stats all enter broadcast; the only sort-merge
    machinery allowed is none — candidates are joined hash-side — and no
    nested-loop join over the corpus exists."""
    from franzoxide_spark.queries import QUERIES, load_all

    load_all()
    df = QUERIES["q137_bm25_topk"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert plan.count("BroadcastHashJoin") >= 3, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan
