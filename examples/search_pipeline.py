"""End-to-end search serving pipeline: the full retrieval stack a RAG
system runs, composed from the engine's operators and cross-checked at
the end.

    documents + queries
      → sparse ranker   (BM25 over the inverted-index plan, q137)
      → recall ranker   (distinct-term containment, q157's second leg)
      → hybrid fuse     (reciprocal rank fusion — rank-only, no score
                         calibration, q157)
      → dense rerank    (exact cosine over the fused shortlist using the
                         embeddings table as a stand-in encoder, q30's
                         scorer)
      → diversify       (MMR greedy selection over the bounded
                         candidate set, q140)

Every stage is the registry operator (same code the oracle checks); the
script prints per-stage candidate counts, asserts the serving invariants
(fused list ⊆ union of the ranker lists; MMR output ⊆ fused shortlist;
first MMR pick = top fused relevance; no duplicate results per query),
and shows the final top-5 per query.

Plan shapes are the serving-scale ones: ONE corpus posting-list shuffle
feeds both lexical rankers, fusion joins two bounded top-k lists,
the dense rerank and MMR only ever touch the per-query shortlist —
corpus size never enters any stage after candidate generation.

Usage: python examples/search_pipeline.py
       [env: SPARK_GRAFT_SF_DIR (/root/testdata/sf0.01)]
"""

from __future__ import annotations

import os
import sys

from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from franzoxide_spark.operators.retrieval import (  # noqa: E402
    bm25_topk,
    mmr_rerank,
    rrf_fuse,
    term_recall_topk,
)
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.tables import table  # noqa: E402

QUERIES = [
    (1, "hash join order"),
    (2, "window sort merge stream"),
    (3, "customer line filter"),
    (4, "big data query scan"),
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(driver_memory="8g")
    docs = table(spark, sf_dir, "documents")
    emb = table(spark, sf_dir, "embeddings")
    queries = spark.createDataFrame(QUERIES, "query_id int, query_text string")

    # 1+2: two lexical rankers off the same posting-list shape
    bm = bm25_topk(docs, queries, "doc_id", "text", k=20)
    rec = term_recall_topk(docs, queries, "doc_id", "text", k=20)
    print(f"bm25 candidates:   {bm.count()}")
    print(f"recall candidates: {rec.count()}")

    # 3: hybrid fusion (rank-only)
    fused = rrf_fuse(bm, rec, "doc_id", k=60, n=10).cache()
    n_fused = fused.count()
    print(f"fused shortlist:   {n_fused}")
    union_ids = {
        (r["query_id"], r["doc_id"])
        for r in bm.select("query_id", "doc_id")
        .union(rec.select("query_id", "doc_id"))
        .collect()
    }
    fused_ids = {(r["query_id"], r["doc_id"]) for r in fused.collect()}
    assert fused_ids <= union_ids, "fusion invented a candidate"

    # 4: dense rerank of the shortlist — embeddings stand in for an
    # encoder; vec_id keys the doc, query vector = the query_id's row
    qv = emb.select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv"))
    dv = emb.select(F.col("vec_id").alias("doc_id"), F.col("embedding").alias("vec"))
    from franzoxide_spark.functions.vectors import cosine_rounded

    shortlist = (
        fused.join(F.broadcast(qv), "query_id")
        .join(dv, "doc_id")
        .withColumn("rel", cosine_rounded("qv", "vec"))
        .select("query_id", F.col("doc_id").alias("neighbor_id"), "rel", "vec")
    )
    print(f"dense-scored:      {shortlist.count()}")

    # 5: MMR diversification over the bounded shortlist
    final = mmr_rerank(shortlist, n=5, lam=0.7).cache()
    rows = final.collect()
    per_q: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["sel_rank"])):
        per_q.setdefault(r["query_id"], []).append(r)
    for qid, rs in per_q.items():
        ids = [r["neighbor_id"] for r in rs]
        assert len(ids) == len(set(ids)), "duplicate result"
        assert {(qid, i) for i in ids} <= fused_ids, "MMR left the shortlist"
        top_rel = max(
            (r["rel"], -r["neighbor_id"])
            for r in shortlist.filter(F.col("query_id") == qid).collect()
        )
        assert rs[0]["neighbor_id"] == -top_rel[1], "first pick != top relevance"
        print(f"q{qid}: " + ", ".join(f"{r['neighbor_id']}({r['mmr']:.3f})" for r in rs))
    print("all serving invariants hold")


if __name__ == "__main__":
    main()
