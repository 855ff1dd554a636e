"""Semantic + plan-shape tests for operators/span_dedup.py (q67, q68).

Oracle parity for the fixture-bound queries runs in test_oracle_queries.py;
these tests pin the SEMANTICS on hand-built corpora (shared spans counted
with multiplicity, short-doc guards, FP-free gate) and the SCALE SHAPE
(broadcast weight join, no all-pairs joins) the oracle cannot see.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from franzoxide_spark.operators.span_dedup import (
    crossdoc_span_coverage,
    hashed_linear_score,
    linear_weight_table,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# --------------------------------------------------------------------------
# cross-document span coverage
# --------------------------------------------------------------------------


def test_span_coverage_counts_shared_gram_occurrences_with_multiplicity(spark):
    # docs 1 and 2 share the trigram "a b c"; doc 1 contains it TWICE
    # (positions 0 and 3 of "a b c a b c") so both occurrences count.
    rows = [
        (1, "a b c a b c"),
        (2, "x a b c y z"),
        (3, "p q r s t u"),
    ]
    out = {
        r["doc_id"]: r
        for r in crossdoc_span_coverage(
            _docs(spark, rows), "doc_id", "text", k=3, threshold=0.5
        ).collect()
    }
    # doc 1: grams = [abc, bca, cab, abc] -> 2 of 4 duplicated
    assert out[1]["n_grams"] == 4
    assert out[1]["dup_grams"] == 2
    assert out[1]["dup_fraction"] == 0.5
    assert out[1]["keep"] is False  # 0.5 is not < 0.5
    # doc 2: only "a b c" (1 of 4) is shared
    assert out[2]["dup_grams"] == 1
    assert out[2]["keep"] is True
    # doc 3: nothing shared
    assert out[3]["dup_grams"] == 0
    assert out[3]["dup_fraction"] == 0.0


def test_span_coverage_short_docs_have_zero_grams_and_keep(spark):
    rows = [(1, "a b"), (2, "a b c d"), (3, "a b c d")]
    out = {
        r["doc_id"]: r
        for r in crossdoc_span_coverage(
            _docs(spark, rows), "doc_id", "text", k=3
        ).collect()
    }
    assert out[1]["n_grams"] == 0
    assert out[1]["dup_fraction"] == 0.0
    assert out[1]["keep"] is True
    # identical docs 2/3: every gram duplicated
    assert out[2]["dup_fraction"] == 1.0 and out[2]["keep"] is False


def test_span_coverage_repeats_within_one_doc_only_are_not_duplicated(spark):
    # doc-frequency is DISTINCT docs: a gram repeated inside a single doc
    # but absent elsewhere is not cross-document duplication.
    rows = [(1, "a b c a b c"), (2, "p q r s t u")]
    out = {
        r["doc_id"]: r
        for r in crossdoc_span_coverage(
            _docs(spark, rows), "doc_id", "text", k=3
        ).collect()
    }
    assert out[1]["dup_grams"] == 0


def test_span_coverage_plan_has_no_cartesian_or_loop_join(spark):
    df = crossdoc_span_coverage(
        _docs(spark, [(1, "a b c"), (2, "a b c")]), "doc_id", "text", k=3
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# hashed linear classifier
# --------------------------------------------------------------------------


def test_linear_score_sum_is_exact_sum_of_bucket_weights(spark):
    docs = _docs(spark, [(1, "alpha beta alpha")])
    n_buckets = 64
    out = hashed_linear_score(spark, docs, "doc_id", "text", n_buckets).collect()[0]
    # recompute expected from the weight table itself
    w = {
        r["__b"]: r["__wt"] for r in linear_weight_table(spark, n_buckets).collect()
    }
    from franzoxide_spark.functions.text import hash60

    toks = spark.createDataFrame(
        [("alpha",), ("beta",), ("alpha",)], "tok string"
    ).select(F.pmod(hash60(F.col("tok")), F.lit(n_buckets)).alias("b"))
    expected = sum(w[r["b"]] for r in toks.collect())
    assert out["n_tokens"] == 3
    assert out["score_sum"] == expected
    assert out["keep"] is (expected >= 0)


def test_linear_score_prob_is_sigmoid_of_mean_weight(spark):
    import math

    docs = _docs(spark, [(1, "x y z w")])
    out = hashed_linear_score(spark, docs, "doc_id", "text", 128).collect()[0]
    mean = out["score_sum"] / (out["n_tokens"] * 1000.0)
    assert abs(out["prob"] - round(1.0 / (1.0 + math.exp(-mean)), 6)) < 1e-9


def test_linear_score_broadcasts_weight_table(spark):
    df = hashed_linear_score(
        spark, _docs(spark, [(1, "a b")]), "doc_id", "text", 256
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_round6_operators_handle_empty_input(spark):
    """An empty corpus/stream must yield an empty result, not a crash —
    the degenerate case every scheduled pipeline eventually feeds."""
    from franzoxide_spark.operators.corpus_stats import oov_rate
    from franzoxide_spark.operators.curation import compression_ratio_gate
    from franzoxide_spark.operators.funnel import funnel
    from franzoxide_spark.operators.sketch import cms_heavy_hitters
    from franzoxide_spark.operators.span_dedup import hashed_linear_score

    empty_docs = spark.createDataFrame([], "doc_id long, text string")
    assert crossdoc_span_coverage(empty_docs, "doc_id", "text").count() == 0
    assert hashed_linear_score(spark, empty_docs, "doc_id", "text", 64).count() == 0
    assert oov_rate(empty_docs, "doc_id", "text", 5).count() == 0
    assert compression_ratio_gate(empty_docs).count() == 0
    assert cms_heavy_hitters(empty_docs.selectExpr("text as word"), "word").count() == 0
    empty_ev = spark.createDataFrame(
        [], "user_id long, event_type string, ts timestamp"
    )
    assert funnel(empty_ev, "user_id", "event_type", "ts", ["view"]).count() == 0


def test_span_coverage_hash_keys_match_raw_gram_keys_on_fixture(spark, sf_dir):
    """r17: the (gram,doc) aggregation keys moved from raw gram strings to
    xxhash64(token-slice, k). Counting is exact unless two DISTINCT grams
    of the corpus collide in 64 bits; pin hash-keyed == raw-gram-keyed on
    the real fixture so the trade is continuously re-verified."""
    from franzoxide_spark.operators.span_dedup import _gram_occurrences
    from franzoxide_spark.tables import table

    docs = table(spark, sf_dir, "documents")
    fast = crossdoc_span_coverage(docs, "doc_id", "text", k=3, threshold=0.5)

    # reference: identical pipeline keyed on the raw gram strings
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("__t")
    )
    totals = toks.select(
        "doc_id",
        F.greatest(F.size("__t") - 2, F.lit(0)).alias("n_grams"),
    )
    grams = toks.select(
        "doc_id", F.explode(_gram_occurrences("__t", 3)).alias("__g")
    )
    pairs = grams.groupBy("__g", "doc_id").agg(F.count("*").alias("__occ"))
    dup_g = (
        pairs.groupBy("__g").agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > 1).select("__g")
    )
    dup_per_doc = (
        pairs.join(dup_g, "__g").groupBy("doc_id")
        .agg(F.sum("__occ").alias("dup_grams"))
    )
    ref = (
        totals.join(dup_per_doc, "doc_id", "left")
        .select(
            "doc_id",
            "n_grams",
            F.coalesce("dup_grams", F.lit(0)).alias("dup_grams"),
        )
    )
    got = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"]) for r in fast.collect()
    }
    want = {
        r["doc_id"]: (r["n_grams"], r["dup_grams"]) for r in ref.collect()
    }
    assert got == want
