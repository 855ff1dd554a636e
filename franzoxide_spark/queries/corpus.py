"""Corpus-statistics queries (q60-q62): the train-on-corpus / score-corpus
scoring family over ``documents`` (operators/corpus_stats.py).

All three are oracle-checked. They register after the driver's 50-record
CORRECTNESS window (which is already filled by the 50 unique operators of
rounds 1-6 — see the twin-ordering note in queries/llm.py), so their
driver record is rows-only at best; the binding oracle check runs in
tests/test_oracle_queries.py, which parametrizes over every registry
entry with the exact driver compare.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from franzoxide_spark.operators.corpus_stats import (
    char_trigram_lm,
    dsir_logratio,
    sql_char_trigram_lm,
    sql_dsir_logratio,
    sql_tfidf_top_terms,
    tfidf_top_terms,
)
from franzoxide_spark.queries import register
from franzoxide_spark.tables import table


# --------------------------------------------------------------------------
# Q60 — TF-IDF top terms per document
# --------------------------------------------------------------------------
def q60(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return tfidf_top_terms(docs, "doc_id", "text", k=3)


# --------------------------------------------------------------------------
# Q61 — char-trigram LM quality score (CCNet-style perplexity proxy)
# --------------------------------------------------------------------------
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return char_trigram_lm(docs, "doc_id", "text")


# --------------------------------------------------------------------------
# Q62 — DSIR hashed importance log-weights (target = English slice)
# --------------------------------------------------------------------------
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return dsir_logratio(
        docs, "doc_id", "text", target_pred=F.col("lang") == "en", n_buckets=1024
    )


register("q60_tfidf_top_terms", q60, sql_tfidf_top_terms("documents", "doc_id", "text", k=3))
register("q61_trigram_lm_quality", q61, sql_char_trigram_lm("documents", "doc_id", "text"))
register(
    "q62_dsir_importance",
    q62,
    sql_dsir_logratio("documents", "doc_id", "text", "lang = 'en'", n_buckets=1024),
)
