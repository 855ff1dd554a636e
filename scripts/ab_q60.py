"""Interleaved A/B for q60 tf-idf: term-partition WINDOW df vs
aggregate+broadcast-JOIN df — at replica scale (r18, VERDICT item #3).

The df (document frequency) of a term is count(*) over the (doc, term)
pair stream partitioned by term. The window form shuffles the FULL pair
stream by term and sorts it — the skewed exchange (stopwords own most
pairs), and AQE skew handling does NOT apply to windows (guide 2.5:
joins only). The join form aggregates df per term (map-side combined,
output bounded by the vocabulary) and broadcast-joins the tiny df table
back onto the pair stream — the term-keyed full-stream exchange is GONE
and the skew with it.

r17 measured the join form flat-to-worse at sf0.1 (floor-bound; batch-3
notes) and correctly did not take it. This harness decides at 10x/30x,
where the term exchange carries real data. Arms alternate inside one
session (host drift hits both), result identity asserted first.

Usage: python scripts/ab_q60.py [--runs N] [--scale R]
Env: SPARK_GRAFT_SF_DIR (base fixtures), SPARK_GRAFT_SCALE_R.
"""

from __future__ import annotations

import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import DataFrame, Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from franzoxide_spark.functions.text import tokens  # noqa: E402
from franzoxide_spark.session import get_spark  # noqa: E402
from franzoxide_spark.tables import table  # noqa: E402


def tfidf_window(docs: DataFrame, k: int = 3) -> DataFrame:
    """The served r17 shape (operators/corpus_stats.tfidf_top_terms)."""
    toks = docs.select("doc_id", tokens("text").alias("__toks"))
    terms = toks.select("doc_id", F.explode("__toks").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = docs.agg(F.count("*").alias("__n"))
    scored = (
        tf.withColumn("df", F.count("*").over(Window.partitionBy("term")))
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n") + 1).cast("double")
                        / (F.col("df") + 1).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w_doc))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "rk", "tfidf")
    )


def tfidf_join(docs: DataFrame, k: int = 3) -> DataFrame:
    """df via vocabulary-bounded aggregate + broadcast join."""
    toks = docs.select("doc_id", tokens("text").alias("__toks"))
    terms = toks.select("doc_id", F.explode("__toks").alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.agg(F.count("*").alias("__n"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (
                    F.log(
                        (F.col("__n") + 1).cast("double")
                        / (F.col("df") + 1).cast("double")
                    )
                    + F.lit(1.0)
                ),
                6,
            ),
        )
    )
    w_doc = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w_doc))
        .filter(F.col("rk") <= k)
        .select("doc_id", "term", "rk", "tfidf")
    )


def _clear(spark) -> None:
    try:
        spark.catalog.clearCache()
        for rdd in dict(spark.sparkContext._jsc.getPersistentRDDs()).values():
            rdd.unpersist(False)
    except Exception:  # noqa: BLE001
        pass


def checksum(df: DataFrame) -> tuple[int, int]:
    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns]).cast(
                "decimal(38,0)"
            )
        ).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"] or 0)


def main() -> None:
    args = sys.argv[1:]
    runs, scale = 6, int(os.environ.get("SPARK_GRAFT_SCALE_R", "10"))
    i = 0
    while i < len(args):
        if args[i] == "--runs":
            runs = int(args[i + 1]); i += 2
        elif args[i] == "--scale":
            scale = int(args[i + 1]); i += 2
        else:
            raise SystemExit(f"unknown arg {args[i]}")
    spark = get_spark(app_name="ab_q60")
    spark.sparkContext.setLogLevel("ERROR")
    src = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sdir = os.path.join(_HERE, ".scale", f"x{scale}") if scale > 1 else src
    if not os.path.isdir(sdir):
        from examples.scale_slope import build_scaled

        build_scaled(spark, src, sdir, scale)
    docs = table(spark, sdir, "documents")

    a, b = checksum(tfidf_window(docs)), checksum(tfidf_join(docs))
    print(f"identity window={a} join={b} match={a == b}", flush=True)
    assert a == b, "arms disagree — do not time"

    res = {"window": [], "join": []}
    for r in range(runs):
        for label, fn in (("window", tfidf_window), ("join", tfidf_join)):
            spark.sparkContext.setJobDescription(f"q60ab:{label}:{r}")
            t0 = time.monotonic()
            fn(docs).write.format("noop").mode("overwrite").save()
            res[label].append(round(time.monotonic() - t0, 4))
            _clear(spark)
        print(f"round {r}: window={res['window'][-1]} join={res['join'][-1]}",
              flush=True)
    for label, xs in res.items():
        xs_sorted = sorted(xs)
        med = xs_sorted[len(xs) // 2]
        print(f"{label}: min={min(xs):.4f} med={med:.4f} all={xs}")


if __name__ == "__main__":
    main()
