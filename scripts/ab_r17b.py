"""Interleaved old-vs-new shape A/B for the r17 second-batch span-coverage
rewrite (q67: single-exchange min/max-doc aggregate vs the previous
(gram,doc) pair aggregation + doc-frequency self-join).

Usage: python scripts/ab_r17b.py [--rounds N]

Both arms build from the CURRENT tree: the new shape is
``crossdoc_span_coverage``; the old r17-HEAD pair-join pipeline is
reconstructed inline verbatim (hash keys).  Arms alternate within ONE
session, bench-protocol faithful (toPandas materialization,
clearCache+unpersist between runs) — interleaving makes host-load drift
hit both arms equally (r16 'discarded first attempt' precedent).  Result
identity is asserted before timing.

The same harness also ran the q61/q62 map-side-twin experiment (collect
the bounded LM/llr table, score in one Arrow pass): q61 old 1.19/1.51
(min/med) vs twin 1.42/1.86 → REVERTED; q62 old 1.17/1.42 vs twin
1.24/1.43 → flat, not taken.  The twins were removed from source per the
revert discipline; numbers recorded in OPTIMIZATION_r17.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _HERE not in sys.path:
    sys.path.insert(0, _HERE)

from pyspark.sql import functions as F  # noqa: E402

from franzoxide_spark.session import get_spark  # noqa: E402


def _clear(spark) -> None:
    try:
        spark.catalog.clearCache()
        for rdd in dict(spark.sparkContext._jsc.getPersistentRDDs()).values():
            rdd.unpersist(False)
    except Exception:  # noqa: BLE001
        pass


def _q67_old(docs):
    """The r17-HEAD pair-join shape, verbatim (hash keys)."""
    from franzoxide_spark.operators.span_dedup import _gram_hash_occurrences

    k, threshold = 3, 0.5
    toks = docs.select("doc_id", F.split(F.col("text"), " ").alias("__t"))
    totals = toks.select(
        "doc_id", F.greatest(F.size("__t") - (k - 1), F.lit(0)).alias("n_grams")
    )
    grams = toks.select(
        "doc_id", F.explode(_gram_hash_occurrences("__t", k)).alias("__g")
    )
    pairs = grams.groupBy("__g", "doc_id").agg(F.count("*").alias("__occ"))
    dup_g = (
        pairs.groupBy("__g")
        .agg(F.count("*").alias("__df"))
        .filter(F.col("__df") > 1)
        .select("__g")
    )
    dup_per_doc = (
        pairs.join(dup_g, "__g")
        .groupBy("doc_id")
        .agg(F.sum("__occ").alias("dup_grams"))
    )
    frac = F.when(F.col("n_grams") == 0, F.lit(0.0)).otherwise(
        F.col("dup_grams").cast("double") / F.col("n_grams")
    )
    return (
        totals.join(dup_per_doc, "doc_id", "left")
        .withColumn("dup_grams", F.coalesce("dup_grams", F.lit(0)))
        .select(
            "doc_id",
            F.col("n_grams").cast("int").alias("n_grams"),
            F.col("dup_grams").cast("int").alias("dup_grams"),
            F.round(frac, 6).alias("dup_fraction"),
            (F.round(frac, 6) < F.lit(threshold)).alias("keep"),
        )
    )


def main() -> None:
    args = sys.argv[1:]
    rounds = 6
    i = 0
    while i < len(args):
        if args[i] == "--rounds":
            rounds = int(args[i + 1])
            i += 2
        else:
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_r17b")
    spark.sparkContext.setLogLevel("ERROR")
    from franzoxide_spark.operators.span_dedup import crossdoc_span_coverage
    from franzoxide_spark.tables import TABLES, fanned_table, table

    for t in TABLES:
        table(spark, sf_dir, t).schema

    docs = fanned_table(spark, sf_dir, "documents")
    old_fn = lambda: _q67_old(docs)  # noqa: E731
    new_fn = lambda: crossdoc_span_coverage(  # noqa: E731
        docs, "doc_id", "text", 3, 0.5
    )

    # result identity first (sorted pandas compare); doubles as warm run
    a = old_fn().toPandas().sort_values("doc_id").reset_index(drop=True)
    b = new_fn().toPandas().sort_values("doc_id").reset_index(drop=True)
    b = b[a.columns]
    if not a.equals(b):
        diff = (a != b) & ~(a.isna() & b.isna())
        raise SystemExit(
            f"q67: RESULT MISMATCH rows={int(diff.any(axis=1).sum())}"
        )
    _clear(spark)
    arms: dict[str, list[float]] = {"old": [], "new": []}
    for _ in range(rounds):
        for arm, fn in (("old", old_fn), ("new", new_fn)):
            t0 = time.perf_counter()
            fn().toPandas()
            arms[arm].append(round(time.perf_counter() - t0, 4))
            _clear(spark)
    o, n = min(arms["old"]), min(arms["new"])
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    verdict = (
        "KEEP new" if n < o * 0.9 else ("REVERT" if o < n * 0.9 else "flat")
    )
    out = {
        "identical": True,
        "old_min": o, "new_min": n,
        "old_med": med(arms["old"]), "new_med": med(arms["new"]),
        "verdict": verdict, "old": arms["old"], "new": arms["new"],
    }
    print(json.dumps({"q67": out}), flush=True)


if __name__ == "__main__":
    main()
