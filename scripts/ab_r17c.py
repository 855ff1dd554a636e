"""Interleaved old-vs-new A/B for the r17 continuation batch (batch 5):

- q155 fd_report: per-pair scans + count() job  ->  ONE tagged-explode
  aggregation (all pairs, one scan, n_rows from sum(tot)).
- q86 source_js_divergence: double token explode  ->  ONE
  (source, term) aggregation re-aggregated for the corpus counts.
- q162 matryoshka audit: one full pass per truncation dim  ->  one
  pass, all dims as columns, stack() unpivot.
- q70 oov_rate: double token explode  ->  ONE (id, word) aggregation
  consumed by both the vocab top-V and the per-doc stats.

Usage: python scripts/ab_r17c.py [--rounds N] [names...]

Both arms build from the CURRENT tree: the new shape is the live
operator; the old shape is reconstructed inline verbatim from the
pre-change commit. Arms alternate within ONE session (host drift hits
both equally); result identity is asserted before timing; bench-protocol
faithful (toPandas, clearCache+unpersist between runs).

Recorded verdicts (sf0.1, result-identical in every arm):

- q155 rounds=6: old 0.575/0.607 (min/med) vs new 0.359/0.402 -> KEEP
  (-38% min; one tagged-explode scan replaces 4 per-pair scans + count).
- q86  rounds=6: old 0.532/0.616 vs new 0.443/0.501 -> KEEP (-17% min;
  the token explode runs once, corpus counts re-aggregate the
  (source, term) partials).
- q162 rounds=6: old 0.517/0.614 vs new 0.398/0.467 -> KEEP (-23% min;
  full-dim cosine computed once per pair, all dims one pass).
- q70  rounds=6: 0.708/1.587 vs 0.651/1.489 (flat), re-run rounds=8 in a
  calmer window: 0.614/2.181 vs 0.783/2.662 -> REVERT. Combined: new won
  only 6/14 paired rounds, old holds the better min. Unlike q86's
  bounded (source, term) grain, the (doc_id, word) pair grain is
  corpus-sized, so the localCheckpoint materialization it adds costs
  what the removed second explode saved. oov_rate stays the r16
  double-explode shape (_q70_old below == the live operator).
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


# -- old shapes, verbatim from the pre-change tree --------------------------


def _q155_old(df, pairs):
    n_rows = df.count()
    parts = []
    for det, dep in pairs:
        cnt = df.groupBy(det, dep).agg(F.count(F.lit(1)).alias("__c"))
        per_det = cnt.groupBy(det).agg(
            F.sum("__c").alias("__tot"),
            F.max("__c").alias("__mx"),
            F.count(F.lit(1)).alias("__ndep"),
        )
        parts.append(
            per_det.agg(
                F.count(F.lit(1)).cast("int").alias("n_groups"),
                F.sum((F.col("__ndep") > 1).cast("long"))
                .cast("int")
                .alias("violating_groups"),
                F.sum(F.col("__tot") - F.col("__mx"))
                .cast("bigint")
                .alias("g3_rows"),
            ).select(
                F.lit(det).alias("determinant"),
                F.lit(dep).alias("dependent"),
                "n_groups",
                "violating_groups",
                "g3_rows",
                F.round(F.col("g3_rows") / F.lit(float(n_rows)), 6).alias(
                    "g3_rate"
                ),
                (F.col("g3_rows") == 0).alias("holds"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _q86_old(docs, source_col="source", text_col="text", v=500):
    from franzoxide_spark.functions.text import tokens

    term = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("term"),
    )
    corpus = term.groupBy("term").agg(F.count("*").alias("c_cnt"))
    vocab = corpus.orderBy(F.desc("c_cnt"), "term").limit(v)
    sc = (
        term.join(F.broadcast(vocab.select("term")), "term")
        .groupBy("source", "term")
        .agg(F.count("*").alias("s_cnt"))
    )
    sources = docs.select(F.col(source_col).alias("source")).distinct()
    grid = (
        sources.crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "term"], "left")
        .withColumn("s_cnt", F.coalesce("s_cnt", F.lit(0)))
    )
    tot = grid.groupBy("source").agg(
        F.sum("s_cnt").alias("s_tot"),
        F.sum("c_cnt").alias("c_tot"),
    )
    p = "(case when s_tot = 0 then 0.0 else s_cnt / cast(s_tot as double) end)"
    q = "(c_cnt / cast(c_tot as double))"
    m = f"(({p} + {q}) / 2)"
    contrib = (
        f"round(0.5 * (case when s_cnt = 0 then 0.0"
        f" else {p} * ln({p} / {m}) end)"
        f" + 0.5 * ({q} * ln({q} / {m})), 6)"
    )
    return (
        grid.join(F.broadcast(tot), "source")
        .withColumn("__contrib", F.expr(contrib))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("s_cnt") > 0, 1).otherwise(0))
            .cast("int")
            .alias("n_terms"),
            F.sum("__contrib").alias("__js_sum"),
        )
        .select(
            "source",
            "n_terms",
            F.when(F.col("n_terms") == 0, F.round(F.expr("ln(2)"), 4))
            .otherwise(F.round(F.col("__js_sum"), 4))
            .alias("js"),
        )
    )


def _q162_old(emb):
    from franzoxide_spark.functions.vectors import cosine_rounded
    from franzoxide_spark.queries.llm import _Q162_DIMS

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qv")
    )
    c = emb.filter(F.col("vec_id") % 5 == 0).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    pairs = c.join(F.broadcast(q), F.col("qid") != F.col("cid"))
    parts = []
    for d in _Q162_DIMS:
        sliced = pairs.select(
            cosine_rounded("qv", "cv").alias("cf"),
            F.round(
                F.expr(
                    f"aggregate(zip_with(slice(qv, 1, {d}), slice(cv, 1, {d}),"
                    " (x, y) -> cast(x as double) * cast(y as double)),"
                    " cast(0.0 as double), (acc, v) -> acc + v)"
                )
                / (
                    F.sqrt(F.expr(
                        f"aggregate(transform(slice(qv, 1, {d}),"
                        " x -> cast(x as double) * cast(x as double)),"
                        " cast(0.0 as double), (acc, v) -> acc + v)"
                    ))
                    * F.sqrt(F.expr(
                        f"aggregate(transform(slice(cv, 1, {d}),"
                        " x -> cast(x as double) * cast(x as double)),"
                        " cast(0.0 as double), (acc, v) -> acc + v)"
                    ))
                ),
                6,
            ).alias("ct"),
        )
        parts.append(
            sliced.agg(
                F.lit(d).alias("trunc_dim"),
                F.count(F.lit(1)).cast("int").alias("n_pairs"),
                F.round(F.avg(F.abs(F.col("cf") - F.col("ct"))), 6).alias(
                    "mean_abs_err"
                ),
                F.round(F.max(F.abs(F.col("cf") - F.col("ct"))), 6).alias(
                    "max_abs_err"
                ),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out


def _q70_old(docs, id_col="doc_id", text_col="text", vocab_size=16):
    from franzoxide_spark.operators.corpus_stats import _fan_out

    toks = _fan_out(docs.select(id_col, text_col)).select(
        F.col(id_col), F.explode(F.split(F.col(text_col), " ")).alias("__w")
    )
    counts = toks.groupBy("__w").agg(F.count("*").alias("__c"))
    vocab = (
        counts.orderBy(F.desc("__c"), F.asc("__w"))
        .limit(vocab_size)
        .select("__w", F.lit(1).alias("__in"))
    )
    per_doc = (
        toks.join(F.broadcast(vocab), "__w", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_tokens"),
            F.sum(F.when(F.col("__in").isNull(), 1).otherwise(0)).alias(
                "n_oov"
            ),
        )
    )
    return per_doc.select(
        id_col,
        F.col("n_tokens").cast("int").alias("n_tokens"),
        F.col("n_oov").cast("int").alias("n_oov"),
        F.round(F.col("n_oov").cast("double") / F.col("n_tokens"), 6).alias(
            "oov_rate"
        ),
    )


def main() -> None:
    args = sys.argv[1:]
    rounds = 6
    names: list[str] = []
    i = 0
    while i < len(args):
        if args[i] == "--rounds":
            rounds = int(args[i + 1])
            i += 2
        else:
            names.append(args[i])
            i += 1
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="ab_r17c")
    spark.sparkContext.setLogLevel("ERROR")
    from franzoxide_spark import queries as qreg
    from franzoxide_spark.queries.corpus import _Q155_PAIRS
    from franzoxide_spark.tables import TABLES, fanned_table, table

    qreg.load_all()
    for t in TABLES:
        table(spark, sf_dir, t).schema

    exps = {
        "q155": (
            lambda: _q155_old(table(spark, sf_dir, "part"), _Q155_PAIRS),
            lambda: qreg.QUERIES["q155_fd_discovery"](spark, sf_dir),
            ["determinant", "dependent"],
        ),
        "q86": (
            lambda: _q86_old(table(spark, sf_dir, "documents")),
            lambda: qreg.QUERIES["q86_source_js_divergence"](spark, sf_dir),
            ["source"],
        ),
        "q162": (
            lambda: _q162_old(fanned_table(spark, sf_dir, "embeddings")),
            lambda: qreg.QUERIES["q162_matryoshka_audit"](spark, sf_dir),
            ["trunc_dim"],
        ),
        "q70": (
            lambda: _q70_old(table(spark, sf_dir, "documents")),
            lambda: qreg.QUERIES["q70_oov_rate"](spark, sf_dir),
            ["doc_id"],
        ),
    }
    if names:
        exps = {k: v for k, v in exps.items() if k in names}

    results = {}
    for name, (old_fn, new_fn, sort_cols) in exps.items():
        a = old_fn().toPandas().sort_values(sort_cols).reset_index(drop=True)
        b = new_fn().toPandas().sort_values(sort_cols).reset_index(drop=True)
        b = b[a.columns]
        if not a.equals(b):
            diff = (a != b) & ~(a.isna() & b.isna())
            print(f"{name}: RESULT MISMATCH rows={int(diff.any(axis=1).sum())}")
            print(a[diff.any(axis=1)].head())
            print(b[diff.any(axis=1)].head())
            results[name] = {"identical": False}
            continue
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
        results[name] = {
            "identical": True,
            "old_min": o, "new_min": n,
            "old_med": med(arms["old"]), "new_med": med(arms["new"]),
            "verdict": verdict, "old": arms["old"], "new": arms["new"],
        }
        print(json.dumps({name: results[name]}), flush=True)


if __name__ == "__main__":
    main()
