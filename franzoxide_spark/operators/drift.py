"""Corpus distribution drift: per-source Jensen-Shannon divergence.

The data-quality gate that compares WHERE the corpus came from: each
source's unigram distribution against the whole corpus's, as a JS
divergence in [0, ln 2]. High-JS sources are out-of-distribution slices
(a crawler gone wrong, a new dump with different boilerplate, a domain
that needs its own mixture weight) — the signal pipelines monitor
between snapshot ingests before retraining mixture weights (q64/q76).

Distributions are restricted to the corpus-wide top-``v`` vocabulary and
renormalized inside it (documented truncation — the tail would make the
state unbounded; with a shared vocab both sides truncate identically so
the comparison stays apples-to-apples).

Scale shape: ONE corpus-sized token aggregation per side (global term
counts, then per-(source, term) counts — both hash-partitioned with
map-side combine); the vocabulary is a broadcast top-``v`` list
(TakeOrdered, never a global sort) and everything after it lives on the
``n_sources x v`` grid, which is bounded no matter the corpus size.
The absent-term grid (a source missing a vocab term still pays the
corpus side of the divergence) is built by cross-joining the bounded
source list with the bounded vocab — a bounded-by-construction cross
join, not an all-pairs hazard.

FP determinism follows q61's proven recipe: integer counts end-to-end,
per-term contributions rounded to 6 decimals, the final per-source sum
rounded to 4 — identical cut decisions in Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import sql_tokens, tokens


def source_js_divergence(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    v: int = 500,
) -> DataFrame:
    """Per-source JS divergence vs the corpus over the top-``v`` vocab.

    Returns ``source, n_terms int, js double`` where ``n_terms`` is how
    many vocab terms the source actually uses and ``js`` the divergence
    (0 = identical distribution, ln 2 ~ 0.693 = disjoint).
    """
    if v <= 0:
        raise ValueError(f"v must be positive, got {v}")

    term = docs.select(
        F.col(source_col).alias("source"),
        F.explode(tokens(text_col)).alias("term"),
    )
    # ONE corpus-sized aggregation (r17): per-(source, term) counts are
    # the finest grain both downstream relations need, so the token
    # explode runs exactly once; the corpus-wide term counts are a
    # re-aggregation of those bounded partials (c_cnt = Σ_sources s_cnt,
    # null sources included — identical to counting the raw stream).
    # The lazy localCheckpoint keeps the explode+aggregate from
    # re-executing for each of the two consumers (vocab + grid). The
    # previous shape exploded the corpus twice: once for groupBy(term),
    # once for the vocab-joined groupBy(source, term).
    #
    # r18: persist() was A/B'd per the r17 ADVICE (graceful recompute
    # after an external clearCache) and REJECTED on measurement —
    # isolated min-of-6 at sf0.1: 0.998 s persisted vs 0.612 s
    # checkpointed (the columnar cache serialization costs more than the
    # barrier saves; plan grew Exchange 26→33). The ADVICE's hazard is
    # real but narrow: the RETURNED DataFrame handle is single-
    # collection-scoped — re-collecting the same handle after an
    # external unpersist-all can hit 'checkpoint block not found'.
    # Callers (bench.py, the registry) build a fresh plan per run, and
    # the materialization stays cheap because the (source, term) grain
    # is bounded by sources × vocabulary — both pinned in
    # tests/test_drift.py::test_partials_grain_is_bounded.
    st = (
        term.groupBy("source", "term")
        .agg(F.count("*").alias("s_cnt"))
        .localCheckpoint(eager=False)
    )
    # corpus-wide counts -> top-v vocab (ties by term, deterministic)
    corpus = st.groupBy("term").agg(F.sum("s_cnt").alias("c_cnt"))
    vocab = corpus.orderBy(F.desc("c_cnt"), "term").limit(v)
    # per-(source, term) counts over the vocab only
    sc = st.join(F.broadcast(vocab.select("term")), "term").select(
        "source", "term", "s_cnt"
    )
    # bounded grid: every source x every vocab term (absent -> s_cnt 0).
    # Source list comes from the DOCS table, not from sc: a source whose
    # documents contain none of the top-v vocabulary — the maximally
    # out-of-distribution case this monitor exists to flag — has no sc
    # rows at all and would otherwise silently vanish from the output
    # instead of reporting n_terms=0, js=ln 2.
    sources = docs.select(F.col(source_col).alias("source")).distinct()
    grid = (
        sources.crossJoin(F.broadcast(vocab))
        .join(sc, ["source", "term"], "left")
        .withColumn("s_cnt", F.coalesce("s_cnt", F.lit(0)))
    )
    tot = grid.groupBy("source").agg(
        F.sum("s_cnt").alias("s_tot"),
        F.sum("c_cnt").alias("c_tot"),  # same for every source: vocab mass
    )
    # s_tot = 0 (vocab-disjoint source) would make p a 0/0 — guard it; the
    # per-source js for that case is pinned to ln 2 below, the defined
    # maximum for disjoint supports (the source's whole mass is outside
    # the vocab, so within-vocab renormalization has nothing to scale).
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
            F.when(
                F.col("n_terms") == 0, F.round(F.expr("ln(2)"), 4)
            )
            .otherwise(F.round(F.col("__js_sum"), 4))
            .alias("js"),
        )
    )


def sql_source_js_divergence(
    table: str = "documents",
    source_col: str = "source",
    text_col: str = "text",
    v: int = 500,
) -> str:
    """DuckDB mirror — same vocab cut, grid, rounding ladder."""
    toks = sql_tokens(text_col)
    p = ("(CASE WHEN s_tot = 0 THEN 0.0"
         " ELSE s_cnt / CAST(s_tot AS DOUBLE) END)")
    q = "(c_cnt / CAST(c_tot AS DOUBLE))"
    m = f"(({p} + {q}) / 2)"
    return f"""
WITH term AS (
  SELECT {source_col} AS source, unnest({toks}) AS term FROM {table}
),
corpus AS (SELECT term, COUNT(*) AS c_cnt FROM term GROUP BY term),
vocab AS (SELECT term, c_cnt FROM corpus ORDER BY c_cnt DESC, term LIMIT {v}),
sc AS (
  SELECT source, term.term AS term, COUNT(*) AS s_cnt
  FROM term JOIN vocab USING (term) GROUP BY source, term.term
),
grid AS (
  SELECT s.source, vb.term, vb.c_cnt, COALESCE(sc.s_cnt, 0) AS s_cnt
  FROM (SELECT DISTINCT {source_col} AS source FROM {table}) s
  CROSS JOIN vocab vb
  LEFT JOIN sc ON sc.source = s.source AND sc.term = vb.term
),
tot AS (
  SELECT source, SUM(s_cnt) AS s_tot, SUM(c_cnt) AS c_tot
  FROM grid GROUP BY source
),
c AS (
  SELECT grid.source,
         CASE WHEN s_cnt > 0 THEN 1 ELSE 0 END AS present,
         ROUND(0.5 * (CASE WHEN s_cnt = 0 THEN 0.0
                           ELSE {p} * ln({p} / {m}) END)
               + 0.5 * ({q} * ln({q} / {m})), 6) AS contrib
  FROM grid JOIN tot ON grid.source = tot.source
)
SELECT source, CAST(SUM(present) AS INT) AS n_terms,
       CASE WHEN SUM(present) = 0 THEN ROUND(LN(2), 4)
            ELSE ROUND(SUM(contrib), 4)
       END AS js
FROM c GROUP BY source
"""
