"""Corpus-curation operators a training-data pipeline needs beyond dedup:
benchmark decontamination and deterministic dataset splitting.

- ``decontaminate``  — drop training documents that share any k-gram word
                       shingle with an evaluation/benchmark set. The eval
                       side is small by nature (benchmarks are thousands of
                       documents, the corpus is billions), so its distinct
                       shingle hashes BROADCAST and the corpus-side
                       membership probe is shuffle-free; the only shuffles
                       are on the (tiny) contaminated-id set. This is the
                       standard n-gram decontamination used before training
                       so eval results are not inflated by memorized test
                       items.
- ``split_assign``   — deterministic train/val/test assignment by hashing
                       the document id into 100 buckets (seeded md5, the
                       cross-engine hash from functions/text.py). Pure
                       map-side projection: no shuffle, stable across runs,
                       engines, and partitionings — re-running the pipeline
                       on a grown corpus never moves an existing document
                       between splits.

Both are deterministic and SQL-expressible, so the composed curation
pipeline (queries/llm.py q54) hash-checks against a DuckDB oracle.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.functions.text import (  # noqa: F401 (hash60: split_assign)
    gram_hashes,
    hash60,
    shingles,
    tokens,
)

# Version tag of the eval-hash contract shared by eval_shingle_hashes and
# decontaminate_stream. Bumped r15 when the basis moved from
# xxhash64(gram STRING) to xxhash64(token-slice, k) — the two bases are
# incompatible, and a stale persisted set probes EMPTILY (no error, zero
# filtering). Persist this tag next to any saved hash set and refuse a
# probe whose recorded tag differs (the _BLOOM_ENC pattern).
EVAL_HASH_BASIS = "xxhash64(token-slice,k):v2"


def _shingle_hashes(df: DataFrame, id_col: str, k: int) -> DataFrame:
    """(id, h) rows: one per distinct k-gram shingle per document (from a
    ``__toks`` token-array column), with the shingle replaced by its
    xxhash64 so every join key is fixed-width. Unlike MinHash/split
    bucketing, the hash here is ONLY a join key — which documents overlap
    is hash-agnostic (modulo 2^-64 collisions) — so the cheap JVM hash is
    used instead of the cross-engine md5: the DuckDB oracle joins on the
    raw shingle strings and reaches the identical contamination set
    (measured 2x faster than the md5 path on the corpus side)."""
    return (
        df.select(id_col, F.explode(shingles("__toks", k)).alias("__g"))
        .select(id_col, F.xxhash64("__g").alias("h"))
    )


def decontaminate(
    docs: DataFrame,
    eval_docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 4,
    probe: DataFrame | None = None,
) -> DataFrame:
    """Return the rows of ``docs`` that share NO k-gram shingle with any
    row of ``eval_docs``. Columns of ``docs`` pass through unchanged.

    ``probe`` (default ``docs``): the frame contamination is detected on.
    The semi-join side is scanned a second time to build the contaminated-
    id broadcast, so when ``docs`` sits downstream of expensive stages
    (dedup shuffles, window functions), pass the cheap upstream frame that
    contains at least the same (id, text) pairs — extra probe-side ids that
    are absent from ``docs`` can't survive the anti-join, so the result is
    identical and the expensive lineage executes exactly once.

    Plan shape (audited in tests/test_curation.py):
      1. eval distinct shingle hashes — tiny, broadcast;
      2. probe shingle explode + broadcast LEFT SEMI join -> contaminated
         ids (no shuffle of the corpus);
      3. distinct on contaminated ids (shuffle of a small id set only);
      4. corpus LEFT ANTI join on the (small, broadcast) contaminated ids.
    """
    p = (probe if probe is not None else docs).withColumn("__toks", tokens(text_col))
    e = eval_docs.withColumn("__toks", tokens(text_col))
    eval_hashes = _shingle_hashes(e, id_col, k).select("h").distinct()
    contaminated = (
        _shingle_hashes(p, id_col, k)
        .join(F.broadcast(eval_hashes), "h", "left_semi")
        .select(id_col)
        .distinct()
    )
    return docs.join(F.broadcast(contaminated), id_col, "left_anti")


def eval_shingle_hashes(
    eval_docs: DataFrame, text_col: str = "text", k: int = 4
) -> set[int]:
    """Collect the eval set's distinct k-gram hashes — the static side of
    streaming decontamination. Eval suites are small by nature, so this
    is a tiny driver-side set (the batch path broadcasts the same
    relation instead of collecting it).

    .. warning:: **Hash basis changed in r15** (contract
       ``EVAL_HASH_BASIS``): the hash is now ``gram_hashes`` — xxhash64
       over the (token-array slice, k) arguments, no gram string ever
       built — the same keys the q101 family joins on. It is
       INCOMPATIBLE with the pre-r15 basis (xxhash64 of the gram
       STRING): a hash set persisted or broadcast under the old basis
       matches nothing in :func:`decontaminate_stream` — no error, zero
       filtering. Persist ``EVAL_HASH_BASIS`` alongside any saved set
       and refuse a probe whose recorded basis differs (the pattern
       streaming/stateful.py's ``_BLOOM_ENC`` tag uses for Bloom state).
       Must stay in lockstep with :func:`decontaminate_stream`'s probe
       side, which shares the contract."""
    e = eval_docs.withColumn("__toks", tokens(text_col))
    return {
        r["h"]
        for r in (
            e.select(F.explode(gram_hashes("__toks", k)).alias("h"))
            .distinct()
            .collect()
        )
    }


def decontaminate_stream(
    docs: DataFrame,
    eval_hashes: set[int],
    text_col: str = "text",
    k: int = 4,
    bloom_k: int = 0,
    bloom_bits: int | None = None,
) -> DataFrame:
    """Streaming-legal decontamination: drop rows sharing any k-gram with
    the precollected ``eval_hashes`` (from :func:`eval_shingle_hashes`).

    The batch path's contaminated-id build is a second pass over the
    corpus (explode -> distinct -> anti join), which Structured Streaming
    cannot express; this variant decides per row in ONE pass — shingle
    hashes stay an array column and an Arrow-batched pandas UDF probes
    them against the closure set (O(shingles) set lookups per row, no
    shuffle, no state). Works identically on batch frames; the join-based
    :func:`decontaminate` stays the batch default because the JVM join
    beats Python row flags when a second corpus pass is allowed.

    ``eval_hashes`` may also be a ``sparkContext.broadcast`` of the set —
    for eval suites past a few hundred thousand shingles, broadcast once
    instead of shipping the set in every task closure.

    ``bloom_k > 0`` (opt-in) layers a JVM-side Bloom pre-filter in front
    of the exact probe: the eval set is driver-local here by
    construction, so a ``bloom_bits``-wide bitmap is built in numpy once
    and probed per gram hash with pure shift/mask expressions —
    ``bloom_k`` disjoint ``log2(bloom_bits)``-bit SLICES of the 64-bit
    hash index the bitmap (the q72 disjoint-digest-slices trick: no
    multiplies, so no overflow semantics to match across engines; the
    same slice arithmetic runs in numpy on the build side). Only
    bloom-POSITIVE hashes survive into ``__cand`` and cross Arrow, and
    the exact searchsorted probe resolves the bitmap's false positives,
    so the kept-doc set is IDENTICAL either way (no false negatives:
    every eval hash set its own bits; pinned in tests).

    **Why the default is OFF** (r16 A/B at sf0.1, equal parallelism,
    warm min-of-4): Spark evaluates higher-order-function lambdas
    INTERPRETED per element, so the per-hash bitmap test costs more CPU
    than the Arrow transfer it avoids — 0.67 s bloom-off vs 1.51 s at
    bloom_k=1 / 1.9 s at bloom_k=3 on the 32-way shape. The r15 "Arrow
    transfer wall" (1.1 s of a 1.5 s single-task pass) was a
    PARALLELISM wall: the fixture corpus is one parquet file = one
    input split, and fanning the scan out (q56's batch face) removed it
    outright. Opt in only where Python-side bandwidth — not CPU — is
    the binding constraint (e.g. a remote-python cluster boundary); at
    scale the corpus arrives in many splits and the transfer
    parallelizes the same way. The relational q165 Bloom stays the
    at-scale JOIN-side pre-filter.
    """
    import numpy as np

    cache: dict = {}  # per-worker: eval set as a SORTED int64 array

    ev_local = (
        eval_hashes.value if hasattr(eval_hashes, "value") else eval_hashes
    )
    n_ev = len(ev_local)
    if bloom_bits is None:
        # ~16 bits/key at k=3 probes -> fpp ~0.4%; capped at 2^20 bits
        # (a 16k-word array literal) so the plan stays small, floored at
        # 2^17 so tiny eval suites still spread their bits
        bloom_bits = 1 << max(17, min(20, (16 * max(n_ev, 1) - 1).bit_length()))
    if bloom_bits < 64 or bloom_bits & (bloom_bits - 1):
        # < 64 also catches 0, which would slip the power-of-two test
        # (0 & -1 == 0) and corrupt the slice width below
        raise ValueError(
            f"bloom_bits must be a power of two >= 64: {bloom_bits}"
        )
    p = bloom_bits.bit_length() - 1
    if bloom_k * p >= 64:
        # The i-th slice shifts the 64-bit hash right by i*p. At shift
        # >= 64 numpy uint64 shift is undefined while Spark/Java masks
        # the shift mod 64 — the two sides would diverge and a diverged
        # BUILD vs PROBE silently drops eval hashes (false negatives =
        # contaminated docs kept). Refuse up front so both sides can
        # never disagree.
        raise ValueError(
            f"bloom_k={bloom_k} with {p}-bit slices spans "
            f"{bloom_k * p} bits of a 64-bit hash; need bloom_k * "
            f"log2(bloom_bits) < 64"
        )
    if n_ev and bloom_k > 0:
        arr = np.fromiter(ev_local, dtype=np.int64, count=n_ev)
        u = arr.view(np.uint64)
        words = np.zeros(bloom_bits >> 6, dtype=np.uint64)
        for i in range(bloom_k):
            pos = (u >> np.uint64(i * p)) & np.uint64(bloom_bits - 1)
            np.bitwise_or.at(
                words,
                (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
        bloom_words = [int(w) for w in words.view(np.int64)]
    else:
        bloom_words = None  # nothing to match: skip the pre-filter

    @F.pandas_udf("boolean")
    def _clean(hs: pd.Series) -> pd.Series:
        ev_arr = cache.get("ev")
        if ev_arr is None:
            ev = (
                eval_hashes.value
                if hasattr(eval_hashes, "value")
                else eval_hashes
            )
            ev_arr = np.fromiter(ev, dtype=np.int64, count=len(ev))
            ev_arr.sort()
            cache["ev"] = ev_arr
        n = len(hs)
        # NULL text -> empty/null hash array: a doc with no shingles
        # cannot be contaminated, so KEEP it — matching the batch path,
        # where explode(NULL) simply contributes no contaminated id
        # (r13 review: iterating None crash-looped the micro-batch).
        lens = np.fromiter(
            (0 if a is None else len(a) for a in hs), dtype=np.int64, count=n
        )
        out = np.ones(n, dtype=bool)
        total = int(lens.sum())
        if total == 0 or ev_arr.size == 0:
            return pd.Series(out)
        flat = np.concatenate(
            [np.asarray(a, dtype=np.int64) for a in hs if a is not None and len(a)]
        )
        # membership via one sorted binary search over the batch — the
        # per-element python set lookups this replaces were O(total)
        # interpreter dispatches per micro-batch (r15 A/B)
        idx = np.searchsorted(ev_arr, flat)
        idx[idx == ev_arr.size] = 0
        hit = ev_arr[idx] == flat
        nz = lens > 0
        starts = np.zeros(n, dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out[nz] = np.add.reduceat(hit, starts[nz]) == 0
        return pd.Series(out)

    with_hashes = (
        docs.withColumn("__toks", tokens(text_col))
        .withColumn("__hs", gram_hashes("__toks", k))
        .drop("__toks")
    )
    if bloom_words is not None:
        wcol = F.lit(bloom_words)  # one array<bigint> literal in the plan

        def _bloom_maybe(h):
            cond = None
            for i in range(bloom_k):
                base = F.shiftrightunsigned(h, i * p) if i else h
                pos = base.bitwiseAND(F.lit(bloom_bits - 1))
                word = F.element_at(
                    wcol, F.shiftrightunsigned(pos, 6).cast("int") + 1
                )
                mask = F.call_function(
                    "shiftleft",
                    F.lit(1).cast("bigint"),
                    pos.bitwiseAND(F.lit(63)).cast("int"),
                )
                c = word.bitwiseAND(mask) != 0
                cond = c if cond is None else (cond & c)
            return cond

        with_hashes = with_hashes.withColumn(
            "__cand", F.filter("__hs", _bloom_maybe)
        )
    else:
        with_hashes = with_hashes.withColumn("__cand", F.col("__hs"))
    return (
        with_hashes.filter(_clean(F.col("__cand"))).drop("__hs", "__cand")
    )


def compression_ratio_gate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lo: float = 0.25,
    hi: float = 0.95,
    level: int = 6,
) -> DataFrame:
    """Per-document zlib compression ratio + keep band — the corpus-filter
    signal that catches both templated/repetitive text (ratio near 0: the
    deflate dictionary eats it) and encoding noise / binary spills (ratio
    near 1: incompressible), used alongside the Gopher-style rules (q58).

    Output: (id, n_bytes, z_bytes, ratio, keep) with keep = lo <= ratio
    <= hi. The deflate pass is genuinely inexpressible in JVM builtins,
    so this is a justified Python step: one Arrow-batched pandas UDF,
    map-side only — no shuffle, no state, linear in corpus bytes, and
    embarrassingly parallel at any scale. Ratio is deterministic for a
    fixed zlib level (RFC 1950 stream, stdlib zlib), pinned by a direct
    zlib parity test in tests/test_curation.py; no DuckDB oracle exists
    for deflate, so the registry entry is rows-only.
    """
    import zlib

    @F.pandas_udf("long")
    def _z_bytes(s: pd.Series) -> pd.Series:
        # na_action: a NULL text row must yield NULL bytes, not crash
        # the Arrow batch on None.encode (r13 review)
        return s.map(
            lambda t: len(zlib.compress(t.encode("utf-8"), level)),
            na_action="ignore",
        )

    n_bytes = F.octet_length(F.col(text_col))
    out = docs.select(
        F.col(id_col),
        n_bytes.alias("n_bytes"),
        _z_bytes(F.col(text_col)).alias("z_bytes"),
    )
    ratio = F.round(
        F.col("z_bytes").cast("double") / F.greatest(F.col("n_bytes"), F.lit(1)), 6
    )
    return out.select(
        id_col,
        F.col("n_bytes").cast("int").alias("n_bytes"),
        F.col("z_bytes").cast("int").alias("z_bytes"),
        ratio.alias("ratio"),
        # NULL text -> NULL ratio -> keep must be a definite False, not
        # a NULL that silently drops out of both keep and ~keep filters
        F.coalesce((ratio >= lo) & (ratio <= hi), F.lit(False)).alias(
            "keep"
        ),
    )


def split_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, ...] = (90, 5, 5),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Add ``out_col`` assigning each row to one of ``names`` with
    proportions ``weights`` (percent, must sum to 100), decided by
    ``hash60(seed || ':' || id) % 100``. Deterministic, engine-agnostic,
    and independent of row order or partitioning."""
    if len(weights) != len(names):
        raise ValueError("weights and names must align")
    if sum(weights) != 100:
        raise ValueError(f"weights must sum to 100, got {sum(weights)}")
    bucket = F.pmod(
        hash60(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))), F.lit(100)
    )
    col = None
    hi = 0
    for w, name in zip(weights, names):
        hi += w
        col = (
            F.when(bucket < hi, F.lit(name))
            if col is None
            else col.when(bucket < hi, F.lit(name))
        )
    return df.withColumn(out_col, col)


def sql_split_assign(id_expr: str, weights=(90, 5, 5), names=("train", "val", "test"), seed: str = "split") -> str:
    """DuckDB mirror of ``split_assign``'s bucket->name CASE expression."""
    from franzoxide_spark.functions.text import sql_hash60

    seeded = "'" + seed + ":' || CAST(" + id_expr + " AS VARCHAR)"
    bucket = f"({sql_hash60(seeded)} % 100)"
    parts, hi = [], 0
    for w, name in zip(weights, names):
        hi += w
        parts.append(f"WHEN {bucket} < {hi} THEN '{name}'")
    return "CASE " + " ".join(parts) + " END"


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    id_col: str,
    k: int,
    seed: str = "sample",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic k-per-stratum sample: rank rows within each stratum
    by the seeded cross-engine hash of their id (ties impossible — the
    id breaks them) and keep the first ``k``.

    This is the reproducible counterpart of reservoir sampling: the same
    (seed, id) always lands at the same rank, so re-running on a grown
    corpus only ever APPENDS to a stratum's sample (documents already
    chosen stay chosen until k pushes them out), and two engines agree
    exactly — which is what makes held-out subsets auditable.

    Scale shape: one shuffle on the stratum key (the window partition);
    each stratum sorts independently. For a stratum too hot to sort in
    one task, pre-filter with an approximate hash-threshold first (keep
    rows with hash < k/stratum_count quantile) and rank only the
    survivors — same result, bounded task input.
    """
    from pyspark.sql import Window

    h = hash60(F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string")))
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(id_col).asc())
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= k)
    )


def sql_stratified_sample(
    table: str,
    stratum_expr: str,
    id_expr: str,
    k: int,
    seed: str = "sample",
    rank_col: str = "sample_rank",
) -> str:
    """DuckDB mirror of ``stratified_sample`` (same seeded hash, same
    ordering, same rank filter)."""
    from franzoxide_spark.functions.text import sql_hash60

    seeded = "'" + seed + ":' || CAST(" + id_expr + " AS VARCHAR)"
    return f"""
SELECT * FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY {stratum_expr}
    ORDER BY {sql_hash60(seeded)} ASC, {id_expr} ASC
  ) AS {rank_col}
  FROM {table}
) WHERE {rank_col} <= {k}
"""


def cluster_safe_split(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    weights: tuple[int, ...] = (90, 5, 5),
    names: tuple[str, ...] = ("train", "val", "test"),
    seed: str = "split",
) -> DataFrame:
    """Leakage-free train/val/test assignment: near-duplicate CLUSTERS are
    the split unit, not documents.

    ``split_assign`` keyed on doc_id puts two near-identical documents in
    different splits ~10% of the time (for 90/5/5) — the classic
    train/test contamination that inflates eval loss. Here the pair graph
    (any finder: q33/q34/q35/q36) is clustered into connected components
    (operators/dedup.py:neardup_clusters) and the split hash is keyed on
    the CLUSTER id (singletons: their own id), so every member of a
    component lands in the same split by construction.

    Output: ``id_col, cluster_id, split``. Deterministic: same corpus +
    same pairs -> same assignment, and a document's split never depends
    on row order or partitioning.

    Scale shape: clustering shuffles only the pair graph (millions of
    times smaller than the corpus); the corpus itself takes ONE hash join
    against the (small) clustered-id relation plus a map-side hash — no
    corpus self-shuffle anywhere.
    """
    from franzoxide_spark.operators.dedup import neardup_clusters

    clusters = neardup_clusters(pairs).select(
        F.col("doc_id").alias(id_col), "cluster_id"
    )
    keyed = (
        docs.select(id_col)
        .join(clusters, id_col, "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", F.col(id_col)))
    )
    return split_assign(
        keyed, id_col="cluster_id", weights=weights, names=names, seed=seed
    ).select(id_col, "cluster_id", "split")


def weighted_sample(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    seed: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (Efraimidis &
    Spirakis 2006): each row gets key = ln(u)/w with u the seeded
    id-hash mapped into (0,1] and w its positive weight; the k LARGEST
    keys are the sample, distributed P(i in sample) ∝ w_i. Deterministic
    (same corpus + seed -> same sample), order/partition-independent,
    and engine-agreeing: the key is ROUNDED to 12 dp before ranking so
    last-ulp ln/pow differences between libm implementations cannot flip
    the boundary rank (tie-break: the id).

    Scale shape: key is map-side; selection is one top-k
    (TakeOrdered-shaped when k is small), never a global sort of the
    corpus.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    u = hash60(
        F.concat_ws(":", F.lit(seed), F.col(id_col).cast("string"))
    ).cast("double") / F.lit(float(1 << 60))
    w = F.col(weight_col).cast("double")
    key = F.round(F.log(u) / w, 12)
    # orderBy + limit plans as TakeOrderedAndProject — per-partition
    # top-k then a driver merge of k-row heads. The previous
    # unpartitioned row_number window funnelled every surviving row
    # through ONE task for a global sort, the exact shape the docstring
    # promises to avoid (r13 review).
    return (
        df.filter(w > 0)
        .withColumn("__wkey", key)
        .orderBy(F.desc("__wkey"), F.asc(id_col))
        .limit(k)
        .withColumnRenamed("__wkey", "sample_key")
    )


def sql_weighted_sample(
    rel: str, id_col: str, weight_col: str, k: int, seed: str = "wsample"
) -> str:
    from franzoxide_spark.functions.text import sql_hash60

    seeded = f"'{seed}:' || CAST({id_col} AS VARCHAR)"
    u = f"(CAST({sql_hash60(seeded)} AS DOUBLE) / {float(1 << 60)})"
    key = f"ROUND(LN({u}) / CAST({weight_col} AS DOUBLE), 12)"
    return f"""
WITH keyed AS (
  SELECT *, {key} AS sample_key FROM {rel}
  WHERE CAST({weight_col} AS DOUBLE) > 0
),
ranked AS (
  SELECT *, row_number() OVER (
    ORDER BY sample_key DESC, {id_col} ASC
  ) AS rk
  FROM keyed
)
SELECT * EXCLUDE (rk) FROM ranked WHERE rk <= {k}
"""
