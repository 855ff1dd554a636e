"""Deduplication operators for large-scale training-data pipelines.

All operators are shuffle-conscious compositions of built-in DataFrame ops
(no Python in the hot path):

- ``exact_dedup``       — hash-groupBy on a content key; survivor = min id.
                          One shuffle on the content hash; at 100 TB hash
                          the text first (64-bit) so the shuffle key is
                          fixed-width, then resolve rare collisions inside
                          the group.
- ``minhash_*``         — MinHash+LSH near-dup: per-doc signature (map-side
                          only), band explode (xN rows, still narrow),
                          bucket self-join on (band, band-hash) — the ONLY
                          shuffle is on band buckets, never all-pairs —
                          then exact Jaccard verification on candidates.
- ``simhash_*``         — 32-bit SimHash via bit-majority of token hashes;
                          candidate pairs by signature self-join with
                          bit_count(xor) <= r. The demo pairs stage is a
                          bucket-prefix join; at 100 TB you split the
                          signature into (r+1) bands (pigeonhole) exactly
                          like MinHash banding.
- ``jaccard_pairs``     — exact n-gram Jaccard via shingle explode +
                          equi-join on the shingle (shuffle on shingle
                          hash) — the exact counterpart MinHash
                          approximates; quadratic only within documents
                          sharing a shingle.

Everything is deterministic (md5-derived hashes) so results can be
oracle-checked cross-engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from franzoxide_spark.functions.text import (
    HASH60_SEEDED_SPARK,
    shingles,
    tokens,
)


def exact_dedup(df: DataFrame, content_col: str, id_col: str) -> DataFrame:
    """Keep one row per distinct content value — survivor is min(id).
    Returns (survivor id, content hash, n_copies)."""
    return (
        df.select(
            F.col(id_col),
            F.sha2(F.col(content_col), 256).alias("content_sha"),
        )
        .groupBy("content_sha")
        .agg(
            F.min(id_col).alias(id_col),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------


def minhash_signatures(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 8,
    shingle_k: int = 3,
) -> DataFrame:
    """Per-doc distinct shingle set + MinHash signature array<long>.

    sig[i] = min over shingles of h(i || ':' || shingle) — the classic
    k-independent-hash MinHash (Broder '97), with md5-derived hash
    functions. Entirely map-side: no shuffle."""
    h = HASH60_SEEDED_SPARK.format(i="i", s="s")
    return df.select(
        F.col(id_col),
        shingles("__toks", k=shingle_k).alias("shingle_set"),
    ).withColumn(
        "sig",
        F.expr(
            f"transform(sequence(0, {num_hashes - 1}),"
            f" i -> array_min(transform(shingle_set, s -> {h})))"
        ),
    ).withColumn("n_shingles", F.size("shingle_set"))


def _with_tokens(df: DataFrame, text_col: str) -> DataFrame:
    return df.withColumn("__toks", tokens(text_col))


def lsh_candidate_pairs(sig_df: DataFrame, id_col: str, bands: int, rows: int) -> DataFrame:
    """Band the signatures and self-join per bucket: docs agreeing on ALL
    ``rows`` hashes of any band become a candidate pair (a < b)."""
    banded = sig_df.select(
        F.col(id_col),
        F.explode(
            F.expr(
                f"transform(sequence(0, {bands - 1}),"
                f" b -> struct(b as band, slice(sig, b * {rows} + 1, {rows}) as bh))"
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bh")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )


def verify_jaccard(
    cand: DataFrame, sig_df: DataFrame, id_col: str
) -> DataFrame:
    """Exact Jaccard on candidate pairs from their distinct shingle sets."""
    sa = sig_df.select(
        F.col(id_col).alias("id_a"), F.col("shingle_set").alias("sh_a")
    )
    sb = sig_df.select(
        F.col(id_col).alias("id_b"), F.col("shingle_set").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = F.size(F.array_distinct(F.concat("sh_a", "sh_b"))).cast("double")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .select("id_a", "id_b", F.round(inter / union, 6).alias("jaccard"))
    )


def minhash_near_duplicates(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float = 0.8,
    num_hashes: int = 8,
    bands: int = 4,
    shingle_k: int = 3,
) -> DataFrame:
    rows = num_hashes // bands
    sig = minhash_signatures(
        _with_tokens(df, text_col), text_col, id_col, num_hashes, shingle_k
    )
    cand = lsh_candidate_pairs(sig, id_col, bands, rows)
    return verify_jaccard(cand, sig, id_col).filter(F.col("jaccard") >= threshold)


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------


def simhash_signatures(
    df: DataFrame, text_col: str, id_col: str, bits: int = 32
) -> DataFrame:
    """32-bit SimHash (Charikar '02): per distinct token, hash; per bit,
    +1/-1 vote; signature bit j set iff the vote sum is > 0.

    Implemented as explode(token) x explode(bit) -> two-level aggregation;
    ~tokens*32 narrow rows per doc, map-side combinable."""
    h = HASH60_SEEDED_SPARK.format(i="0", s="t")
    tok = (
        _with_tokens(df, text_col)
        .select(F.col(id_col), F.explode(F.array_distinct("__toks")).alias("t"))
        .withColumn("th", F.expr(h))
    )
    votes = (
        tok.select(
            id_col,
            F.explode(
                F.expr(
                    f"transform(sequence(0, {bits - 1}),"
                    " j -> struct(j as j, shiftleft(cast(1 as bigint), j) as mask))"
                )
            ).alias("b"),
            "th",
        )
        .select(
            id_col,
            F.col("b.j").alias("j"),
            F.col("b.mask").alias("mask"),
            F.when(F.col("th").bitwiseAND(F.col("b.mask")) != 0, 1)
            .otherwise(-1)
            .alias("vote"),
        )
        .groupBy(id_col, "j", "mask")
        .agg(F.sum("vote").alias("s"))
    )
    return votes.groupBy(id_col).agg(
        F.sum(F.when(F.col("s") > 0, F.col("mask")).otherwise(0)).alias("simhash")
    )


def simhash_near_duplicates(
    df: DataFrame, text_col: str, id_col: str, max_hamming: int = 3
) -> DataFrame:
    sig = simhash_signatures(df, text_col, id_col)
    a = sig.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"))
    b = sig.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"))
    ham = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


# --------------------------------------------------------------------------
# exact n-gram Jaccard (shingle-join, not all-pairs)
# --------------------------------------------------------------------------


def jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    threshold: float,
    shingle_k: int = 3,
) -> DataFrame:
    """Exact Jaccard for every pair sharing >= 1 shingle: explode distinct
    shingles, equi-join on the shingle, count per pair, then
    |A∩B| / (|A|+|B|-|A∩B|)."""
    sh = _with_tokens(df, text_col).select(
        F.col(id_col), shingles("__toks", k=shingle_k).alias("s")
    )
    sizes = sh.select(id_col, F.size("s").alias("n"))
    ex = sh.select(id_col, F.explode("s").alias("g"))
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.g") == F.col("b.g"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .groupBy(
            F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sizes.select(F.col(id_col).alias("id_a"), F.col("n").alias("na"))
    nb = sizes.select(F.col(id_col).alias("id_b"), F.col("n").alias("nb"))
    jac = F.round(
        F.col("inter").cast("double")
        / (F.col("na") + F.col("nb") - F.col("inter")).cast("double"),
        6,
    )
    return (
        inter.join(na, "id_a")
        .join(nb, "id_b")
        .select("id_a", "id_b", jac.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


# --------------------------------------------------------------------------
# embedding near-dup (exact; the LSH scale path lives in similarity.py)
# --------------------------------------------------------------------------


def embedding_near_duplicates(
    emb: DataFrame, id_col: str, vec_col: str, threshold: float
) -> DataFrame:
    """All-pairs cosine >= threshold. Exact and quadratic — correct at
    verification scale; at 100 TB use similarity.lsh_ann buckets as the
    candidate generator and this as the verifier."""
    from franzoxide_spark.functions.vectors import cosine_rounded

    a = emb.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = emb.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine_rounded("va", "vb"))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )
