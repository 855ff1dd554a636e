"""Text-processing primitives shared by the LLM-pipeline operators.

Every primitive has two forms that compute IDENTICAL values:
- a Spark Column/expression builder (JVM-side, codegen'd), and
- a DuckDB SQL fragment builder (for the correctness oracles).

The shared deterministic 60-bit hash is the first 15 hex chars of md5 —
the one hash both engines can compute bit-identically (Spark ``conv`` /
DuckDB ``'0x'||hex -> BIGINT`` cast). xxhash64/murmur would be faster in
Spark but has no DuckDB twin; at 100 TB you would swap ``F.xxhash64`` in
and drop oracle parity, not change the algorithm.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------------------
# shared 60-bit hash: h(s) = int(md5(s)[0:15], 16)
# --------------------------------------------------------------------------


def hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")


def sql_hash60(expr: str) -> str:
    return f"CAST('0x' || substr(md5(CAST({expr} AS VARCHAR)), 1, 15) AS BIGINT)"


# The same contract as a Spark SQL-expr fragment, for use inside
# higher-order-function lambdas (transform(...)) where a Column can't
# reach: ONE definition shared by the dedup shingle relation and the
# streaming near-dup verifier — a contract change here changes both,
# never a silent batch/stream divergence (r11 review).
HASH60_SPARK = "cast(conv(substr(md5({s}), 1, 15), 16, 10) as bigint)"


# seeded variant: h_i(s) = hash60(i || ':' || s)
HASH60_SEEDED_SPARK = (
    "cast(conv(substr(md5(concat(cast({i} as string), ':', {s})), 1, 15), 16, 10)"
    " as bigint)"
)
HASH60_SEEDED_SQL = (
    "CAST('0x' || substr(md5(CAST({i} AS VARCHAR) || ':' || {s}), 1, 15) AS BIGINT)"
)


# --------------------------------------------------------------------------
# tokenization
# --------------------------------------------------------------------------


def tokens(col: Column | str) -> Column:
    """Whitespace tokens (fixture texts are single-space separated)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(c, " ")


def sql_tokens(expr: str) -> str:
    return f"string_split({expr}, ' ')"


# BPE-ish surface tokenizer: letter runs | digit runs | single non-space
# symbol. Same regex class semantics in Java regex and RE2.
BPE_ISH_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


def bpe_ish_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.size(F.regexp_extract_all(c, F.lit(BPE_ISH_PATTERN), 0))


def sql_bpe_ish_count(expr: str) -> str:
    return f"CAST(len(regexp_extract_all({expr}, '{BPE_ISH_PATTERN}')) AS INT)"


# --------------------------------------------------------------------------
# word shingles (distinct k-gram sets) — the MinHash/Jaccard unit
# --------------------------------------------------------------------------


def shingles(tokens_col: str, k: int = 3) -> Column:
    """Distinct k-word shingles. Guarded for short texts: Spark's
    ``sequence(1, 0)`` DESCENDS ([1,0]), so size<k must short-circuit to
    an empty array."""
    return F.array_distinct(
        F.expr(
            f"case when size({tokens_col}) < {k}"
            " then cast(array() as array<string>)"
            f" else transform(sequence(1, size({tokens_col}) - {k - 1}),"
            f" i -> concat_ws(' ', slice({tokens_col}, i, {k}))) end"
        )
    )


def gram_hashes(tokens_col: str, k: int = 3) -> Column:
    """Distinct 64-bit hashes of the k-token windows, WITHOUT building
    the gram strings: ``xxhash64`` hashes the token-array slice directly,
    with the literal k folded in as an ADDITIONAL HASHED ARGUMENT so the
    per-k hash spaces differ (xxhash64's seed itself is fixed at 42 —
    Spark exposes no seed parameter; a cross-engine port must hash
    (slice, k) as a two-argument xxhash64 call, not seed with k).
    Hash-for-string is
    exact for counting because tokens are space-split (no token contains
    a space, so token-sequence <-> gram-string is a bijection) and 64-bit
    collisions are negligible at any test SF — the q67-documented 8-byte
    join-key trade, at 100 TB the only viable key width. Short texts
    short-circuit to empty exactly like ``shingles``."""
    return F.expr(
        f"case when size({tokens_col}) < {k}"
        " then cast(array() as array<bigint>)"
        f" else array_distinct(transform(sequence(1, size({tokens_col}) - {k - 1}),"
        f" i -> xxhash64(slice({tokens_col}, i, {k}), {k}))) end"
    )


def sql_shingles(tokens_expr: str, k: int = 3) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len({tokens_expr}) - {k - 2}, 1)),"
        f" i -> array_to_string(({tokens_expr})[i:i+{k - 1}], ' ')))"
    )


# --------------------------------------------------------------------------
# rolling polynomial fingerprint over characters (mod 2^31-1)
# --------------------------------------------------------------------------


def rolling_fingerprint(col_name: str) -> Column:
    return F.expr(
        f"aggregate(filter(split({col_name}, ''), ch -> ch <> ''),"
        " cast(0 as bigint), (acc, ch) -> (acc * 31 + ascii(ch)) % 2147483647)"
    )


def sql_rolling_fingerprint(expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(list_filter(string_split({expr}, ''), ch -> ch <> ''),"
        f" ch -> CAST(ascii(ch) AS BIGINT))),"
        " (acc, x) -> (acc * 31 + x) % 2147483647)"
    )


# --------------------------------------------------------------------------
# language-ID stopword lexicons (tiny, deterministic heuristic)
# --------------------------------------------------------------------------

LANG_LEXICONS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "is", "in", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "nicht", "mit", "auf", "zu"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "pas", "pour", "dans"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "no", "por", "como"),
    "zh": ("的", "是", "不", "了", "在", "人", "有", "我", "他", "这"),
}
LANG_ORDER = tuple(LANG_LEXICONS)  # deterministic argmax tie-break order


def _in_list(words: tuple[str, ...]) -> str:
    return ", ".join("'" + w.replace("'", "''") + "'" for w in words)


def lang_score(tokens_col: str, lang: str) -> Column:
    return F.expr(
        f"size(filter({tokens_col}, t -> t IN ({_in_list(LANG_LEXICONS[lang])})))"
    )


def sql_lang_score(tokens_expr: str, lang: str) -> str:
    return (
        f"CAST(len(list_filter({tokens_expr},"
        f" t -> t IN ({_in_list(LANG_LEXICONS[lang])}))) AS INT)"
    )


# --------------------------------------------------------------------------
# intra-document repetition stats (Gopher-style quality rules)
# --------------------------------------------------------------------------
# All computed with array higher-order functions over the token array —
# ZERO shuffle: every stat is a per-row expression, so the gate runs
# map-side at any corpus scale (the ideal shape for a 100 TB quality
# sweep; compare the corpus-global q52 boilerplate sweep, which needs a
# shuffle because its unit is the corpus, not the document).


def _grams_expr(tokens_col: str, k: int) -> str:
    """All k-gram strings of the token array, duplicates KEPT (repetition
    is the signal here — contrast shingles(), which dedupes)."""
    return (
        f"case when size({tokens_col}) < {k}"
        " then cast(array() as array<string>)"
        f" else transform(sequence(1, size({tokens_col}) - {k - 1}),"
        f" i -> concat_ws(' ', slice({tokens_col}, i, {k}))) end"
    )


def ngram_rep_stats(tokens_col: str, k: int) -> Column:
    """struct(n, n_distinct, top) for the doc's k-gram multiset:
    total count, distinct count, and the highest single k-gram frequency
    (max run length in the sorted gram array — a pure fold, no shuffle).

    Prefer projecting the gram array ONCE (``withColumn`` of
    :func:`_grams_expr`) and calling :func:`rep_stats_from_grams` on the
    column: inlining the gram build here evaluates it three times per row
    (size / distinct / fold), and Catalyst does not common-subexpression
    such interpreted HOFs — measured 1.9× wall on the q58 gate."""
    g = _grams_expr(tokens_col, k)
    return rep_stats_from_grams(g)


def rep_stats_from_grams(g: str) -> Column:
    """:func:`ngram_rep_stats` over an already-projected gram-array
    column (or any SQL expression yielding one)."""
    return F.expr(
        f"""named_struct(
          'n', size({g}),
          'n_distinct', size(array_distinct({g})),
          'top', aggregate(
             array_sort({g}),
             named_struct('prev', cast(null as string), 'run', 0, 'mx', 0),
             (acc, x) -> named_struct(
               'prev', x,
               'run', case when x = acc.prev then acc.run + 1 else 1 end,
               'mx', greatest(acc.mx,
                 case when x = acc.prev then acc.run + 1 else 1 end)),
             acc -> acc.mx))"""
    )


def sql_ngrams_with_dups(tokens_expr: str, k: int) -> str:
    """DuckDB mirror of ``_grams_expr`` — all k-grams, duplicates kept.
    The fold-based top-frequency has no clean DuckDB lambda equivalent,
    so oracles compute it relationally (unnest -> count -> max), which
    is equivalent; see Q58_SQL."""
    return (
        f"list_transform(range(1, greatest(len({tokens_expr}) - {k - 2}, 1)),"
        f" i -> array_to_string(({tokens_expr})[i:i+{k - 1}], ' '))"
    )
