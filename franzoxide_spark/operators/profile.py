"""Single-pass numeric table profiling: the data-quality snapshot a
pipeline takes before trusting a new drop of data (null rates, exact
cardinalities, ranges, deterministic means).

One aggregation job computes every column's stats (moments AND exact
NDVs — see the fused-shape note inside ``profile_numeric``), then a
map-side explode unpivots the 1-row aggregate into one row per column.
Means accumulate as scaled BIGINT sums and lift to the exact-decimal
value on the final row only (identical 6-dp doubles, codegen-speed
per-row work — r17).

Scale note: multiple exact COUNT(DISTINCT) in one aggregate triggers
Spark's Expand strategy (input × (#distinct-aggs + 1) before the
shuffle). With long-sum moments that replay is cheap and the fused
single scan wins (0.49 s vs 0.84 s two-job split at sf0.1, r17); it
was the per-row BigDecimal means that once made Expand prohibitive
(r14: 15.6 s). At 100 TB swap ``exact_distinct=False`` to
``approx_count_distinct`` (HLL, no Expand at all) when ±2% NDV is
acceptable.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import (
    _SHIFT,
    scaled_int,
    sql_dec,
)


def profile_numeric(
    df: DataFrame, cols: Sequence[str], exact_distinct: bool = True
) -> DataFrame:
    """One row per column: (col_name, n_rows, n_null, n_distinct,
    min_val, max_val, mean_val) — min/max/mean rounded to 6 dp.

    Means accumulate as BIGINT sums of the half-up-scaled values
    (``scaled_int``, the q91 co-moment kernel's quantization) and lift
    to decimal only on the single final row: Σ(sᵢ·shift) = (Σsᵢ)·shift
    exactly, so the value — and the 6-dp rounded double — is identical
    to summing ``dec()`` per row, while the per-row work is whole-stage
    codegen long arithmetic instead of interpreted BigDecimal. Bound:
    |Σ scaled| < 2⁶³, i.e. ~9.2e14 of absolute column mass at 1e-4
    quantization — the same envelope the correlation kernels document.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__cnt_{c}"),
            F.round(F.min(c).cast("double"), 6).alias(f"__min_{c}"),
            F.round(F.max(c).cast("double"), 6).alias(f"__max_{c}"),
            F.round(
                (
                    F.sum(scaled_int(F.col(c))).cast("decimal(38,0)")
                    * F.lit(_SHIFT).cast("decimal(5,4)")
                ).cast("double")
                / F.count(c),
                6,
            ).alias(f"__mean_{c}"),
        ]
    # ONE aggregation job for moments AND NDVs (r17 re-measure at sf0.1,
    # warm cache, best-of-4: fused 0.49 s vs the former two-job
    # crossJoin 0.84 s). The Expand the exact COUNT(DISTINCT)s trigger
    # replays the other aggregates over (#distinct-aggs + 1)× the input,
    # which priced the fused shape out when the means were per-row
    # BigDecimal sums (the r14 15.6 s measurement) — with the means now
    # plain long sums the replay is cheap codegen arithmetic and the
    # fused single scan + single final row wins on both jobs and wall.
    nd = F.countDistinct if exact_distinct else F.approx_count_distinct
    one = df.agg(*(aggs + [nd(c).alias(f"__nd_{c}") for c in cols]))
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("col_name"),
                F.col("__n").alias("n_rows"),
                (F.col("__n") - F.col(f"__cnt_{c}")).alias("n_null"),
                F.col(f"__nd_{c}").alias("n_distinct"),
                F.col(f"__min_{c}").alias("min_val"),
                F.col(f"__max_{c}").alias("max_val"),
                F.col(f"__mean_{c}").alias("mean_val"),
            )
            for c in cols
        ]
    )
    return one.select(F.explode(rows).alias("p")).select("p.*")


def sql_profile_numeric(table: str, cols: Sequence[str]) -> str:
    parts = [
        f"""SELECT '{c}' AS col_name, COUNT(*) AS n_rows,
       COUNT(*) - COUNT({c}) AS n_null,
       COUNT(DISTINCT {c}) AS n_distinct,
       ROUND(CAST(MIN({c}) AS DOUBLE), 6) AS min_val,
       ROUND(CAST(MAX({c}) AS DOUBLE), 6) AS max_val,
       ROUND(CAST(SUM({sql_dec(c)}) AS DOUBLE) / COUNT({c}), 6) AS mean_val
FROM {table}"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)


# --------------------------------------------------------------------------
# pairwise Pearson correlation (exact-decimal co-moments)
# --------------------------------------------------------------------------


# int64 co-moment kernel constants: products are hi/lo-split at 2³¹ so
# every accumulator is a plain BIGINT sum (whole-stage codegen long
# arithmetic) instead of decimal(38,0) (interpreted BigDecimal — the
# measured 6-10x constant vs DuckDB's native int128, BASELINE.md "q91
# int64 kernel A/B"). Exactness is fully preserved: Σxy = Σhi·2³¹ + Σlo
# with every term integer-exact, reconstructed in decimal(38,0) on the
# single agg row — so the kernel's doubles are BIT-IDENTICAL to the
# decimal kernel's and to DuckDB's native HUGEINT sum (one mirror
# serves all paths, and the oracle keeps its cheap natural form).
_B31 = 2147483648  # 2^31, the hi/lo split radix
# conservative guard bounds (engine-side raise_error when violated):
# checked in doubles with ~2x margin under int64 max, using only n and
# M = max|s| — both computed overflow-free in the same pass, so the
# check stays sound even when the guarded sums themselves would wrap.
_M_SAFE = 3.0e9      # per-row product s_a*s_b must fit int64 (√(2⁶³) ≈ 3.04e9)
_I64_SAFE = 4.6e18   # every Σ bound (n·M, n·M²/2³¹, n·2³¹) kept under this


def correlation_matrix(
    df: DataFrame, cols: Sequence[str], *, kernel: str = "int64"
) -> DataFrame:
    """Pairwise Pearson correlation for every unordered column pair,
    one row per pair: (col_x, col_y, corr) with corr rounded to 6 dp.

    Neither engine's built-in ``corr`` is used: their streaming
    co-moment updates accumulate in different orders, which flaps the
    low bits. Instead ONE aggregation pass collects EXACT INTEGER sums
    over the deterministically scaled values s = floor(x·10⁴ + 0.5)
    (same quantization as functions/numeric.py), and the textbook
    n·Σxy − Σx·Σy formula then runs as an identical double expression
    on both engines. Single scan, map-side partial aggregation,
    #cols² agg buffers — no shuffle beyond the 1-row final merge.

    ``kernel="int64"`` (default): each product s_a·s_b is split
    exactly into (hi, lo) at radix 2³¹ — lo = pmod(p, 2³¹) ∈ [0, 2³¹),
    hi = (p − lo) div 2³¹ — and both halves accumulate as BIGINT sums
    (codegen long arithmetic; the r12 A/B measured 9.27 s → 0.95 s at
    the 10× replica vs the decimal kernel). Validity needs the guard
    bounds above; they are checked ENGINE-SIDE from n and max|s|
    (computed overflow-free in the same pass) and violation raises
    with a pointer at ``kernel="decimal"`` rather than returning
    silently-wrapped sums. For lineitem-magnitude data (|x| ≤ ~10⁵,
    so M ≤ ~10⁹) the bounds hold to ~10⁹ rows.

    ``kernel="decimal"``: the original DECIMAL(38,0)/HUGEINT sums —
    ~6-10× slower on the Spark side; the path for data beyond the
    int64 guard. Its own honest ceiling is the decimal(38,0) product
    width (n·s_a·s_b < 10³⁸), hit LOUDLY under ANSI — and scaled_int
    floors decimal outputs in the decimal domain, so values past 2⁶³
    stay exact instead of silently saturating through floor's LONG
    return (r12 review).
    """
    if kernel not in ("int64", "decimal"):
        raise ValueError(f"kernel must be 'int64' or 'decimal', got {kernel!r}")
    if len(cols) < 2:
        raise ValueError(
            f"pairwise correlation needs at least 2 cols, got {len(cols)}"
        )
    if kernel == "decimal":
        return _correlation_matrix_decimal(df, cols)

    from franzoxide_spark.functions.numeric import scaled_int

    scaled = df.select(*[scaled_int(c).alias(c) for c in cols])
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(F.col(c)).cast("double").alias(f"__s_{c}"))
        # magnitude via max/min cast to double THEN negated — never
        # abs() on the bigint: with ANSI off, a huge negative x clamps
        # s to Long.MIN and abs(Long.MIN) WRAPS back negative, hiding
        # the clamp from the guard (r12 review); double(Long.MIN)
        # negates safely and trips m > _M_SAFE as intended
        aggs.append(F.max(F.col(c)).cast("double").alias(f"__mx_{c}"))
        aggs.append(F.min(F.col(c)).cast("double").alias(f"__mn_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            lo = f"pmod(`{a}` * `{b}`, {_B31})"
            hi = f"((`{a}` * `{b}`) - {lo}) div {_B31}"
            aggs.append(F.sum(F.expr(hi)).alias(f"__ph_{a}_{b}"))
            aggs.append(F.sum(F.expr(lo)).alias(f"__pl_{a}_{b}"))
    one = scaled.agg(*aggs)
    n = F.col("__n").cast("double")
    m = F.greatest(
        *[F.col(f"__mx_{c}") for c in cols],
        *[-F.col(f"__mn_{c}") for c in cols],
    )
    bad = (
        (m > F.lit(_M_SAFE))
        | (n * m > F.lit(_I64_SAFE))
        | (n * m * m / F.lit(float(_B31)) > F.lit(_I64_SAFE))
        | (n * F.lit(float(_B31)) > F.lit(_I64_SAFE))
    )
    guard = F.expr(
        "cast(raise_error('correlation_matrix int64 kernel bounds "
        "exceeded (n or max|x| too large for exact BIGINT co-moments); "
        "re-run with kernel=\"decimal\"') as double)"
    )

    def _p(a: str, b: str) -> F.Column:
        # EXACT reconstruction of Σxy on the single agg row: Σhi·2³¹ +
        # Σlo in decimal(38,0) (one row — the decimal cost that was
        # retired from the per-row hot path is negligible here), THEN
        # one cast to double. double(exact integer) is the same value
        # the decimal kernel and DuckDB's native HUGEINT sum produce,
        # so all three paths are bit-identical and the DuckDB mirror
        # stays the natural cheap SUM(a*b) — no pessimized oracle.
        return F.expr(
            f"cast((cast(__ph_{a}_{b} as decimal(38,0)) * {_B31}"
            f" + __pl_{a}_{b}) as double)"
        )

    def _corr(a: str, b: str) -> F.Column:
        num = n * _p(a, b) - F.col(f"__s_{a}") * F.col(f"__s_{b}")
        va = n * _p(a, a) - F.col(f"__s_{a}") * F.col(f"__s_{a}")
        vb = n * _p(b, b) - F.col(f"__s_{b}") * F.col(f"__s_{b}")
        return F.when(bad, guard).otherwise(
            F.round(num / F.sqrt(va * vb), 6)
        )

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                _corr(a, b).alias("corr"),
            )
            for i, a in enumerate(cols)
            for b in cols[i + 1 :]
        ]
    )
    return one.select(F.explode(pairs).alias("p")).select("p.*")


def _correlation_matrix_decimal(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """The DECIMAL(38,0) co-moment kernel (see correlation_matrix):
    order-independent exact sums with no magnitude bounds; duckdb
    overflows DECIMAL(18,4)² products, hence the unscaled quantized
    integers here too."""
    from franzoxide_spark.functions.numeric import scaled_int

    def _sc(c: str) -> F.Column:
        return scaled_int(c, out_type="decimal(38,0)")

    # Overflow must be LOUD without relying on ANSI mode: with
    # spark.sql.ansi.enabled=false a scaled value past decimal(38,0)
    # range (or a product past the decimal multiply width) casts to
    # NULL per row, SUM silently skips it while __n still counts the
    # row — a plausible-but-wrong correlation with no error, the same
    # silent class the int64 kernel's guard closes (r12 ADVICE #3).
    # Cheap engine-side detection in the SAME pass: the non-null count
    # of each scaled column must equal the source column's, and each
    # product's non-null count must equal the count of rows where both
    # operands are non-null (count(a+b) — a double add never nulls a
    # non-null pair).
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs.append(F.sum(_sc(c)).cast("double").alias(f"__s_{c}"))
        aggs.append(F.count(F.col(c)).alias(f"__cv_{c}"))
        aggs.append(F.count(_sc(c)).alias(f"__cs_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            aggs.append(
                F.sum(_sc(a) * _sc(b)).cast("double").alias(f"__p_{a}_{b}")
            )
            aggs.append(F.count(_sc(a) * _sc(b)).alias(f"__cp_{a}_{b}"))
            aggs.append(
                F.count(
                    F.col(a).cast("double") + F.col(b).cast("double")
                ).alias(f"__cb_{a}_{b}")
            )
    one = df.agg(*aggs)
    n = F.col("__n").cast("double")
    bad = F.lit(False)
    for c in cols:
        bad = bad | (F.col(f"__cs_{c}") != F.col(f"__cv_{c}"))
    for i, a in enumerate(cols):
        for b in cols[i:]:
            bad = bad | (F.col(f"__cp_{a}_{b}") != F.col(f"__cb_{a}_{b}"))
    guard = F.expr(
        "cast(raise_error('correlation_matrix decimal kernel overflow: "
        "a scaled value or co-moment product exceeded decimal range and "
        "would be silently dropped from the sums (non-ANSI null cast); "
        "the input magnitudes are beyond even the decimal kernel') "
        "as double)"
    )

    def _corr(a: str, b: str) -> F.Column:
        num = n * F.col(f"__p_{a}_{b}") - F.col(f"__s_{a}") * F.col(f"__s_{b}")
        va = n * F.col(f"__p_{a}_{a}") - F.col(f"__s_{a}") * F.col(f"__s_{a}")
        vb = n * F.col(f"__p_{b}_{b}") - F.col(f"__s_{b}") * F.col(f"__s_{b}")
        return F.when(bad, guard).otherwise(F.round(num / F.sqrt(va * vb), 6))

    pairs = F.array(
        *[
            F.struct(
                F.lit(a).alias("col_x"),
                F.lit(b).alias("col_y"),
                _corr(a, b).alias("corr"),
            )
            for i, a in enumerate(cols)
            for b in cols[i + 1 :]
        ]
    )
    return one.select(F.explode(pairs).alias("p")).select("p.*")


def sql_correlation_matrix(table: str, cols: Sequence[str]) -> str:
    """DuckDB mirror of :func:`correlation_matrix` — ONE mirror serves
    both Spark kernels: the natural HUGEINT product-sums (exact, native
    int128, the cheap form for DuckDB) cast to double. The int64
    kernel's final Σhi·2³¹ + Σlo reconstruction and the decimal
    kernel's Σ(a·b) are the SAME exact integer, so both cast to the
    identical double and the 6-dp rounding cannot diverge."""
    from franzoxide_spark.functions.numeric import sql_scaled_int

    sums = ["COUNT(*) AS n"]
    for c in cols:
        sums.append(f"CAST(SUM({c}) AS DOUBLE) AS s_{c}")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            sums.append(
                f"CAST(SUM(CAST({a} AS HUGEINT) * {b}) AS DOUBLE)"
                f" AS p_{a}_{b}"
            )
    scaled = ", ".join(
        f"{sql_scaled_int(c)} AS {c}" for c in cols
    )
    parts = [f"s AS (SELECT {scaled} FROM {table})"]

    def _p(a: str, b: str) -> str:
        return f"p_{a}_{b}"

    parts.append(f"agg AS (SELECT {', '.join(sums)} FROM s)")
    arms = []
    for i, a in enumerate(cols):
        for b in cols[i + 1 :]:
            arms.append(
                f"""SELECT '{a}' AS col_x, '{b}' AS col_y,
       ROUND((CAST(n AS DOUBLE) * {_p(a, b)} - s_{a} * s_{b})
             / SQRT((CAST(n AS DOUBLE) * {_p(a, a)} - s_{a} * s_{a})
                    * (CAST(n AS DOUBLE) * {_p(b, b)} - s_{b} * s_{b})), 6)
         AS corr
FROM agg"""
            )
    union = "\nUNION ALL\n".join(arms)
    return f"WITH {', '.join(parts)}\n{union}"


# --------------------------------------------------------------------------
# fixed-width histogram (equal-width bins between the column's min/max)
# --------------------------------------------------------------------------


def numeric_histogram(
    df: DataFrame, col: str, bins: int = 20
) -> DataFrame:
    """Equal-width histogram of a numeric column: (bin_id, lo, hi, n,
    share) over ``bins`` buckets spanning [min, max], max-value rows
    folded into the last bin (the standard closed-top convention).
    Empty bins are emitted with n=0 so the output is always exactly
    ``bins`` rows — a histogram with silent holes misreads as skew.

    Scale shape: EXACTLY two scans — pass 1 is a 1-row min/max aggregate
    collected to the driver (one row; the tiny-result collect is the
    same justified pattern as curation.py's eval-set build — leaving it
    as a DataFrame costs a third full scan, because the broadcast use
    and the grid use are different exchange shapes and Spark does not
    reuse the subtree); pass 2 computes each row's bin map-side from
    the literalized edges and partial-aggregates counts into a
    ``bins``-bounded key space. Both engines derive the edges with the
    same double expression from the same exact min/max, so bin
    boundaries cannot flap.
    """
    row = df.agg(
        F.min(F.col(col).cast("double")).alias("__lo"),
        F.max(F.col(col).cast("double")).alias("__hi"),
        F.count(col).alias("__n"),
    ).first()
    lo, hi, total = row["__lo"], row["__hi"], row["__n"]
    if total == 0 or lo is None or hi is None:
        # empty / all-NULL column: the binning expression would divide by
        # a NULL width (engine-dependent NaN-vs-NULL bucketing) — emit
        # the bare grid, identical on both engines (sql mirror: total=0
        # branch).
        return df.sparkSession.range(bins).select(
            F.col("id").cast("int").alias("bin_id"),
            F.lit(None).cast("double").alias("lo"),
            F.lit(None).cast("double").alias("hi"),
            F.lit(0).cast("int").alias("n"),
            F.lit(None).cast("double").alias("share"),
        )
    lo_l = F.lit(lo).cast("double")
    hi_l = F.lit(hi).cast("double")
    width = (hi_l - lo_l) / bins
    # constant column: zero width makes floor(0/0) NaN and Spark/DuckDB
    # bucket NaN differently — bin with a safe width of 1 so every row
    # lands in bin 0 while the displayed edges still collapse to [lo, lo].
    bin_w = F.lit(1.0).cast("double") if hi == lo else width
    x = F.col(col).cast("double")
    bin_id = F.least(
        F.floor((x - lo_l) / bin_w), F.lit(bins - 1)
    ).cast("int")
    counts = (
        df.filter(x.isNotNull())
        .groupBy(bin_id.alias("bin_id"))
        .agg(F.count("*").alias("n"))
    )
    grid = df.sparkSession.range(bins).select(
        F.col("id").cast("int").alias("bin_id")
    )
    return grid.join(counts, "bin_id", "left").select(
        "bin_id",
        F.round(lo_l + F.col("bin_id") * width, 6).alias("lo"),
        F.round(lo_l + (F.col("bin_id") + 1) * width, 6).alias("hi"),
        F.coalesce("n", F.lit(0)).cast("int").alias("n"),
        F.round(
            F.coalesce("n", F.lit(0)).cast("double")
            / F.lit(total).cast("double"),
            6,
        ).alias("share"),
    )


def sql_numeric_histogram(table: str, col: str, bins: int = 20) -> str:
    return f"""
WITH mm AS (
  SELECT MIN(CAST({col} AS DOUBLE)) AS lo, MAX(CAST({col} AS DOUBLE)) AS hi,
         COUNT({col}) AS total
  FROM {table}
),
counts AS (
  SELECT CAST(LEAST(FLOOR((CAST({col} AS DOUBLE) - lo)
                          / (CASE WHEN hi = lo THEN 1.0
                                  ELSE (hi - lo) / {bins} END)),
              {bins - 1}) AS INT)
           AS bin_id,
         COUNT(*) AS n
  FROM {table}, mm
  WHERE {col} IS NOT NULL
  GROUP BY 1
),
grid AS (
  SELECT CAST(i AS INT) AS bin_id, lo, hi, total
  FROM mm, UNNEST(range(0, {bins})) AS t(i)
)
SELECT g.bin_id,
       CASE WHEN g.total = 0 THEN NULL
            ELSE ROUND(g.lo + g.bin_id * ((g.hi - g.lo) / {bins}), 6)
       END AS lo,
       CASE WHEN g.total = 0 THEN NULL
            ELSE ROUND(g.lo + (g.bin_id + 1) * ((g.hi - g.lo) / {bins}), 6)
       END AS hi,
       CAST(COALESCE(c.n, 0) AS INT) AS n,
       CASE WHEN g.total = 0 THEN NULL
            ELSE ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE)
                       / CAST(g.total AS DOUBLE), 6)
       END AS share
FROM grid g LEFT JOIN counts c USING (bin_id)
"""


# --------------------------------------------------------------------------
# semi-structured (JSON) column profiling
# --------------------------------------------------------------------------


def json_key_profile(df: DataFrame, json_col: str) -> DataFrame:
    """Schema-on-read exploration of a JSON string column: per key,
    presence count/fraction and a text-level value-kind breakdown
    (numeric / boolean / string) — the first question against a payload
    column nobody has a schema for.

    Kind classification is deliberately TEXT-level (regex on the
    unquoted extracted value, identical on both engines): Spark's
    ``from_json`` to ``map<string,string>`` and DuckDB's
    ``json_extract_string`` both surface unquoted text, so a JSON
    ``true`` and a JSON ``"true"`` are indistinguishable — documented
    precision limit, not a parity hazard. Keys containing ``.`` would
    break the DuckDB ``$.key`` path mirror; the operator targets flat
    payload objects.

    Scale shape: one scan, explode bounded by per-row key count, one
    shuffle on the (bounded) key space with map-side partial aggregation;
    the total-row count joins back as a broadcast 1-row aggregate.
    """
    kv = df.select(
        F.explode(
            F.from_json(F.col(json_col), "map<string,string>")
        ).alias("key", "value")
    )
    total = df.select(F.count(F.lit(1)).alias("__total"))
    is_num = F.col("value").rlike(r"^-?[0-9]+(\.[0-9]+)?$")
    is_bool = F.col("value").isin("true", "false")
    return (
        kv.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n_present"),
            F.sum(is_num.cast("int")).cast("int").alias("n_numeric"),
            F.sum((is_bool & ~is_num).cast("int")).cast("int").alias("n_bool"),
            F.sum((~is_num & ~is_bool).cast("int")).cast("int").alias("n_string"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n_present",
            F.round(
                F.col("n_present").cast("double") / F.col("__total").cast("double"),
                6,
            ).alias("frac"),
            "n_numeric",
            "n_bool",
            "n_string",
        )
    )


def sql_json_key_profile(rel: str, json_col: str) -> str:
    """DuckDB mirror: json_keys + unnest + per-key extract, same regex
    ladder. ``rel`` is a relation expression (table or subquery)."""
    return f"""
WITH src AS (SELECT {json_col} AS j FROM {rel}),
tot AS (SELECT COUNT(*) AS total FROM src),
kv AS (
  SELECT k AS key, json_extract_string(j, '$.' || k) AS value
  FROM (SELECT j, unnest(json_keys(j::JSON)) AS k FROM src)
),
cls AS (
  SELECT key,
         regexp_matches(value, '^-?[0-9]+(\\.[0-9]+)?$') AS is_num,
         value IN ('true', 'false') AS is_bool
  FROM kv
)
SELECT key, COUNT(*) AS n_present,
       ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(tot.total AS DOUBLE), 6) AS frac,
       CAST(SUM(CASE WHEN is_num THEN 1 ELSE 0 END) AS INT) AS n_numeric,
       CAST(SUM(CASE WHEN is_bool AND NOT is_num THEN 1 ELSE 0 END) AS INT)
         AS n_bool,
       CAST(SUM(CASE WHEN NOT is_num AND NOT is_bool THEN 1 ELSE 0 END) AS INT)
         AS n_string
FROM cls, tot
GROUP BY key, tot.total
"""


# --------------------------------------------------------------------------
# string-column type inference (schema suggestion)
# --------------------------------------------------------------------------

_TYPE_CHECKS = (
    # (kind, spark predicate template, duckdb predicate template)
    # int = integer-shaped TEXT (sign + digits) that a bigint cast also
    # accepts (range guard). The textual shape matters because the cast
    # semantics diverge: DuckDB's TRY_CAST('123.45' AS BIGINT) ROUNDS
    # and '87.0' casts clean, while Spark returns null for both — a
    # cast-only check cannot agree across engines
    ("int", "{c} rlike '^[+-]?[0-9]+$'"
            " and try_cast({c} as bigint) is not null",
     "regexp_matches({c}, '^[+-]?[0-9]+$')"
     " AND TRY_CAST({c} AS BIGINT) IS NOT NULL"),
    ("double", "try_cast({c} as double) is not null",
     "TRY_CAST({c} AS DOUBLE) IS NOT NULL"),
    # date = full ISO yyyy-MM-dd shape AND castable. The shape guard
    # matters at scale (r12 sf0.1 sweep finding): Spark's try_cast
    # accepts bare 'yyyy' / 'yyyy-MM' prefixes ('2024' -> 2024-01-01)
    # while DuckDB returns NULL — so 4-digit numeric ids silently
    # inflate frac_date on one engine only. A suggestion must mean the
    # unambiguous full-date rendering, not a year-shaped integer.
    ("date", "{c} rlike '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$'"
             " and try_cast({c} as date) is not null",
     "regexp_matches({c}, '^[0-9]{{4}}-[0-9]{{2}}-[0-9]{{2}}$')"
     " AND TRY_CAST({c} AS DATE) IS NOT NULL"),
    ("bool", "lower({c}) in ('true', 'false')",
     "LOWER({c}) IN ('true', 'false')"),
)


def infer_column_types(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Schema suggestion for string columns: per column, the fraction of
    non-null values parseable as int/double/date/bool and the suggested
    type — the narrowest kind covering >= 99% of non-null values, else
    ``string``. One aggregate pass over one scan for ALL columns.

    The try_cast ladder (not regexes) is deliberately the check: the
    suggestion must agree with what a later CAST will actually accept.
    ``int`` wins over ``double`` when both fit (ints are doubles);
    ``date`` and ``bool`` only apply when numerics don't.
    """
    if not cols:
        raise ValueError("cols must be non-empty")
    aggs = []
    for c in cols:
        aggs.append(F.count(c).alias(f"__n_{c}"))
        for kind, sp, _ in _TYPE_CHECKS:
            aggs.append(
                F.sum(
                    (F.col(c).isNotNull() & F.expr(sp.format(c=c)))
                    .cast("long")
                )
                .alias(f"__{kind}_{c}")
            )
    one = df.agg(*aggs)
    rows = []
    for c in cols:
        n = F.col(f"__n_{c}").cast("double")
        frac = {
            kind: F.round(
                F.coalesce(F.col(f"__{kind}_{c}"), F.lit(0)).cast("double")
                / F.greatest(n, F.lit(1.0)),
                6,
            )
            for kind, _, _ in _TYPE_CHECKS
        }
        thresh = 0.99
        suggested = (
            F.when((n > 0) & (frac["int"] >= thresh), "bigint")
            .when((n > 0) & (frac["double"] >= thresh), "double")
            .when((n > 0) & (frac["date"] >= thresh), "date")
            .when((n > 0) & (frac["bool"] >= thresh), "boolean")
            .otherwise("string")
        )
        rows.append(
            F.struct(
                F.lit(c).alias("col_name"),
                F.col(f"__n_{c}").cast("bigint").alias("n_values"),
                frac["int"].alias("frac_int"),
                frac["double"].alias("frac_double"),
                frac["date"].alias("frac_date"),
                frac["bool"].alias("frac_bool"),
                suggested.alias("suggested_type"),
            )
        )
    return one.select(F.explode(F.array(*rows)).alias("r")).select("r.*")


def sql_infer_column_types(rel: str, cols: Sequence[str]) -> str:
    """DuckDB mirror — same try_cast ladder, same 99% threshold."""
    arms = []
    for c in cols:
        checks = {
            kind: f"SUM(CASE WHEN {c} IS NOT NULL AND {dd.format(c=c)}"
                  f" THEN 1 ELSE 0 END)"
            for kind, _, dd in _TYPE_CHECKS
        }
        n = f"COUNT({c})"
        frac = {
            kind: f"ROUND(CAST(COALESCE({expr}, 0) AS DOUBLE)"
                  f" / GREATEST(CAST({n} AS DOUBLE), 1.0), 6)"
            for kind, expr in checks.items()
        }
        arms.append(f"""SELECT '{c}' AS col_name,
       CAST({n} AS BIGINT) AS n_values,
       {frac['int']} AS frac_int,
       {frac['double']} AS frac_double,
       {frac['date']} AS frac_date,
       {frac['bool']} AS frac_bool,
       CASE WHEN {n} > 0 AND {frac['int']} >= 0.99 THEN 'bigint'
            WHEN {n} > 0 AND {frac['double']} >= 0.99 THEN 'double'
            WHEN {n} > 0 AND {frac['date']} >= 0.99 THEN 'date'
            WHEN {n} > 0 AND {frac['bool']} >= 0.99 THEN 'boolean'
            ELSE 'string' END AS suggested_type
FROM {rel}""")
    return "\nUNION ALL\n".join(arms)


def fd_report(df: DataFrame, pairs: list[tuple[str, str]]) -> DataFrame:
    """Approximate-functional-dependency discovery: for each candidate
    ``determinant -> dependent`` pair, how close the table comes to
    satisfying the FD — the schema-normalization / data-contract
    discovery tool (Kivinen & Mannila's g3 error: the minimum fraction
    of rows to delete for the FD to hold exactly).

    Output per pair: ``determinant, dependent, n_groups`` (distinct
    determinant values), ``violating_groups`` (determinant values mapped
    to >1 dependent), ``g3_rows`` (rows outside each group's majority
    dependent), ``g3_rate`` (6dp), ``holds``.

    Scale shape (r17): ALL candidate pairs ride ONE scan. Each row
    explodes into one tagged sliver ``(pair_id, det_str, dep_str)`` per
    candidate (cast to string — injective per column, so group
    identities are preserved), and a single (pair, det, dep) map-side-
    combined count replaces the per-pair scans; the per-determinant and
    per-pair re-aggregations run over those bounded partials. The
    previous shape paid one scan + two exchanges + a SinglePartition
    collapse PER PAIR plus a separate ``count()`` job for the rate's
    denominator — now ``n_rows`` falls out of the same aggregate
    (``sum(tot)`` per pair: every row lands in exactly one (det, dep)
    group, nulls included, so the per-pair group-count sum IS the row
    count). Requires a non-empty ``df`` (the fused per-pair groupBy
    yields no rows on an empty table where the old ungrouped aggregates
    yielded one null-stats row per pair; profiling an empty table is
    meaningless for both shapes — pinned by tests/test_fd_report.py).

    Grouping keys are string-rendered (one tagged sliver per pair per
    row), which is injective per column EXCEPT for IEEE signed zero:
    native value grouping normalizes ``-0.0 == 0.0`` while the string
    cast renders them apart. Float/double candidates are therefore
    canonicalized with ``+ 0.0`` before the cast (``-0.0 + 0.0 == +0.0``
    exactly; every other value is unchanged, and the float→double
    promotion is exact), matching both the old native-value grouping and
    ``sql_fd_report`` (r17 ADVICE).
    """
    if not pairs:
        raise ValueError("pairs must be non-empty")
    from pyspark.sql import types as T

    fractional = {
        f.name
        for f in df.schema.fields
        if isinstance(f.dataType, (T.FloatType, T.DoubleType))
    }

    def _key(col: str):
        c = F.col(col)
        if col in fractional:
            c = c + F.lit(0.0)
        return c.cast("string")

    arms = [
        F.struct(
            F.lit(i).alias("__p"),
            _key(det).alias("__det"),
            _key(dep).alias("__dep"),
        )
        for i, (det, dep) in enumerate(pairs)
    ]
    ex = df.select(F.explode(F.array(*arms)).alias("__e")).select("__e.*")
    cnt = ex.groupBy("__p", "__det", "__dep").agg(
        F.count(F.lit(1)).alias("__c")
    )
    per_det = cnt.groupBy("__p", "__det").agg(
        F.sum("__c").alias("__tot"),
        F.max("__c").alias("__mx"),
        F.count(F.lit(1)).alias("__ndep"),
    )
    per_pair = per_det.groupBy("__p").agg(
        F.count(F.lit(1)).cast("int").alias("n_groups"),
        F.sum((F.col("__ndep") > 1).cast("long"))
        .cast("int")
        .alias("violating_groups"),
        F.sum(F.col("__tot") - F.col("__mx")).cast("bigint").alias("g3_rows"),
        F.sum("__tot").alias("__n_rows"),
    )
    det_expr = F.lit(pairs[0][0])
    dep_expr = F.lit(pairs[0][1])
    for i, (det, dep) in enumerate(pairs[1:], start=1):
        det_expr = F.when(F.col("__p") == i, F.lit(det)).otherwise(det_expr)
        dep_expr = F.when(F.col("__p") == i, F.lit(dep)).otherwise(dep_expr)
    return per_pair.select(
        det_expr.alias("determinant"),
        dep_expr.alias("dependent"),
        "n_groups",
        "violating_groups",
        "g3_rows",
        F.round(
            F.col("g3_rows") / F.col("__n_rows").cast("double"), 6
        ).alias("g3_rate"),
        (F.col("g3_rows") == 0).alias("holds"),
    )


def sql_fd_report(table: str, pairs: list[tuple[str, str]]) -> str:
    arms = []
    for det, dep in pairs:
        arms.append(f"""
SELECT '{det}' AS determinant, '{dep}' AS dependent,
       CAST(COUNT(*) AS INT) AS n_groups,
       CAST(SUM(CASE WHEN ndep > 1 THEN 1 ELSE 0 END) AS INT)
         AS violating_groups,
       CAST(SUM(tot - mx) AS BIGINT) AS g3_rows,
       ROUND(SUM(tot - mx) / (SELECT CAST(COUNT(*) AS DOUBLE) FROM {table}),
             6) AS g3_rate,
       SUM(tot - mx) = 0 AS holds
FROM (
  SELECT {det}, SUM(c) AS tot, MAX(c) AS mx, COUNT(*) AS ndep
  FROM (SELECT {det}, {dep}, COUNT(*) AS c FROM {table} GROUP BY {det}, {dep})
  GROUP BY {det}
)""")
    return " UNION ALL ".join(arms)
