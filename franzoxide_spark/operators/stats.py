"""Robust statistics over event streams: MAD outlier gates and
group-wise closed-form OLS trends.

Tier-C analytics (SURVEY.md §2.3): the two screens a monitoring /
feature pipeline runs over a metric stream — "which points are
anomalous" (median/MAD, robust to the outliers it hunts) and "which
series are drifting" (per-group linear trend). Both stay declarative:

* ``mad_outliers`` — two exact-percentile aggregations (the q49 path)
  with a broadcast join of the per-group medians between them; the
  group key space bounds every intermediate, the stream shuffles twice
  on the group key with partial aggregation.
* ``groupwise_ols`` — one aggregation computing the five classical sums
  (n, Σx, Σy, Σxy, Σx²) EXACTLY: x is integer seconds from a fixed
  epoch (bounded magnitude, deterministic), y goes through the
  exact-decimal path — so slope/intercept are a handful of double ops
  on identical operands in both engines and the 6-dp compare holds.
  One map-side-combined shuffle on the group key, nothing else.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from franzoxide_spark.functions.numeric import dec, sql_dec

# MAD consistency constant for normal data (sigma ~= 1.4826 * MAD)
MAD_K = 1.4826


def mad_outliers(
    events: DataFrame,
    key_col: str,
    value_col: str,
    n_sigmas: float = 3.0,
) -> DataFrame:
    """Per-key robust outlier screen: (key, n, median, mad, n_outliers)
    flagging points with |x - median| > n_sigmas * 1.4826 * MAD."""
    med = events.groupBy(key_col).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("__med")
    )
    with_med = events.join(F.broadcast(med), key_col)
    stats = with_med.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.first("__med").alias("__m"),
        F.expr(f"percentile(abs({value_col} - __med), 0.5)").alias("__mad"),
    )
    dev = F.abs(F.col(value_col) - F.col("__m"))
    return (
        with_med.join(F.broadcast(stats.drop("n")), key_col)
        .groupBy(key_col)
        .agg(
            F.count("*").alias("n"),
            F.round(F.first("__m"), 6).alias("median"),
            F.round(F.first("__mad"), 6).alias("mad"),
            F.sum(
                F.when(
                    dev > F.lit(n_sigmas * MAD_K) * F.col("__mad"), 1
                ).otherwise(0)
            ).cast("int").alias("n_outliers"),
        )
    )


def sql_mad_outliers(
    table: str, key_col: str, value_col: str, n_sigmas: float = 3.0
) -> str:
    return f"""
WITH med AS (
  SELECT {key_col}, quantile_cont({value_col}, 0.5) AS m
  FROM {table} GROUP BY {key_col}
),
j AS (
  SELECT t.{key_col}, t.{value_col} AS v, med.m
  FROM {table} t JOIN med USING ({key_col})
),
stats AS (
  SELECT {key_col}, COUNT(*) AS n, FIRST(m) AS m,
         quantile_cont(ABS(v - m), 0.5) AS mad
  FROM j GROUP BY {key_col}
)
SELECT s.{key_col}, CAST(s.n AS BIGINT) AS n,
       ROUND(s.m, 6) AS median, ROUND(s.mad, 6) AS mad,
       CAST(SUM(CASE WHEN ABS(j.v - s.m) > {n_sigmas * MAD_K} * s.mad
                     THEN 1 ELSE 0 END) AS INT) AS n_outliers
FROM j JOIN stats s USING ({key_col})
GROUP BY s.{key_col}, s.n, s.m, s.mad
"""


_EPOCH = "2024-01-01 00:00:00"


def groupwise_ols(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Per-key linear trend of value over time: (key, n, slope_per_day,
    intercept) from the closed-form normal equations on exact sums."""
    x = (
        F.col(ts_col).cast("long")
        - F.to_timestamp(F.lit(_EPOCH)).cast("long")
    )
    y = dec(F.col(value_col))
    agg = events.groupBy(key_col).agg(
        F.count("*").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.sum(x * x).alias("sxx"),
    )
    n = F.col("n").cast("double")
    denom = n * F.col("sxx").cast("double") - F.col("sx").cast("double") * F.col("sx").cast("double")
    slope = (n * F.col("sxy") - F.col("sx").cast("double") * F.col("sy")) / denom
    intercept = (F.col("sy") - slope * F.col("sx").cast("double")) / n
    return agg.select(
        key_col,
        F.col("n").cast("bigint").alias("n"),
        F.round(slope * 86400.0, 6).alias("slope_per_day"),
        F.round(intercept, 6).alias("intercept"),
    )


def sql_groupwise_ols(
    table: str, key_col: str, ts_col: str, value_col: str
) -> str:
    # date_diff keeps x an exact BIGINT (DuckDB's epoch() returns DOUBLE,
    # which would push Σxy into FP accumulation and flip the 6-dp round)
    x = f"date_diff('second', TIMESTAMP '{_EPOCH}', {ts_col})"
    y = sql_dec(value_col)
    return f"""
WITH agg AS (
  SELECT {key_col}, COUNT(*) AS n,
         SUM({x}) AS sx,
         CAST(SUM({y}) AS DOUBLE) AS sy,
         CAST(SUM({x} * {y}) AS DOUBLE) AS sxy,
         SUM({x} * {x}) AS sxx
  FROM {table} GROUP BY {key_col}
)
SELECT {key_col}, CAST(n AS BIGINT) AS n,
       ROUND((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) * 86400.0, 6)
         AS slope_per_day,
       ROUND((sy - (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy)
                   / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE), 6)
         AS intercept
FROM agg
"""


def winsorize_report(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
) -> DataFrame:
    """Per-group winsorization (quantile clipping) report — the outlier
    treatment a feature/reward column gets before training: values below
    the group's ``lower`` quantile or above its ``upper`` quantile are
    clamped to the bound.

    Output per group: ``n, n_clip_lo int, n_clip_hi int, lo, hi,
    mean_before, mean_after``. The quantile bounds are EXACT interpolated
    percentiles (the q49 path) rounded to 6 dp BEFORE clipping on both
    engines — Spark and DuckDB interpolate with differently-ordered FP
    ops, so the unrounded bounds can differ in the last ulps and a value
    sitting in that sliver would flip its clip decision between engines.
    Means go through the exact-decimal path (functions/numeric).

    Scale shape: two shuffles on the group key (bounds agg, then the
    report agg), bounds broadcast back — the stream never shuffles on
    anything unbounded. Exact percentile buffers each group's values in
    one buffer; at 100 TB swap ``percentile`` for ``approx_percentile``
    exactly as grouped_percentiles documents (flag, not rewrite).
    """
    bounds = df.groupBy(group_col).agg(
        F.round(F.expr(f"percentile({value_col}, {lower})"), 6).alias("__lo"),
        F.round(F.expr(f"percentile({value_col}, {upper})"), 6).alias("__hi"),
    )
    from franzoxide_spark.functions.numeric import davg

    v = F.col(value_col)
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return (
        df.join(F.broadcast(bounds), group_col)
        .groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(v < F.col("__lo"), 1).otherwise(0))
            .cast("int")
            .alias("n_clip_lo"),
            F.sum(F.when(v > F.col("__hi"), 1).otherwise(0))
            .cast("int")
            .alias("n_clip_hi"),
            F.round(F.min("__lo"), 6).alias("lo"),
            F.round(F.max("__hi"), 6).alias("hi"),
            davg(dec(v), "mean_before"),
            davg(dec(clipped), "mean_after"),
        )
    )


def sql_winsorize_report(
    table: str,
    value_col: str,
    group_col: str,
    lower: float = 0.01,
    upper: float = 0.99,
) -> str:
    """DuckDB mirror — same rounded bounds, same exact-decimal means."""
    from franzoxide_spark.functions.numeric import sql_davg

    clip = f"LEAST(GREATEST({value_col}, lo), hi)"
    return f"""
WITH b AS (
  SELECT {group_col} AS g,
         ROUND(quantile_cont({value_col}, {lower}), 6) AS lo,
         ROUND(quantile_cont({value_col}, {upper}), 6) AS hi
  FROM {table} GROUP BY 1
)
SELECT t.{group_col}, COUNT(*) AS n,
       CAST(SUM(CASE WHEN {value_col} < lo THEN 1 ELSE 0 END) AS INT)
         AS n_clip_lo,
       CAST(SUM(CASE WHEN {value_col} > hi THEN 1 ELSE 0 END) AS INT)
         AS n_clip_hi,
       ROUND(MIN(lo), 6) AS lo, ROUND(MAX(hi), 6) AS hi,
       {sql_davg(sql_dec(value_col), "mean_before")},
       {sql_davg(sql_dec(clip), "mean_after")}
FROM {table} t JOIN b ON t.{group_col} = b.g
GROUP BY t.{group_col}
"""


# --------------------------------------------------------------------------
# deterministic experiment assignment + sample-ratio-mismatch (SRM) check
# --------------------------------------------------------------------------


def ab_srm_check(
    events: DataFrame,
    unit_col: str,
    group_col: str,
    salt: str = "exp1",
    treat_pct: int = 50,
) -> DataFrame:
    """Hash-based A/B assignment audit: units are assigned to treatment
    iff ``hash60(salt || ':' || unit) % 100 < treat_pct`` (deterministic,
    engine-independent, no RNG state), then per group the observed
    treat/control UNIT counts are chi-square-tested against the design
    ratio — the sample-ratio-mismatch alarm that catches a broken
    randomizer or a biased logging path before anyone reads the metric
    (Fabijan et al. 2019's first diagnostic). alarm at chi2 > 3.841
    (df=1, p=0.05).

    Determinism: counts are exact integers (distinct units per arm);
    chi2 is a single closed-form double expression over those integers —
    no FP accumulation anywhere.

    Scale shape: one distinct on (group, unit) — map-side combined — then
    a group-cardinality aggregate; assignment itself is a map-side hash,
    usable standalone for the actual serving path.
    """
    from franzoxide_spark.functions.text import hash60

    arm = (
        F.pmod(
            hash60(F.concat(F.lit(salt), F.lit(":"), F.col(unit_col))), 100
        )
        < treat_pct
    )
    units = (
        events.select(group_col, F.col(unit_col), arm.alias("__t"))
        .distinct()
    )
    agg = units.groupBy(group_col).agg(
        F.sum(F.col("__t").cast("long")).alias("n_treat"),
        F.sum((~F.col("__t")).cast("long")).alias("n_control"),
    )
    n = (F.col("n_treat") + F.col("n_control")).cast("double")
    e_t = n * treat_pct / 100.0
    e_c = n * (100 - treat_pct) / 100.0
    d_t = F.col("n_treat").cast("double") - e_t
    d_c = F.col("n_control").cast("double") - e_c
    # d*d, not pow(d, 2): both engines then use one IEEE multiply and
    # agree bit-for-bit (libm pow() is not guaranteed exact even at 2)
    chi2 = d_t * d_t / e_t + d_c * d_c / e_c
    return agg.select(
        group_col,
        F.col("n_treat").cast("bigint").alias("n_treat"),
        F.col("n_control").cast("bigint").alias("n_control"),
        F.round(chi2, 6).alias("chi2"),
        (chi2 > 3.841).alias("srm_alarm"),
    )


def sql_ab_srm_check(
    table: str,
    unit_col: str,
    group_col: str,
    salt: str = "exp1",
    treat_pct: int = 50,
) -> str:
    """DuckDB mirror of :func:`ab_srm_check` (same md5-prefix hash).
    The salt is quote-escaped ('' doubling) like every inlined literal
    in this repo's oracle SQL."""
    salt_q = salt.replace(chr(39), chr(39) * 2)
    h = (
        f"CAST('0x' || substr(md5('{salt_q}:' || CAST({unit_col} AS VARCHAR)),"
        f" 1, 15) AS BIGINT)"
    )
    return f"""
WITH units AS (
  SELECT DISTINCT {group_col}, {unit_col},
         ({h} % 100) < {treat_pct} AS t
  FROM {table}
),
agg AS (
  SELECT {group_col},
         SUM(CASE WHEN t THEN 1 ELSE 0 END) AS n_treat,
         SUM(CASE WHEN t THEN 0 ELSE 1 END) AS n_control
  FROM units GROUP BY {group_col}
),
chi AS (
  SELECT {group_col}, n_treat, n_control,
         CAST(n_treat AS DOUBLE)
           - CAST(n_treat + n_control AS DOUBLE) * {treat_pct} / 100.0 AS dt,
         CAST(n_control AS DOUBLE)
           - CAST(n_treat + n_control AS DOUBLE) * {100 - treat_pct} / 100.0 AS dc,
         CAST(n_treat + n_control AS DOUBLE) * {treat_pct} / 100.0 AS et,
         CAST(n_treat + n_control AS DOUBLE) * {100 - treat_pct} / 100.0 AS ec
  FROM agg
)
SELECT {group_col}, CAST(n_treat AS BIGINT) AS n_treat,
       CAST(n_control AS BIGINT) AS n_control,
       ROUND(dt * dt / et + dc * dc / ec, 6) AS chi2,
       (dt * dt / et + dc * dc / ec) > 3.841 AS srm_alarm
FROM chi
"""


# --------------------------------------------------------------------------
# Benford first-digit audit (fraud / synthetic-data diagnostic)
# --------------------------------------------------------------------------


def benford_audit(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per group: the first-significant-digit distribution of
    ``value_col`` against Benford's law (Newcomb 1881, Benford 1938:
    P(d) = log10(1 + 1/d)) with a chi-square statistic — the classic
    fabricated-numbers / synthetic-data detector for naturally
    spread multi-magnitude quantities. Alarm at chi2 > 20.09 (df=8,
    p=0.01; tables spanning few magnitudes trip it benignly — it's a
    triage flag, not a verdict, which is the documented usage).

    First digit via string form of abs(value): digits are exact, counts
    are exact integers, expected probabilities are the same closed-form
    doubles on both engines; chi2 is a deterministic 9-term sum folded
    in digit order.

    Scale shape: one map-side digit derivation + a (group, digit)
    map-side-combined aggregate — count-domain after that.
    """
    # first significant digit via the codebase's standard quantization:
    # n = floor(|x|·10⁶ + 0.5) as BIGINT, whose INTEGER rendering is
    # exact and byte-identical on both engines (double→string printing
    # is NOT, which is why the naive cast can't be used) — the leading
    # char of an integer IS its first significant digit, and scaling by
    # a power of 10 preserves it. r12 rewrite of the previous
    # format_number+regexp derivation: digit-identical on the fixtures
    # (mismatch_rows=0 asserted same-session) and 0.66→0.32 s at sf0.1,
    # 5.33→0.95 s at 30× (string formatting + regex per value was the
    # whole linear constant; see BASELINE.md "q172 digit derivation").
    #
    # MAGNITUDE DOMAIN [1e-6, 9e12), enforced symmetrically on BOTH
    # engines (the two guards below, mirrored in sql_benford_audit):
    # magnitudes in [5e-7, 1e-6) would carry-round to 1 and miscount as
    # digit 1, and |x| ≥ ~9.2e12 overflows the 10⁶-scaled BIGINT — an
    # ANSI abort on Spark vs an erroring CAST in DuckDB, i.e. a crash
    # on legit large inputs (and a silent digit-9 skew with ANSI off,
    # r12 review). Both tails are EXCLUDED rather than crashed on:
    # n_values reflects the drop, so the audit stays honest about what
    # it counted; callers with heavier-tailed data rescale upstream.
    # Same half-up rounding class as the old format_number rendering
    # (a value within 5e-7 of a leading-digit boundary, e.g. 9.9999996,
    # rounds across it; impossible for scale-2 currency, the documented
    # input class).
    from franzoxide_spark.functions.numeric import scaled_int

    d = F.substring(
        scaled_int(F.abs(F.col(value_col)), scale=1_000_000).cast("string"),
        1,
        1,
    )
    cnt = (
        df.filter(
            F.col(value_col).isNotNull()
            & (F.abs(F.col(value_col)) >= 1e-6)
            & (F.abs(F.col(value_col)) < 9e12)
        )
        .withColumn("__d", d.cast("int"))
        .filter(F.col("__d").between(1, 9))
        .groupBy(group_col, "__d")
        .agg(F.count("*").alias("__n"))
    )
    tot = Window.partitionBy(group_col)
    import math

    chi_terms = []
    obs_map = "map_from_entries(collect_list(struct(__d, __n)))"
    for digit in range(1, 10):
        p = math.log10(1 + 1 / digit)
        e = f"(cast(__tot as double) * {p!r})"
        o = f"cast(coalesce(element_at({obs_map}, {digit}), 0L) as double)"
        chi_terms.append(f"(({o} - {e}) * ({o} - {e}) / {e})")
    chi2 = " + ".join(chi_terms)
    agg = (
        cnt.withColumn("__tot", F.sum("__n").over(tot))
        .groupBy(group_col, "__tot")
        .agg(F.expr(f"round({chi2}, 6)").alias("chi2"))
    )
    return agg.select(
        group_col,
        F.col("__tot").cast("bigint").alias("n_values"),
        "chi2",
        (F.col("chi2") > 20.09).alias("benford_alarm"),
    )


def sql_benford_audit(table: str, value_col: str, group_col: str) -> str:
    """DuckDB mirror — identical digit derivation and 9-term chi2."""
    import math

    chi_terms = []
    for digit in range(1, 10):
        p = math.log10(1 + 1 / digit)
        e = f"(CAST(tot AS DOUBLE) * {p!r})"
        o = (
            f"CAST(COALESCE(MAX(CASE WHEN d = {digit} THEN n END), 0)"
            f" AS DOUBLE)"
        )
        chi_terms.append(f"(({o} - {e}) * ({o} - {e}) / {e})")
    chi2 = " + ".join(chi_terms)
    from franzoxide_spark.functions.numeric import sql_scaled_int

    scaled = sql_scaled_int(f"ABS({value_col})", scale=1_000_000)
    return f"""
WITH digits AS (
  SELECT {group_col},
         TRY_CAST(substr(CAST({scaled} AS VARCHAR), 1, 1) AS INT) AS d
  FROM {table}
  WHERE {value_col} IS NOT NULL
    AND ABS({value_col}) >= 1e-6 AND ABS({value_col}) < 9e12
),
cnt AS (
  SELECT {group_col}, d, COUNT(*) AS n
  FROM digits WHERE d BETWEEN 1 AND 9
  GROUP BY {group_col}, d
),
tot AS (
  SELECT {group_col}, SUM(n) AS tot FROM cnt GROUP BY {group_col}
)
SELECT c.{group_col},
       CAST(MAX(t.tot) AS BIGINT) AS n_values,
       ROUND({chi2}, 6) AS chi2,
       ROUND({chi2}, 6) > 20.09 AS benford_alarm
FROM cnt c JOIN tot t USING ({group_col})
GROUP BY c.{group_col}, tot
"""


# --------------------------------------------------------------------------
# Gini concentration (inequality of a non-negative quantity per group)
# --------------------------------------------------------------------------


def gini_concentration(
    df: DataFrame,
    value_col: str,
    group_col: str,
) -> DataFrame:
    """Per group: the Gini coefficient of a non-negative quantity via
    the rank formula G = 2·Σ(i·x_(i)) / (n·Σx) - (n+1)/n over the
    ascending-sorted values, plus the top-1% share — the revenue/usage
    concentration diagnostic (0 = perfectly even, →1 = one row holds
    everything) behind skew planning and fairness reports.

    Determinism: values enter as exact scale-4 integers (the dec()
    convention), ranks are integers, and Σ i·x_i accumulates in
    decimal(38,0) — every input to the final double formula is exact,
    so the 6-dp round cannot flap. Rank ties carry equal x and
    contribute identically under any tie order, so no tiebreak is
    needed for cross-engine agreement.

    Scale shape: one per-group sort (the window rank — the honest cost;
    Gini is order-statistics, same family as q49's exact percentiles)
    and one map-side-combined aggregate; nothing crosses groups.
    """
    from franzoxide_spark.functions.numeric import scaled_int

    x = scaled_int(F.abs(F.col(value_col)))
    w = Window.partitionBy(group_col).orderBy(x)
    ranked = df.filter(F.col(value_col).isNotNull()).select(
        group_col,
        x.alias("__x"),
        F.row_number().over(w).alias("__i"),
        F.count(F.lit(1)).over(Window.partitionBy(group_col)).alias("__nn"),
    )
    agg = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("__x").cast("decimal(38,0)")).alias("__sx"),
        F.sum(
            (F.col("__i").cast("decimal(19,0)") * F.col("__x").cast("decimal(19,0)"))
            .cast("decimal(38,0)")
        ).alias("__six"),
        # top 1% share: ranks above the 99th-percentile cutoff
        F.sum(
            F.when(
                F.col("__i") > F.floor(F.col("__nn") * 0.99).cast("long"),
                F.col("__x").cast("decimal(38,0)"),
            ).otherwise(F.lit(0).cast("decimal(38,0)"))
        ).alias("__top"),
    )
    n = F.col("n").cast("double")
    sx = F.col("__sx").cast("double")
    gini = (
        F.lit(2.0) * F.col("__six").cast("double") / (n * sx) - (n + 1.0) / n
    )
    return agg.select(
        group_col,
        F.col("n").cast("bigint").alias("n"),
        F.round(gini, 6).alias("gini"),
        F.round(F.col("__top").cast("double") / sx, 6).alias("top1pct_share"),
    )


def sql_gini_concentration(table: str, value_col: str, group_col: str) -> str:
    """DuckDB mirror — identical exact-integer rank formula."""
    from franzoxide_spark.functions.numeric import sql_scaled_int

    sx = sql_scaled_int(f"ABS({value_col})")
    return f"""
WITH ranked AS (
  SELECT {group_col},
         {sx} AS x,
         ROW_NUMBER() OVER (PARTITION BY {group_col}
                            ORDER BY {sx}) AS i,
         COUNT(*) OVER (PARTITION BY {group_col}) AS nn
  FROM {table} WHERE {value_col} IS NOT NULL
),
agg AS (
  SELECT {group_col}, COUNT(*) AS n,
         SUM(CAST(x AS HUGEINT)) AS sx,
         SUM(CAST(i AS HUGEINT) * x) AS six,
         SUM(CASE WHEN i > CAST(FLOOR(nn * 0.99) AS BIGINT)
                  THEN CAST(x AS HUGEINT) ELSE 0 END) AS top
  FROM ranked GROUP BY {group_col}
)
SELECT {group_col}, CAST(n AS BIGINT) AS n,
       ROUND(2.0 * CAST(six AS DOUBLE)
             / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE))
             - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE), 6) AS gini,
       ROUND(CAST(top AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS top1pct_share
FROM agg
"""
