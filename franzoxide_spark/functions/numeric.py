"""Cross-engine-deterministic numeric aggregation helpers.

Why this module exists: the correctness gate hash-compares our Spark results
against a DuckDB oracle with floats rounded to 6 decimals. A plain
``SUM(double)`` is order-of-accumulation dependent — over ~60k rows of
~1e5-magnitude values the Spark/DuckDB difference can exceed 1e-6, so the
hash would flap. The fix is exact arithmetic: cast operands to decimal,
do +/-/* in decimal (exact in both engines), and cast the final aggregate
back to double. Two engines computing the same exact decimal produce the
same IEEE double bit-for-bit.

Scale/precision choices keep every intermediate inside 38 digits (Spark's
hard decimal cap) so no precision-loss rounding ever kicks in:
operands are DECIMAL(12,4); a product of three operands is DECIMAL(34,12);
SUM widens to 38. At 100 TB the same expressions hold — a DECIMAL(38,12)
sum has 26 integer digits of headroom (1e26), far beyond any real total.

Note on the double->decimal conversion: the engines' native casts differ
at ties — Spark rounds HALF_UP, DuckDB half-even, and dyadic doubles like
1.90625 ARE exact scale-4 ties (any double with a short binary fraction
terminates in ...5 at some decimal place; hypothesis finds these
immediately). So the conversion here never uses a native decimal cast:
``floor(x * 10^4 + 0.5)`` is two IEEE double ops and a floor — bit-
identical in any IEEE-754 engine — and the result (an exact integer
double) is lifted into decimal with an exact scale shift. Semantics:
round-half-toward-+infinity at scale 4, identical across engines for ALL
doubles including adversarial ties (property-tested).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# fixed-point scale: 4 decimal digits
_S = 10_000
# integer part of the scaled operand: covers |x| < 10^8 (prices/totals in
# the fixtures are < 1.1e6)
_SCALED = "decimal(12,0)"
# exact scale-shift constant: DECIMAL(5,4) 0.0001
_SHIFT = "0.0001"


def dec(c: Column | str) -> Column:
    """Deterministic double -> DECIMAL(17,4) conversion (see module doc):
    floor(x*10^4 + 0.5) lifted back by an exact decimal scale shift."""
    col = F.col(c) if isinstance(c, str) else c
    scaled = F.floor(col.cast("double") * _S + 0.5).cast(_SCALED)
    return scaled * F.lit(_SHIFT).cast("decimal(5,4)")


def scaled_int(
    c: Column | str, scale: int = _S, out_type: str = "bigint"
) -> Column:
    """floor(x·scale + 0.5) as an exact integer column — the RAW
    (unshifted) half-up quantization underlying :func:`dec`. The one
    definition shared by the correlation co-moment kernels
    (operators/profile.py) and the Benford digit derivation
    (operators/stats.py), so the rounding contract and its tie
    semantics live in exactly one place per engine (r12 review:
    five copies had accumulated).

    Decimal outputs must still floor in the DOUBLE domain (a native
    double->decimal(38,6) cast rounds HALF_UP at the 6th decimal
    BEFORE the floor, so a shifted double in (k-5e-7, k) would floor
    to k here while the SQL mirror floors the raw double to k-1 —
    the r12 ADVICE boundary class). The split below keeps both
    hazards closed: below 2⁵³ ``floor(double)`` is exact and its
    LONG return cannot saturate (2⁵³ < 2⁶³); at or beyond 2⁵³ every
    double is already an integer, so flooring is the identity — but
    Spark's native double->decimal cast is NOT value-preserving
    there (it renders via the shortest-repr string, 17 significant
    digits, while DuckDB's HUGEINT cast converts the exact binary
    value — 1e30 diverges by ~4e17). So the wide branch rebuilds the
    exact binary value from three base-2³² limbs, every step exact
    in IEEE double arithmetic: power-of-two scales/products shift
    the exponent only, each limb is < 2⁵³ so floor + LONG cast are
    exact, and each remainder's true difference is representable
    (|a| ≥ 2⁵³ ⇒ ulp(a) ≥ 2, so a mod 2⁶⁴ and rem mod 2³² carry ≤ 53
    significant bits), making the IEEE subtraction exact. The limbs
    are recombined in scale-0 decimal arithmetic (exact; the result
    < 2¹²⁶ fits decimal(38,0)); inputs past ~10³⁸ overflow both
    engines and are out of contract."""
    col = F.col(c) if isinstance(c, str) else c
    shifted = col.cast("double") * scale + F.lit(0.5)
    if out_type.strip().lower().startswith("decimal"):
        a = F.abs(shifted)
        l2 = F.floor(a / F.lit(2.0**64)).cast("bigint")
        rem = a - l2.cast("double") * F.lit(2.0**64)
        l1 = F.floor(rem / F.lit(2.0**32)).cast("bigint")
        l0 = (rem - l1.cast("double") * F.lit(2.0**32)).cast("bigint")
        magnitude = (
            l2.cast("decimal(19,0)")
            * F.lit("18446744073709551616").cast("decimal(20,0)")
            + l1.cast("decimal(10,0)")
            * F.lit("4294967296").cast("decimal(10,0)")
            + l0.cast("decimal(10,0)")
        )
        # negation via 0 - x, NOT unary minus: Spark's UnaryMinus on a
        # wide DecimalType is observably inexact (measured here:
        # negate(...75136) -> -...75140 on decimal(38,0), both
        # interpreted and codegen), while decimal subtraction and
        # multiply are exact. Pinned by the ±1e30 pair in
        # tests/test_properties.py.
        exact_wide = F.when(
            shifted < 0, F.lit(0).cast("decimal(38,0)") - magnitude
        ).otherwise(magnitude)
        # non-finite shifted values must stay NULL, matching the
        # pre-limb native-cast behavior: NaN orders ABOVE every double
        # in Spark, so it would otherwise take the wide branch where
        # non-ANSI cast(NaN as bigint) yields 0 for every limb and the
        # result would be a silent Decimal('0') — a non-null that
        # defeats the correlation kernel's null-count overflow guard
        # (operators/profile.py) and diverges from the DuckDB mirror,
        # which raises on CAST(NaN AS HUGEINT). An unmatched WHEN chain
        # returns NULL, so NaN/±Infinity fall through both branches.
        finite = ~(
            F.isnan(shifted) | (F.abs(shifted) == F.lit(float("inf")))
        )
        return F.when(
            a < F.lit(2.0**53), F.floor(shifted).cast(out_type)
        ).when(finite, exact_wide.cast(out_type))
    return F.floor(shifted).cast(out_type)


def sql_scaled_int(c: str, scale: int = _S, out_type: str = "BIGINT") -> str:
    """DuckDB mirror of :func:`scaled_int` — identical expression text
    modulo the engine's cast spelling."""
    return f"CAST(FLOOR(CAST({c} AS DOUBLE) * {scale} + 0.5) AS {out_type})"


def dsum(expr: Column, alias: str) -> Column:
    """Exact decimal SUM, surfaced as double."""
    return F.sum(expr).cast("double").alias(alias)


def davg(expr: Column, alias: str) -> Column:
    """Deterministic average: exact decimal SUM cast to double, then a single
    double division by the count. Both engines evaluate the identical
    expression on identical inputs -> identical doubles."""
    return (F.sum(expr).cast("double") / F.count(expr)).alias(alias)


# ---------------------------------------------------------------------------
# SQL-side mirrors (strings spliced into the DuckDB oracle queries).
# ---------------------------------------------------------------------------


def sql_dec(c: str) -> str:
    return (
        f"(CAST(FLOOR(CAST({c} AS DOUBLE) * {_S} + 0.5) AS {_SCALED.upper()})"
        f" * CAST({_SHIFT} AS DECIMAL(5,4)))"
    )


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT({expr}) AS {alias}"
