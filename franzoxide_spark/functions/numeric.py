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

Note on double->decimal casts: Spark rounds HALF_UP, DuckDB rounds to
nearest. They can only disagree on an exact tie at the target scale, and a
tie at scale 4 requires the double to equal x + 5e-5 exactly — 5e-5 is not
a dyadic rational, so no IEEE double ever hits it. The casts are therefore
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Operand type: 8 integer digits, 4 fractional — covers every fixture column
# (prices < 1.1e5, quantities <= 50, rates <= 1).
DEC = "decimal(12,4)"


def dec(c: Column | str) -> Column:
    """Cast an operand column to the exact decimal operand type."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(DEC)


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
    return f"CAST({c} AS DECIMAL(12,4))"


def sql_dsum(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def sql_davg(expr: str, alias: str) -> str:
    return f"CAST(SUM({expr}) AS DOUBLE) / COUNT({expr}) AS {alias}"
