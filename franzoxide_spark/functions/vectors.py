"""Vector math over ``array<float>`` embedding columns.

Expression-based (JVM, codegen'd — preferred for joins/aggregations that
Catalyst should see through) with float64 accumulation, matching the
DuckDB oracle's ``list_cosine_similarity`` to ~1e-15; results are rounded
to 6 decimals before any ranking/thresholding so both engines make
identical cut decisions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot(a: str, b: str) -> Column:
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> cast(x as double) * cast(y as double)),"
        " cast(0.0 as double), (acc, v) -> acc + v)"
    )


def l2_norm(a: str) -> Column:
    return F.sqrt(
        F.expr(
            f"aggregate(transform({a}, x -> cast(x as double) * cast(x as double)),"
            " cast(0.0 as double), (acc, v) -> acc + v)"
        )
    )


def cosine(a: str, b: str) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def cosine_rounded(a: str, b: str, digits: int = 6) -> Column:
    return F.round(cosine(a, b), digits)


def sql_cosine_rounded(a: str, b: str, digits: int = 6) -> str:
    return (f"ROUND(list_cosine_similarity(CAST({a} AS DOUBLE[]),"
            f" CAST({b} AS DOUBLE[])), {digits})")
