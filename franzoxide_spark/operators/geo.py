"""Geospatial binning: geohash encoding as pure cross-engine integer math.

Geohash (public spec, Niemeyer 2008) is the geospatial sibling of the
q123 z-order curve: quantize lat/lon, interleave bits MSB-first starting
with longitude, emit 5-bit groups as base32 characters. Cells are the
standard spatial GROUP BY key (density maps, spatial joins by cell,
neighbor expansion), and prefix truncation coarsens the grid — the same
locality property the z-curve gives parquet min/max stats.

Everything is integer shift/mask arithmetic over a single quantization,
generated once in Python and emitted for BOTH engines, so the encoding
is oracle-checkable; correctness vs the PUBLIC spec is pinned by the
canonical test vectors (57.64911,10.40744 -> u4pruydqqvj) in
tests/test_geo.py. Map-side only; no shuffle, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

GEOHASH_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def _bit_plan(precision: int) -> tuple[int, int, list[tuple[str, int]]]:
    """Shared interleave plan: total bits, per-axis widths, and the
    MSB-first (axis, bit-position) sequence (lon first)."""
    if not 1 <= precision <= 12:
        raise ValueError(f"precision must be in [1, 12], got {precision}")
    n = 5 * precision
    lon_n = (n + 1) // 2
    lat_n = n // 2
    seq = []
    for i in range(n):
        if i % 2 == 0:
            seq.append(("lon", lon_n - 1 - i // 2))
        else:
            seq.append(("lat", lat_n - 1 - i // 2))
    return n, lon_n, seq


def _quant(axis: str, col: str, bits: int, spark: bool) -> str:
    lo, span = (-90, 180) if axis == "lat" else (-180, 360)
    scale = 1 << bits
    top = scale - 1
    raw = (
        f"CAST(FLOOR((({col}) - ({lo})) / {span} * {scale}.0) AS BIGINT)"
    )
    return f"LEAST({raw}, {top})"  # the +90/+180 edge folds into the last cell


def _bits_sql(lat_col: str, lon_col: str, precision: int, spark: bool) -> str:
    n, lon_n, seq = _bit_plan(precision)
    lat_n = n // 2
    latq = _quant("lat", lat_col, lat_n, spark)
    lonq = _quant("lon", lon_col, lon_n, spark)
    shift = (lambda src, k: f"shiftright({src}, {k})") if spark else (
        lambda src, k: f"(({src}) >> {k})"
    )
    terms = []
    for i, (axis, pos) in enumerate(seq):
        src = lonq if axis == "lon" else latq
        weight = 1 << (n - 1 - i)
        terms.append(f"(({shift(src, pos)} & 1) * {weight})")
    return "(" + " + ".join(terms) + ")"


def _chars_sql(bits_ref: str, precision: int, spark: bool) -> str:
    shift = (lambda src, k: f"shiftright({src}, {k})") if spark else (
        lambda src, k: f"(({src}) >> {k})"
    )
    parts = []
    for c in range(precision):
        idx = f"CAST(({shift(bits_ref, 5 * (precision - 1 - c))} & 31) AS INT)"
        parts.append(f"substr('{GEOHASH_BASE32}', {idx} + 1, 1)")
    return "CONCAT(" + ", ".join(parts) + ")"


def with_geohash(
    df: DataFrame,
    lat_col: str,
    lon_col: str,
    precision: int = 6,
    out_col: str = "geohash",
) -> DataFrame:
    """Add ``out_col`` with the geohash of (lat_col, lon_col)."""
    bits = F.expr(_bits_sql(lat_col, lon_col, precision, spark=True))
    out = (
        df.withColumn("__gh_bits", bits)
        .withColumn(
            out_col, F.expr(_chars_sql("__gh_bits", precision, spark=True))
        )
        .drop("__gh_bits")
    )
    return out


def sql_geohash(lat_col: str, lon_col: str, precision: int = 6) -> str:
    """DuckDB mirror as a single expression (inline the bits via a
    per-row lateral is unnecessary: engines fold the common quantization
    subexpressions)."""
    bits = _bits_sql(lat_col, lon_col, precision, spark=False)
    return _chars_sql(bits, precision, spark=False)
