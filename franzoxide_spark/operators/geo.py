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


# --------------------------------------------------------------------------
# radius join: points within d km of anchors (grid-bucketed, never all-pairs)
# --------------------------------------------------------------------------

_EARTH_R_KM = 6371.0088
# conservative degree-grid for a <=100 km radius: 1 deg latitude is
# ~111.32 km >= 100 everywhere; longitude degrees shrink by cos(lat), so
# with |lat| <= 85 deg one lon cell must cover 100/(111.32*cos(85 deg))
# ~ 10.3 deg -> 12. Conservative cells admit extra candidates (verified
# away by the exact distance), never miss one.
_GRID_LAT_DEG = 1.0
_GRID_LON_DEG = 12.0


def _haversine_sql(lat1: str, lon1: str, lat2: str, lon2: str) -> str:
    """Great-circle distance in km — IDENTICAL text for both engines
    (radians/sin/cos/asin/sqrt exist in each)."""
    return (
        f"2.0 * {_EARTH_R_KM} * asin(sqrt("
        f" pow(sin(radians(({lat2}) - ({lat1})) / 2), 2)"
        f" + cos(radians({lat1})) * cos(radians({lat2}))"
        f" * pow(sin(radians(({lon2}) - ({lon1})) / 2), 2)))"
    )


def radius_join(
    anchors: DataFrame,
    points: DataFrame,
    radius_km: float = 100.0,
) -> DataFrame:
    """All (anchor, point) pairs within ``radius_km`` great-circle km:
    ``(anchor_id, point_id, dist_km)`` — the spatial join behind
    store-catchment and nearest-facility analytics, next to q127's cell
    density. Inputs carry ``(anchor_id|point_id, lat, lon)``.

    Scale shape — bucketed, never all-pairs (the q33 discipline on a
    sphere): both sides land on a conservative lat/lon degree grid whose
    cells are at least ``radius_km`` wide at any latitude in range, the
    ANCHOR side (small by contract) explodes to its 3x3 neighbor cells
    and BROADCASTS, and candidates meet in an equi-join on the cell key
    before the exact haversine verify. A conservative cell admits extra
    candidates but can never miss a pair; distances round to 6 dp before
    the threshold compare so both engines keep the identical pair set.

    Extra columns on ``points`` pass through to the output (so callers
    never rescan the big side to recover payload). Longitude neighbor
    cells WRAP at the antimeridian; rows with |lat| > 85 are excluded on
    both engines (the shipped grid's guarantee does not reach the polar
    caps — excluding beats silently losing pairs). ``radius_km`` must
    fit the grid constants (<= 100 with the shipped 1 deg x 12 deg
    cells); larger radii need proportionally coarser cells.
    """
    if radius_km > 100.0:
        raise ValueError(
            f"radius_km={radius_km} exceeds the 100 km the shipped grid"
            " guarantees; coarsen _GRID_LAT_DEG/_GRID_LON_DEG first"
        )
    # the grid guarantee holds for |lat| <= 85 only (a 12 deg lon cell at
    # lat 86 is ~93 km < radius): polar-cap rows are EXCLUDED on both
    # sides — identically in the SQL mirror — rather than silently
    # losing pairs (review r8)
    anchors = anchors.filter(F.abs(F.col("lat")) <= 85.0)
    points = points.filter(F.abs(F.col("lat")) <= 85.0)
    n_lon_cells = int(360.0 / _GRID_LON_DEG)
    cell_lat = lambda c: F.floor(F.col(c) / _GRID_LAT_DEG).cast("int")  # noqa: E731
    cell_lon = lambda c: F.floor(F.col(c) / _GRID_LON_DEG).cast("int")  # noqa: E731
    a = anchors.select(
        "anchor_id",
        F.col("lat").alias("__alat"),
        F.col("lon").alias("__alon"),
        cell_lat("lat").alias("__cla"),
        cell_lon("lon").alias("__clo"),
    )
    # 3x3 neighbor fan-out on the SMALL side only; lon neighbors WRAP at
    # the antimeridian (pmod over the lon cell ring, review r8: an
    # anchor at lon -175 must reach the cell holding lon +179.9)
    half = n_lon_cells // 2
    a9 = a.select(
        "anchor_id",
        "__alat",
        "__alon",
        F.explode(
            F.expr(
                "flatten(transform(sequence(-1, 1), dy ->"
                " transform(sequence(-1, 1), dx ->"
                " struct(__cla + dy as cla,"
                f" pmod(__clo + dx + {half}, {n_lon_cells}) - {half}"
                " as clo))))"
            )
        ).alias("__c"),
    ).select(
        "anchor_id", "__alat", "__alon",
        F.col("__c.cla").alias("__cla"), F.col("__c.clo").alias("__clo"),
    )
    p = points.select(
        "point_id",
        *[c for c in points.columns if c not in ("point_id", "lat", "lon")],
        F.col("lat").alias("__plat"),
        F.col("lon").alias("__plon"),
        cell_lat("lat").alias("__cla"),
        # the point lon cell lands on the same wrapped ring (lon exactly
        # +180 would otherwise be cell 15 in a -15..14 ring)
        (F.expr(f"pmod(cast(floor(lon / {_GRID_LON_DEG}) as int) + {half},"
                f" {n_lon_cells}) - {half}")).alias("__clo"),
    )
    dist = F.expr(
        "round(" + _haversine_sql("__alat", "__alon", "__plat", "__plon") + ", 6)"
    )
    passthrough = [
        c for c in points.columns if c not in ("point_id", "lat", "lon")
    ]
    return (
        p.join(F.broadcast(a9), ["__cla", "__clo"])
        .withColumn("dist_km", dist)
        .filter(F.col("dist_km") <= radius_km)
        .select("anchor_id", "point_id", *passthrough, "dist_km")
    )


def sql_radius_join(
    anchors_rel: str,
    points_rel: str,
    radius_km: float = 100.0,
    extra_cols: tuple[str, ...] = (),
) -> str:
    """DuckDB mirror — identical grid, neighbor fan-out, and rounded
    haversine threshold."""
    hav = _haversine_sql("a.alat", "a.alon", "p.plat", "p.plon")
    n_lon = int(360.0 / _GRID_LON_DEG)
    half = n_lon // 2
    extra = "".join(f"{c}, " for c in extra_cols)
    return f"""
WITH a AS (
  SELECT anchor_id, lat AS alat, lon AS alon,
         CAST(FLOOR(lat / {_GRID_LAT_DEG}) AS INT) AS cla,
         CAST(FLOOR(lon / {_GRID_LON_DEG}) AS INT) AS clo
  FROM {anchors_rel} WHERE ABS(lat) <= 85.0
),
a9 AS (
  SELECT anchor_id, alat, alon, cla + dy AS cla,
         ((clo + dx + {half}) % {n_lon} + {n_lon}) % {n_lon} - {half} AS clo
  FROM a, (SELECT UNNEST(range(-1, 2)) AS dy) y,
       (SELECT UNNEST(range(-1, 2)) AS dx) x
),
p AS (
  SELECT point_id, {extra}lat AS plat, lon AS plon,
         CAST(FLOOR(lat / {_GRID_LAT_DEG}) AS INT) AS cla,
         ((CAST(FLOOR(lon / {_GRID_LON_DEG}) AS INT) + {half}) % {n_lon}
          + {n_lon}) % {n_lon} - {half} AS clo
  FROM {points_rel} WHERE ABS(lat) <= 85.0
)
SELECT a.anchor_id, p.point_id, {extra}ROUND({hav}, 6) AS dist_km
FROM p JOIN a9 a USING (cla, clo)
WHERE ROUND({hav}, 6) <= {radius_km}
"""
