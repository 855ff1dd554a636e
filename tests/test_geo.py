"""Geohash encoding (operators/geo.py): canonical public-spec vectors +
cross-engine parity + prefix-coarsening property."""

from __future__ import annotations

import duckdb
import pytest

from franzoxide_spark.operators.geo import sql_geohash, with_geohash

# canonical vectors from the public geohash spec / reference implementations
VECTORS = [
    (57.64911, 10.40744, 11, "u4pruydqqvj"),
    (42.6, -5.6, 5, "ezs42"),
    (39.92324, 116.3906, 9, "wx4g0ec19"),
    (0.0, 0.0, 8, "s0000000"),
    (-90.0, -180.0, 6, "000000"),
    (90.0, 180.0, 6, "zzzzzz"),  # the +edge folds into the last cell
]


def test_geohash_matches_public_spec_vectors(spark):
    df = spark.createDataFrame(
        [(i, lat, lon, p, want) for i, (lat, lon, p, want) in enumerate(VECTORS)],
        "i int, lat double, lon double, p int, want string",
    )
    for p in sorted({v[2] for v in VECTORS}):
        sub = df.filter(df.p == p)
        got = {
            r["i"]: r["geohash"]
            for r in with_geohash(sub, "lat", "lon", p).collect()
        }
        for r in sub.collect():
            assert got[r["i"]] == r["want"], (r["lat"], r["lon"], p)


def test_geohash_cross_engine_parity(spark):
    rows = [
        (i, ((i * 37) % 17000) / 100.0 - 85.0, ((i * 91) % 36000) / 100.0 - 180.0)
        for i in range(500)
    ]
    df = spark.createDataFrame(rows, "i int, lat double, lon double")
    got = sorted(
        (r["i"], r["geohash"])
        for r in with_geohash(df, "lat", "lon", 7).collect()
    )
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INT, lat DOUBLE, lon DOUBLE)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?)", rows)
    exp = sorted(
        con.execute(
            f"SELECT i, {sql_geohash('lat', 'lon', 7)} AS g FROM t"
        ).fetchall()
    )
    con.close()
    assert got == exp


def test_geohash_prefix_coarsens(spark):
    """precision-k hash is a PREFIX of the precision-(k+1) hash — the
    property that makes truncation a grid coarsening."""
    rows = [(i, (i % 160) - 80 + 0.25, (i % 350) - 175 + 0.25) for i in range(200)]
    df = spark.createDataFrame(rows, "i int, lat double, lon double")
    fine = with_geohash(df, "lat", "lon", 8, out_col="g8")
    both = with_geohash(fine, "lat", "lon", 5, out_col="g5")
    for r in both.select("g5", "g8").collect():
        assert r["g8"].startswith(r["g5"])


def test_geohash_rejects_bad_precision(spark):
    df = spark.createDataFrame([(1.0, 1.0)], "lat double, lon double")
    with pytest.raises(ValueError, match="precision"):
        with_geohash(df, "lat", "lon", 0)
    with pytest.raises(ValueError, match="precision"):
        with_geohash(df, "lat", "lon", 13)


def test_radius_join_known_distances_and_cell_boundaries(spark):
    """Closed-form memberships: same point (0 km), 0.5 deg latitude apart
    (~55.6 km, in), 1 deg (~111.2 km, out); a pair STRADDLING a grid-cell
    boundary is still found (the 3x3 neighbor fan-out's whole job)."""
    from franzoxide_spark.operators.geo import radius_join

    anchors = spark.createDataFrame(
        [(1, 10.0, 20.0), (2, 0.999, 11.999)],  # anchor 2 near cell corner
        "anchor_id long, lat double, lon double",
    )
    points = spark.createDataFrame(
        [
            (100, 10.0, 20.0),    # 0 km from anchor 1
            (101, 10.5, 20.0),    # ~55.6 km, in
            (102, 11.0, 20.0),    # ~111.2 km, out
            (103, 1.001, 12.001), # other side of BOTH cell lines from a2
        ],
        "point_id long, lat double, lon double",
    )
    got = {
        (r["anchor_id"], r["point_id"]): r["dist_km"]
        for r in radius_join(anchors, points, 100.0).collect()
    }
    assert got[(1, 100)] == 0.0
    assert 55 < got[(1, 101)] < 56
    assert (1, 102) not in got
    assert (2, 103) in got and got[(2, 103)] < 1.0


def test_radius_join_rejects_radius_beyond_grid_guarantee(spark):
    import pytest

    from franzoxide_spark.operators.geo import radius_join

    a = spark.createDataFrame([(1, 0.0, 0.0)], "anchor_id long, lat double, lon double")
    with pytest.raises(ValueError, match="100 km"):
        radius_join(a, a.withColumnRenamed("anchor_id", "point_id"), 250.0)


def test_radius_join_wraps_at_antimeridian(spark):
    """A pair straddling lon ±180 is found (the lon cell ring wraps);
    polar-cap rows (|lat| > 85) are excluded on both sides rather than
    silently losing pairs (r8 review)."""
    from franzoxide_spark.operators.geo import radius_join

    anchors = spark.createDataFrame(
        [(1, -80.0, -179.5), (9, 86.0, 0.0)],
        "anchor_id long, lat double, lon double",
    )
    points = spark.createDataFrame(
        [(100, -80.05, 179.9), (101, 86.0, 0.0)],
        "point_id long, lat double, lon double",
    )
    got = {(r["anchor_id"], r["point_id"]) for r in
           radius_join(anchors, points, 100.0).collect()}
    assert (1, 100) in got      # crosses the antimeridian, ~12 km apart
    assert (9, 101) not in got  # polar cap excluded entirely
