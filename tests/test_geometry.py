"""Geometry kernels: WKB codec, WKT model, numpy ops (linemerge, PIP,
Hilbert), replacing the reference's DuckDB-spatial scalar functions."""

from __future__ import annotations

import numpy as np
import pytest

from quackosm_spark.geometry import model, wkb
from quackosm_spark.geometry.ops import (
    distinct_point_count,
    hilbert_index,
    is_closed,
    linemerge,
    points_in_polygon,
    points_in_ring,
    remove_repeated_points,
    ring_within_ring,
    signed_area,
)

SQ = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]


# ---------------------------------------------------------------- wkb / wkt

@pytest.mark.parametrize(
    "geom",
    [
        {"type": "Point", "coordinates": [7.4186855, 43.7321515]},
        {"type": "LineString", "coordinates": [[0.0, 0.0], [1.0, 2.0]]},
        {"type": "Polygon", "coordinates": [SQ]},
        {"type": "Polygon", "coordinates": [SQ, [[0.2, 0.2], [0.8, 0.2], [0.8, 0.8], [0.2, 0.2]]]},
        {"type": "MultiPolygon", "coordinates": [[SQ], [[[2.0, 2.0], [3.0, 2.0], [3.0, 3.0], [2.0, 2.0]]]]},
    ],
)
def test_wkb_roundtrip(geom):
    assert wkb.loads(wkb.dumps(geom)) == geom


def test_wkt_roundtrip():
    geom = {"type": "Polygon", "coordinates": [SQ]}
    assert model.from_wkt(model.to_wkt(geom)) == geom
    pt = {"type": "Point", "coordinates": [7.4186855, 43.7321515]}
    assert model.to_wkt(pt) == "POINT (7.4186855 43.7321515)"


def test_bounds():
    assert model.bounds({"type": "LineString", "coordinates": [[1.0, 5.0], [3.0, 2.0]]}) == (
        1.0, 2.0, 3.0, 5.0,
    )


# ---------------------------------------------------------------- ring preds

def test_is_closed_and_dedup():
    assert is_closed(SQ)
    assert not is_closed(SQ[:-1])
    assert remove_repeated_points([[0, 0], [0, 0], [1, 1], [1, 1], [2, 2]]) == [
        [0, 0], [1, 1], [2, 2],
    ]
    assert distinct_point_count(SQ) == 5


def test_signed_area_orientation():
    assert signed_area(SQ) > 0          # CCW
    assert signed_area(SQ[::-1]) < 0    # CW


# ---------------------------------------------------------------- linemerge

def test_linemerge_two_halves_into_ring():
    a = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0]]
    b = [[1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]
    merged = linemerge([a, b])
    assert len(merged) == 1
    assert is_closed(merged[0])
    assert len(merged[0]) == 5


def test_linemerge_respects_reversal():
    a = [[0.0, 0.0], [1.0, 0.0]]
    b = [[2.0, 0.0], [1.0, 0.0]]  # needs flipping to attach
    merged = linemerge([a, b])
    assert merged == [[[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]]


def test_linemerge_stops_at_junction():
    # three segments meeting at (1,1): degree-3 junction must not merge through
    a = [[0.0, 0.0], [1.0, 1.0]]
    b = [[1.0, 1.0], [2.0, 0.0]]
    c = [[1.0, 1.0], [1.0, 2.0]]
    merged = linemerge([a, b, c])
    assert len(merged) == 3


# ---------------------------------------------------------------- PIP

def test_points_in_ring_basic():
    ring = np.asarray(SQ)
    xs = np.array([0.5, 1.5, 0.0])
    ys = np.array([0.5, 0.5, 0.0])
    got = points_in_ring(xs, ys, ring)
    assert got.tolist() == [True, False, True]  # vertex counts as inside


def test_points_in_polygon_with_hole():
    hole = [[0.25, 0.25], [0.75, 0.25], [0.75, 0.75], [0.25, 0.75], [0.25, 0.25]]
    xs = np.array([0.5, 0.1])
    ys = np.array([0.5, 0.1])
    got = points_in_polygon(xs, ys, [SQ, hole])
    assert got.tolist() == [False, True]


def test_ring_within_ring():
    inner = [[0.2, 0.2], [0.4, 0.2], [0.4, 0.4], [0.2, 0.4], [0.2, 0.2]]
    assert ring_within_ring(inner, SQ)
    outer_elsewhere = [[5.0, 5.0], [6.0, 5.0], [6.0, 6.0], [5.0, 5.0]]
    assert not ring_within_ring(outer_elsewhere, SQ)


# ---------------------------------------------------------------- hilbert

def test_hilbert_locality_and_determinism():
    extent = (0.0, 0.0, 1.0, 1.0)
    xs = np.array([0.1, 0.1001, 0.9])
    ys = np.array([0.1, 0.1001, 0.9])
    d = hilbert_index(xs, ys, extent)
    assert d.dtype == np.int64
    # identical input → identical keys; near points → near keys
    d2 = hilbert_index(xs, ys, extent)
    assert (d == d2).all()
    assert abs(d[0] - d[1]) < abs(d[0] - d[2])
    # full-extent corners map to curve start
    d0 = hilbert_index(np.array([0.0]), np.array([0.0]), extent)
    assert d0[0] == 0


def _py_geohash(lat, lon, precision):
    # straight bisection reference (textbook algorithm)
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_r, lon_r = [-90.0, 90.0], [-180.0, 180.0]
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_r[0] + lon_r[1]) / 2
            if lon >= mid:
                ch = ch * 2 + 1
                lon_r[0] = mid
            else:
                ch = ch * 2
                lon_r[1] = mid
        else:
            mid = (lat_r[0] + lat_r[1]) / 2
            if lat >= mid:
                ch = ch * 2 + 1
                lat_r[0] = mid
            else:
                ch = ch * 2
                lat_r[1] = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_encode_matches_bisection_reference(spark):
    import random

    from pyspark.sql import functions as F

    from quackosm_spark.geometry.geohash import geohash_encode

    rng = random.Random(42)
    pts = [(rng.uniform(-90, 90), rng.uniform(-180, 180)) for _ in range(200)]
    pts += [(57.64911, 10.40744), (0.0, 0.0), (-89.999, 179.999)]
    df = spark.createDataFrame(pts, "lat: double, lon: double")
    got = {
        (r.lat, r.lon): r.gh
        for r in df.select(
            "lat", "lon", geohash_encode(F.col("lat"), F.col("lon"), 9).alias("gh")
        ).collect()
    }
    for lat, lon in pts:
        assert got[(lat, lon)] == _py_geohash(lat, lon, 9), (lat, lon)
    # canonical test vector (wikipedia): u4pruydqqvj
    df2 = spark.createDataFrame([(57.64911, 10.40744)], "lat: double, lon: double")
    gh11 = df2.select(geohash_encode(F.col("lat"), F.col("lon"), 11).alias("g")).collect()[0].g
    assert gh11 == "u4pruydqqvj"


def test_near_pairs_matches_bruteforce_across_cell_boundaries(spark):
    import random

    from quackosm_spark.geometry.proximity import near_pairs

    rng = random.Random(9)
    pts = [(i, rng.uniform(-2, 2), rng.uniform(-2, 2)) for i in range(120)]
    # adversarial: straddle a cell boundary exactly
    pts += [(200, 0.999, 0.0), (201, 1.001, 0.0), (202, -0.001, -0.001)]
    df = spark.createDataFrame(pts, "id: long, lat: double, lon: double")
    r = 0.3
    got = {(p.id_a, p.id_b) for p in near_pairs(df, radius=r).collect()}
    want = set()
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            a, b = pts[i], pts[j]
            if (a[1] - b[1]) ** 2 + (a[2] - b[2]) ** 2 <= r * r:
                want.add(tuple(sorted((a[0], b[0]))))
    assert got == want and want  # complete + non-empty
