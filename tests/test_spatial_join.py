"""Distributed points-in-polygons spatial join: cell-bucketed candidates
+ exact ray-cast refine (oracle parity is q111)."""

from __future__ import annotations

import pytest

from quackosm_spark.operators.spatial import points_in_polygons_join


def _rect(x1, y1, x2, y2):
    return [
        {"x": float(x), "y": float(y)}
        for x, y in [(x1, y1), (x2, y1), (x2, y2), (x1, y2), (x1, y1)]
    ]


@pytest.fixture()
def pts(spark):
    return spark.createDataFrame(
        [(1, 0.5, 0.5), (2, 5.0, 5.0), (3, 10.3, 10.3), (4, -0.5, 0.5),
         (5, 2.05, 2.05), (6, 170.0, 80.0)],
        "point_id LONG, lon DOUBLE, lat DOUBLE",
    )


def test_containments_exact(spark, pts):
    tri = [{"x": 10.0, "y": 10.0}, {"x": 11.0, "y": 10.0},
           {"x": 10.0, "y": 11.0}, {"x": 10.0, "y": 10.0}]
    polys = spark.createDataFrame(
        [(100, _rect(0, 0, 2.1, 2.1)), (200, _rect(4, 4, 6, 6)),
         (300, tri), (400, _rect(-1, -1, 1, 1))],
        "poly_id LONG, ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
    )
    out = sorted(
        (r.point_id, r.poly_id)
        for r in points_in_polygons_join(pts, polys, zoom=6).collect()
    )
    assert out == [(1, 100), (1, 400), (2, 200), (3, 300), (4, 400),
                   (5, 100)]


def test_zoom_invariance(spark, pts):
    polys = spark.createDataFrame(
        [(1, _rect(-2, -2, 6, 6))],
        "poly_id LONG, ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
    )
    expected = {(1, 1), (2, 1), (4, 1), (5, 1)}
    for zoom in (3, 6, 9):
        got = {
            (r.point_id, r.poly_id)
            for r in points_in_polygons_join(pts, polys, zoom=zoom).collect()
        }
        assert got == expected, zoom


def test_cell_overflow_raises(spark, pts):
    world = spark.createDataFrame(
        [(1, _rect(-179.9, -84.9, 179.9, 84.9))],
        "poly_id LONG, ring ARRAY<STRUCT<x: DOUBLE, y: DOUBLE>>",
    )
    with pytest.raises(ValueError, match="max_cells_per_polygon"):
        points_in_polygons_join(pts, world, zoom=12)
    # same polygon passes at a coarse zoom
    assert points_in_polygons_join(pts, world, zoom=3).count() == 6
