"""Geocoding parse logic with an injected fetcher (network-free)."""

from __future__ import annotations

import pytest

from quackosm_spark.geocode import geocode_to_geometry

POLY = {"type": "Polygon", "coordinates": [[[0, 0], [1, 0], [1, 1], [0, 0]]]}


def test_prefers_polygon_geojson():
    results = [
        {"geojson": {"type": "Point", "coordinates": [1, 2]}, "boundingbox": ["1", "2", "3", "4"]},
        {"geojson": POLY},
    ]
    assert geocode_to_geometry("x", fetch=lambda q: results) == POLY


def test_bbox_fallback():
    results = [{"boundingbox": ["43.72", "43.76", "7.40", "7.44"]}]
    got = geocode_to_geometry("monaco", fetch=lambda q: results)
    assert got["type"] == "Polygon"
    xs = [p[0] for p in got["coordinates"][0]]
    ys = [p[1] for p in got["coordinates"][0]]
    assert min(xs) == 7.40 and max(xs) == 7.44
    assert min(ys) == 43.72 and max(ys) == 43.76


def test_zero_results():
    with pytest.raises(ValueError, match="Zero results"):
        geocode_to_geometry("nowhere", fetch=lambda q: [])


def test_no_usable_geometry():
    with pytest.raises(ValueError, match="no usable geometry"):
        geocode_to_geometry("x", fetch=lambda q: [{"display_name": "y"}])
