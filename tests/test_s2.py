"""Pure-Python S2 cell model invariants + CLI S2 geometry-filter parsing.

No s2 library exists in this container to compare against, so the suite
pins (a) the structural constants every S2 implementation shares (face
cell tokens, id layout, level encoding), and (b) geometric invariants
(round-trips within cell size, Hilbert locality, parent/child algebra,
center-inside-corners)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from quackosm_spark.geometry import s2
from quackosm_spark.geometry.ops import points_in_ring

POINTS = [
    (40.744, -74.0324),   # NYC
    (-33.86, 151.2),      # Sydney
    (0.0, 0.0),           # gulf of guinea
    (51.5, -0.12),        # London
    (-89.9, 170.0),       # near south pole
    (89.9, 0.0),          # near north pole
]


def _angdist(a, b) -> float:
    xa = s2._lat_lng_to_xyz(*a)
    xb = s2._lat_lng_to_xyz(*b)
    d = max(-1.0, min(1.0, sum(p * q for p, q in zip(xa, xb))))
    return math.degrees(math.acos(d))


def test_face_cell_tokens():
    # level-0 face cells: id = face<<61 | 1<<60 → canonical tokens 1..b
    for face, tok in enumerate(["1", "3", "5", "7", "9", "b"]):
        cid = (face << 61) | (1 << 60)
        assert s2.cell_id_to_token(cid) == tok
        assert s2.cell_id_level(cid) == 0
        assert s2.cell_id_face(cid) == face
        assert s2.token_to_cell_id(tok) == cid


@pytest.mark.parametrize("lat,lng", POINTS)
@pytest.mark.parametrize("level", [3, 8, 14, 22, 30])
def test_roundtrip_center_within_cell(lat, lng, level):
    cid = s2.lat_lng_to_cell_id(lat, lng, level)
    assert s2.cell_id_level(cid) == level
    tok = s2.cell_id_to_token(cid)
    assert s2.token_to_cell_id(tok) == cid
    tol = 2 * 90.0 / (1 << level) + 1e-9
    assert _angdist(s2.cell_center(cid), (lat, lng)) < tol


def test_parent_child_algebra():
    cid = s2.lat_lng_to_cell_id(40.744, -74.0324, 10)
    kids = s2.cell_children(cid)
    assert len(set(kids)) == 4
    for k in kids:
        assert s2.cell_parent(k) == cid
        assert s2.cell_id_level(k) == 11
    assert s2.cell_parent(cid, 0) == s2.lat_lng_to_cell_id(40.744, -74.0324, 0)


def test_hilbert_locality():
    a = s2.lat_lng_to_cell_id(10.0, 20.0, 30)
    b = s2.lat_lng_to_cell_id(10.0000001, 20.0000001, 30)
    shared = sum(
        1
        for level in range(31)
        if s2.cell_parent(a, level) == s2.cell_parent(b, level)
    )
    assert shared >= 20


def test_center_inside_corner_polygon():
    for lat, lng in POINTS[:4]:
        cid = s2.lat_lng_to_cell_id(lat, lng, 12)
        poly = s2.cell_token_to_polygon(s2.cell_id_to_token(cid))
        ring = np.asarray(poly["coordinates"][0])
        clat, clng = s2.cell_center(cid)
        assert points_in_ring(np.asarray([clng]), np.asarray([clat]), ring)[0]
        # the queried point itself is inside its own cell
        assert points_in_ring(np.asarray([lng]), np.asarray([lat]), ring)[0]


def test_invalid_tokens():
    for bad in ["", "x", "zzz", "0123456789abcdef0"]:
        with pytest.raises(ValueError):
            s2.token_to_cell_id(bad)


def test_cli_s2_filter_parses():
    import argparse

    from quackosm_spark.cli import build_parser, parse_geometry_args

    tok = s2.cell_id_to_token(s2.lat_lng_to_cell_id(43.73, 7.42, 12))
    args = build_parser().parse_args(["x.pbf", "--geom-filter-s2", tok])
    geom = parse_geometry_args(args)
    assert geom["type"] == "Polygon"
    ring = np.asarray(geom["coordinates"][0])
    assert points_in_ring(np.asarray([7.42]), np.asarray([43.73]), ring)[0]

    # two tokens → MultiPolygon
    tok2 = s2.cell_id_to_token(s2.lat_lng_to_cell_id(40.7, -74.0, 12))
    args = build_parser().parse_args(
        ["x.pbf", "--geom-filter-s2", f"{tok},{tok2}"]
    )
    geom = parse_geometry_args(args)
    assert geom["type"] == "MultiPolygon"
    assert len(geom["coordinates"]) == 2

    # invalid token → clean CLI error
    args = build_parser().parse_args(["x.pbf", "--geom-filter-s2", "zzz"])
    with pytest.raises(SystemExit):
        parse_geometry_args(args)
