"""Property-based tests (hypothesis) for the pure-Python kernels — fast,
Spark-free invariants that the example-based suites can't sweep."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from quackosm_spark.cache import geometry_hash, orient_ring
from quackosm_spark.geometry import model, wkb
from quackosm_spark.geometry.ops import (
    ensure_orientation,
    linemerge,
    orient_polygon_rings,
    points_in_ring,
    signed_area,
)

coord = st.floats(
    min_value=-180, max_value=180, allow_nan=False, allow_infinity=False, width=32
)
point = st.tuples(coord, coord).map(list)


def _ring(points):
    """Close a ring from ≥3 distinct points."""
    pts = [list(p) for p in points]
    return pts + [pts[0]]


rings = st.lists(point, min_size=3, max_size=12, unique_by=lambda p: tuple(p)).map(_ring)
linestrings = st.lists(point, min_size=2, max_size=10)


# ---------------------------------------------------------------- wkb / wkt

@given(st.lists(point, min_size=1, max_size=20))
@settings(max_examples=200, deadline=None)
def test_wkb_roundtrip_linestring(points):
    geom = {"type": "LineString", "coordinates": [[float(x), float(y)] for x, y in points]}
    assert wkb.loads(wkb.dumps(geom)) == geom


@given(rings)
@settings(max_examples=200, deadline=None)
def test_wkb_roundtrip_polygon(ring):
    geom = {"type": "Polygon", "coordinates": [ring]}
    assert wkb.loads(wkb.dumps(geom)) == geom


@given(point)
@settings(max_examples=200, deadline=None)
def test_wkt_roundtrip_point(p):
    geom = {"type": "Point", "coordinates": [float(p[0]), float(p[1])]}
    assert model.from_wkt(model.to_wkt(geom)) == geom


# ---------------------------------------------------------------- orientation

@given(rings)
@settings(max_examples=200, deadline=None)
def test_ensure_orientation_idempotent_and_sign(ring):
    ccw = ensure_orientation(ring, ccw=True)
    assert ensure_orientation(ccw, ccw=True) == ccw
    area = signed_area(ccw)
    if abs(area) > 1e-12:  # degenerate rings have no orientation
        assert area > 0
        cw = ensure_orientation(ring, ccw=False)
        assert signed_area(cw) < 0


@given(rings)
@settings(max_examples=100, deadline=None)
def test_orient_polygon_preserves_point_set(ring):
    oriented = orient_polygon_rings([ring])[0]
    assert sorted(map(tuple, oriented)) == sorted(map(tuple, ring))


@given(rings)
@settings(max_examples=100, deadline=None)
def test_geometry_hash_reversal_invariance(ring):
    if abs(signed_area(ring)) < 1e-9:
        return  # orientation undefined for degenerate rings
    a = geometry_hash({"type": "Polygon", "coordinates": [ring]})
    b = geometry_hash({"type": "Polygon", "coordinates": [ring[::-1]]})
    assert a == b


@given(rings, st.integers(min_value=0, max_value=10))
@settings(max_examples=100, deadline=None)
def test_geometry_hash_rotation_invariance(ring, k):
    if abs(signed_area(ring)) < 1e-9:
        return
    open_ring = ring[:-1]
    k = k % len(open_ring)
    rotated = open_ring[k:] + open_ring[:k]
    a = geometry_hash({"type": "Polygon", "coordinates": [ring]})
    b = geometry_hash({"type": "Polygon", "coordinates": [rotated + [rotated[0]]]})
    assert a == b


@given(rings)
@settings(max_examples=100, deadline=None)
def test_orient_ring_output_closed(ring):
    out = orient_ring(ring)
    assert out[0] == out[-1]


# ---------------------------------------------------------------- linemerge

@given(st.lists(linestrings, min_size=0, max_size=6))
@settings(max_examples=200, deadline=None)
def test_linemerge_conserves_segments(lines):
    """Every input edge appears exactly once in the merged output."""
    def edges(ls):
        return [
            frozenset((tuple(a), tuple(b))) if tuple(a) != tuple(b) else None
            for a, b in zip(ls, ls[1:])
        ]

    in_edges = sorted(
        (e for ls in lines if len(ls) >= 2 for e in edges(ls) if e is not None),
        key=hash,
    )
    merged = linemerge(lines)
    out_edges = sorted(
        (e for ls in merged for e in edges(ls) if e is not None), key=hash
    )
    assert len(in_edges) == len(out_edges)


# ---------------------------------------------------------------- PIP

@given(st.floats(-10, 10), st.floats(-10, 10))
@settings(max_examples=200, deadline=None)
def test_pip_unit_square(x, y):
    ring = np.array([[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]])
    got = points_in_ring(np.array([x]), np.array([y]), ring)[0]
    strictly_in = 0 < x < 1 and 0 < y < 1
    strictly_out = x < 0 or x > 1 or y < 0 or y > 1
    if strictly_in:
        assert got
    elif strictly_out:
        assert not got
    # boundary: either answer acceptable (reference tolerance semantics)


# ------------------------------------------------ packed-varint decode paths

int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)


@given(st.lists(int64s, max_size=300))
@settings(max_examples=200, deadline=None)
def test_packed_varint_roundtrip_both_paths(values):
    """Encoder→decoder roundtrip must hold on BOTH sides of the 300-byte
    vectorized/loop threshold (lists up to 300 int64s span it)."""
    from quackosm_spark.sources.pbf_decode import _decode_packed_varints, _packed_list
    from quackosm_spark.sources.pbf_encode import _varint

    buf = memoryview(b"".join(_varint(v) for v in values))
    expected = [v & 0xFFFFFFFFFFFFFFFF for v in values]
    expected_signed = [e - 2**64 if e >= 2**63 else e for e in expected]
    assert _decode_packed_varints(buf).tolist() == expected_signed
    assert _packed_list(buf) == expected_signed
    # a long all-negative list forces the ≥300-byte vectorized branch of
    # _packed_list too (10 bytes per negative varint)
    long_vals = (values or [-1]) * 40
    long_buf = memoryview(b"".join(_varint(v) for v in long_vals))
    le = [v & 0xFFFFFFFFFFFFFFFF for v in long_vals]
    assert _packed_list(long_buf) == [e - 2**64 if e >= 2**63 else e for e in le]


@given(st.lists(st.integers(min_value=-(2**40), max_value=2**40), max_size=300))
@settings(max_examples=200, deadline=None)
def test_packed_delta_roundtrip(values):
    """Delta-zigzag encode → fused decode returns the original absolutes."""
    from quackosm_spark.sources.pbf_decode import _packed_delta_list
    from quackosm_spark.sources.pbf_encode import _varint, _zigzag

    deltas, prev = [], 0
    for v in values:
        deltas.append(_zigzag(v - prev))
        prev = v
    buf = memoryview(b"".join(_varint(d) for d in deltas))
    assert _packed_delta_list(buf) == values
