"""Content-addressed caching (§1.5): geometry-hash normalization invariance
(reference tests/base/test_pbf_file_reader.py:189-240) and result naming."""

from __future__ import annotations

from quackosm_spark.cache import (
    filter_hash,
    geometry_hash,
    oriented_geometry,
    result_file_path,
)

SQ_CCW = [[0.0, 0.0], [1.0, 0.0], [1.0, 1.0], [0.0, 1.0], [0.0, 0.0]]


def _poly(ring):
    return {"type": "Polygon", "coordinates": [ring]}


def test_geometry_hash_orientation_invariance():
    ccw = _poly(SQ_CCW)
    cw = _poly(SQ_CCW[::-1])
    assert geometry_hash(ccw) == geometry_hash(cw)


def test_geometry_hash_rotation_invariance():
    rotated = SQ_CCW[2:-1] + SQ_CCW[:2] + [SQ_CCW[2]]
    assert geometry_hash(_poly(SQ_CCW)) == geometry_hash(_poly(rotated))


def test_geometry_hash_distinguishes_shapes():
    other = _poly([[0.0, 0.0], [2.0, 0.0], [2.0, 2.0], [0.0, 0.0]])
    assert geometry_hash(_poly(SQ_CCW)) != geometry_hash(other)
    assert geometry_hash(None) == "noclip"


def test_oriented_geometry_rounds_to_7():
    g = _poly([[0.123456789, 0.0], [1.0, 0.0], [1.0, 1.0], [0.123456789, 0.0]])
    oriented = oriented_geometry(g)
    xs = [p[0] for p in oriented["coordinates"][0]]
    assert 0.1234568 in xs


def test_filter_hash_modes():
    assert filter_hash(None, None, True, False) == "nofilter"
    a = filter_hash({"building": True}, None, True, False)
    b = filter_hash({"building": True}, None, True, True)
    assert a != b and b.endswith("_alltags")


def test_result_file_path_shape(tmp_path):
    p = result_file_path(
        "/data/monaco.osm.pbf", tmp_path,
        tags_filter={"building": True}, explode_tags=True, sort_result=True,
    )
    name = p.name
    assert name.startswith("monaco_")
    assert "_exploded" in name and name.endswith("_sorted.parquet")
    q = result_file_path("/data/monaco.osm.pbf", tmp_path)
    assert "nofilter_noclip_compact_sorted" in q.name


def test_multipart_geometry_hash_permutation_invariance():
    # reference test_pbf_file_reader.py:222-240: a GeometryCollection hashes
    # identically no matter the order of its parts (incl. non-polygon parts)
    from itertools import permutations

    def _box(minx, miny, maxx, maxy):
        return {
            "type": "Polygon",
            "coordinates": [[
                [minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy],
                [minx, miny],
            ]],
        }

    parts = [
        _box(7.416, 43.731, 7.421, 43.733),
        _box(0, 0, 1, 1),
        _box(2, 2, 3, 3),
        {"type": "Point", "coordinates": [5.0, 5.0]},
    ]
    hashes = {
        geometry_hash({"type": "GeometryCollection", "geometries": list(combo)})
        for combo in permutations(parts, 4)
    }
    assert len(hashes) == 1
