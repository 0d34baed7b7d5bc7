"""Content-addressed result caching (§1.5 of SURVEY).

Result file name =
``{pbf_stem}_{filter_hash|nofilter}_{geometry_hash|noclip}_{exploded|compact}
[_{ids_hash}][_sorted][_wkt].parquet`` — identical inputs short-circuit the
whole conversion (reference pbf_file_reader.py:1294-1458). The geometry hash
is orientation/rotation-normalized so the same polygon expressed CW or CCW,
or rotated to a different start vertex, hashes identically.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path
from typing import Any, Iterable, Optional, Sequence, Union

from quackosm_spark.geometry import model

Geometry = dict[str, Any]


def _ring_signed_area(ring: list[list[float]]) -> float:
    area = 0.0
    for (x1, y1), (x2, y2) in zip(ring, ring[1:] + ring[:1]):
        area += x1 * y2 - x2 * y1
    return area / 2.0


def _ring_centroid(ring: list[list[float]]) -> tuple[float, float]:
    pts = ring[:-1] if ring and ring[0] == ring[-1] else ring
    n = max(len(pts), 1)
    return (sum(p[0] for p in pts) / n, sum(p[1] for p in pts) / n)


def orient_ring(ring: list[list[float]]) -> list[list[float]]:
    """CCW-rewind, rotate to the smallest vertex, round to 7 decimals
    (reference `_get_oriented_geometry_filter`, pbf_file_reader.py:1412-1458)."""
    perimeter = [list(p) for p in ring]
    if perimeter and perimeter[0] == perimeter[-1]:
        closed = perimeter
    else:
        closed = perimeter + [perimeter[0]]
    if _ring_signed_area(closed) < 0:  # CW → reverse
        closed = closed[::-1]
    open_ring = closed[:-1]
    smallest = min(map(tuple, open_ring))
    idx = [tuple(p) for p in open_ring].index(smallest)
    rotated = open_ring[idx:] + open_ring[:idx]
    rounded = [[round(p[0], 7), round(p[1], 7)] for p in rotated]
    return rounded + [rounded[0]]


def oriented_geometry(geom: Optional[Geometry]) -> Optional[Geometry]:
    if geom is None:
        return None
    t = geom["type"]
    if t == "Polygon":
        exterior = orient_ring(geom["coordinates"][0])
        interiors = sorted(
            (orient_ring(r) for r in geom["coordinates"][1:]),
            key=lambda r: _ring_centroid(r),
        )
        return {"type": "Polygon", "coordinates": [exterior, *interiors]}
    if t in ("MultiPolygon", "GeometryCollection"):
        # canonical part order (bounds works for every geometry type, incl.
        # points inside collections) ⇒ the hash is invariant to the order
        # parts were assembled in — the reference asserts this over all
        # permutations (tests/base/test_pbf_file_reader.py:222-240)
        if t == "MultiPolygon":
            parts = [
                oriented_geometry({"type": "Polygon", "coordinates": p})
                for p in geom["coordinates"]
            ]
            parts.sort(key=model.bounds)
            return {"type": t, "coordinates": [g["coordinates"] for g in parts]}
        parts = [oriented_geometry(g) for g in geom["geometries"]]
        parts.sort(key=model.bounds)
        return {"type": t, "geometries": parts}
    return geom


def geometry_hash(geom: Optional[Geometry]) -> str:
    if geom is None:
        return "noclip"
    wkt = model.to_wkt(oriented_geometry(geom))
    return hashlib.sha256(wkt.encode()).hexdigest()[:8]


def filter_hash(
    tags_filter: Optional[Any],
    custom_sql_filter: Optional[str],
    ignore_metadata_tags: bool,
    keep_all_tags: bool,
) -> str:
    if tags_filter is None and not custom_sql_filter and ignore_metadata_tags:
        return "nofilter"
    payload = (
        json.dumps(tags_filter or {})
        + str(custom_sql_filter or "")
        + ("" if ignore_metadata_tags else "_with_metadata")
    )
    suffix = "_alltags" if keep_all_tags else ""
    return hashlib.sha256(payload.encode()).hexdigest()[:8] + suffix


def result_file_path(
    pbf_paths: Union[str, Path, Iterable[Union[str, Path]]],
    working_directory: Union[str, Path],
    *,
    tags_filter: Optional[Any] = None,
    keep_all_tags: bool = False,
    explode_tags: bool = False,
    geometry_filter: Optional[Geometry] = None,
    custom_sql_filter: Optional[str] = None,
    filter_osm_ids: Sequence[str] = (),
    ignore_metadata_tags: bool = True,
    sort_result: bool = True,
    save_as_wkt: bool = False,
    bbox_column: bool = False,
) -> Path:
    if isinstance(pbf_paths, (str, Path)):
        pbf_paths = [pbf_paths]
    stem = "_".join(Path(p).name.removesuffix(".osm.pbf") for p in pbf_paths)
    ids_part = ""
    if filter_osm_ids:
        h = hashlib.sha256(json.dumps(sorted(set(filter_osm_ids))).encode())
        ids_part = f"_{h.hexdigest()[:8]}"
    name = (
        f"{stem}_{filter_hash(tags_filter, custom_sql_filter, ignore_metadata_tags, keep_all_tags)}"
        f"_{geometry_hash(geometry_filter)}"
        f"_{'exploded' if explode_tags else 'compact'}"
        f"{ids_part}{'_sorted' if sort_result else ''}{'_wkt' if save_as_wkt else ''}"
        f"{'_bbox' if bbox_column else ''}.parquet"
    )
    return Path(working_directory) / name
