"""Minimal geometry model: GeoJSON-style dicts + WKT parse/print.

The engine has no shapely dependency; geometries travel as WKB
(``BinaryType``) inside DataFrames and as GeoJSON-style ``{"type",
"coordinates"}`` dicts on the driver. Only the types the reference produces
are supported (SURVEY §1.3): Point, LineString, Polygon, MultiPolygon,
GeometryCollection (plus MultiPoint/MultiLineString for completeness).
"""

from __future__ import annotations

import math
import re
from typing import Any

Geometry = dict[str, Any]

_TYPES = (
    "Point",
    "LineString",
    "Polygon",
    "MultiPoint",
    "MultiLineString",
    "MultiPolygon",
    "GeometryCollection",
)


def bounds(geom: Geometry) -> tuple[float, float, float, float]:
    """(minx, miny, maxx, maxy)."""
    xs: list[float] = []
    ys: list[float] = []

    def _walk(coords: Any) -> None:
        if not coords:
            return
        if isinstance(coords[0], (int, float)):
            xs.append(coords[0])
            ys.append(coords[1])
        else:
            for c in coords:
                _walk(c)

    if geom["type"] == "GeometryCollection":
        for g in geom["geometries"]:
            b = bounds(g)
            xs.extend([b[0], b[2]])
            ys.extend([b[1], b[3]])
    else:
        _walk(geom["coordinates"])
    if not xs:
        return (math.nan, math.nan, math.nan, math.nan)
    return (min(xs), min(ys), max(xs), max(ys))


def is_empty(geom: Geometry) -> bool:
    if geom["type"] == "GeometryCollection":
        return all(is_empty(g) for g in geom.get("geometries", []))
    return not geom.get("coordinates")


# --------------------------------------------------------------------------
# WKT
# --------------------------------------------------------------------------

def _fmt_coord(pt: list[float]) -> str:
    return " ".join(repr(float(c)) if float(c) != int(c) else str(int(c)) for c in pt)


def _fmt_ring(ring: list[list[float]]) -> str:
    return "(" + ", ".join(_fmt_coord(p) for p in ring) + ")"


def to_wkt(geom: Geometry) -> str:
    t = geom["type"]
    if t == "GeometryCollection":
        inner = ", ".join(to_wkt(g) for g in geom["geometries"])
        return f"GEOMETRYCOLLECTION ({inner})" if inner else "GEOMETRYCOLLECTION EMPTY"
    c = geom["coordinates"]
    if not c:
        return f"{t.upper()} EMPTY"
    if t == "Point":
        return f"POINT ({_fmt_coord(c)})"
    if t == "LineString":
        return f"LINESTRING {_fmt_ring(c)}"
    if t == "Polygon":
        return "POLYGON (" + ", ".join(_fmt_ring(r) for r in c) + ")"
    if t == "MultiPoint":
        return "MULTIPOINT (" + ", ".join(f"({_fmt_coord(p)})" for p in c) + ")"
    if t == "MultiLineString":
        return "MULTILINESTRING (" + ", ".join(_fmt_ring(l) for l in c) + ")"
    if t == "MultiPolygon":
        return (
            "MULTIPOLYGON ("
            + ", ".join("(" + ", ".join(_fmt_ring(r) for r in poly) + ")" for poly in c)
            + ")"
        )
    raise ValueError(f"Unsupported geometry type: {t}")


def from_wkt(wkt: str) -> Geometry:
    """Parse the WKT subset the engine needs (2D, no Z/M)."""
    s = wkt.strip()
    m = re.match(r"^\s*([A-Za-z]+)\s*(.*)$", s, re.S)
    if not m:
        raise ValueError(f"Invalid WKT: {wkt[:80]}")
    type_word = m.group(1).upper()
    rest = m.group(2).strip()
    mapping = {t.upper(): t for t in _TYPES}
    if type_word not in mapping:
        raise ValueError(f"Unsupported WKT type: {type_word}")
    t = mapping[type_word]
    if rest.upper().startswith("EMPTY"):
        if t == "GeometryCollection":
            return {"type": t, "geometries": []}
        return {"type": t, "coordinates": []}
    if t == "GeometryCollection":
        body = _strip_parens(rest)
        return {"type": t, "geometries": [from_wkt(p) for p in _split_top(body)]}
    body = _strip_parens(rest)
    if t == "Point":
        return {"type": t, "coordinates": _parse_coord(body)}
    if t == "LineString":
        return {"type": t, "coordinates": _parse_coord_seq(body)}
    if t == "Polygon":
        return {"type": t, "coordinates": [_parse_coord_seq(_strip_parens(r)) for r in _split_top(body)]}
    if t == "MultiPoint":
        parts = _split_top(body)
        return {
            "type": t,
            "coordinates": [
                _parse_coord(_strip_parens(p) if p.strip().startswith("(") else p)
                for p in parts
            ],
        }
    if t == "MultiLineString":
        return {"type": t, "coordinates": [_parse_coord_seq(_strip_parens(l)) for l in _split_top(body)]}
    if t == "MultiPolygon":
        return {
            "type": t,
            "coordinates": [
                [_parse_coord_seq(_strip_parens(r)) for r in _split_top(_strip_parens(poly))]
                for poly in _split_top(body)
            ],
        }
    raise ValueError(f"Unsupported WKT type: {t}")


def _strip_parens(s: str) -> str:
    s = s.strip()
    if not s.startswith("("):
        raise ValueError(f"Expected '(' in WKT fragment: {s[:40]}")
    depth = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return s[1:i]
    raise ValueError("Unbalanced parentheses in WKT")


def _split_top(s: str) -> list[str]:
    parts: list[str] = []
    depth = 0
    start = 0
    for i, ch in enumerate(s):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
    parts.append(s[start:])
    return [p for p in (p.strip() for p in parts) if p]


def _parse_coord(s: str) -> list[float]:
    nums = [float(x) for x in s.split()]
    return nums[:2]


def _parse_coord_seq(s: str) -> list[list[float]]:
    return [_parse_coord(p) for p in _split_top(s)]
