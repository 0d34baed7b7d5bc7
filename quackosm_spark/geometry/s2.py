"""Pure-Python S2 cell geometry — no ``s2sphere``/``s2geometry`` needed.

Implements the public S2 cell model (published by the s2geometry project:
cube-face decomposition, quadratic st→uv projection, per-face Hilbert
curve, 64-bit cell ids with the trailing-one level encoding) far enough to
support the reference's S2 geometry-filter input (reference cli.py accepts
an S2 cell index and converts it to a polygon via the `s2` library —
here the conversion is computed directly):

- ``cell_token_to_polygon``: S2 token → GeoJSON polygon of the cell corners
- ``lat_lng_to_cell_id`` / ``cell_id_to_token``: point → containing cell
- parent/child navigation for coarse-to-fine workflows

Only driver-side CLI metadata work (a handful of cells per invocation) —
scale-path spatial bucketing uses geohash/tiles which are Column-native.
"""

from __future__ import annotations

import math

_SWAP = 0x01
_INVERT = 0x02
# Hilbert sub-cell traversal (S2 published constants): for each of the 4
# curve orientations, position-in-curve → (i, j) quadrant and the child
# orientation modifier.
_POS_TO_IJ = [
    [0, 1, 3, 2],  # canonical order
    [0, 2, 3, 1],  # swapped
    [3, 2, 0, 1],  # inverted
    [3, 1, 0, 2],  # swapped + inverted
]
_POS_TO_ORIENTATION = [_SWAP, 0, 0, _INVERT | _SWAP]
_IJ_TO_POS = [
    [pos_to_ij.index(q) for q in range(4)] for pos_to_ij in _POS_TO_IJ
]

MAX_LEVEL = 30


# --------------------------------------------------------------------------
# st ↔ uv (S2_QUADRATIC_PROJECTION) and face uv ↔ xyz
# --------------------------------------------------------------------------

def _st_to_uv(s: float) -> float:
    if s >= 0.5:
        return (1.0 / 3.0) * (4.0 * s * s - 1.0)
    return (1.0 / 3.0) * (1.0 - 4.0 * (1.0 - s) * (1.0 - s))


def _uv_to_st(u: float) -> float:
    if u >= 0:
        return 0.5 * math.sqrt(1.0 + 3.0 * u)
    return 1.0 - 0.5 * math.sqrt(1.0 - 3.0 * u)


def _face_uv_to_xyz(face: int, u: float, v: float) -> tuple[float, float, float]:
    if face == 0:
        return (1.0, u, v)
    if face == 1:
        return (-u, 1.0, v)
    if face == 2:
        return (-u, -v, 1.0)
    if face == 3:
        return (-1.0, -v, -u)
    if face == 4:
        return (v, -1.0, -u)
    return (v, u, -1.0)


def _xyz_to_face_uv(x: float, y: float, z: float) -> tuple[int, float, float]:
    ax, ay, az = abs(x), abs(y), abs(z)
    if ax >= ay and ax >= az:
        face = 0 if x > 0 else 3
    elif ay >= az:
        face = 1 if y > 0 else 4
    else:
        face = 2 if z > 0 else 5
    if face == 0:
        u, v = y / x, z / x
    elif face == 1:
        u, v = -x / y, z / y
    elif face == 2:
        u, v = -x / z, -y / z
    elif face == 3:
        u, v = z / x, y / x
    elif face == 4:
        u, v = z / y, -x / y
    else:
        u, v = -y / z, -x / z
    return face, u, v


def _xyz_to_lat_lng(x: float, y: float, z: float) -> tuple[float, float]:
    lat = math.degrees(math.atan2(z, math.hypot(x, y)))
    lng = math.degrees(math.atan2(y, x))
    return lat, lng


def _lat_lng_to_xyz(lat: float, lng: float) -> tuple[float, float, float]:
    phi = math.radians(lat)
    theta = math.radians(lng)
    cosphi = math.cos(phi)
    return (cosphi * math.cos(theta), cosphi * math.sin(theta), math.sin(phi))


# --------------------------------------------------------------------------
# cell id model: 3 face bits + 2·level Hilbert position bits + trailing 1
# --------------------------------------------------------------------------

def lat_lng_to_cell_id(lat: float, lng: float, level: int = MAX_LEVEL) -> int:
    if not 0 <= level <= MAX_LEVEL:
        raise ValueError(f"level must be in [0, {MAX_LEVEL}]")
    face, u, v = _xyz_to_face_uv(*_lat_lng_to_xyz(lat, lng))
    s, t = _uv_to_st(u), _uv_to_st(v)
    scale = 1 << MAX_LEVEL
    i = min(scale - 1, max(0, int(math.floor(s * scale))))
    j = min(scale - 1, max(0, int(math.floor(t * scale))))
    # Hilbert-encode (i, j) from the top bit down
    orientation = _SWAP if face & 1 else 0
    pos = 0
    for k in range(MAX_LEVEL - 1, -1, -1):
        quad = (((i >> k) & 1) << 1) | ((j >> k) & 1)
        p = _IJ_TO_POS[orientation][quad]
        pos = (pos << 2) | p
        orientation ^= _POS_TO_ORIENTATION[p]
    cell_id = (face << (2 * MAX_LEVEL + 1)) | (pos << 1) | 1
    # snap to the requested level: keep 2·level position bits
    if level < MAX_LEVEL:
        lsb = 1 << (2 * (MAX_LEVEL - level))
        cell_id = (cell_id & ~(lsb - 1)) | lsb
    return cell_id


def cell_id_level(cell_id: int) -> int:
    lsb = cell_id & (-cell_id)
    return MAX_LEVEL - (lsb.bit_length() - 1) // 2


def cell_id_face(cell_id: int) -> int:
    return cell_id >> (2 * MAX_LEVEL + 1)


def _cell_id_to_face_ij(cell_id: int) -> tuple[int, int, int, int]:
    """→ (face, i, j, level); (i, j) is the LEAF cell of the cell's
    min-corner at full resolution."""
    face = cell_id_face(cell_id)
    level = cell_id_level(cell_id)
    pos = (cell_id >> 1) & ((1 << (2 * MAX_LEVEL)) - 1)
    orientation = _SWAP if face & 1 else 0
    i = j = 0
    for k in range(MAX_LEVEL - 1, MAX_LEVEL - 1 - level, -1):
        p = (pos >> (2 * k)) & 3
        quad = _POS_TO_IJ[orientation][p]
        i = (i << 1) | (quad >> 1)
        j = (j << 1) | (quad & 1)
        orientation ^= _POS_TO_ORIENTATION[p]
    shift = MAX_LEVEL - level
    return face, i << shift, j << shift, level


def cell_id_to_token(cell_id: int) -> str:
    """Hex token with trailing zeros stripped (the s2 canonical form)."""
    h = f"{cell_id:016x}".rstrip("0")
    return h or "X"


def token_to_cell_id(token: str) -> int:
    t = token.strip().lower()
    if not t or t == "x":
        raise ValueError(f"Invalid S2 token: {token!r}")
    if len(t) > 16 or any(c not in "0123456789abcdef" for c in t):
        raise ValueError(f"Invalid S2 token: {token!r}")
    return int(t.ljust(16, "0"), 16)


def cell_corners(cell_id: int) -> list[tuple[float, float]]:
    """The 4 cell corners as (lat, lng), CCW as seen from outside the
    sphere (min-corner first)."""
    face, i, j, level = _cell_id_to_face_ij(cell_id)
    size = 1 << (MAX_LEVEL - level)
    scale = 1.0 / (1 << MAX_LEVEL)
    out = []
    for di, dj in ((0, 0), (1, 0), (1, 1), (0, 1)):
        s = (i + di * size) * scale
        t = (j + dj * size) * scale
        xyz = _face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t))
        out.append(_xyz_to_lat_lng(*xyz))
    return out


def cell_center(cell_id: int) -> tuple[float, float]:
    face, i, j, level = _cell_id_to_face_ij(cell_id)
    half = (1 << (MAX_LEVEL - level)) / 2.0
    scale = 1.0 / (1 << MAX_LEVEL)
    s, t = (i + half) * scale, (j + half) * scale
    return _xyz_to_lat_lng(*_face_uv_to_xyz(face, _st_to_uv(s), _st_to_uv(t)))


def cell_parent(cell_id: int, level: int | None = None) -> int:
    cur = cell_id_level(cell_id)
    if level is None:
        level = cur - 1
    if not 0 <= level <= cur:
        raise ValueError(f"parent level {level} not in [0, {cur}]")
    lsb = 1 << (2 * (MAX_LEVEL - level))
    return (cell_id & ~(lsb - 1)) | lsb


def cell_children(cell_id: int) -> list[int]:
    level = cell_id_level(cell_id)
    if level >= MAX_LEVEL:
        raise ValueError("leaf cells have no children")
    old_lsb = cell_id & (-cell_id)
    new_lsb = old_lsb >> 2
    start = cell_id - old_lsb + new_lsb
    return [start + 2 * k * new_lsb for k in range(4)]


def cell_token_to_polygon(token: str) -> dict:
    """S2 token → GeoJSON Polygon of the cell boundary (lon, lat order) —
    the geometry-filter input form (reference cli.py S2 branch)."""
    corners = cell_corners(token_to_cell_id(token))
    ring = [[lng, lat] for lat, lng in corners]
    ring.append(ring[0])
    return {"type": "Polygon", "coordinates": [ring]}
