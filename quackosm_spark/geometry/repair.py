"""Geometry repair and polygon boolean ops — pure Python/numpy.

Fills the reference's two GEOS-backed gaps called out in VERDICT r01:

- ``make_valid_ring``: ST_MakeValid for self-intersecting closed ways
  (reference wraps every geometry write in ST_MakeValid,
  pbf_file_reader.py:3592-3644). A bowtie ``building=yes`` way becomes the
  even-odd MultiPolygon GEOS produces: split at self-intersections,
  decompose into simple loops, nest by even-odd containment parity.
- ``ring_union`` / ``ring_difference``: Greiner–Hormann clipping for the
  relation-assembly semantics the reference gets from
  ``ST_Difference`` / ``ST_Union_Agg`` (pbf_file_reader.py:3332-3397):
  overlapping outer parts union into one shell; an inner ring straddling
  the outer boundary subtracts only the covered part.

Everything operates on plain coordinate lists (``[[x, y], ...]``, open or
closed rings) like the rest of ``quackosm_spark.geometry`` — no GEOS. All
functions are per-feature kernels called inside Arrow-batched pandas UDFs,
so they parallelize with the data and add no shuffle.

Degeneracy contract: crossings must be transversal (no collinear-overlap
edge pairs); OSM data meets this after consecutive-duplicate removal, and
the callers guard with try/except keeping the raw ring on failure.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np

from quackosm_spark.geometry.ops import (
    ensure_orientation,
    points_in_ring,
    remove_repeated_points,
    signed_area,
)

Ring = list[list[float]]
_EPS = 1e-12
_KEY_DIGITS = 9


def _close(ring: Ring) -> Ring:
    if ring and ring[0] != ring[-1]:
        return ring + [ring[0]]
    return ring


def _open(ring: Ring) -> Ring:
    if len(ring) >= 2 and ring[0] == ring[-1]:
        return ring[:-1]
    return ring


def _key(pt: list[float]) -> tuple[float, float]:
    return (round(pt[0], _KEY_DIGITS), round(pt[1], _KEY_DIGITS))


def _seg_intersection(
    p1: list[float], p2: list[float], q1: list[float], q2: list[float]
) -> Optional[tuple[float, float, list[float]]]:
    """Transversal intersection of open segments (p1,p2) and (q1,q2).
    Returns (t along p, u along q, point) with t,u in (0,1) exclusive of
    shared endpoints; None for parallel/disjoint pairs."""
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    sx, sy = q2[0] - q1[0], q2[1] - q1[1]
    denom = rx * sy - ry * sx
    if abs(denom) < _EPS:
        return None
    qpx, qpy = q1[0] - p1[0], q1[1] - p1[1]
    t = (qpx * sy - qpy * sx) / denom
    u = (qpx * ry - qpy * rx) / denom
    if -_EPS < t < 1 + _EPS and -_EPS < u < 1 + _EPS:
        pt = [p1[0] + t * rx, p1[1] + t * ry]
        return (t, u, pt)
    return None


# --------------------------------------------------------------------------
# ST_MakeValid for a single ring (bowtie / self-touching repair)
# --------------------------------------------------------------------------

def has_self_intersection(ring: Ring) -> bool:
    """True iff the closed ring has a transversal self-intersection —
    the cheap guard that keeps valid geometry on the exact-parity fast
    path (no re-orientation, no vertex reordering). Vectorized numpy
    all-pairs segment test, O(K²) in memory but K is a single feature's
    vertex count."""
    a = np.asarray(ring, dtype=np.float64)
    if a.ndim != 2 or a.shape[0] < 4:
        return False
    # numpy-native consecutive dedupe + unclose (accepts lists OR arrays —
    # the way-geometry UDF feeds raw Arrow float arrays straight in)
    keep = np.ones(len(a), dtype=bool)
    keep[1:] = (a[1:] != a[:-1]).any(axis=1)
    a = a[keep]
    if len(a) >= 2 and (a[0] == a[-1]).all():
        a = a[:-1]
    n = a.shape[0]
    if n < 4:
        return False
    arr = np.concatenate([a, a[:1]], axis=0)
    p = arr[:-1]
    r = arr[1:] - arr[:-1]
    # pairwise cross products: t and u parameters for all edge pairs
    px, py = p[:, 0], p[:, 1]
    rx, ry = r[:, 0], r[:, 1]
    denom = rx[:, None] * ry[None, :] - ry[:, None] * rx[None, :]
    qpx = px[None, :] - px[:, None]
    qpy = py[None, :] - py[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qpx * ry[None, :] - qpy * rx[None, :]) / denom
        u = (qpx * ry[:, None] - qpy * rx[:, None]) / denom
    i_idx, j_idx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    nonadjacent = (
        (j_idx > i_idx + 1) & ~((i_idx == 0) & (j_idx == n - 1))
    )
    crossing = (
        nonadjacent
        & (np.abs(denom) > _EPS)
        & (t > _EPS) & (t < 1 - _EPS)
        & (u > _EPS) & (u < 1 - _EPS)
    )
    return bool(np.any(crossing))


def rings_cross(a: Ring, b: Ring) -> bool:
    """True iff two rings have a transversal edge crossing (the trigger
    for boolean-op assembly instead of plain nesting)."""
    pa = _open(remove_repeated_points(a))
    pb = _open(remove_repeated_points(b))
    arr_a = np.asarray(pa + [pa[0]], dtype=np.float64)
    arr_b = np.asarray(pb + [pb[0]], dtype=np.float64)
    p = arr_a[:-1]
    r = arr_a[1:] - arr_a[:-1]
    q = arr_b[:-1]
    s = arr_b[1:] - arr_b[:-1]
    denom = r[:, None, 0] * s[None, :, 1] - r[:, None, 1] * s[None, :, 0]
    qpx = q[None, :, 0] - p[:, None, 0]
    qpy = q[None, :, 1] - p[:, None, 1]
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (qpx * s[None, :, 1] - qpy * s[None, :, 0]) / denom
        u = (qpx * r[:, None, 1] - qpy * r[:, None, 0]) / denom
    crossing = (
        (np.abs(denom) > _EPS)
        & (t > _EPS) & (t < 1 - _EPS)
        & (u > _EPS) & (u < 1 - _EPS)
    )
    return bool(np.any(crossing))

def _planarize_ring(ring: Ring) -> Ring:
    """Insert every self-intersection point into the ring walk."""
    pts = _open(remove_repeated_points(ring))
    n = len(pts)
    splits: dict[int, list[tuple[float, list[float]]]] = {}
    for i in range(n):
        a1, a2 = pts[i], pts[(i + 1) % n]
        for j in range(i + 1, n):
            # adjacent edges share an endpoint, skip
            if j == i or (j + 1) % n == i or (i + 1) % n == j:
                continue
            b1, b2 = pts[j], pts[(j + 1) % n]
            hit = _seg_intersection(a1, a2, b1, b2)
            if hit is None:
                continue
            t, u, pt = hit
            if _EPS < t < 1 - _EPS:
                splits.setdefault(i, []).append((t, pt))
            if _EPS < u < 1 - _EPS:
                splits.setdefault(j, []).append((u, pt))
    out: Ring = []
    for i in range(n):
        out.append(pts[i])
        for _t, pt in sorted(splits.get(i, []), key=lambda s: s[0]):
            out.append(pt)
    return remove_repeated_points(out)


def _faces_from_walk(walk: Ring) -> list[Ring]:
    """Extract the bounded faces of the planar graph induced by a closed
    walk (nodes = distinct points, edges = consecutive pairs).

    Standard rotation-system face traversal: outgoing edges at every node
    are angle-sorted; the successor of directed edge (a→b) is (b→c) with c
    the clockwise-next neighbor of b after a. Interleaved crossings (a
    pentagram's walk) decompose correctly — a repeat-vertex stack method
    does not. Retraced segments (the same undirected edge walked twice)
    are outside the contract, like GEOS's linework noding they would need
    dissolving first."""
    pts: dict[tuple[float, float], list[float]] = {}
    edges: set[tuple[tuple[float, float], tuple[float, float]]] = set()
    keys = [_key(p) for p in walk]
    n = len(walk)
    for i in range(n):
        a, b = keys[i], keys[(i + 1) % n]
        if a == b:
            continue
        pts[a] = walk[i]
        pts[b] = walk[(i + 1) % n]
        edges.add((a, b))
        edges.add((b, a))
    adj: dict[tuple[float, float], list[tuple[float, float]]] = {}
    for a, b in edges:
        adj.setdefault(a, []).append(b)
    for a, nbrs in adj.items():
        seen: set[tuple[float, float]] = set()
        uniq = [b for b in nbrs if not (b in seen or seen.add(b))]
        uniq.sort(
            key=lambda b: math.atan2(
                pts[b][1] - pts[a][1], pts[b][0] - pts[a][0]
            )
        )
        adj[a] = uniq
    visited: set = set()
    faces: list[Ring] = []
    for e in sorted(edges):
        if e in visited:
            continue
        face: Ring = []
        cur = e
        while cur not in visited:
            visited.add(cur)
            a, b = cur
            face.append(pts[a])
            nbrs = adj[b]
            i = nbrs.index(a)
            cur = (b, nbrs[(i - 1) % len(nbrs)])
        if len(face) >= 3:
            faces.append(face)
    # bounded faces come out CCW under clockwise-next traversal; the
    # unbounded face (one per connected component) comes out CW
    return [f for f in faces if signed_area(_close(f)) > _EPS]


def _interior_probe(loop: Ring, others: list[Ring]) -> Optional[list[float]]:
    """A point strictly inside ``loop`` and not on any other loop's
    boundary: edge midpoints nudged toward the loop's interior."""
    closed = _close(loop)
    arr = np.asarray(closed, dtype=np.float64)
    ccw = signed_area(closed) > 0
    for i in range(len(closed) - 1):
        mx = (arr[i, 0] + arr[i + 1, 0]) / 2.0
        my = (arr[i, 1] + arr[i + 1, 1]) / 2.0
        ex, ey = arr[i + 1, 0] - arr[i, 0], arr[i + 1, 1] - arr[i, 1]
        norm = math.hypot(ex, ey)
        if norm < _EPS:
            continue
        # interior normal: left of edge for CCW rings, right for CW
        nx, ny = (-ey / norm, ex / norm) if ccw else (ey / norm, -ex / norm)
        for scale in (1e-7, 1e-9):
            px, py = mx + nx * norm * scale, my + ny * norm * scale
            inside = points_in_ring(
                np.asarray([px]), np.asarray([py]), arr
            )[0]
            if inside:
                return [px, py]
    return None


def make_valid_ring(ring: Ring) -> list[list[Ring]]:
    """Repair one (possibly self-intersecting) closed ring into a list of
    valid polygons ``[[shell, hole...], ...]`` — GEOS-linework even-odd
    semantics, shells CCW / holes CW, zero-area slivers dropped. A ring
    that is already simple comes back unchanged (as a single shell).

    Planarize → extract bounded faces → keep faces whose interior has ODD
    crossing parity against the original walk (``points_in_ring`` ray-
    casts even-odd on any closed walk, simple or not) → attach even faces
    nested inside a kept face as holes (disconnected-component case)."""
    walk = _planarize_ring(ring)
    faces = _faces_from_walk(walk)
    if not faces:
        return []
    if len(faces) == 1:
        return [[_close(ensure_orientation(_open(faces[0]), ccw=True))]]
    orig = np.asarray(_close(remove_repeated_points(ring)), dtype=np.float64)
    kept: list[Ring] = []
    dropped: list[Ring] = []
    for f in faces:
        probe = _interior_probe(f, [])
        if probe is not None and _point_in_ring(probe, orig):
            kept.append(f)
        else:
            dropped.append(f)
    polys: list[list[Ring]] = [
        [_close(ensure_orientation(_open(f), ccw=True))] for f in kept
    ]
    kept_arrs = [np.asarray(_close(f), dtype=np.float64) for f in kept]
    for f in dropped:
        probe = _interior_probe(f, [])
        if probe is None:
            continue
        for i, arr in enumerate(kept_arrs):
            if _point_in_ring(probe, arr):
                polys[i].append(_close(ensure_orientation(_open(f), ccw=False)))
                break
    return polys


def make_valid_area(ring: Ring) -> float:
    """Even-odd area of a repaired ring (Σ |shell| − |holes|)."""
    total = 0.0
    for poly in make_valid_ring(ring):
        total += abs(signed_area(poly[0]))
        for hole in poly[1:]:
            total -= abs(signed_area(hole))
    return total


# --------------------------------------------------------------------------
# Greiner–Hormann clipping (union / difference / intersection of two
# simple rings)
# --------------------------------------------------------------------------

class _GHVertex:
    __slots__ = (
        "pt", "next", "prev", "neighbor", "intersect", "entry", "alpha",
        "visited",
    )

    def __init__(self, pt: list[float], alpha: float = 0.0, intersect: bool = False):
        self.pt = pt
        self.next: Optional[_GHVertex] = None
        self.prev: Optional[_GHVertex] = None
        self.neighbor: Optional[_GHVertex] = None
        self.intersect = intersect
        self.entry = True
        self.alpha = alpha
        self.visited = False


def _build_list(ring: Ring) -> _GHVertex:
    first: Optional[_GHVertex] = None
    prev: Optional[_GHVertex] = None
    for pt in _open(remove_repeated_points(ring)):
        v = _GHVertex(list(pt))
        if first is None:
            first = v
        else:
            prev.next = v
            v.prev = prev
        prev = v
    assert first is not None and prev is not None
    prev.next = first
    first.prev = prev
    return first


def _iter_ring(first: _GHVertex):
    v = first
    while True:
        yield v
        v = v.next
        if v is first:
            break


def _insert_between(start: _GHVertex, end: _GHVertex, v: _GHVertex) -> None:
    cur = start
    while cur.next is not end and cur.next.intersect and cur.next.alpha < v.alpha:
        cur = cur.next
    v.next = cur.next
    v.prev = cur
    cur.next.prev = v
    cur.next = v


def _point_in_ring(pt: list[float], ring_arr: np.ndarray) -> bool:
    return bool(
        points_in_ring(np.asarray([pt[0]]), np.asarray([pt[1]]), ring_arr)[0]
    )


def _clip(subject: Ring, clip: Ring, op: str) -> list[Ring]:
    """Greiner–Hormann core. op in {'union', 'difference', 'intersection'}
    (difference = subject − clip). Returns closed CCW result rings."""
    subj_arr = np.asarray(_close(remove_repeated_points(subject)), dtype=np.float64)
    clip_arr = np.asarray(_close(remove_repeated_points(clip)), dtype=np.float64)

    s_first = _build_list(subject)
    c_first = _build_list(clip)

    # phase 1: find and cross-link intersections
    found = False
    s_nodes = [v for v in _iter_ring(s_first)]
    c_nodes = [v for v in _iter_ring(c_first)]
    for sv in s_nodes:
        s_end = sv.next
        while s_end.intersect:
            s_end = s_end.next
        for cv in c_nodes:
            c_end = cv.next
            while c_end.intersect:
                c_end = c_end.next
            hit = _seg_intersection(sv.pt, s_end.pt, cv.pt, c_end.pt)
            if hit is None:
                continue
            t, u, pt = hit
            if not (_EPS < t < 1 - _EPS and _EPS < u < 1 - _EPS):
                # endpoint-touching: treated as non-crossing (fixtures and
                # OSM data are transversal after dedup)
                continue
            found = True
            isv = _GHVertex(pt, alpha=t, intersect=True)
            icv = _GHVertex(pt, alpha=u, intersect=True)
            isv.neighbor = icv
            icv.neighbor = isv
            _insert_between(sv, s_end, isv)
            _insert_between(cv, c_end, icv)

    if not found:
        # disjoint or nested — resolve by containment of a strictly
        # INTERIOR probe (a first-vertex test misclassifies rings that
        # merely touch at a shared vertex/edge: boundary counts as inside)
        s_probe = _interior_probe(_open(subject), [])
        c_probe = _interior_probe(_open(clip), [])
        s_in_c = s_probe is not None and _point_in_ring(s_probe, clip_arr)
        c_in_s = c_probe is not None and _point_in_ring(c_probe, subj_arr)
        s_ring = _close(ensure_orientation(_open(subject), ccw=True))
        c_ring = _close(ensure_orientation(_open(clip), ccw=True))
        if op == "union":
            if s_in_c:
                return [c_ring]
            if c_in_s:
                return [s_ring]
            return [s_ring, c_ring]
        if op == "intersection":
            if s_in_c:
                return [s_ring]
            if c_in_s:
                return [c_ring]
            return []
        # difference
        if s_in_c:
            return []
        if c_in_s:
            # clip becomes a hole — caller keeps it as an interior ring
            return [s_ring]
        return [s_ring]

    # phase 2: entry/exit flags
    def _mark(first: _GHVertex, other_arr: np.ndarray, invert: bool) -> None:
        inside = _point_in_ring(first.pt, other_arr)
        entry = not inside
        if invert:
            entry = not entry
        for v in _iter_ring(first):
            if v.intersect:
                v.entry = entry
                entry = not entry

    # empirically pinned against closed-form fixtures: intersection = no
    # inversion, union = invert both, difference(subject−clip) = invert
    # the SUBJECT flags only
    invert_subject = op in ("union", "difference")
    invert_clip = op == "union"
    _mark(s_first, clip_arr, invert_subject)
    _mark(c_first, subj_arr, invert_clip)

    # phase 3: trace result rings
    results: list[Ring] = []
    unvisited = [
        v for v in _iter_ring(s_first) if v.intersect and not v.visited
    ]
    while unvisited:
        start = unvisited[0]
        ring: Ring = []
        cur = start
        while True:
            cur.visited = True
            if cur.neighbor is not None:
                cur.neighbor.visited = True
            if cur.entry:
                while True:
                    cur = cur.next
                    ring.append(list(cur.pt))
                    if cur.intersect:
                        break
            else:
                while True:
                    cur = cur.prev
                    ring.append(list(cur.pt))
                    if cur.intersect:
                        break
            cur = cur.neighbor
            if cur is start or (cur.neighbor is start):
                break
        ring = remove_repeated_points(ring)
        if len(ring) >= 3:
            results.append(_close(ensure_orientation(ring, ccw=True)))
        unvisited = [
            v for v in _iter_ring(s_first) if v.intersect and not v.visited
        ]
    return results


def ring_union(a: Ring, b: Ring) -> list[Ring]:
    """Union of two simple rings → list of closed CCW shells (holes from
    union of crossing rings don't occur in the relation-assembly use)."""
    return _clip(a, b, "union")


def ring_difference(a: Ring, b: Ring) -> list[Ring]:
    """a − b → list of closed CCW shells ONLY. When ``b`` nests strictly
    inside ``a`` (no crossings) the result is ``[a]`` and the hole is the
    CALLER's to attach (the relation-assembly path handles nested inners
    as interior rings before ever calling this); use
    ``polygon_difference`` for the hole-aware general form."""
    return _clip(a, b, "difference")


def polygon_difference(a: Ring, b: Ring) -> list[list[Ring]]:
    """a − b as full polygons ``[[shell, hole...], ...]`` — the hole-aware
    general form: a clip nested strictly inside the subject becomes an
    interior ring instead of silently vanishing."""
    shells = _clip(a, b, "difference")
    if len(shells) == 1 and ring_area(shells[0]) == ring_area(a):
        # no crossings changed the subject: nested clip → attach as hole
        probe = _interior_probe(_open(remove_repeated_points(b)), [])
        if probe is not None and _point_in_ring(
            probe, np.asarray(_close(remove_repeated_points(a)), dtype=np.float64)
        ):
            hole = _close(
                ensure_orientation(_open(remove_repeated_points(b)), ccw=False)
            )
            return [[shells[0], hole]]
    return [[s] for s in shells]


def ring_intersection(a: Ring, b: Ring) -> list[Ring]:
    return _clip(a, b, "intersection")


def union_all(rings: list[Ring]) -> list[Ring]:
    """Iterative pairwise union of many shells (ST_Union_Agg for the
    relation outer-parts case): merge any two that cross or nest until a
    fixpoint of disjoint shells remains."""
    shells = [
        _close(ensure_orientation(_open(remove_repeated_points(r)), ccw=True))
        for r in rings
        if len(remove_repeated_points(r)) >= 3
    ]
    changed = True
    while changed and len(shells) > 1:
        changed = False
        for i in range(len(shells)):
            for j in range(i + 1, len(shells)):
                merged = ring_union(shells[i], shells[j])
                if len(merged) == 1:
                    shells = (
                        [s for k, s in enumerate(shells) if k not in (i, j)]
                        + merged
                    )
                    changed = True
                    break
            if changed:
                break
    return shells


def ring_area(ring: Ring) -> float:
    return abs(signed_area(_close(ring)))
