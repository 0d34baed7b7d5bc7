"""OSM extract discovery: coverage search (C13) + fuzzy name query (C14).

Driver-side reimplementation of the reference's `quackosm/osm_extracts`
subsystem (osm_extracts/__init__.py:283-391 fuzzy query, 900-1037 greedy IoU
cover, 1040-1193 overlap filter + redundancy simplification). This metadata
is tiny (thousands of extracts), so — like the reference — none of it runs
on Spark; it selects which PBF files the distributed pipeline should read.

Geometry engine: the container has no shapely, so polygon boolean ops
(intersection area, difference, covered-by) run on a deterministic raster
grid over the working bbox using the same vectorized point-in-polygon kernel
the pipeline uses (`quackosm_spark.geometry.ops.points_in_polygon`). At the
default 512×512 resolution the IoU error is far below the 0.01 threshold the
selection algorithm cares about; results are reproducible run-to-run.

Network access: `download_extract` is a real download implementation with
the reference's 404-retry/exclusion loop (`_download_extracts` below) —
the HTTP transport is an injectable ``fetcher`` callable defaulting to
``urllib``, so offline tests inject recorded payloads while a connected
environment downloads live. Provider indexes resolve the same way
(`get_source_index`: cached parquet → precalculated parquet → live
provider fetch via `providers.load_provider_index`).
"""

from __future__ import annotations

import difflib
import warnings
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable, Optional, Sequence

import numpy as np

from quackosm_spark.cache import oriented_geometry
from quackosm_spark.filters.geometry import normalize_to_polygons
from quackosm_spark.geometry import model
from quackosm_spark.geometry.ops import points_in_polygon

Geometry = dict[str, Any]

DEFAULT_RASTER_RESOLUTION = 512


# --------------------------------------------------------------------------
# errors / warnings (mirroring reference _exceptions.py semantics)
# --------------------------------------------------------------------------

class OsmExtractZeroMatchesError(ValueError):
    def __init__(self, message: str, matching_full_names: list[str] | None = None):
        super().__init__(message)
        self.matching_full_names = matching_full_names or []


class OsmExtractMultipleMatchesError(ValueError):
    def __init__(self, message: str, matching_full_names: list[str] | None = None):
        super().__init__(message)
        self.matching_full_names = matching_full_names or []


class OsmExtractMultipleMatchesWarning(UserWarning):
    pass


class GeometryNotCoveredError(RuntimeError):
    pass


class GeometryNotCoveredWarning(UserWarning):
    pass


class OsmExtractsUnavailableError(RuntimeError):
    """Every extract matching a query failed to download (reference
    _exceptions.OsmExtractsUnavailableError semantics)."""

    def __init__(self, message: str, matching_full_names: list[str] | None = None):
        super().__init__(message)
        self.matching_full_names = matching_full_names or []


class OsmExtractUnavailableWarning(UserWarning):
    pass


# --------------------------------------------------------------------------
# data model (reference osm_extracts/extract.py:78 column contract)
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class OpenStreetMapExtract:
    id: str
    name: str
    file_name: str
    parent: str
    url: str
    geometry: Geometry
    # None = not yet computed; resolved lazily through extract_area() so a
    # 30k-extract multi-provider index loads in seconds instead of paying
    # a raster pass per country polygon up front
    area: Optional[float] = field(default=None)
    bounds: Optional[tuple[float, float, float, float]] = field(default=None)


def extract_area(e: OpenStreetMapExtract) -> float:
    """The degree²-raster area the IoU search needs — lazy + memoized ON
    THE INSTANCE (``object.__setattr__`` into the frozen dataclass), not
    in a module-global id-keyed dict: two indexes loaded in one process
    can legitimately carry the same extract id with different geometry
    (stale cached parquet vs refreshed live index), and an id-keyed cache
    would silently reuse the stale area (ADVICE r02)."""
    if e.area is not None:
        return e.area
    val = getattr(e, "_raster_area", None)
    if val is None:
        val = raster_area(e.geometry)
        object.__setattr__(e, "_raster_area", val)
    return val


def build_index(
    records: Iterable[dict[str, Any]], lazy_area: bool = False
) -> list[OpenStreetMapExtract]:
    """Records (dicts with geometry as GeoJSON dict or WKT string) → index.

    ``lazy_area=True`` defers the raster-area computation to first use
    (via ``extract_area``) — the right mode for whole-provider indexes
    where a query only ever touches a handful of extracts."""
    out = []
    for r in records:
        geom = r["geometry"]
        if isinstance(geom, str):
            geom = model.from_wkt(geom)
        area = r.get("area")
        if area is None and not lazy_area:
            area = raster_area(geom)
        out.append(
            OpenStreetMapExtract(
                id=str(r["id"]),
                name=str(r["name"]),
                file_name=str(r["file_name"]),
                parent=str(r.get("parent", "")),
                url=str(r.get("url", "")),
                geometry=geom,
                area=None if area is None else float(area),
                bounds=model.bounds(geom),
            )
        )
    return out


def load_index(path: str | Path, lazy_area: bool = False) -> list[OpenStreetMapExtract]:
    """Load a provider index parquet in EITHER format: geometry as WKT
    strings (this repo's cache format) or WKB binary (the reference's
    precalculated/geoparquet format, extract.py:26-28) — sniffed from the
    column type."""
    import pyarrow.parquet as pq

    table = pq.read_table(path)
    geom_type = table.schema.field("geometry").type
    if geom_type in ("binary", "large_binary") or "binary" in str(geom_type):
        from quackosm_spark.extracts.providers import load_precalculated_index

        return build_index(load_precalculated_index(path), lazy_area=lazy_area)
    return build_index(table.to_pylist(), lazy_area=lazy_area)


ALL_SOURCES = (
    "Geofabrik", "osmfr", "BBBike", "GEO2Day", "Movisda-admin", "Movisda-grid",
)


def get_source_index(
    source: str = "any",
    cache_dir: str | Path | None = None,
    precalculated_dir: str | Path | None = None,
    fetcher: Any = None,
    lazy_area: bool = True,
) -> list[OpenStreetMapExtract]:
    """Resolve a provider index by source name — the reference's
    ``load_index_decorator`` resolution order, offline-friendly: cached
    parquet (``{source}_index.parquet`` in ``cache_dir``) → precalculated
    parquet in ``precalculated_dir`` → live provider fetch
    (``providers.load_provider_index``; needs network or an injected
    fetcher). ``source="any"`` concatenates every resolvable provider
    (skipping unavailable ones, raising only if ALL fail — reference
    ``get_index_for_sources`` semantics)."""
    from quackosm_spark.extracts import providers as P

    # reference `resolve_extract_sources` accepts 'any', one name, or a
    # comma-separated list ('bbbike,osmfr')
    parts = [p.strip() for p in source.split(",") if p.strip()]
    if any(p.lower() == "any" for p in parts) or not parts:
        wanted = list(ALL_SOURCES)
    else:
        wanted = parts
        for p in parts:
            if not any(c.lower() == p.lower() for c in ALL_SOURCES):
                raise ValueError(f"Unknown extract source: {p!r}")
    out: list[OpenStreetMapExtract] = []
    errors: list[str] = []
    for s in wanted:
        canonical = next(
            (c for c in ALL_SOURCES if c.lower() == s.lower()), s
        )
        fname = f"{canonical.lower()}_index.parquet"
        records = None
        for d in (cache_dir, precalculated_dir):
            if d is not None and (Path(d) / fname).exists():
                out.extend(load_index(Path(d) / fname, lazy_area=lazy_area))
                records = ()
                break
        if records is not None:
            continue
        try:
            out.extend(
                build_index(
                    P.load_provider_index(canonical, fetcher=fetcher),
                    lazy_area=lazy_area,
                )
            )
        except Exception as e:  # noqa: BLE001 — offline/HTTP failures
            errors.append(f"{canonical}: {e}")
            # reference `_get_index_for_sources` semantics: a single-source
            # request fails fast; EVERY multi-source request (explicit
            # comma list included, not just 'any') skips unavailable
            # sources with a warning and raises only if none resolve
            # (ADVICE r02)
            if len(wanted) == 1:
                raise
            warnings.warn(
                f"Extract source {canonical} unavailable, skipping: {e}",
                OsmExtractUnavailableWarning,
                stacklevel=2,
            )
    if not out:
        raise RuntimeError(
            "No extract source could be resolved"
            + (f" ({'; '.join(errors[:3])})" if errors else "")
        )
    return out


# --------------------------------------------------------------------------
# raster geometry kernel
# --------------------------------------------------------------------------

class _Raster:
    """Boolean occupancy mask of a geometry over a fixed grid."""

    def __init__(self, mask: np.ndarray, cell_area: float):
        self.mask = mask
        self.cell_area = cell_area

    @property
    def area(self) -> float:
        return float(self.mask.sum()) * self.cell_area

    @property
    def is_empty(self) -> bool:
        return not bool(self.mask.any())

    def intersects(self, other: "_Raster") -> bool:
        return bool((self.mask & other.mask).any())

    def intersection_area(self, other: "_Raster") -> float:
        return float((self.mask & other.mask).sum()) * self.cell_area

    def difference(self, other: "_Raster") -> "_Raster":
        return _Raster(self.mask & ~other.mask, self.cell_area)

    def covered_by(self, others_union: "_Raster") -> bool:
        return bool((self.mask & ~others_union.mask).sum() == 0)

    def union_(self, other: "_Raster") -> "_Raster":
        return _Raster(self.mask | other.mask, self.cell_area)


class _Grid:
    def __init__(self, bbox: tuple[float, float, float, float], resolution: int):
        minx, miny, maxx, maxy = bbox
        spanx = (maxx - minx) or 1e-9
        spany = (maxy - miny) or 1e-9
        # small margin so boundary cells are sampled inside
        self.minx, self.miny = minx, miny
        self.dx = spanx / resolution
        self.dy = spany / resolution
        xs = minx + (np.arange(resolution) + 0.5) * self.dx
        ys = miny + (np.arange(resolution) + 0.5) * self.dy
        gx, gy = np.meshgrid(xs, ys)
        self.px = gx.ravel()
        self.py = gy.ravel()
        self.cell_area = self.dx * self.dy

    def _decimate(self, ring: list) -> np.ndarray:
        """Snap ring vertices to the grid cell size and drop consecutive
        duplicates: sub-cell detail cannot change which cell CENTERS are
        inside by more than the raster's intrinsic half-cell error, and it
        bounds the edge count at O(perimeter / cell) — a 100k-vertex
        country boundary collapses to a few thousand edges, keeping the
        O(points × edges) ray-cast matrix small."""
        arr = np.asarray(ring, dtype=np.float64)
        if arr.shape[0] <= 256:
            return arr
        step = min(self.dx, self.dy)
        snapped = np.round(arr / step) * step
        keep = np.ones(len(snapped), dtype=bool)
        keep[1:] = (snapped[1:] != snapped[:-1]).any(axis=1)
        out = arr[keep]
        return out if out.shape[0] >= 3 else arr

    def rasterize(self, geom: Geometry) -> _Raster:
        mask = np.zeros(len(self.px), dtype=bool)
        gminx, gminy = self.minx, self.miny
        gmaxx = gminx + self.dx * int(round((self.px.max() - gminx) / self.dx + 1))
        gmaxy = gminy + self.dy * int(round((self.py.max() - gminy) / self.dy + 1))
        for poly in normalize_to_polygons(geom):
            outer = np.asarray(poly[0], dtype=np.float64)
            # bbox prefilter: a polygon that cannot touch the grid never
            # pays the ray-cast
            if (
                outer[:, 0].min() > gmaxx
                or outer[:, 0].max() < gminx
                or outer[:, 1].min() > gmaxy
                or outer[:, 1].max() < gminy
            ):
                continue
            dec = [self._decimate(ring).tolist() for ring in poly]
            # chunk the point set so points×edges stays bounded in memory
            n_edges = max(len(r) for r in dec)
            chunk = max(4096, min(len(self.px), (1 << 24) // max(n_edges, 1)))
            for s in range(0, len(self.px), chunk):
                sl = slice(s, s + chunk)
                mask[sl] |= points_in_polygon(self.px[sl], self.py[sl], dec)
        return _Raster(mask, self.cell_area)


def _geom_bounds(geom: Geometry) -> tuple[float, float, float, float]:
    return model.bounds(geom)


def raster_area(geom: Geometry, resolution: int = 256) -> float:
    grid = _Grid(_geom_bounds(geom), resolution)
    return grid.rasterize(geom).area


def _geometries_equal(a: Geometry, b: Geometry, digits: int = 6) -> bool:
    """geom_equals_exact(tolerance=1e-6) analogue: orientation-normalized,
    rounded coordinate equality (reuses the cache-key normalizer)."""
    def _norm(g: Geometry) -> str:
        oriented = oriented_geometry(g)
        def _round(coords):
            if isinstance(coords[0], (int, float)):
                return [round(coords[0], digits), round(coords[1], digits)]
            return [_round(c) for c in coords]
        return str({**oriented, "coordinates": _round(oriented["coordinates"])})

    try:
        return _norm(a) == _norm(b)
    except (KeyError, IndexError, TypeError):
        return False


# --------------------------------------------------------------------------
# C14: fuzzy name query (reference osm_extracts/__init__.py:283-391)
# --------------------------------------------------------------------------

def _norm_query(s: str) -> str:
    return s.lower().strip()


def get_extract_by_query(
    query: str,
    index: Sequence[OpenStreetMapExtract],
    select_first_match: bool = True,
    excluded_extracts_ids: Optional[set[str]] = None,
) -> OpenStreetMapExtract:
    """Find an extract by file_name/name, case- and underscore-insensitive.

    Resolution order (reference semantics): unique file_name match → unique
    name match → multiple name matches (smallest area wins + warning, or
    raise) → zero matches (difflib suggestions in the error).
    """
    if excluded_extracts_ids:
        index = [e for e in index if e.id not in excluded_extracts_ids]

    q = _norm_query(query)
    q_spaced = q.replace("_", " ")

    def _matches(value: str) -> bool:
        v = value.lower()
        return v == q or v.replace("_", " ") == q_spaced

    by_file_name = [e for e in index if _matches(e.file_name)]
    if len(by_file_name) == 1:
        return by_file_name[0]

    by_name = [e for e in index if _matches(e.name)]
    if len(by_name) == 1:
        return by_name[0]
    if by_name:
        full_names = sorted(e.file_name for e in by_name)
        names_str = ", ".join(f'"{n}"' for n in full_names)
        if not select_first_match:
            raise OsmExtractMultipleMatchesError(
                f'Multiple extracts matched by query "{query.strip()}".\n'
                f"Matching extracts full names: {names_str}.",
                matching_full_names=full_names,
            )
        best = sorted(by_name, key=lambda e: (extract_area(e), e.id))[0]
        warnings.warn(
            f'Multiple extracts matched by query "{query.strip()}"'
            f' (matching full names: {names_str}). Selected "{best.file_name}".',
            OsmExtractMultipleMatchesWarning,
            stacklevel=0,
        )
        return best

    suggestions = difflib.get_close_matches(
        q, sorted({e.name.lower() for e in index}), n=5, cutoff=0.7
    )
    matching_full_names = [
        e.file_name for s in suggestions for e in index if e.name.lower() == s
    ]
    if matching_full_names:
        names_str = ", ".join(f'"{n}"' for n in matching_full_names)
        message = (
            f'Zero extracts matched by query "{query}".\n'
            f"Found full names close to query: {names_str}."
        )
    else:
        message = (
            f'Zero extracts matched by query "{query}".\n'
            "Zero close matches have been found."
        )
    raise OsmExtractZeroMatchesError(message, matching_full_names=matching_full_names)


# --------------------------------------------------------------------------
# C13: greedy IoU coverage search (reference osm_extracts/__init__.py:900-1037)
# --------------------------------------------------------------------------

def _working_grid(
    geometry: Geometry,
    index: Sequence[OpenStreetMapExtract],
    resolution: int,
) -> _Grid:
    # The grid only needs to span the query geometry: every boolean op the
    # algorithm performs is relative to (parts of) the query area. Extract
    # areas use their precomputed `area` field for the IoU denominator.
    return _Grid(_geom_bounds(geometry), resolution)


def _lazy_rasters(grid: _Grid, geometry: Geometry):
    """Per-extract raster getter: an extract whose precomputed bbox is
    disjoint from the query bbox gets an empty mask with NO ray-casting —
    a 30k-extract index then rasterizes only the handful of candidates
    that can actually touch the query."""
    gminx, gminy, gmaxx, gmaxy = model.bounds(geometry)
    cache: dict[str, _Raster] = {}
    empty = _Raster(np.zeros(len(grid.px), dtype=bool), grid.cell_area)

    def get(e: OpenStreetMapExtract) -> _Raster:
        r = cache.get(e.id)
        if r is None:
            b = e.bounds
            if b is not None and (
                b[0] > gmaxx or b[2] < gminx or b[1] > gmaxy or b[3] < gminy
            ):
                r = empty
            else:
                r = grid.rasterize(e.geometry)
            cache[e.id] = r
        return r

    return get


def _cover_geometry_with_extracts(
    geometry: Geometry,
    index: Sequence[OpenStreetMapExtract],
    allow_uncovered_geometry: bool = False,
    resolution: int = DEFAULT_RASTER_RESOLUTION,
) -> tuple[list[str], list[float]]:
    """Greedy loop: repeatedly pick the extract with highest IoU against the
    not-yet-covered remainder, subtract it, until covered."""
    if not index:
        raise RuntimeError("Extracts index is empty.")

    # exact-match shortcut
    for e in index:
        if _geometries_equal(e.geometry, geometry):
            return [e.id], [1.0]

    grid = _working_grid(geometry, index, resolution)
    remaining = grid.rasterize(geometry)
    rasters = _lazy_rasters(grid, geometry)

    checked_ids: list[str] = []
    ious: list[float] = []
    while not remaining.is_empty:
        best: tuple[float, float, str] | None = None  # (-iou, area, id)
        for e in index:
            if e.id in checked_ids:
                continue
            r = rasters(e)
            inter = r.intersection_area(remaining)
            if inter <= 0:
                continue
            iou = inter / (extract_area(e) + remaining.area - inter)
            key = (-iou, extract_area(e), e.id)
            if best is None or key < best:
                best = key
        if best is None:
            if not allow_uncovered_geometry:
                raise GeometryNotCoveredError(
                    "Couldn't find extracts covering given geometry."
                    " If it's expected behaviour, you can suppress this error by"
                    " passing the `allow_uncovered_geometry=True` argument."
                )
            warnings.warn(
                "Couldn't find extracts covering given geometry.",
                GeometryNotCoveredWarning,
                stacklevel=0,
            )
            break
        neg_iou, _area, best_id = best
        remaining = remaining.difference(
            rasters(next(e for e in index if e.id == best_id))
        )
        checked_ids.append(best_id)
        ious.append(-neg_iou)
    return checked_ids, ious


def find_smallest_containing_extracts(
    geometry: Geometry,
    index: Sequence[OpenStreetMapExtract],
    geometry_coverage_iou_threshold: float = 0.01,
    allow_uncovered_geometry: bool = False,
    resolution: int = DEFAULT_RASTER_RESOLUTION,
    excluded_extracts_ids: Optional[set[str]] = None,
) -> set[str]:
    """Select extract ids covering the geometry; discard low-IoU picks
    (except the first) with a warning. ``excluded_extracts_ids`` removes
    known-unavailable extracts before the search (the download retry loop's
    recalculation hook — reference osm_extracts/__init__.py:525-553)."""
    if not 0 <= geometry_coverage_iou_threshold <= 1:
        raise ValueError(
            "geometry_coverage_iou_threshold is outside required bounds [0, 1]"
        )
    if excluded_extracts_ids:
        index = [e for e in index if e.id not in excluded_extracts_ids]
    checked_ids, ious = _cover_geometry_with_extracts(
        geometry, index, allow_uncovered_geometry, resolution
    )
    selected: set[str] = set()
    by_id = {e.id: e for e in index}
    for extract_id, iou in zip(checked_ids, ious):
        if iou >= geometry_coverage_iou_threshold or not selected:
            selected.add(extract_id)
        else:
            warnings.warn(
                "Skipping extract because of low IoU value "
                f"({by_id[extract_id].file_name}, {iou:.3g}).",
                GeometryNotCoveredWarning,
                stacklevel=0,
            )
    return selected


def filter_extracts(
    geometry: Geometry,
    extracts_ids: Iterable[str],
    index: Sequence[OpenStreetMapExtract],
    resolution: int = DEFAULT_RASTER_RESOLUTION,
) -> list[OpenStreetMapExtract]:
    """Overlap removal + redundancy simplification.

    Biggest-first keep-if-adds-coverage (reference
    `_filter_extracts_for_single_geometry`), then drop any extract whose
    geometry is covered by the union of the others
    (`_simplify_selected_extracts`)."""
    ids = set(extracts_ids)
    candidates = sorted(
        (e for e in index if e.id in ids), key=lambda e: (extract_area(e), e.id), reverse=True
    )
    grid = _working_grid(geometry, candidates, resolution)
    remaining = grid.rasterize(geometry)
    rasters = {e.id: grid.rasterize(e.geometry) for e in candidates}

    kept: set[str] = set()
    for e in candidates:
        if remaining.is_empty:
            break
        r = rasters[e.id]
        if not r.intersects(remaining):
            continue
        remaining = remaining.difference(r)
        kept.add(e.id)

    # redundancy simplification: remove extracts fully covered by the union
    # of the other kept ones (within the working grid)
    simplified = set(kept)
    changed = True
    while changed:
        changed = False
        for extract_id in sorted(simplified):
            others = [rasters[o] for o in simplified if o != extract_id]
            if not others:
                continue
            union = others[0]
            for o in others[1:]:
                union = union.union_(o)
            own = rasters[extract_id]
            # compare only within the query area — the grid doesn't extend
            # beyond it, matching what coverage means for the selection
            if own.mask.any() and own.covered_by(union):
                simplified.remove(extract_id)
                changed = True
                break

    return sorted(
        (e for e in candidates if e.id in simplified), key=lambda e: (-extract_area(e), e.id)
    )


def find_extracts_for_geometry(
    geometry: Geometry,
    index: Sequence[OpenStreetMapExtract],
    geometry_coverage_iou_threshold: float = 0.01,
    allow_uncovered_geometry: bool = False,
    resolution: int = DEFAULT_RASTER_RESOLUTION,
) -> list[OpenStreetMapExtract]:
    """The full C13 composite: greedy IoU cover → overlap filter → simplify."""
    selected = find_smallest_containing_extracts(
        geometry,
        index,
        geometry_coverage_iou_threshold=geometry_coverage_iou_threshold,
        allow_uncovered_geometry=allow_uncovered_geometry,
        resolution=resolution,
    )
    return filter_extracts(geometry, selected, index, resolution=resolution)


# --------------------------------------------------------------------------
# download (injectable fetcher; live path gated on connectivity)
# --------------------------------------------------------------------------

def _default_pbf_fetcher(url: str) -> Optional[bytes]:
    """Live HTTP fetch (unused in the offline build's tests): bytes on
    success, None on HTTP 404 — the 'unavailable' signal the retry loops
    react to."""
    import urllib.error
    import urllib.request

    req = urllib.request.Request(
        url, headers={"User-Agent": "quackosm-spark (PySpark analytics engine)"}
    )
    try:
        with urllib.request.urlopen(req, timeout=60) as resp:
            return resp.read()
    except urllib.error.HTTPError as e:
        if e.code == 404:
            return None
        raise


def download_extract(
    extract: OpenStreetMapExtract,
    download_directory: str | Path = "files",
    fetcher: Any = None,
) -> Optional[Path]:
    """Return the local path of an extract's PBF, downloading if needed.

    ``fetcher(url) -> bytes | None`` is injectable (None = 404/unavailable,
    mirroring reference osm_extracts/__init__.py download semantics); the
    default is a urllib fetch, which in this offline build only resolves
    pre-existing local files."""
    target = Path(download_directory) / f"{extract.file_name}.osm.pbf"
    if target.exists():
        return target
    fetcher = fetcher or _default_pbf_fetcher
    payload = fetcher(extract.url)
    if payload is None:
        return None
    target.parent.mkdir(parents=True, exist_ok=True)
    target.write_bytes(payload)
    return target


def download_extracts_pbf_files(
    extracts: Iterable[OpenStreetMapExtract],
    download_directory: str | Path = "files",
    fetcher: Any = None,
    ignore_unavailable: bool = False,
) -> tuple[list[tuple[OpenStreetMapExtract, Path]], list[OpenStreetMapExtract]]:
    """Download a batch; returns (downloaded pairs, unavailable extracts).
    With ``ignore_unavailable=False`` a 404 raises immediately (reference
    `_download_extracts_pbf_files` semantics)."""
    downloaded: list[tuple[OpenStreetMapExtract, Path]] = []
    unavailable: list[OpenStreetMapExtract] = []
    for extract in extracts:
        path = download_extract(extract, download_directory, fetcher=fetcher)
        if path is None:
            if not ignore_unavailable:
                raise OsmExtractsUnavailableError(
                    f'Extract "{extract.file_name}" is unavailable for download.',
                    matching_full_names=[extract.file_name],
                )
            unavailable.append(extract)
        else:
            downloaded.append((extract, path))
    return downloaded, unavailable


def download_extract_by_query(
    query: str,
    index: Sequence[OpenStreetMapExtract],
    download_directory: str | Path = "files",
    select_first_match: bool = True,
    fetcher: Any = None,
) -> Path:
    """Query → download with the reference's 404-retry loop: an unavailable
    match is excluded and the query re-resolved against the remaining
    extracts; when every match was excluded this way the error reports an
    availability problem, not a zero-match query (reference
    osm_extracts/__init__.py:440-482)."""
    excluded_extracts_ids: set[str] = set()
    unavailable_file_names: list[str] = []
    while True:
        try:
            matching = get_extract_by_query(
                query,
                index,
                select_first_match=select_first_match,
                excluded_extracts_ids=excluded_extracts_ids,
            )
        except OsmExtractZeroMatchesError:
            if not unavailable_file_names:
                raise
            raise OsmExtractsUnavailableError(
                f'All extracts matching query "{query.strip()}" are unavailable'
                f" for download ({', '.join(unavailable_file_names)})."
                " Check your internet connection or try a different source.",
                matching_full_names=sorted(unavailable_file_names),
            ) from None
        downloaded, unavailable = download_extracts_pbf_files(
            [matching], download_directory, fetcher=fetcher, ignore_unavailable=True
        )
        if not unavailable:
            return downloaded[0][1]
        warnings.warn(
            f'Matched extract "{matching.file_name}" is unavailable.'
            " Excluding it and trying the next matching extract.",
            OsmExtractUnavailableWarning,
            stacklevel=0,
        )
        excluded_extracts_ids.add(matching.id)
        unavailable_file_names.append(matching.file_name)


def find_and_download_extracts_pbf_files(
    geometry: Geometry,
    index: Sequence[OpenStreetMapExtract],
    download_directory: str | Path = "files",
    geometry_coverage_iou_threshold: float = 0.01,
    allow_uncovered_geometry: bool = False,
    resolution: int = DEFAULT_RASTER_RESOLUTION,
    fetcher: Any = None,
) -> list[tuple[OpenStreetMapExtract, Path]]:
    """Coverage search → download, recalculating the coverage without any
    extract that turns out unavailable until a fully downloadable set is
    found (reference osm_extracts/__init__.py:485-553)."""
    excluded_extracts_ids: set[str] = set()
    by_id = {e.id: e for e in index}
    while True:
        selected_ids = find_smallest_containing_extracts(
            geometry,
            index,
            geometry_coverage_iou_threshold=geometry_coverage_iou_threshold,
            allow_uncovered_geometry=allow_uncovered_geometry,
            resolution=resolution,
            excluded_extracts_ids=excluded_extracts_ids,
        )
        matching = filter_extracts(
            geometry, selected_ids, [by_id[i] for i in selected_ids],
            resolution=resolution,
        )
        downloaded, unavailable = download_extracts_pbf_files(
            matching, download_directory, fetcher=fetcher, ignore_unavailable=True
        )
        if not unavailable:
            return downloaded
        names = ", ".join(e.file_name for e in unavailable)
        warnings.warn(
            "Some matching extracts are unavailable and will be excluded from"
            f" the search ({names}). Recalculating the coverage without them.",
            OsmExtractUnavailableWarning,
            stacklevel=0,
        )
        excluded_extracts_ids.update(e.id for e in unavailable)


def display_available_extracts(
    extracts: Iterable[OpenStreetMapExtract],
    use_full_names: bool = True,
    file: Any = None,
) -> None:
    """Print the extract index as a parent/child tree (reference
    osm_extracts/__init__.py:556-586, minus the rich dependency — plain
    indented text to ``file``/stdout). ``use_full_names`` shows
    ``file_name`` (which encodes the full parent path) instead of the bare
    ``name``."""
    items = list(extracts)
    by_parent: dict[str, list[OpenStreetMapExtract]] = {}
    ids = {e.id for e in items}
    for e in items:
        # roots: no parent, or a parent outside the index (provider name)
        key = e.parent if e.parent in ids else ""
        by_parent.setdefault(key, []).append(e)

    def _walk(parent_key: str, depth: int) -> None:
        for e in sorted(by_parent.get(parent_key, ()), key=lambda x: x.name):
            label = e.file_name if use_full_names else e.name
            print("  " * depth + label, file=file)
            _walk(e.id, depth + 1)

    _walk("", 0)
