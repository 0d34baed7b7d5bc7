"""Geocoding: free-text query → geometry via the public Nominatim API
(reference quackosm/geocode.py delegates to rq_geo_toolkit.geocode).

Driver-side, network-dependent — in an offline environment the HTTP call
fails with a clear error; the request/parse logic is real and exercised by
tests through a injectable fetcher.
"""

from __future__ import annotations

import json
from typing import Any, Callable, Optional

Geometry = dict[str, Any]

NOMINATIM_URL = "https://nominatim.openstreetmap.org/search"
USER_AGENT = "quackosm-spark (PySpark OSM engine)"


def _default_fetch(query: str) -> list[dict[str, Any]]:
    from urllib.parse import urlencode
    from urllib.request import Request, urlopen

    url = f"{NOMINATIM_URL}?{urlencode({'q': query, 'format': 'json', 'polygon_geojson': 1})}"
    req = Request(url, headers={"User-Agent": USER_AGENT})  # noqa: S310
    with urlopen(req, timeout=30) as resp:  # noqa: S310
        return json.loads(resp.read().decode("utf-8"))


def geocode_to_geometry(
    query: str,
    fetch: Optional[Callable[[str], list[dict[str, Any]]]] = None,
) -> Geometry:
    """Resolve a place query to its (multi)polygon geometry.

    Picks the first result carrying a polygonal ``geojson`` member; falls
    back to the first result's bounding box. Raises ``ValueError`` when
    nothing matches."""
    results = (fetch or _default_fetch)(query)
    if not results:
        raise ValueError(f"Zero results from geocoding for query: {query!r}")
    for r in results:
        gj = r.get("geojson")
        if gj and gj.get("type") in ("Polygon", "MultiPolygon"):
            return gj
    bb = results[0].get("boundingbox")
    if bb:
        miny, maxy, minx, maxx = (float(v) for v in bb)
        return {
            "type": "Polygon",
            "coordinates": [
                [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
            ],
        }
    raise ValueError(f"Geocoding result has no usable geometry for query: {query!r}")
