"""Slippy-map (OSM XYZ) tile indexing as pure Column arithmetic.

The Web-Mercator tiling OSM itself serves tiles in: zoom z splits the
world into 2^z × 2^z tiles; ``xtile = ⌊(lon+180)/360·2^z⌋``,
``ytile = ⌊(1 − asinh(tan φ)/π)/2·2^z⌋``. Completes the reference's
geocode/index parser family (cli.py geometry filters accept geohash/H3/S2;
geohash is implemented in geometry/geohash.py, H3/S2 remain lib-gated) with
the tiling that is fully expressible JVM-side AND in ANSI SQL — so it
carries a real DuckDB oracle (q85) where H3's icosahedral projection
could not.

All functions are whole-stage-codegen Column expressions: tile assignment
is a scan-stage projection at any scale, and tile ids are the natural
partition/bucket keys for spatially co-located joins.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Web-Mercator latitude clamp: |φ| ≤ atan(sinh(π))
MAX_LAT = 85.05112878


def _clamp_lat(lat: Column) -> Column:
    return F.least(F.lit(MAX_LAT), F.greatest(F.lit(-MAX_LAT), lat))


def tile_x(lon: Column, zoom: int) -> Column:
    """X tile index at ``zoom`` (clamped into [0, 2^z − 1])."""
    n = 1 << zoom
    raw = F.floor((lon + 180.0) / 360.0 * n).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw))


def tile_y(lat: Column, zoom: int) -> Column:
    """Y tile index at ``zoom`` (Mercator; asinh(tan φ) = ln(tan φ + sec φ)
    so the same closed form runs in engines without asinh)."""
    n = 1 << zoom
    phi = F.radians(_clamp_lat(lat))
    merc = F.log(F.tan(phi) + 1.0 / F.cos(phi))
    raw = F.floor((1.0 - merc / F.lit(3.141592653589793)) / 2.0 * n).cast("long")
    return F.least(F.lit(n - 1), F.greatest(F.lit(0), raw))


def quadkey(lon: Column, lat: Column, zoom: int) -> Column:
    """Bing-style quadkey string: digit i = 2·ybit + xbit at level i —
    prefix-matching quadkeys nest, so a LIKE 'prefix%' prunes to a tile
    subtree."""
    x = tile_x(lon, zoom)
    y = tile_y(lat, zoom)
    digits = []
    for i in range(1, zoom + 1):
        shift = zoom - i
        digit = (
            F.shiftright(y, shift).bitwiseAND(F.lit(1)) * 2
            + F.shiftright(x, shift).bitwiseAND(F.lit(1))
        )
        digits.append(digit.cast("string"))
    return F.concat(*digits)


def tile_bounds(xtile: Column, ytile: Column, zoom: int) -> Column:
    """(min_lon, min_lat, max_lon, max_lat) struct of a tile — the inverse
    transform, for windowed reads against bbox-covered GeoParquet."""
    n = float(1 << zoom)
    min_lon = xtile.cast("double") / n * 360.0 - 180.0
    max_lon = (xtile.cast("double") + 1.0) / n * 360.0 - 180.0

    def _lat(yt: Column) -> Column:
        merc = F.lit(3.141592653589793) * (1.0 - 2.0 * yt.cast("double") / n)
        # atan(sinh(m))
        return F.degrees(F.atan((F.exp(merc) - F.exp(-merc)) / 2.0))

    return F.struct(
        min_lon.alias("min_lon"),
        _lat(ytile.cast("double") + 1.0).alias("min_lat"),
        max_lon.alias("max_lon"),
        _lat(ytile.cast("double")).alias("max_lat"),
    )
