"""Geometry filtering: cheap bbox Column prefilter + exact point-in-polygon.

Two-stage shape is the reference's (pbf_file_reader.py:1756-1775 bbox, then
exact STRtree intersection in _intersection.py:14-55):

1. ``bbox_prefilter`` is a plain Column predicate — pushdown-friendly, reaches
   the parquet scan as a min/max row-group filter.
2. ``compile_point_in_polygon`` returns an Arrow-vectorized pandas UDF doing
   numpy ray casting against the (small, task-serialized) filter polygon —
   the Spark replacement for the reference's multiprocessing STRtree pool.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from quackosm_spark.geometry import model
from quackosm_spark.geometry.ops import points_in_multipolygon

Geometry = dict[str, Any]


def normalize_to_polygons(geom: Geometry) -> list[list[list[list[float]]]]:
    """Any polygonal geometry → list of polygons ([outer, *holes])."""
    t = geom["type"]
    if t == "Polygon":
        return [geom["coordinates"]]
    if t == "MultiPolygon":
        return list(geom["coordinates"])
    if t == "GeometryCollection":
        out: list[list[list[list[float]]]] = []
        for g in geom["geometries"]:
            out.extend(normalize_to_polygons(g))
        return out
    raise ValueError(
        f"Geometry filter must be polygonal (zero-area {t} given) — matches the"
        " reference's rejection of Point/LineString filters"
        " (pbf_file_reader.py:1383-1400)."
    )


def validate_geometry_filter(geom: Geometry | None) -> None:
    if geom is not None:
        normalize_to_polygons(geom)


def bbox_prefilter(
    geom: Geometry, lon_col: str = "lon", lat_col: str = "lat"
) -> Column:
    minx, miny, maxx, maxy = model.bounds(geom)
    return F.col(lon_col).between(minx, maxx) & F.col(lat_col).between(miny, maxy)


def compile_point_in_polygon(
    geom: Geometry, lon_col: str = "lon", lat_col: str = "lat"
) -> Column:
    """Exact containment test as an Arrow-vectorized pandas UDF Column.

    The polygon coordinates are captured in the UDF closure (serialized once
    per task). Filter polygons are driver-side query parameters — a few KB to
    a few MB — so closure capture beats a broadcast round-trip; switch to
    ``SparkContext.broadcast`` if a filter ever exceeds tens of MB.
    """
    polygons = [
        [[list(map(float, pt)) for pt in ring] for ring in poly]
        for poly in normalize_to_polygons(geom)
    ]

    @F.pandas_udf(BooleanType())
    def _contains(lon: pd.Series, lat: pd.Series) -> pd.Series:
        xs = lon.to_numpy(dtype=np.float64, na_value=np.nan)
        ys = lat.to_numpy(dtype=np.float64, na_value=np.nan)
        mask = points_in_multipolygon(xs, ys, polygons)
        mask &= ~(np.isnan(xs) | np.isnan(ys))
        return pd.Series(mask)

    return _contains(F.col(lon_col), F.col(lat_col))
