"""Distributed spatial join: points-in-polygons at scale.

The reference's geometry filter clips one dataset against ONE query
polygon (filters/geometry.py); analytics over geo data also needs the
JOIN form — millions of points against a polygon TABLE (geofencing,
admin-area enrichment, POI containment). Neither side may be collected
or broadcast wholesale at 100 TB, so the join is grid-bucketed:

1. every point maps to its slippy tile at ``zoom`` (scan-stage Column
   arithmetic, geometry/tiles.py);
2. every polygon explodes to the tiles covering its bbox (completeness:
   a containing polygon's bbox contains the point, so they share the
   point's tile);
3. equi-join on the tile key co-locates candidates — pair blowup is
   bounded by per-tile densities, never |points| × |polygons|;
4. an exact vectorized ray-cast refine (geometry/ops.points_in_ring)
   keeps true containments only.

A point lies in exactly one tile, so no post-join dedup shuffle exists.
``zoom`` trades explode fan-out (large polygons cover many tiles) against
candidate density (coarse tiles pack unrelated points and polygons
together); ``max_cells_per_polygon`` fails loud instead of silently
exploding a continent-sized polygon into millions of rows. Polygons
spanning the antimeridian are out of contract (split them first).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quackosm_spark.geometry.tiles import tile_x, tile_y


def _cell(cx: Column, cy: Column, zoom: int) -> Column:
    return (cx * (1 << zoom) + cy).cast("bigint")


def points_in_polygons_join(
    points: DataFrame,
    polygons: DataFrame,
    zoom: int = 8,
    point_id: str = "point_id",
    lon_col: str = "lon",
    lat_col: str = "lat",
    poly_id: str = "poly_id",
    ring_col: str = "ring",
    max_cells_per_polygon: int = 4096,
) -> DataFrame:
    """Join ``points`` (id, lon, lat) against ``polygons`` (id, ring:
    array<struct<x,y>>): returns (point_id, poly_id) for every point
    contained in a polygon ring under the even-odd ray cast. Boundary
    points follow the ray cast's crossing convention (e.g. for an
    axis-aligned box: bottom/left edges and all corners count as inside,
    top/right edges as outside) — don't rely on exact-boundary behavior;
    keep data off polygon edges if edge points matter."""
    pts = points.select(
        F.col(point_id).alias("point_id"),
        F.col(lon_col).alias("x"),
        F.col(lat_col).alias("y"),
        _cell(
            tile_x(F.col(lon_col), zoom), tile_y(F.col(lat_col), zoom), zoom
        ).alias("cell"),
    )
    ring = F.col(ring_col)
    xs = F.transform(ring, lambda p: p["x"])
    ys = F.transform(ring, lambda p: p["y"])
    polys = polygons.select(
        F.col(poly_id).alias("poly_id"),
        ring.alias("ring"),
        tile_x(F.array_min(xs), zoom).alias("cx0"),
        tile_x(F.array_max(xs), zoom).alias("cx1"),
        # y tiles grow downward: max lat → min ytile
        tile_y(F.array_max(ys), zoom).alias("cy0"),
        tile_y(F.array_min(ys), zoom).alias("cy1"),
    )
    n_cells = (F.col("cx1") - F.col("cx0") + 1) * (
        F.col("cy1") - F.col("cy0") + 1
    )
    # lazy fail-loud guard: assert_true rides the scan that the join
    # itself executes, so the polygon table is read ONCE, at action time
    # (an eager .collect() probe here would double the polygon-side I/O
    # and fire even when the result is never acted on). Wrapping cx0
    # keeps the assertion alive through column pruning.
    guarded_cx0 = F.when(
        F.assert_true(
            n_cells <= max_cells_per_polygon,
            F.concat(
                F.lit("points_in_polygons_join: polygon "),
                F.col("poly_id").cast("string"),
                F.lit(
                    f" covers more than {max_cells_per_polygon} tiles at "
                    f"zoom {zoom}; lower the zoom or raise "
                    f"max_cells_per_polygon"
                ),
            ),
        ).isNull(),
        F.col("cx0"),
    )
    covered = (
        polys.select(
            "poly_id",
            F.explode(F.sequence(guarded_cx0, F.col("cx1"))).alias("cx"),
            F.col("cy0"),
            F.col("cy1"),
        )
        .select(
            "poly_id",
            "cx",
            F.explode(F.sequence(F.col("cy0"), F.col("cy1"))).alias("cy"),
        )
        .select(
            "poly_id",
            _cell(F.col("cx"), F.col("cy"), zoom).alias("cell"),
        )
    )
    # candidates stay RING-FREE through the cell equi-join: the coverage
    # explode fans a polygon out to up to max_cells_per_polygon rows, and
    # a dense tile fans each cell row out to its point count — shipping
    # the K-vertex ring on every one of those rows inflates the candidate
    # shuffle by O(K) for data the refine stage can re-attach from the
    # (tiny, one-row-per-polygon) ring table keyed on poly_id. The ring
    # join happens AFTER the big shuffle, so each ring moves once per
    # polygon (broadcast/co-keyed), not once per candidate.
    candidates = pts.join(covered, "cell").select(
        "point_id", "x", "y", "poly_id"
    )
    ring_tbl = polygons.select(
        F.col(poly_id).alias("poly_id"), ring.alias("ring")
    )
    refine_in = candidates.join(ring_tbl, "poly_id")

    @F.pandas_udf("boolean")
    def _contains(
        x: pd.Series, y: pd.Series, poly: pd.Series, rings: pd.Series
    ) -> pd.Series:
        from quackosm_spark.geometry.ops import points_in_ring

        out = np.zeros(len(x), dtype=bool)
        xv = x.to_numpy(dtype=np.float64)
        yv = y.to_numpy(dtype=np.float64)
        # group the Arrow batch by polygon: build each ring ndarray ONCE
        # and ray-cast all of that polygon's candidate points in one
        # vectorized call (a dense tile would otherwise rebuild the
        # K-vertex ring and test point-by-point, O(N*K) Python per batch)
        for _, idx in (
            pd.Series(range(len(poly))).groupby(poly.to_numpy()).groups.items()
        ):
            ii = np.asarray(idx, dtype=np.int64)
            r = rings.iloc[ii[0]]
            arr = np.asarray(
                [[p["x"], p["y"]] for p in r], dtype=np.float64
            )
            if arr.shape[0] < 3:
                continue
            out[ii] = points_in_ring(xv[ii], yv[ii], arr)
        return pd.Series(out)

    return refine_in.where(
        _contains(F.col("x"), F.col("y"), F.col("poly_id"), F.col("ring"))
    ).select("point_id", "poly_id")
