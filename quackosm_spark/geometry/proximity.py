"""Grid-blocked proximity self-join: all point pairs within a radius,
without the O(n²) cross join.

Each point lands in one grid cell of side >= radius; any pair within the
radius is then either in the same cell or in horizontally/vertically/
diagonally adjacent cells, so joining each point against its 3x3 cell
neighborhood is COMPLETE — the exact distance predicate on those
candidates makes the result identical to the brute-force join (the oracle
asserts exactly that). One side explodes its 9 neighbor cells (9x row
inflation, map-side); the join shuffles on the cell key only.

Distances are planar on degrees (deterministic arithmetic, engine-portable)
— the blocking pattern is coordinate-system agnostic; swap the predicate
for haversine/projected metres as needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def near_pairs(
    points: DataFrame,
    radius: float,
    id_col: str = "id",
    lat_col: str = "lat",
    lon_col: str = "lon",
) -> DataFrame:
    """All unordered pairs with planar degree distance <= radius.
    Returns (id_a, id_b, dist)."""
    if radius <= 0:
        raise ValueError("radius must be positive")
    p = points.select(
        F.col(id_col).alias("id"),
        F.col(lat_col).cast("double").alias("lat"),
        F.col(lon_col).cast("double").alias("lon"),
        F.floor(F.col(lat_col) / radius).cast("long").alias("cy"),
        F.floor(F.col(lon_col) / radius).cast("long").alias("cx"),
    )
    offsets = [(dx, dy) for dx in (-1, 0, 1) for dy in (-1, 0, 1)]
    probe = p.select(
        "id", "lat", "lon",
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("cx") + dx).alias("cx"),
                        (F.col("cy") + dy).alias("cy"),
                    )
                    for dx, dy in offsets
                ]
            )
        ).alias("c"),
    ).select("id", "lat", "lon", F.col("c.cx").alias("cx"), F.col("c.cy").alias("cy"))
    d2 = (
        (F.col("a.lat") - F.col("b.lat")) * (F.col("a.lat") - F.col("b.lat"))
        + (F.col("a.lon") - F.col("b.lon")) * (F.col("a.lon") - F.col("b.lon"))
    )
    return (
        probe.alias("a")
        .join(
            p.alias("b"),
            (F.col("a.cx") == F.col("b.cx"))
            & (F.col("a.cy") == F.col("b.cy"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .where(d2 <= F.lit(radius * radius))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.round(F.sqrt(d2), 6).alias("dist"),
        )
    )
