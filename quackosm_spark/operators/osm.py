"""OSM corpus statistics over the raw elements table — the exploratory
queries an OSM analyst runs before filtering (taginfo-style key/value
histograms, per-kind profiles). All plain grouped aggregations with partial
(map-side) combine; nothing here shuffles more than (key, count) pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def kind_counts(elements: DataFrame) -> DataFrame:
    """Elements per kind, tagged vs untagged."""
    return (
        elements.groupBy("kind")
        .agg(
            F.count("*").alias("n"),
            F.sum(
                F.when(
                    F.col("tags").isNotNull() & (F.size(F.map_keys("tags")) > 0), 1
                ).otherwise(0)
            ).alias("n_tagged"),
        )
    )


def tag_key_histogram(elements: DataFrame, top: int | None = None) -> DataFrame:
    """Distinct-element usage count per tag key (taginfo 'keys' view)."""
    out = (
        elements.where(F.col("tags").isNotNull())
        .select(F.explode(F.map_keys("tags")).alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("n_elements"))
        .orderBy(F.desc("n_elements"), F.asc("key"))
    )
    return out.limit(top) if top else out


def tag_value_histogram(
    elements: DataFrame, key: str, top: int | None = None
) -> DataFrame:
    """Value distribution for one tag key (taginfo 'values' view)."""
    out = (
        elements.where(F.col("tags").isNotNull())
        .select(F.col("tags")[key].alias("value"))
        .where(F.col("value").isNotNull())
        .groupBy("value")
        .agg(F.count("*").alias("n_elements"))
        .orderBy(F.desc("n_elements"), F.asc("value"))
    )
    return out.limit(top) if top else out


def way_length_histogram(elements: DataFrame) -> DataFrame:
    """Distribution of way ref counts (skew diagnosis for the J4 join)."""
    return (
        elements.where(F.col("kind") == "way")
        .select(F.size("refs").alias("n_refs"))
        .groupBy("n_refs")
        .count()
        .orderBy("n_refs")
    )
