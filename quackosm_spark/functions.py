"""Top-level conversion API — Spark analogue of quackosm/functions.py.

`convert_pbf_to_dataframe` builds the full lazy plan (scan → C1..C11) and
returns the shaped features DataFrame; `convert_pbf_to_parquet` additionally
writes GeoParquet with content-addressed caching (§1.5) and optional Hilbert
spatial sorting (O3).
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence, Union

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quackosm_spark import cache
from quackosm_spark.filters.tags import merge_osm_tags_filter
from quackosm_spark.plans.pipeline import (
    PbfPipelineOptions,
    build_features,
)
from quackosm_spark.plans.output import (
    dedup_features,
    drop_empty_columns,
    explode_tags_to_columns,
    group_tags_to_columns,
    keep_relevant_tags,
    spatial_sort,
)
from quackosm_spark.sinks.geoparquet import write_geoparquet
from quackosm_spark.sources.pbf import read_osm_pbf

Geometry = dict[str, Any]


def convert_pbf_to_dataframe(
    spark: SparkSession,
    pbf_path: Union[str, Path, Sequence[Union[str, Path]]],
    *,
    tags_filter: Optional[Any] = None,
    keep_all_tags: bool = False,
    explode_tags: Optional[bool] = None,
    geometry_filter: Optional[Geometry] = None,
    custom_sql_filter: Optional[str] = None,
    filter_osm_ids: Sequence[str] = (),
    ignore_metadata_tags: bool = True,
    osm_way_polygon_features_config: Optional[dict[str, Any]] = None,
) -> DataFrame:
    """PBF file(s) → features DataFrame (feature_id, tags…, geometry WKB)."""
    paths = [str(pbf_path)] if isinstance(pbf_path, (str, Path)) else [str(p) for p in pbf_path]
    elements = read_osm_pbf(spark, *paths)
    opts = PbfPipelineOptions(
        tags_filter=tags_filter,
        keep_all_tags=keep_all_tags,
        explode_tags=explode_tags,
        geometry_filter=geometry_filter,
        custom_sql_filter=custom_sql_filter,
        filter_osm_ids=tuple(filter_osm_ids),
        ignore_metadata_tags=ignore_metadata_tags,
        osm_way_polygon_features_config=osm_way_polygon_features_config,
    )
    features = build_features(spark, elements, opts)
    if len(paths) > 1:
        features = dedup_features(features)

    explode = opts.resolve_explode_tags()
    from quackosm_spark.filters.tags import _is_grouped_filter  # noqa: PLC0415

    if tags_filter is not None and _is_grouped_filter(tags_filter):
        shaped = group_tags_to_columns(features, tags_filter)
        return drop_empty_columns(shaped)
    merged = merge_osm_tags_filter(tags_filter) if tags_filter is not None else None
    if explode:
        shaped = explode_tags_to_columns(features, merged, keep_all_tags)
        return drop_empty_columns(shaped)
    if merged and not keep_all_tags:
        features = keep_relevant_tags(features, merged)
    return features


def convert_pbf_to_parquet(
    spark: SparkSession,
    pbf_path: Union[str, Path, Sequence[Union[str, Path]]],
    *,
    result_file_path: Optional[Union[str, Path]] = None,
    working_directory: Union[str, Path] = "files",
    ignore_cache: bool = False,
    sort_result: bool = True,
    save_as_wkt: bool = False,
    tags_filter: Optional[Any] = None,
    keep_all_tags: bool = False,
    explode_tags: Optional[bool] = None,
    geometry_filter: Optional[Geometry] = None,
    custom_sql_filter: Optional[str] = None,
    filter_osm_ids: Sequence[str] = (),
    ignore_metadata_tags: bool = True,
    osm_way_polygon_features_config: Optional[dict[str, Any]] = None,
) -> Path:
    """PBF file(s) → GeoParquet directory; cache-hit short-circuits the run."""
    opts = PbfPipelineOptions(
        tags_filter=tags_filter,
        keep_all_tags=keep_all_tags,
        explode_tags=explode_tags,
        geometry_filter=geometry_filter,
        custom_sql_filter=custom_sql_filter,
        filter_osm_ids=tuple(filter_osm_ids),
        ignore_metadata_tags=ignore_metadata_tags,
    )
    if result_file_path is None:
        result_file_path = cache.result_file_path(
            pbf_path,
            working_directory,
            tags_filter=tags_filter,
            keep_all_tags=keep_all_tags,
            explode_tags=opts.resolve_explode_tags(),
            geometry_filter=geometry_filter,
            custom_sql_filter=custom_sql_filter,
            filter_osm_ids=filter_osm_ids,
            ignore_metadata_tags=ignore_metadata_tags,
            sort_result=sort_result,
            save_as_wkt=save_as_wkt,
        )
    result_file_path = Path(result_file_path)
    if result_file_path.exists() and not ignore_cache:
        return result_file_path

    features = convert_pbf_to_dataframe(
        spark,
        pbf_path,
        tags_filter=tags_filter,
        keep_all_tags=keep_all_tags,
        explode_tags=explode_tags,
        geometry_filter=geometry_filter,
        custom_sql_filter=custom_sql_filter,
        filter_osm_ids=filter_osm_ids,
        ignore_metadata_tags=ignore_metadata_tags,
        osm_way_polygon_features_config=osm_way_polygon_features_config,
    )
    if save_as_wkt:
        from pyspark.sql.types import StringType

        @F.pandas_udf(StringType())
        def _to_wkt(geometry: pd.Series) -> pd.Series:
            from quackosm_spark.geometry import model, wkb

            return pd.Series(
                [model.to_wkt(wkb.loads(bytes(b))) if b is not None else None
                 for b in geometry]
            )

        features = features.withColumn("geometry", _to_wkt("geometry"))
        features.write.mode("overwrite").option("compression", "zstd").parquet(
            str(result_file_path)
        )
        return result_file_path
    if sort_result:
        features = spatial_sort(features)
    write_geoparquet(features, result_file_path)
    return result_file_path
