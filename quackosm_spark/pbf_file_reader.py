"""`PbfFileReader` — class-style API mirroring the reference's primary
entry point (reference quackosm/pbf_file_reader.py:164-341: constructor
holds the filters; convert methods take the files).

A thin facade over `quackosm_spark.functions`; exists so code written
against the reference's object API ports by changing the import and adding
a SparkSession.
"""

from __future__ import annotations

from pathlib import Path
from typing import Any, Optional, Sequence, Union

from pyspark.sql import DataFrame, SparkSession

from quackosm_spark import functions as _fn

Geometry = dict[str, Any]


class PbfFileReader:
    def __init__(
        self,
        spark: Optional[SparkSession] = None,
        *,
        tags_filter: Optional[Any] = None,
        geometry_filter: Optional[Geometry] = None,
        custom_sql_filter: Optional[str] = None,
        working_directory: Union[str, Path] = "files",
        osm_way_polygon_features_config: Optional[dict[str, Any]] = None,
        ignore_metadata_tags: bool = True,
    ) -> None:
        if spark is None:
            from quackosm_spark.session import get_spark

            spark = get_spark()
        from quackosm_spark.filters.geometry import validate_geometry_filter

        # non-polygonal filters are rejected at construction, matching the
        # reference's InvalidGeometryFilter (tests/base/
        # test_pbf_file_reader.py:491-495)
        validate_geometry_filter(geometry_filter)
        self.spark = spark
        self.tags_filter = tags_filter
        self.geometry_filter = geometry_filter
        self.custom_sql_filter = custom_sql_filter
        self.working_directory = working_directory
        self.osm_way_polygon_features_config = osm_way_polygon_features_config
        self.ignore_metadata_tags = ignore_metadata_tags

    def _common(self, **overrides: Any) -> dict[str, Any]:
        kwargs: dict[str, Any] = dict(
            tags_filter=self.tags_filter,
            geometry_filter=self.geometry_filter,
            custom_sql_filter=self.custom_sql_filter,
            ignore_metadata_tags=self.ignore_metadata_tags,
        )
        kwargs.update(overrides)
        return kwargs

    def convert_pbf_to_dataframe(
        self, pbf_path: Union[str, Path, Sequence[Union[str, Path]]], **kw: Any
    ) -> DataFrame:
        return _fn.convert_pbf_to_dataframe(
            self.spark,
            pbf_path,
            osm_way_polygon_features_config=self.osm_way_polygon_features_config,
            **self._common(**kw),
        )

    def convert_pbf_to_parquet(
        self, pbf_path: Union[str, Path, Sequence[Union[str, Path]]], **kw: Any
    ) -> Path:
        kw.setdefault("working_directory", self.working_directory)
        return _fn.convert_pbf_to_parquet(self.spark, pbf_path, **self._common(**kw))

    def convert_pbf_to_duckdb(
        self, pbf_path: Union[str, Path, Sequence[Union[str, Path]]], **kw: Any
    ) -> Path:
        kw.setdefault("working_directory", self.working_directory)
        return _fn.convert_pbf_to_duckdb(self.spark, pbf_path, **self._common(**kw))

    def convert_pbf_to_geodataframe(
        self, pbf_path: Union[str, Path, Sequence[Union[str, Path]]], **kw: Any
    ):
        return _fn.convert_pbf_to_geodataframe(
            self.spark, pbf_path, **self._common(**kw)
        )

    def _geometry_common(self, kw: dict[str, Any]) -> dict[str, Any]:
        if self.geometry_filter is None:
            raise ValueError(
                "PbfFileReader requires a geometry_filter for geometry-driven"
                " conversion."
            )
        common = self._common(**kw)
        common.pop("geometry_filter", None)
        return common

    def convert_geometry_to_parquet(
        self, extracts_index: Sequence[Any], **kw: Any
    ) -> Path:
        kw.setdefault("working_directory", self.working_directory)
        return _fn.convert_geometry_to_parquet(
            self.spark, self.geometry_filter, extracts_index,
            **self._geometry_common(kw),
        )

    def convert_geometry_to_geodataframe(
        self, extracts_index: Sequence[Any], **kw: Any
    ):
        return _fn.convert_geometry_to_geodataframe(
            self.spark, self.geometry_filter, extracts_index,
            **self._geometry_common(kw),
        )

    def convert_geometry_to_duckdb(
        self, extracts_index: Sequence[Any], **kw: Any
    ) -> Path:
        kw.setdefault("working_directory", self.working_directory)
        return _fn.convert_geometry_to_duckdb(
            self.spark, self.geometry_filter, extracts_index,
            **self._geometry_common(kw),
        )
