from quackosm_spark.filters.tags import (
    GroupedOsmTagsFilter,
    OsmTagsFilter,
    compile_tags_filter,
    expand_wildcard_keys,
    has_positive_clause,
    merge_osm_tags_filter,
    strip_metadata_tags,
)
from quackosm_spark.filters.geometry import (
    bbox_prefilter,
    compile_point_in_polygon,
)

__all__ = [
    "GroupedOsmTagsFilter",
    "OsmTagsFilter",
    "compile_tags_filter",
    "expand_wildcard_keys",
    "has_positive_clause",
    "merge_osm_tags_filter",
    "strip_metadata_tags",
    "bbox_prefilter",
    "compile_point_in_polygon",
]
