from quackosm_spark.sources.pbf import (
    ELEMENTS_SCHEMA,
    OsmPbfDataSource,
    read_osm_pbf,
    register_pbf_source,
)

__all__ = [
    "ELEMENTS_SCHEMA",
    "OsmPbfDataSource",
    "read_osm_pbf",
    "register_pbf_source",
]
