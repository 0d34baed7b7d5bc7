from quackosm_spark.sources.pbf import (
    ELEMENTS_SCHEMA,
    OsmPbfDataSource,
    read_osm_pbf,
    register_pbf_source,
)
from quackosm_spark.sources.osm_xml import parse_osm_xml, read_osm_xml

__all__ = [
    "ELEMENTS_SCHEMA",
    "OsmPbfDataSource",
    "parse_osm_xml",
    "read_osm_pbf",
    "read_osm_xml",
    "register_pbf_source",
]
