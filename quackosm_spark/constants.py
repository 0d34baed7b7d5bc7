"""Engine-wide constants.

Mirrors the semantics of the reference's quackosm/_constants.py (values are
public OSM/GDAL conventions, not copied code).
"""

FEATURES_INDEX = "feature_id"

GEOMETRY_COLUMN = "geometry"

WGS84_CRS = "EPSG:4326"

# Tags stripped from output maps because GDAL's OSM driver ignores them
# (reference: quackosm/_constants.py:17-29). The trailing "openGeoDB:" entry is
# a key *prefix*, handled separately.
METADATA_TAGS_TO_IGNORE = [
    "area",
    "created_by",
    "converted_by",
    "source",
    "time",
    "ele",
    "note",
    "todo",
    "fixme",
    "FIXME",
]
METADATA_TAG_PREFIXES_TO_IGNORE = ["openGeoDB:"]

# Coordinates are canonically rounded to 7 decimal places before any geometry
# is constructed (reference: pbf_file_reader.py:4248-4251, 2859, 3058).
COORDINATE_PRECISION = 7
