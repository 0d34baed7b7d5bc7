"""Tag-filter algebra + compilation semantics.

Mirrors the reference's tests/base/test_osm_tags_filtering.py coverage:
merge rules (conflicts, True-absorption, list accumulation), positivity,
wildcard value/key handling, and metadata-tag stripping.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackosm_spark.filters.tags import (
    compile_tags_filter,
    expand_wildcard_keys,
    has_positive_clause,
    merge_osm_tags_filter,
    star_to_like_pattern,
    strip_metadata_tags,
)


# ---------------------------------------------------------------- merge rules

def test_merge_flat_passthrough():
    f = {"building": True, "amenity": ["cafe", "bar"]}
    assert merge_osm_tags_filter(f) == f


def test_merge_grouped_flattens():
    merged = merge_osm_tags_filter(
        {"g1": {"building": True}, "g2": {"amenity": "cafe"}}
    )
    assert merged == {"building": True, "amenity": ["cafe"]}


def test_merge_true_absorbs_values():
    merged = merge_osm_tags_filter(
        {"g1": {"amenity": "cafe"}, "g2": {"amenity": True}}
    )
    assert merged == {"amenity": True}
    merged = merge_osm_tags_filter(
        {"g1": {"amenity": True}, "g2": {"amenity": "cafe"}}
    )
    assert merged == {"amenity": True}


def test_merge_lists_accumulate_dedup():
    merged = merge_osm_tags_filter(
        {"g1": {"amenity": ["cafe", "bar"]}, "g2": {"amenity": ["bar", "pub"]}}
    )
    assert merged == {"amenity": ["cafe", "bar", "pub"]}


def test_merge_positive_negative_conflict_raises():
    with pytest.raises(ValueError, match="conflict"):
        merge_osm_tags_filter({"g1": {"amenity": True}, "g2": {"amenity": False}})
    with pytest.raises(ValueError, match="conflict"):
        merge_osm_tags_filter({"g1": {"amenity": False}, "g2": {"amenity": "cafe"}})


def test_merge_rejects_malformed():
    with pytest.raises(AttributeError):
        merge_osm_tags_filter({"amenity": 42})  # type: ignore[dict-item]


# ---------------------------------------------------------------- positivity

def test_has_positive_clause():
    assert has_positive_clause({"building": True})
    assert has_positive_clause({"building": "yes"})
    assert not has_positive_clause({"name:*": False})
    assert not has_positive_clause(None)
    assert has_positive_clause({"g": {"building": True}})
    assert not has_positive_clause({"g": {"building": False}})


def test_star_to_like_pattern():
    assert star_to_like_pattern("addr:*") == "addr:%"
    assert star_to_like_pattern("**BRASS") == "%BRASS"
    assert star_to_like_pattern("plain") == "plain"


# ---------------------------------------------------------------- compile

def _tagged(spark, *maps):
    return spark.createDataFrame(
        [(i, m) for i, m in enumerate(maps)], "id: long, tags: map<string,string>"
    )


def test_compile_true_false_value_list(spark):
    df = _tagged(
        spark,
        {"building": "yes"},                      # 0
        {"amenity": "cafe"},                      # 1
        {"amenity": "school"},                    # 2
        {"building": "yes", "name": "x"},         # 3
        {"landuse": "forest"},                    # 4
    )
    got = lambda f: sorted(
        r["id"] for r in df.where(compile_tags_filter(f)).collect()
    )
    assert got({"building": True}) == [0, 3]
    assert got({"amenity": ["cafe", "bar"]}) == [1]
    assert got({"amenity": "school"}) == [2]
    # OR of positives
    assert got({"building": True, "amenity": "cafe"}) == [0, 1, 3]
    # negative clause ANDs: anything without 'name' key
    assert got({"building": True, "name": False}) == [0]
    # pure negative filter: positives vacuously true
    assert got({"name": False}) == [0, 1, 2, 4]


def test_compile_wildcard_value(spark):
    df = _tagged(spark, {"type": "SMALL BRASS"}, {"type": "LARGE COPPER"})
    out = df.where(compile_tags_filter({"type": "*BRASS"})).collect()
    assert [r["id"] for r in out] == [0]


def test_expand_wildcard_keys(spark):
    df = _tagged(
        spark,
        {"name:en": "x", "building": "yes"},
        {"name:fr": "y"},
        {"amenity": "cafe"},
    )
    expanded = expand_wildcard_keys(df, {"name:*": False, "building": True})
    assert expanded == {"building": True, "name:en": False, "name:fr": False}
    # no wildcard → unchanged object
    plain = {"building": True}
    assert expand_wildcard_keys(df, plain) is plain


def test_strip_metadata_tags(spark):
    df = _tagged(
        spark,
        {"building": "yes", "created_by": "JOSM", "openGeoDB:loc": "z"},
        {"amenity": "cafe"},
        {"source": "survey"},
    )
    out = df.select(F.map_keys(strip_metadata_tags("tags")).alias("k")).collect()
    assert sorted(out[0]["k"]) == ["building"]
    assert out[1]["k"] == ["amenity"]
    assert out[2]["k"] == []
