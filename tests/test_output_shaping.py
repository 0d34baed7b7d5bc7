"""Output shaping (C11): exploded / grouped / compact-relevant modes,
empty-column drop, dedup, spatial sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackosm_spark.geometry import wkb
from quackosm_spark.plans.output import (
    dedup_features,
    drop_empty_columns,
    explode_tags_to_columns,
    group_tags_to_columns,
    keep_relevant_tags,
    spatial_sort,
)


def _features_df(spark):
    pt = lambda x, y: wkb.dumps({"type": "Point", "coordinates": [x, y]})
    rows = [
        ("node/1", {"amenity": "cafe", "name": "A"}, pt(0.1, 0.1)),
        ("node/2", {"building": "yes"}, pt(0.9, 0.9)),
        ("node/3", {"amenity": "bar", "building": "hut"}, pt(0.5, 0.5)),
    ]
    return spark.createDataFrame(
        rows, "feature_id: string, tags: map<string,string>, geometry: binary"
    )


def test_explode_with_filter_keys(spark):
    df = _features_df(spark)
    out = explode_tags_to_columns(df, {"amenity": True, "building": True})
    assert out.columns == ["feature_id", "amenity", "building", "geometry"]
    got = {r["feature_id"]: (r["amenity"], r["building"]) for r in out.collect()}
    assert got["node/1"] == ("cafe", None)
    assert got["node/2"] == (None, "yes")
    assert got["node/3"] == ("bar", "hut")


def test_explode_discovers_keys_from_data(spark):
    df = _features_df(spark)
    out = explode_tags_to_columns(df, None)
    assert out.columns == ["feature_id", "amenity", "building", "name", "geometry"]


def test_grouped_mode_first_match_wins(spark):
    df = _features_df(spark)
    grouped = {"food": {"amenity": ["cafe", "bar"]}, "built": {"building": True}}
    out = group_tags_to_columns(df, grouped)
    # group columns come out name-sorted (reference pbf_file_reader.py:3850)
    assert out.columns == ["feature_id", "built", "food", "geometry"]
    got = {r["feature_id"]: (r["food"], r["built"]) for r in out.collect()}
    assert got["node/1"] == ("amenity=cafe", None)
    assert got["node/2"] == (None, "building=yes")
    assert got["node/3"] == ("amenity=bar", "building=hut")


def test_keep_relevant_tags(spark):
    df = _features_df(spark)
    out = keep_relevant_tags(df, {"amenity": True})
    got = {r["feature_id"]: dict(r["tags"]) for r in out.collect()}
    assert got == {"node/1": {"amenity": "cafe"}, "node/3": {"amenity": "bar"}}


def test_drop_empty_columns(spark):
    df = _features_df(spark)
    out = explode_tags_to_columns(df, {"amenity": True, "landuse": True})
    dropped = drop_empty_columns(out)
    assert dropped.columns == ["feature_id", "amenity", "geometry"]


def test_dedup_features(spark):
    df = _features_df(spark)
    doubled = df.union(df)
    assert dedup_features(doubled).count() == 3


def test_spatial_sort_preserves_rows(spark):
    df = _features_df(spark)
    out = spatial_sort(df)
    assert sorted(r["feature_id"] for r in out.collect()) == [
        "node/1", "node/2", "node/3",
    ]
    assert out.columns == df.columns
