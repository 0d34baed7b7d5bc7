"""The osmpbf Spark data source on real PBF fixtures (read-only files from
the reference's test suite). Golden counts were cross-validated against the
reference docstring geometries (quackosm/functions.py:180-240): spot-checked
features match coordinate-for-coordinate."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackosm_spark.sources.pbf import read_osm_pbf
from tests.conftest import MONACO


@pytest.fixture(scope="module")
def monaco(spark):
    return read_osm_pbf(spark, MONACO).cache()


def test_schema(monaco):
    assert [f.name for f in monaco.schema.fields] == [
        "kind", "id", "tags", "refs", "ref_types", "ref_roles", "lat", "lon",
    ]


def test_element_counts(monaco):
    counts = {r["kind"]: r["count"] for r in monaco.groupBy("kind").count().collect()}
    assert counts == {"node": 30626, "way": 4846, "relation": 290}


def test_node_coordinates_in_monaco_bbox(monaco):
    row = monaco.where(F.col("kind") == "node").select(
        F.min("lat"), F.max("lat"), F.min("lon"), F.max("lon")
    ).collect()[0]
    assert 43.4 < row[0] and row[1] < 44.0
    assert 7.3 < row[2] and row[3] < 7.6


def test_known_node(monaco):
    # node/10068880335 = POINT (7.4186855 43.7321515), amenity=bench
    # (reference quackosm/functions.py:226 docstring example)
    r = monaco.where(F.col("id") == 10068880335).collect()[0]
    assert r["kind"] == "node"
    assert round(r["lon"], 7) == 7.4186855 and round(r["lat"], 7) == 43.7321515
    assert dict(r["tags"])["amenity"] == "bench"


def test_way_refs_resolve(monaco):
    ways = monaco.where(F.col("kind") == "way")
    node_ids = monaco.where(F.col("kind") == "node").select("id")
    dangling = (
        ways.select(F.explode("refs").alias("id"))
        .join(node_ids, "id", "left_anti")
    )
    assert dangling.count() == 0


def test_relation_members(monaco):
    rels = monaco.where(
        (F.col("kind") == "relation") & (F.size("refs") > 0)
    )
    row = rels.select(
        F.sum(
            F.when(
                (F.size("refs") == F.size("ref_types"))
                & (F.size("refs") == F.size("ref_roles")),
                0,
            ).otherwise(1)
        ).alias("bad")
    ).collect()[0]
    assert row["bad"] == 0
    # roles vocabulary sanity
    roles = {
        r["role"]
        for r in rels.select(F.explode("ref_roles").alias("role")).distinct().collect()
    }
    assert "outer" in roles and "inner" in roles


def test_partitioning_invariance(spark):
    """Small partition_bytes → many tasks; totals must not change."""
    df_small = read_osm_pbf(spark, MONACO, partition_bytes=64 * 1024)
    assert df_small.rdd.getNumPartitions() > 1
    assert df_small.count() == 30626 + 4846 + 290


def test_all_reference_fixtures_decode(spark):
    """Every hand-crafted PBF in the reference suite decodes and converts
    (regression goldens from first verified run)."""
    import glob

    from quackosm_spark.plans.pipeline import build_features

    expected = {
        "529cdcbb": ({"node": 10, "way": 1}, 0),
        "7a0163cb": ({}, 0),  # header-only
        "aa756ad3": ({"node": 1}, 1),
        "d17f922e": ({"node": 2499, "way": 330, "relation": 89}, 678),
        "eb2848d2": ({"node": 12, "way": 1}, 1),
    }
    for path in sorted(glob.glob("/root/reference/tests/test_files/*.osm.pbf")):
        key = path.rsplit("/", 1)[-1][:8]
        if key not in expected:
            continue
        el = read_osm_pbf(spark, path)
        counts = {r["kind"]: r["count"] for r in el.groupBy("kind").count().collect()}
        exp_counts, exp_features = expected[key]
        assert counts == exp_counts, key
        assert build_features(spark, read_osm_pbf(spark, path)).count() == exp_features, key


def test_header_feature_validation(tmp_path):
    """Files demanding unknown required_features are rejected per spec."""
    import struct
    import zlib

    import pytest

    from quackosm_spark.sources import pbf_decode
    from quackosm_spark.sources.pbf_encode import _blob, _len_delim

    body = _len_delim(4, b"OsmSchema-V0.6") + _len_delim(4, b"FancyFutureFeature")
    path = tmp_path / "future.osm.pbf"
    path.write_bytes(_blob("OSMHeader", body))
    with pytest.raises(ValueError, match="FancyFutureFeature"):
        pbf_decode.check_header_features(str(path))
    # supported features pass
    assert "DenseNodes" in pbf_decode.check_header_features(MONACO)


def test_osm_statistics(monaco):
    from quackosm_spark.operators import osm as O

    kinds = {r["kind"]: (r["n"], r["n_tagged"]) for r in O.kind_counts(monaco).collect()}
    assert kinds["node"] == (30626, 3167)
    top = O.tag_key_histogram(monaco, top=5).collect()
    assert len(top) == 5 and top[0]["n_elements"] >= top[4]["n_elements"]
    vals = O.tag_value_histogram(monaco, "highway", top=3).collect()
    assert all(v["value"] for v in vals)
    lens = O.way_length_histogram(monaco).collect()
    assert min(r["n_refs"] for r in lens) >= 2


def test_null_island_fixture_semantics(spark):
    """The reference's 'Null Island' fixtures: the tagged buoy node at
    ~(0,0) survives with metadata tags stripped; the untagged ring way and
    its nodes produce nothing."""
    import glob

    from quackosm_spark.functions import convert_pbf_to_dataframe
    from quackosm_spark.geometry import model, wkb

    path = glob.glob("/root/reference/tests/test_files/eb2848d2*.osm.pbf")[0]
    feats = {r["feature_id"]: r for r in convert_pbf_to_dataframe(spark, path).collect()}
    assert list(feats) == ["node/3815077900"]
    buoy = feats["node/3815077900"]
    tags = dict(buoy["tags"])
    assert tags["name"] == "Soul Buoy"
    assert "note" not in tags  # metadata tag stripped
    wkt = model.to_wkt(wkb.loads(bytes(buoy["geometry"])))
    assert wkt == "POINT (5e-07 -6e-07)"  # (lon lat): lon=5e-07, lat=-6e-07
    # crafted node without coordinate fields decodes to proto defaults (0,0)
    from quackosm_spark.sources.pbf import read_osm_pbf as _r
    from pyspark.sql import functions as _F

    bare = _r(spark, path).where(_F.col("id") == 10710875387).collect()[0]
    assert (bare["lat"], bare["lon"]) == (0.0, 0.0)


def test_untagged_elements_have_null_tags(monaco):
    n = monaco.where(F.col("tags").isNull()).count()
    assert n > 20000  # most monaco nodes are untagged geometry carriers
