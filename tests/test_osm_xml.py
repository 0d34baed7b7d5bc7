"""OSM XML source: parse semantics, PBF parity, and end-to-end pipeline."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackosm_spark.sources import parse_osm_xml, read_osm_pbf, read_osm_xml

OSM_XML = """<?xml version="1.0" encoding="UTF-8"?>
<osm version="0.6" generator="test">
  <node id="1" lat="0.0000000" lon="0.0000000">
    <tag k="amenity" v="cafe"/>
    <tag k="name" v="Corner"/>
  </node>
  <node id="2" lat="0.0001000" lon="0.0000000"/>
  <node id="3" lat="0.0001000" lon="0.0001000"/>
  <node id="4" lat="0.0000000" lon="0.0001000"/>
  <way id="10">
    <nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
    <tag k="building" v="yes"/>
  </way>
  <relation id="20">
    <member type="way" ref="10" role="outer"/>
    <member type="way" ref="11" role=""/>
    <tag k="type" v="multipolygon"/>
    <tag k="landuse" v="forest"/>
  </relation>
  <relation id="21">
    <member type="node" ref="1" role="stop"/>
    <tag k="type" v="route"/>
  </relation>
</osm>
"""


def test_parse_osm_xml_semantics():
    rows = {(r["kind"], r["id"]): r for r in parse_osm_xml(OSM_XML.encode())}
    assert len(rows) == 7  # 4 nodes + 1 way + 2 relations
    n1 = rows[("node", 1)]
    assert n1["tags"] == {"amenity": "cafe", "name": "Corner"}
    assert (n1["lat"], n1["lon"]) == (0.0, 0.0)
    assert rows[("node", 2)]["tags"] is None
    w = rows[("way", 10)]
    assert w["refs"] == [1, 2, 3, 4, 1] and w["tags"] == {"building": "yes"}
    r = rows[("relation", 20)]
    assert r["refs"] == [10, 11]
    assert r["ref_types"] == ["way", "way"]
    assert r["ref_roles"] == ["outer", None]  # empty role -> NULL (PBF parity)


@pytest.fixture()
def xml_path(tmp_path):
    p = tmp_path / "fixture.osm"
    p.write_text(OSM_XML)
    return str(p)


def test_read_osm_xml_matches_pbf(spark, tmp_path, xml_path):
    """The same elements through XML and PBF encodings produce identical
    DataFrames."""
    from quackosm_spark.sources import pbf_encode

    els = []
    for r in parse_osm_xml(OSM_XML.encode()):
        e = {"kind": r["kind"], "id": r["id"], "tags": r["tags"]}
        if r["kind"] == "node":
            e["lat"], e["lon"] = r["lat"], r["lon"]
        else:
            e["refs"] = r["refs"]
            if r["kind"] == "relation":
                e["ref_types"], e["ref_roles"] = r["ref_types"], r["ref_roles"]
        els.append(e)
    pbf_path = str(tmp_path / "fixture.osm.pbf")
    pbf_encode.write_pbf(pbf_path, els)

    def _norm(df):
        return sorted(
            (
                r["kind"], r["id"],
                tuple(sorted((r["tags"] or {}).items())),
                tuple(r["refs"] or ()), tuple(r["ref_types"] or ()),
                tuple(r["ref_roles"] or ()), r["lat"], r["lon"],
            )
            for r in df.collect()
        )

    xml_rows = _norm(read_osm_xml(spark, xml_path))
    pbf_rows = _norm(read_osm_pbf(spark, pbf_path))
    # PBF way/relation rows carry empty-vs-null differences only through
    # ref_types for ways (None in both sources) — compare full tuples
    assert xml_rows == pbf_rows


def test_xml_source_through_pipeline(spark, xml_path):
    """Full element→feature pipeline over the XML source: the closed tagged
    way polygonizes, the multipolygon relation assembles, the route relation
    is dropped by design."""
    from quackosm_spark.plans.pipeline import build_features

    features = build_features(spark, read_osm_xml(spark, xml_path))
    ids = {r["feature_id"] for r in features.select("feature_id").collect()}
    assert "node/1" in ids          # tagged node
    assert "way/10" in ids          # tagged closed way
    assert "relation/21" not in ids  # route relations dropped (§1.1)
    # relation/20 references way/11 which doesn't resolve -> dropped by C4
    assert "relation/20" not in ids


def test_convert_osm_xml_to_dataframe(spark, xml_path):
    """The public conversion API accepts .osm files directly."""
    from quackosm_spark.functions import convert_pbf_to_dataframe

    features = convert_pbf_to_dataframe(spark, xml_path)
    ids = {r["feature_id"] for r in features.select("feature_id").collect()}
    assert "node/1" in ids and "way/10" in ids


def test_malformed_xml_raises():
    with pytest.raises(Exception):  # noqa: B017 — ParseError surface
        list(parse_osm_xml(b"<osm><node id='1'"))


def test_read_osm_xml_directory(spark, tmp_path):
    """A directory of .osm files reads as one elements DataFrame with one
    parse task per file."""
    d = tmp_path / "many"
    d.mkdir()
    for i in range(3):
        (d / f"part{i}.osm").write_text(
            f'<?xml version="1.0"?><osm><node id="{i + 1}" lat="1.0" lon="2.0">'
            f'<tag k="name" v="n{i}"/></node></osm>'
        )
    df = read_osm_xml(spark, str(d))
    rows = df.collect()
    assert {r["id"] for r in rows} == {1, 2, 3}
    assert all(r["kind"] == "node" for r in rows)


def test_read_compressed_osm_xml(spark, tmp_path):
    import bz2
    import gzip

    xml = ('<?xml version="1.0"?><osm>'
           '<node id="7" lat="1.5" lon="2.5"><tag k="amenity" v="bench"/></node>'
           '</osm>')
    gz = tmp_path / "a.osm.gz"
    gz.write_bytes(gzip.compress(xml.encode()))
    bz = tmp_path / "b.osm.bz2"
    bz.write_bytes(bz2.compress(xml.replace('id="7"', 'id="8"').encode()))
    rows = read_osm_xml(spark, str(gz), str(bz)).collect()
    assert {r["id"] for r in rows} == {7, 8}
    assert all(r["tags"] == {"amenity": "bench"} for r in rows)
