"""osmChange (.osc) source + upsert-apply semantics."""

from __future__ import annotations

import gzip

from quackosm_spark.sources.osm_changes import (
    apply_osm_changes,
    parse_osc,
    read_osc,
)

OSC = b"""<?xml version="1.0" encoding="UTF-8"?>
<osmChange version="0.6" generator="test">
  <create>
    <node id="100" version="1" lat="1.5" lon="2.5">
      <tag k="amenity" v="cafe"/>
    </node>
  </create>
  <modify>
    <node id="1" version="7" lat="9.0" lon="9.0"/>
    <way id="20" version="3">
      <nd ref="1"/><nd ref="100"/>
      <tag k="highway" v="path"/>
    </way>
  </modify>
  <delete>
    <node id="2" version="4"/>
  </delete>
  <create>
    <node id="200" version="1" lat="0.0" lon="0.0"/>
  </create>
  <delete>
    <node id="200" version="2"/>
  </delete>
</osmChange>
"""


def test_parse_osc_actions_and_order():
    rows = list(parse_osc(OSC))
    assert [(r["action"], r["kind"], r["id"]) for r in rows] == [
        ("create", "node", 100),
        ("modify", "node", 1),
        ("modify", "way", 20),
        ("delete", "node", 2),
        ("create", "node", 200),
        ("delete", "node", 200),
    ]
    by_id = {(r["kind"], r["id"], r["action"]): r for r in rows}
    assert by_id[("node", 100, "create")]["tags"] == {"amenity": "cafe"}
    assert by_id[("way", 20, "modify")]["refs"] == [1, 100]
    assert by_id[("node", 200, "delete")]["version"] == 2
    assert [r["seq"] for r in rows] == list(range(6))


def test_apply_osm_changes_upsert_semantics(spark, tmp_path):
    # base: nodes 1 (old coords), 2 (to be deleted), 3 (untouched)
    base = spark.createDataFrame(
        [
            ("node", 1, None, None, None, None, 0.0, 0.0),
            ("node", 2, None, None, None, None, 0.0, 0.0),
            ("node", 3, {"k": "v"}, None, None, None, 3.0, 3.0),
            ("way", 20, None, [1, 2], None, None, None, None),
        ],
        "kind string, id long, tags map<string,string>, refs array<bigint>,"
        " ref_types array<string>, ref_roles array<string>, lat double, lon double",
    )
    # ship one plain + one gzipped copy-less file
    p = tmp_path / "diff.osc"
    p.write_bytes(OSC)
    changes = read_osc(spark, str(p))
    out = apply_osm_changes(base, changes)
    rows = {(r.kind, r.id): r for r in out.collect()}

    assert ("node", 2) not in rows          # deleted
    assert ("node", 200) not in rows        # create+delete in one batch nets out
    assert rows[("node", 1)].lat == 9.0     # modified in place
    assert rows[("node", 3)].tags == {"k": "v"}  # untouched survives
    assert rows[("node", 100)].tags == {"amenity": "cafe"}  # created
    assert list(rows[("way", 20)].refs) == [1, 100]         # way replaced
    assert len(rows) == 4


def test_read_osc_gzip(spark, tmp_path):
    p = tmp_path / "diff.osc.gz"
    p.write_bytes(gzip.compress(OSC))
    assert read_osc(spark, str(p)).count() == 6


def test_osc_apply_then_pipeline(spark, elements):
    """End-to-end freshness path: apply a diff to the element table, rerun
    the feature pipeline, and see the update in the output — the incremental
    alternative to re-reading a whole planet file."""
    from pyspark.sql import functions as F

    from quackosm_spark.plans.pipeline import build_features

    osc = b"""<osmChange version="0.6">
      <modify>
        <node id="1" version="9" lat="0.1" lon="0.1">
          <tag k="amenity" v="fountain"/>
        </node>
      </modify>
    </osmChange>"""
    changes = spark.createDataFrame(
        list(parse_osc(osc)),
        schema="kind string, id long, tags map<string,string>,"
        " refs array<bigint>, ref_types array<string>, ref_roles array<string>,"
        " lat double, lon double, action string, version long, seq long",
    )
    updated = apply_osm_changes(elements, changes)
    feats = build_features(spark, updated)
    node1 = feats.where(F.col("feature_id") == "node/1").collect()
    assert len(node1) == 1
    assert node1[0].tags == {"amenity": "fountain"}
    # untouched features still present
    assert feats.count() == build_features(spark, elements).count()
