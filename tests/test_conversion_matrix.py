"""Parametrized conversion matrix on the F1 fixture — the reference's
end-to-end parameter sweep (tests/base/test_pbf_file_reader.py:65-97:
tags_filter × explode_tags × keep_all_tags) without per-case PBF cost."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackosm_spark.filters.tags import merge_osm_tags_filter, _is_grouped_filter
from quackosm_spark.plans.output import (
    drop_empty_columns,
    explode_tags_to_columns,
    group_tags_to_columns,
    keep_relevant_tags,
)
from quackosm_spark.plans.pipeline import PbfPipelineOptions, build_features

HEX2VEC_ISH = {"building": True, "amenity": True, "barrier": True}
GROUPED = {"built": {"building": True}, "nature": {"natural": True, "leisure": True}}


def _shape(features, tags_filter, explode, keep_all_tags):
    """Mirror of convert_pbf_to_dataframe's shaping dispatch."""
    if tags_filter is not None and _is_grouped_filter(tags_filter):
        return drop_empty_columns(group_tags_to_columns(features, tags_filter))
    merged = merge_osm_tags_filter(tags_filter) if tags_filter is not None else None
    if explode:
        return drop_empty_columns(explode_tags_to_columns(features, merged, keep_all_tags))
    if merged and not keep_all_tags:
        return keep_relevant_tags(features, merged)
    return features


@pytest.mark.parametrize("tags_filter", [None, HEX2VEC_ISH, GROUPED],
                         ids=["nofilter", "flat", "grouped"])
@pytest.mark.parametrize("explode_tags", [None, True, False])
@pytest.mark.parametrize("keep_all_tags", [False, True])
def test_conversion_matrix(spark, elements, tags_filter, explode_tags, keep_all_tags):
    opts = PbfPipelineOptions(
        tags_filter=tags_filter,
        explode_tags=explode_tags,
        keep_all_tags=keep_all_tags,
    )
    features = build_features(spark, elements, opts)
    shaped = _shape(features, tags_filter, opts.resolve_explode_tags(), keep_all_tags)
    rows = shaped.collect()

    # invariants across the whole matrix
    assert shaped.columns[0] == "feature_id"
    assert shaped.columns[-1] == "geometry"
    ids = [r["feature_id"] for r in rows]
    assert len(ids) == len(set(ids))
    assert all(r["geometry"] is not None for r in rows)

    if tags_filter is None:
        assert len(rows) == 11  # the F1 inventory
    elif tags_filter is HEX2VEC_ISH:
        # building ways + amenity nodes + barrier way
        assert {i for i in ids} == {"node/1", "node/5", "way/101", "way/102", "way/104"}
        if opts.resolve_explode_tags():
            assert "building" in shaped.columns or "amenity" in shaped.columns
        elif not keep_all_tags:
            # compact relevant-only: no tag outside the filter survives
            for r in rows:
                assert all(k in HEX2VEC_ISH for k in r["tags"])
    else:  # grouped
        by_id = {r["feature_id"]: r for r in rows}
        assert by_id["way/101"]["built"] == "building=yes"
        assert by_id["relation/201"]["nature"] == "natural=water"


def test_grouped_filter_column_per_group(spark, elements):
    features = build_features(
        spark, elements, PbfPipelineOptions(tags_filter=GROUPED)
    )
    shaped = _shape(features, GROUPED, False, False)
    assert shaped.columns == ["feature_id", "built", "nature", "geometry"]
