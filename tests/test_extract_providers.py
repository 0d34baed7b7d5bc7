"""Provider index-builder parity tests, mirroring the reference's
tests/base/test_osm_extracts.py provider cases (Geofabrik/BBBike/OSM-fr/
GEO2Day/Movisda parsing, .poly parsing, full-name generation, download
retry loops) against recorded payloads — no network."""

from __future__ import annotations

import os
from pathlib import Path

import pytest

from quackosm_spark import extracts
from quackosm_spark.extracts import providers as P


def _box(minx, miny, maxx, maxy):
    return {
        "type": "Polygon",
        "coordinates": [[
            [minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny],
        ]],
    }


# --------------------------------------------------------------------------
# .poly format
# --------------------------------------------------------------------------

def test_parse_poly_single_ring():
    poly = P.parse_poly(
        ["name", "area1", "1.0 1.0", "2.0 1.0", "2.0 2.0", "END", "END"]
    )
    assert poly["type"] == "MultiPolygon"
    ring = poly["coordinates"][0][0]
    assert ring[0] == ring[-1] == [1.0, 1.0]
    assert len(ring) == 4


def test_parse_poly_hole_and_second_part():
    lines = [
        "region",
        "part1", "0 0", "10 0", "10 10", "0 10", "END",
        "!hole1", "4 4", "6 4", "6 6", "4 6", "END",
        "part2", "20 20", "30 20", "30 30", "END",
        "END",
    ]
    poly = P.parse_poly(lines)
    assert len(poly["coordinates"]) == 2
    assert len(poly["coordinates"][0]) == 2  # shell + hole
    assert poly["coordinates"][0][1][0] == [4.0, 4.0]
    assert len(poly["coordinates"][1]) == 1


# --------------------------------------------------------------------------
# Geofabrik (reference test_geofabrik_parse_index)
# --------------------------------------------------------------------------

def test_geofabrik_parse_index():
    parsed_data = {
        "features": [
            {
                "type": "Feature",
                "geometry": _box(1, 42, 2, 43),
                "properties": {
                    "id": "andorra",
                    "parent": "europe",
                    "name": "Andorra",
                    "urls": {"pbf": "https://download.geofabrik.de/europe/andorra-latest.osm.pbf"},
                },
            },
            {
                "type": "Feature",
                "geometry": _box(-10, 35, 40, 70),
                "properties": {
                    "id": "europe",
                    "name": "Europe",
                    "urls": {"pbf": "https://download.geofabrik.de/europe-latest.osm.pbf"},
                },
            },
            {
                "type": "Feature",
                "geometry": _box(-125, 32, -114, 42),
                "properties": {
                    "id": "us/california",
                    "parent": "us",
                    "name": "California",
                    "urls": {
                        "pbf": "https://download.geofabrik.de/north-america/us/california-latest.osm.pbf"
                    },
                },
            },
        ]
    }
    records = P.parse_geofabrik_index(parsed_data)
    by_id = {r["id"]: r for r in records}
    assert by_id["Geofabrik_andorra"]["name"] == "andorra"
    assert by_id["Geofabrik_andorra"]["parent"] == "Geofabrik_europe"
    assert (
        by_id["Geofabrik_andorra"]["url"]
        == "https://download.geofabrik.de/europe/andorra-latest.osm.pbf"
    )
    assert by_id["Geofabrik_europe"]["parent"] == "Geofabrik"
    # US sub-extracts get their parent forced to the us node
    assert by_id["Geofabrik_us/california"]["parent"] == "Geofabrik_us"
    # full names walk the parent chain root-first
    assert by_id["Geofabrik_andorra"]["file_name"] == "geofabrik_europe_andorra"


# --------------------------------------------------------------------------
# BBBike (reference test_bbbike_iterate_index)
# --------------------------------------------------------------------------

def test_bbbike_parse_index():
    index_html = (
        "<table>"
        '<tr class="d"><td><a href="../">..</a></td></tr>'
        '<tr class="d"><td><a href="Aachen/">Aachen</a></td></tr>'
        '<tr class="d"><td><a href="Berlin/">Berlin</a></td></tr>'
        "</table>"
    )
    csv_text = "Berlin:0:1:2:3:4:13.0 52.3 13.8 52.7:rest\n"

    def poly_fetcher(url):
        if "Aachen" in url:
            return "Aachen\n1\n6.0 50.7\n6.2 50.7\n6.2 50.9\n6.0 50.9\nEND\nEND\n"
        return None

    records = P.parse_bbbike_index(index_html, csv_text, poly_fetcher)
    by_id = {r["id"]: r for r in records}
    assert set(by_id) == {"BBBike_Aachen", "BBBike_Berlin"}
    assert by_id["BBBike_Aachen"]["parent"] == "BBBike"
    assert (
        by_id["BBBike_Aachen"]["url"]
        == "https://download.bbbike.org/osm/bbbike/Aachen/Aachen.osm.pbf"
    )
    # Aachen from the .poly file
    shell = by_id["BBBike_Aachen"]["geometry"]["coordinates"][0][0]
    assert [6.0, 50.7] in shell and [6.2, 50.9] in shell
    # Berlin falls back to the CSV bbox
    shell = by_id["BBBike_Berlin"]["geometry"]["coordinates"][0]
    assert [13.0, 52.3] in shell and [13.8, 52.7] in shell


# --------------------------------------------------------------------------
# OSM-fr (reference test_osm_fr_gather_and_parse)
# --------------------------------------------------------------------------

def test_osm_fr_parse_index():
    root_html = (
        "<table>"
        '<tr><td><img src="/icons/folder.gif"></td>'
        '<td><a href="europe/">europe/</a></td></tr>'
        "</table>"
    )
    europe_html = (
        '<table><tr><td><a href="monaco-latest.osm.pbf">monaco-latest.osm.pbf</a>'
        "</td></tr></table>"
    )
    pages = {
        f"{P.OPENSTREETMAP_FR_EXTRACTS_INDEX_URL}/": root_html,
        f"{P.OPENSTREETMAP_FR_EXTRACTS_INDEX_URL}/europe/": europe_html,
    }
    poly = "monaco\n1\n7.4 43.7\n7.5 43.7\n7.5 43.8\n7.4 43.8\nEND\nEND\n"

    def fetcher(url):
        if url in pages:
            return pages[url]
        if url.endswith("monaco.poly"):
            return poly
        return None

    records = P.parse_osm_fr_index(fetcher)
    assert len(records) == 1
    r = records[0]
    assert r["id"] == "osmfr_europe_monaco"
    assert r["name"] == "monaco"
    assert r["parent"] == "osmfr_europe"
    assert (
        r["url"]
        == "https://download.openstreetmap.fr/extracts/europe/monaco-latest.osm.pbf"
    )
    shell = r["geometry"]["coordinates"][0][0]
    assert [7.4, 43.7] in shell


# --------------------------------------------------------------------------
# GEO2Day (reference test_geo2day_* cases)
# --------------------------------------------------------------------------

def test_geo2day_direct_subregion_links_only():
    pages = {
        "https://geo2day.com/": (
            '<a href="https://geo2day.com/europe.html">Europe</a>'
            '<a href="#">self</a>'
            '<a href="https://geo2day.com/">Home</a>'
        ),
        "https://geo2day.com/europe.html": (
            '<a href="https://geo2day.com/europe.html">self</a>'
            '<a href="https://geo2day.com/europe/poland.html">Poland</a>'
            # two levels deeper from here: must NOT be picked up at this level
            '<a href="https://geo2day.com/europe/germany/bayern.html">Bavaria</a>'
        ),
        "https://geo2day.com/europe/poland.html": (
            '<a href="https://geo2day.com/europe.html">parent</a>'
        ),
    }

    def geojson_fetcher(url):
        return {"type": "Feature", "geometry": _box(0, 0, 1, 1)}

    records = P.parse_geo2day_index(lambda u: pages.get(u, ""), geojson_fetcher)
    by_id = {r["id"]: r for r in records}
    assert set(by_id) == {"GEO2Day_europe", "GEO2Day_europe_poland"}
    assert by_id["GEO2Day_europe"]["parent"] == "GEO2Day"
    assert by_id["GEO2Day_europe"]["url"] == "https://geo2day.com/europe.pbf"
    assert by_id["GEO2Day_europe_poland"]["parent"] == "GEO2Day_europe"
    assert (
        by_id["GEO2Day_europe_poland"]["url"]
        == "https://geo2day.com/europe/poland.pbf"
    )


# --------------------------------------------------------------------------
# Movisda (reference test_movisda_* cases)
# --------------------------------------------------------------------------

def test_movisda_admin_hierarchy():
    geojson_data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"prefix": "RW-", "name": "Rwanda (local)", "name_en": "Rwanda"},
                "geometry": _box(0, 0, 4, 4),
            },
            {
                "type": "Feature",
                "properties": {"prefix": "RW-02-", "name": "Eastern Province"},
                "geometry": _box(1, 1, 2, 2),
            },
            {
                "type": "Feature",
                "properties": {"prefix": "ZM-", "name_en": "Zambia", "name": "Zambia"},
                "geometry": _box(5, 5, 9, 9),
            },
            {
                "type": "Feature",
                "properties": {"prefix": "ZM-03-", "name": "Eastern Province"},
                "geometry": _box(6, 6, 7, 7),
            },
        ],
    }
    records = P.parse_movisda_admin_index(geojson_data)
    by_id = {r["id"]: r for r in records}
    assert by_id["Movisda-admin_RW"]["parent"] == "Movisda-admin"
    assert by_id["Movisda-admin_RW"]["name"] == "Rwanda"
    assert by_id["Movisda-admin_RW-02"]["parent"] == "Movisda-admin_RW"
    assert by_id["Movisda-admin_RW-02"]["name"] == "Eastern Province"
    assert (
        by_id["Movisda-admin_RW-02"]["url"]
        == "https://osm.download.movisda.io/admin/RW-02-latest.osm.pbf"
    )
    # same subdivision name in another country resolves to a different parent
    assert by_id["Movisda-admin_ZM-03"]["parent"] == "Movisda-admin_ZM"


def test_movisda_grid_flat():
    geojson_data = {
        "type": "FeatureCollection",
        "features": [
            {
                "type": "Feature",
                "properties": {"prefix": "N42W001-", "name": "N42W001 (1°)"},
                "geometry": _box(0, 0, 1, 1),
            },
            {
                "type": "Feature",
                "properties": {"prefix": "N80E000-10-", "name": "N80E000 (10°)"},
                "geometry": _box(2, 2, 3, 3),
            },
        ],
    }
    records = P.parse_movisda_grid_index(geojson_data)
    by_id = {r["id"]: r for r in records}
    assert by_id["Movisda-grid_N42W001"]["name"] == "N42W001"
    assert by_id["Movisda-grid_N42W001"]["parent"] == "Movisda-grid"
    assert (
        by_id["Movisda-grid_N42W001"]["url"]
        == "https://osm.download.movisda.io/grid/N42W001-latest.osm.pbf"
    )
    assert (
        by_id["Movisda-grid_N80E000-10"]["url"]
        == "https://osm.download.movisda.io/grid/N80E000-10-latest.osm.pbf"
    )


# --------------------------------------------------------------------------
# full-name generation (reference test_proper_full_name)
# --------------------------------------------------------------------------

def test_attach_file_names_walks_parents_and_slugifies():
    records = [
        {"id": "X_a", "name": "Świętokrzyskie Land", "parent": "X"},
        {"id": "X_a_b", "name": "Ørsta/Sub Region", "parent": "X_a"},
    ]
    P.attach_file_names(records)
    assert records[0]["file_name"] == "x_swietokrzyskie_land"
    assert records[1]["file_name"] == "x_swietokrzyskie_land_rstasub_region"


# --------------------------------------------------------------------------
# end-to-end: records → build_index → coverage search
# --------------------------------------------------------------------------

def test_provider_records_feed_coverage_search():
    parsed_data = {
        "features": [
            {
                "type": "Feature",
                "geometry": _box(0, 0, 10, 10),
                "properties": {"id": "big", "name": "Big",
                               "urls": {"pbf": "u/big.pbf"}},
            },
            {
                "type": "Feature",
                "geometry": _box(2, 2, 4, 4),
                "properties": {"id": "small", "parent": "big", "name": "Small",
                               "urls": {"pbf": "u/small.pbf"}},
            },
        ]
    }
    index = extracts.build_index(P.parse_geofabrik_index(parsed_data))
    found = extracts.find_extracts_for_geometry(_box(2.5, 2.5, 3.5, 3.5), index)
    assert [e.id for e in found] == ["Geofabrik_small"]


# --------------------------------------------------------------------------
# precalculated index parquet (reference extract.py:26-28)
# --------------------------------------------------------------------------

REFERENCE_INDEX = "/root/reference/precalculated_indexes/geofabrik_index.parquet"


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_INDEX), reason="reference parquet not present"
)
def test_load_precalculated_index_parquet():
    records = P.load_precalculated_index(REFERENCE_INDEX)
    assert len(records) > 500
    cols = {"id", "name", "file_name", "parent", "url", "geometry"}
    assert cols <= set(records[0])
    monaco = [r for r in records if r["name"] == "monaco"]
    assert monaco, "monaco missing from Geofabrik index"
    geom = monaco[0]["geometry"]
    assert geom["type"] in ("Polygon", "MultiPolygon")
    # Monaco sits near (7.4, 43.7)
    from quackosm_spark.geometry import model

    minx, miny, maxx, maxy = model.bounds(geom)
    assert 7.0 < minx < 8.0 and 43.0 < miny < 44.0


@pytest.mark.skipif(
    not os.path.exists(REFERENCE_INDEX), reason="reference parquet not present"
)
def test_precalculated_index_selection_monaco():
    # query a small box inside Monaco against the real Geofabrik index
    # (restricted to Europe rows for test speed): the selection must pick
    # the monaco extract, like the reference's own Monaco cases
    records = [
        r
        for r in P.load_precalculated_index(REFERENCE_INDEX)
        if r["file_name"].startswith("geofabrik_europe")
        and r["file_name"].count("_") <= 3
    ]
    index = extracts.build_index(records)
    query = _box(7.41, 43.72, 7.42, 43.73)
    found = extracts.find_extracts_for_geometry(query, index)
    assert [e.name for e in found] == ["monaco"]


# --------------------------------------------------------------------------
# download retry loops (reference test_download_extract_by_query_* and
# test_find_and_download_excludes_unavailable_extracts)
# --------------------------------------------------------------------------

def _mini_index():
    return extracts.build_index(
        [
            {"id": "A", "name": "city", "file_name": "prov_city",
             "parent": "prov", "url": "u/a.pbf", "geometry": _box(0, 0, 4, 4)},
            {"id": "B", "name": "city", "file_name": "prov2_city",
             "parent": "prov2", "url": "u/b.pbf", "geometry": _box(0, 0, 5, 5)},
        ]
    )


def test_download_extract_by_query_retries_next_match(tmp_path):
    calls = []

    def fetcher(url):
        calls.append(url)
        return None if url == "u/a.pbf" else b"pbfdata"

    with pytest.warns(extracts.OsmExtractUnavailableWarning):
        path = extracts.download_extract_by_query(
            "city", _mini_index(), tmp_path, fetcher=fetcher
        )
    # smaller-area A matched first, 404'd, excluded; B succeeded
    assert calls == ["u/a.pbf", "u/b.pbf"]
    assert path.read_bytes() == b"pbfdata"
    assert path.name == "prov2_city.osm.pbf"


def test_download_extract_by_query_all_unavailable(tmp_path):
    with pytest.warns(extracts.OsmExtractUnavailableWarning):
        with pytest.raises(extracts.OsmExtractsUnavailableError) as exc:
            extracts.download_extract_by_query(
                "city", _mini_index(), tmp_path, fetcher=lambda url: None
            )
    assert exc.value.matching_full_names == ["prov2_city", "prov_city"]


def test_download_extract_by_query_zero_match(tmp_path):
    with pytest.raises(extracts.OsmExtractZeroMatchesError):
        extracts.download_extract_by_query(
            "nonexistent-region-name", _mini_index(), tmp_path,
            fetcher=lambda url: b"x",
        )


def test_find_and_download_excludes_unavailable(tmp_path):
    # A covers the query best but is unavailable; the loop recalculates
    # and lands on B
    def fetcher(url):
        return None if url == "u/a.pbf" else b"pbfdata"

    with pytest.warns(extracts.OsmExtractUnavailableWarning):
        downloaded = extracts.find_and_download_extracts_pbf_files(
            _box(1, 1, 3, 3), _mini_index(), tmp_path, fetcher=fetcher
        )
    assert [e.id for e, _ in downloaded] == ["B"]
    assert downloaded[0][1].exists()


def test_download_extract_reuses_existing_file(tmp_path):
    index = _mini_index()
    target = Path(tmp_path) / "prov_city.osm.pbf"
    target.write_bytes(b"cached")
    calls = []
    path = extracts.download_extract(
        index[0], tmp_path, fetcher=lambda url: calls.append(url) or b"new"
    )
    assert path == target and not calls


def test_get_source_index_multi_source_and_validation():
    ref = "/root/reference/precalculated_indexes"
    if not os.path.isdir(ref):
        pytest.skip("reference precalculated indexes absent")
    idx = extracts.get_source_index("bbbike,geofabrik", precalculated_dir=ref)
    assert {e.id.split("_")[0] for e in idx} == {"BBBike", "Geofabrik"}
    with pytest.raises(ValueError):
        extracts.get_source_index("nonexistent-provider")


def test_get_source_index_multi_source_skips_unavailable():
    """r03 (ADVICE r02): an explicit comma-separated list skips an
    unavailable provider with a warning — reference _get_index_for_sources
    semantics — and raises only when NO source resolves."""
    ref = "/root/reference/precalculated_indexes"
    if not os.path.isdir(ref):
        pytest.skip("reference precalculated indexes absent")

    # geofabrik resolves from precalculated parquet; bbbike has no parquet
    # and the live fetch fails offline → warn + skip, result is geofabrik
    import shutil
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        shutil.copy(
            os.path.join(ref, "geofabrik_index.parquet"),
            os.path.join(d, "geofabrik_index.parquet"),
        )

        def dead_fetcher(url):
            raise OSError("offline")

        with pytest.warns(extracts.OsmExtractUnavailableWarning):
            idx = extracts.get_source_index(
                "bbbike,geofabrik", precalculated_dir=d, fetcher=dead_fetcher
            )
        assert idx and all(e.id.startswith("Geofabrik") for e in idx)

        # single-source request still fails fast (no warning-swallow)
        with pytest.raises(Exception):
            extracts.get_source_index(
                "bbbike", precalculated_dir=d, fetcher=dead_fetcher
            )

        # nothing resolvable → RuntimeError
        with pytest.raises(RuntimeError):
            extracts.get_source_index(
                "bbbike,osmfr", precalculated_dir=d, fetcher=dead_fetcher
            )


def test_bbbike_city_without_poly_or_csv_row_is_skipped():
    """r03 (ADVICE r02): a listed city directory with no .poly and no
    cities.csv row is skipped with a warning, not a StopIteration crash."""
    listing = (
        '<table><tr class="d"><td><a href="Aachen/">Aachen</a></td></tr>'
        '<tr class="d"><td><a href="Ghost/">Ghost</a></td></tr></table>'
    )
    csv_text = "Aachen:x:x:x:x:x:5.9 50.6 6.2 50.9\n"
    with pytest.warns(UserWarning, match="Ghost"):
        records = P.parse_bbbike_index(
            listing, csv_text, poly_fetcher=lambda url: None
        )
    assert [r["name"] for r in records] == ["Aachen"]


def test_extract_area_memoized_per_instance_not_per_id():
    """r03 (ADVICE r02): two extracts sharing an id but with different
    geometry (stale cache vs refreshed index) get independent areas."""
    a = extracts.build_index(
        [{"id": "X", "name": "x", "file_name": "x",
          "geometry": _box(0, 0, 2, 2)}], lazy_area=True
    )[0]
    b = extracts.build_index(
        [{"id": "X", "name": "x", "file_name": "x",
          "geometry": _box(0, 0, 4, 4)}], lazy_area=True
    )[0]
    area_a = extracts.extract_area(a)
    area_b = extracts.extract_area(b)
    assert area_a == pytest.approx(4.0, rel=0.05)
    assert area_b == pytest.approx(16.0, rel=0.05)
    # memoized: second call returns the identical cached value
    assert extracts.extract_area(a) == area_a
