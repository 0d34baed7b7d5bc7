"""S2 URL ingest, end-to-end with an injected transport (offline): a URL
pbf_path is detected, fetched via urlretrieve (monkeypatched to copy the
monaco fixture), cached by file name, and fed into the normal conversion
pipeline."""

from __future__ import annotations

import shutil
from pathlib import Path

import pytest

from quackosm_spark import functions as FN

MONACO = Path(__file__).parent / "data" / "monaco.osm.pbf"
REFERENCE_MONACO = Path("/root/reference/tests/test_files/monaco.osm.pbf")


def _fixture() -> Path:
    if MONACO.exists():
        return MONACO
    if REFERENCE_MONACO.exists():
        return REFERENCE_MONACO
    pytest.skip("no monaco fixture available")


def test_is_url_path():
    assert FN.is_url_path("https://download.example.com/monaco.osm.pbf")
    assert FN.is_url_path("http://x/y.pbf")
    assert FN.is_url_path("ftp://x/y.pbf")
    assert not FN.is_url_path("/data/monaco.osm.pbf")
    assert not FN.is_url_path("monaco.osm.pbf")


def test_resolve_downloads_and_caches(tmp_path, monkeypatch):
    src = _fixture()
    calls: list[str] = []

    def fake_urlretrieve(url, target):
        calls.append(url)
        shutil.copy(src, target)

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)

    url = "https://download.example.com/monaco.osm.pbf"
    resolved = FN._resolve_pbf_paths([url, str(src)], download_directory=tmp_path)
    assert resolved[0] == str(tmp_path / "monaco.osm.pbf")
    assert Path(resolved[0]).stat().st_size == src.stat().st_size
    assert resolved[1] == str(src)
    assert calls == [url]

    # second resolve hits the by-name cache — no re-download
    resolved2 = FN._resolve_pbf_paths([url], download_directory=tmp_path)
    assert resolved2 == [resolved[0]]
    assert calls == [url]


def test_url_ingest_feeds_conversion(tmp_path, monkeypatch, spark):
    """The full S2 path: URL → download → scan → features (golden count)."""
    src = _fixture()

    def fake_urlretrieve(url, target):
        shutil.copy(src, target)

    import urllib.request

    monkeypatch.setattr(urllib.request, "urlretrieve", fake_urlretrieve)

    df = FN.convert_pbf_to_dataframe(
        spark,
        "https://download.example.com/monaco.osm.pbf",
        download_directory=tmp_path,
        tags_filter={"building": True, "amenity": True, "highway": True},
    )
    assert df.count() == 5750
