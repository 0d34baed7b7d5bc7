"""OSM XML (``.osm``) source — the editor/Overpass interchange format.

Produces the same elements schema as the PBF source (SURVEY §1.1), so the
whole pipeline runs on JOSM exports and Overpass query results without an
external converter. XML is not blob-splittable, so parallelism is per FILE
(``binaryFile`` scan → one parse task per file); ``.osm.pbf`` remains the
100 TB-scale path. Reference parity: quackosm reads PBF only — this source
is an addition, mapped onto the identical element model.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from quackosm_spark.sources.pbf import ELEMENTS_SCHEMA

_KINDS = {"node", "way", "relation"}


def parse_osm_xml(data: bytes) -> Iterator[dict[str, Any]]:
    """Stream element dicts (kind/id/tags/refs/ref_types/ref_roles/lat/lon)
    from OSM XML bytes. ``iterparse`` + element clearing keeps memory at
    O(one element), not O(file)."""
    context = ET.iterparse(io.BytesIO(data), events=("end",))
    for _event, el in context:
        if el.tag not in _KINDS:
            continue
        tags = {t.attrib["k"]: t.attrib.get("v", "") for t in el.findall("tag")} or None
        row: dict[str, Any] = {
            "kind": el.tag,
            "id": int(el.attrib["id"]),
            "tags": tags,
            "refs": None,
            "ref_types": None,
            "ref_roles": None,
            "lat": None,
            "lon": None,
        }
        if el.tag == "node":
            lat, lon = el.attrib.get("lat"), el.attrib.get("lon")
            row["lat"] = float(lat) if lat is not None else None
            row["lon"] = float(lon) if lon is not None else None
        elif el.tag == "way":
            row["refs"] = [int(nd.attrib["ref"]) for nd in el.findall("nd")]
            row["ref_types"] = None
            row["ref_roles"] = None
        else:  # relation
            members = el.findall("member")
            row["refs"] = [int(m.attrib["ref"]) for m in members]
            row["ref_types"] = [m.attrib.get("type") for m in members]
            # empty role ≙ PBF string-table sid 0 → NULL, so role-default
            # semantics (COALESCE → 'outer') behave identically
            row["ref_roles"] = [m.attrib.get("role") or None for m in members]
        el.clear()
        yield row


def _decompress(path: str, content: bytes) -> bytes:
    """Transparent .gz / .bz2 support — OSM XML dumps usually ship
    compressed (Overpass exports, planet.osm.bz2)."""
    if path.endswith(".gz"):
        import gzip

        return gzip.decompress(content)
    if path.endswith(".bz2"):
        import bz2

        return bz2.decompress(content)
    return content


def read_osm_xml(spark: SparkSession, *paths: str) -> DataFrame:
    """Read ``.osm`` / ``.osm.gz`` / ``.osm.bz2`` XML file(s) as the raw
    elements DataFrame.

    ``binaryFile`` scan (one row per file, content as bytes) →
    ``mapInPandas`` parse. Each file parses in one task; point the reader
    at a directory of files for parallelism.
    """
    files = spark.read.format("binaryFile").load(list(paths))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                data = _decompress(str(path), bytes(content))
                rows = list(parse_osm_xml(data))
                if rows:
                    yield pd.DataFrame(
                        rows,
                        columns=[f.name for f in ELEMENTS_SCHEMA.fields],
                    )

    return files.select("path", "content").mapInPandas(_parse, schema=ELEMENTS_SCHEMA)
