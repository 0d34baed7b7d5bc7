"""OSM replication diffs (osmChange ``.osc`` / ``.osc.gz``) — the canonical
OSM update stream (minutely/hourly/daily diffs published by planet.osm).

The reference converts static snapshots only; this module adds the update
path: read a batch of change files and apply them to an existing element
table with last-wins upsert semantics, so a pipeline can keep a converted
dataset fresh without re-reading the whole planet file.

Scale shape: ``apply_osm_changes`` is one anti join (drop superseded /
deleted keys, broadcast-sized: a diff is tiny vs the base table) + one
window over the CHANGES only (pick each key's final state) + a union — the
base table is never shuffled, which is the property that matters when the
base is 10^10 rows and the diff is 10^5.
"""

from __future__ import annotations

import io
import xml.etree.ElementTree as ET
from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

from quackosm_spark.sources.osm_xml import _decompress
from quackosm_spark.sources.pbf import ELEMENTS_SCHEMA

_KINDS = {"node", "way", "relation"}
_ACTIONS = {"create", "modify", "delete"}

#: elements schema + change bookkeeping
CHANGES_SCHEMA = StructType(
    list(ELEMENTS_SCHEMA.fields)
    + [
        StructField("action", StringType()),
        StructField("version", LongType()),
        StructField("seq", LongType()),
    ]
)


def parse_osc(data: bytes) -> Iterator[dict[str, Any]]:
    """Stream change rows from osmChange XML: each element row is tagged
    with its enclosing action (create/modify/delete), its ``version``
    attribute, and a file-order ``seq`` for last-wins tie-breaks."""
    context = ET.iterparse(io.BytesIO(data), events=("start", "end"))
    action = None
    seq = 0
    for event, el in context:
        if event == "start":
            if el.tag in _ACTIONS:
                action = el.tag
            continue
        if el.tag in _ACTIONS:
            action = None
            el.clear()
            continue
        if el.tag not in _KINDS or action is None:
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
            "action": action,
            "version": int(el.attrib["version"]) if "version" in el.attrib else None,
            "seq": seq,
        }
        seq += 1
        if el.tag == "node":
            lat, lon = el.attrib.get("lat"), el.attrib.get("lon")
            row["lat"] = float(lat) if lat is not None else None
            row["lon"] = float(lon) if lon is not None else None
        elif el.tag == "way":
            row["refs"] = [int(nd.attrib["ref"]) for nd in el.findall("nd")]
        else:
            members = el.findall("member")
            row["refs"] = [int(m.attrib["ref"]) for m in members]
            row["ref_types"] = [m.attrib.get("type") for m in members]
            row["ref_roles"] = [m.attrib.get("role") or None for m in members]
        el.clear()
        yield row


def read_osc(spark: SparkSession, *paths: str) -> DataFrame:
    """Change files → one DataFrame with CHANGES_SCHEMA. Same execution
    shape as ``read_osm_xml``: ``binaryFile`` listing + ``mapInPandas``
    decode, one task per file (diff files are small by construction; a
    backlog of thousands of them parallelizes per-file)."""
    files = spark.read.format("binaryFile").load(list(paths))

    def _parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for path, content in zip(pdf["path"], pdf["content"]):
                rows = list(parse_osc(_decompress(path, bytes(content))))
                if rows:
                    yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(_parse, CHANGES_SCHEMA)


def apply_osm_changes(elements: DataFrame, changes: DataFrame) -> DataFrame:
    """Upsert an osmChange batch into an element table.

    Semantics (mirrors osmosis/pyosmium apply-change):
    - every (kind, id) mentioned in the diff replaces the base row,
    - the FINAL state per key wins when a key appears multiple times in one
      batch (highest version, then file order — a create+delete in the same
      batch nets to absent),
    - ``delete`` rows remove the key.

    Returns a DataFrame with the plain elements schema.
    """
    w = Window.partitionBy("kind", "id").orderBy(
        F.desc_nulls_last("version"), F.desc("seq")
    )
    final_state = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
    upserts = final_state.where(F.col("action") != "delete").select(
        *ELEMENTS_SCHEMA.fieldNames()
    )
    changed_keys = final_state.select("kind", "id")
    survivors = elements.join(
        F.broadcast(changed_keys), ["kind", "id"], "left_anti"
    )
    return survivors.unionByName(upserts)
