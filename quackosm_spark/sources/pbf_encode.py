"""OSM PBF encoder — the write-side complement of ``pbf_decode``.

Produces spec-compliant `.osm.pbf` files (OSMHeader + zlib OSMData blobs,
DenseNodes for nodes, delta-coded refs/members) from element record dicts.
Primary uses: synthesizing large multi-blob fixtures so the Spark source's
blob-level partitioning is actually exercised, and write→read roundtrip
testing of the decoder. Wire format per the public spec
(https://wiki.openstreetmap.org/wiki/PBF_Format).
"""

from __future__ import annotations

import struct
import zlib
from typing import Any, Iterable, Sequence

MEMBER_TYPE_CODE = {"node": 0, "way": 1, "relation": 2}


# --------------------------------------------------------------------------
# protobuf wire-format writers
# --------------------------------------------------------------------------

def _varint(value: int) -> bytes:
    out = bytearray()
    v = value & 0xFFFFFFFFFFFFFFFF
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _zigzag(value: int) -> int:
    return (value << 1) ^ (value >> 63)


def _tag(field: int, wire: int) -> bytes:
    return _varint((field << 3) | wire)


def _len_delim(field: int, payload: bytes) -> bytes:
    return _tag(field, 2) + _varint(len(payload)) + payload


def _varint_field(field: int, value: int) -> bytes:
    return _tag(field, 0) + _varint(value)


def _packed(field: int, values: Iterable[int]) -> bytes:
    body = b"".join(_varint(v) for v in values)
    return _len_delim(field, body)


def _packed_delta_zigzag(field: int, values: Sequence[int]) -> bytes:
    deltas = []
    prev = 0
    for v in values:
        deltas.append(_zigzag(v - prev))
        prev = v
    return _packed(field, deltas)


# --------------------------------------------------------------------------
# string table
# --------------------------------------------------------------------------

class _StringTable:
    def __init__(self) -> None:
        self._index: dict[str, int] = {"": 0}
        self._strings: list[str] = [""]

    def add(self, s: str) -> int:
        idx = self._index.get(s)
        if idx is None:
            idx = len(self._strings)
            self._index[s] = idx
            self._strings.append(s)
        return idx

    def encode(self) -> bytes:
        return _len_delim(
            1, b"".join(_len_delim(1, s.encode("utf-8")) for s in self._strings)
        )


# --------------------------------------------------------------------------
# primitive groups
# --------------------------------------------------------------------------

def _encode_dense_nodes(nodes: list[dict[str, Any]], st: _StringTable) -> bytes:
    ids, lats, lons, kvs = [], [], [], []
    for n in nodes:
        ids.append(int(n["id"]))
        lats.append(int(round(n["lat"] * 1e7)))  # granularity 100, nano degrees
        lons.append(int(round(n["lon"] * 1e7)))
        for k, v in (n.get("tags") or {}).items():
            kvs.append(st.add(k))
            kvs.append(st.add(v))
        kvs.append(0)
    dense = (
        _packed_delta_zigzag(1, ids)
        + _packed_delta_zigzag(8, lats)
        + _packed_delta_zigzag(9, lons)
        + _packed(10, kvs)
    )
    return _len_delim(2, _len_delim(2, dense))


def _encode_way(way: dict[str, Any], st: _StringTable) -> bytes:
    body = _varint_field(1, int(way["id"]))
    tags = way.get("tags") or {}
    if tags:
        body += _packed(2, [st.add(k) for k in tags])
        body += _packed(3, [st.add(v) for v in tags.values()])
    body += _packed_delta_zigzag(8, [int(r) for r in way["refs"]])
    return _len_delim(3, body)


def _encode_relation(rel: dict[str, Any], st: _StringTable) -> bytes:
    body = _varint_field(1, int(rel["id"]))
    tags = rel.get("tags") or {}
    if tags:
        body += _packed(2, [st.add(k) for k in tags])
        body += _packed(3, [st.add(v) for v in tags.values()])
    roles = rel.get("ref_roles") or [None] * len(rel["refs"])
    types = rel.get("ref_types") or ["way"] * len(rel["refs"])
    body += _packed(8, [st.add(r) if r is not None else 0 for r in roles])
    body += _packed_delta_zigzag(9, [int(r) for r in rel["refs"]])
    body += _packed(10, [MEMBER_TYPE_CODE[t] for t in types])
    return _len_delim(4, body)


def _encode_primitive_block(elements: list[dict[str, Any]]) -> bytes:
    st = _StringTable()
    groups: list[bytes] = []
    nodes = [e for e in elements if e["kind"] == "node"]
    if nodes:
        groups.append(_encode_dense_nodes(nodes, st))
    for e in elements:
        if e["kind"] == "way":
            groups.append(_len_delim(2, _encode_way(e, st)))
        elif e["kind"] == "relation":
            groups.append(_len_delim(2, _encode_relation(e, st)))
    # stringtable MUST precede groups; granularity defaults (100) apply
    return st.encode() + b"".join(groups)


# --------------------------------------------------------------------------
# blob container
# --------------------------------------------------------------------------

#: Blob field number per fileformat.proto for each compression scheme.
_BLOB_FIELDS = {"zlib": 3, "lzma": 4, "lz4": 6, "zstd": 7, "raw": 1}


def _blob(kind: str, payload: bytes, compression: str = "zlib") -> bytes:
    if compression == "zlib":
        compressed = zlib.compress(payload, 6)
    elif compression == "lzma":
        import lzma

        compressed = lzma.compress(payload)
    elif compression == "lz4":
        import pyarrow as pa

        compressed = pa.Codec("lz4_raw").compress(payload).to_pybytes()
    elif compression == "zstd":
        import pyarrow as pa

        compressed = pa.Codec("zstd").compress(payload).to_pybytes()
    elif compression == "raw":
        compressed = payload
    else:
        raise ValueError(f"unsupported blob compression: {compression}")
    blob_body = _varint_field(2, len(payload)) + _len_delim(
        _BLOB_FIELDS[compression], compressed
    )
    header = _len_delim(1, kind.encode()) + _varint_field(3, len(blob_body))
    return struct.pack(">I", len(header)) + header + blob_body


def _header_block() -> bytes:
    # required_features: OsmSchema-V0.6 + DenseNodes
    body = _len_delim(4, b"OsmSchema-V0.6") + _len_delim(4, b"DenseNodes")
    return _blob("OSMHeader", body)


def write_pbf(
    path: str,
    elements: Iterable[dict[str, Any]],
    elements_per_block: int = 8000,
    compression: str = "zlib",
) -> str:
    """Write element dicts (keys: kind, id, tags, lat/lon or refs/ref_types/
    ref_roles) to an ``.osm.pbf`` file, ``elements_per_block`` per OSMData
    blob — small values produce many blobs, i.e. many Spark input splits.
    ``compression`` ∈ {zlib, zstd, lz4, lzma, raw} (fileformat.proto blob
    schemes; real-world files are zlib, newer tools emit zstd)."""
    with open(path, "wb") as f:
        f.write(_header_block())
        block: list[dict[str, Any]] = []
        for e in elements:
            block.append(e)
            if len(block) >= elements_per_block:
                f.write(_blob("OSMData", _encode_primitive_block(block), compression))
                block = []
        if block:
            f.write(_blob("OSMData", _encode_primitive_block(block), compression))
    return path
