"""Pure-Python OSM PBF (ProtocolBuffer Binary Format) decoder.

Implements the publicly documented OSM PBF container + osmformat messages
(https://wiki.openstreetmap.org/wiki/PBF_Format) with a hand-rolled protobuf
wire-format reader — the ``protobuf`` package is not required.

Produces, per decoded ``OSMData`` blob, columnar dicts matching the element
schema of the reference's scan primitive (DuckDB-spatial ``ST_READOSM``,
reference quackosm/pbf_file_reader.py:1199; SURVEY §1.1):

    kind: node|way|relation, id, tags, refs, ref_types, ref_roles, lat, lon

Design notes for scale: PBF files are a sequence of independently decodable
blobs (~8 MB raw each), so the blob is the natural Spark split unit.
``index_blobs`` does a cheap header-only scan (seek over payloads); decoding
happens inside executor tasks. Varint parsing is a tight Python loop, but
delta/zigzag accumulation and coordinate scaling are vectorized with numpy.
"""

from __future__ import annotations

import struct
import zlib
from dataclasses import dataclass
from typing import Any, BinaryIO, Iterator

import numpy as np

MEMBER_TYPES = ("node", "way", "relation")  # osmformat enum NODE=0, WAY=1, RELATION=2

NANODEGREE = 1e-9


# --------------------------------------------------------------------------
# protobuf wire format primitives
# --------------------------------------------------------------------------

def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _skip_field(buf: memoryview, pos: int, wire_type: int) -> int:
    if wire_type == 0:
        _, pos = _read_varint(buf, pos)
        return pos
    if wire_type == 1:
        return pos + 8
    if wire_type == 2:
        length, pos = _read_varint(buf, pos)
        return pos + length
    if wire_type == 5:
        return pos + 4
    raise ValueError(f"Unsupported wire type {wire_type}")


def iter_fields(buf: memoryview) -> Iterator[tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) over one message.

    Length-delimited values are returned as memoryview slices; varints as int.
    """
    pos = 0
    end = len(buf)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field = tag >> 3
        wire = tag & 7
        if wire == 0:
            val, pos = _read_varint(buf, pos)
            yield field, wire, val
        elif wire == 2:
            length, pos = _read_varint(buf, pos)
            yield field, wire, buf[pos : pos + length]
            pos += length
        elif wire == 1:
            yield field, wire, buf[pos : pos + 8]
            pos += 8
        elif wire == 5:
            yield field, wire, buf[pos : pos + 4]
            pos += 4
        else:
            pos = _skip_field(buf, pos, wire)


def _decode_packed_varints(buf: memoryview) -> np.ndarray:
    """Packed varint payload → int64 array (two's-complement wraparound for
    values that overflow 64 bits, matching protobuf int64 semantics).

    Fully vectorized: continuation bits mark varint boundaries; each byte's
    7-bit payload is shifted by 7×(its offset within its varint) and the
    per-varint pieces are OR-combined with ``bitwise_or.reduceat``. Valid
    varints are ≤10 bytes, so shifts stay ≤63 and uint64 shifting drops
    overflow bits exactly like the protobuf ``& 0xFFFF...`` wraparound.
    This is the decode hot loop — every dense-node id/lat/lon/kv stream and
    every way ref list is a packed-varint payload. Buffers under ~300 bytes
    (short way-ref/tag lists) take a plain Python loop instead: ~10 numpy
    array ops cost more than a 30-iteration loop (measured on monaco:
    vectorized-only decode is 2× SLOWER than the loop, hybrid is 1.6×
    faster — 105k → 160k elem/s single-thread)."""
    b = np.frombuffer(buf, dtype=np.uint8)
    if b.size == 0:
        return np.array([], dtype=np.int64)
    if b.size < 300:
        out: list[int] = []
        pos = 0
        end = len(buf)
        while pos < end:
            v, pos = _read_varint(buf, pos)
            out.append(v & 0xFFFFFFFFFFFFFFFF)
        return np.array(out, dtype=np.uint64).view(np.int64)
    cont = (b & 0x80) != 0
    if cont[-1]:
        raise ValueError("truncated varint in packed field")
    is_start = np.empty(b.size, dtype=bool)
    is_start[0] = True
    np.logical_not(cont[:-1], out=is_start[1:])
    starts = np.flatnonzero(is_start)
    # offset of each byte within its varint = index − start of its varint
    offsets = np.arange(b.size, dtype=np.uint64) - np.repeat(
        starts.astype(np.uint64), np.diff(np.append(starts, b.size))
    )
    pieces = (b & 0x7F).astype(np.uint64) << (np.uint64(7) * offsets)
    return np.bitwise_or.reduceat(pieces, starts).view(np.int64)


def _zigzag_decode(arr: np.ndarray) -> np.ndarray:
    u = arr.view(np.uint64)
    return ((u >> np.uint64(1)).astype(np.int64)) ^ -(arr & 1)


# --------------------------------------------------------------------------
# Blob container
# --------------------------------------------------------------------------

@dataclass(frozen=True)
class BlobRef:
    """Location of one blob inside a PBF file (header already parsed)."""

    offset: int  # file offset of the blob payload (after BlobHeader)
    size: int  # payload byte length
    kind: str  # "OSMHeader" | "OSMData"


def index_blobs(path: str) -> list[BlobRef]:
    """Header-only scan: read each 4-byte length + BlobHeader, seek over data."""
    refs: list[BlobRef] = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if len(head) < 4:
                break
            (header_len,) = struct.unpack(">I", head)
            header = memoryview(f.read(header_len))
            blob_type = ""
            datasize = 0
            for field, wire, val in iter_fields(header):
                if field == 1 and wire == 2:
                    blob_type = bytes(val).decode("utf-8")
                elif field == 3 and wire == 0:
                    datasize = val
            offset = f.tell()
            refs.append(BlobRef(offset=offset, size=datasize, kind=blob_type))
            f.seek(datasize, 1)
    return refs


KNOWN_FEATURES = {"OsmSchema-V0.6", "DenseNodes", "HistoricalInformation"}


def check_header_features(path: str) -> list[str]:
    """Parse the OSMHeader's required_features; raise on features this
    decoder doesn't implement (per spec, readers MUST reject files whose
    required features they don't support)."""
    refs = [r for r in index_blobs(path) if r.kind == "OSMHeader"]
    required: list[str] = []
    with open(path, "rb") as f:
        for ref in refs:
            payload = read_blob_payload(f, ref)
            for field, wire, val in iter_fields(memoryview(payload)):
                if field == 4 and wire == 2:  # required_features
                    required.append(bytes(val).decode("utf-8"))
    unsupported = [r for r in required if r not in KNOWN_FEATURES]
    if unsupported:
        raise ValueError(
            f"PBF file {path} requires unsupported features: {unsupported}"
        )
    return required


def read_blob_payload(f: BinaryIO, ref: BlobRef) -> bytes:
    """Read + decompress one blob's raw protobuf payload.

    Covers the full fileformat.proto Blob surface (reference relies on
    DuckDB-spatial's reader, which is zlib-only in practice): raw (field 1),
    zlib (3), lzma (4), lz4 block (6, needs raw_size), zstd (7). lz4/zstd
    decompress via pyarrow codecs, lzma via the stdlib.
    """
    f.seek(ref.offset)
    blob = memoryview(f.read(ref.size))
    raw_size: int | None = None
    payloads: dict[int, memoryview] = {}
    for field, wire, val in iter_fields(blob):
        if field == 2 and wire == 0:
            raw_size = int(val)
        elif wire == 2 and field in (1, 3, 4, 6, 7):
            payloads[field] = val
    if 1 in payloads:  # raw
        return bytes(payloads[1])
    if 3 in payloads:  # zlib
        return zlib.decompress(bytes(payloads[3]))
    if 4 in payloads:  # lzma
        import lzma

        return lzma.decompress(bytes(payloads[4]))
    if 6 in payloads:  # lz4 block format: needs the decompressed size
        import pyarrow as pa

        if raw_size is None:
            raise ValueError("lz4 blob without raw_size")
        return pa.Codec("lz4_raw").decompress(
            bytes(payloads[6]), raw_size
        ).to_pybytes()
    if 7 in payloads:  # zstd (raw_size is mandatory for compressed blobs per spec)
        import pyarrow as pa

        if raw_size is None:
            raise ValueError("zstd blob without raw_size")
        return pa.Codec("zstd").decompress(
            bytes(payloads[7]), raw_size
        ).to_pybytes()
    raise ValueError("Blob has no supported payload (fields 1/3/4/6/7 absent)")


# --------------------------------------------------------------------------
# PrimitiveBlock → columnar element dicts
# --------------------------------------------------------------------------

def decode_primitive_block(payload: bytes) -> list[dict[str, Any]]:
    """Decode one OSMData payload into per-group columnar dicts.

    Each dict has keys: kind (str), ids (np.int64 array), tags (list of
    list[(k, v)] or None), lats/lons (np arrays, nodes only), refs /
    ref_types / ref_roles (lists, ways+relations only).
    """
    buf = memoryview(payload)
    string_table: list[str] = []
    groups: list[memoryview] = []
    granularity = 100
    lat_offset = 0
    lon_offset = 0
    for field, wire, val in iter_fields(buf):
        if field == 1 and wire == 2:  # stringtable
            for f2, w2, v2 in iter_fields(val):
                if f2 == 1 and w2 == 2:
                    string_table.append(bytes(v2).decode("utf-8", errors="replace"))
        elif field == 2 and wire == 2:
            groups.append(val)
        elif field == 17:
            granularity = val
        elif field == 19:
            lat_offset = val
        elif field == 20:
            lon_offset = val

    out: list[dict[str, Any]] = []
    for group in groups:
        for field, wire, val in iter_fields(group):
            if field == 1 and wire == 2:  # plain Node (rare)
                out.append(_decode_plain_nodes([val], string_table, granularity, lat_offset, lon_offset))
            elif field == 2 and wire == 2:  # DenseNodes
                out.append(_decode_dense_nodes(val, string_table, granularity, lat_offset, lon_offset))
            elif field == 3 and wire == 2:  # Way
                out.append(_decode_ways([val], string_table))
            elif field == 4 and wire == 2:  # Relation
                out.append(_decode_relations([val], string_table))
            # field 5 = changesets: ignored (ST_READOSM exposes none)
    # merge consecutive chunks of the same kind to keep batch counts low
    return _coalesce_groups(out)


def _coalesce_groups(chunks: list[dict[str, Any]]) -> list[dict[str, Any]]:
    merged: list[dict[str, Any]] = []
    for chunk in chunks:
        if merged and merged[-1]["kind"] == chunk["kind"]:
            prev = merged[-1]
            prev["ids"] = np.concatenate([prev["ids"], chunk["ids"]])
            prev["tags"].extend(chunk["tags"])
            for key in ("lats", "lons"):
                if key in prev:
                    prev[key] = np.concatenate([prev[key], chunk[key]])
            for key in ("refs", "ref_types", "ref_roles"):
                if key in prev:
                    prev[key].extend(chunk[key])
        else:
            merged.append(chunk)
    return merged


def _decode_kv(keys: np.ndarray, vals: np.ndarray, st: list[str]) -> list[tuple[str, str]] | None:
    if len(keys) == 0:
        return None
    return [(st[k], st[v]) for k, v in zip(keys.tolist(), vals.tolist())]


_MASK64 = 0xFFFFFFFFFFFFFFFF


def _packed_list(buf: memoryview) -> list[int]:
    """Packed varints as a plain Python list — the per-message small path
    (way/relation key/val/ref fields are usually tens of values; see the
    threshold note on _decode_packed_varints). Values are int64-signed on
    both paths (protobuf int64 wraparound), so path choice never changes
    results."""
    if len(buf) >= 300:
        return _decode_packed_varints(buf).tolist()
    out: list[int] = []
    pos = 0
    end = len(buf)
    while pos < end:
        v, pos = _read_varint(buf, pos)
        v &= _MASK64
        out.append(v - 0x10000000000000000 if v >= 0x8000000000000000 else v)
    return out


def _packed_delta_list(buf: memoryview) -> list[int]:
    """Packed zigzag-delta varints → absolute values, fused in one pass
    (decode + zigzag + running sum without three numpy round-trips)."""
    if len(buf) >= 300:
        return np.cumsum(
            _zigzag_decode(_decode_packed_varints(buf)), dtype=np.int64
        ).tolist()
    out: list[int] = []
    pos = 0
    acc = 0
    end = len(buf)
    while pos < end:
        v, pos = _read_varint(buf, pos)
        v &= _MASK64
        acc += (v >> 1) ^ -(v & 1)
        out.append(acc)
    return out


def _kv_lists(keys: list[int], vals: list[int], st: list[str]) -> list[tuple[str, str]] | None:
    if not keys:
        return None
    return [(st[k], st[v]) for k, v in zip(keys, vals)]


def _decode_plain_nodes(
    node_bufs: list[memoryview],
    st: list[str],
    granularity: int,
    lat_offset: int,
    lon_offset: int,
) -> dict[str, Any]:
    ids: list[int] = []
    lats: list[float] = []
    lons: list[float] = []
    tags: list[list[tuple[str, str]] | None] = []
    for nb in node_bufs:
        nid = 0
        keys: np.ndarray = np.array([], dtype=np.int64)
        vals: np.ndarray = np.array([], dtype=np.int64)
        lat_raw = 0
        lon_raw = 0
        def _zz(v: int) -> int:
            u = v & 0xFFFFFFFFFFFFFFFF
            return (u >> 1) ^ -(u & 1)

        for field, wire, val in iter_fields(nb):
            if field == 1:
                nid = _zz(val)
            elif field == 2 and wire == 2:
                keys = _decode_packed_varints(val)
            elif field == 3 and wire == 2:
                vals = _decode_packed_varints(val)
            elif field == 8:
                lat_raw = _zz(val)
            elif field == 9:
                lon_raw = _zz(val)
        ids.append(int(nid))
        lats.append(NANODEGREE * (lat_offset + granularity * int(lat_raw)))
        lons.append(NANODEGREE * (lon_offset + granularity * int(lon_raw)))
        tags.append(_decode_kv(keys, vals, st))
    return {
        "kind": "node",
        "ids": np.array(ids, dtype=np.int64),
        "lats": np.array(lats, dtype=np.float64),
        "lons": np.array(lons, dtype=np.float64),
        "tags": tags,
    }


def _decode_dense_nodes(
    buf: memoryview,
    st: list[str],
    granularity: int,
    lat_offset: int,
    lon_offset: int,
) -> dict[str, Any]:
    ids = np.array([], dtype=np.int64)
    lats = np.array([], dtype=np.int64)
    lons = np.array([], dtype=np.int64)
    keys_vals = np.array([], dtype=np.int64)
    for field, wire, val in iter_fields(buf):
        if field == 1 and wire == 2:
            ids = _zigzag_decode(_decode_packed_varints(val))
        elif field == 8 and wire == 2:
            lats = _zigzag_decode(_decode_packed_varints(val))
        elif field == 9 and wire == 2:
            lons = _zigzag_decode(_decode_packed_varints(val))
        elif field == 10 and wire == 2:
            keys_vals = _decode_packed_varints(val)
    ids = np.cumsum(ids, dtype=np.int64)
    lat_deg = NANODEGREE * (lat_offset + granularity * np.cumsum(lats, dtype=np.int64))
    lon_deg = NANODEGREE * (lon_offset + granularity * np.cumsum(lons, dtype=np.int64))

    tags: list[list[tuple[str, str]] | None]
    if keys_vals.size == 0:
        tags = [None] * len(ids)
    else:
        tags = []
        kv = keys_vals.tolist()
        i = 0
        n = len(kv)
        for _ in range(len(ids)):
            if i >= n:
                tags.append(None)
                continue
            row: list[tuple[str, str]] | None = None
            while i < n and kv[i] != 0:
                if row is None:
                    row = []
                row.append((st[kv[i]], st[kv[i + 1]]))
                i += 2
            i += 1  # skip the 0 delimiter
            tags.append(row)
    return {
        "kind": "node",
        "ids": ids,
        "lats": lat_deg,
        "lons": lon_deg,
        "tags": tags,
    }


def _decode_ways(way_bufs: list[memoryview], st: list[str]) -> dict[str, Any]:
    ids: list[int] = []
    tags: list[list[tuple[str, str]] | None] = []
    refs: list[list[int]] = []
    for wb in way_bufs:
        wid = 0
        keys: list[int] = []
        vals: list[int] = []
        way_refs: list[int] = []
        for field, wire, val in iter_fields(wb):
            if field == 1:
                wid = val
            elif field == 2 and wire == 2:
                keys = _packed_list(val)
            elif field == 3 and wire == 2:
                vals = _packed_list(val)
            elif field == 8 and wire == 2:
                way_refs = _packed_delta_list(val)
        ids.append(wid)
        tags.append(_kv_lists(keys, vals, st))
        refs.append(way_refs)
    return {
        "kind": "way",
        "ids": np.array(ids, dtype=np.int64),
        "tags": tags,
        "refs": refs,
        "ref_types": [None] * len(ids),
        "ref_roles": [None] * len(ids),
    }


def _decode_relations(rel_bufs: list[memoryview], st: list[str]) -> dict[str, Any]:
    ids: list[int] = []
    tags: list[list[tuple[str, str]] | None] = []
    refs: list[list[int]] = []
    ref_types: list[list[str] | None] = []
    ref_roles: list[list[str] | None] = []
    for rb in rel_bufs:
        rid = 0
        keys: list[int] = []
        vals: list[int] = []
        roles_sid: list[int] = []
        memids: list[int] = []
        types: list[int] = []
        for field, wire, val in iter_fields(rb):
            if field == 1:
                rid = val
            elif field == 2 and wire == 2:
                keys = _packed_list(val)
            elif field == 3 and wire == 2:
                vals = _packed_list(val)
            elif field == 8 and wire == 2:
                roles_sid = _packed_list(val)
            elif field == 9 and wire == 2:
                memids = _packed_delta_list(val)
            elif field == 10 and wire == 2:
                types = _packed_list(val)
        ids.append(rid)
        tags.append(_kv_lists(keys, vals, st))
        refs.append(memids)
        ref_types.append([MEMBER_TYPES[t] for t in types] or None)
        # sid 0 points at the string table's mandatory "" entry — an absent
        # role; surface as NULL so role-default semantics (COALESCE → 'outer')
        # apply downstream.
        ref_roles.append([st[s] if s != 0 else None for s in roles_sid] or None)
    return {
        "kind": "relation",
        "ids": np.array(ids, dtype=np.int64),
        "tags": tags,
        "refs": refs,
        "ref_types": ref_types,
        "ref_roles": ref_roles,
    }
