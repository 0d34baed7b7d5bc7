"""Command-line interface — the Spark analogue of the reference's `quackosm`
command (reference quackosm/cli.py:325-1090).

Geometry filter accepted in any one of: bbox / WKT / GeoJSON / GeoJSON file /
geohash / geocode / S2 / H3 (reference parses 8 forms at cli.py:66-260). S2
tokens resolve through the pure-Python ``geometry/s2.py`` (no s2sphere
needed); H3 cells still gate on the optional `h3` library.

Built on argparse (typer/click are not available in this environment); flag
names mirror the reference's CLI surface.

Usage::

    python -m quackosm_spark.cli input.osm.pbf \
        --osm-tags-filter '{"building": true}' \
        --geom-filter-bbox 7.41,43.72,7.44,43.75 \
        --output out.parquet
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path
from typing import Any, Optional

Geometry = dict[str, Any]

_BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"


def decode_geohash_bbox(geohash: str) -> tuple[float, float, float, float]:
    """Geohash → (minx, miny, maxx, maxy), standard public algorithm
    (reference uses geohash bounds the same way, _geohash_parser.py:28-58)."""
    lat_lo, lat_hi = -90.0, 90.0
    lon_lo, lon_hi = -180.0, 180.0
    is_lon = True
    for ch in geohash.lower():
        try:
            idx = _BASE32.index(ch)
        except ValueError:
            raise ValueError(f"Invalid geohash character: {ch!r}") from None
        for bit in (16, 8, 4, 2, 1):
            if is_lon:
                mid = (lon_lo + lon_hi) / 2
                if idx & bit:
                    lon_lo = mid
                else:
                    lon_hi = mid
            else:
                mid = (lat_lo + lat_hi) / 2
                if idx & bit:
                    lat_lo = mid
                else:
                    lat_hi = mid
            is_lon = not is_lon
    return (lon_lo, lat_lo, lon_hi, lat_hi)


def _bbox_polygon(minx: float, miny: float, maxx: float, maxy: float) -> Geometry:
    return {
        "type": "Polygon",
        "coordinates": [
            [[minx, miny], [maxx, miny], [maxx, maxy], [minx, maxy], [minx, miny]]
        ],
    }


def parse_geometry_args(args: argparse.Namespace) -> Optional[Geometry]:
    """Exactly one geometry form may be provided (reference cli.py:1046-1063
    raises on multiple)."""
    provided = [
        name
        for name, value in (
            ("--geom-filter-bbox", args.geom_filter_bbox),
            ("--geom-filter-wkt", args.geom_filter_wkt),
            ("--geom-filter-geojson", args.geom_filter_geojson),
            ("--geom-filter-file", args.geom_filter_file),
            ("--geom-filter-geohash", args.geom_filter_geohash),
            ("--geom-filter-geocode", args.geom_filter_geocode),
            ("--geom-filter-s2", args.geom_filter_s2),
            ("--geom-filter-h3", args.geom_filter_h3),
        )
        if value
    ]
    if len(provided) > 1:
        raise SystemExit(
            f"Provided more than one geometry filter argument: {', '.join(provided)}."
        )
    if not provided:
        return None

    if args.geom_filter_bbox:
        try:
            parts = [float(x.strip()) for x in args.geom_filter_bbox.split(",")]
            minx, miny, maxx, maxy = parts
        except ValueError:
            raise SystemExit(
                "Cannot parse provided bounding box."
                " Valid value must contain 4 floating point numbers separated by commas."
            ) from None
        return _bbox_polygon(minx, miny, maxx, maxy)
    if args.geom_filter_wkt:
        from quackosm_spark.geometry import model

        try:
            return model.from_wkt(args.geom_filter_wkt)
        except Exception:
            raise SystemExit("Cannot parse provided WKT") from None
    if args.geom_filter_geojson:
        return _geometry_from_geojson(json.loads(args.geom_filter_geojson))
    if args.geom_filter_file:
        text = Path(args.geom_filter_file).read_text()
        return _geometry_from_geojson(json.loads(text))
    if args.geom_filter_geocode:
        from quackosm_spark.geocode import geocode_to_geometry

        try:
            return geocode_to_geometry(args.geom_filter_geocode)
        except Exception as e:  # noqa: BLE001 - network/parse failures → clean CLI error
            raise SystemExit(
                f"Cannot geocode {args.geom_filter_geocode!r}: {e}"
            ) from None
    if args.geom_filter_s2:
        # pure-Python S2 (geometry/s2.py) — no s2sphere needed; reference
        # cli.py S2GeometryParser semantics: comma-separated tokens,
        # union of cell polygons
        from quackosm_spark.geometry.s2 import cell_token_to_polygon

        rings = []
        for token in args.geom_filter_s2.split(","):
            try:
                rings.append(cell_token_to_polygon(token.strip())["coordinates"])
            except ValueError:
                raise SystemExit(
                    f"Cannot parse provided S2 value: {token.strip()}"
                ) from None
        if len(rings) == 1:
            return {"type": "Polygon", "coordinates": rings[0]}
        return {"type": "MultiPolygon", "coordinates": rings}
    if args.geom_filter_h3:
        # gated on the optional h3 library (reference uses the DuckDB h3
        # community extension — neither is installable offline)
        try:
            import h3
        except ImportError:
            raise SystemExit(
                "H3 geometry filters need the 'h3' package (not installed)."
                " Use --geom-filter-s2 / --geom-filter-geohash instead."
            ) from None
        rings = []
        for cell in args.geom_filter_h3.split(","):
            cell = cell.strip()
            try:
                boundary = h3.cell_to_boundary(cell)
            except Exception:
                raise SystemExit(
                    f"Cannot parse provided H3 value: {cell}"
                ) from None
            ring = [[lng, lat] for lat, lng in boundary]
            ring.append(ring[0])
            rings.append([ring])
        if len(rings) == 1:
            return {"type": "Polygon", "coordinates": rings[0]}
        return {"type": "MultiPolygon", "coordinates": rings}
    bbox = decode_geohash_bbox(args.geom_filter_geohash)
    return _bbox_polygon(*bbox)


def _geometry_from_geojson(doc: dict[str, Any]) -> Geometry:
    t = doc.get("type")
    if t == "FeatureCollection":
        geoms = [f["geometry"] for f in doc["features"]]
        if len(geoms) == 1:
            return geoms[0]
        return {"type": "GeometryCollection", "geometries": geoms}
    if t == "Feature":
        return doc["geometry"]
    return doc


def parse_tags_filter(args: argparse.Namespace) -> Optional[Any]:
    if args.osm_tags_filter and args.osm_tags_filter_file:
        raise SystemExit(
            "Provided both --osm-tags-filter and --osm-tags-filter-file."
        )
    if args.osm_tags_filter:
        return json.loads(args.osm_tags_filter)
    if args.osm_tags_filter_file:
        return json.loads(Path(args.osm_tags_filter_file).read_text())
    return None


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="quackosm-spark",
        description="Convert OSM PBF files to GeoParquet with PySpark.",
    )
    p.add_argument(
        "pbf_files",
        nargs="*",
        help="Input .osm.pbf file path(s); omit when using --osm-extract-query"
        " or a geometry filter with --extracts-index",
    )
    p.add_argument("--output", "-o", help="Result file path (default: content-addressed)")
    p.add_argument("--working-directory", default="files")
    p.add_argument("--osm-tags-filter", help="Tags filter as JSON")
    p.add_argument("--osm-tags-filter-file", help="Tags filter JSON file path")
    p.add_argument("--keep-all-tags", action="store_true")
    exp = p.add_mutually_exclusive_group()
    exp.add_argument("--explode-tags", dest="explode_tags", action="store_true", default=None)
    exp.add_argument("--compact-tags", dest="explode_tags", action="store_false")
    p.add_argument("--geom-filter-bbox", help="minx,miny,maxx,maxy")
    p.add_argument("--geom-filter-wkt", help="Geometry as WKT")
    p.add_argument("--geom-filter-geojson", help="Geometry as GeoJSON string")
    p.add_argument("--geom-filter-file", help="GeoJSON file path")
    p.add_argument("--geom-filter-geohash", help="Geohash cell")
    p.add_argument("--geom-filter-geocode", help="Free-text place query (Nominatim)")
    p.add_argument("--geom-filter-s2", help="S2 cell token(s), comma-separated")
    p.add_argument("--geom-filter-h3", help="H3 cell(s), comma-separated (needs h3 lib)")
    p.add_argument("--filter-osm-ids", help="Comma-separated 'node/1,way/2,relation/3'")
    p.add_argument("--custom-sql-filter", help="SQL predicate over the tags map")
    p.add_argument("--ignore-cache", action="store_true")
    p.add_argument("--keep-metadata-tags", dest="ignore_metadata_tags", action="store_false")
    sort = p.add_mutually_exclusive_group()
    sort.add_argument("--sort-result", dest="sort_result", action="store_true", default=True)
    sort.add_argument("--no-sort-result", dest="sort_result", action="store_false")
    p.add_argument(
        "--sort-algorithm",
        choices=["str", "hilbert"],
        default="hilbert",
        help="Spatial sort: Hilbert curve key (default) or STR slab packing",
    )
    p.add_argument("--wkt-result", action="store_true", help="Save geometry as WKT strings")
    p.add_argument(
        "--bbox-column",
        action="store_true",
        help="Write the GeoParquet 1.1 per-row bounds covering column "
        "(enables row-group pruning for bbox-windowed readers)",
    )
    # reference CLI dispatch matrix (cli.py:~940-1087): {pbf, osm_extract,
    # geometry} × {parquet, duckdb}
    p.add_argument(
        "--duckdb",
        action="store_true",
        help="Export into a .duckdb database file instead of GeoParquet",
    )
    p.add_argument("--duckdb-table-name", default="quackosm")
    p.add_argument(
        "--osm-extract-query",
        help="Convert a named OSM extract (fuzzy name match) instead of"
        " explicit PBF paths",
    )
    p.add_argument(
        "--extracts-index",
        help="Extracts index parquet path (id, name, file_name, parent, url,"
        " geometry as WKT strings or WKB binary) for --osm-extract-query /"
        " geometry-driven mode; omit to resolve via --osm-extract-source",
    )
    p.add_argument(
        "--osm-extract-source",
        default="any",
        help="Extract source(s) when --extracts-index is omitted: 'any',"
        " one provider name, or a comma-separated list"
        " (Geofabrik,osmfr,BBBike,GEO2Day,Movisda-admin,Movisda-grid)",
    )
    p.add_argument(
        "--extracts-index-dir",
        help="Directory holding per-source '<source>_index.parquet' files"
        " (a cache or the reference's precalculated_indexes) used by"
        " --osm-extract-source before any live fetch",
    )
    p.add_argument("--download-directory", default="files")
    return p


def main(argv: Optional[list[str]] = None) -> Path:
    args = build_parser().parse_args(argv)
    tags_filter = parse_tags_filter(args)
    geometry_filter = parse_geometry_args(args)
    filter_osm_ids = (
        [s.strip() for s in args.filter_osm_ids.split(",") if s.strip()]
        if args.filter_osm_ids
        else ()
    )

    from quackosm_spark import functions as fn
    from quackosm_spark.session import get_spark

    spark = get_spark(app_name="quackosm-spark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    convert_kwargs = dict(
        result_file_path=args.output,
        working_directory=args.working_directory,
        ignore_cache=args.ignore_cache,
        sort_result=args.sort_result,
        sort_algorithm=args.sort_algorithm,
        save_as_wkt=args.wkt_result,
        tags_filter=tags_filter,
        keep_all_tags=args.keep_all_tags,
        explode_tags=args.explode_tags,
        custom_sql_filter=args.custom_sql_filter,
        filter_osm_ids=filter_osm_ids,
        ignore_metadata_tags=args.ignore_metadata_tags,
        bbox_column=args.bbox_column,
    )
    duckdb_kwargs = (
        dict(duckdb_table_name=args.duckdb_table_name) if args.duckdb else {}
    )
    if args.duckdb:
        # duckdb export derives its own path from the parquet result
        convert_kwargs.pop("result_file_path")
        duckdb_kwargs["result_file_path"] = args.output

    def _cli_index():
        from quackosm_spark.extracts import get_source_index, load_index

        if args.extracts_index:
            return load_index(args.extracts_index, lazy_area=True)
        return get_source_index(
            args.osm_extract_source,
            cache_dir=args.extracts_index_dir,
        )

    if args.osm_extract_query:
        index = _cli_index()
        convert = (
            fn.convert_osm_extract_to_duckdb
            if args.duckdb
            else fn.convert_osm_extract_to_parquet
        )
        result = convert(
            spark,
            args.osm_extract_query,
            index,
            download_directory=args.download_directory,
            geometry_filter=geometry_filter,
            **duckdb_kwargs,
            **convert_kwargs,
        )
    elif args.pbf_files:
        convert = fn.convert_pbf_to_duckdb if args.duckdb else fn.convert_pbf_to_parquet
        result = convert(
            spark,
            args.pbf_files,
            geometry_filter=geometry_filter,
            **duckdb_kwargs,
            **convert_kwargs,
        )
    elif geometry_filter is not None:
        index = _cli_index()
        convert = (
            fn.convert_geometry_to_duckdb
            if args.duckdb
            else fn.convert_geometry_to_parquet
        )
        result = convert(
            spark,
            geometry_filter,
            index,
            download_directory=args.download_directory,
            **duckdb_kwargs,
            **convert_kwargs,
        )
    else:
        build_parser().error(
            "Provide PBF file paths, --osm-extract-query, or a geometry"
            " filter (extract indexes resolve from --extracts-index or"
            " --osm-extract-source)."
        )
    print(result)
    return result


if __name__ == "__main__":
    main()
