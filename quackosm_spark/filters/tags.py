"""OSM tags filter algebra and its compilation to Spark Column expressions.

Semantics follow the reference exactly (cited per function) but the compile
target is the DataFrame Column API instead of generated SQL strings — Catalyst
constant-folds the resulting expression tree, and there is no SQL-injection
surface to escape against.

Filter shapes:

- ``OsmTagsFilter``:  ``{key: True | False | "value" | ["v1", "v2"]}``
- ``GroupedOsmTagsFilter``: ``{group_name: OsmTagsFilter}`` (e.g. the
  Geofabrik layer definitions).

Compilation rule (reference: pbf_file_reader.py:2518-2564):
``(OR of positive clauses) AND (AND of negative clauses)``; if there are no
positive clauses the positive side is vacuously true. A ``*`` inside a value
or key becomes an SQL ``LIKE`` ``%`` wildcard.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping
from functools import reduce
from typing import Union

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from quackosm_spark.constants import (
    METADATA_TAG_PREFIXES_TO_IGNORE,
    METADATA_TAGS_TO_IGNORE,
)

OsmTagsFilter = Mapping[str, Union[list[str], str, bool]]
GroupedOsmTagsFilter = Mapping[str, OsmTagsFilter]


def _is_flat_filter(value: object) -> bool:
    return isinstance(value, Mapping) and all(
        isinstance(v, (bool, str)) or (isinstance(v, list) and all(isinstance(x, str) for x in v))
        for v in value.values()
    )


def _is_grouped_filter(value: object) -> bool:
    return (
        isinstance(value, Mapping)
        and len(value) > 0
        and all(_is_flat_filter(v) for v in value.values())
        # A flat filter of empty-list values would also pass the check above;
        # grouped filters have Mapping values, flat ones never do.
        and all(isinstance(v, Mapping) for v in value.values())
    )


def merge_osm_tags_filter(
    tags_filter: Union[OsmTagsFilter, GroupedOsmTagsFilter, Iterable[OsmTagsFilter]],
) -> OsmTagsFilter:
    """Flatten any accepted filter shape into a single ``OsmTagsFilter``.

    Merge rules (reference: _osm_tags_filters.py:120-176):

    - ``True`` absorbs any other positive value for the same key.
    - string / list values accumulate (deduplicated, insertion order).
    - mixing a positive value and ``False`` for one key raises ``ValueError``.
    """
    if _is_flat_filter(tags_filter):
        return tags_filter  # type: ignore[return-value]
    if _is_grouped_filter(tags_filter):
        return _merge_filter_sequence(tags_filter.values())  # type: ignore[union-attr]
    if isinstance(tags_filter, Iterable) and not isinstance(tags_filter, Mapping):
        return _merge_filter_sequence(
            [merge_osm_tags_filter(sub) for sub in tags_filter]  # type: ignore[arg-type]
        )
    raise AttributeError(
        "Provided tags don't match required type definitions"
        " (OsmTagsFilter or GroupedOsmTagsFilter)."
    )


def _merge_filter_sequence(filters: Iterable[OsmTagsFilter]) -> OsmTagsFilter:
    merged: dict[str, Union[list[str], str, bool]] = {}
    for tags_filter in filters:
        if not _is_flat_filter(tags_filter):
            raise ValueError("Provided filter doesn't match the OsmTagsFilter definition.")
        for key, value in tags_filter.items():
            existing = merged.get(key)
            existing_positive = existing is True or (isinstance(existing, list) and existing)
            existing_negative = existing is False
            incoming_negative = value is False
            if (existing_positive and incoming_negative) or (
                existing_negative and not incoming_negative
            ):
                raise ValueError(
                    "Provided OSM tags filter values cannot be merged.\n"
                    f"There is a conflict between the following values with '{key}' key:"
                    f" {existing} and {value}."
                )
            if existing is True:
                continue
            if value is True:
                merged[key] = True
            elif value is False:
                merged[key] = False
            else:
                bucket = merged.setdefault(key, [])
                assert isinstance(bucket, list)
                values = [value] if isinstance(value, str) else value
                for v in values:
                    if v not in bucket:
                        bucket.append(v)
    return merged


def has_positive_clause(
    tags_filter: Union[OsmTagsFilter, GroupedOsmTagsFilter, None],
) -> bool:
    """True iff any value in the (possibly grouped) filter is not ``False``.

    Drives the ``explode_tags`` default (reference: _osm_tags_filters.py:80-97,
    pbf_file_reader.py:416-419).
    """
    if tags_filter is None:
        return False
    if _is_grouped_filter(tags_filter):
        return any(has_positive_clause(group) for group in tags_filter.values())  # type: ignore[union-attr]
    if _is_flat_filter(tags_filter):
        return any(v is not False for v in tags_filter.values())
    raise AttributeError(
        "Provided tags don't match required type definitions"
        " (OsmTagsFilter or GroupedOsmTagsFilter)."
    )


def star_to_like_pattern(value: str) -> str:
    """``addr:*`` → ``addr:%`` (``**`` collapses first; reference
    pbf_file_reader.py:1518-1525)."""
    while "**" in value:
        value = value.replace("**", "*")
    return value.replace("*", "%")


def compile_tags_filter(
    tags_filter: Union[OsmTagsFilter, None],
    tags_col: Union[str, Column] = "tags",
) -> Column:
    """Compile a merged (flat, wildcard-key-expanded) filter to one Column.

    Reference: pbf_file_reader.py:2518-2564. ``{k: True}`` → key present;
    ``{k: False}`` → key absent (AND side); ``{k: "v"}`` → equality;
    ``"*"`` in a value → LIKE.
    """
    tags = F.col(tags_col) if isinstance(tags_col, str) else tags_col
    positive: list[Column] = []
    negative: list[Column] = []
    true_keys: list[str] = []
    false_keys: list[str] = []
    for key, value in (tags_filter or {}).items():
        if value is True:
            true_keys.append(key)
        elif value is False:
            false_keys.append(key)
        else:
            values = [value] if isinstance(value, str) else value
            for single in values:
                if "*" in single:
                    positive.append(tags[key].like(star_to_like_pattern(single)))
                else:
                    positive.append(tags[key] == single)
    # Key presence/absence over MANY keys (e.g. a wildcard key expanded
    # against the data) compiles to ONE set-membership expression instead of
    # a chained OR/AND — a per-key chain overflows the JVM stack above a few
    # hundred clauses and defeats whole-stage codegen long before that.
    if len(true_keys) == 1:
        positive.append(F.map_contains_key(tags, F.lit(true_keys[0])))
    elif true_keys:
        positive.append(
            F.arrays_overlap(F.map_keys(tags), F.array(*[F.lit(k) for k in true_keys]))
        )
    if len(false_keys) == 1:
        negative.append(~F.map_contains_key(tags, F.lit(false_keys[0])))
    elif false_keys:
        negative.append(
            ~F.arrays_overlap(F.map_keys(tags), F.array(*[F.lit(k) for k in false_keys]))
        )
    clause = _balanced_fold(Column.__or__, positive) if positive else F.lit(True)
    if negative:
        clause = clause & _balanced_fold(Column.__and__, negative)
    return clause


def _balanced_fold(op, cols: list[Column]) -> Column:
    """Fold to a balanced tree (depth log n) — a left-leaning ``reduce``
    chain over hundreds of clauses overflows the JVM stack during Column
    conversion."""
    while len(cols) > 1:
        cols = [
            op(cols[i], cols[i + 1]) if i + 1 < len(cols) else cols[i]
            for i in range(0, len(cols), 2)
        ]
    return cols[0]


def expand_wildcard_keys(
    elements: DataFrame,
    tags_filter: Union[OsmTagsFilter, GroupedOsmTagsFilter, None],
    tags_col: str = "tags",
) -> Union[OsmTagsFilter, GroupedOsmTagsFilter, None]:
    """Expand ``*`` inside filter *keys* against the data.

    Reference: pbf_file_reader.py:1460-1516. Requires one distinct-keys pass
    (a driver-side collect of the distinct key set — the same two-phase shape
    as the reference; at 100 TB the distinct-key set is still tiny).
    """
    if tags_filter is None:
        return None
    if _is_grouped_filter(tags_filter):
        groups: GroupedOsmTagsFilter = tags_filter  # type: ignore[assignment]
        if not any("*" in k for g in groups.values() for k in g):
            return tags_filter
        distinct_keys = _collect_distinct_keys(elements, tags_col)
        return {
            group: _expand_flat(flat, distinct_keys) for group, flat in groups.items()
        }
    flat: OsmTagsFilter = tags_filter  # type: ignore[assignment]
    if not any("*" in k for k in flat):
        return tags_filter
    return _expand_flat(flat, _collect_distinct_keys(elements, tags_col))


def _collect_distinct_keys(elements: DataFrame, tags_col: str) -> list[str]:
    rows = (
        elements.where(F.col(tags_col).isNotNull())
        .select(F.explode(F.map_keys(F.col(tags_col))).alias("tag"))
        .distinct()
        .collect()
    )
    return [r["tag"] for r in rows]


def _sql_like_match(pattern: str, value: str) -> bool:
    # LIKE semantics: % = any run, _ = any single char (faithful to the
    # reference's LIKE-based expansion).
    import re

    regex = "^" + "".join(
        ".*" if ch == "%" else "." if ch == "_" else re.escape(ch) for ch in pattern
    ) + "$"
    return re.match(regex, value) is not None


def _expand_flat(flat: OsmTagsFilter, distinct_keys: list[str]) -> OsmTagsFilter:
    pairs: list[tuple[str, Union[list[str], str, bool]]] = []
    for key, value in flat.items():
        if "*" in key:
            pattern = star_to_like_pattern(key)
            matches = [k for k in distinct_keys if _sql_like_match(pattern, k)]
        else:
            matches = [key]
        for match in sorted(matches, key=str.casefold):
            pairs.append((match, value))
    return _merge_filter_sequence({k: v} for k, v in pairs)


def strip_metadata_tags(tags: Union[str, Column] = "tags") -> Column:
    """Remove GDAL-ignored metadata tags from the map column.

    Reference: pbf_file_reader.py:2566-2595 (including the fast-path guard
    that leaves untouched maps as-is — same shape via ``when``).
    """
    col = F.col(tags) if isinstance(tags, str) else tags
    ignore = F.array(*[F.lit(t) for t in METADATA_TAGS_TO_IGNORE])
    def _starts_with(prefix: str):
        return lambda k: k.startswith(prefix)

    prefix_hit = reduce(
        Column.__or__,
        [F.exists(F.map_keys(col), _starts_with(p))
         for p in METADATA_TAG_PREFIXES_TO_IGNORE],
    )
    needs_rebuild = (F.size(F.array_intersect(F.map_keys(col), ignore)) > 0) | prefix_hit
    rebuilt = F.map_filter(
        col,
        lambda k, _v: ~F.array_contains(ignore, k)
        & reduce(
            Column.__and__,
            [~k.startswith(p) for p in METADATA_TAG_PREFIXES_TO_IGNORE],
        ),
    )
    return F.when(needs_rebuild, rebuilt).otherwise(col)
