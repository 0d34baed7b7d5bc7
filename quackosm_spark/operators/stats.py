"""Corpus-statistics rollups.

The reference engine uses no grouping sets (SURVEY §2.4), but a training-data
pipeline reports corpus composition at several granularities at once
(per source x language, per source, grand total). ``ROLLUP`` computes all of
them in ONE shuffle — Spark expands the grouping sets map-side and partial-
aggregates each, so the cost is one pass over the corpus regardless of how
many levels are reported.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quackosm_spark.operators.text import token_count


def corpus_rollup(
    docs: DataFrame,
    group_cols: list[str] | None = None,
    text_col: str = "text",
) -> DataFrame:
    """Doc/token counts at every ROLLUP level of ``group_cols``
    (default source, lang). ``level`` is the grouping bitmask
    (0 = finest, matching SQL ``GROUPING(a, b, ...)``); grouped-out columns
    are NULL in their rollup rows, as in ANSI SQL."""
    cols = group_cols or ["source", "lang"]
    return (
        docs.rollup(*cols)
        .agg(
            F.grouping_id().alias("level"),
            F.count("*").alias("n_docs"),
            F.sum(token_count(text_col)).alias("n_tokens"),
            F.round(F.avg(F.length(F.col(text_col))), 4).alias("avg_chars"),
        )
        .select(*cols, "level", "n_docs", "n_tokens", "avg_chars")
    )
