"""Bucketed-table sink: the shuffle-elimination path for repeated big joins.

A 100 TB fact table joined more than once on the same key should pay its
shuffle ONCE, at write time: ``bucketBy(n, key).sortBy(key)`` persists the
hash-partitioned, per-bucket-sorted layout, and every later sort-merge join
or aggregation on that key reads the layout instead of re-exchanging
(`SelectedBucketsCount` in the scan, ZERO Exchange nodes in the join plan —
pinned by tests/test_plan_shapes.py). The reference materializes
intermediate parquet between stages anyway (SURVEY §2.1 S3-S5); bucketing
is the Spark-native version of that idea that also buys co-location.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    key: str | list[str],
    buckets: int = 64,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and per-bucket sorted) parquet table
    registered in the session catalog. ``buckets`` should be sized so one
    bucket of the LARGEST co-bucketed table fits an executor's memory at
    the target scale; both sides of a co-located join must use the same
    bucket count and key."""
    keys = [key] if isinstance(key, str) else list(key)
    w = df.write.bucketBy(buckets, *keys)
    if sort:
        w = w.sortBy(*keys)
    w.mode(mode).format("parquet").saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its bucket metadata intact (a plain
    ``spark.read.parquet`` of the same files would LOSE the bucketing and
    reintroduce the shuffle)."""
    return spark.table(table)
