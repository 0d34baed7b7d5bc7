"""Top-level conversion API (the Spark analogue of quackosm/functions.py)."""

from __future__ import annotations


def convert_pbf_to_dataframe(*args, **kwargs):
    raise NotImplementedError("wired up in plans.pipeline (in progress)")


def convert_pbf_to_parquet(*args, **kwargs):
    raise NotImplementedError("wired up in plans.pipeline (in progress)")
