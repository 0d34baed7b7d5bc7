"""Salted join / aggregation: salting must be invisible in the results."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from quackosm_spark.operators.skew import salted_count_distinct, salted_join


@pytest.fixture()
def skewed(spark):
    # one pathologically hot key (0: 500 rows) + a long tail
    rows = [(0, i) for i in range(500)] + [(k, k * 10) for k in range(1, 50)]
    return spark.createDataFrame(rows, "k INT, payload INT")


@pytest.fixture()
def dim(spark):
    return spark.createDataFrame(
        [(k, f"name{k}") for k in range(0, 50, 2)], "k INT, name STRING"
    )


def test_salted_join_matches_plain_inner(skewed, dim):
    plain = skewed.join(dim, "k").select("k", "payload", "name")
    salted = salted_join(skewed, dim, "k", salt=4).select("k", "payload", "name")
    assert sorted(map(tuple, salted.collect())) == sorted(map(tuple, plain.collect()))


def test_salted_join_left_outer(skewed, dim):
    plain = skewed.join(dim, "k", "left").select("k", "payload", "name")
    salted = salted_join(skewed, dim, "k", salt=4, how="left").select(
        "k", "payload", "name"
    )
    assert sorted(
        map(tuple, salted.collect()), key=str
    ) == sorted(map(tuple, plain.collect()), key=str)


def test_salted_join_multi_key(spark):
    big = spark.createDataFrame(
        [(1, "a", 10), (1, "b", 20), (2, "a", 30)], "k1 INT, k2 STRING, v INT"
    )
    small = spark.createDataFrame([(1, "a", "x"), (2, "a", "y")], "k1 INT, k2 STRING, t STRING")
    out = salted_join(big, small, ["k1", "k2"], salt=3)
    assert sorted((r.k1, r.k2, r.v, r.t) for r in out.collect()) == [
        (1, "a", 10, "x"),
        (2, "a", 30, "y"),
    ]


def test_salted_join_rejects_bad_salt(skewed, dim):
    with pytest.raises(ValueError, match="salt"):
        salted_join(skewed, dim, "k", salt=0)


def test_salted_count_distinct_exact(spark):
    df = spark.createDataFrame(
        [("g1", v % 7) for v in range(100)] + [("g2", v) for v in range(13)],
        "g STRING, v INT",
    )
    got = {r.g: r.n_distinct for r in salted_count_distinct(df, "g", "v").collect()}
    assert got == {"g1": 7, "g2": 13}


def test_key_skew_report_ranks_hot_keys(spark):
    """r08: counts, fractions, deterministic tie order, NULL-key group."""
    from pyspark.sql import functions as F

    from quackosm_spark.operators.skew import key_skew_report

    rows = [("hot",)] * 60 + [("warm",)] * 30 + [("a",)] * 5 + [("b",)] * 5
    rows += [(None,)] * 0
    df = spark.createDataFrame(rows, "k: string")
    got = key_skew_report(df, ["k"], top_k=3).collect()
    assert [(r.k, r.n, r.frac) for r in got] == [
        ("hot", 60, 0.6), ("warm", 30, 0.3), ("a", 5, 0.05)]
    # NULL keys are a real group
    df2 = df.union(spark.createDataFrame([(None,)] * 70, "k: string"))
    top = key_skew_report(df2, ["k"], top_k=1).collect()[0]
    assert top.k is None and top.n == 70
