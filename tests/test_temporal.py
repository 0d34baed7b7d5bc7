"""Unit tests for the temporal operators (as-of join, interval join,
exact quantiles) on tiny crafted frames with hand-computed expectations."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from quackosm_spark.operators.temporal import (
    asof_join,
    exact_quantiles,
    interval_join,
)


def _ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def trades(spark):
    return spark.createDataFrame(
        [
            (1, "A", _ts("2024-01-01T10:00:00"), 100.0),
            (2, "A", _ts("2024-01-01T10:05:00"), 101.0),
            (3, "B", _ts("2024-01-01T10:03:00"), 50.0),
            (4, "C", _ts("2024-01-01T10:00:00"), 7.0),
        ],
        "trade_id INT, sym STRING, ts TIMESTAMP, px DOUBLE",
    )


@pytest.fixture()
def quotes(spark):
    return spark.createDataFrame(
        [
            ("A", _ts("2024-01-01T09:59:00"), 99.5),
            ("A", _ts("2024-01-01T10:00:00"), 99.9),  # ties trade 1 exactly
            ("A", _ts("2024-01-01T10:04:00"), 100.7),
            ("B", _ts("2024-01-01T10:10:00"), 51.0),  # only AFTER B's trade
        ],
        "sym STRING, qts TIMESTAMP, bid DOUBLE",
    )


def test_asof_backward_inclusive(trades, quotes):
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        value_cols={"bid": "bid", "qts": "bid_ts"},
    )
    got = {r.trade_id: (r.bid, r.bid_ts) for r in out.collect()}
    assert got[1] == (99.9, _ts("2024-01-01T10:00:00"))  # equal ts matches
    assert got[2] == (100.7, _ts("2024-01-01T10:04:00"))
    assert got[3] == (None, None)  # no quote at-or-before
    assert got[4] == (None, None)  # key absent on right


def test_asof_backward_strict_excludes_equal_ts(trades, quotes):
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        value_cols={"bid": "bid"}, strict=True,
    )
    got = {r.trade_id: r.bid for r in out.collect()}
    assert got[1] == 99.5  # the 10:00:00 quote is no longer eligible
    assert got[2] == 100.7


def test_asof_forward(trades, quotes):
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        value_cols={"bid": "bid"}, direction="forward",
    )
    got = {r.trade_id: r.bid for r in out.collect()}
    assert got[1] == 99.9   # equal ts still matches forward
    assert got[2] is None   # nothing at-or-after 10:05
    assert got[3] == 51.0   # B's later quote


def test_asof_tolerance_voids_stale_matches(trades, quotes):
    # strict matches are 60s stale for both A-trades: a 30s tolerance voids
    # them, a 90s tolerance keeps them.
    tight = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        value_cols={"bid": "bid"}, strict=True, tolerance_seconds=30.0,
    )
    got = {r.trade_id: r.bid for r in tight.collect()}
    assert got[1] is None and got[2] is None
    loose = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        value_cols={"bid": "bid"}, strict=True, tolerance_seconds=90.0,
    )
    got = {r.trade_id: r.bid for r in loose.collect()}
    assert got[1] == 99.5 and got[2] == 100.7


def test_asof_preserves_left_row_count(trades, quotes):
    out = asof_join(
        trades, quotes, on="sym", left_ts="ts", right_ts="qts",
        value_cols={"bid": "bid"},
    )
    assert out.count() == trades.count()


def test_asof_output_name_collision_raises(trades, quotes):
    with pytest.raises(ValueError, match="collide"):
        asof_join(
            trades, quotes, on="sym", left_ts="ts", right_ts="qts",
            value_cols={"bid": "px"},
        )


def test_interval_join_overlapping_windows(spark):
    facts = spark.createDataFrame(
        [(1, _ts("2024-01-03T00:00:00")), (2, _ts("2024-01-09T00:00:00"))],
        "fid INT, ts TIMESTAMP",
    )
    ivs = spark.createDataFrame(
        [
            (0, _ts("2024-01-01T00:00:00"), _ts("2024-01-08T00:00:00")),
            (1, _ts("2024-01-02T00:00:00"), _ts("2024-01-10T00:00:00")),
        ],
        "window_id INT, w_start TIMESTAMP, w_end TIMESTAMP",
    )
    out = interval_join(facts, ivs, "ts", "w_start", "w_end")
    pairs = sorted((r.fid, r.window_id) for r in out.collect())
    # fact 1 is inside both windows; fact 2 only inside window 1
    assert pairs == [(1, 0), (1, 1), (2, 1)]


@pytest.mark.parametrize("direction,strict", [
    ("backward", False), ("backward", True),
    ("forward", False), ("forward", True),
])
def test_asof_differential_vs_pandas_merge_asof(spark, direction, strict):
    """Seeded random frames: our union+window as-of must equal pandas
    merge_asof (an independent implementation of the same semantics)."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    n_l, n_r = 300, 200
    left = pd.DataFrame({
        "lid": np.arange(n_l),
        "k": rng.integers(0, 8, n_l),
        "ts": pd.to_datetime(rng.integers(0, 10_000, n_l), unit="s"),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, 8, n_r),
        "rts": pd.to_datetime(rng.integers(0, 10_000, n_r), unit="s"),
        "rv": rng.normal(size=n_r).round(6),
    })
    # merge_asof needs unique (k, rts) for a deterministic answer
    right = right.drop_duplicates(subset=["k", "rts"])

    expected = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("rts", kind="stable"),
        left_on="ts", right_on="rts", by="k",
        direction=direction, allow_exact_matches=not strict,
    ).set_index("lid")["rv"]

    out = asof_join(
        spark.createDataFrame(left), spark.createDataFrame(right),
        on="k", left_ts="ts", right_ts="rts", value_cols={"rv": "rv"},
        direction=direction, strict=strict,
    )
    got = {r.lid: r.rv for r in out.collect()}
    for lid, exp in expected.items():
        g = got[lid]
        assert (pd.isna(exp) and g is None) or g == exp, (lid, g, exp)


def test_exact_quantiles_interpolation(spark):
    df = spark.createDataFrame(
        [("a", float(v)) for v in [1, 2, 3, 4]] + [("b", 10.0)],
        "g STRING, v DOUBLE",
    )
    out = exact_quantiles(df, "v", ["g"], [0.5, 0.95])
    got = {r.g: (r.p50, r.p95) for r in out.collect()}
    assert got["a"] == (2.5, 3.85)  # (n-1)*q linear interpolation
    assert got["b"] == (10.0, 10.0)


def test_value_spikes_running_mean_and_cold_start(spark):
    from quackosm_spark.operators.temporal import value_spikes

    rows = [
        (1, 7, 1.0), (2, 7, 1.0), (3, 7, 1.0),   # cold start: never flagged
        (4, 7, 10.0),                              # mean(1,1,1)=1 → 10 > 2 → spike
        (5, 7, 3.0),                               # mean(1,1,1,10)=3.25 → no
        (6, 8, 100.0),                             # lone event → no
    ]
    ev = spark.createDataFrame(rows, "event_id LONG, user_id LONG, value DOUBLE") \
        .withColumn("ts", F.timestamp_micros(F.col("event_id") * 1_000_000))
    out = {r.event_id: bool(r.spike) for r in
           value_spikes(ev, ["user_id"], ["ts", "event_id"]).collect()}
    assert out == {1: False, 2: False, 3: False, 4: True, 5: False, 6: False}


def test_history_from_events_intervals_chain(spark):
    from quackosm_spark.operators.temporal import history_from_events

    ev = spark.createDataFrame(
        [(1, 7, 10), (2, 7, 20), (3, 7, 30), (4, 8, 5)],
        "event_id LONG, user_id LONG, t LONG",
    ).withColumn("ts", F.timestamp_micros(F.col("t") * 1_000_000)).drop("t")
    out = {r.event_id: r for r in
           history_from_events(ev, ["user_id"], ["ts", "event_id"]).collect()}
    assert out[1].valid_to == out[2].valid_from
    assert out[2].valid_to == out[3].valid_from
    assert out[3].valid_to is None and out[4].valid_to is None  # current rows
    assert "ts" not in out[1].asDict()


def test_resample_ffill_fills_gaps_with_last_observation(spark):
    from quackosm_spark.operators.temporal import resample_ffill

    rows = [
        # user 1: obs day 1 (two events; later one wins), gap days 2-3, obs day 4
        (1, datetime(2024, 3, 1, 9), 1, 10.0),
        (2, datetime(2024, 3, 1, 17), 1, 20.0),
        (3, datetime(2024, 3, 4, 8), 1, 99.0),
        # user 2: single day -> single grid row
        (4, datetime(2024, 3, 2, 12), 2, 5.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, value: double"
    )
    got = {
        (r.user_id, str(r.day)): (r.value, r.n_obs)
        for r in resample_ffill(df).collect()
    }
    assert got == {
        (1, "2024-03-01"): (20.0, 2),   # last obs of the day wins
        (1, "2024-03-02"): (20.0, 0),   # gap forward-filled
        (1, "2024-03-03"): (20.0, 0),
        (1, "2024-03-04"): (99.0, 1),
        (2, "2024-03-02"): (5.0, 1),
    }


def test_funnel_requires_strict_step_order(spark):
    from quackosm_spark.operators.temporal import funnel

    d = datetime
    rows = [
        # user 1 completes in order
        (1, d(2024, 1, 1), 1, "view"), (2, d(2024, 1, 2), 1, "click"),
        (3, d(2024, 1, 3), 1, "purchase"),
        # user 2: purchase BEFORE click -> abandoned at purchase
        (4, d(2024, 1, 1), 2, "view"), (5, d(2024, 1, 3), 2, "click"),
        (6, d(2024, 1, 2), 2, "purchase"),
        # user 3: never viewed -> not in funnel at all
        (7, d(2024, 1, 1), 3, "click"),
        # user 4: view only
        (8, d(2024, 1, 5), 4, "view"),
    ]
    df = spark.createDataFrame(
        rows, "event_id: long, ts: timestamp, user_id: long, event_type: string"
    )
    got = {r.user_id: (r.t0, r.t1, r.t2)
           for r in funnel(df, ["view", "click", "purchase"]).collect()}
    assert set(got) == {1, 2, 4}
    assert got[1] == (d(2024, 1, 1), d(2024, 1, 2), d(2024, 1, 3))
    assert got[2] == (d(2024, 1, 1), d(2024, 1, 3), None)  # purchase too early
    assert got[4] == (d(2024, 1, 5), None, None)


def test_cohort_retention_counts(spark):
    from quackosm_spark.operators.temporal import cohort_retention

    d = datetime
    rows = [
        (1, d(2024, 1, 1), 1), (2, d(2024, 1, 3), 1),  # cohort 1/1, offsets 0,2
        (3, d(2024, 1, 1), 2), (4, d(2024, 1, 1, 9), 2),  # same-day dup: one row
        (5, d(2024, 1, 3), 3),  # cohort 1/3, offset 0
    ]
    df = spark.createDataFrame(rows, "event_id: long, ts: timestamp, user_id: long")
    got = {(str(r.cohort_day), r.day_offset): r.n_users
           for r in cohort_retention(df).collect()}
    assert got == {
        ("2024-01-01", 0): 2, ("2024-01-01", 2): 1, ("2024-01-03", 0): 1,
    }


def test_exact_quantiles_bit_equal_to_builtin_percentile(spark):
    """r07: the bucketed two-pass kernel must match F.percentile
    bit-for-bit on raw continuous values, heavy ties, single-row and
    all-NULL groups — at full float64 precision (decimals=12 keeps the
    rounding out of the comparison's way)."""
    import random

    from pyspark.sql import functions as F

    random.seed(5)
    rows = [("a", random.uniform(-500.0, 500.0)) for _ in range(5000)]
    rows += [("b", float(random.randint(0, 4))) for _ in range(2000)]
    rows += [("c", 3.25), ("d", None), ("d", None)]
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    qs = [0.0, 0.05, 0.25, 0.5, 0.77, 0.95, 1.0]
    # names as exact_quantiles derives them (q=0.0 → "p00", q=1.0 → "p1.0")
    names = ["p00", "p05", "p25", "p50", "p77", "p95", "p1.0"]

    ref = {
        r.g: [r[n] for n in names]
        for r in df.groupBy("g")
        .agg(*[F.round(F.percentile("v", q), 12).alias(n) for q, n in zip(qs, names)])
        .collect()
    }
    got = {
        r.g: [r[n] for n in names]
        for r in exact_quantiles(df, "v", ["g"], qs, decimals=12).collect()
    }
    assert got == ref


def test_exact_quantiles_multi_group_cols(spark):
    """r07: the kernel's group handling is a LIST — verify two grouping
    columns (incl. a NULL key in one of them) against F.percentile."""
    from pyspark.sql import functions as F

    rows = [
        ("a", 1, float(v)) for v in range(10)
    ] + [
        ("a", 2, float(v * 3)) for v in range(7)
    ] + [
        (None, 1, 42.0), (None, 1, 44.5),
    ]
    df = spark.createDataFrame(rows, "g1 STRING, g2 INT, v DOUBLE")
    ref = {
        (r.g1, r.g2): (r.p50, r.p90)
        for r in df.groupBy("g1", "g2")
        .agg(
            F.round(F.percentile("v", 0.5), 6).alias("p50"),
            F.round(F.percentile("v", 0.9), 6).alias("p90"),
        )
        .collect()
    }
    got = {
        (r.g1, r.g2): (r.p50, r.p90)
        for r in exact_quantiles(df, "v", ["g1", "g2"], [0.5, 0.9]).collect()
    }
    assert got == ref


def test_rolling_zscore_matches_serial_reference(spark):
    """r08: trailing-window z — strictly-earlier frame, cold-start NULLs,
    degenerate-stddev NULLs, and flag semantics, against a driver-side
    serial replica."""
    import statistics

    from quackosm_spark.operators.temporal import rolling_zscore

    vals = {
        1: [10.0, 12.0, 11.0, 13.0, 9.0, 11.5, 50.0, 10.5],  # spike at idx 6
        2: [5.0, 5.0, 5.0, 5.0, 5.0, 7.0],                   # constant base
    }
    rows = [
        (u, i, float(i), v)
        for u, series in vals.items()
        for i, v in enumerate(series)
    ]
    df = spark.createDataFrame(rows, "user_id INT, seq INT, ts DOUBLE, v DOUBLE")
    out = {
        (r.user_id, r.seq): (r.base_n, r.z, r.is_anomaly)
        for r in rolling_zscore(
            df, ["user_id"], ["ts", "seq"], value_col="v",
            window=4, threshold=2.0, min_periods=3,
        ).collect()
    }
    for u, series in vals.items():
        for i, v in enumerate(series):
            frame = series[max(0, i - 4):i]
            n, z, flag = out[(u, i)]
            assert n == len(frame)
            if len(frame) < 3:
                assert z is None and flag is False
                continue
            sd = statistics.stdev(frame)
            if sd < 1e-9:
                assert z is None and flag is False     # constant baseline
                continue
            zref = (v - statistics.mean(frame)) / sd
            assert z == pytest.approx(round(zref, 4), abs=1e-9)
            assert flag == (abs(zref) > 2.0)
    # the planted spike is flagged
    assert out[(1, 6)][2] is True
