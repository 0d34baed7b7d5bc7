"""Bucketed two-pass EXACT per-group quantiles.

Spark's built-in ``percentile()`` is exact but buffers every distinct value
of the group inside one merging task's aggregation buffer — on a raw
continuous column distinct ≈ group size, so a 10⁹-row group means a
multi-GB single-task buffer (the moral equivalent of collecting the
column). This module computes the SAME bit-exact result with bounded
per-task state, using the two-pass parallel-prefix pattern already proven
in ``ml.binary_auc`` and ``mix.interleave_sources``:

1. aggregate the corpus by DISTINCT ``(group, value)`` — heavy ties
   collapse map-side; the shuffled table is distinct-value-sized;
2. range-bucket each distinct value on ``floor((v − min_g) / width_g)``
   (order-preserving), so the cumulative count is a window PARTITIONED
   by ``(group, bucket)`` plus an exclusive per-bucket offset — the
   offset table is ≤ ``num_buckets`` rows per group and its prefix sum
   is a window over that tiny aggregated table, never over raw rows;
3. each requested quantile reads at most two order statistics
   (``floor``/``ceil`` of the target position), found by a conditional
   aggregate over the ranked distinct-value table, and interpolates with
   the SAME formula Spark's ``Percentile`` uses —
   ``(hi − pos)·v_lo + (pos − lo)·v_hi`` — so results are bit-identical
   to ``F.percentile`` (verified in tests/test_search_stats.py).

No expression here is a UDF; no window sorts more than one bucket's
distinct values; nothing is collected to the driver.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _nsjoin(
    left: DataFrame, right: DataFrame, keys: Sequence[str], how: str = "inner"
) -> DataFrame:
    """Equi-join on ``keys`` with NULL-SAFE equality (`<=>`), keeping the
    LEFT side's key columns. ``groupBy`` treats a NULL key as a real group;
    a plain ``join(on=names)`` would silently drop it (SQL NULL ≠ NULL), so
    every group-key join in this kernel goes through here. EqualNullSafe is
    a hashable join key — these still plan as shuffle/broadcast hash joins."""
    r = right
    for k in keys:
        r = r.withColumnRenamed(k, f"__r_{k}")
    cond = None
    for k in keys:
        c = left[k].eqNullSafe(r[f"__r_{k}"])
        cond = c if cond is None else (cond & c)
    out = left.join(r, cond, how)
    return out.drop(*[f"__r_{k}" for k in keys])


def _attach(left: DataFrame, right: DataFrame, keys: Sequence[str], how="inner"):
    """Group-key join; grand-aggregate (keyless) right sides are single-row
    and ride a broadcast cross join instead."""
    if keys:
        return _nsjoin(left, right, keys, how)
    return left.crossJoin(F.broadcast(right))


def ranked_distinct_values(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    num_buckets: int = 1024,
) -> tuple[DataFrame, DataFrame]:
    """The kernel's shared first half: per-group DISTINCT-value table with
    exact cumulative ranks, built with bounded per-task state (module
    docstring steps 1–2). Returns ``(ranked, stats)``:

    - ``ranked``: one row per distinct NON-NULL ``(group, value)`` with
      ``__val`` (double), ``__n`` (count of the value), ``__cum`` (1-based
      cumulative rank of the value's LAST occurrence within its group) and
      ``__tot`` (the group's non-null count) — enough to derive any exact
      order statistic: min-rank of a value is ``__cum - __n + 1``.
    - ``stats``: one row per distinct group (NULL keys and all-NULL groups
      included) with ``__mn`` / ``__mx`` / ``__tot`` — the group universe
      for consumers that must emit a row per group.

    Consumers: ``exact_group_quantiles`` (order-statistic lookup) and
    ``stats.percent_rank_normalize`` (per-row rank join-back).
    """
    groups = list(group_cols)
    v = F.col(value_col).cast("double")

    # distinct-value table: ties collapse map-side; NULL values kept long
    # enough to preserve the group universe (all-NULL groups must still
    # emit a row, as F.percentile's groupBy does)
    g = df.groupBy(*groups, v.alias("__val")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    # range bounds over the FINITE values only: Spark orders NaN greater
    # than everything (so F.max alone would return NaN and poison the
    # bucket width); NaN rows are pinned to the top bucket below, which
    # preserves the percentile()-compatible ordering (NaN sorts last)
    notnan = ~F.isnan(F.col("__val"))
    stats = g.groupBy(*groups).agg(
        F.min(F.when(notnan, F.col("__val"))).alias("__mn"),
        F.max(F.when(notnan, F.col("__val"))).alias("__mx"),
        F.sum(
            F.when(F.col("__val").isNotNull(), F.col("__n")).otherwise(F.lit(0))
        ).alias("__tot"),
    )

    gg = _attach(g.where(F.col("__val").isNotNull()), stats, groups)
    width = F.when(
        F.col("__mx") > F.col("__mn"),
        (F.col("__mx") - F.col("__mn")) / F.lit(float(num_buckets)),
    ).otherwise(F.lit(1.0))
    gg = gg.withColumn(
        "_bkt",
        F.when(F.isnan(F.col("__val")), F.lit(num_buckets - 1))
        .otherwise(
            F.least(
                F.floor(
                    (F.col("__val") - F.coalesce(F.col("__mn"), F.lit(0.0)))
                    / width
                ),
                F.lit(num_buckets - 1),
            )
        )
        .cast("int"),
    )

    # exclusive per-(group, bucket) offsets: a window over the AGGREGATED
    # bucket-count table (≤ num_buckets rows per group), not raw rows
    bcounts = gg.groupBy(*groups, "_bkt").agg(F.sum("__n").alias("__bn"))
    w_off = (
        Window.partitionBy(*groups)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.select(
        *groups,
        "_bkt",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
    )

    # cumulative 1-based rank of each distinct value's LAST occurrence;
    # the value-ordered sort is confined to one bucket's distinct values
    w_cum = (
        Window.partitionBy(*(groups + ["_bkt"]))
        .orderBy("__val")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = _nsjoin(gg, offsets, groups + ["_bkt"]).withColumn(
        "__cum", F.col("__off") + F.sum("__n").over(w_cum)
    )
    return ranked, stats


def exact_group_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    out_cols: Sequence[str],
    num_buckets: int = 1024,
) -> DataFrame:
    """Exact per-group quantiles of ``value_col`` with linear interpolation,
    bit-identical to ``df.groupBy(*group_cols).agg(F.percentile(value_col,
    q))`` but with bounded per-task state (see module docstring).

    Returns one row per distinct group (NULL group keys included, like any
    groupBy) with columns ``(*group_cols, *out_cols)``; a group whose
    values are all NULL yields NULL quantiles, matching ``F.percentile``.
    NULL values are ignored inside a group, also matching. An EMPTY
    ``group_cols`` computes GLOBAL quantiles (one output row, like a
    grand aggregate — the 1-row stats/result tables ride broadcasts and
    the only unpartitioned window is over the ≤num_buckets-row aggregated
    bucket-count table).
    """
    if len(quantiles) != len(out_cols):
        raise ValueError("quantiles and out_cols must have the same length")
    groups = list(group_cols)
    ranked, stats = ranked_distinct_values(df, value_col, groups, num_buckets)

    # per quantile: the two order statistics framing position (N−1)·q.
    # __tot rides on every ranked row (from the stats join), so the target
    # ranks are plain Column arithmetic inside the conditional aggregate.
    # (Internal names must differ by MORE than case: the operator surface
    # must analyze under Spark's default spark.sql.caseSensitive=false,
    # where a `__n`/`__N` pair is an AMBIGUOUS_REFERENCE — the round-7
    # driver regression. tests/test_default_session.py guards this.)
    aggs = []
    for j, q in enumerate(quantiles):
        pos = (F.col("__tot") - F.lit(1)) * F.lit(float(q))
        for tag, rank in (("lo", F.floor(pos) + 1), ("hi", F.ceil(pos) + 1)):
            aggs.append(
                F.max(
                    F.when(
                        (F.col("__cum") - F.col("__n") < rank)
                        & (rank <= F.col("__cum")),
                        F.col("__val"),
                    )
                ).alias(f"__v{tag}_{j}")
            )
    got = ranked.groupBy(*groups).agg(*aggs)

    # interpolate exactly as Spark's Percentile.getPercentile does:
    # (higher − position)·lower_val + (position − lower)·higher_val
    out = _attach(stats, got, groups, "left")
    final = []
    for j, q in enumerate(quantiles):
        pos = (F.col("__tot") - F.lit(1)) * F.lit(float(q))
        lo, hi = F.floor(pos), F.ceil(pos)
        vlo, vhi = F.col(f"__vlo_{j}"), F.col(f"__vhi_{j}")
        val = (
            F.when(F.col("__tot") == 0, F.lit(None).cast("double"))
            .when(lo == hi, vlo)
            .otherwise(
                (hi.cast("double") - pos) * vlo + (pos - lo.cast("double")) * vhi
            )
        )
        final.append(val.alias(out_cols[j]))
    return out.select(*groups, *final)
