"""Skew mitigation: salted equi-join and salted aggregation.

AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on in
`session.get_spark`) handles moderately skewed shuffles transparently; these
operators are the explicit, planner-independent form for when one key is so
hot it dwarfs a partition (the "every way references node 0" pathology) or
when AQE is unavailable (e.g. inside a streaming micro-batch).

Semantics are IDENTICAL to the unsalted operation — salting only changes the
physical key distribution — which is why the contract query for this module
shares a plain-SQL oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_count_distinct"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str | Sequence[str],
    *,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where each big-side row gets a deterministic salt in
    [0, salt) derived from its full row content, and the small side is
    replicated ``salt``× so every (key, salt) bucket can match. A key that
    would land 10^9 rows on one reducer now spreads over ``salt`` reducers,
    at the cost of a ``salt``× blowup of the SMALL side only.

    The salt is a content hash, not ``rand()``: task retries and partition
    re-layouts reproduce the same salt, so the operator stays deterministic
    end-to-end (a retried stage under ``rand()`` salting can double- or
    zero-count rows mid-shuffle).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if salt < 1:
        raise ValueError(f"salt must be >= 1, got {salt}")
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi",
                   "leftsemi", "left_anti", "leftanti", "cross"):
        # right/full joins would surface each unmatched small-side replica
        raise ValueError(f"salted_join cannot preserve {how!r} semantics "
                         "(small side is replicated); salt the other side")
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*big.columns)), F.lit(salt))
    )
    small_salted = small.join(
        F.broadcast(
            small.sparkSession.range(salt).select(
                F.col("id").cast("long").alias("__salt")
            )
        )
    )
    return big_salted.join(small_salted, keys + ["__salt"], how).drop("__salt")


def salted_count_distinct(
    df: DataFrame,
    group_col: str,
    distinct_col: str,
    *,
    salt: int = 16,
) -> DataFrame:
    """Two-phase count-distinct for skewed groups: phase 1 dedups
    (group, salt, value) locally across ``salt`` buckets, phase 2 sums the
    per-bucket distinct counts. The hot group's dedup state spreads over
    ``salt`` reducers instead of one. Exact, not approximate (buckets
    partition the VALUE space, so no value is counted twice). Returns
    (group_col, n_distinct).
    """
    bucketed = df.select(
        group_col,
        F.col(distinct_col).alias("__v"),
        F.pmod(F.xxhash64(F.col(distinct_col).cast("string")), F.lit(salt)).alias(
            "__salt"
        ),
    ).distinct()
    return (
        bucketed.groupBy(group_col, "__salt")
        .agg(F.count("__v").alias("__n"))
        .groupBy(group_col)
        .agg(F.sum("__n").alias("n_distinct"))
    )

def key_skew_report(
    df: DataFrame,
    key_cols: Sequence[str],
    top_k: int = 20,
) -> DataFrame:
    """Join/shuffle-skew diagnostics: the ``top_k`` hottest key tuples with
    row count and corpus fraction — the table you read BEFORE deciding a
    join needs `salted_join` or AQE skew hints (a single key holding >1%
    of a 100 TB fact table is the difference between 32 even tasks and
    one 3-hour straggler).

    One groupBy shuffle on the keys; the grand total rides a 1-row
    broadcast; ordering (count DESC, keys ASC — deterministic under ties)
    + LIMIT plans as TakeOrderedAndProject, so only ``top_k`` rows ever
    leave the aggregate. ``frac`` rounds at 6 (the engine-portability
    contract). NULL keys count as real groups, like any groupBy.
    """
    keys = list(key_cols)
    counts = df.groupBy(*keys).agg(F.count(F.lit(1)).alias("n"))
    total = counts.agg(F.sum("n").alias("__tot"))
    return (
        counts.crossJoin(F.broadcast(total))
        .select(
            *keys,
            "n",
            F.round(F.col("n") / F.col("__tot"), 6).alias("frac"),
        )
        .orderBy(F.col("n").desc(), *[F.asc(k) for k in keys])
        .limit(top_k)
    )
