"""Temporal join operators Spark lacks as built-ins: as-of join and
interval (range) join, plus exact distributed quantiles.

The as-of join is the canonical "custom operator expressed as a
composition of existing DataFrame ops": instead of a range-condition join
(which Spark would execute as a broadcast nested loop or an exploding
inequality join), both sides are unioned into one stream and resolved with
a single window pass — one shuffle on the join key, no row explosion,
linear in |left| + |right|. DuckDB/kdb+/pandas ``merge_asof`` express the
same semantics natively; this is the scalable Spark formulation.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "interval_join", "exact_quantiles", "lag_deltas", "latest_by_key"]


def _qt(name: str) -> str:
    """Backtick-quote an identifier for SQL-text composition (the
    one-round-trip construction idiom — see dedup._q)."""
    return "`" + name.replace("`", "``") + "`"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Mapping[str, str] | Sequence[str],
    *,
    strict: bool = False,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For every left row, attach the columns of the single right row with
    the greatest ``right_ts`` <= ``left_ts`` (direction="backward"; with
    ``strict=True`` the comparison is <); direction="forward" matches the
    smallest ``right_ts`` >= ``left_ts``. Left rows with no match keep
    NULLs (left-outer semantics, like DuckDB ``ASOF LEFT JOIN``).

    Implementation: tag each side, ``unionByName``, then one
    ``last(..., ignorenulls=True)`` window ordered by (ts, side) within the
    join key. Tie handling is encoded purely in the side sort-order: for
    inclusive matches right rows sort BEFORE left rows at an equal
    timestamp (so they are visible to the window frame ending at the
    current row); for strict matches they sort AFTER (invisible).

    Scale shape: exactly one shuffle, on ``on`` — the same partitioning a
    plain equi-join would need — and the window never materializes more
    than the running "most recent right row" per partition. No inequality
    join, no per-key ``collect_list``. A pathologically hot key serializes
    through one task like any keyed window; pre-split such keys by a
    coarse time bucket and as-of join bucket-locally if that ever bites.

    ``value_cols`` maps right-side column -> output name (a plain sequence
    keeps the original names). ``tolerance_seconds`` voids matches older
    (newer, for forward) than the given gap, like pandas ``merge_asof``'s
    ``tolerance``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if not isinstance(value_cols, Mapping):
        value_cols = {c: c for c in value_cols}
    clash = set(value_cols.values()) & set(left.columns)
    if clash:
        raise ValueError(f"output names collide with left columns: {sorted(clash)}")

    # Right rows must win ties for inclusive matches, lose them for strict.
    # Built as SQL text (selectExpr / one window expr) — the Column-API
    # assembly cost ~550 py4j round-trips per construction.
    right_side = 0 if not strict else 2
    payload_fields = ", ".join(
        [f"{_qt(c)} AS {_qt(out)}" for c, out in value_cols.items()]
        + [f"cast({_qt(right_ts)} AS timestamp) AS __r_ts"]
    )
    r = right.selectExpr(
        *[_qt(k) for k in keys],
        f"cast({_qt(right_ts)} AS timestamp) AS __ts",
        f"{right_side} AS __side",
        f"struct({payload_fields}) AS __r",
    )
    l = left.selectExpr(
        *[_qt(c) for c in left.columns],
        f"cast({_qt(left_ts)} AS timestamp) AS __ts",
        "1 AS __side",
    )
    unified = l.unionByName(r, allowMissingColumns=True)

    order = "__ts ASC, __side ASC"
    if direction == "forward":
        order = "__ts DESC, __side ASC"
    matched = (
        f"last(__r, true) OVER (PARTITION BY "
        f"{', '.join(_qt(k) for k in keys)} ORDER BY {order} "
        f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS __m"
    )
    out = unified.selectExpr("*", matched).where(F.col("__side") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col("__ts")) - F.unix_micros(F.col("__m.__r_ts"))
        ) / 1e6
        out = out.withColumn(
            "__m", F.when(gap <= F.lit(tolerance_seconds), F.col("__m"))
        )
    return out.selectExpr(
        *[_qt(c) for c in left.columns],
        *[f"__m.{_qt(name)} AS {_qt(name)}" for name in value_cols.values()],
    )


def interval_join(
    facts: DataFrame,
    intervals: DataFrame,
    ts_col: str,
    start_col: str,
    end_col: str,
    *,
    broadcast_intervals: bool = True,
) -> DataFrame:
    """Attach every interval row [start, end) containing ``facts.ts_col``.

    The interval table is the small side by construction (calendar windows,
    campaign periods, benchmark splits); broadcasting it turns the range
    join into a map-side nested-loop over a few hundred rows — no shuffle
    of the fact table at all. For two BIG sides, bucket both by a coarse
    time grain and join bucket-equi first (not implemented until needed).
    """
    iv = F.broadcast(intervals) if broadcast_intervals else intervals
    cond = (F.col(ts_col) >= F.col(start_col)) & (F.col(ts_col) < F.col(end_col))
    return facts.join(iv, cond, "inner")


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str],
    quantiles: Sequence[float],
    *,
    decimals: int = 6,
) -> DataFrame:
    """Exact (not approximate) per-group quantiles with linear
    interpolation, bit-identical to Spark's ``percentile()`` but with
    BOUNDED per-task state: the built-in exact percentile buffers every
    distinct value of the group in one merging task, which on a raw
    continuous column (distinct ≈ group size) is the moral equivalent of
    collecting the column. This routes through the bucketed two-pass
    order-statistic kernel (`quantiles.exact_group_quantiles`) instead —
    distinct-value aggregation, range-bucketed partitioned windows, two
    order statistics per quantile; see that module's docstring. Use
    ``approx_percentile`` when a bounded-memory sketch is acceptable.
    Results are rounded to ``decimals`` to make them engine-portable
    (bit-identical across DuckDB / Spark float summation orders).
    """
    from quackosm_spark.operators.quantiles import exact_group_quantiles

    names = [
        f"p{str(q).replace('0.', '').ljust(2, '0')}" for q in quantiles
    ]
    raw = exact_group_quantiles(df, value_col, group_cols, quantiles, names)
    # backtick-quoted, not bare F.col(n): a q like 1.0 names its column
    # "p1.0" and an unquoted reference parses the dot as field access
    return raw.select(
        *group_cols,
        *[F.round(F.col(f"`{n}`"), decimals).alias(n) for n in names],
    )


def lag_deltas(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str,
    ts_col: str | None = None,
) -> DataFrame:
    """Per-key successive-difference analytics (the lead/lag family the
    reference never needed — SURVEY §2.5 — but event pipelines do): for each
    row, the change in ``value_col`` and (optionally) the microsecond gap in
    ``ts_col`` since the key's previous row.

    One shuffle on the partition key, then a single window pass; first row
    per key yields NULL delta (SQL LAG semantics). Include a unique id in
    ``order_cols`` to make equal-timestamp ordering deterministic."""
    w = Window.partitionBy(*partition_cols).orderBy(*[F.asc(c) for c in order_cols])
    out = df.withColumn(
        "delta", F.col(value_col) - F.lag(value_col).over(w)
    )
    if ts_col is not None:
        out = out.withColumn(
            "gap_us", F.unix_micros(F.col(ts_col)) - F.unix_micros(F.lag(ts_col).over(w))
        )
    return out


def latest_by_key(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
) -> DataFrame:
    """Most-recent row per key — the SCD-type-1 / "current state" reduction
    over an event log, via ``max_by(struct(payload), struct(order))``: a true
    partial aggregate (per-partition maxima merged on the reducer), so unlike
    the row_number-window formulation it map-side combines and never
    materializes the per-key sort. Ties resolve by the struct order of
    ``order_cols`` (make the last one a unique id for determinism)."""
    payload = [c for c in df.columns if c not in key_cols]
    ordv = F.struct(*[F.col(c) for c in order_cols])
    agg = F.max_by(F.struct(*[F.col(c) for c in payload]), ordv).alias("__top")
    out = df.groupBy(*key_cols).agg(agg)
    return out.select(*key_cols, *[F.col(f"__top.{c}").alias(c) for c in payload])


def value_spikes(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str = "value",
    factor: float = 2.0,
    min_prev: int = 3,
) -> DataFrame:
    """Flag rows whose value exceeds ``factor`` x the running mean of all
    STRICTLY-EARLIER rows of the same key (frame spec: ROWS BETWEEN
    UNBOUNDED PRECEDING AND 1 PRECEDING — the reference uses no window
    frames at all, SURVEY §2.5). Rows with fewer than ``min_prev``
    predecessors are never flagged (cold start).

    One shuffle on the key + one ordered window pass; the running mean is
    O(1) per row (sum/count frame aggregates, no re-scan). The streaming
    twin is ``streaming.flag_spikes_stream`` (transformWithStateInPandas),
    which carries (n, sum) as keyed state instead of a window frame."""
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    prev_mean = F.avg(value_col).over(w)
    prev_n = F.count(value_col).over(w)
    return df.withColumn(
        "spike",
        (prev_n >= min_prev) & (F.col(value_col) > factor * prev_mean),
    )


def history_from_events(
    df: DataFrame,
    key_cols: Sequence[str],
    order_cols: Sequence[str],
    ts_col: str = "ts",
) -> DataFrame:
    """SCD-2-style version history from an event log: each row becomes a
    version valid from its own timestamp until the key's NEXT row
    (``lead``; NULL = currently valid). The inverse perspective of
    ``lag_deltas``; with ``latest_by_key`` these three cover the
    lag / lead / argmax family. One shuffle on the key."""
    w = Window.partitionBy(*key_cols).orderBy(*[F.asc(c) for c in order_cols])
    return (
        df.withColumn("valid_from", F.col(ts_col))
        .withColumn("valid_to", F.lead(ts_col).over(w))
        .drop(ts_col)
    )


def resample_ffill(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Time-series resampling to a daily grid with gap-fill + forward-fill.

    Per key: bucket events by calendar day, keep the LAST observation of
    each day (deterministic: max by (ts, id)), generate the full day grid
    from the key's first to last observed day (``sequence`` + ``explode``
    — no driver-side calendar), left-join observations onto the grid, and
    forward-fill gaps with ``last(ignorenulls)`` over an expanding window.
    The first grid day always has an observation by construction, so no
    leading nulls. Returns (key, day, value, n_obs) where n_obs=0 marks
    filled gaps.

    Scale shape: one shuffle for the per-day reduction (map-side combined),
    then the grid join and the fill window both hash on the key — AQE
    coalesces them into the same exchange layout. Grid size is bounded by
    the key's active time span, never by corpus size; no global sort.
    """
    day = F.col(ts_col).cast("date")
    b = (
        events.groupBy(F.col(key_col).alias("key"), day.alias("day"))
        .agg(
            F.max_by(
                F.col(value_col), F.struct(F.col(ts_col), F.col(id_col))
            ).alias("v"),
            F.count("*").alias("n_obs"),
        )
    )
    bounds = b.groupBy("key").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx")
    )
    grid = bounds.select(
        "key", F.explode(F.sequence("mn", "mx")).alias("day")
    )
    w = (
        Window.partitionBy("key")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(b, ["key", "day"], "left")
        .select(
            F.col("key").alias(key_col),
            "day",
            F.last("v", ignorenulls=True).over(w).alias(value_col),
            F.coalesce("n_obs", F.lit(0)).alias("n_obs"),
        )
    )


def cohort_retention(
    events: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: cohort = the key's first active day;
    ``n_users`` = how many of that cohort were active again ``day_offset``
    days later. The product-analytics staple.

    Scale shape: (key → first day) and the (key, day) distinct both hash on
    the key, so the join that attaches cohorts is co-partitioned (AQE
    reuses the exchange); because (key, day) is already distinct, the final
    matrix aggregation is a plain count — no count-distinct expansion. The
    matrix itself is tiny (days²) regardless of corpus size.
    """
    day = F.col(ts_col).cast("date")
    firsts = events.groupBy(F.col(key_col).alias("key")).agg(
        F.min(day).alias("cohort_day")
    )
    active = events.select(
        F.col(key_col).alias("key"), day.alias("day")
    ).distinct()
    return (
        active.join(firsts, "key")
        .groupBy(
            "cohort_day", F.datediff("day", "cohort_day").alias("day_offset")
        )
        .agg(F.count("*").alias("n_users"))
    )


def funnel(
    events: DataFrame,
    steps: list[str],
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per key, the earliest time each step was reached
    with every step STRICTLY AFTER the previous one (the first step-2
    event after the first step-1 event, and so on — the standard
    product-funnel semantics, not mere per-step minima).

    Returns one row per key that reached step 0, with nullable columns
    ``t0..t{k-1}`` (null = funnel abandoned at that step).

    Scale shape: one hash aggregation per step, all on the key — k small
    joins co-partitioned on the same exchange layout, each input pre-filtered
    to a single event type at the scan (predicate pushdown). No windows, no
    per-key event collection.
    """
    if not steps:
        raise ValueError("steps must be non-empty")
    ev = events.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_tp"),
    )
    cur = (
        ev.where(F.col("_tp") == steps[0])
        .groupBy("key")
        .agg(F.min("_ts").alias("t0"))
    )
    for i, step in enumerate(steps[1:], start=1):
        nxt = ev.where(F.col("_tp") == step)
        carried = ["key"] + [f"t{j}" for j in range(i)]
        cur = (
            cur.join(nxt, "key", "left")
            .groupBy(*carried)
            .agg(
                F.min(
                    F.when(F.col("_ts") > F.col(f"t{i-1}"), F.col("_ts"))
                ).alias(f"t{i}")
            )
        )
    return cur.withColumnRenamed("key", key_col)

def rolling_zscore(
    df: DataFrame,
    partition_cols: Sequence[str],
    order_cols: Sequence[str],
    value_col: str = "value",
    window: int = 20,
    threshold: float = 3.0,
    min_periods: int = 5,
) -> DataFrame:
    """Trailing-window z-score anomaly detection: each row's value is
    standardized against the mean/sample-stddev of its key's previous
    ``window`` rows (frame ROWS BETWEEN window PRECEDING AND 1 PRECEDING —
    strictly earlier, so the point under test never contaminates its own
    baseline), and flagged when ``|z| > threshold``. The bounded frame is
    what distinguishes this from ``value_spikes``' running mean: a level
    shift ages out of a trailing window, so the detector tracks regime
    changes instead of flagging everything after one.

    ``z`` is NULL (never flagged) when the frame holds fewer than
    ``min_periods`` values or the frame stddev is < 1e-9 (a constant
    baseline makes z ill-conditioned — last-ulp noise would amplify into
    arbitrary magnitudes). ``order_cols`` must make the per-key order
    total (include a unique id as tie-break: frame aggregates over an
    ambiguous order are nondeterministic). Display rounding is engine-
    portability-aware: ``base_mean`` rounds at 6 decimals, NOT 4 — means
    of decimal-discretized inputs (2dp values / frame sizes with only
    2·5 factors) sit EXACTLY on 4th-decimal half boundaries, where two
    engines' last-ulp aggregate differences flip the rounding; no such
    mean can sit on a 6dp boundary (terminating expansions stop by the
    6th digit, repeating ones never end in 5000…). ``z`` (a ratio through
    a sqrt — irrational, never boundary-pinned) rounds at 4; the
    ``is_anomaly`` flag compares the RAW z against the single threshold.

    One shuffle on the key + one window pass; frame aggregates are O(1)
    per row, per-key frames are ``window``-bounded, and keys parallelize —
    no global sort at any scale.
    """
    w = (
        Window.partitionBy(*partition_cols)
        .orderBy(*[F.asc(c) for c in order_cols])
        .rowsBetween(-window, -1)
    )
    v = F.col(value_col).cast("double")
    mean = F.avg(v).over(w)
    sd = F.stddev_samp(v).over(w)
    n = F.count(v).over(w)
    z = F.when(
        (n >= min_periods) & sd.isNotNull() & (sd >= 1e-9),
        (v - mean) / sd,
    )
    return (
        df.withColumn("base_n", n)
        .withColumn("base_mean", F.round(mean, 6) + F.lit(0.0))
        .withColumn("z", F.round(z, 4) + F.lit(0.0))
        .withColumn(
            "is_anomaly", F.coalesce(F.abs(z) > threshold, F.lit(False))
        )
    )


def time_decay_scores(
    events: DataFrame,
    key_cols: Sequence[str] = ("user_id",),
    ts_col: str = "ts",
    half_life_days: float = 7.0,
    value_col: str | None = None,
    anchor: str = "corpus_max",
) -> DataFrame:
    """Exponentially-decayed activity score per key — the freshness
    weighting used to rank sources/users/domains by RECENT volume
    instead of lifetime counts: each event contributes
    ``0.5 ^ (age / half_life)`` (times ``value_col`` if given), where
    age is measured back from the corpus-wide latest timestamp, so the
    score is reproducible from the data alone (no wall-clock, no RNG).
    Returns (key…, decayed_score, n_events, last_ts).

    ``decayed_score`` rounds at 6 decimals: each term is a transcendental
    ``2^(-age/h)`` — never pinned to a rounding half-boundary — so the
    engines' sum-order last-ulp differences can't flip the digit (the
    engine-portability rounding contract, see `rolling_zscore`).

    ``anchor`` picks the decay reference: ``'corpus_max'`` (default)
    measures every key back from the ONE corpus-wide latest timestamp —
    scores are directly comparable across keys; ``'key_max'`` anchors
    each key at ITS OWN latest event (``score = Σ 0.5^((last_ts_key −
    ts)/h)``) — the incrementally-maintainable form, exactly what
    `streaming.decay_counter_stream` carries in state (one
    ``(score, last_ts)`` pair per key, updated as ``score·decay + w``
    per event), so stream and batch agree row-for-row on final scores.

    Scale shape: ONE global max(ts) aggregate broadcast back via a
    1-row crossJoin (the `key_skew_report` pattern) for corpus_max —
    key_max needs no second pass at all (the anchor is an agg of the
    same groupBy) — then one groupBy on the key; no windows, no driver
    collect of data rows.
    """
    if half_life_days <= 0:
        raise ValueError("time_decay_scores: half_life_days must be > 0")
    if anchor not in ("corpus_max", "key_max"):
        raise ValueError(
            "time_decay_scores: anchor must be 'corpus_max' or 'key_max'"
        )
    val = F.col(value_col) if value_col is not None else F.lit(1.0)
    if anchor == "key_max":
        # the per-key anchor must exist before rows can be weighted
        # (rebasing Σ v·0.5^(−ts/h) to epoch 0 overflows doubles for
        # real timestamps), so: one agg for the key max, join back on
        # the same key (co-partitioned — AQE reuses the exchange), one
        # weighted agg. No windows.
        per_key_max = events.groupBy(*[F.col(c) for c in key_cols]).agg(
            F.max(F.col(ts_col)).alias("__kref"),
        )
        # null-SAFE join-back: a NULL group key is a real group to the
        # aggregation (corpus_max keeps it), so the anchor join must not
        # silently drop those rows via NULL != NULL
        pm = per_key_max.select(
            *[F.col(c).alias(f"__k_{c}") for c in key_cols], "__kref"
        )
        cond = None
        for c in key_cols:
            e = F.col(c).eqNullSafe(F.col(f"__k_{c}"))
            cond = e if cond is None else cond & e
        joined = events.join(pm, cond).drop(
            *[f"__k_{c}" for c in key_cols]
        )
        age_days = (
            F.col("__kref").cast("double") - F.col(ts_col).cast("double")
        ) / 86400.0
        weight = F.pow(F.lit(0.5), age_days / F.lit(float(half_life_days))) * val
        return (
            joined.groupBy(*[F.col(c) for c in key_cols])
            .agg(
                F.round(F.sum(weight), 6).alias("decayed_score"),
                F.count(F.lit(1)).alias("n_events"),
                F.max(F.col(ts_col)).alias("last_ts"),
            )
        )
    ref = events.agg(F.max(F.col(ts_col)).alias("__ref"))
    age_days = (
        F.col("__ref").cast("double") - F.col(ts_col).cast("double")
    ) / 86400.0
    weight = F.pow(F.lit(0.5), age_days / F.lit(float(half_life_days))) * val
    return (
        events.crossJoin(F.broadcast(ref))
        .groupBy(*[F.col(c) for c in key_cols])
        .agg(
            F.round(F.sum(weight), 6).alias("decayed_score"),
            F.count(F.lit(1)).alias("n_events"),
            F.max(F.col(ts_col)).alias("last_ts"),
        )
    )
