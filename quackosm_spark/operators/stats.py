"""Corpus-statistics rollups.

The reference engine uses no grouping sets (SURVEY §2.4), but a training-data
pipeline reports corpus composition at several granularities at once
(per source x language, per source, grand total). ``ROLLUP`` computes all of
them in ONE shuffle — Spark expands the grouping sets map-side and partial-
aggregates each, so the cost is one pass over the corpus regardless of how
many levels are reported.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
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


def quality_deciles(
    docs: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    buckets: int = 10,
    id_col: str = "doc_id",
    score_col: str | None = None,
) -> DataFrame:
    """Per-group quality bucketing: decile (``ntile`` semantics) and exact
    ``percent_rank`` of each document's quality score WITHIN its group —
    the standard "train on the top-N% per language" selection signal.

    Scale shape — NO window partitioned by the group alone (one dominant
    group — "en" is half of most web corpora — would serialize through a
    single task's sort): the quality score is range-bucketed on
    ``floor(quality · 256)`` (order-preserving — quality_score is already
    rounded to 6 decimals in [0, 1], so the bucket IS the high bits of the
    sort key), the in-group rank is a window PARTITIONED by
    ``(group, bucket)`` plus an exclusive per-bucket offset, and the
    offset/total table is a window over the AGGREGATED per-bucket counts
    (≤ 256 rows per group) — the `binary_auc` / `interleave_sources`
    two-pass parallel-prefix pattern. ``ntile`` and ``percent_rank`` are
    then plain arithmetic on (rank, N): the ordering key (quality, id) is
    unique per row, so rank == row_number and both functions have closed
    forms — bit-identical to the single-window formulation (asserted in
    tests/test_search_stats.py).

    The scored projection is PERSISTED: it feeds two different exchanges
    (the bucket-count aggregate and the rank window's shuffle), which
    Spark cannot deduplicate as a ReusedExchange, and the quality score
    is three regex passes per document — without the cache the corpus is
    scored twice (measured 1.8× wall on 5M docs). The cache is 4 compact
    columns per doc, built by the first branch of the caller's action and
    evicted LRU (or via ``spark.catalog.clearCache()``).

    ``score_col`` (r08): rank a PRECOMPUTED per-doc score instead of the
    built-in heuristic ``quality_score`` — e.g. a model probability or
    any signal already materialized upstream. The column must live in
    [0, 1] (the range-bucketing contract shared with ``quality_score``'s
    output); ``text_col`` is ignored when set. The output column is
    still named ``quality``."""
    from pyspark import StorageLevel

    from quackosm_spark.operators.quantiles import _nsjoin
    from quackosm_spark.operators.text import quality_score

    score = (
        F.col(score_col) if score_col is not None else quality_score(text_col)
    )
    n_range = 256  # md5-style high-bits bucketing of the [0,1] score
    d = docs.select(
        F.col(id_col), F.col(group_col), score.alias("quality")
    ).withColumn(
        "_bkt",
        F.least(
            F.floor(F.col("quality") * n_range), F.lit(n_range - 1)
        ).cast("int"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bcounts = d.groupBy(group_col, "_bkt").agg(F.count(F.lit(1)).alias("__bn"))
    w_off = (
        Window.partitionBy(group_col)
        .orderBy("_bkt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offsets = bcounts.select(
        group_col,
        "_bkt",
        F.coalesce(F.sum("__bn").over(w_off), F.lit(0)).alias("__off"),
        F.sum("__bn").over(Window.partitionBy(group_col)).alias("__tot"),
    )
    w_rn = Window.partitionBy(group_col, "_bkt").orderBy("quality", id_col)
    ranked = _nsjoin(d, offsets, [group_col, "_bkt"]).withColumn(
        "rn", F.col("__off") + F.row_number().over(w_rn)
    )
    rn, N = F.col("rn"), F.col("__tot")
    b = F.lit(buckets)
    # ntile(b) closed form: base = N div b rows per tile, the first
    # N mod b tiles take one extra. The otherwise-branch denominator is
    # guarded with greatest(·, 1): when base == 0 the first branch always
    # matches (rn ≤ rem = N), but ANSI mode would still reject a literal
    # divide-by-zero if the branch were ever codegen-evaluated.
    base = F.floor(N / b)
    rem = N % b
    decile = (
        F.when(
            rn <= rem * (base + 1), F.floor((rn - 1) / (base + 1)) + 1
        )
        .otherwise(
            rem
            + F.floor((rn - rem * (base + 1) - 1) / F.greatest(base, F.lit(1)))
            + 1
        )
        .cast("int")
    )
    pct = F.when(N == 1, F.lit(0.0)).otherwise(
        F.round((rn - 1).cast("double") / (N - 1).cast("double"), 6)
    )
    return ranked.select(
        id_col,
        F.col(group_col),
        F.col("quality"),
        decile.alias("decile"),
        pct.alias("pct_rank"),
    )


def pivot_counts(
    docs: DataFrame,
    row_col: str = "source",
    pivot_col: str = "lang",
    pivot_values: list[str] | None = None,
) -> DataFrame:
    """Cross-tab: one row per ``row_col``, one count column per
    ``pivot_col`` value. Passing ``pivot_values`` explicitly skips Spark's
    extra distinct-values job AND bounds the output width (at 100 TB an
    unbounded pivot over a high-cardinality column is a driver OOM —
    always pass the list)."""
    piv = docs.groupBy(row_col).pivot(pivot_col, pivot_values)
    out = piv.agg(F.count(F.lit(1)))
    # pivot leaves null (not 0) for absent combinations; normalize
    value_cols = [c for c in out.columns if c != row_col]
    return out.select(
        row_col,
        *[F.coalesce(F.col(c), F.lit(0)).alias(c) for c in value_cols],
    )


def approx_distinct_counts(
    df: DataFrame,
    cols: list[str],
    group_cols: list[str] | None = None,
    rsd: float = 0.05,
) -> DataFrame:
    """HyperLogLog++ distinct counts for ``cols`` (optionally per group) —
    the sketch path for cardinality at 100 TB: fixed-size state per
    (group, column), map-side mergeable, one shuffle. ``rsd`` is the target
    relative standard deviation (Spark's `approx_count_distinct` knob).

    No DuckDB-hash contract by design: sketch estimates are engine-specific;
    the unit test bounds the error against exact counts instead. Use
    ``skew.salted_count_distinct`` when the answer must be exact."""
    aggs = [
        F.approx_count_distinct(c, rsd=rsd).alias(f"approx_{c}") for c in cols
    ]
    if group_cols:
        return df.groupBy(*group_cols).agg(*aggs)
    return df.agg(*aggs)


def countmin_sketch(
    items: DataFrame,
    item_col: str = "item",
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Count-min sketch over an item stream as a tiny mergeable table of
    ``depth × width`` cells: cell (d, xxhash64(item, d) % width) accumulates
    the item's count. Standard CMS guarantees: estimates never undercount,
    and overcount by ≤ e·N/width with probability 1 − exp(−depth).

    This is the at-scale frequency path when the exact groupBy's key
    cardinality itself is the problem (billions of distinct tokens):
    the shuffle carries at most depth·width rows per partition after
    map-side combine — CONSTANT in both corpus size and cardinality.
    Sketches from different corpora/partitions merge by cell-wise sum.
    """
    d = items.select(
        F.col(item_col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    return (
        d.withColumn("bucket", F.pmod(F.xxhash64("item", "d"), F.lit(width)))
        .groupBy("d", "bucket")
        .agg(F.count("*").alias("cnt"))
    )


def countmin_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    item_col: str = "item",
    width: int = 2048,
    depth: int = 4,
) -> DataFrame:
    """Point-query a count-min sketch: estimate(item) = min over the
    ``depth`` rows it hashes to. The sketch is tiny, so it BROADCASTS —
    estimating any number of items is a map-side join at any scale.
    Items that hit only empty cells estimate 0."""
    q = queries.select(
        F.col(item_col).alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    ).withColumn("bucket", F.pmod(F.xxhash64("item", "d"), F.lit(width)))
    return (
        q.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy("item")
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_count"))
    )


def merge_countmin(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two count-min sketches built with the same (width, depth):
    cell-wise sum. Associative + commutative — the property that lets
    per-corpus / per-day sketches roll up without touching raw data."""
    return (
        a.unionByName(b).groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column profiling (the data-quality 'ANALYZE' step): per column, the
    non-null count, exact distinct count, and min/max (stringified for a
    uniform schema). Returns (column_name, n_nonnull, n_distinct,
    min_value, max_value).

    One aggregation job over the table: the multi-count-distinct plans as
    a single Expand pass (rows × #cols before partial aggregation) — one
    scan of 100 TB, not one per column. For cardinalities where exact
    distinct is itself the bottleneck swap in approx_count_distinct /
    ``approx_distinct_counts`` (HLL sketch, constant state).
    """
    cols = cols or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.col(c)).alias(f"{c}__n"),
            F.count_distinct(F.col(c)).alias(f"{c}__d"),
            F.min(F.col(c)).cast("string").alias(f"{c}__mn"),
            F.max(F.col(c)).cast("string").alias(f"{c}__mx"),
        ]
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__n, {c}__d, {c}__mn, {c}__mx" for c in cols
    )
    return row.select(
        F.expr(
            f"stack({len(cols)}, {stack_args}) AS "
            "(column_name, n_nonnull, n_distinct, min_value, max_value)"
        )
    )


def winsorize(
    df: DataFrame,
    value_col: str,
    group_col: str,
    lower_q: float = 0.05,
    upper_q: float = 0.95,
    decimals: int = 6,
    persist_input: bool = False,
) -> DataFrame:
    """Per-group winsorization (robust-scaling clip): values clamped to the
    group's exact [lower_q, upper_q] quantiles. The outlier treatment a
    numeric training signal gets before normalization.

    The quantile bounds come from the bucketed two-pass exact-quantile
    kernel (`quantiles.exact_group_quantiles`) — bit-identical to Spark's
    ``percentile()`` but with bounded per-task state on raw continuous
    columns, where the built-in exact percentile would buffer the whole
    group's distinct values in one merging task. The bounds table is one
    tiny row per group (broadcast back); the clip itself is a scan-stage
    Column expression. APPENDS ``{value_col}_w`` with the clipped value
    rounded for engine portability.

    ``df`` feeds TWO passes: the kernel's distinct-value aggregate and
    the clip join. For a parquet source that is the right plan — two
    columnar scans, the kernel's pruned to (group, value) — but for an
    EXPENSIVE or non-deterministic upstream (a model-scored frame, a
    sampled projection) pass ``persist_input=True``: the input is cached
    (project it to the needed columns first — the ``binary_auc`` shape)
    so both passes read one materialization; bounds computed on one
    evaluation can never clip a different one. The cache is caller-owned
    afterwards (README "Cache lifecycle")."""
    from quackosm_spark.operators.quantiles import exact_group_quantiles

    if persist_input:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    bounds = exact_group_quantiles(
        df, value_col, [group_col], [lower_q, upper_q], ["__lo", "__hi"]
    ).select(F.col(group_col).alias("__g"), "__lo", "__hi")
    return (
        df.join(
            F.broadcast(bounds), F.col(group_col) == F.col("__g")
        )
        .withColumn(
            f"{value_col}_w",
            F.round(
                F.least(F.greatest(F.col(value_col), F.col("__lo")), F.col("__hi")),
                decimals,
            ),
        )
        .drop("__g", "__lo", "__hi")
    )


def quality_psi(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    ref_source: str | None = None,
    bins: int = 10,
) -> DataFrame:
    """Population Stability Index of each source's quality-score
    distribution against a reference source — the drift monitor run
    between corpus snapshots / new sources before mixing them in:
    PSI = Σ_bins (p_i − q_i)·ln(p_i / q_i) over ``bins`` equal-width
    quality buckets, Laplace-smoothed (+0.5 per bin) so empty buckets
    never produce infinities. Common reading: <0.1 stable, 0.1–0.25
    moderate shift, >0.25 major shift. ``ref_source=None`` uses the
    lexicographically first source. Returns (source, n_docs, psi),
    reference row included with psi=0.

    Scale shape: one scan computing the quality Column (codegen) + one
    (source, bin) count shuffle — the aggregated table is
    sources×bins rows, everything after is driver-free Column math over a
    broadcast of the reference's ``bins`` rows.
    """
    from quackosm_spark.operators.text import quality_score

    q = quality_score(text_col)
    d = docs.select(
        F.col(source_col).alias("source"),
        F.least(
            F.floor(q * bins).cast("int"), F.lit(bins - 1)
        ).alias("bin"),
    )
    counts = d.groupBy("source", "bin").agg(F.count("*").alias("cnt"))
    if ref_source is None:
        ref_source = counts.agg(F.min("source")).collect()[0][0]
    else:
        # a typo'd reference source would otherwise empty the inner join
        # below and read as "no drift anywhere" (ADVICE r03) — fail loud.
        # Membership probe, NOT a distinct().limit() sample: with more
        # distinct sources than the sample size a valid ref_source could
        # spuriously (and nondeterministically) raise
        hit = (
            counts.where(F.col("source") == ref_source).limit(1).collect()
        )
        if not hit:
            seen = [
                str(r[0])
                for r in counts.select("source")
                .distinct()
                .orderBy("source")
                .limit(20)
                .collect()
            ]
            raise ValueError(
                f"quality_psi: ref_source {ref_source!r} not present in "
                f"{source_col!r} (first sources seen: {seen})"
            )
    # densify to all bins per source so smoothing covers empty buckets
    sources = counts.select("source").distinct()
    grid = sources.crossJoin(
        counts.sparkSession.range(bins).select(F.col("id").cast("int").alias("bin"))
    )
    full = grid.join(counts, ["source", "bin"], "left").select(
        "source", "bin", F.coalesce("cnt", F.lit(0)).alias("cnt")
    )
    totals = full.groupBy("source").agg(F.sum("cnt").alias("total"))
    probs = full.join(totals, "source").select(
        "source", "bin", "cnt",
        ((F.col("cnt") + 0.5) / (F.col("total") + 0.5 * bins)).alias("p"),
    )
    ref = (
        probs.where(F.col("source") == ref_source)
        .select(F.col("bin"), F.col("p").alias("p_ref"))
    )
    return (
        probs.join(F.broadcast(ref), "bin")
        .groupBy("source")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_docs"),
            F.round(
                F.sum(
                    (F.col("p") - F.col("p_ref"))
                    * F.log(F.col("p") / F.col("p_ref"))
                ),
                6,
            ).alias("psi"),
        )
    )


def percent_rank_normalize(
    df: DataFrame,
    value_col: str,
    group_cols: list[str],
    out_col: str = "pct_rank",
    num_buckets: int = 1024,
) -> DataFrame:
    """Cross-group score normalization: APPENDS each row's exact
    within-group ``percent_rank`` of ``value_col`` — ``(rank_min − 1) /
    (N − 1)`` with SQL RANK (min-rank) tie semantics, 0.0 for single-value
    groups. Quality/model scores from different sources live on different
    scales; rank-normalizing inside each source makes one global threshold
    ("keep everyone's top 20%") meaningful across them.

    Divergence from a raw ``F.percent_rank`` window, by contract: NULL
    values are EXCLUDED from N and get a NULL rank (a window would sort
    them first and hand them rank 0 — wrong for a score column); NaN ranks
    last, matching Spark/DuckDB value ordering.

    Scale shape — the naive formulation is ONE ranking window per group
    (`Window.partitionBy(group).orderBy(value)`), which serializes a
    dominant group through a single task's sort (the §15 `deciles_cheap`
    measurement: 7.7× at 40M rows). Here ranks come from the shared
    bucketed kernel (`quantiles.ranked_distinct_values`): the corpus
    collapses map-side to DISTINCT (group, value) counts, cumulative
    ranks are computed bucket-parallel, and the percent_rank of each
    distinct value joins back to rows on the (group, value) key — heavy
    ties cost ONE ranked row however many rows share the value. No window
    ever sorts more than one bucket's distinct values.
    """
    from quackosm_spark.operators.quantiles import ranked_distinct_values

    groups = list(group_cols)
    ranked, _ = ranked_distinct_values(df, value_col, groups, num_buckets)
    pr = F.when(F.col("__tot") <= 1, F.lit(0.0)).otherwise(
        (F.col("__cum") - F.col("__n")).cast("double")
        / (F.col("__tot") - 1).cast("double")
    )
    table = ranked.select(
        *[F.col(g).alias(f"__g_{g}") for g in groups],
        F.col("__val").alias("__prv"),
        pr.alias("__pr"),
    )
    cond = df[value_col].cast("double").eqNullSafe(table["__prv"])
    for g in groups:
        cond = cond & df[g].eqNullSafe(table[f"__g_{g}"])
    return (
        df.join(table, cond, "left")
        .withColumn(out_col, F.col("__pr"))
        .drop("__prv", "__pr", *[f"__g_{g}" for g in groups])
    )


def robust_zscore(
    df: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = ("user_id",),
    mad_scale: float = 1.4826,
) -> DataFrame:
    """Per-row ROBUST z-score: (x − median) / (mad_scale · MAD) per group,
    with MAD = median(|x − median|) — the outlier-resistant companion to
    the moment z-score (`zscore_outliers`): one wild value shifts a mean
    and explodes a stddev, but barely moves the medians, so robust scores
    stay meaningful on exactly the corpora that need outlier detection
    (quality scores, latencies, token counts with junk spikes). The
    1.4826 default makes MAD estimate σ under normality (1/Φ⁻¹(3/4)).

    Returns the input columns plus (med, mad, robust_z); robust_z is NULL
    when the group's MAD is 0 (over half the group shares one value —
    a degenerate scale, not "infinitely outlying") or when x is NULL.

    Scale shape: TWO passes of the exact-quantile kernel (bounded
    per-task state, no data-row collect — the q45/q120 machinery), each
    joined back co-keyed on the group (AQE localizes when the group
    table is small); the score itself is scan-stage Column math. Exact
    medians, not approxQuantile: cutpoints are part of the output
    contract and engine-portable bit-for-bit.
    """
    from quackosm_spark.operators.quantiles import exact_group_quantiles

    groups = list(group_cols)
    if not groups:
        raise ValueError(
            "robust_zscore: group_cols must be non-empty (wrap the frame "
            "with a constant column for a global score)"
        )
    med = exact_group_quantiles(df, value_col, groups, [0.5], ["med"])
    d = df.join(med, groups)
    dev = d.withColumn("__absdev", F.abs(F.col(value_col) - F.col("med")))
    mad = exact_group_quantiles(dev, "__absdev", groups, [0.5], ["mad"])
    v = F.col(value_col)
    return (
        dev.join(mad, groups)
        .withColumn(
            "robust_z",
            F.round(
                F.when(
                    F.col("mad") > 0,
                    (v - F.col("med")) / (F.lit(float(mad_scale)) * F.col("mad")),
                ),
                6,
            ),
        )
        .drop("__absdev")
    )


def equidepth_histogram(
    df: DataFrame,
    value_col: str = "value",
    group_cols: Sequence[str] = (),
    bins: int = 10,
) -> DataFrame:
    """Equi-DEPTH histogram (equal row counts per bin, data-driven
    edges) — the profiling shape that works on skewed distributions
    where equal-width bins put 99% of rows in one bar; also the optimizer
    statistics / drift-monitoring primitive (PSI over equi-depth bins
    beats fixed bands precisely because each bin carries signal).

    Returns (*group_cols, bin, lo, hi, n): bin 0..bins−1, ``lo``/``hi``
    the interior edges rounded at 6 dp (NULL at the open ends), n the
    exact row count with ``value ≤ edge`` going LEFT (so bins are only
    exactly-equal when values are continuous — ties bunch, by design).
    NULL values carry no bin and are excluded; empty bins emit no row
    (count what exists — a reader wanting zeros can outer-join a bin
    spine).

    Scale shape: edges come from ONE exact-quantile kernel pass (bounded
    per-task state, the q45/q120 machinery); binning is scan-stage
    Column comparisons against the ≤bins−1 broadcast-joined edges; ONE
    (group, bin) count shuffle. Edges are EXACT (quantile_cont
    semantics), so the histogram is engine-portable bit-for-bit —
    approxQuantile would save nothing here (the kernel is already one
    pass) and cost the contract.
    """
    from quackosm_spark.operators.quantiles import exact_group_quantiles

    if bins < 2:
        raise ValueError("equidepth_histogram: bins must be >= 2")
    groups = list(group_cols)
    probs = [i / bins for i in range(1, bins)]
    names = [f"__e{i}" for i in range(1, bins)]
    edges = exact_group_quantiles(df, value_col, groups, probs, names)
    if groups:
        d = df.join(edges, groups)
    else:
        d = df.crossJoin(F.broadcast(edges))
    v = F.col(value_col)
    bin_id = sum(
        ((v > F.col(n)).cast("int") for n in names), F.lit(0)
    ).alias("bin")
    arr = F.array(*[F.col(n) for n in names])
    out = (
        d.where(v.isNotNull())
        .select(*groups, bin_id, arr.alias("__edges"))
        .groupBy(*groups, "bin")
        .agg(F.first("__edges").alias("__edges"), F.count("*").alias("n"))
    )
    return out.select(
        *groups,
        "bin",
        F.round(
            F.when(F.col("bin") >= 1, F.element_at("__edges", F.col("bin"))),
            6,
        ).alias("lo"),
        F.round(
            F.when(
                F.col("bin") <= bins - 2,
                F.element_at("__edges", F.col("bin") + 1),
            ),
            6,
        ).alias("hi"),
        "n",
    )
