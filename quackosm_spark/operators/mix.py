"""Training-mix construction operators: sequence packing and reproducible
sampling.

Both are deterministic by design — no RNG, no global sorts — so the same
corpus produces the same training mix on any engine, any cluster size, any
run. Everything is built-in Column expressions (JVM-side) and windows
PARTITIONED by a hash stream, so there is no single-partition bottleneck at
100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from quackosm_spark.operators.text import token_count

# Driver-collect cardinality contract for the quota-table operators
# (temperature_sample / token_budget_filter / interleave_sources): the
# group column must be a genuinely low-cardinality mixture key (source,
# domain, language — dozens to a few hundred values). The quota table
# they collect is groups×256 rows; past this bound a mistakenly-passed
# high-cardinality key (e.g. doc_id) would OOM the driver silently.
MAX_QUOTA_GROUPS = 10_000


def _collect_quota_rows(counts_df: DataFrame, group_col: str, op_name: str):
    """Enforce the MAX_QUOTA_GROUPS contract, then collect the quota
    table. The aggregate is persisted so the base table is scanned ONCE:
    the distinct-group count runs executor-side over the cached
    aggregate (a violating aggregate is large but spillable — it never
    reaches the driver), and only a contract-respecting table is
    collected."""
    from pyspark import StorageLevel

    counts_df = counts_df.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        n = counts_df.agg(
            F.countDistinct(F.col(group_col)).alias("n")
        ).collect()[0]["n"]
        if n > MAX_QUOTA_GROUPS:
            raise ValueError(
                f"{op_name}: group column {group_col!r} has {n} distinct "
                f"values — over the driver-collect contract of "
                f"<= {MAX_QUOTA_GROUPS} mixture groups (these operators "
                "collect a groups×256 quota table to the driver). Pass a "
                "low-cardinality source/domain key, not a row id; for "
                "high-cardinality grouping use assign_token_shards."
            )
        return counts_df.collect()
    finally:
        counts_df.unpersist()


def pack_sequences(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    capacity: int = 2048,
    num_streams: int = 64,
) -> DataFrame:
    """Greedy contiguous sequence packing into fixed token budgets.

    Assigns every document to a (stream, bin_id) training sequence slot:
    ``stream = doc_id % num_streams``; within a stream documents are laid
    end-to-end in id order and ``bin_id = floor(exclusive_cumsum /
    capacity)`` — i.e. each bin holds a contiguous run of docs totalling
    ~``capacity`` tokens (a doc straddling a boundary starts the next bin's
    count but stays assigned to the bin its first token falls in).

    Scale shape: the cumulative-sum window is PARTITIONED by stream, so
    packing parallelizes across ``num_streams`` independent windows instead
    of one global orderBy (the naive formulation would serialize the whole
    corpus through a single partition). APPENDS (stream, bin_id, n_tokens)
    to the input columns — payload columns (text, source, ...) pass through.
    """
    tokens = (
        token_count("text") if tokens_col is None else F.col(tokens_col)
    ).cast("bigint")
    d = docs.withColumn(
        "stream", F.pmod(F.col(id_col), F.lit(num_streams))
    ).withColumn("n_tokens", tokens)
    w = (
        Window.partitionBy("stream")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.withColumn(
        "bin_id", F.floor((cum - F.col("n_tokens")) / capacity)
    )


def _hash_bucket(id_col: Column) -> Column:
    """16-bit deterministic bucket from md5 of the id (engine-portable:
    md5 is bit-identical in Spark and DuckDB)."""
    return F.conv(
        F.substring(F.md5(id_col.cast("string")), 1, 4), 16, 10
    ).cast("bigint")


def deterministic_sample(
    docs: DataFrame,
    rates: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Reproducible stratified sampling for training-mix weighting.

    Keeps a row iff its 16-bit md5 bucket falls below the stratum's rate
    (``bucket < rate * 65536``). Unlike ``df.sampleBy`` this is a pure
    function of the data — re-runs, retries, and different partitionings
    all select the SAME documents, which is what a reproducible data
    pipeline needs. The predicate is a plain Column expression, so it pushes
    into the scan stage (no shuffle at any scale).
    """
    threshold = F.lit(int(default_rate * 65536))
    for stratum, rate in sorted(rates.items()):
        threshold = F.when(
            F.col(strata_col) == stratum, F.lit(int(rate * 65536))
        ).otherwise(threshold)
    return docs.where(_hash_bucket(F.col(id_col)) < threshold)


def split_assign(
    docs: DataFrame,
    weights: dict[str, float] | None = None,
    id_col: str = "doc_id",
    split_col: str = "split",
    salt: str = "",
) -> DataFrame:
    """Deterministic train/val/test split assignment — APPENDS
    ``split_col`` naming the split whose cumulative weight interval
    contains the row's 16-bit md5 bucket. Weights must sum to ≤ 1.0
    (any remainder falls into the LAST split, so the default
    {train: .98, val: .01, test: .01} is exactly exhaustive; intervals
    are assigned in the dict's insertion order).

    Like `deterministic_sample`, the assignment is a pure function of
    (id, salt): re-runs, retries, engine changes, and corpus growth all
    keep every existing row's split stable — the property that stops
    eval-set contamination when a corpus is re-snapshotted. ``salt``
    derives independent re-splits from the same ids. Pure Column
    expression → scan-stage, zero shuffles at any scale.
    """
    if weights is None:
        weights = {"train": 0.98, "val": 0.01, "test": 0.01}
    if not weights:
        raise ValueError("split_assign: weights must be non-empty")
    total = sum(weights.values())
    if total > 1.0 + 1e-9:
        raise ValueError(f"split_assign: weights sum to {total} > 1.0")
    key = F.concat(F.col(id_col).cast("string"), F.lit(salt))
    bucket = F.conv(F.substring(F.md5(key), 1, 4), 16, 10).cast("bigint")
    names = list(weights)
    expr = F.lit(names[-1])  # remainder → last split (exhaustive)
    cum = 0.0
    cutoffs = []
    for name in names[:-1]:
        cum += weights[name]
        cutoffs.append((name, int(cum * 65536)))
    for name, cutoff in reversed(cutoffs):
        expr = F.when(bucket < F.lit(cutoff), F.lit(name)).otherwise(expr)
    return docs.withColumn(split_col, expr)


def budget_sample(
    docs: DataFrame,
    budgets: dict[str, int],
    group_col: str = "source",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    num_streams: int = 1,
    default_budget: int = 0,
) -> DataFrame:
    """Token-budget mixture construction: cap each group's contribution to
    the training mix at a token budget, selecting documents in a
    deterministic md5-shuffled order (so "which docs make the cut" is a
    pure function of the data, not of cluster layout or run order).

    A document is kept iff the running token total of its group's
    already-selected documents (strictly before it in hash order) is below
    the budget — i.e. the document that crosses the budget is the last one
    in. With ``num_streams > 1`` each group is split into hash streams that
    each get ``budget / num_streams`` tokens: the cumulative-sum window
    then parallelizes within groups, which is the 100 TB path (a single
    giant group otherwise serializes through one window task; same shape as
    ``pack_sequences``). Streams drift from the exact global budget by at
    most one document each — acceptable and deterministic.

    Returns the kept rows with (stream, n_tokens, cum_before) attached.
    """
    tokens = (
        token_count("text") if tokens_col is None else F.col(tokens_col)
    ).cast("bigint")
    budget = F.lit(int(default_budget / num_streams))
    for group, b in sorted(budgets.items()):
        budget = F.when(
            F.col(group_col) == group, F.lit(int(b / num_streams))
        ).otherwise(budget)
    d = docs.withColumn("n_tokens", tokens).withColumn(
        "stream", _hash_bucket(F.col(id_col)) % num_streams
    )
    w = (
        Window.partitionBy(group_col, "stream")
        .orderBy(F.md5(F.col(id_col).cast("string")), id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum("n_tokens").over(w)
    return d.withColumn("cum_before", cum - F.col("n_tokens")).where(
        F.col("cum_before") < budget
    )


def stratified_fixed_n(
    df: DataFrame,
    group_col: str,
    n: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Exactly-n-per-group deterministic sample: rank rows inside each group
    by (md5(id), id) — a reproducible shuffle order with zero RNG — and keep
    the first ``n``. Groups smaller than ``n`` are kept whole.

    One shuffle on the group key; the window is per-group so no global sort.
    Unlike ``deterministic_sample`` (rate-based, scan-stage predicate) this
    guarantees an exact per-group count, which costs the shuffle."""
    w = Window.partitionBy(group_col).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def weighted_sample(
    docs: DataFrame,
    k: int,
    weight_col: str,
    group_col: str | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling without replacement (top-k per
    group), the A-ES / Efraimidis-Spirakis scheme with the RNG replaced by
    the md5 hash: ``u = (bucket(id) + 1) / 65536 ∈ (0,1]``, priority
    ``ln(u) / w``, keep the ``k`` largest priorities. Inclusion
    probability is proportional to weight, yet which rows are kept is a
    pure function of the data — retries, re-partitioning, and different
    engines all select the SAME rows (the DuckDB oracle replays the exact
    formula). Rows with non-positive weight are excluded.

    Scale shape: priority is a scan-stage Column; grouped selection is
    one row_number window per group, which Catalyst rewrites to a
    map-side partial top-k (`WindowGroupLimit` partial+final — each map
    task forwards at most k rows per group, so the shuffle moves
    tasks×k rows, never the corpus). The UNGROUPED case gets no such
    rewrite for a constant partition key (verified empirically), so it
    runs as an explicit two-phase top-k instead (r06): top-k within 1024
    deterministic md5 salt buckets (each phase-1 window group-limited
    the same way), then a final top-k over the ≤ 1024·k survivors — the
    only single-partition sort touches a candidate table bounded by k,
    not the corpus. Both phases break ties by id, so the result is
    bit-identical to the serial top-k.
    """
    u = (_hash_bucket(F.col(id_col)) + F.lit(1)) / F.lit(65536.0)
    priority = F.log(u) / F.col(weight_col)
    positive = docs.where(F.col(weight_col) > 0)
    if group_col:
        w = Window.partitionBy(F.col(group_col)).orderBy(
            priority.desc(), F.col(id_col)
        )
        return (
            positive.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= k)
            .drop("_rn")
        )
    # ungrouped: salt → per-salt top-k → top-k of the tiny candidate set
    salt = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 5, 3), 16, 10
    ).cast("bigint") % F.lit(1024)
    w1 = Window.partitionBy(F.col("_salt")).orderBy(
        priority.desc(), F.col(id_col)
    )
    cand = (
        positive.withColumn("_salt", salt)
        .withColumn("_prn", F.row_number().over(w1))
        .where(F.col("_prn") <= k)
    )
    # constant-key window is INTENTIONAL here: its input is the phase-1
    # survivors (≤ 1024·k rows), never the corpus
    w2 = Window.partitionBy(F.lit(1)).orderBy(priority.desc(), F.col(id_col))
    return (
        cand.withColumn("_rn", F.row_number().over(w2))
        .where(F.col("_rn") <= k)
        .drop("_rn", "_prn", "_salt")
    )


def interleave_sources(
    docs: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic round-robin interleaving of sources into a single
    training order: within each source documents are md5-shuffled and
    numbered (``rn``); the epoch reads position 0,1,2,… which cycles
    source₁,source₂,… per round, degrading gracefully as smaller sources
    run dry. Returns (input columns…, rn, global_pos).

    Scale shape — NO per-source window (a 20 TB source would serialize
    through one task's sort): the md5 sort key is range-bucketed on its
    own first two hex chars (order-preserving — the bucket IS the high
    bits of the key), so ``rn`` is a window partitioned by (source,
    bucket) — 256-way parallel per source — plus an exclusive per-(source,
    bucket) offset from a tiny collected count table (the
    `assign_token_shards` two-pass bucketed prefix-sum pattern). The
    global position is then computed ARITHMETICALLY, not with a global
    window: ``pos = Σ_{s'} min(size_{s'}, rn−1) + #{s' < s : size_{s'} ≥
    rn}`` from the per-source sizes (derived from the same count table —
    one collect total). Nothing ever funnels through a single-partition
    ORDER BY — this is the 100 TB version of `row_number() OVER
    (ORDER BY …)`.

    Cardinality contract: sources are TRAINING-MIX sources (dozens to a
    few hundred) — the collected count table is sources×256 rows and the
    global-position fold is an O(sources) Column expression, both trivial
    at that cardinality. For "sources" that are really a high-cardinality
    grouping key, this is the wrong operator (use `assign_token_shards`
    per group instead).
    """
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    order_key = F.md5(F.col(id_col).cast("string"))
    d = docs.withColumn("_ok", order_key).withColumn(
        "_bkt", F.conv(F.substring("_ok", 1, 2), 16, 10).cast("int")
    )
    # one tiny collect: (source, bucket) counts → exclusive offsets within
    # each source (bucket-ascending ≡ md5-ascending) + per-source sizes
    counts = sorted(
        ((r["src"], r["b"]), r["n"])
        for r in _collect_quota_rows(
            d.groupBy(
                F.col(source_col).alias("src"), F.col("_bkt").alias("b")
            ).agg(F.count("*").alias("n")),
            "src",
            "interleave_sources",
        )
    )
    offset_rows = []
    sizes_map: dict = {}
    for (src, b), n in counts:
        off = sizes_map.get(src, 0)
        offset_rows.append((src, int(b), int(off)))
        sizes_map[src] = off + int(n)
    sizes = sorted(sizes_map.items())
    offsets_df = docs.sparkSession.createDataFrame(
        offset_rows,
        StructType(
            [
                docs.schema[source_col],
                StructField("_bkt", IntegerType()),
                StructField("_off", LongType()),
            ]
        ),
    )
    w = Window.partitionBy(source_col, "_bkt").orderBy("_ok", F.col(id_col))
    d = (
        d.join(F.broadcast(offsets_df), [source_col, "_bkt"])
        .withColumn(
            # LONG, not int: a source past 2^31 rows would silently
            # overflow a cast("int") to negative rn — at odds with the
            # 20 TB-per-source claim above (the long _off already carries
            # the range; row_number's int only counts within one bucket)
            "rn", F.col("_off") + F.row_number().over(w)
        )
        .select(*docs.columns, "rn")
    )
    rn1 = F.col("rn") - 1
    pos = F.lit(0).cast("long")
    for s_name, s_size in sizes:
        pos = pos + F.least(F.lit(s_size), rn1)
    for s_name, s_size in sizes:
        pos = pos + F.when(
            (F.lit(s_name) < F.col(source_col)) & (F.lit(s_size) >= F.col("rn")),
            F.lit(1),
        ).otherwise(F.lit(0))
    return d.withColumn("global_pos", pos.cast("long"))


def assign_token_shards(
    docs: DataFrame,
    id_col: str = "doc_id",
    tokens_col: str | None = None,
    target_tokens: int = 1_000_000,
    num_buckets: int = 256,
) -> DataFrame:
    """Token-budget shard assignment for training-data writers: documents
    in global ``id_col`` order are laid end-to-end and ``shard_id =
    floor(exclusive_cumsum / target_tokens)`` — every shard holds a
    contiguous ~``target_tokens`` run (the manifest a dataloader needs for
    size-balanced shard files).

    Scale shape — the global running sum WITHOUT a global ORDER BY window
    (which would serialize 100 TB through one partition): ids are range-
    bucketed arithmetically (order-preserving ``floor(id / span)`` with
    ``span`` from a one-row max-id aggregate), per-bucket token sums are
    collected as a tiny table (``num_buckets`` rows), their exclusive
    cumulative sums broadcast back as a mapping Column, and the cumsum
    inside each bucket is a PARTITIONED window. Two cheap aggregates +
    one bucket-parallel window ≡ the classic two-pass parallel prefix
    sum. APPENDS (n_tokens, shard_id); payload columns pass through.
    """
    from quackosm_spark.operators.text import token_count

    tokens = (
        token_count("text") if tokens_col is None else F.col(tokens_col)
    ).cast("bigint")
    d = docs.withColumn("n_tokens", tokens)

    max_id = d.agg(F.max(id_col)).collect()[0][0]
    if max_id is None:
        return d.withColumn("shard_id", F.lit(None).cast("bigint"))
    span = max(1, (int(max_id) + num_buckets) // num_buckets)
    d = d.withColumn("_bucket", F.floor(F.col(id_col) / F.lit(span)))

    # pass 1: tiny per-bucket totals → exclusive prefix on the driver
    totals = {
        r["b"]: r["s"]
        for r in d.groupBy(F.col("_bucket").alias("b"))
        .agg(F.sum("n_tokens").alias("s"))
        .collect()
    }
    offset = 0
    offsets: dict[int, int] = {}
    for b in sorted(totals):
        offsets[b] = offset
        offset += int(totals[b])
    offset_col = F.element_at(
        F.create_map(
            *[F.lit(x) for kv in offsets.items() for x in kv]
        ),
        F.col("_bucket"),
    ).cast("bigint")

    # pass 2: bucket-partitioned cumulative window (parallel across buckets)
    w = (
        Window.partitionBy("_bucket")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_before = offset_col + F.sum("n_tokens").over(w) - F.col("n_tokens")
    return d.withColumn(
        "shard_id", F.floor(cum_before / F.lit(int(target_tokens))).cast("bigint")
    ).drop("_bucket")


def token_budget_filter(
    docs: DataFrame,
    budget_tokens: int | None = None,
    budget_fraction: float | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    score_col: str | None = None,
    group_col: str | None = None,
) -> DataFrame:
    """Greedy top-quality selection under a TOKEN budget — the selection
    step when only a slice of a huge corpus can be trained on: documents
    are ordered by (quality DESC, id ASC) and the longest prefix whose
    cumulative token count fits the budget is kept. APPENDS
    ``(n_tokens, kept)``; payload columns pass through. A document is
    kept only if it fits ENTIRELY (the doc that first crosses the budget
    is dropped, as is everything after it); docs with NULL score/tokens
    are never kept and never consume budget.

    Exactly one of ``budget_tokens`` (absolute) / ``budget_fraction``
    (share of the total tokens). ``score_col`` ranks a precomputed
    [0, 1] signal (model probability; the ``quality_deciles(score_col=)``
    contract); default is the built-in heuristic ``quality_score``.

    ``group_col`` (r08): apply the budget PER GROUP — "the best N tokens
    per language/source". ``budget_tokens`` is then each group's cap;
    ``budget_fraction`` is a share of each group's OWN total. NULL group
    keys form a real group (null-safe join), matching groupBy semantics.
    Cardinality contract: groups are training-mix groups (dozens to a
    few hundred — the `interleave_sources` contract); the collected
    offset table is groups×257 rows.

    Scale shape — the "cumulative tokens in quality order" WITHOUT a
    global (or group-only) ORDER BY window (which would serialize the
    corpus, or a dominant group, through one task): the score is
    range-bucketed on ``255 − floor(q·256)`` so bucket-ascending ≡
    quality-DESCENDING (order-preserving: scores are rounded to 6
    decimals in [0, 1]); per-(group, bucket) token sums collect as a
    tiny table whose per-group exclusive prefix (and per-group total,
    for ``budget_fraction``) is computed on the driver and broadcast
    back; the within-bucket cumulative token sum is a window PARTITIONED
    by (group, bucket). Two cheap aggregates + one bucket-parallel
    window — the `assign_token_shards` / `interleave_sources` two-pass
    parallel-prefix pattern, applied to a WEIGHTED prefix. The budget
    verdict is then scan-stage arithmetic. A/B (SCALE.md §15
    `budgetsel`): 8.5× vs the naive single-partition window at 40M rows.
    """
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    from quackosm_spark.operators.quantiles import _nsjoin
    from quackosm_spark.operators.text import quality_score

    if (budget_tokens is None) == (budget_fraction is None):
        raise ValueError(
            "token_budget_filter: pass exactly one of budget_tokens / "
            "budget_fraction"
        )
    score = (
        F.col(score_col) if score_col is not None else quality_score(text_col)
    )
    w = (
        token_count(text_col) if tokens_col is None else F.col(tokens_col)
    ).cast("bigint")

    n_range = 256
    valid = score.isNotNull() & w.isNotNull()
    d = docs.withColumn("n_tokens", w).withColumn(
        "_bkt",
        F.when(
            score.isNotNull() & F.col("n_tokens").isNotNull(),
            F.lit(n_range - 1)
            - F.least(F.floor(score * n_range), F.lit(n_range - 1)),
        )
        .otherwise(F.lit(n_range))  # never-kept bucket, sorts last
        .cast("int"),
    ).withColumn("_q", F.when(valid, score).otherwise(F.lit(-1.0)))

    groups = [group_col] if group_col is not None else []

    # pass 1: tiny per-(group, bucket) token sums → per-group exclusive
    # prefix + total on the driver (groups×257 rows — same collect
    # contract as interleave's sources×256 table). Invalid rows weigh 0.
    weff = F.when(F.col("_bkt") < n_range, F.col("n_tokens")).otherwise(F.lit(0))
    counts_df = d.groupBy(*groups, F.col("_bkt").alias("b")).agg(
        F.sum(weff).alias("s")
    )
    rows = (
        _collect_quota_rows(counts_df, group_col, "token_budget_filter")
        if group_col is not None
        else counts_df.collect()  # ungrouped: at most 257 rows
    )
    per_group: dict = {}
    for r in rows:
        g = r[group_col] if group_col is not None else None
        per_group.setdefault(g, {})[r["b"]] = r["s"]
    offset_rows = []
    for g, totals in per_group.items():
        prefix, off = [], 0
        for b in sorted(totals):
            prefix.append((g, int(b), int(off)))
            off += int(totals[b] or 0)
        gbudget = (
            float(budget_tokens)
            if budget_tokens is not None
            else float(budget_fraction) * off
        )
        offset_rows += [(g, b, o, gbudget) for (g, b, o) in prefix]
    fields = []
    if group_col is not None:
        fields.append(docs.schema[group_col])
    fields += [
        StructField("_bkt", IntegerType()),
        StructField("_off", LongType()),
        StructField("_budget", DoubleType()),
    ]
    if group_col is None:
        offset_rows = [r[1:] for r in offset_rows]
    offsets_df = docs.sparkSession.createDataFrame(
        offset_rows, StructType(fields)
    )

    # pass 2: within-(group, bucket) cumulative (quality DESC, id ASC —
    # the bucket index already encodes the DESC direction across buckets)
    w_cum = (
        Window.partitionBy(*(groups + ["_bkt"]))
        .orderBy(F.col("_q").desc(), F.col(id_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    joined = (
        _nsjoin(d, F.broadcast(offsets_df), groups + ["_bkt"])
        if groups
        else d.join(F.broadcast(offsets_df), "_bkt")
    )
    return (
        joined.withColumn("_cum", F.col("_off") + F.sum(weff).over(w_cum))
        .withColumn(
            "kept",
            (F.col("_bkt") < n_range) & (F.col("_cum") <= F.col("_budget")),
        )
        .select(*docs.columns, "n_tokens", "kept")
    )


def curriculum_order(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    stages: int = 4,
    salt: str = "curriculum",
) -> DataFrame:
    """Curriculum training order: band documents by quality (exact
    percentile cutpoints, cleanest band first) and give each doc a
    deterministic in-band shuffle key — the writer materializes the order
    with ``repartitionByRange(stage, order_key)`` + per-partition sort,
    so no single-partition global sort ever exists.

    stage 0 = the top quality band (trained first); ``order_key`` is an
    md5-derived 32-bit value of (salt, id) so reshuffling the corpus
    cannot change the curriculum. Cutpoints are ONE tiny aggregate
    (stages − 1 scalars). Returns (id, quality, stage, order_key).

    The scored frame (2 compact columns) is PERSISTED before the
    cutpoint aggregate so the 3-regex quality score runs over the corpus
    once, not once for the cutpoints and again for the returned
    projection (the `logprob_band_filter` pattern); evicted LRU or via
    ``spark.catalog.clearCache()``."""
    from pyspark import StorageLevel

    from quackosm_spark.operators.text import quality_score

    if stages < 2:
        raise ValueError("curriculum_order: need at least 2 stages")
    scored = docs.select(
        F.col(id_col).alias("doc_id"), quality_score(text_col).alias("quality")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    cuts = list(
        scored.agg(
            *[
                F.percentile("quality", i / stages).alias(f"c{i}")
                for i in range(1, stages)
            ]
        ).collect()[0]
    )
    band = None
    for c in cuts:
        term = F.when(F.col("quality") > float(c), 1).otherwise(0)
        band = term if band is None else band + term
    stage = (F.lit(stages - 1) - band).alias("stage")
    order_key = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col("doc_id").cast("string"))),
                1, 8,
            ),
            16, 10,
        )
        .cast("bigint")
        .alias("order_key")
    )
    return scored.select("doc_id", "quality", stage, order_key)


def temperature_sample(
    docs: DataFrame,
    total_docs: int,
    alpha: float = 0.5,
    group_col: str = "source",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-scaled source mixing — the multilingual/multi-source
    sampling rule of XLM-R / mT5 / PaLM data mixtures: a target of
    ``total_docs`` documents is split across groups proportionally to
    ``n_g ** alpha`` (``alpha=1`` reproduces the corpus distribution,
    ``alpha=0`` gives every group an equal share, ``0<alpha<1`` upsamples
    the tail — the standard fix for head-language domination).

    Per-group quota: ``quota_g = min(n_g, floor(total_docs * share_g))``
    with ``share_g = round(n_g**alpha / sum_j n_j**alpha, 6)`` (the
    6-decimal rounding is the repo's engine-portability contract; shares
    are computed on the driver from the tiny per-group count table, summed
    in sorted-group order, half-away rounding — the same arithmetic a SQL
    replica expresses as ``round(pow(n, a) / sum(pow(n, a)) OVER (), 6)``).
    Quotas are capped at the group's population (sampling WITHOUT
    replacement), so the realized total can undershoot ``total_docs`` when
    small groups saturate — deterministic, no redistribution. Within a
    group the kept documents are the first ``quota_g`` in
    ``(md5(id), id)`` order — a reproducible shuffle, zero RNG, so
    re-runs, retries, and engine changes select the SAME documents.
    ``id_col`` must be non-null.

    Scale shape — no group-only ``row_number`` window (a dominant group
    would funnel through ONE task's sort; the §15 `budgetsel` lesson):
    the md5 order is range-bucketed on its first byte (order-preserving
    prefix), per-(group, bucket) counts collect as a groups×256 table
    whose exclusive prefix is computed on the driver and broadcast back,
    and the ranking window is PARTITIONED by (group, bucket). Keep verdict
    is then scan-stage arithmetic. Returns the kept rows (payload columns
    pass through unchanged).
    """
    import math

    from pyspark.sql.types import LongType, StructField, StructType

    from quackosm_spark.operators.quantiles import _nsjoin

    if total_docs < 0:
        raise ValueError("temperature_sample: total_docs must be >= 0")
    if alpha < 0:
        raise ValueError("temperature_sample: alpha must be >= 0")

    h = F.md5(F.col(id_col).cast("string"))
    d = docs.withColumn("__h", h).withColumn(
        "__bkt", F.conv(F.substring(F.col("__h"), 1, 2), 16, 10).cast("int")
    )

    # pass 1: per-(group, bucket) counts -> driver (groups x 256 rows, the
    # token_budget_filter collect contract). Group totals, temperature
    # shares, quotas, and exclusive bucket offsets all derive from it.
    rows = _collect_quota_rows(
        d.groupBy(group_col, "__bkt").agg(F.count(F.lit(1)).alias("__c")),
        group_col,
        "temperature_sample",
    )
    per_group: dict = {}
    for r in rows:
        per_group.setdefault(r[group_col], {})[r["__bkt"]] = r["__c"]
    totals = {g: sum(b.values()) for g, b in per_group.items()}
    # sorted-group sum: deterministic fp addition order (NULL group last)
    skey = lambda g: (g is None, str(g))
    denom = sum(totals[g] ** alpha for g in sorted(totals, key=skey))
    offset_rows = []
    for g in sorted(per_group, key=skey):
        share = (totals[g] ** alpha / denom) if denom > 0 else 0.0
        share6 = math.floor(share * 1e6 + 0.5) / 1e6  # half-away, 6 dp
        quota = min(totals[g], math.floor(total_docs * share6))
        off = 0
        for b in sorted(per_group[g]):
            offset_rows.append((g, b, off, quota))
            off += per_group[g][b]
    schema = StructType(
        [
            docs.schema[group_col],
            StructField("__bkt", d.schema["__bkt"].dataType),
            StructField("__off", LongType()),
            StructField("__quota", LongType()),
        ]
    )
    offsets_df = docs.sparkSession.createDataFrame(offset_rows, schema)

    # pass 2: rank within (group, bucket) -- each window sorts ~1/256 of
    # its group -- and keep while the global-in-group position fits.
    w = Window.partitionBy(group_col, "__bkt").orderBy("__h", id_col)
    return (
        _nsjoin(d, F.broadcast(offsets_df), [group_col, "__bkt"])
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__off") + F.col("__rn") <= F.col("__quota"))
        .select(*docs.columns)
    )


def epoch_plan(
    docs: DataFrame,
    weights: dict[str, float],
    total_tokens: int,
    group_col: str = "source",
    text_col: str = "text",
    tokens_col: str | None = None,
) -> DataFrame:
    """Mixture EPOCH planner (the GPT-3-style "weight in training mix vs
    epochs elapsed" table): given target mixture ``weights`` and a total
    token budget, compute per-source target tokens and the number of
    EPOCHS of each source that budget implies — ``epochs > 1`` means the
    source repeats (upsampling), ``< 1`` means it's subsampled. The
    planning complement of `temperature_sample` (which selects docs) and
    `budget_sample` (which enforces caps): run the plan first, then pick
    the enforcement operator.

    Weights are normalized over the sources present in ``weights``;
    sources absent from the dict are excluded (plan only what you mix).
    Returns one row per weighted source — INCLUDING a weighted source
    with ZERO documents in ``docs`` (available_tokens=0, epochs=NULL):
    that is exactly the misconfigured-source signal the plan exists to
    surface, so it must not vanish from the output. Columns: (source,
    available_tokens, weight, target_tokens, epochs) — ``epochs =
    round(target/available, 4)``, NULL for a source with zero available
    tokens. One groupBy shuffle of (source, token-sum) sufficient stats
    joined against a weights-sized literal frame (broadcast);
    everything after is literal Column arithmetic over a sources-sized
    frame.
    """
    if not weights:
        raise ValueError("epoch_plan: weights must be non-empty")
    if total_tokens < 0:
        raise ValueError("epoch_plan: total_tokens must be >= 0")
    if any(w < 0 for w in weights.values()):
        raise ValueError("epoch_plan: weights must be >= 0")
    wsum = sum(weights.values())
    if wsum <= 0:
        raise ValueError("epoch_plan: weights must sum to > 0")
    tokens = (
        token_count(text_col) if tokens_col is None else F.col(tokens_col)
    ).cast("bigint")
    avail = docs.groupBy(group_col).agg(F.sum(tokens).alias("available_tokens"))

    norm = {s: w / wsum for s, w in weights.items()}
    wcol = None
    for s, w in sorted(norm.items()):
        wcol = (
            F.when(F.col(group_col) == s, F.lit(w))
            if wcol is None
            else wcol.when(F.col(group_col) == s, F.lit(w))
        )
    # Anchor the output on the weight keys, not on the groups present in
    # the data: a weighted source with zero documents must still get a
    # row (available_tokens=0, epochs=NULL). Filtering avail to the
    # weight keys first bounds the join's right side to weights-size so
    # it broadcasts (left-outer can only broadcast the right side).
    from pyspark.sql.types import StructType

    # the keys frame inherits the group column's ACTUAL type from the
    # input schema (a hardcoded string type would break int-keyed groups)
    keys = docs.sparkSession.createDataFrame(
        [(s,) for s in sorted(weights)],
        StructType([docs.schema[group_col]]),
    )
    avail = avail.where(F.col(group_col).isin(list(weights)))
    out = keys.join(avail, group_col, "left").select(
        F.col(group_col),
        F.coalesce(F.col("available_tokens"), F.lit(0)).alias(
            "available_tokens"
        ),
        F.round(wcol, 6).alias("weight"),
        F.floor(wcol * F.lit(float(total_tokens))).alias("target_tokens"),
    )
    return out.withColumn(
        "epochs",
        F.when(
            F.col("available_tokens") > 0,
            F.round(
                F.col("target_tokens") / F.col("available_tokens"), 4
            ),
        ),
    )


def domain_mix_report(
    docs: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
) -> DataFrame:
    """Per-registered-domain composition report for a crawl corpus: doc
    and (whitespace) token counts, corpus shares, and the cumulative
    token share in descending-token order — the "how top-heavy is this
    crawl" audit that decides whether `cap_per_domain` is needed and at
    what cap (a handful of domains holding half the tokens is the
    classic C4-era pathology). Returns (domain, n_docs, n_tokens,
    doc_share, token_share, cum_token_share, rank), rank 1 = largest
    domain by tokens, ties to domain ascending; NULL urls are excluded
    (no domain to attribute).

    Scale shape: domain extraction and token counting are scan-stage
    Column math; ONE groupBy on the domain. The global rank + running
    token sum over the domain aggregate are TWO-PHASE, never a
    single-partition window (a 100 TB crawl has tens of millions of
    registered domains): `repartitionByRange` on the report's own sort
    key (n_tokens desc, domain asc) spreads the aggregate across the
    shuffle-partition count while keeping partition ids globally
    order-aligned, one ≤partitions-row collect of per-partition (row
    count, token sum) yields exclusive offsets AND the grand totals
    (no separate grand-total job), and rank / cum_token_share are then
    `offset + row_number()` / `offset + running sum` under a window
    partitioned BY partition id — bit-identical to the global-window
    formulation, with no `Exchange SinglePartition` anywhere. 6-dp
    share rounding (ratios — not boundary-pinned). The range-placed
    aggregate is PERSISTED (one caller-owned cached frame, README
    "Cache lifecycle") — semantic, not just perf: the offsets were
    collected against THIS placement, so the final pass must read the
    same materialized partitions rather than re-run the range shuffle.
    """
    from pyspark import StorageLevel
    from pyspark.sql.types import IntegerType, LongType, StructField, StructType

    from quackosm_spark.operators.dedup import registered_domain

    agg = (
        docs.where(F.col(url_col).isNotNull())
        .select(
            registered_domain(F.col(url_col)).alias("domain"),
            token_count(F.col(text_col)).alias("__tok"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("__tok").cast("bigint").alias("n_tokens"),
        )
        # function-scoped cache, unpersisted below: repartitionByRange's
        # range-boundary SAMPLING pass executes its child — uncached,
        # that would scan the whole corpus twice (once to sample, once
        # to shuffle). Caching the domains-bounded aggregate makes the
        # sampling pass read a compact cached table instead.
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    per = (
        agg.repartitionByRange(F.desc("n_tokens"), F.asc("domain"))
        .withColumn("_pid", F.spark_partition_id())
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    parts = sorted(
        (r["_pid"], r["c"], r["d"] or 0, r["t"] or 0)
        for r in per.groupBy("_pid")
        .agg(
            F.count("*").alias("c"),
            F.sum("n_docs").alias("d"),
            F.sum("n_tokens").alias("t"),
        )
        .collect()
    )
    # `per` is fully materialized by the collect above; drop the inner
    # aggregate cache so exactly ONE caller-owned cached frame remains
    # (README "Cache lifecycle").
    agg.unpersist()
    td = float(sum(p[2] for p in parts))
    tt = float(sum(p[3] for p in parts))
    off_rows, rank_off, tok_off = [], 0, 0
    for pid, c, _d, t in parts:
        off_rows.append((int(pid), int(rank_off), int(tok_off)))
        rank_off += int(c)
        tok_off += int(t)
    offsets_df = docs.sparkSession.createDataFrame(
        off_rows,
        StructType(
            [
                StructField("_pid", IntegerType()),
                StructField("_roff", LongType()),
                StructField("_toff", LongType()),
            ]
        ),
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("n_tokens"), F.asc("domain"))
    return (
        per.join(F.broadcast(offsets_df), "_pid")
        .withColumn(
            # int, matching the original global row_number(): tens of
            # millions of domains sit far inside int range, and _roff
            # only ever sums partition row counts of this same table
            "rank",
            (F.col("_roff") + F.row_number().over(w)).cast("int"),
        )
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.lit(td), 6).alias("doc_share"),
            F.round(F.col("n_tokens") / F.lit(tt), 6).alias("token_share"),
            F.round(
                (
                    F.col("_toff")
                    + F.sum(F.col("n_tokens")).over(
                        w.rowsBetween(Window.unboundedPreceding, 0)
                    )
                )
                / F.lit(tt),
                6,
            ).alias("cum_token_share"),
            "rank",
        )
    )


def cap_per_domain(
    docs: DataFrame,
    max_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    quality_col: str | None = None,
) -> DataFrame:
    """Domain capping: keep at most ``max_per_domain`` documents per
    registered domain — the anti-top-heaviness step (C4 / RefinedWeb
    style) that stops a handful of mega-sites from dominating the
    training mix. Keep rule, deterministic with no RNG:

    - with ``quality_col``: the domain's BEST documents
      (quality desc, id asc — NULL quality sorts last);
    - without: a hash-shuffled slice (md5(id) asc, id asc), i.e. a
      uniform deterministic sample of the domain rather than its
      earliest-crawled ids (crawl order correlates with page type,
      md5 doesn't).

    Rows with a NULL url pass through UNCAPPED (no domain to attribute —
    filter them upstream if that's not wanted; silently capping the NULL
    group would lump every such row into one fake "domain"). Returns the
    input columns unchanged. ONE window over (domain) — partition size
    is bounded by per-domain doc count, the exact thing being capped.
    """
    if max_per_domain < 1:
        raise ValueError("cap_per_domain: max_per_domain must be >= 1")
    from quackosm_spark.operators.dedup import registered_domain

    dom = docs.withColumn("__dom", registered_domain(F.col(url_col)))
    if quality_col is not None:
        order = [
            F.desc_nulls_last(quality_col),
            F.asc(id_col),
        ]
    else:
        order = [
            F.md5(F.col(id_col).cast("string")).asc(),
            F.asc(id_col),
        ]
    w = Window.partitionBy("__dom").orderBy(*order)
    kept = (
        dom.where(F.col("__dom").isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_per_domain)
        .drop("__rn", "__dom")
    )
    return kept.unionByName(dom.where(F.col("__dom").isNull()).drop("__dom"))
