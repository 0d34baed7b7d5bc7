"""Single-pass sufficient-statistics ML: ridge regression + correlations.

The 100 TB pattern these operators encode: model fitting over a corpus
never moves the corpus. A linear model with p features needs only the
O(p^2) Gram-matrix sums (X'X, X'y) — each a map-side-combinable SUM, so
one scan emits p(p+1)/2 + 2p + 3 doubles per partition, one tiny
Exchange merges them, and the (p+1)x(p+1) solve happens on the driver
in numpy.
Scoring the fitted model back over the corpus is pure scan-stage Column
arithmetic (no join, no shuffle, no UDF).

This is the distributed form of the quality-classifier training loop in
LLM data curation (fit a cheap linear scorer on labeled features, score
every document with it): the expensive side (the scan) parallelizes
perfectly, the sequential side (the solve) is O(p^3) on p ~ dozens.

``correlation_matrix`` uses the same shape for feature diagnostics: all
pairwise Pearson correlations from one aggregate over sums / squares /
cross-products — one pass, one 1-row Exchange, p(p-1)/2 outputs.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def suffstats_agg(
    df: DataFrame, feature_cols: Sequence[str], target_col: str
) -> DataFrame:
    """The lazy 1-row aggregate behind `regression_suffstats` — exposed
    so plan tests (and composers) can inspect/reuse the exact aggregate
    the fitters execute. Rows with a NULL in ANY used column are dropped
    first (listwise deletion): with mixed NULLs a plain count would
    disagree with the NULL-skipping SUMs and silently bias the normal
    equations."""
    p = len(feature_cols)
    used = list(feature_cols) + [target_col]
    df = df.na.drop(subset=used)
    xs = [F.col(c).cast("double") for c in feature_cols]
    y = F.col(target_col).cast("double")
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.sum(xs[i]).alias(f"sx_{i}") for i in range(p)]
    aggs += [
        F.sum(xs[i] * xs[j]).alias(f"sxx_{i}_{j}")
        for i in range(p)
        for j in range(i, p)
    ]
    aggs += [F.sum(xs[i] * y).alias(f"sxy_{i}") for i in range(p)]
    aggs += [F.sum(y).alias("sy"), F.sum(y * y).alias("syy")]
    return df.agg(*aggs)


def regression_suffstats(
    df: DataFrame, feature_cols: Sequence[str], target_col: str
) -> dict:
    """One-pass sufficient statistics for linear regression.

    Returns ``{"n": float, "sx": np.array(p), "sxx": np.array(p, p),
    "sxy": np.array(p), "sy": float, "syy": float}`` where ``sxx`` holds
    the raw cross-product sums ``sum(x_i * x_j)``. A single ``agg`` call
    — every term is a plain SUM, so Spark's partial aggregation combines
    map-side and ships one row per partition to one reducer. Rows with a
    NULL in any feature or the target are excluded entirely (listwise),
    keeping n consistent with the sums.
    """
    p = len(feature_cols)
    row = suffstats_agg(df, feature_cols, target_col).collect()[0]
    sxx = np.zeros((p, p))
    for i in range(p):
        for j in range(i, p):
            sxx[i, j] = sxx[j, i] = row[f"sxx_{i}_{j}"]
    return {
        "n": float(row["n"]),
        "sx": np.array([row[f"sx_{i}"] for i in range(p)]),
        "sxx": sxx,
        "sxy": np.array([row[f"sxy_{i}"] for i in range(p)]),
        "sy": float(row["sy"]),
        "syy": float(row["syy"]),
    }


def ridge_fit_normal_eq(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    l2: float = 0.0,
    fit_intercept: bool = True,
) -> dict:
    """Fit ridge regression by the normal equations.

    Solves ``(X'X + l2*I) beta = X'y`` (the l2 penalty is NOT applied to
    the intercept, matching sklearn's ``Ridge``). Returns
    ``{"intercept": float, "coef": {feature: float}}``. The corpus is
    touched exactly once (see `regression_suffstats`); the solve is a
    (p+1)x(p+1) ``np.linalg.solve`` on the driver.
    """
    s = regression_suffstats(df, feature_cols, target_col)
    p = len(feature_cols)
    if fit_intercept:
        a = np.zeros((p + 1, p + 1))
        b = np.zeros(p + 1)
        a[0, 0] = s["n"]
        a[0, 1:] = a[1:, 0] = s["sx"]
        a[1:, 1:] = s["sxx"]
        b[0] = s["sy"]
        b[1:] = s["sxy"]
        if l2:
            a[1:, 1:] += l2 * np.eye(p)
        beta = np.linalg.solve(a, b)
        return {
            "intercept": float(beta[0]),
            "coef": dict(zip(feature_cols, (float(v) for v in beta[1:]))),
        }
    a = s["sxx"] + (l2 * np.eye(p) if l2 else 0.0)
    beta = np.linalg.solve(a, s["sxy"])
    return {
        "intercept": 0.0,
        "coef": dict(zip(feature_cols, (float(v) for v in beta))),
    }


def linear_score(model: dict, feature_cols: Sequence[str] | None = None) -> Column:
    """Scan-stage Column scoring a fitted `ridge_fit_normal_eq` model:
    ``intercept + sum(coef_i * x_i)`` — no shuffle, no UDF, fully inside
    whole-stage codegen."""
    cols = list(feature_cols) if feature_cols is not None else list(model["coef"])
    expr = F.lit(float(model["intercept"]))
    for c in cols:
        expr = expr + F.lit(float(model["coef"][c])) * F.col(c).cast("double")
    return expr


def groupwise_linear_fit(
    df: DataFrame, group_col: str, x_col: str, y_col: str
) -> DataFrame:
    """Simple linear regression PER GROUP from grouped sufficient stats.

    One ``groupBy`` shuffle moves 5 doubles per group (n, sum x, sum y,
    sum x^2, sum x*y — all partial-aggregated map-side), then the closed
    formula ``slope = (n*sxy - sx*sy) / (n*sxx - sx^2)``,
    ``intercept = (sy - slope*sx) / n`` evaluates in Column arithmetic.
    Fitting a million per-domain trend lines costs exactly one shuffle
    of a million tiny rows — the corpus itself never reshuffles. With
    integer-valued inputs the sums are exact in float64, so the output
    is bit-reproducible across engines evaluating the same formula.
    Groups with zero x-variance return NULL slope/intercept (0/0). Rows
    with NULL x or y are dropped (listwise) so each group's n matches
    its sums.
    """
    df = df.na.drop(subset=[x_col, y_col])
    x = F.col(x_col).cast("double")
    y = F.col(y_col).cast("double")
    g = df.groupBy(F.col(group_col).alias("group")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy = F.col("sxx"), F.col("sxy")
    denom = n * sxx - sx * sx
    slope = F.when(denom != 0, (n * sxy - sx * sy) / denom)
    return g.select(
        "group",
        n.cast("bigint").alias("n"),
        slope.alias("slope"),
        F.when(denom != 0, (sy - ((n * sxy - sx * sy) / denom) * sx) / n)
        .alias("intercept"),
    )


def logistic_fit_irls(
    df: DataFrame,
    feature_cols: Sequence[str],
    target_col: str,
    iters: int = 8,
    l2: float = 0.0,
) -> dict:
    """Distributed logistic regression via IRLS (Newton-Raphson).

    The binary-quality-classifier trainer (the fastText-style filter in
    LLM curation pipelines, e.g. the educational-quality scorers), built
    on the same never-move-the-corpus contract as `ridge_fit_normal_eq`:
    each Newton step is ONE scan that aggregates the gradient
    ``X'(y - mu)`` and Hessian ``X'WX`` (w = mu*(1-mu)) under the
    CURRENT coefficients — the coefficients enter as literals, so the
    whole per-row computation is JVM-codegen Column arithmetic, and only
    O(p^2) doubles reach the driver per iteration. ``iters`` scans
    total; the (p+1)x(p+1) solve per step is driver-side numpy.

    ``target_col`` must be 0/1 (cast to double). l2 penalizes features,
    not the intercept. Returns ``{"intercept", "coef", "iters"}``.
    Deterministic: no sampling, no RNG, fixed iteration count.
    """
    p = len(feature_cols)
    xs = [F.col(c).cast("double") for c in feature_cols]
    yv = F.col(target_col).cast("double")
    beta = np.zeros(p + 1)
    for _ in range(iters):
        eta = F.lit(float(beta[0]))
        for i in range(p):
            eta = eta + F.lit(float(beta[i + 1])) * xs[i]
        mu = F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))
        w = mu * (F.lit(1.0) - mu)
        resid = yv - mu
        design = [F.lit(1.0)] + xs
        aggs = [
            F.sum(design[i] * resid).alias(f"g_{i}") for i in range(p + 1)
        ]
        aggs += [
            F.sum(design[i] * design[j] * w).alias(f"h_{i}_{j}")
            for i in range(p + 1)
            for j in range(i, p + 1)
        ]
        row = df.agg(*aggs).collect()[0]
        grad = np.array([row[f"g_{i}"] for i in range(p + 1)])
        hess = np.zeros((p + 1, p + 1))
        for i in range(p + 1):
            for j in range(i, p + 1):
                hess[i, j] = hess[j, i] = row[f"h_{i}_{j}"]
        if l2:
            pen = np.diag([0.0] + [l2] * p)
            hess = hess + pen
            grad = grad - pen @ beta
        beta = beta + np.linalg.solve(hess, grad)
    return {
        "intercept": float(beta[0]),
        "coef": dict(zip(feature_cols, (float(v) for v in beta[1:]))),
        "iters": iters,
    }


def logistic_score(model: dict, feature_cols: Sequence[str] | None = None) -> Column:
    """Scan-stage sigmoid probability under a fitted `logistic_fit_irls`
    model — Column arithmetic only, no UDF."""
    eta = linear_score(model, feature_cols)
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-eta))


def binary_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_buckets: int = 1024,
    small_distinct_threshold: int = 65536,
) -> DataFrame:
    """ROC-AUC of a score against a 0/1 label, tie-aware, distributed.

    Mann-Whitney rank-sum form: ``AUC = (S_pos - P(P+1)/2) / (P*N_neg)``
    where ``S_pos`` is the sum of AVERAGE ranks of the positives (ties
    share the mean of their rank range — the standard correction).

    Scale shape: the corpus aggregates by DISTINCT score first (one
    groupBy shuffle emitting (score, n, n_pos)), and the cumulative rank
    NEVER sorts a corpus-sized table in one partition. Which prefix
    strategy runs is decided at runtime from the distinct-score
    cardinality (an ``approx_count_distinct`` riding the same pass-0
    aggregate as the range bounds):

    - distinct ≤ ``small_distinct_threshold`` (discrete scores — model
      probabilities rounded to N decimals, integer grades): the
      cumulative rank is a plain ordered window over the DISTINCT-score
      table, whose size is bounded by the score domain, not the corpus —
      safe at any corpus size, and two internal jobs cheaper than
      bucketing (SCALE.md §13 has the A/B).
    - otherwise (continuous scores — distinct ≈ corpus): the two-pass
      parallel prefix: range-bucket on ``floor((s-min)/width)``
      (order-preserving), per-bucket counts collected (≤ ``num_buckets``
      rows) and exclusive-prefix-summed on the driver, within-bucket
      cumsum as a window PARTITIONED by bucket.

    Both strategies produce rank sums that are integer-and-half valued,
    exact in float64, so the result is bit-identical to the serial
    formulation either way. Returns one row: (auc, n_pos, n_neg). Rows
    with NULL score or label are dropped; a single-class input (n_pos or
    n_neg = 0) has no defined AUC and returns NULL in the auc column —
    check the returned counts before consuming the value.

    The projected (score, label) input is PERSISTED across the internal
    actions (bounds+cardinality, bucket counts, final aggregate): without
    it the lineage would scan the input per action, and a
    non-deterministic input (e.g. a sampled or shuffled upstream) could
    hand the bucket pass offsets inconsistent with the final pass — a
    silently wrong AUC. The cache (2 small columns per row) stays for
    the caller's action and is evicted LRU, or explicitly via
    ``spark.catalog.clearCache()``.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    df = (
        df.na.drop(subset=[score_col, label_col])
        .select(score_col, label_col)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")

    # pass 0: score range + distinct cardinality (one map-reduce scalar
    # row, no shuffle of raw rows). approx_count_distinct's ~2% rsd is
    # fine for a strategy switch: the threshold is a safety margin, not a
    # correctness boundary — both strategies are bit-identical.
    bounds = df.agg(
        F.min(s).alias("mn"),
        F.max(s).alias("mx"),
        F.approx_count_distinct(s).alias("nd"),
    ).collect()[0]
    mn, mx, approx_nd = bounds["mn"], bounds["mx"], bounds["nd"]
    if mn is None:  # empty input: emit the single NULL/0/0 row cheaply
        width = 1.0
    else:
        width = (mx - mn) / float(num_buckets) or 1.0
    bucket_of = lambda c: F.least(  # noqa: E731 — reused on df and g
        F.floor((c - F.lit(mn if mn is not None else 0.0)) / F.lit(width)),
        F.lit(num_buckets - 1),
    ).cast("int")

    if approx_nd <= small_distinct_threshold:
        # discrete-score fast path: the ordered window runs over the
        # distinct-score table (bounded by the score domain) — one
        # partition of ≤ ~threshold rows, corpus-size-independent
        g = df.groupBy(s.alias("score")).agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(y).alias("n_pos"),
        )
        w = Window.orderBy("score").rowsBetween(
            Window.unboundedPreceding, Window.currentRow
        )
        ranked = g.withColumn("cum", F.sum("n").over(w)).withColumn(
            "avg_rank", F.col("cum") - (F.col("n") - F.lit(1.0)) / F.lit(2.0)
        )
        return _auc_from_ranked(ranked)

    # pass 1: tiny per-bucket row counts → exclusive prefix on the driver
    # (cum rank at score x = #rows below x's bucket + within-bucket cumsum)
    bucket_counts = {
        r["b"]: r["n"]
        for r in df.groupBy(bucket_of(s).alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    running = 0
    offsets = []
    for b in sorted(bucket_counts):
        offsets.append((int(b), float(running)))
        running += int(bucket_counts[b])
    offsets_df = df.sparkSession.createDataFrame(
        offsets or [(0, 0.0)], "_bkt int, _off double"
    )

    # pass 2: distinct-score aggregate + bucket-partitioned cumulative window
    g = df.groupBy(s.alias("score")).agg(
        F.count(F.lit(1)).cast("double").alias("n"),
        F.sum(y).alias("n_pos"),
    )
    g = g.withColumn("_bkt", bucket_of(F.col("score"))).join(
        F.broadcast(offsets_df), "_bkt"
    )
    w = (
        Window.partitionBy("_bkt")
        .orderBy("score")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = g.withColumn(
        "cum", F.col("_off") + F.sum("n").over(w)
    ).withColumn(
        "avg_rank", F.col("cum") - (F.col("n") - F.lit(1.0)) / F.lit(2.0)
    )
    return _auc_from_ranked(ranked)


def _auc_from_ranked(ranked: DataFrame) -> DataFrame:
    """Shared tail of `binary_auc`: fold the (n, n_pos, avg_rank) distinct-
    score table into the Mann-Whitney statistic — one tiny aggregate."""
    tot = ranked.agg(
        F.sum(F.col("n_pos") * F.col("avg_rank")).alias("s_pos"),
        F.sum("n_pos").alias("p"),
        F.sum("n").alias("n"),
    )
    p, n, s_pos = F.col("p"), F.col("n"), F.col("s_pos")
    # explicit single-class guard: under ANSI mode (Spark 4 default) a
    # bare 0-denominator division would throw, not return NULL
    return tot.select(
        F.when(
            p * (n - p) != 0,
            (s_pos - p * (p + F.lit(1.0)) / F.lit(2.0)) / (p * (n - p)),
        ).alias("auc"),
        p.cast("bigint").alias("n_pos"),
        (n - p).cast("bigint").alias("n_neg"),
    )


def calibration_report(
    df: DataFrame, score_col: str, label_col: str, bins: int = 10
) -> DataFrame:
    """Reliability-diagram bins for a probabilistic score in [0, 1].

    One groupBy on the bin index (``floor(score*bins)``, top edge
    clamped into the last bin): per bin the count, mean predicted score,
    and empirical positive rate — the inputs to a reliability plot and
    to expected calibration error (``ECE = Σ n_b/N * |frac_pos_b -
    mean_score_b|``, computable from the returned rows). Scale shape:
    scan-stage bin arithmetic, one shuffle of ``bins`` tiny rows.
    Output: (bin, n, mean_score, frac_pos) sorted by bin. Rows with NULL
    score or label are dropped (a NULL score would otherwise bin to a
    NULL bucket while NULL labels skewed frac_pos vs n).
    """
    df = df.na.drop(subset=[score_col, label_col])
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("double")
    bin_idx = F.least(
        F.floor(s * F.lit(float(bins))).cast("bigint"),
        F.lit(bins - 1).cast("bigint"),
    )
    return (
        df.groupBy(bin_idx.alias("bin"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.avg(s), 6).alias("mean_score"),
            F.round(F.avg(y), 6).alias("frac_pos"),
        )
        .orderBy("bin")
    )


def correlation_matrix_suffstats(
    df: DataFrame, cols: Sequence[str]
) -> DataFrame:
    """All pairwise Pearson correlations from ONE sufficient-statistics
    aggregate, with a reproducible closed formula.

    Same single-scan shape as `correlation_matrix`, but instead of
    ``F.corr`` it aggregates the raw sums (sum x, sum x^2, sum x*y) and
    computes ``(n*sxy - sx*sy) / sqrt((n*sxx - sx^2) * (n*syy - sy^2))``
    in Column arithmetic. With integer-valued features the sums are
    exact in float64, so the result is bit-reproducible across engines
    evaluating the same formula — which is what the contract oracle
    pins. Output: ``(col_a, col_b, corr)`` per unordered pair. Rows with
    a NULL in ANY of ``cols`` are dropped first (listwise, like
    ``np.corrcoef`` over complete rows) — note this differs from
    `correlation_matrix`, whose ``F.corr`` is pairwise-null-aware.
    """
    df = df.na.drop(subset=list(cols))
    p = len(cols)
    xs = [F.col(c).cast("double") for c in cols]
    aggs = [F.count(F.lit(1)).cast("double").alias("n")]
    aggs += [F.sum(xs[i]).alias(f"s_{i}") for i in range(p)]
    aggs += [
        F.sum(xs[i] * xs[j]).alias(f"ss_{i}_{j}")
        for i in range(p)
        for j in range(i, p)
    ]
    one = df.agg(*aggs)
    structs = []
    for i in range(p):
        for j in range(i + 1, p):
            n, si, sj = F.col("n"), F.col(f"s_{i}"), F.col(f"s_{j}")
            sii, sjj = F.col(f"ss_{i}_{i}"), F.col(f"ss_{j}_{j}")
            sij = F.col(f"ss_{i}_{j}")
            corr = (n * sij - si * sj) / F.sqrt(
                (n * sii - si * si) * (n * sjj - sj * sj)
            )
            structs.append(
                F.struct(
                    F.lit(cols[i]).alias("col_a"),
                    F.lit(cols[j]).alias("col_b"),
                    corr.alias("corr"),
                )
            )
    # one explode over the single 1-row agg result — the corpus is
    # scanned exactly once no matter how many pairs unpivot from it
    return one.select(F.explode(F.array(*structs)).alias("r")).select("r.*")


def correlation_matrix(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """All pairwise Pearson correlations in ONE aggregate pass.

    Returns a DataFrame ``(col_a, col_b, corr)`` for every unordered pair
    ``col_a < col_b`` (positionally). Uses ``F.corr`` — Spark computes
    each pair's co-moments inside the same partial-aggregation scan, so
    p columns cost one corpus read and one 1-row Exchange regardless of
    the p(p-1)/2 output size.
    """
    pairs = [
        (cols[i], cols[j])
        for i in range(len(cols))
        for j in range(i + 1, len(cols))
    ]
    aggs = [
        F.corr(F.col(a).cast("double"), F.col(b).cast("double")).alias(
            f"c_{i}"
        )
        for i, (a, b) in enumerate(pairs)
    ]
    one = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{a}', '{b}', c_{i}" for i, (a, b) in enumerate(pairs)
    )
    return one.selectExpr(
        f"stack({len(pairs)}, {stack_args}) as (col_a, col_b, corr)"
    )


def kfold_assign(
    df: DataFrame,
    k: int = 5,
    id_col: str = "doc_id",
    fold_col: str = "fold",
) -> DataFrame:
    """Deterministic k-fold assignment for cross-validating the quality-
    classifier family (`logistic_fit_irls`/`binary_auc` per held-out
    fold): fold = md5-bucket(id) mod k — no RNG, no sort, scan-stage
    Column math, so the same corpus folds identically on any engine,
    cluster size, or rerun, and every worker agrees without coordination
    (the `deterministic_sample` hash idiom). Returns the input plus
    ``fold_col`` in [0, k). Buckets are 16-bit, so fold sizes are equal
    to within the md5 bucket granularity (~n/65536), not exactly — the
    price of a stateless assignment.
    """
    if k < 2:
        raise ValueError("kfold_assign: k must be >= 2")
    from quackosm_spark.operators.mix import _hash_bucket

    return df.withColumn(
        fold_col, (_hash_bucket(F.col(id_col)) % k).cast("int")
    )
