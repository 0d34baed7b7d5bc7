"""End-to-end corpus-curation recipe composing the operator families.

The standard pre-training data pipeline, each stage an operator proven by
its own contract query, chained lazily so Catalyst optimizes across stage
boundaries (filters sink toward the scan; only true barriers — the dedup
shuffles and the mixture window — materialize):

    exact dedup (q16/q33) → near-dup removal (q18 candidates, exact-jaccard
    verified, → q37 clusters; retention policy min-id or best-quality,
    q104) → quality/PII/language filter (q21/q38/q39) → Gopher rule
    battery (q101) → distilled logistic quality model (train on a
    deterministic sample with the rule verdict as weak labels, score
    everything scan-stage — operators/ml.logistic_fit_irls) → DSIR
    target-distribution selection (q102) →
    benchmark decontamination (q42; severity report available via q109) →
    token-budget mixture (q47) → sequence packing (q40) → token-budget
    shard manifest (q90, optionally counting tokens with a real BPE merge
    table, q89/q103)

Every stage is optional; ``curate_corpus`` returns the curated DataFrame
plus a per-stage surviving-row report. With report=True each stage is
persisted then counted once (so later counts read the cache, not a replay
of the whole upstream chain); at 100 TB run report=False and count only
the final output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from quackosm_spark.operators import dedup as D
from quackosm_spark.operators import mix as X
from quackosm_spark.operators import text as T
from quackosm_spark.operators.quantiles import exact_group_quantiles


def curate_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
    url_col: str | None = None,
    max_per_domain: int | None = None,
    near_dup: bool = True,
    min_jaccard: float = 0.8,
    keep_best_quality: bool = False,
    min_quality: float = 0.05,
    max_repetition: float = 0.6,
    min_tokens: int = 5,
    gopher: bool | dict = False,
    quality_model: bool = False,
    model_keep_fraction: float = 0.5,
    model_train_fraction: float = 0.25,
    model_label_thresholds: dict | None = None,
    dsir_target_source: str | None = None,
    dsir_keep_fraction: float = 0.5,
    budgets: dict[str, int] | None = None,
    default_budget: int = 10_000,
    temperature_total_docs: int | None = None,
    temperature_alpha: float = 0.5,
    temperature_group_col: str = "source",
    total_token_budget: int | None = None,
    pack_capacity: int | None = None,
    shard_target_tokens: int | None = None,
    bpe_merges: list | None = None,
    report: bool = True,
) -> tuple[DataFrame, dict[str, int]]:
    """Run the curation chain; returns (curated_df, stage_report).

    ``url_col`` (r09): when set, a URL-dedup stage runs FIRST — all but
    the smallest id per `dedup.canonical_url` key are dropped before any
    text hashing (the cheap crawl-level pass). ``max_per_domain`` (r10,
    requires ``url_col``): cap each registered domain at N docs right
    after URL dedup (`mix.cap_per_domain`, deterministic md5 keep-rule) —
    the C4-style anti-top-heaviness stage. ``benchmark``: held-out
    eval docs whose word 5-grams must not leak into
    training (drops any doc sharing one). ``budgets``: per-source token caps
    (see mix.budget_sample). ``total_token_budget`` (r08): a GLOBAL cap
    filled best-quality-first (mix.token_budget_filter) after all
    dedup/filter/mix stages — "curate, then keep the best N tokens".
    ``pack_capacity``: when set, append (stream,
    bin) packing slots instead of dropping columns. ``shard_target_tokens``:
    when set, append the writer's shard manifest (contiguous ~N-token
    shards in id order, mix.assign_token_shards); with ``bpe_merges`` the
    token counts come from the real BPE chain (text.bpe_token_count)
    instead of whitespace counting.

    Round-4 stages: ``keep_best_quality`` switches the near-dup retention
    policy from smallest-id to highest quality_score per cluster (ties →
    smaller id). ``gopher`` (True or a threshold dict) applies the Gopher
    rule battery as ONE scan-stage predicate after the heuristic quality
    filter. ``dsir_target_source`` keeps the top ``dsir_keep_fraction`` of
    docs by DSIR importance weight toward that source's distribution (the
    cutoff is an exact percentile — one tiny aggregate job).
    """
    stages: dict[str, int] = {}
    _cached: list[DataFrame] = []

    def _note(name: str, df: DataFrame) -> DataFrame:
        if report:
            # persist before counting so the NEXT stage's count reads this
            # stage's cache instead of replaying the whole upstream chain
            # (the LSH self-join would otherwise re-execute once per later
            # stage); the previous stage's cache is dropped once this one
            # is materialized
            df = df.persist()
            stages[name] = df.count()
            if _cached:
                _cached.pop().unpersist()
            _cached.append(df)
        return df

    out = _note("input", docs)

    # 0. URL dedup (r09): the cheapest pass a crawl pipeline runs FIRST —
    #    map-only canonicalization + one groupBy on the canonical key,
    #    before any text hashing touches duplicate fetches of one page
    if url_col is not None:
        losers = D.url_duplicates(out, url_col=url_col, id_col=id_col).select(
            F.explode("dup_ids").alias(id_col)
        )
        out = _note("url_dedup", out.join(losers, id_col, "left_anti"))

    # 0b. domain cap (r10): at most max_per_domain docs per registered
    #     domain — the C4-style anti-top-heaviness pass; quality keep-rule
    #     when the recipe later ranks on quality anyway, else the
    #     deterministic md5 slice. Runs right after URL dedup (still
    #     crawl-level, before any text hashing).
    if max_per_domain is not None:
        if url_col is None:
            raise ValueError(
                "curate_corpus: max_per_domain needs url_col (the domain "
                "comes from the URL)"
            )
        out = _note(
            "domain_cap",
            X.cap_per_domain(
                out, max_per_domain, url_col=url_col, id_col=id_col
            ),
        )

    # 1. exact dedup: keep smallest id per md5(text)
    out = _note("exact_dedup", D.drop_exact_duplicates(out, id_col, text_col))

    # 2. near-dup removal: minhash-LSH candidates → EXACT jaccard
    #    verification (a band collision alone is probabilistic evidence —
    #    never delete data on it) → transitive clusters → keep each
    #    cluster's smallest id
    if near_dup:
        candidates = D.minhash_lsh_candidates(out, id_col, text_col)
        pairs = D.verify_candidate_pairs(
            out, candidates, id_col, text_col, min_jaccard=min_jaccard
        )
        clusters = D.neardup_clusters(pairs, "doc_a", "doc_b")
        if keep_best_quality:
            # retention policy: highest quality_score per cluster (ties →
            # smaller id) instead of the arbitrary min-id — the ONE shared
            # definition in dedup.keep_best_assignments (q104 pins it);
            # singleton docs come back keep=True so only true cluster
            # losers are dropped
            base = out.select(
                F.col(id_col).alias("doc_id"),
                T.quality_score(text_col).alias("quality"),
            )
            losers = (
                D.keep_best_assignments(base, clusters)
                .where(~F.col("keep"))
                .select(F.col("doc_id").alias(id_col))
            )
        else:
            losers = clusters.where(
                F.col("doc_id") != F.col("cluster_id")
            ).select(F.col("doc_id").alias(id_col))
        out = _note("near_dedup", out.join(losers, id_col, "left_anti"))

    # 3. quality filter (single scan-stage predicate)
    out = _note(
        "quality",
        T.filter_quality(
            out,
            text_col,
            min_quality=min_quality,
            max_repetition=max_repetition,
            min_tokens=min_tokens,
        ),
    )

    # 3b. Gopher rule battery — one conjunctive scan-stage predicate
    if gopher:
        thresholds = gopher if isinstance(gopher, dict) else {}
        out = _note(
            "gopher", out.where(T.gopher_passes(text_col, **thresholds))
        )

    # 3c. distilled model filter: fit a logistic scorer on the Gopher
    # rule verdict as weak labels (the FineWeb-Edu pattern — distill an
    # expensive/rule-based judgment into a cheap model, then score
    # everything). Training reads a deterministic md5-bucket sample ONCE
    # per Newton step (iters tiny scans over the sample); scoring the
    # full corpus is one scan-stage sigmoid — no join, no UDF.
    if quality_model:
        from quackosm_spark.operators import ml as M
        from quackosm_spark.operators.mix import _hash_bucket

        tcol = F.col(text_col)
        toks = F.size(F.split(tcol, " ")).cast("double")
        feats = {
            "__f_logtok": F.log1p(toks),
            "__f_wordlen": (F.length(tcol).cast("double") + 1.0)
            / (toks + 1.0),
            "__f_alpha": F.length(
                F.regexp_replace(tcol, r"[^A-Za-z ]", "")
            ).cast("double")
            / (F.length(tcol).cast("double") + 1.0),
        }
        featured = out.withColumns(feats)
        # this stage runs EAGER actions (label check, one scan per IRLS
        # Newton step, the percentile cutoff) — persist the featured
        # plan once so those ~8 actions read a cache instead of each
        # replaying the whole upstream chain (dedup + LSH + filters),
        # which is what would happen with report=False
        featured = featured.persist()
        label_thresholds = (
            model_label_thresholds
            if model_label_thresholds is not None
            else (gopher if isinstance(gopher, dict) else {})
        )
        train = featured.where(
            _hash_bucket(F.col(id_col))
            < int(model_train_fraction * 65536)
        ).withColumn(
            "__y",
            T.gopher_passes(text_col, **label_thresholds).cast("double"),
        )
        # degenerate weak labels (all pass / all fail) leave nothing to
        # distill — and would drive the unpenalized intercept to a
        # singular Hessian. Skip the stage loudly in the report instead.
        y_lo, y_hi = train.agg(
            F.min("__y"), F.max("__y")
        ).collect()[0]
        if y_lo == y_hi:
            if report:
                stages["model_filter_skipped_degenerate_labels"] = 0
            out = featured.drop(*feats)
            model = None
        else:
            model = M.logistic_fit_irls(
                train, list(feats), "__y", iters=6, l2=1.0
            )
        if model is not None:
            scored = featured.withColumn(
                "__p", M.logistic_score(model, list(feats))
            )
            # bucketed two-pass kernel, NOT F.percentile: __p is a raw
            # continuous sigmoid score, so the exact-percentile aggregate
            # would buffer ~one distinct value per doc in a single task
            cutoff = exact_group_quantiles(
                scored.select("__p"), "__p", [], [1.0 - model_keep_fraction], ["c"]
            ).collect()[0]["c"]
            out = _note(
                "model_filter",
                scored.where(F.col("__p") >= cutoff).drop(
                    "__p", *feats
                ),
            )
        # the cutoff is computed; downstream recomputes `featured` at
        # most once more at final materialization (or reads the stage
        # cache in report mode) — release the training cache
        featured.unpersist()

    # 3d. DSIR selection toward a target source's distribution
    if dsir_target_source is not None:
        weights = T.dsir_logweights(
            out, dsir_target_source, id_col=id_col, text_col=text_col
        ).select(F.col("doc_id").alias(id_col), "logweight")
        # same continuous-value reasoning as the model cutoff above
        cutoff = exact_group_quantiles(
            weights.select("logweight"),
            "logweight",
            [],
            [1.0 - dsir_keep_fraction],
            ["c"],
        ).collect()[0]["c"]
        keep = weights.where(F.col("logweight") >= cutoff).select(id_col)
        out = _note("dsir", out.join(keep, id_col, "left_semi"))

    # 4. decontamination vs the benchmark set
    if benchmark is not None:
        flagged = D.contamination_matches(out, benchmark, id_col, text_col).select(
            F.col("doc_id").alias(id_col)
        )
        out = _note("decontaminated", out.join(flagged, id_col, "left_anti"))

    # 4b. temperature-scaled source mixing (mix.temperature_sample):
    # rebalance the SURVIVING corpus across sources by the n**alpha rule
    # before token budgeting — the standard fix for head-source
    # domination (upsample the tail without replacement). Runs after
    # dedup/filters/decontamination so quotas reflect what actually
    # remains.
    if temperature_total_docs is not None:
        out = _note(
            "temperature_mix",
            X.temperature_sample(
                out,
                temperature_total_docs,
                alpha=temperature_alpha,
                group_col=temperature_group_col,
                id_col=id_col,
            ),
        )

    # 5. per-source token budgets in deterministic shuffle order
    if budgets is not None:
        out = _note(
            "budget_mix",
            X.budget_sample(out, budgets, default_budget=default_budget),
        )

    # 5b. global token budget, BEST-FIRST: greedy top-quality selection
    # (mix.token_budget_filter) — keeps the highest-quality prefix whose
    # cumulative tokens fit. Runs AFTER dedup/filters/mix so the budget
    # buys only surviving docs.
    if total_token_budget is not None:
        out = _note(
            "token_budget",
            X.token_budget_filter(
                out, budget_tokens=total_token_budget,
                id_col=id_col, text_col=text_col,
            )
            .where(F.col("kept"))
            .drop("n_tokens", "kept"),
        )

    # 6. sequence packing
    if pack_capacity is not None:
        out = _note("packed", X.pack_sequences(out, capacity=pack_capacity))

    # 7. token-budget shard manifest for the dataset writer
    if shard_target_tokens is not None:
        tokens_col = None
        if bpe_merges is not None:
            out = out.withColumn(
                "n_tokens", T.bpe_token_count(F.col(text_col), bpe_merges)
            )
            tokens_col = "n_tokens"
        out = _note(
            "sharded",
            X.assign_token_shards(
                out, id_col, tokens_col, target_tokens=shard_target_tokens
            ),
        )

    return out, stages
