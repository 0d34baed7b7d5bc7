"""End-to-end corpus-curation recipe: stage chaining, monotone survivors,
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackosm_spark.operators.recipes import curate_corpus

SF_DIR = "/root/testdata/sf0.001"


def test_curate_corpus_full_chain(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    benchmark = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)

    out, report = curate_corpus(
        train,
        benchmark=benchmark,
        budgets={"src0": 500},
        default_budget=300,
        pack_capacity=512,
    )
    rows = out.collect()
    # every enabled stage reported, counts monotonically non-increasing
    order = ["input", "exact_dedup", "near_dedup", "quality",
             "decontaminated", "budget_mix", "packed"]
    assert list(report) == order
    vals = [report[k] for k in order]
    assert all(a >= b for a, b in zip(vals, vals[1:-1]))  # packing keeps rows
    assert report["packed"] == report["budget_mix"] == len(rows)
    assert 0 < len(rows) <= report["input"]
    # packing columns appended
    assert {"stream", "bin_id"} <= set(out.columns)
    # deterministic end to end
    out2, report2 = curate_corpus(
        train, benchmark=benchmark, budgets={"src0": 500},
        default_budget=300, pack_capacity=512,
    )
    assert report2 == report
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in out2.collect())


def test_curate_corpus_minimal_stages(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out, report = curate_corpus(docs, near_dup=False, report=True)
    assert list(report) == ["input", "exact_dedup", "quality"]
    assert out.count() == report["quality"] > 0


def test_pack_sequences_passes_payload_columns_through(spark):
    from quackosm_spark.operators.mix import pack_sequences

    d = spark.createDataFrame(
        [(1, "a b c", "web"), (2, "d e", "books")],
        "doc_id LONG, text STRING, source STRING",
    )
    out = pack_sequences(d, capacity=4, num_streams=1)
    assert {"doc_id", "text", "source", "stream", "bin_id", "n_tokens"} <= set(out.columns)
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[1].source == "web" and rows[2].bin_id == 0


def test_verified_near_dedup_keeps_dissimilar_collisions(spark):
    from quackosm_spark.operators.dedup import verify_candidate_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox jumps"),
         (3, "completely different words")],
        "doc_id LONG, text STRING",
    )
    # fake candidate pairs: a true dup pair and a false collision
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3)], "doc_a LONG, doc_b LONG"
    )
    kept = {(r.doc_a, r.doc_b): r.jaccard
            for r in verify_candidate_pairs(docs, pairs, min_jaccard=0.8).collect()}
    assert kept == {(1, 2): 1.0}  # false collision filtered out


def test_curate_corpus_shard_manifest_stage(spark):
    """r03: stage 7 appends the writer's shard manifest; with a BPE merge
    table the token counts come from the real merge chain."""
    from quackosm_spark.operators.text import bpe_token_count

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    merges = [("e", "r"), ("i", "n"), ("t", "h")]
    out, report = curate_corpus(
        docs,
        near_dup=False,
        shard_target_tokens=5_000,
        bpe_merges=merges,
    )
    assert list(report) == ["input", "exact_dedup", "quality", "sharded"]
    assert report["sharded"] == report["quality"]
    rows = out.select("doc_id", "n_tokens", "shard_id").collect()
    # shard ids contiguous from 0; docs contiguous in id order per shard
    shard_ids = sorted({r["shard_id"] for r in rows})
    assert shard_ids == list(range(len(shard_ids)))
    by_id = sorted(rows, key=lambda r: r["doc_id"])
    assert [r["shard_id"] for r in by_id] == sorted(
        r["shard_id"] for r in by_id
    )
    # n_tokens really is the BPE count
    expect = {
        r["doc_id"]: r["n"]
        for r in out.select(
            "doc_id", bpe_token_count(F.col("text"), merges).alias("n")
        ).collect()
    }
    assert all(r["n_tokens"] == expect[r["doc_id"]] for r in rows)


def test_curate_corpus_round4_stages(spark):
    """gopher + dsir + keep-best retention compose into the chain with
    monotone survivor counts and deterministic output."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out, report = curate_corpus(
        docs,
        keep_best_quality=True,
        gopher={"min_words": 5, "min_stopword_hits": 0,
                "min_alpha_word_ratio": 0.5},
        dsir_target_source="src0",
        dsir_keep_fraction=0.6,
    )
    assert list(report) == [
        "input", "exact_dedup", "near_dedup", "quality", "gopher", "dsir",
    ]
    vals = list(report.values())
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert 0 < report["dsir"] <= report["gopher"]
    # ~keep_fraction of the gopher survivors pass the DSIR percentile
    assert report["dsir"] >= int(report["gopher"] * 0.4)
    out2, report2 = curate_corpus(
        docs,
        keep_best_quality=True,
        gopher={"min_words": 5, "min_stopword_hits": 0,
                "min_alpha_word_ratio": 0.5},
        dsir_target_source="src0",
        dsir_keep_fraction=0.6,
    )
    assert report2 == report
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_curate_keep_best_prefers_quality_over_id(spark):
    base = ("the quick brown fox jumps over the lazy dog and that have "
            "with to be of it again and again for the test corpus") * 3
    rows = [
        (1, base + " !!!!!!!!!!!!!!!!!!!!!!!!!!!!", "web"),  # dirtier copy
        (2, base, "web"),                                     # cleaner copy
        (3, "an unrelated document about spark query planning "
            "that shares nothing with the others", "web"),
    ]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING, source STRING")
    out_min, _ = curate_corpus(
        d, min_jaccard=0.3, min_tokens=1, min_quality=0.0,
        max_repetition=1.0,
    )
    out_best, _ = curate_corpus(
        d, min_jaccard=0.3, min_tokens=1, min_quality=0.0,
        max_repetition=1.0, keep_best_quality=True,
    )
    assert {r.doc_id for r in out_min.collect()} == {1, 3}   # min-id policy
    assert {r.doc_id for r in out_best.collect()} == {2, 3}  # quality policy


def test_curate_corpus_quality_model_stage(spark):
    """The distilled logistic quality filter trains on a deterministic
    sample with the Gopher verdict as weak labels, scores everything
    scan-stage, and keeps ~model_keep_fraction by percentile cutoff."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    labels = {"min_words": 56, "min_stopword_hits": 0,
              "min_alpha_word_ratio": 0.0, "min_mean_word_len": 0.0}
    out, report = curate_corpus(
        docs,
        near_dup=False,
        quality_model=True,
        model_keep_fraction=0.5,
        model_train_fraction=0.5,
        model_label_thresholds=labels,
    )
    assert "model_filter" in report
    assert 0 < report["model_filter"] <= report["quality"]
    # percentile keep: roughly half the quality survivors remain
    assert report["model_filter"] >= int(report["quality"] * 0.4)
    assert report["model_filter"] <= int(report["quality"] * 0.75) + 1
    # feature/score scratch columns do not leak into the output
    assert not [c for c in out.columns if c.startswith("__")]
    # deterministic end to end (hash sample + fixed IRLS iterations)
    out2, report2 = curate_corpus(
        docs,
        near_dup=False,
        quality_model=True,
        model_keep_fraction=0.5,
        model_train_fraction=0.5,
        model_label_thresholds=labels,
    )
    assert report2 == report
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_curate_quality_model_degenerate_labels_skips(spark):
    """All-pass (or all-fail) weak labels leave nothing to distill: the
    stage skips loudly in the report and keeps every row."""
    rows = [(i, "z") for i in range(40)]  # every doc fails every rule
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out, report = curate_corpus(
        docs,
        near_dup=False,
        min_quality=0.0,
        max_repetition=1.0,
        min_tokens=0,
        quality_model=True,
        model_train_fraction=1.0,
    )
    assert "model_filter_skipped_degenerate_labels" in report
    assert "model_filter" not in report
    assert out.count() == report["quality"]


def test_curate_corpus_total_token_budget_stage(spark):
    """r08: total_token_budget keeps the best-quality prefix whose token
    sum fits — the kept set must equal token_budget_filter applied to the
    same surviving docs, the stage must report, and payload columns pass
    through unchanged."""
    from quackosm_spark.operators.mix import token_budget_filter

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out, report = curate_corpus(docs, total_token_budget=5_000)
    assert "token_budget" in report
    rows = out.collect()
    assert report["token_budget"] == len(rows)
    assert set(out.columns) == set(docs.columns)

    # reference: run the filter on the docs surviving the prior stages
    out_nobudget, _ = curate_corpus(docs)
    ref = {
        r.doc_id
        for r in token_budget_filter(out_nobudget, budget_tokens=5_000)
        .where(F.col("kept"))
        .collect()
    }
    assert {r.doc_id for r in rows} == ref
    # and the budget is actually respected
    from quackosm_spark.operators.text import token_count
    kept_tokens = out.select(
        F.sum(token_count("text").cast("bigint"))
    ).collect()[0][0]
    assert kept_tokens <= 5_000


def test_curate_corpus_temperature_mix_stage(spark):
    """r08: the temperature stage rebalances SURVIVING docs across sources
    (quota ∝ n**alpha, md5 selection) and composes with the downstream
    token budget; deterministic across runs."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out, report = curate_corpus(
        docs, near_dup=False,
        temperature_total_docs=150, temperature_alpha=0.0,
    )
    assert list(report) == ["input", "exact_dedup", "quality", "temperature_mix"]
    assert report["temperature_mix"] <= 150
    per = {r.source: r["count"] for r in out.groupBy("source").count().collect()}
    # alpha=0 → equal quotas: every surviving source contributes the same
    # count unless it saturated (smaller than its quota)
    quotas = set(per.values())
    assert len(quotas) <= 2  # the common quota + possibly saturated groups
    # deterministic
    out2, report2 = curate_corpus(
        docs, near_dup=False,
        temperature_total_docs=150, temperature_alpha=0.0,
    )
    assert report2 == report
    assert sorted(r.doc_id for r in out.collect()) == sorted(
        r.doc_id for r in out2.collect()
    )


def test_curate_corpus_url_dedup_stage(spark):
    """r09: url_col wires crawl-level URL dedup in as stage 0 — tracking-
    param/case/fragment variants of one page collapse before text dedup,
    and the stage report records the drop."""
    from quackosm_spark.operators.recipes import curate_corpus

    rows = [
        (1, "the same page text fetched twice by the crawler today",
         "https://site.com/p?a=1"),
        (2, "completely different text that must survive the url stage",
         "HTTPS://WWW.Site.com:443/p/?a=1&utm_source=x#frag"),  # same page
        (3, "another unique document with its very own address",
         "https://site.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, url: string")
    out, report = curate_corpus(
        df, url_col="url", near_dup=False, min_quality=0.0,
        max_repetition=1.0, min_tokens=1,
    )
    kept = {r.doc_id for r in out.collect()}
    assert 2 not in kept and {1, 3} <= kept
    assert report["input"] == 3 and report["url_dedup"] == 2


def test_curate_corpus_domain_cap_stage(spark):
    """r10: max_per_domain caps each registered domain right after URL
    dedup (deterministic md5 keep-rule), records a stage-report row, and
    raises without url_col."""
    import hashlib

    import pytest as _pytest

    from quackosm_spark.operators.recipes import curate_corpus

    rows = [
        (i, f"unique document body number {i} with enough words to live",
         f"https://big.com/page/{i}")
        for i in range(1, 6)
    ] + [
        (9, "a lone page on the small domain that always survives",
         "https://small.org/only"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, url: string")
    out, report = curate_corpus(
        df, url_col="url", max_per_domain=2, near_dup=False,
        min_quality=0.0, max_repetition=1.0, min_tokens=1,
    )
    kept = {r.doc_id for r in out.collect()}
    big_keep = sorted(
        (hashlib.md5(str(i).encode()).hexdigest(), i) for i in range(1, 6)
    )[:2]
    assert kept == {i for _, i in big_keep} | {9}
    assert report["domain_cap"] == 3

    with _pytest.raises(ValueError, match="url_col"):
        curate_corpus(df, max_per_domain=2)
