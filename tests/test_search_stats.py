"""BM25 search, rollup stats, segment-level dedup, semantic dedup,
lag deltas — unit tests on crafted inputs (oracle parity is covered by
q50-q55 in tests/oracle_harness.py)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from quackosm_spark.operators.dedup import (
    frequent_segments,
    remove_frequent_segments,
    semantic_dedup,
    semantic_duplicates,
)
from quackosm_spark.operators.search import bm25_scores, bm25_topk
from quackosm_spark.operators.stats import corpus_rollup
from quackosm_spark.operators.temporal import lag_deltas


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "spark shuffle join spark spark", "en", "web"),
            (2, "the quick brown fox", "en", "web"),
            (3, "spark window", "en", "books"),
            (4, "nothing relevant here", "fr", "books"),
            (5, "", "fr", "web"),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING",
    )


def test_bm25_scores_ranks_tf_and_rarity(docs):
    rows = {r.doc_id: r for r in bm25_scores(docs, ["spark", "window"]).collect()}
    # docs 2, 4, 5 match nothing → absent
    assert set(rows) == {1, 3}
    # doc 3 matches both terms, doc 1 only 'spark'
    assert rows[3].n_matched == 2 and rows[1].n_matched == 1
    # 'window' is rarer (df=1) than 'spark' (df=2) → doc 3 outranks doc 1
    # despite doc 1's higher tf
    assert rows[3].score > rows[1].score > 0


def test_bm25_formula_matches_hand_computation(docs):
    rows = {r.doc_id: r for r in bm25_scores(docs, ["spark"]).collect()}
    n, avgdl, df = 5.0, (5 + 4 + 2 + 3 + 0) / 5.0, 2.0
    idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    tf, dl, k1, b = 3.0, 5.0, 1.2, 0.75
    expected = idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    assert rows[1].score == pytest.approx(expected, abs=1e-4)


def test_bm25_topk_limit_and_tiebreak(docs):
    out = bm25_topk(docs, ["spark"], k=1).collect()
    assert len(out) == 1 and out[0].doc_id == 1  # highest tf wins


def test_frequent_segments_document_frequency(spark):
    d = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "a b c q r s"),
            (3, "a b c a b c"),  # repeats within doc count ONCE
            (4, "unrelated words here"),
        ],
        "doc_id LONG, text STRING",
    )
    freq = {r.seg: r.n_docs for r in frequent_segments(d, seg_words=3, min_docs=3).collect()}
    assert freq == {"a b c": 3}


def test_remove_frequent_segments_preserves_order_and_empties(spark):
    d = spark.createDataFrame(
        [
            (1, "a b c x y z"),
            (2, "q r s a b c"),
            (3, "a b c"),
            (4, ""),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in
           remove_frequent_segments(d, seg_words=3, min_docs=3).collect()}
    assert out[1].text_clean == "x y z" and out[1].n_kept == 1
    assert out[2].text_clean == "q r s" and out[2].n_kept == 1
    assert out[3].text_clean == "" and out[3].n_kept == 0  # fully boilerplate
    assert out[4].text_clean == "" and out[4].n_kept == 0  # empty input kept
    assert set(out) == {1, 2, 3, 4}


def test_semantic_dedup_within_cluster_only(spark):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0], 0),
            (2, [1.0, 0.01], 0),   # near-dup of 1, same cluster → dropped
            (3, [1.0, 0.0], 1),    # identical to 1 but other cluster → kept
            (4, [0.0, 1.0], 0),    # orthogonal → kept
        ],
        "vec_id LONG, embedding ARRAY<DOUBLE>, label INT",
    )
    pairs = semantic_duplicates(emb, "label", threshold=0.99).collect()
    assert [(p.id_a, p.id_b) for p in pairs] == [(1, 2)]
    kept = sorted(r.vec_id for r in semantic_dedup(emb, "label", threshold=0.99).collect())
    assert kept == [1, 3, 4]


def test_corpus_rollup_levels(docs):
    rows = corpus_rollup(docs).collect()
    levels = {(r.source, r.lang, r.level): r.n_docs for r in rows}
    assert levels[("web", "en", 0)] == 2
    assert levels[("web", None, 1)] == 3       # source subtotal
    assert levels[(None, None, 3)] == 5        # grand total
    # one shuffle: every level appears, 2 langs x 2 sources present
    assert len([k for k in levels if k[2] == 0]) == 4


def test_lag_deltas_first_row_null_and_gaps(spark):
    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, 10.0),
            (2, "2024-01-01 00:00:01", 7, 13.0),
            (3, "2024-01-01 00:00:03", 8, 1.0),
        ],
        "event_id LONG, ts STRING, user_id LONG, value DOUBLE",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value")
    out = {r.event_id: r for r in
           lag_deltas(ev, ["user_id"], ["ts", "event_id"], "value", "ts").collect()}
    assert out[1].delta is None and out[1].gap_us is None
    assert out[2].delta == 3.0 and out[2].gap_us == 1_000_000
    assert out[3].delta is None  # first (only) row of its user


def test_edit_distance_pairs_cross_band_complete(spark):
    from quackosm_spark.operators.dedup import edit_distance_pairs

    # lengths 9 and 11 land in different bands (band=3: blocks 3 vs 3 — make
    # them straddle: lengths 8 and 11 → blocks 2 and 3 with band 3)
    d = spark.createDataFrame(
        [
            (1, "aaaaaaaa"),        # len 8  → band 2 (and 3)
            (2, "aaaaaaaa aa"),     # len 11 → band 3 (and 4); dist 3
            (3, "zzzzzzzzzzzz"),    # unrelated
        ],
        "doc_id LONG, text STRING",
    )
    out = {(r.id_a, r.id_b): r.dist for r in
           edit_distance_pairs(d, max_dist=3, band=3).collect()}
    assert out == {(1, 2): 3}  # found despite different home bands


def test_edit_distance_pairs_identical_and_threshold(spark):
    from quackosm_spark.operators.dedup import edit_distance_pairs

    d = spark.createDataFrame(
        [(1, "hello world"), (2, "hello world"), (3, "hello w0rld"), (4, "goodbye")],
        "doc_id LONG, text STRING",
    )
    out = {(r.id_a, r.id_b): r.dist for r in
           edit_distance_pairs(d, max_dist=1).collect()}
    assert out[(1, 2)] == 0 and out[(1, 3)] == 1 and out[(2, 3)] == 1
    assert all(4 not in pair for pair in out)


def test_stratified_fixed_n_exact_counts(spark):
    from quackosm_spark.operators.mix import stratified_fixed_n

    rows = [(i, "big") for i in range(100)] + [(1000 + i, "small") for i in range(3)]
    d = spark.createDataFrame(rows, "doc_id LONG, grp STRING")
    out = stratified_fixed_n(d, "grp", 10).groupBy("grp").count().collect()
    counts = {r.grp: r["count"] for r in out}
    assert counts == {"big": 10, "small": 3}  # small group kept whole
    # deterministic: same rows on re-run
    a = sorted(r.doc_id for r in stratified_fixed_n(d, "grp", 10).collect())
    b = sorted(r.doc_id for r in stratified_fixed_n(d, "grp", 10).collect())
    assert a == b


def test_latest_by_key_ties_and_payload(spark):
    from quackosm_spark.operators.temporal import latest_by_key

    ev = spark.createDataFrame(
        [
            (1, "2024-01-01 00:00:00", 7, 1.0),
            (2, "2024-01-02 00:00:00", 7, 2.0),
            (3, "2024-01-02 00:00:00", 7, 3.0),  # same ts, higher id wins
            (4, "2024-01-01 00:00:00", 8, 9.0),
        ],
        "event_id LONG, ts STRING, user_id LONG, value DOUBLE",
    ).select("event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "value")
    out = {r.user_id: r for r in
           latest_by_key(ev, ["user_id"], ["ts", "event_id"]).collect()}
    assert out[7].event_id == 3 and out[7].value == 3.0
    assert out[8].event_id == 4
    assert set(out[7].asDict()) == {"user_id", "event_id", "ts", "value"}


def test_quality_deciles_partitioned_ranking(spark):
    from quackosm_spark.operators.stats import quality_deciles

    rows = [(i, "word " * (i + 1), "en") for i in range(20)] + [
        (100, "solo document here", "fr")
    ]
    d = spark.createDataFrame(
        [(i, t.strip(), lg) for i, t, lg in rows], "doc_id LONG, text STRING, lang STRING"
    )
    out = quality_deciles(d, buckets=4).collect()
    en = [r for r in out if r.lang == "en"]
    fr = [r for r in out if r.lang == "fr"]
    # ranking is within-language: the lone fr doc is its own bucket 1 / rank 0
    assert len(fr) == 1 and fr[0].decile == 1 and fr[0].pct_rank == 0.0
    assert {r.decile for r in en} == {1, 2, 3, 4} and len(en) == 20
    # percent_rank monotone in quality
    ranked = sorted(en, key=lambda r: r.quality)
    assert all(a.pct_rank <= b.pct_rank for a, b in zip(ranked, ranked[1:]))


def test_pivot_counts_explicit_values_and_zero_fill(spark):
    from quackosm_spark.operators.stats import pivot_counts

    d = spark.createDataFrame(
        [(1, "en", "web"), (2, "en", "web"), (3, "fr", "web"), (4, "en", "books")],
        "doc_id LONG, lang STRING, source STRING",
    )
    out = {r.source: r for r in
           pivot_counts(d, pivot_values=["en", "fr", "zh"]).collect()}
    assert out["web"].en == 2 and out["web"].fr == 1 and out["web"].zh == 0
    assert out["books"].en == 1 and out["books"].fr == 0
    assert set(out["web"].asDict()) == {"source", "en", "fr", "zh"}


def test_approx_distinct_counts_within_tolerance(spark):
    from quackosm_spark.operators.stats import approx_distinct_counts

    d = spark.range(20000).select(
        (F.col("id") % 1000).alias("k"), (F.col("id") % 37).alias("g")
    )
    row = approx_distinct_counts(d, ["k"], rsd=0.02).collect()[0]
    assert abs(row["approx_k"] - 1000) / 1000 < 0.06  # ~3 sigma of rsd=0.02
    grouped = approx_distinct_counts(d, ["k"], ["g"], rsd=0.02).collect()
    assert len(grouped) == 37
    for r in grouped:
        exact = 20000 // 37 + (1 if r.g < 20000 % 37 else 0)
        # per-group distinct k is ~541; allow the same relative band
        assert abs(r["approx_k"] - exact) / exact < 0.08


def test_bm25_empty_corpus_and_all_empty_docs(spark):
    empty = spark.createDataFrame([], "doc_id LONG, text STRING")
    assert bm25_scores(empty, ["spark"]).count() == 0
    blank = spark.createDataFrame([(1, ""), (2, "  ")], "doc_id LONG, text STRING")
    out = bm25_scores(blank, ["spark"]).collect()
    assert out == []


def test_edit_distance_pairs_rejects_incomplete_band(spark):
    from quackosm_spark.operators.dedup import edit_distance_pairs

    d = spark.createDataFrame([(1, "abc")], "doc_id LONG, text STRING")
    with pytest.raises(ValueError, match="band"):
        edit_distance_pairs(d, max_dist=4, band=3)


def test_quality_psi_reference_zero_and_shift_ordering(spark):
    """r03: PSI of the reference source vs itself is exactly 0; a source
    whose quality distribution is shifted scores higher than an
    identically-distributed one."""
    from quackosm_spark.operators.stats import quality_psi

    rows = (
        [(i, "high quality text " * 20, "ref") for i in range(40)]
        + [(100 + i, "high quality text " * 20, "same") for i in range(40)]
        + [(200 + i, "!!::;;##@@", "shifted") for i in range(40)]
    )
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["source"]: r for r in quality_psi(docs, ref_source="ref").collect()
    }
    assert out["ref"]["psi"] == 0.0
    assert out["same"]["psi"] == pytest.approx(0.0, abs=1e-9)
    assert out["shifted"]["psi"] > 0.25  # "major shift" band
    assert out["shifted"]["n_docs"] == 40


def test_quality_psi_missing_ref_source_raises(spark):
    """ADVICE r03: a typo'd ref_source used to empty the inner join and
    read as 'no drift anywhere' — it must fail loud instead."""
    from quackosm_spark.operators.stats import quality_psi

    docs = spark.createDataFrame(
        [(1, "some text here", "web"), (2, "other text", "books")],
        "doc_id long, text string, source string",
    )
    with pytest.raises(ValueError, match="typo_source"):
        quality_psi(docs, ref_source="typo_source")
    # the default (lexicographically first) path is untouched
    assert quality_psi(docs).count() == 2


def test_rrf_fuse_known_values(spark):
    """Hand-computed RRF: doc 1 in both lists, docs 2/3 in one each."""
    from quackosm_spark.operators.search import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2)], "doc_id LONG, rank INT")
    b = spark.createDataFrame([(3, 1), (1, 2)], "doc_id LONG, rank INT")
    out = {r.doc_id: r for r in rrf_fuse([a, b], k=60).collect()}
    assert out[1].n_lists == 2
    assert out[1].rrf_score == pytest.approx(1 / 61 + 1 / 62, abs=1e-6)
    assert out[2].rrf_score == pytest.approx(1 / 62, abs=1e-6)
    assert out[3].rrf_score == pytest.approx(1 / 61, abs=1e-6)
    # a doc appearing in both lists outranks single-list docs at any rank
    assert out[1].rrf_score > max(out[2].rrf_score, out[3].rrf_score)
    with pytest.raises(ValueError):
        rrf_fuse([])


def test_hybrid_search_end_to_end(spark):
    from quackosm_spark.operators.search import hybrid_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = hybrid_search(docs, emb, ["spark", "window"], query_vec_id=3,
                        k_candidates=20)
    rows = out.collect()
    assert 20 <= len(rows) <= 40  # two top-20 lists, possibly overlapping
    assert all(r.n_lists in (1, 2) for r in rows)
    # every score is a sum of n_lists reciprocal terms in [1/80, 1/61]
    for r in rows:
        assert r.n_lists * (1 / 80) - 1e-6 <= r.rrf_score
        assert r.rrf_score <= r.n_lists * (1 / 61) + 1e-6
    # deterministic across reruns
    again = hybrid_search(docs, emb, ["spark", "window"], query_vec_id=3,
                          k_candidates=20).collect()
    assert sorted((r.doc_id, r.rrf_score) for r in rows) == sorted(
        (r.doc_id, r.rrf_score) for r in again
    )


def test_hybrid_search_mapping_joins_disjoint_id_spaces(spark):
    """r06: the optional doc↔embedding mapping translates dense candidates
    into the document id space before fusion — the shifted id space plus
    mapping must reproduce the vec_id≡doc_id result exactly."""
    from pyspark.sql import functions as F
    from quackosm_spark.operators.search import hybrid_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    base = hybrid_search(docs, emb, ["spark", "window"], query_vec_id=3,
                         k_candidates=20).collect()

    shifted = emb.withColumn("vec_id", F.col("vec_id") + 50000)
    mapping = emb.select(
        (F.col("vec_id") + 50000).alias("vec_id"),
        F.col("vec_id").alias("doc_id"),
    )
    mapped = hybrid_search(docs, shifted, ["spark", "window"],
                           query_vec_id=50003, k_candidates=20,
                           mapping=mapping).collect()
    assert sorted((r.doc_id, r.rrf_score, r.n_lists) for r in base) == sorted(
        (r.doc_id, r.rrf_score, r.n_lists) for r in mapped
    )


def test_hybrid_search_mapping_contract_violations_raise(spark):
    """r08 (ADVICE r07): a duplicate mapping row for a candidate vec_id or
    a candidate with NO mapping row must raise, not silently pick an
    arbitrary doc_id / drop the candidate from fusion."""
    import pytest
    from pyspark.sql import functions as F
    from quackosm_spark.operators.search import hybrid_search

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    shifted = emb.withColumn("vec_id", F.col("vec_id") + 50000)
    good = emb.select(
        (F.col("vec_id") + 50000).alias("vec_id"),
        F.col("vec_id").alias("doc_id"),
    )

    # duplicate: every mapping row twice -> ambiguous translation
    dup = good.unionAll(good)
    with pytest.raises(ValueError, match="duplicate"):
        hybrid_search(docs, shifted, ["spark", "window"],
                      query_vec_id=50003, k_candidates=5, mapping=dup)

    # partial: drop half the id space -> some candidate has no row
    partial = good.where(F.col("doc_id") % 2 == 0)
    with pytest.raises(ValueError, match="not total"):
        hybrid_search(docs, shifted, ["spark", "window"],
                      query_vec_id=50002, k_candidates=20, mapping=partial)


def test_logprob_band_filter_band_membership(spark):
    from quackosm_spark.operators.text import logprob_band_filter

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = logprob_band_filter(docs, lower_q=0.2, upper_q=0.8).collect()
    n = len(out)
    kept = [r for r in out if r.kept]
    # roughly the middle 60% band survives (ties can widen it slightly)
    assert 0.55 * n <= len(kept) <= 0.7 * n
    lo = min(r.avg_logprob for r in kept)
    hi = max(r.avg_logprob for r in kept)
    # every dropped doc lies strictly outside the kept band
    for r in out:
        if not r.kept:
            assert r.avg_logprob < lo or r.avg_logprob > hi


def test_hashed_tfidf_sparse_semantics(spark):
    from quackosm_spark.operators.text import hashed_tfidf

    d = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "aa cc"), (3, "")],
        "doc_id LONG, text STRING",
    )
    rows = hashed_tfidf(d, dim=64).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, {})[r.bucket] = r.tfidf
    assert 3 not in by_doc  # empty doc emits nothing
    import math
    # r06: N counts docs WITH >= 1 token (standard TF-IDF corpus size) —
    # the empty doc is outside the corpus, so N = 2 here.
    # 'aa' appears in both, idf = ln(2/(1+2)) (assuming no bucket
    # collision at dim=64 for 3 distinct words)
    assert len(by_doc[1]) == 2 and len(by_doc[2]) == 2
    tf_aa_doc1 = 2 / 3
    vals1 = sorted(by_doc[1].values())
    assert any(
        abs(v - round(tf_aa_doc1 * math.log(2 / 3), 6)) < 1e-9 for v in vals1
    )
    # 'bb' df=1: tfidf = (1/3)*ln(2/2) = 0
    assert any(
        abs(v - round((1 / 3) * math.log(2 / 2), 6)) < 1e-9 for v in vals1
    )


def test_contamination_overlap_report_degrees(spark):
    from quackosm_spark.operators.text import contamination_overlap_report

    bench = spark.createDataFrame(
        [(100, "one two three four five six")], "doc_id LONG, text STRING"
    )
    docs = spark.createDataFrame(
        [
            (1, "one two three four five six"),          # fully contained
            (2, "one two three four five different tail here now"),
            (3, "nothing shared at all in this text"),
        ],
        "doc_id LONG, text STRING",
    )
    out = {r.doc_id: r for r in
           contamination_overlap_report(docs, bench, n=5).collect()}
    assert out[1].overlap_frac == 1.0
    assert 0.0 < out[2].overlap_frac < 1.0
    assert out[3].overlap_frac == 0.0
    assert out[2].n_contaminated == 1  # only "one two three four five"


def test_quality_deciles_bit_equal_to_single_window_formulation(spark):
    """r07: the two-pass bucketed rank must reproduce the ntile /
    percent_rank window EXACTLY — incl. a group smaller than `buckets`
    (base = 0 tile sizes), heavy quality ties, and a dominant group."""
    import random

    from pyspark.sql import Window
    from quackosm_spark.operators.stats import quality_deciles
    from quackosm_spark.operators.text import quality_score

    random.seed(11)
    words = ["alpha", "beta", "gamma", "delta,!", "x9"]
    rows = []
    for i in range(400):  # dominant group
        rows.append((i, " ".join(random.choices(words, k=random.randint(1, 40))), "en"))
    for i in range(400, 407):  # group smaller than buckets=10
        rows.append((i, "tiny doc", "fr"))
    for i in range(407, 500):  # heavy ties: identical text → identical quality
        rows.append((i, "same same same", "de"))
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING, lang STRING")

    w = Window.partitionBy("lang").orderBy(quality_score("text"), F.col("doc_id"))
    ref = {
        r.doc_id: (r.lang, r.quality, r.decile, r.pct_rank)
        for r in d.select(
            "doc_id",
            "lang",
            quality_score("text").alias("quality"),
            F.ntile(10).over(w).alias("decile"),
            F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        ).collect()
    }
    got = {
        r.doc_id: (r.lang, r.quality, r.decile, r.pct_rank)
        for r in quality_deciles(d).collect()
    }
    assert got == ref

    # r08: score_col path — ranking a PRECOMPUTED [0,1] score must be
    # identical to computing the same score internally (and ignores
    # text_col entirely)
    pre = d.select(
        "doc_id", "lang", quality_score("text").alias("myscore")
    )
    got_pre = {
        r.doc_id: (r.lang, r.quality, r.decile, r.pct_rank)
        for r in quality_deciles(
            pre, group_col="lang", score_col="myscore", text_col="absent"
        ).collect()
    }
    assert got_pre == ref


def test_winsorize_bit_equal_to_builtin_percentile(spark):
    """r07: the bucketed two-pass quantile bounds must match F.percentile
    bit-for-bit on raw continuous values (and on all-null groups)."""
    import random

    from quackosm_spark.operators.stats import winsorize

    random.seed(23)
    rows = [(i, "a", random.uniform(-1e3, 1e3)) for i in range(4000)]
    rows += [(i, "b", float(random.randint(0, 3))) for i in range(4000, 5000)]
    rows += [(5000, "c", 42.0)]
    df = spark.createDataFrame(rows, "event_id LONG, event_type STRING, value DOUBLE")

    bounds = {
        r.event_type: (r.lo, r.hi)
        for r in df.groupBy("event_type")
        .agg(
            F.percentile("value", 0.05).alias("lo"),
            F.percentile("value", 0.95).alias("hi"),
        )
        .collect()
    }
    got = winsorize(df, "value", "event_type").collect()
    assert len(got) == len(rows)
    for r in got:
        lo, hi = bounds[r.event_type]
        assert r.value_w == round(min(max(r.value, lo), hi), 6), (r, lo, hi)


def test_exact_group_quantiles_global_mode_matches_builtin(spark):
    """r07: empty group_cols = grand-aggregate quantiles, bit-equal to the
    global F.percentile (used by the recipe cutoffs on raw continuous
    scores, where the built-in would buffer corpus-distinct values)."""
    import random

    from quackosm_spark.operators.quantiles import exact_group_quantiles

    random.seed(41)
    df = spark.createDataFrame(
        [(random.uniform(-10, 10),) for _ in range(4000)], "v DOUBLE"
    )
    ref = df.agg(
        F.percentile("v", 0.1), F.percentile("v", 0.9)
    ).collect()[0]
    got = exact_group_quantiles(df, "v", [], [0.1, 0.9], ["a", "b"]).collect()
    assert len(got) == 1
    assert (got[0]["a"], got[0]["b"]) == (ref[0], ref[1])
    # empty input still yields one NULL row (matching a grand aggregate)
    empty = exact_group_quantiles(
        df.where("v > 1e9"), "v", [], [0.5], ["m"]
    ).collect()
    assert len(empty) == 1 and empty[0]["m"] is None


def test_exact_group_quantiles_nan_matches_builtin(spark):
    """r07: Spark orders NaN greater than any value and percentile()
    includes it; the bucketed kernel must agree (NaN pins to the top
    range bucket, where the within-bucket sort also puts it last)."""
    import math

    from quackosm_spark.operators.quantiles import exact_group_quantiles

    nan = float("nan")
    rows = (
        [("a", float(i)) for i in range(20)] + [("a", nan), ("a", nan)]
        + [("b", nan)]                      # all-NaN group
        + [("c", 5.0), ("c", nan)]
    )
    df = spark.createDataFrame(rows, "g STRING, v DOUBLE")
    qs = [0.25, 0.5, 0.95, 1.0]
    names = ["a1", "a2", "a3", "a4"]
    ref = {
        r.g: [r[n] for n in names]
        for r in df.groupBy("g")
        .agg(*[F.percentile("v", q).alias(n) for q, n in zip(qs, names)])
        .collect()
    }
    got = {
        r.g: [r[n] for n in names]
        for r in exact_group_quantiles(df, "v", ["g"], qs, names).collect()
    }
    assert set(ref) == set(got)
    for k in ref:
        for a, b in zip(ref[k], got[k]):
            assert (math.isnan(a) and math.isnan(b)) or a == b, (k, a, b)


def test_percent_rank_normalize_exact_and_null_contract(spark):
    """r08: bucketed percent_rank — bit-equal to F.percent_rank on
    non-null data (RANK min-tie semantics, 0.0 for single-row groups);
    NULL values get NULL rank and are EXCLUDED from N (divergence from a
    raw window, by contract); payload passes through."""
    from pyspark.sql import Window

    from quackosm_spark.operators.stats import percent_rank_normalize

    rows = (
        [("a", i, float(v)) for i, v in enumerate([3, 1, 4, 1, 5, 9, 2, 6])]
        + [("b", 100, 7.0)]                      # single-row group -> 0.0
        + [("c", 200, 2.0), ("c", 201, 2.0), ("c", 202, 8.0)]  # heavy ties
    )
    df = spark.createDataFrame(rows, "g STRING, id INT, v DOUBLE")
    got = {
        r.id: r.pct_rank
        for r in percent_rank_normalize(df, "v", ["g"]).collect()
    }
    w = Window.partitionBy("g").orderBy("v")
    ref = {
        r.id: r.pr
        for r in df.withColumn("pr", F.percent_rank().over(w)).collect()
    }
    assert got == ref
    # NULL contract: null values rank NULL, non-null ranks ignore them
    rows2 = [("a", 1, None), ("a", 2, 1.0), ("a", 3, 3.0), ("a", 4, 2.0)]
    df2 = spark.createDataFrame(rows2, "g STRING, id INT, v DOUBLE")
    got2 = {
        r.id: r.pct_rank
        for r in percent_rank_normalize(df2, "v", ["g"]).collect()
    }
    assert got2[1] is None
    assert got2[2] == 0.0 and got2[4] == 0.5 and got2[3] == 1.0
