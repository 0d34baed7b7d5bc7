"""Training-data-pipeline operators: dedup family, similarity search, text
analysis, multimodal plumbing."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from quackosm_spark.operators import dedup as D
from quackosm_spark.operators import multimodal as M
from quackosm_spark.operators import similarity as S
from quackosm_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "en"),
        (2, "the quick brown fox jumps over the lazy dog", "en"),   # exact dup of 1
        (3, "the quick brown fox jumps over a lazy cat", "en"),     # near dup of 1
        (4, "der schnelle braune fuchs springt und der hund ist faul und das ist gut", "de"),
        (5, "completely unrelated text about spark engines", "en"),
        (6, "", "en"),
    ]
    return spark.createDataFrame(rows, "doc_id: long, text: string, lang: string")


@pytest.fixture(scope="module")
def vectors(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.99, 0.1, 0.0]),   # near 0
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.0, 1.0]),
        (4, [-1.0, 0.0, 0.0]),   # opposite of 0
    ]
    return spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")


# ---------------------------------------------------------------- dedup

def test_exact_duplicates(docs):
    groups = D.exact_duplicates(docs).collect()
    assert len(groups) == 1
    assert groups[0]["keep_id"] == 1 and groups[0]["n_docs"] == 2


def test_drop_exact_duplicates(docs):
    kept = D.drop_exact_duplicates(docs)
    assert kept.count() == 5
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 3, 4, 5, 6]


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    assert pairs[(1, 2)] == 1.0          # identical
    assert (1, 3) in pairs               # near-dup above threshold
    assert (1, 5) not in pairs           # unrelated below threshold


def test_ngram_jaccard_max_df_guard_is_invisible(docs, spark):
    """The hot-shingle df cap changes the candidate index only — emitted
    (doc_a, doc_b, jaccard) rows are identical to the unguarded path, even
    with a shingle present in every doc and a dominated doc made entirely
    of hot shingles."""
    base = [r.asDict() for r in docs.collect()]
    # a shingle-sized token shared by EVERY doc (hot: df = all docs), plus
    # one doc consisting of nothing but that token (dominated fallback)
    hot = " zzzzz"
    rows = [(d["doc_id"], d["text"] + hot) for d in base]
    rows.append((97, "zzzzz"))
    rows.append((98, "zzzzz"))
    aug = spark.createDataFrame(rows, "doc_id: long, text: string")
    unguarded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(aug, threshold=0.3).collect()
    }
    guarded = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(aug, threshold=0.3, max_df=3).collect()
    }
    assert guarded == unguarded
    assert (97, 98) in guarded  # dominated docs still pair up


def test_minhash_lsh_candidates(docs):
    cands = {
        (r["doc_a"], r["doc_b"])
        for r in D.minhash_lsh_candidates(docs, num_hashes=8, bands=4).collect()
    }
    assert (1, 2) in cands  # identical docs collide in every band


def test_simhash_identical_docs_equal(docs):
    fp = {r["doc_id"]: r["simhash"] for r in D.simhash(docs, bits=16).collect()}
    assert fp[1] == fp[2]
    assert fp[1] != fp[5]


def test_embedding_near_duplicates(vectors):
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.embedding_near_duplicates(vectors, threshold=0.9).collect()
    }
    assert list(pairs) == [(0, 1)]
    assert pairs[(0, 1)] > 0.99


# ---------------------------------------------------------------- similarity

def test_brute_force_topk_ranking(vectors):
    queries = vectors.where(F.col("vec_id") == 0)
    out = S.brute_force_topk(vectors, queries, k=2).collect()
    ranked = [r["match_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert ranked == [1, 2]  # nearest first; ties broken by id


def test_lsh_bucket_topk_contains_true_neighbor(vectors):
    queries = vectors.where(F.col("vec_id") == 0)
    out = S.lsh_bucket_topk(vectors, queries, k=2, num_planes=2, dim=3).collect()
    assert 1 in {r["match_id"] for r in out}  # identical-direction vec shares bucket


def test_brute_force_topk_vectorized_equals_plain(vectors):
    queries = vectors.where(F.col("vec_id") <= 1)
    plain = S.brute_force_topk(vectors, queries, k=3).collect()
    vect = S.brute_force_topk_vectorized(vectors, queries, k=3).collect()
    key = lambda r: (r["query_id"], r["rank"])
    assert [(r["query_id"], r["rank"], r["match_id"]) for r in sorted(plain, key=key)] == [
        (r["query_id"], r["rank"], r["match_id"]) for r in sorted(vect, key=key)
    ]


def test_lsh_multi_probe_improves_recall(spark):
    """Probing Hamming-1 buckets recalls at least as many true neighbors as
    single-probe (measured 2/15 → 6/15 on the sf0.01 embeddings). Note the
    top-k SETS aren't supersets — better candidates displace weaker ones."""
    emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    queries = emb.where(F.col("vec_id") < 3)
    exact = {(r["query_id"], r["match_id"])
             for r in S.brute_force_topk(emb, queries, k=5).collect()}
    single = {(r["query_id"], r["match_id"])
              for r in S.lsh_bucket_topk(emb, queries, k=5, num_planes=4, dim=64).collect()}
    multi = {(r["query_id"], r["match_id"])
             for r in S.lsh_bucket_topk(
                 emb, queries, k=5, num_planes=4, dim=64, multi_probe=True
             ).collect()}
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) > 0


def test_ivf_topk_smoke(vectors):
    queries = vectors.where(F.col("vec_id") == 0)
    out = S.ivf_topk(vectors, queries, k=1, num_cells=2, nprobe=2).collect()
    assert out and out[0]["match_id"] == 1


# ---------------------------------------------------------------- text

def test_token_count(spark):
    df = spark.createDataFrame(
        [(1, "one two  three"), (2, ""), (3, "   "), (4, "single")],
        "doc_id: long, text: string",
    )
    got = {r["doc_id"]: r["n"] for r in df.select(
        "doc_id", T.token_count("text").alias("n")).collect()}
    assert got == {1: 3, 2: 0, 3: 0, 4: 1}


def test_language_id(docs):
    got = {r["doc_id"]: r["lang"] for r in docs.select(
        "doc_id", T.language_id("text").alias("lang")).collect()}
    assert got[1] == "en"
    assert got[4] == "de"


def test_quality_score_bounds(docs):
    vals = [r["q"] for r in docs.select(T.quality_score("text").alias("q")).collect()]
    assert all(v is not None and 0.0 <= v <= 1.0 for v in vals)


def test_word_ngrams_and_boilerplate(spark):
    df = spark.createDataFrame(
        [
            (1, "the quick brown fox"),
            (2, "the quick brown dog"),
            (3, "the quick brown cat"),
            (4, "completely different words here"),
            (5, ""),
        ],
        "doc_id: long, text: string",
    )
    grams = {r["ngram"] for r in df.select(
        F.explode(T.word_ngrams("text", n=3)).alias("ngram")
    ).collect()}
    assert "the quick brown" in grams and "quick brown fox" in grams
    freq = {r["ngram"]: r["n_docs"]
            for r in T.frequent_ngrams(df, n=3, min_docs=3).collect()}
    assert freq == {"the quick brown": 3}


def test_analyze_documents_composite(docs):
    out = T.analyze_documents(docs)
    assert {"n_tokens", "n_bpe_tokens", "quality", "lang_pred", "fingerprint"} <= set(
        out.columns
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    assert rows[1]["n_tokens"] == 9
    assert rows[1]["fingerprint"] == rows[2]["fingerprint"]  # identical text
    assert rows[6]["n_tokens"] == 0  # empty doc


def test_fingerprint_matches_python(spark):
    text = "hello"
    df = spark.createDataFrame([(1, text)], "doc_id: long, text: string")
    got = df.select(T.fingerprint("text").alias("fp")).collect()[0]["fp"]
    expect = 0
    for ch in text:
        expect = (expect * 31 + ord(ch)) % T.FINGERPRINT_MOD
    assert got == expect


# ---------------------------------------------------------------- multimodal

def test_media_stats(spark):
    media = M.synthesize_media(spark, n=30)
    stats = {r["kind"]: r for r in M.media_stats(media).collect()}
    assert set(stats) == {"image", "audio", "video"}
    assert stats["video"]["max_duration_ms"] is not None


def test_extract_image_features_plumbing(spark):
    media = M.synthesize_media(spark, n=12)
    images = media.where(F.col("kind") == "image")
    feats = M.extract_image_features(images)
    rows = feats.collect()
    assert len(rows) == images.count()
    dims = {len(r["features"]) for r in rows}
    assert len(dims) == 1  # fixed-width feature vector


def test_resize_images_plumbing(spark):
    media = M.synthesize_media(spark, n=12)
    resized = M.resize_images(media, target_width=4, target_height=4)
    rows = resized.collect()
    assert len(rows) == media.where(F.col("kind") == "image").count()
    assert all(len(r["payload"]) == 16 for r in rows)
    assert all(r["width"] == 4 and r["height"] == 4 for r in rows)
    # deterministic: same input → same resized payload
    again = {r["media_id"]: r["payload"] for r in M.resize_images(
        media, target_width=4, target_height=4).collect()}
    assert all(again[r["media_id"]] == r["payload"] for r in rows)


def test_strict_mode_raises(spark):
    import pytest as _pytest

    media = M.synthesize_media(spark, n=3)
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with _pytest.raises((PythonException, Py4JJavaError)):
        M.extract_image_features(
            media.where(F.col("kind") == "image"), strict=True
        ).collect()


def _tiny_png() -> bytes:
    """Hand-assembled 2×2 RGB PNG (stdlib zlib only — no codec needed to
    BUILD the fixture, PIL is needed to DECODE it)."""
    import struct
    import zlib

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)  # 2x2, 8-bit RGB
    # two scanlines, filter byte 0 + 2 RGB pixels each
    raw = (
        b"\x00" + bytes([255, 0, 0, 0, 255, 0])
        + b"\x00" + bytes([0, 0, 255, 255, 255, 255])
    )
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_strict_decode_with_pil(spark):
    """Real decode path: runs when PIL is importable, cleanly skips here
    (the container has no pillow — the import IS the gate)."""
    pil = pytest.importorskip("PIL.Image")
    del pil
    from quackosm_spark.operators.multimodal import _decode_stub

    pixels = _decode_stub(_tiny_png(), strict=True)
    assert pixels.shape == (2 * 2 * 3,)
    assert pixels[0] == 255.0 and pixels[1] == 0.0  # red top-left


def test_sample_frames_plumbing(spark):
    media = M.synthesize_media(spark, n=12)
    videos = media.where(F.col("kind") == "video")
    frames = M.sample_frames(videos, every_ms=250)
    assert frames.count() >= videos.count()  # ≥1 frame per video


# ------------------------------------------------- clustering / mix / pii

def test_neardup_clusters_transitive(spark):
    # a~b, b~c chain plus a separate d~e component: clusters must close
    # transitively, canonical label = min id in component
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_a: long, doc_b: long"
    )
    got = {
        (r.doc_id, r.cluster_id)
        for r in D.neardup_clusters(pairs).collect()
    }
    assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}


def test_repetition_ratio(spark):
    rows = [
        (1, "a b c a b c a b c"),       # trigrams: 7 total, 3 distinct
        (2, "one two three four five"), # all distinct -> 0.0
        (3, ""),                        # no trigrams -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: r.ratio
        for r in df.select(
            "doc_id", T.repetition_ratio("text", n=3).alias("ratio")
        ).collect()
    }
    assert got[1] == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert got[2] == 0.0
    assert got[3] == 0.0


def test_pii_counts_and_redaction(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user@example.com or b@x.org, call +12345678, ip 10.0.0.1"),
         (2, "nothing sensitive here")],
        "doc_id: long, text: string",
    )
    out = df.select("doc_id", *T.pii_counts("text"),
                    T.redact_pii("text").alias("red")).collect()
    by_id = {r.doc_id: r for r in out}
    assert (by_id[1].n_email, by_id[1].n_phone, by_id[1].n_ipv4) == (2, 1, 1)
    assert (by_id[2].n_email, by_id[2].n_phone, by_id[2].n_ipv4) == (0, 0, 0)
    assert "example.com" not in by_id[1].red and "10.0.0.1" not in by_id[1].red
    assert by_id[1].red.count("[PII]") == 4
    assert by_id[2].red == "nothing sensitive here"


def test_pack_sequences_bins(spark):
    from quackosm_spark.operators import mix as X

    # one stream (num_streams=1), capacity 5 tokens; docs of 3/3/3 tokens:
    # exclusive cumsums 0,3,6 -> bins 0,0,1
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "d e f"), (2, "g h i")], "doc_id: long, text: string"
    )
    got = {
        r.doc_id: (r.stream, r.bin_id, r.n_tokens)
        for r in X.pack_sequences(df, capacity=5, num_streams=1).collect()
    }
    assert got == {0: (0, 0, 3), 1: (0, 0, 3), 2: (0, 1, 3)}


def test_deterministic_sample_reproducible(spark):
    from quackosm_spark.operators import mix as X

    df = spark.createDataFrame(
        [(i, "t", "en" if i % 2 == 0 else "de") for i in range(200)],
        "doc_id: long, text: string, lang: string",
    )
    kept1 = sorted(r.doc_id for r in X.deterministic_sample(
        df, rates={"en": 0.5}, default_rate=0.0).collect())
    kept2 = sorted(r.doc_id for r in X.deterministic_sample(
        df, rates={"en": 0.5}, default_rate=0.0).collect())
    assert kept1 == kept2                      # same docs every run
    assert all(i % 2 == 0 for i in kept1)      # default rate 0 drops 'de'
    assert 20 < len(kept1) < 80                # ~50% of the 100 'en' docs
    # rate 1.0 keeps every row of the stratum
    all_en = X.deterministic_sample(df, rates={"en": 1.0}, default_rate=1.0)
    assert all_en.count() == 200


def test_budget_sample_caps_group_tokens(spark):
    from quackosm_spark.operators import mix as X

    # 10 docs of 4 tokens each in one source: a 12-token budget keeps docs
    # until the running total crosses it — exactly 3 docs (0,4,8 < 12).
    df = spark.createDataFrame(
        [(i, "a b c d", "s") for i in range(10)],
        "doc_id: long, text: string, source: string",
    )
    out = X.budget_sample(df, budgets={"s": 12}).collect()
    assert len(out) == 3
    assert all(r.cum_before < 12 and r.n_tokens == 4 for r in out)
    # deterministic: same docs on a rerun
    again = X.budget_sample(df, budgets={"s": 12}).collect()
    assert sorted(r.doc_id for r in out) == sorted(r.doc_id for r in again)
    # unknown source falls back to default_budget (0 → nothing kept)
    other = df.withColumn("source", F.lit("unknown"))
    assert X.budget_sample(other, budgets={"s": 12}).count() == 0
    # num_streams=2 splits the budget: each stream keeps < 6 tokens before
    kept2 = X.budget_sample(df, budgets={"s": 12}, num_streams=2).collect()
    assert all(r.cum_before < 6 for r in kept2)


def test_neardup_clusters_long_chain(spark):
    """A 200-node path graph (worst case for plain propagation): pointer
    jumping must close it in O(log n) rounds, all labeled 0."""
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(200)], "doc_a: long, doc_b: long"
    )
    out = D.neardup_clusters(pairs)
    assert out.count() == 201
    assert out.where(F.col("cluster_id") != 0).count() == 0


def test_contamination_matches(spark):
    bench = spark.createDataFrame(
        [(100, "the capital of france is paris indeed")],
        "doc_id: long, text: string",
    )
    train = spark.createDataFrame(
        [(1, "we know the capital of france is paris obviously"),  # contaminated
         (2, "completely clean document about spark engines here"),
         (3, "the capital of france"),                              # < 5 words shared run? 4-word gram only
         ],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.n_shared for r in D.contamination_matches(
        train, bench, n=5, min_shared=1).collect()}
    # doc 1 shares 5-grams "the capital of france is" and "capital of france is paris"
    assert got.get(1) == 2
    assert 2 not in got
    assert 3 not in got  # only 4 words -> no 5-gram
    # the plan broadcasts the benchmark side
    plan = D.contamination_matches(train, bench)._jdf.queryExecution().executedPlan().toString()
    assert "Broadcast" in plan


def test_filter_quality_composition(docs):
    # the low-quality empty doc (id 6) is always dropped; a strict token
    # floor keeps only the longer docs; language restriction composes
    kept = T.filter_quality(docs, min_quality=0.0, max_repetition=1.0, min_tokens=1)
    ids = {r.doc_id for r in kept.select("doc_id").collect()}
    assert 6 not in ids and 1 in ids
    en_only = T.filter_quality(
        docs, min_quality=0.0, max_repetition=1.0, min_tokens=1, langs=["en"]
    )
    assert {r.doc_id for r in en_only.select("doc_id").collect()} <= ids - {4}
    # composite report carries the new signals
    rep = T.analyze_documents(docs)
    assert {"rep_ratio", "n_email", "n_phone", "n_ipv4"} <= set(rep.columns)


def test_unigram_logprob_ranks_outliers_low(spark):
    # "zzz qqq" tokens are rare (1 occurrence each); "common" words repeat
    rows = [(i, "common words common words") for i in range(1, 6)]
    rows.append((6, "zzzz qqqq"))
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r.avg_logprob for r in T.unigram_logprob(df).collect()}
    assert got[6] < got[1]           # rare-token doc scores lower
    assert len(got) == 6
    import math
    # doc1: P(common)=P(words)=10/22 -> avg ln = ln(10/22)
    assert got[1] == pytest.approx(round(math.log(10 / 22), 4), abs=1e-9)


def test_chunk_documents_covers_every_char_with_overlap(spark):
    df = spark.createDataFrame(
        [(1, "abcdefghij"), (2, ""), (3, "xy")], "doc_id: long, text: string"
    )
    rows = (
        T.chunk_documents(df, size=4, stride=3)
        .orderBy("doc_id", "chunk_idx")
        .collect()
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 2 not in by_doc  # empty doc -> no chunks
    assert [r.chunk_text for r in by_doc[1]] == ["abcd", "defg", "ghij", "j"]
    assert [r.chunk_text for r in by_doc[3]] == ["xy"]
    # every chunk i starts at i*stride and overlaps its successor by 1 char
    for r in by_doc[1]:
        assert r.chunk_text == "abcdefghij"[r.chunk_idx * 3 : r.chunk_idx * 3 + 4]
        assert r.chunk_len == len(r.chunk_text)


def test_weighted_sample_favors_heavy_weights_and_is_deterministic(spark):
    from quackosm_spark.operators.mix import weighted_sample

    # ids 0-49 weight 1000, ids 50-99 weight 1 -> top-10 should be all heavy
    rows = [(i, 1000.0 if i < 50 else 1.0) for i in range(100)]
    rows.append((100, 0.0))  # non-positive weight: excluded outright
    df = spark.createDataFrame(rows, "doc_id: long, w: double")
    picked = {r.doc_id for r in weighted_sample(df, k=10, weight_col="w").collect()}
    assert len(picked) == 10 and all(i < 50 for i in picked)
    # pure function of the data: identical under a different partitioning
    again = {
        r.doc_id
        for r in weighted_sample(df.repartition(13), k=10, weight_col="w").collect()
    }
    assert again == picked


def test_countmin_never_undercounts_and_merges(spark):
    from quackosm_spark.operators.stats import (
        countmin_estimate,
        countmin_sketch,
        merge_countmin,
    )

    # skewed stream: token i appears i*10 times, i in 1..8
    rows = [(f"tok{i}",) for i in range(1, 9) for _ in range(i * 10)]
    df = spark.createDataFrame(rows, "item: string")
    sk = countmin_sketch(df, width=64, depth=4)
    truth = {f"tok{i}": i * 10 for i in range(1, 9)}
    qdf = spark.createDataFrame([(t,) for t in truth] + [("absent",)], "item: string")
    est = {r.item: r.est_count for r in countmin_estimate(sk, qdf, width=64, depth=4).collect()}
    n = sum(truth.values())
    for t, c in truth.items():
        assert est[t] >= c                      # CMS never undercounts
        assert est[t] <= c + (2.7 * n / 64) + 1  # e*N/width overcount bound
    assert est["absent"] <= 2.7 * n / 64 + 1
    # merging the sketch with itself doubles every estimate exactly
    merged = merge_countmin(sk, sk)
    est2 = {r.item: r.est_count for r in countmin_estimate(merged, qdf, width=64, depth=4).collect()}
    assert all(est2[t] == 2 * est[t] for t in truth)


def test_pq_adc_exact_when_codebook_is_lossless(spark):
    """With every distinct subvector its own centroid, PQ encoding is
    lossless and ADC distance equals exact L2 -> identical top-k."""
    import numpy as np
    from quackosm_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    rng = np.random.RandomState(7)
    base = rng.rand(8, 8)  # 8 distinct subvector patterns of dim 8
    vecs = []
    for i in range(30):
        # each vector = concat of 2 patterns -> <=8 distinct per subspace
        vecs.append((i, np.concatenate([base[i % 8], base[(i * 3) % 8]]).tolist()))
    df = spark.createDataFrame(vecs, "vec_id: long, embedding: array<double>")
    books = train_pq_codebooks(df, m=2, k=8, sample_size=30)
    codes = pq_encode(df, books)
    got = pq_adc_topk(codes, df.where("vec_id < 5"), books, k=3).collect()

    mat = {i: np.array(v) for i, v in vecs}
    for r in got:
        exact = sorted(
            ((np.linalg.norm(mat[r.query_id] - mat[m]), m) for m in mat if m != r.query_id),
        )
        d, m_id = exact[r.rank - 1]
        assert r.approx_l2 == pytest.approx(round(d, 6), abs=2e-6)


def test_pq_adc_recall_on_synthetic_embeddings(spark):
    import numpy as np
    from quackosm_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )

    from quackosm_spark.operators.similarity import pq_topk_reranked

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    books = train_pq_codebooks(emb, m=8, k=16, sample_size=512)
    queries = emb.where("vec_id < 5")
    got = pq_topk_reranked(emb, queries, books, k=10, shortlist=50).collect()
    rows = emb.select("vec_id", "embedding").collect()
    mat = {r.vec_id: np.array(r.embedding, dtype=float) for r in rows}
    hits = total = 0
    for qid in range(5):
        exact_top = sorted(
            ((np.linalg.norm(mat[qid] - mat[m]), m) for m in mat if m != qid)
        )[:10]
        approx = {r.match_id: r.l2 for r in got if r.query_id == qid}
        hits += len({m for _, m in exact_top} & set(approx))
        total += 10
        # reranked distances are EXACT for every true hit
        for d, m in exact_top:
            if m in approx:
                assert approx[m] == pytest.approx(round(d, 6), abs=2e-6)
    assert hits / total >= 0.7  # measured 0.80 at shortlist=50 (0.22 raw ADC)


def test_interleave_sources_round_robin_with_uneven_sizes(spark):
    from quackosm_spark.operators.mix import interleave_sources

    # a:4 docs, b:2, c:1 -> rounds: (a,b,c),(a,b),(a),(a)
    rows = [(i, "a") for i in range(4)] + [(10 + i, "b") for i in range(2)] + [(20, "c")]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    got = sorted(
        (r.global_pos, r.source, r.rn)
        for r in interleave_sources(df).collect()
    )
    # positions are a permutation of 0..6
    assert [p for p, _, _ in got] == list(range(7))
    # round 1 = one doc from each source in source order; then b,c drop out
    assert [s for _, s, _ in got] == ["a", "b", "c", "a", "b", "a", "a"]
    assert [rn for _, _, rn in got] == [1, 1, 1, 2, 2, 3, 4]


def test_interleave_sources_skewed_matches_serial_window(spark):
    """r06 bucketed two-pass rn: a heavily skewed source mix (one source
    50x the others) must still reproduce the serial per-source
    (md5, id)-ordered numbering and a 0..N-1 global position."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from quackosm_spark.operators.mix import interleave_sources

    rows = (
        [(i, "big") for i in range(500)]
        + [(1000 + i, "s1") for i in range(10)]
        + [(2000 + i, "s2") for i in range(7)]
    )
    df = spark.createDataFrame(rows, "doc_id: long, source: string")
    got = {(r.doc_id): (r.rn, r.global_pos) for r in interleave_sources(df).collect()}

    ok = F.md5(F.col("doc_id").cast("string"))
    w = Window.partitionBy("source").orderBy(ok, F.col("doc_id"))
    serial = {
        r.doc_id: r.rn
        for r in df.withColumn("rn", F.row_number().over(w)).collect()
    }
    assert {d: rn for d, (rn, _) in got.items()} == serial
    assert sorted(gp for _, gp in got.values()) == list(range(517))


def test_profile_table_counts(spark):
    from quackosm_spark.operators.stats import profile_table

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (2, "y")], "a: long, b: string"
    )
    got = {r.column_name: r for r in profile_table(df).collect()}
    assert (got["a"].n_nonnull, got["a"].n_distinct) == (3, 2)
    assert (got["a"].min_value, got["a"].max_value) == ("1", "2")
    assert (got["b"].n_nonnull, got["b"].n_distinct) == (2, 2)


def test_bloom_filter_no_false_negatives_and_merge(spark):
    from quackosm_spark.operators.bloom import bloom_build, bloom_might_contain

    members = [(f"key-{i}",) for i in range(300)]
    bloom = bloom_build(
        spark.createDataFrame(members, "item: string"), m_bits=1 << 14, k=4
    )
    probes = spark.createDataFrame(
        [(f"key-{i}",) for i in range(600)], "item: string"
    )
    got = {r.item for r in bloom_might_contain(bloom, probes, m_bits=1 << 14, k=4).collect()}
    truth = {m for (m,) in members}
    assert truth <= got                    # bloom NEVER drops a member
    fp = len(got - truth)
    assert fp <= 30                        # (1-e^(-kn/m))^k ~ 0.2% of 300, generous cap


def test_bloom_decontamination_equals_exact(spark, docs):
    from quackosm_spark.operators.bloom import contamination_matches_bloom

    bench = docs.where(F.col("doc_id") == 1)
    train = docs.where(F.col("doc_id") != 1)
    exact = {(r.doc_id, r.n_shared)
             for r in D.contamination_matches(train, bench, n=3).collect()}
    via_bloom = {(r.doc_id, r.n_shared)
                 for r in contamination_matches_bloom(train, bench, n=3, m_bits=1 << 12).collect()}
    assert via_bloom == exact and exact    # identical result, non-empty


def test_dedup_against_corpus_drops_history_and_self_dups(spark):
    existing = spark.createDataFrame(
        [(1, "seen before"), (2, "old news")], "doc_id: long, text: string"
    )
    new = spark.createDataFrame(
        [
            (10, "seen before"),   # duplicate of history -> dropped
            (11, "fresh take"),    # genuinely new -> kept
            (12, "fresh take"),    # intra-batch dup -> only 11 survives
            (13, "another one"),
        ],
        "doc_id: long, text: string",
    )
    kept = sorted(
        r.doc_id for r in D.dedup_against_corpus(new, existing).collect()
    )
    assert kept == [11, 13]


def test_novelty_score_boilerplate_vs_unique(spark):
    rows = [
        (1, "a b c d e"),           # shares all grams with doc 2
        (2, "a b c d e"),
        (3, "totally unique words right here"),
        (4, "xx"),                  # <3 words -> no row
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: (r.n_grams, r.novelty) for r in T.novelty_score(df, n=3).collect()}
    assert set(got) == {1, 2, 3}
    assert got[1] == (3, 0.0) and got[2] == (3, 0.0)   # pure boilerplate
    assert got[3] == (3, 1.0)                           # fully novel


def test_winsorize_clips_to_group_quantiles(spark):
    from quackosm_spark.operators.stats import winsorize

    rows = [(i, "g", float(i)) for i in range(1, 11)]  # 1..10
    rows += [(100, "h", 1000.0), (101, "h", -5.0), (102, "h", 2.0)]
    df = spark.createDataFrame(rows, "event_id: long, event_type: string, value: double")
    got = {r.event_id: r.value_w for r in winsorize(df, "value", "event_type", 0.1, 0.9).collect()}
    # group g: p10 = 1.9, p90 = 9.1 (linear interpolation over 1..10)
    assert got[1] == pytest.approx(1.9)
    assert got[10] == pytest.approx(9.1)
    assert got[5] == 5.0                     # interior untouched
    # group h clips independently of g
    assert got[100] < 1000.0 and got[101] > -5.0


# ------------------------------------------------------- repeated spans

def test_repeated_spans_detects_cross_doc_substring(spark):
    """A 5-token substring shared by two docs marks exactly the positions
    where it starts in each; unique text marks nothing."""
    rows = [
        (1, "alpha beta gamma delta epsilon zeta unique one two three"),
        (2, "prefix words here alpha beta gamma delta epsilon tail"),
        (3, "completely different content with no overlap at all ok"),
    ]
    docs = spark.createDataFrame(rows, "doc_id: long, text: string")
    spans = {
        (r["doc_id"], r["pos"])
        for r in T.repeated_spans(docs, n=5).collect()
    }
    # doc1: "alpha beta gamma delta epsilon" starts at pos 0
    # doc2: same gram starts at pos 3
    assert (1, 0) in spans and (2, 3) in spans
    assert all(d != 3 for d, _ in spans)

    frac = {r["doc_id"]: r for r in
            T.duplicated_token_fraction(docs, n=5).collect()}
    assert frac[1]["n_dup_positions"] == 1 and frac[1]["n_positions"] == 6
    assert frac[1]["dup_fraction"] == pytest.approx(round(1 / 6, 6))
    assert frac[3]["dup_fraction"] == 0.0


def test_repeated_spans_intra_document(spark):
    """A phrase repeated INSIDE one document also counts (the Lee et al.
    method dedups self-repeats too)."""
    docs = spark.createDataFrame(
        [(7, "one two three four five filler one two three four five")],
        "doc_id: long, text: string",
    )
    spans = sorted(
        r["pos"] for r in T.repeated_spans(docs, n=5).collect()
    )
    assert spans == [0, 6]


def test_duplicated_fraction_short_doc_zero(spark):
    docs = spark.createDataFrame(
        [(1, "too short"), (2, "")], "doc_id: long, text: string"
    )
    rows = {r["doc_id"]: r for r in
            T.duplicated_token_fraction(docs, n=5).collect()}
    assert rows[1]["n_positions"] == 0 and rows[1]["dup_fraction"] == 0.0
    assert rows[2]["n_positions"] == 0


# --------------------------------------------------------------------------
# r03: real BPE tokenization (train on sample, broadcast merges, apply as
# Column replace chain) + token-budget shard assignment
# --------------------------------------------------------------------------

def _py_bpe_apply(text, merges):
    """Independent python reference of the documented apply contract."""
    import re

    from quackosm_spark.operators.text import _BPE_NORMALIZE_RE

    norm = re.sub(_BPE_NORMALIZE_RE, " ", (text or "").lower())
    out_words = []
    for w in norm.split():
        toks = list(w)
        for a, b in merges:
            merged, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    merged.append(a + b)
                    i += 2
                else:
                    merged.append(toks[i])
                    i += 1
            toks = merged
        out_words.append(toks)
    return out_words


def test_bpe_train_learns_frequent_pairs(spark):
    from quackosm_spark.operators.text import train_bpe_merges

    docs = spark.createDataFrame(
        [(i, "the theme thesis then the") for i in range(20)],
        "doc_id long, text string",
    )
    merges = train_bpe_merges(docs, n_merges=4, order_col="doc_id")
    # 'th'/'he' tie at the top (lexicographic tie-break picks 'h e'
    # first); within two merges the dominant word 'the' must be a single
    # token
    from quackosm_spark.operators.text import bpe_tokens

    toks = (
        spark.createDataFrame([(0, "the")], "doc_id long, text string")
        .select(bpe_tokens(F.col("text"), merges).alias("t"))
        .collect()[0]["t"]
    )
    assert toks == ["the"]


def test_bpe_apply_matches_python_reference(spark):
    from quackosm_spark.operators.text import bpe_token_count, bpe_tokens

    merges = [("t", "h"), ("th", "e"), ("l", "l"), ("a", "n"), ("an", "d")]
    texts = [
        "TheThistle and hello llama llll",
        "AND THE the then",
        "",
        "a",
        "x!y?z  mixed-CASE punctuation,,,",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = {
        r["doc_id"]: r
        for r in docs.select(
            "doc_id",
            bpe_token_count(F.col("text"), merges).alias("n"),
            bpe_tokens(F.col("text"), merges).alias("toks"),
        ).collect()
    }
    for i, t in enumerate(texts):
        expected_words = _py_bpe_apply(t, merges)
        expected_toks = [tok for w in expected_words for tok in w]
        assert rows[i]["n"] == len(expected_toks), t
        assert rows[i]["toks"] == expected_toks, t


def test_bpe_consecutive_repeats_merge_left_to_right(spark):
    from quackosm_spark.operators.text import bpe_tokens

    docs = spark.createDataFrame([(0, "aaaa aaa")], "doc_id long, text string")
    toks = docs.select(
        bpe_tokens(F.col("text"), [("a", "a")]).alias("t")
    ).collect()[0]["t"]
    assert toks == ["aa", "aa", "aa", "a"]


def test_assign_token_shards_matches_global_window(spark):
    from quackosm_spark.operators.mix import assign_token_shards

    rng_texts = [
        (i, "tok " * ((i * 37) % 90 + 1)) for i in range(0, 400, 3)
    ]
    docs = spark.createDataFrame(rng_texts, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["shard_id"])
        for r in assign_token_shards(
            docs, target_tokens=500, num_buckets=7
        ).collect()
    }
    # independent oracle: the single global window
    w = (
        Window.orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    from quackosm_spark.operators.text import token_count

    expect = {
        r["doc_id"]: (r["n"], r["shard"])
        for r in docs.withColumn("n", token_count("text").cast("bigint"))
        .withColumn(
            "shard",
            F.floor((F.sum("n").over(w) - F.col("n")) / F.lit(500)).cast(
                "bigint"
            ),
        )
        .collect()
    }
    assert got == expect
    # shards are contiguous in id order and sized ~target
    shards = sorted({v[1] for v in got.values()})
    assert shards == list(range(len(shards)))


def test_assign_token_shards_empty_input(spark):
    from quackosm_spark.operators.mix import assign_token_shards

    docs = spark.createDataFrame([], "doc_id long, text string")
    assert assign_token_shards(docs, target_tokens=100).count() == 0


# --------------------------------------------------------------------------
# r03: corpus-audit operators — source overlap, OOV rate, bigram LM
# --------------------------------------------------------------------------

def test_source_overlap_matrix_counts_and_jaccard(spark):
    from quackosm_spark.operators.text import source_overlap_matrix

    rows = [
        (0, "shared one", "A"), (1, "shared two", "A"), (2, "only a", "A"),
        (3, "shared one", "B"), (4, "shared two", "B"), (5, "only b", "B"),
        (6, "shared one", "C"),
        # duplicate within a source must not inflate the distinct count
        (7, "shared one", "A"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        (r["source_a"], r["source_b"]): r
        for r in source_overlap_matrix(docs).collect()
    }
    assert got[("A", "B")]["n_shared"] == 2
    assert got[("A", "B")]["n_a"] == 3 and got[("A", "B")]["n_b"] == 3
    assert got[("A", "B")]["jaccard"] == pytest.approx(2 / 4)
    assert got[("A", "C")]["n_shared"] == 1
    assert got[("B", "C")]["n_shared"] == 1
    assert len(got) == 3


def test_oov_rate_against_topk_vocab(spark):
    from quackosm_spark.operators.text import oov_rate

    # corpus: 'hot' appears 5x, 'warm' 3x, everything else once
    rows = [
        (0, "hot hot warm rare1"),
        (1, "hot warm rare2 rare3"),
        (2, "hot hot warm"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: r for r in oov_rate(docs, vocab_size=2).collect()
    }
    # vocab = {hot, warm}; doc 0: 4 tokens 1 oov; doc 1: 4 tokens 2 oov
    assert (got[0]["n_tokens"], got[0]["n_oov"]) == (4, 1)
    assert (got[1]["n_tokens"], got[1]["n_oov"]) == (4, 2)
    assert (got[2]["n_tokens"], got[2]["n_oov"]) == (3, 0)
    assert got[1]["oov_frac"] == pytest.approx(0.5)


def test_oov_rate_tie_break_deterministic(spark):
    from quackosm_spark.operators.text import oov_rate

    # all tokens tie at count 1 → vocab = lexicographically first K
    docs = spark.createDataFrame(
        [(0, "delta alpha charlie bravo")], "doc_id long, text string"
    )
    r = oov_rate(docs, vocab_size=2).collect()[0]
    # vocab = {alpha, bravo}; charlie/delta are OOV
    assert (r["n_tokens"], r["n_oov"]) == (4, 2)


def test_bigram_logprob_hand_computed(spark):
    import math

    from quackosm_spark.operators.text import bigram_logprob

    # corpus: "a b a b" and "a b"; vocab V = 2
    # bigrams: (a,b)x3, (b,a)x1 ; C(a.)=3, C(b.)=1
    docs = spark.createDataFrame(
        [(0, "a b a b"), (1, "a b"), (2, "solo")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in bigram_logprob(docs, k=1.0).collect()}
    # V counts ALL tokens incl. the short doc's: {a, b, solo} → 3
    v = 3.0
    p_ab = (3 + 1) / (3 + v)
    p_ba = (1 + 1) / (1 + v)
    exp0 = round((2 * math.log(p_ab) + math.log(p_ba)) / 3, 4)
    exp1 = round(math.log(p_ab), 4)
    assert got[0]["n_bigrams"] == 3
    assert got[0]["avg_logprob"] == pytest.approx(exp0)
    assert got[1]["avg_logprob"] == pytest.approx(exp1)
    assert 2 not in got  # <2 tokens emits no row


def test_embedding_neardup_blocked_bit_matches_baseline(spark):
    """r03: the block-pair GEMM exact route must emit EXACTLY the
    baseline theta-join's pairs and 6-decimal cosines, at any block
    count (incl. B=1 single task and B > n degenerate blocks)."""
    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).where("vec_id < 120")
    base = sorted(
        (r["id_a"], r["id_b"], r["cosine"])
        for r in D.embedding_near_duplicates(emb, threshold=0.3).collect()
    )
    assert base
    for b in (1, 7, 200):
        blk = sorted(
            (r["id_a"], r["id_b"], r["cosine"])
            for r in D.embedding_near_duplicates_blocked(
                emb, threshold=0.3, num_blocks=b
            ).collect()
        )
        assert blk == base, f"num_blocks={b}"


def test_curriculum_order_bands_and_determinism(spark):
    from quackosm_spark.operators.mix import curriculum_order

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = curriculum_order(docs, stages=4).collect()
    by_stage: dict = {}
    for r in out:
        by_stage.setdefault(r.stage, []).append(r.quality)
    assert set(by_stage) <= {0, 1, 2, 3}
    # stage 0 holds the HIGHEST-quality band; bands are quality-ordered
    mins = {s: min(v) for s, v in by_stage.items()}
    maxs = {s: max(v) for s, v in by_stage.items()}
    for s in sorted(by_stage)[:-1]:
        assert mins[s] >= maxs[s + 1] - 1e-9
    # order_key deterministic across runs
    again = {r.doc_id: r.order_key
             for r in curriculum_order(docs, stages=4).collect()}
    assert all(again[r.doc_id] == r.order_key for r in out)
    import pytest as _pytest
    with _pytest.raises(ValueError):
        curriculum_order(docs, stages=1)


def _tiny_ppm() -> bytes:
    """2x2 P6 with a comment line: RGBW, top-down interleaved RGB."""
    pix = bytes([255, 0, 0,  0, 255, 0,
                 0, 0, 255,  255, 255, 255])
    return b"P6\n# test comment\n2 2\n255\n" + pix


def _tiny_bmp() -> bytes:
    """2x2 uncompressed 24-bit BMP (bottom-up rows, BGR, 4-byte padded)
    encoding the SAME image as _tiny_ppm()."""
    # top row: red, green | bottom row: blue, white
    bottom = bytes([255, 0, 0,  255, 255, 255]) + b"\x00\x00"  # BGR blue, white
    top = bytes([0, 0, 255,  0, 255, 0]) + b"\x00\x00"         # BGR red, green
    pixel_data = bottom + top  # bottom-up storage
    info = (
        (40).to_bytes(4, "little") + (2).to_bytes(4, "little", signed=True)
        + (2).to_bytes(4, "little", signed=True) + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little") + (0).to_bytes(4, "little")
        + len(pixel_data).to_bytes(4, "little") + b"\x00" * 16
    )
    off = 14 + len(info)
    hdr = b"BM" + (off + len(pixel_data)).to_bytes(4, "little") + b"\x00" * 4 + off.to_bytes(4, "little")
    return hdr + info + pixel_data


def test_strict_decode_ppm_bmp_pure_numpy(spark):
    """r07: the strict decode path is REAL with no codec library at all
    for uncompressed formats — P6 PPM and 24-bit BMP parse in pure numpy
    and must yield identical interleaved-RGB pixels."""
    import numpy as np

    from quackosm_spark.operators.multimodal import _decode_stub

    expected = np.array(
        [255, 0, 0,  0, 255, 0,  0, 0, 255,  255, 255, 255], dtype=np.float32
    )
    assert np.array_equal(_decode_stub(_tiny_ppm(), strict=True), expected)
    assert np.array_equal(_decode_stub(_tiny_bmp(), strict=True), expected)


def test_extract_image_features_strict_real_decode(spark):
    """End-to-end strict=True through mapInPandas with PPM payloads — the
    histogram features come from REAL pixel values, no PIL needed."""
    rows = [(1, "image", _tiny_ppm(), "image/x-portable-pixmap", 2, 2, None),
            (2, "image", _tiny_bmp(), "image/bmp", 2, 2, None)]
    media = spark.createDataFrame(rows, M.MEDIA_SCHEMA)
    out = {r.media_id: r for r in
           M.extract_image_features(media, feature_dim=4, strict=True).collect()}
    assert set(out) == {1, 2}
    for r in out.values():
        assert r.width == 12  # 2x2x3 interleaved samples
        # pixels: six 0s (bin 0), six 255s (top bin) of 12 samples
        assert abs(r.features[0] - 6 / 12) < 1e-6
        assert abs(r.features[3] - 6 / 12) < 1e-6
    assert out[1].features == out[2].features  # same image, two containers


def test_strict_decode_malformed_uncompressed_falls_through(spark):
    """Truncated PPM/BMP payloads must not leak numpy parse errors — they
    fall through the decoder chain to the explicit NotImplementedError."""
    import pytest as _pytest

    from quackosm_spark.operators.multimodal import _decode_stub

    for bad in (b"P6\n2 2\n255\n\x00\x01",      # truncated pixel data
                b"P6\n2 2",                      # truncated header
                _tiny_bmp()[:30]):               # truncated BMP header
        with _pytest.raises(NotImplementedError):
            _decode_stub(bad, strict=True)


def test_split_assign_exhaustive_stable_and_salted(spark):
    """r07: every row gets exactly one split; default weights are exactly
    exhaustive (remainder→last); assignment is a pure function of
    (id, salt) — identical across re-runs, different under a new salt;
    proportions land near the weights."""
    from quackosm_spark.operators.mix import split_assign

    docs = spark.range(20000).select(F.col("id").alias("doc_id"))
    out = split_assign(docs)
    got = {r.doc_id: r.split for r in out.collect()}
    assert len(got) == 20000
    from collections import Counter

    c = Counter(got.values())
    assert set(c) <= {"train", "val", "test"}
    assert abs(c["train"] / 20000 - 0.98) < 0.01
    assert c["val"] > 0 and c["test"] > 0
    # stability: a second run assigns identically
    again = {r.doc_id: r.split for r in split_assign(docs).collect()}
    assert again == got
    # an independent salt produces a different (but valid) assignment
    salted = {r.doc_id: r.split for r in split_assign(docs, salt="v2").collect()}
    assert salted != got
    # validation
    import pytest as _pytest

    with _pytest.raises(ValueError):
        split_assign(docs, weights={})
    with _pytest.raises(ValueError):
        split_assign(docs, weights={"a": 0.9, "b": 0.2})


def test_token_budget_filter_greedy_prefix_semantics(spark):
    """r08: keep docs in (quality DESC, id ASC) order while the cumulative
    token count FITS the budget; the crossing doc and everything after it
    are dropped; the verdict matches a serial reference computed on the
    driver. Also: budget_tokens absolute mode, never-kept NULL/empty docs,
    and the exactly-one-budget-argument contract."""
    import pytest as _pytest

    from quackosm_spark.operators.mix import token_budget_filter
    from quackosm_spark.operators.text import quality_score, token_count

    rows = [
        (i, ("useful words here truly " * (i % 5 + 1)).strip())
        for i in range(60)
    ]
    rows.append((60, ""))  # empty text: 0 tokens, never consumes budget
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")

    # serial reference from the same Spark scoring expressions
    scored = df.select(
        "doc_id",
        quality_score("text").alias("q"),
        token_count("text").cast("bigint").alias("w"),
    ).collect()
    total = sum(r.w for r in scored)
    budget = 0.4 * total
    cum, ref = 0, {}
    for r in sorted(scored, key=lambda r: (-r.q, r.doc_id)):
        cum += r.w
        ref[r.doc_id] = cum <= budget
    ref[60] = False  # zero-token doc: kept only while budget remains...
    # ...but q=0 for empty text sorts last; with budget exhausted it's False

    out = token_budget_filter(df, budget_fraction=0.4)
    got = {r.doc_id: r.kept for r in out.collect()}
    assert set(got) == set(ref)
    # the empty doc's verdict depends on whether budget survives to the
    # tail; assert the non-degenerate docs exactly and the empty doc is
    # consistent with the serial rule (0 tokens always "fit" if reached)
    for i in range(60):
        assert got[i] == ref[i], f"doc {i}: {got[i]} != {ref[i]}"

    kept_tokens = sum(
        r.n_tokens for r in out.collect() if r.kept
    )
    assert kept_tokens <= budget

    # absolute budget mode agrees with the fraction mode at the same cut
    out_abs = token_budget_filter(df, budget_tokens=int(budget))
    got_abs = {r.doc_id: r.kept for r in out_abs.collect()}
    for i in range(60):
        assert got_abs[i] == ref[i]

    with _pytest.raises(ValueError):
        token_budget_filter(df)
    with _pytest.raises(ValueError):
        token_budget_filter(df, budget_tokens=10, budget_fraction=0.5)


def test_token_budget_filter_null_text_never_kept(spark):
    from quackosm_spark.operators.mix import token_budget_filter

    df = spark.createDataFrame(
        [(1, "plenty of good words right here"), (2, None)],
        "doc_id LONG, text STRING",
    )
    got = {r.doc_id: (r.kept, r.n_tokens) for r in
           token_budget_filter(df, budget_fraction=1.0).collect()}
    assert got[1][0] is True
    assert got[2][0] is False


def test_token_budget_filter_grouped_per_group_caps(spark):
    """r08: group_col applies the budget per group — each group's kept set
    equals the serial greedy prefix under ITS OWN cap; NULL group keys form
    a real group (null-safe join, groupBy semantics)."""
    from quackosm_spark.operators.mix import token_budget_filter

    rows = []
    for i in range(40):
        rows.append((i, "en", 0.9 - (i % 10) * 0.05, 10 + i % 7))
    for i in range(40, 60):
        rows.append((i, "fr", 0.8 - (i % 5) * 0.1, 5 + i % 3))
    for i in range(60, 66):
        rows.append((i, None, 0.5, 4))
    df = spark.createDataFrame(
        rows, "doc_id LONG, lang STRING, score DOUBLE, n_toks LONG"
    )
    out = token_budget_filter(
        df, budget_tokens=100, score_col="score", tokens_col="n_toks",
        group_col="lang",
    )
    got = {r.doc_id: r.kept for r in out.collect()}
    assert len(got) == 66  # null-group rows are NOT dropped by the join

    ref = {}
    for g in ("en", "fr", None):
        grp = sorted(
            (r for r in rows if r[1] == g), key=lambda r: (-r[2], r[0])
        )
        cum = 0
        for r in grp:
            cum += r[3]
            ref[r[0]] = cum <= 100
    assert got == ref

    # fraction mode: each group's budget is a share of its OWN total
    out_f = token_budget_filter(
        df, budget_fraction=0.5, score_col="score", tokens_col="n_toks",
        group_col="lang",
    )
    got_f = {r.doc_id: r.kept for r in out_f.collect()}
    ref_f = {}
    for g in ("en", "fr", None):
        grp = sorted(
            (r for r in rows if r[1] == g), key=lambda r: (-r[2], r[0])
        )
        gtotal = sum(r[3] for r in grp)
        cum = 0
        for r in grp:
            cum += r[3]
            ref_f[r[0]] = cum <= 0.5 * gtotal
    assert got_f == ref_f


def test_temperature_sample_quota_and_order_semantics(spark):
    """r08: temperature-scaled mixing — quotas follow n_g**alpha (alpha=0
    equalizes, alpha=1 reproduces the corpus distribution), small groups
    cap at their population, and the kept set matches a serial reference
    (first quota docs per group in (md5(id), id) order) exactly."""
    import hashlib
    import math

    from quackosm_spark.operators.mix import temperature_sample

    rows = [(i, "big") for i in range(900)]
    rows += [(1000 + i, "mid") for i in range(90)]
    rows += [(2000 + i, "tiny") for i in range(10)]
    df = spark.createDataFrame(rows, "doc_id: long, source: string")

    def reference(total, alpha):
        counts = {"big": 900, "mid": 90, "tiny": 10}
        denom = sum(n ** alpha for _, n in sorted(counts.items()))
        kept = set()
        for g, n in counts.items():
            share = math.floor(n ** alpha / denom * 1e6 + 0.5) / 1e6
            quota = min(n, math.floor(total * share))
            ids = [i for i, s in rows if s == g]
            ids.sort(key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
            kept |= set(ids[:quota])
        return kept

    for total, alpha in [(100, 0.5), (500, 0.0), (500, 1.0), (37, 0.3)]:
        got = {
            r.doc_id
            for r in temperature_sample(df, total, alpha=alpha).collect()
        }
        assert got == reference(total, alpha), (total, alpha)

    # alpha=0: equal shares — floor(30 * round6(1/3)) = 9 per group (the
    # rounded-share floor never exceeds the budget, it can undershoot)
    eq = temperature_sample(df, 30, alpha=0.0)
    per = {r.source: r["count"] for r in eq.groupBy("source").count().collect()}
    assert per == {"big": 9, "mid": 9, "tiny": 9}
    # saturation: tiny and mid cap at their populations
    sat = temperature_sample(df, 900, alpha=0.0)
    per = {r.source: r["count"] for r in sat.groupBy("source").count().collect()}
    assert per["tiny"] == 10 and per["mid"] == 90 and per["big"] == 299
    # determinism under repartition
    a = {r.doc_id for r in temperature_sample(df, 100, 0.5).collect()}
    b = {
        r.doc_id
        for r in temperature_sample(df.repartition(13), 100, 0.5).collect()
    }
    assert a == b
    # validation
    with pytest.raises(ValueError):
        temperature_sample(df, -1)
    with pytest.raises(ValueError):
        temperature_sample(df, 10, alpha=-0.5)


def test_soft_dedup_weights_cluster_mass(spark):
    """r08: every near-dup cluster contributes total weight ~1; singletons
    keep weight 1.0; no row is ever dropped; payload passes through."""
    rows = [
        (1, "the quick brown fox jumps over the lazy dog", "a"),
        (2, "the quick brown fox jumps over the lazy dog", "b"),   # dup of 1
        (3, "the quick brown fox jumps over the lazy dot", "c"),   # near 1
        (4, "completely different text about spark physical plans", "d"),
        (5, "short", "e"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, src: string")
    out = D.soft_dedup_weights(df, threshold=0.2)
    got = {r.doc_id: (r.sample_weight, r.src) for r in out.collect()}
    assert set(got) == {1, 2, 3, 4, 5}                 # nothing dropped
    assert got[4][0] == 1.0 and got[5][0] == 1.0       # singletons
    cluster = [got[i][0] for i in (1, 2, 3)]
    assert all(w == round(1.0 / len(cluster), 6) for w in cluster)
    assert got[2][1] == "b"                             # payload intact
    # injected pair graph override
    pairs = spark.createDataFrame([(4, 5)], "doc_a: long, doc_b: long")
    out2 = {r.doc_id: r.sample_weight
            for r in D.soft_dedup_weights(df, pairs=pairs).collect()}
    assert out2[4] == 0.5 and out2[5] == 0.5 and out2[1] == 1.0


def test_snapshot_diff_four_statuses(spark):
    """r08: added/removed/changed/unchanged classification on crafted
    snapshots; ids unique per side; digests compared, not texts."""
    from quackosm_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "doc_id: long, text: string"
    )
    new = spark.createDataFrame(
        [(2, "beta"), (3, "gamma EDITED"), (4, "delta")],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {1: "removed", 2: "unchanged", 3: "changed", 4: "added"}


def test_kmeans_distributed_matches_numpy_lloyd(spark):
    """r08: full-corpus Lloyd — same init (k lowest ids), same rounds,
    same degenerate-cell rule as an independent numpy Lloyd; centroids
    agree to 1e-9 and assignments exactly, on well-separated clusters."""
    import numpy as np

    from quackosm_spark.operators.similarity import (
        kmeans_assign,
        kmeans_fit_distributed,
    )

    rng = np.random.RandomState(7)
    centers = np.array([[0, 0, 0], [10, 10, 10], [-10, 5, 0]], dtype=float)
    pts = np.vstack([c + rng.randn(40, 3) * 0.5 for c in centers])
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")

    got = kmeans_fit_distributed(df, k=3, iters=4)

    cent = pts[:3].copy()
    for _ in range(4):
        dist = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cells = dist.argmin(axis=1)
        for c in range(3):
            m = pts[cells == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    assert np.allclose(np.array(got), cent, atol=1e-9)

    assign = {r.id: r.cell for r in kmeans_assign(df, got).collect()}
    ref = ((pts[:, None, :] - np.array(got)[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)
    assert all(assign[i] == ref[i] for i in range(len(pts)))
    # validation + degenerate input
    with pytest.raises(ValueError):
        kmeans_fit_distributed(df, k=0)
    with pytest.raises(ValueError):
        kmeans_fit_distributed(df.where("vec_id < 0"), k=2)
    # k > n: seeds cap at the corpus, every vector its own cell
    tiny = df.where("vec_id < 2")
    cents = kmeans_fit_distributed(tiny, k=5, iters=1)
    assert len(cents) == 2


def test_epoch_plan_targets_and_epochs(spark):
    """r08: normalized weights, floor targets, epochs = target/available;
    unweighted sources excluded; zero-available -> NULL epochs."""
    from quackosm_spark.operators.mix import epoch_plan

    rows = [
        (1, "a b c d", "web"),        # 4 tokens
        (2, "a b", "web"),            # 2
        (3, "x y z", "books"),        # 3
        (4, "", "empty"),             # 0
        (5, "q r s t u", "ignored"),  # not in weights
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = {
        r.source: (r.available_tokens, r.weight, r.target_tokens, r.epochs)
        for r in epoch_plan(
            df, {"web": 3.0, "books": 1.0, "empty": 0.0}, total_tokens=12
        ).collect()
    }
    assert set(got) == {"web", "books", "empty"}
    assert got["web"] == (6, 0.75, 9, 1.5)
    assert got["books"] == (3, 0.25, 3, 1.0)
    assert got["empty"][0] == 0 and got["empty"][3] is None
    import pytest as _pytest

    with _pytest.raises(ValueError):
        epoch_plan(df, {}, 10)
    with _pytest.raises(ValueError):
        epoch_plan(df, {"web": -1.0, "books": 1.0}, 10)


def test_minhash_index_incremental_matching(spark):
    """r08: history indexed once (signature-only rows), a new batch
    matches by banding + signature-agreement estimate; planted near-dups
    found, unrelated docs not; parquet round-trip preserves matching;
    anti-join ingestion drops exactly the flagged docs."""
    import tempfile

    from quackosm_spark.operators.dedup import (
        match_against_minhash_index,
        minhash_index,
    )

    hist_rows = [
        (10, "the quick brown fox jumps over the lazy dog today"),
        (12, "an entirely different sentence about parquet files"),
    ]
    new_rows = [
        (21, "the quick brown fox jumps over the lazy dog today"),   # dup of 10
        (23, "the quick brown fox jumps over the lazy cat today"),   # near 10
        (25, "completely unrelated text with novel words only"),
    ]
    hist = spark.createDataFrame(hist_rows, "doc_id: long, text: string")
    new = spark.createDataFrame(new_rows, "doc_id: long, text: string")

    idx = minhash_index(hist, num_hashes=16, bands=4)
    assert idx.count() == len(hist_rows) * 4            # one row per band
    with tempfile.TemporaryDirectory() as d:
        idx.write.parquet(f"{d}/idx")                   # the persistence path
        loaded = spark.read.parquet(f"{d}/idx")
        got = {
            (r.doc_id, r.matched_doc): r.est_jaccard
            for r in match_against_minhash_index(
                new, loaded, threshold=0.5, num_hashes=16, bands=4
            ).collect()
        }
    assert got[(21, 10)] == 1.0                         # exact dup: all agree
    assert (23, 10) in got and got[(23, 10)] >= 0.5     # near dup found
    assert all(nid != 25 for nid, _ in got)             # unrelated not flagged
    assert all(hid != 12 for _, hid in got)
    # ingestion: anti-join drops exactly the flagged new docs
    flagged = spark.createDataFrame(
        [(i,) for i, _ in got], "doc_id: long"
    )
    kept = new.join(flagged, "doc_id", "left_anti")
    assert {r.doc_id for r in kept.collect()} == {25}


# ---------------------------------------------------------------------------
# round 9: ADVICE fixes + driver-collect guards + large-k argmin fallback
# ---------------------------------------------------------------------------


def test_snapshot_diff_null_text(spark):
    """r09 (ADVICE): presence classifies by id, not digest nullness — a
    NULL-text doc only in old is 'removed' (was misreported 'added');
    NULL-vs-NULL digests compare null-safely as 'unchanged'."""
    from quackosm_spark.operators.dedup import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, None), (3, "x"), (4, None), (5, "same")],
        "doc_id: long, text: string",
    )
    new = spark.createDataFrame(
        [(2, "now set"), (3, None), (4, None), (5, "same"), (6, None)],
        "doc_id: long, text: string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "removed",    # only in old, NULL text — presence wins
        2: "changed",    # NULL -> value
        3: "changed",    # value -> NULL
        4: "unchanged",  # NULL == NULL (null-safe)
        5: "unchanged",
        6: "added",      # only in new, NULL text
    }


def test_epoch_plan_zero_doc_source_row(spark):
    """r09 (ADVICE): a weighted source with ZERO documents still gets its
    plan row (available_tokens=0, epochs NULL) — the misconfigured-source
    signal must not vanish from the output."""
    from quackosm_spark.operators.mix import epoch_plan

    df = spark.createDataFrame(
        [(1, "a b c d", "web")], "doc_id: long, text: string, source: string"
    )
    got = {
        r.source: (r.available_tokens, r.weight, r.target_tokens, r.epochs)
        for r in epoch_plan(
            df, {"web": 1.0, "missing": 1.0}, total_tokens=8
        ).collect()
    }
    assert set(got) == {"web", "missing"}
    assert got["web"] == (4, 0.5, 4, 1.0)
    assert got["missing"] == (0, 0.5, 4, None)


def test_kmeans_malformed_vector_filtering(spark):
    """r09 (ADVICE): NULL vectors, wrong-length vectors, and vectors with
    NULL elements are filtered before seeding and before every Lloyd
    round — the fit matches a numpy Lloyd over only the valid rows."""
    import numpy as np

    from quackosm_spark.operators.similarity import kmeans_fit_distributed

    rng = np.random.RandomState(3)
    centers = np.array([[0.0, 0.0], [8.0, 8.0]])
    pts = np.vstack([c + rng.randn(20, 2) * 0.3 for c in centers])
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    # malformed rows interleaved at ids that WOULD otherwise seed
    bad = [
        (-3, None),                    # NULL vector
        (-2, [1.0]),                   # wrong length
        (-1, [1.0, None]),             # NULL element
    ]
    df = spark.createDataFrame(
        rows + bad, "vec_id: long, embedding: array<double>"
    )
    got = kmeans_fit_distributed(df, k=2, iters=3)

    cent = pts[:2].copy()
    for _ in range(3):
        dist = ((pts[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        cells = dist.argmin(axis=1)
        for c in range(2):
            m = pts[cells == c]
            if len(m):
                cent[c] = m.mean(axis=0)
    assert np.allclose(np.array(got), cent, atol=1e-9)


def test_kmeans_gemm_fallback_matches_literal_argmin(spark, monkeypatch):
    """r09: above ARGMIN_LITERAL_LIMIT the assignment switches to the
    Arrow-batched GEMM kernel; on the same data it must agree with the
    literal-expression path cell-for-cell (well-separated data — no
    last-ulp tie surface), and malformed vectors assign NULL."""
    import numpy as np

    from quackosm_spark.operators import similarity as S

    rng = np.random.RandomState(11)
    centers = rng.randn(6, 4) * 10
    pts = np.vstack([c + rng.randn(15, 4) * 0.2 for c in centers])
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    cents = [[float(x) for x in c] for c in centers]

    lit = {r.id: r.cell for r in S.kmeans_assign(df, cents).collect()}
    monkeypatch.setattr(S, "ARGMIN_LITERAL_LIMIT", 1)  # force GEMM path
    gemm = {r.id: r.cell for r in S.kmeans_assign(df, cents).collect()}
    assert gemm == lit and len(lit) == len(pts)

    badf = spark.createDataFrame(
        [(100, None), (101, [1.0, 2.0])],
        "vec_id: long, embedding: array<double>",
    )
    bad = {r.id: r.cell for r in S.kmeans_assign(badf, cents).collect()}
    assert bad == {100: None, 101: None}

    # and the full fit still works end-to-end on the GEMM path
    got = S.kmeans_fit_distributed(df, k=6, iters=2)
    assert len(got) == 6 and all(len(c) == 4 for c in got)


def test_quota_ops_cardinality_guard(spark, monkeypatch):
    """r09: the driver-collect quota operators raise a contract-naming
    ValueError on a high-cardinality group column instead of collecting a
    groups x 256 table (the silent-driver-OOM class)."""
    import pytest as _pytest

    from quackosm_spark.operators import mix as M

    df = spark.createDataFrame(
        [(i, "tok " * 3, f"g{i}") for i in range(60)],
        "doc_id: long, text: string, source: string",
    )
    monkeypatch.setattr(M, "MAX_QUOTA_GROUPS", 50)
    with _pytest.raises(ValueError, match="driver-collect contract"):
        M.temperature_sample(df, 10, group_col="source")
    with _pytest.raises(ValueError, match="driver-collect contract"):
        M.token_budget_filter(df, budget_tokens=5, group_col="source")
    with _pytest.raises(ValueError, match="driver-collect contract"):
        M.interleave_sources(df, source_col="source").collect()
    # within contract: all three still work
    ok = spark.createDataFrame(
        [(i, "tok " * 3, "a" if i % 2 else "b") for i in range(40)],
        "doc_id: long, text: string, source: string",
    )
    assert M.temperature_sample(ok, 10, group_col="source").count() == 10
    assert M.token_budget_filter(ok, budget_tokens=5, group_col="source").count() > 0
    assert M.interleave_sources(ok, source_col="source").count() == 40


def test_match_index_exact_verify_two_tier(spark):
    """r09: exact_verify_new=True re-scores matched pairs whose matched
    side is in the new batch with TRUE shingle jaccard (dropping
    estimator false positives), keeps new x history pairs estimator-gated,
    and tags each pair with its tier."""
    from quackosm_spark.operators.dedup import (
        match_against_minhash_index,
        minhash_index,
    )

    hist = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog today")],
        "doc_id: long, text: string",
    )
    # a batch with a PROBED estimator false positive: pair (20, 21) has
    # est_jaccard 0.75 at 16 hashes but TRUE shingle jaccard 0.689655 —
    # flagged at threshold 0.7 by the estimator, rejected by exact verify.
    base = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lam mu nu xi omicron pi rho sigma tau upsilon"
    )
    fp = (
        "alphaQ beta gamma delta epsilon zeta etaQ theta iota kappa "
        "lam mu nuQ xi omicron pi rho sigma tauQ upsilon"
    )
    new_rows = [
        (20, base),
        (21, fp),
        (40, "the quick brown fox jumps over the lazy dog today"),
    ]
    new = spark.createDataFrame(new_rows, "doc_id: long, text: string")

    # index = history + the new batch's own appended rows (the documented
    # incremental protocol), so new x new collisions surface
    idx = minhash_index(hist, num_hashes=16, bands=4).unionByName(
        minhash_index(new, num_hashes=16, bands=4)
    )
    est_only = match_against_minhash_index(
        new, idx, threshold=0.7, num_hashes=16, bands=4
    )
    two_tier = match_against_minhash_index(
        new, idx, threshold=0.7, num_hashes=16, bands=4,
        exact_verify_new=True,
    )
    est_pairs = {(r.doc_id, r.matched_doc) for r in est_only.collect()}
    rows = two_tier.collect()
    got_pairs = {(r.doc_id, r.matched_doc) for r in rows}
    # self-matches (a doc against its own index rows) count as exact 1.0
    assert got_pairs <= est_pairs
    tiers = {(r.doc_id, r.matched_doc): r.tier for r in rows}
    # the history match survives on the estimated tier with NULL jaccard
    hist_pairs = [r for r in rows if r.matched_doc == 10]
    assert hist_pairs and all(
        r.tier == "estimated" and r.jaccard is None for r in hist_pairs
    )
    # every exact-tier pair carries a true jaccard >= threshold
    assert all(
        r.jaccard is not None and r.jaccard >= 0.7
        for r in rows if r.tier == "exact"
    )
    # at least one estimator-flagged new x new pair was dropped by the
    # exact verify (the false-positive class the flag exists for)
    nn_est = {p for p in est_pairs if p[1] != 10}
    nn_exact = {p for p in got_pairs if tiers.get(p) == "exact"}
    assert nn_exact < nn_est


def test_canonical_url_rules(spark):
    """r09: every canonicalization rule individually — case, www, default
    ports, fragments, tracking params, param sort, trailing slash,
    NULL/garbage passthrough."""
    from quackosm_spark.operators.dedup import canonical_url

    cases = [
        # (raw, expected)
        ("HTTPS://WWW.Example.COM:443/A/?utm_source=x&b=2&a=1#frag",
         "https://example.com/A?a=1&b=2"),
        ("http://example.com:80/path", "http://example.com/path"),
        ("http://example.com:8080/path", "http://example.com:8080/path"),
        ("https://example.com:80/path", "https://example.com:80/path"),
        ("https://example.com/", "https://example.com/"),  # root slash kept
        ("https://example.com/a/b/", "https://example.com/a/b"),
        ("https://example.com/p?fbclid=1&gclid=2&UTM_TERM=3",
         "https://example.com/p"),
        ("https://example.com/p?z=1&a=2", "https://example.com/p?a=2&z=1"),
        ("not a url", "not a url"),            # garbage passthrough
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i: int, url: string"
    )
    got = {
        r.i: r.c
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, (raw, want) in enumerate(cases):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_url_duplicates_groups(spark):
    """r09: variants of one page collapse to one canonical key with
    keep-smallest-id and a sorted dup list; distinct pages don't."""
    from quackosm_spark.operators.dedup import url_duplicates

    rows = [
        (3, "https://www.site.com/p?b=2&a=1"),
        (1, "HTTPS://SITE.com:443/p/?a=1&b=2#x"),
        (2, "https://site.com/p?a=1&utm_medium=m&b=2"),
        (9, "https://site.com/other"),
        (8, "https://site.com/other/"),
        (7, "https://unique.com/q"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url: string")
    got = {
        r.canonical_url: (r.keep_id, list(r.dup_ids), r.n_dups)
        for r in url_duplicates(df).collect()
    }
    assert got == {
        "https://site.com/p?a=1&b=2": (1, [2, 3], 2),
        "https://site.com/other": (8, [9], 1),
    }


def test_url_duplicates_repeated_id_not_its_own_dup(spark):
    """r10 (ADVICE r9): the same doc_id appearing twice under one
    canonical URL must NOT list keep_id in dup_ids (a downstream
    left_anti on dup_ids would otherwise delete every copy of the kept
    page), and a key whose rows all share one id emits nothing."""
    from quackosm_spark.operators.dedup import url_duplicates

    rows = [
        # id 1 crawled twice + a genuine dup id 2
        (1, "https://site.com/p"),
        (1, "https://site.com/p/"),
        (2, "https://www.site.com/p"),
        # id 9 crawled twice, no other id: no duplicate group at all
        (9, "https://site.com/solo"),
        (9, "https://site.com/solo#frag"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url: string")
    got = {
        r.canonical_url: (r.keep_id, list(r.dup_ids), r.n_dups)
        for r in url_duplicates(df).collect()
    }
    assert got == {"https://site.com/p": (1, [2], 1)}


def test_time_decay_scores_semantics(spark):
    """r09: decayed score = sum(0.5^(age/half_life)) back from the corpus
    max ts; checked against a python computation; value weighting and
    half-life validation."""
    import math
    from datetime import datetime, timedelta

    from quackosm_spark.operators.temporal import time_decay_scores

    t0 = datetime(2024, 1, 1)
    rows = [
        (1, t0, 2.0),
        (1, t0 + timedelta(days=7), 1.0),
        (1, t0 + timedelta(days=14), 4.0),
        (2, t0 + timedelta(days=14), 1.0),
    ]
    df = spark.createDataFrame(rows, "user_id: long, ts: timestamp, value: double")
    got = {
        r.user_id: (r.decayed_score, r.n_events, r.last_ts)
        for r in time_decay_scores(df, half_life_days=7.0).collect()
    }
    # ref = t0+14d: ages 14d, 7d, 0d -> weights 0.25, 0.5, 1.0
    assert got[1] == (round(0.25 + 0.5 + 1.0, 6), 3, t0 + timedelta(days=14))
    assert got[2] == (1.0, 1, t0 + timedelta(days=14))
    weighted = {
        r.user_id: r.decayed_score
        for r in time_decay_scores(
            df, half_life_days=7.0, value_col="value"
        ).collect()
    }
    assert weighted[1] == round(0.25 * 2.0 + 0.5 * 1.0 + 1.0 * 4.0, 6)
    import pytest as _pytest

    with _pytest.raises(ValueError):
        time_decay_scores(df, half_life_days=0)


def test_ivf_index_matches_ivf_topk_and_persists(spark, tmp_path):
    """r09: match_against_ivf_index over an ivf_index equals ivf_topk
    bit-for-bit when built from the same centroid model (any nprobe), the
    index survives a cell-partitioned parquet round-trip, and appended
    batches extend matching without re-assigning history."""
    import numpy as np

    from quackosm_spark.operators import similarity as S

    rng = np.random.RandomState(5)
    pts = rng.randn(120, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id: long, embedding: array<double>",
    )
    queries = df.where("vec_id % 17 = 0")
    cents = S.train_ivf_centroids(df, num_cells=4)

    for nprobe in (1, 2, 4):
        want = {
            (r.query_id, r.match_id, r.rank, r.cosine)
            for r in S.ivf_topk(
                df, queries, k=3, num_cells=4, nprobe=nprobe
            ).collect()
        }
        idx = S.ivf_index(df, cents)
        got = {
            (r.query_id, r.match_id, r.rank, r.cosine)
            for r in S.match_against_ivf_index(
                queries, idx, cents, k=3, nprobe=nprobe
            ).collect()
        }
        assert got == want and len(got) > 0

    # persistence: cell-partitioned write, read back, same matches
    p = str(tmp_path / "ivfidx")
    S.ivf_index(df.where("vec_id < 100"), cents).write.partitionBy(
        "cell"
    ).parquet(p)
    # append a new batch's index rows — history untouched
    S.ivf_index(df.where("vec_id >= 100"), cents).write.mode(
        "append"
    ).partitionBy("cell").parquet(p)
    loaded = spark.read.parquet(p)
    got = {
        (r.query_id, r.match_id, r.rank)
        for r in S.match_against_ivf_index(
            queries, loaded, cents, k=3, nprobe=4
        ).collect()
    }
    want = {
        (r.query_id, r.match_id, r.rank)
        for r in S.ivf_topk(df, queries, k=3, num_cells=4, nprobe=4).collect()
    }
    assert got == want


def test_embedding_drift_semantics(spark):
    """r09: centroid cosine/L2 vs numpy on crafted snapshots — grouped and
    global modes; malformed vectors excluded; dim-mismatch raises."""
    import numpy as np
    import pytest as _pytest

    from quackosm_spark.operators.similarity import embedding_drift

    rng = np.random.RandomState(2)
    o = rng.randn(30, 4)
    nv = o * 0.9 + 0.5  # shifted/rescaled "re-embed"
    old = spark.createDataFrame(
        [("a" if i < 20 else "b", [float(x) for x in v]) for i, v in enumerate(o)],
        "src: string, embedding: array<double>",
    )
    new = spark.createDataFrame(
        [("a" if i < 20 else "b", [float(x) for x in v]) for i, v in enumerate(nv)]
        + [("a", None), ("a", [1.0, 2.0])],  # malformed: excluded
        "src: string, embedding: array<double>",
    )
    got = {
        r.src: (r.n_old, r.n_new, r.centroid_cosine, r.centroid_l2)
        for r in embedding_drift(old, new, group_cols=["src"]).collect()
    }
    for src, sl in (("a", slice(0, 20)), ("b", slice(20, 30))):
        co, cn = o[sl].mean(axis=0), nv[sl].mean(axis=0)
        cos = float(co @ cn / (np.linalg.norm(co) * np.linalg.norm(cn)))
        l2 = float(np.linalg.norm(co - cn))
        n = sl.stop - sl.start
        assert got[src] == (n, n, round(cos, 6), round(l2, 6))
    # global mode: one row
    g = embedding_drift(old, new).collect()
    assert len(g) == 1 and g[0].n_old == 30 and g[0].n_new == 30
    # dim mismatch raises
    with _pytest.raises(ValueError, match="dims differ"):
        embedding_drift(
            old,
            spark.createDataFrame(
                [("a", [1.0, 2.0])], "src: string, embedding: array<double>"
            ),
        )


def test_unigram_kl_by_group(spark):
    """r09: KL(P_group || P_corpus) vs a python computation; the
    identical-to-corpus group scores ~0 and the lexically-distinct group
    scores higher; empty-text docs contribute nothing."""
    import math
    from collections import Counter

    from quackosm_spark.operators.text import unigram_kl_by_group

    rows = [
        (1, "a b c a b", "mixed"),
        (2, "a b c", "mixed"),
        (3, "x y z x y z", "weird"),
        (4, "", "weird"),
        (5, "a b c a b c a b", "plain"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string, source: string")
    got = {
        r.source: (r.n_tokens, r.vocab, r.kl_divergence)
        for r in unigram_kl_by_group(df).collect()
    }
    groups: dict = {}
    for _, t, s in rows:
        groups.setdefault(s, Counter()).update(t.split())
    corpus = Counter()
    for c in groups.values():
        corpus.update(c)
    n = sum(corpus.values())
    for s, cnt in groups.items():
        ng = sum(cnt.values())
        kl = sum(
            (c / ng) * math.log((c / ng) / (corpus[w] / n))
            for w, c in cnt.items()
        )
        assert got[s] == (ng, len(cnt), round(kl, 6)), s
    assert got["weird"][2] > got["plain"][2] > 0


def test_canonical_url_idempotent(spark):
    """r09: canonicalization must be IDEMPOTENT — canonical(canonical(u))
    == canonical(u) — or a persisted URL-dedup key would diverge from a
    re-derived one. Swept over a combinatorial grid of gnarly inputs."""
    import itertools

    from quackosm_spark.operators.dedup import canonical_url

    schemes = ["http://", "HTTPS://", "https://"]
    hosts = ["WWW.Site.COM", "site.com", "www.site.com:443", "Site.com:8080"]
    paths = ["", "/", "/a/B/", "/a%20b", "/x"]
    queries = ["", "?b=2&a=1", "?utm_source=x", "?a=1&fbclid=2&z=9&A=3",
               "?=v&a", "?a=1&a=0"]
    frags = ["", "#f", "#a?b=1"]
    urls = [
        "".join(p)
        for p in itertools.product(schemes, hosts, paths, queries, frags)
    ]
    urls += ["no scheme here", "weird://x:80/p?a=1", ""]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i: int, url: string")
    rows = df.select(
        "url",
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    ).collect()
    bad = [(r.url, r.c1, r.c2) for r in rows if r.c1 != r.c2]
    assert not bad, bad[:5]
    for r in rows:
        if "://" in r.url:
            assert "#" not in r.c1
            assert "utm_source" not in r.c1 and "fbclid" not in r.c1


def test_epoch_plan_int_group_keys(spark):
    """r09: the zero-source anchor frame inherits the group column's real
    type — int-keyed source columns work."""
    from quackosm_spark.operators.mix import epoch_plan

    df = spark.createDataFrame(
        [(1, "a b", 10), (2, "c d e", 20)],
        "doc_id: long, text: string, source: int",
    )
    got = {
        r.source: (r.available_tokens, r.epochs)
        for r in epoch_plan(
            df, {10: 1.0, 20: 1.0, 30: 2.0}, total_tokens=8,
            group_col="source",
        ).collect()
    }
    assert got[10] == (2, 1.0) and got[20] == (3, round(2 / 3, 4))
    assert got[30] == (0, None)


def test_time_decay_null_key_parity(spark):
    """r09: a NULL group key is a real group under BOTH anchors — the
    key_max join-back must be null-safe, not silently drop those rows."""
    from datetime import datetime, timedelta

    from quackosm_spark.operators.temporal import time_decay_scores

    t0 = datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(None, t0), (None, t0 + timedelta(days=7)), (5, t0)],
        "user_id: long, ts: timestamp",
    )
    for anchor in ("corpus_max", "key_max"):
        got = {
            r.user_id: r.n_events
            for r in time_decay_scores(
                df, ["user_id"], "ts", 7.0, anchor=anchor
            ).collect()
        }
        assert got == {None: 2, 5: 1}, anchor
    km = {
        r.user_id: r.decayed_score
        for r in time_decay_scores(
            df, ["user_id"], "ts", 7.0, anchor="key_max"
        ).collect()
    }
    assert km[None] == 1.5  # anchored at ITS OWN max: 0.5 + 1.0


def test_char_entropy_semantics(spark):
    """r09: entropy vs python math on crafted docs — degenerate repetition
    scores ~0, uniform alphabet scores log2(k); lowercasing merges case;
    empty text emits no row."""
    import math
    from collections import Counter

    from quackosm_spark.operators.text import char_entropy

    rows = [
        (1, "aaaaaaaa"),            # zero entropy
        (2, "abcdabcd"),            # uniform over 4 chars -> 2 bits
        (3, "AaBb"),                # lowercased -> uniform over 2 -> 1 bit
        (4, ""),                    # no row
        (5, "hello world"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.n_chars, r.entropy)
        for r in char_entropy(df).collect()
    }
    assert 4 not in got
    assert got[1] == (8, 0.0)
    assert got[2] == (8, 2.0)
    assert got[3] == (4, 1.0)
    cnt = Counter("hello world")
    n = sum(cnt.values())
    h = -sum((c / n) * math.log2(c / n) for c in cnt.values())
    assert got[5] == (n, round(h, 6))


def test_ivf_match_gemm_score_identical(spark):
    """r09: gemm_score=True (Arrow-batched cosine) returns the identical
    6-dp rows as the Column fold."""
    import numpy as np

    from quackosm_spark.operators import similarity as S

    rng = np.random.RandomState(9)
    pts = rng.randn(150, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in p]) for i, p in enumerate(pts)],
        "vec_id: long, embedding: array<double>",
    )
    cents = S.train_ivf_centroids(df, num_cells=4)
    idx = S.ivf_index(df, cents)
    q = df.where("vec_id % 29 = 0")
    a = {(r.query_id, r.match_id, r.rank, r.cosine)
         for r in S.match_against_ivf_index(q, idx, cents, k=4, nprobe=4).collect()}
    b = {(r.query_id, r.match_id, r.rank, r.cosine)
         for r in S.match_against_ivf_index(
             q, idx, cents, k=4, nprobe=4, gemm_score=True).collect()}
    assert a == b and len(a) > 0


def test_gemm_score_tolerates_malformed_vectors(spark):
    """r10 (ADVICE r9): a NULL, ragged, or NaN-holding embedding in the
    index must not crash the Arrow cosine kernel (np.stack ValueError) —
    malformed rows score NULL like the Column path and NEVER outrank real
    matches (a NaN mask would sort first under desc)."""
    import numpy as np

    from quackosm_spark.operators import similarity as S

    rng = np.random.RandomState(10)
    pts = rng.randn(60, 6)
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(pts)]
    rows += [
        (100, None),                      # NULL vector
        (101, [1.0, 2.0]),                # ragged dim
        (102, [float("nan")] * 6),        # NaN components
        (103, [0.0] * 6),                 # zero norm
    ]
    df = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>")
    clean = df.where("vec_id < 100")
    cents = S.train_ivf_centroids(clean, num_cells=2)
    idx = S.ivf_index(df, cents)  # malformed rows ride into the index
    q = clean.where("vec_id % 17 = 0")
    a = {(r.query_id, r.match_id, r.rank, r.cosine)
         for r in S.match_against_ivf_index(q, idx, cents, k=3, nprobe=2).collect()}
    b = {(r.query_id, r.match_id, r.rank, r.cosine)
         for r in S.match_against_ivf_index(
             q, idx, cents, k=3, nprobe=2, gemm_score=True).collect()}
    assert a == b and len(a) > 0
    assert not any(m in (100, 101, 102, 103) for _, m, _, _ in b)


def test_registered_domain_rules(spark):
    """r10: registered-domain heuristic — two-level public suffixes,
    subdomain stripping, www/port strip, IP and bare-host passthrough,
    NULL stays NULL."""
    from quackosm_spark.operators.dedup import registered_domain

    cases = [
        ("https://a.b.example.co.uk/x?q=1", "example.co.uk"),
        ("https://www.example.com:8080/", "example.com"),
        ("http://blog.example.com/post", "example.com"),
        ("https://example.com", "example.com"),
        ("https://co.uk/", "co.uk"),            # suffix itself: only 2 labels
        ("https://192.168.0.1:443/admin", "192.168.0.1"),
        ("https://localhost/x", "localhost"),
        ("not-a-url", "not-a-url"),             # bare-host passthrough
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i: long, url: string"
    )
    got = {
        r.i: r.d
        for r in df.select("i", registered_domain("url").alias("d")).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"


def test_domain_mix_report_shares(spark):
    """r10: per-domain doc/token counts, shares, cumulative token share
    in desc-token order; NULL urls excluded."""
    from quackosm_spark.operators.mix import domain_mix_report

    rows = [
        (1, "https://big.com/a", "one two three four"),
        (2, "https://www.big.com/b", "five six"),
        (3, "https://sub.small.org/c", "seven"),
        (4, None, "ignored text here"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url: string, text: string")
    got = {
        r.domain: (r.n_docs, r.n_tokens, r.doc_share, r.token_share,
                   r.cum_token_share, r.rank)
        for r in domain_mix_report(df).collect()
    }
    assert got == {
        "big.com": (2, 6, round(2 / 3, 6), round(6 / 7, 6),
                    round(6 / 7, 6), 1),
        "small.org": (1, 1, round(1 / 3, 6), round(1 / 7, 6), 1.0, 2),
    }


def test_domain_mix_report_two_phase_matches_global_window(spark):
    """r11: the two-phase rank/cumsum (range placement + broadcast
    offsets) is bit-identical to the naive global-window formulation,
    and its physical plan has NO Exchange SinglePartition."""
    from pyspark.sql import Window

    from quackosm_spark.operators.dedup import registered_domain
    from quackosm_spark.operators.mix import domain_mix_report
    from quackosm_spark.operators.text import token_count

    df = (
        spark.range(3000)
        .selectExpr(
            "id as doc_id",
            # ~300 domains with a skewed doc distribution + some NULLs
            "case when id % 50 = 0 then null else concat('https://s',"
            " cast(cast(pow(id % 997, 2) as long) % 311 as string),"
            " '.com/p') end as url",
            "concat('w ', repeat('tok ', cast(id % 17 as int))) as text",
        )
    )
    got = domain_mix_report(df)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan

    naive_per = (
        df.where(F.col("url").isNotNull())
        .select(
            registered_domain(F.col("url")).alias("domain"),
            token_count(F.col("text")).alias("t"),
        )
        .groupBy("domain")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("t").cast("bigint").alias("n_tokens"),
        )
    )
    tot = naive_per.agg(
        F.sum("n_docs").cast("double").alias("td"),
        F.sum("n_tokens").cast("double").alias("tt"),
    )
    w = Window.orderBy(F.desc("n_tokens"), F.asc("domain"))
    want = (
        naive_per.crossJoin(F.broadcast(tot))
        .withColumn("rank", F.row_number().over(w))
        .select(
            "domain",
            "n_docs",
            "n_tokens",
            F.round(F.col("n_docs") / F.col("td"), 6).alias("doc_share"),
            F.round(F.col("n_tokens") / F.col("tt"), 6).alias("token_share"),
            F.round(
                F.sum("n_tokens").over(
                    w.rowsBetween(Window.unboundedPreceding, 0)
                )
                / F.col("tt"),
                6,
            ).alias("cum_token_share"),
            "rank",
        )
    )
    g = sorted(map(tuple, got.collect()))
    e = sorted(map(tuple, want.collect()))
    assert g == e
    assert got.schema["rank"].dataType.simpleString() == "int"


def test_cap_per_domain_keep_rules(spark):
    """r10: quality mode keeps the domain's best docs; hash mode is a
    deterministic md5 slice; NULL urls pass through uncapped; validation
    raises on a nonpositive cap."""
    import hashlib

    import pytest as _pytest

    from quackosm_spark.operators.mix import cap_per_domain

    rows = [
        (1, "https://a.com/1", 0.9),
        (2, "https://a.com/2", 0.5),
        (3, "https://www.a.com/3", 0.7),
        (4, "https://b.org/1", None),
        (5, "https://b.org/2", 0.1),
        (6, None, 0.99),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, url: string, quality: double")
    by_quality = sorted(
        r.doc_id
        for r in cap_per_domain(df, 2, quality_col="quality").collect()
    )
    # a.com keeps best two (1: .9, 3: .7); b.org keeps .1 then NULL-last
    assert by_quality == [1, 3, 4, 5, 6]

    by_hash = sorted(r.doc_id for r in cap_per_domain(df, 1).collect())
    a_keep = min((hashlib.md5(str(i).encode()).hexdigest(), i) for i in (1, 2, 3))[1]
    b_keep = min((hashlib.md5(str(i).encode()).hexdigest(), i) for i in (4, 5))[1]
    assert by_hash == sorted([a_keep, b_keep, 6])
    assert [c for c in cap_per_domain(df, 1).columns] == df.columns

    with _pytest.raises(ValueError, match="max_per_domain"):
        cap_per_domain(df, 0)


def test_containment_pairs_catches_embedded_doc(spark):
    """r10: a doc fully embedded in a much larger one scores containment
    ~1 while its jaccard is far below any dedup threshold — checked
    against python set math over the same char shingles."""
    from quackosm_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    core = "the quick brown fox jumps over the lazy dog again and again"
    wrapper = (
        "header boilerplate navigation menu " + core +
        " footer copyright terms privacy contact about sitemap feedback"
    )
    other = "completely unrelated text about spark shuffles and joins"
    rows = [(1, core), (2, wrapper), (3, other)]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    def shset(t, k=5):
        return {t[i:i + k] for i in range(len(t) - k + 1)}

    a, b = shset(core), shset(wrapper)
    want_cont = round(len(a & b) / min(len(a), len(b)), 6)
    want_jac = round(len(a & b) / len(a | b), 6)
    assert want_cont == 1.0 and want_jac < 0.5

    got = {
        (r.doc_a, r.doc_b): (r.contained_doc, r.containment)
        for r in containment_pairs(df, threshold=0.8).collect()
    }
    assert got == {(1, 2): (1, 1.0)}
    jac = {
        (r.doc_a, r.doc_b)
        for r in ngram_jaccard_pairs(df, threshold=0.8).collect()
    }
    assert (1, 2) not in jac  # the pair jaccard misses by construction


def test_robust_zscore_matches_numpy(spark):
    """r10: per-group median/MAD robust z vs numpy; MAD=0 group yields
    NULL scores; NULL values pass through as NULL; outlier resistance
    (the spike's own score is large, others stay near 0)."""
    import numpy as np

    from quackosm_spark.operators.stats import robust_zscore

    rng = np.random.RandomState(7)
    rows = []
    for g in (1, 2):
        for i, v in enumerate(rng.randn(21) if g == 1 else [5.0] * 9):
            rows.append((g * 100 + i, g, float(v)))
    rows.append((199, 1, 1000.0))   # spike in group 1
    rows.append((198, 1, None))     # NULL value
    df = spark.createDataFrame(rows, "event_id: long, user_id: long, value: double")

    got = {
        r.event_id: (r.med, r.mad, r.robust_z)
        for r in robust_zscore(df, "value", ["user_id"]).collect()
    }
    g1 = np.array([v for (_, g, v) in rows if g == 1 and v is not None])
    med = float(np.median(g1))
    mad = float(np.median(np.abs(g1 - med)))
    for (eid, g, v) in rows:
        if g != 1:
            assert got[eid] == (5.0, 0.0, None)       # MAD-degenerate group
        elif v is None:
            assert got[eid][2] is None
        else:
            assert got[eid] == (
                med, mad, round((v - med) / (1.4826 * mad), 6)
            ), eid
    assert abs(got[199][2]) > 100 > abs(got[100][2])  # robust to the spike

    with __import__("pytest").raises(ValueError, match="group_cols"):
        robust_zscore(df, "value", [])


def test_equidepth_histogram_matches_numpy(spark):
    """r10: equi-depth bins vs numpy percentile edges + manual binning
    (value <= edge goes left); ties bunch; NULLs excluded; grouped mode;
    bins validation."""
    import numpy as np

    from quackosm_spark.operators.stats import equidepth_histogram

    rng = np.random.RandomState(3)
    vals = [float(v) for v in rng.randn(97)] + [None, None]
    ties = [1.0] * 40 + [2.0] * 10
    rows = [(i, 1, v) for i, v in enumerate(vals)]
    rows += [(1000 + i, 2, v) for i, v in enumerate(ties)]
    df = spark.createDataFrame(rows, "event_id: long, user_id: long, value: double")

    got = {
        (r.user_id, r.bin): (r.lo, r.hi, r.n)
        for r in equidepth_histogram(df, "value", ["user_id"], bins=4).collect()
    }
    for g, data in ((1, [v for v in vals if v is not None]), (2, ties)):
        x = np.array(data, dtype=float)
        edges = [float(np.percentile(x, 100 * i / 4, method="linear"))
                 for i in (1, 2, 3)]
        bins = {}
        for v in x:
            b = sum(v > e for e in edges)
            bins[b] = bins.get(b, 0) + 1
        for b, n in bins.items():
            lo = round(edges[b - 1], 6) if b >= 1 else None
            hi = round(edges[b], 6) if b <= 2 else None
            assert got[(g, b)] == (lo, hi, n), (g, b)
        assert sum(n for (gg, _), (_, _, n) in got.items() if gg == g) == len(x)

    with __import__("pytest").raises(ValueError, match="bins"):
        equidepth_histogram(df, "value", bins=1)


def test_normalized_duplicates_catches_reformatted_copies(spark):
    """r10: case/punctuation/whitespace variants collapse to one group;
    byte-exact dedup misses them; genuinely different texts don't
    collapse."""
    from quackosm_spark.operators.dedup import (
        exact_duplicates,
        normalized_duplicates,
    )

    rows = [
        (1, "The quick brown fox."),
        (2, "the  quick   BROWN fox"),
        (3, "the,quick;brown!fox"),
        (4, "a different document"),
        (5, "a different document"),   # byte-exact pair
        (6, "the slow brown fox."),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    norm = {
        r.keep_id: r.n_docs for r in normalized_duplicates(df).collect()
    }
    assert norm == {1: 3, 4: 2}
    byte = {r.keep_id: r.n_docs for r in exact_duplicates(df).collect()}
    assert byte == {4: 2}


def test_group_keywords_tfidf(spark):
    """r10: per-group tf·idf keyword ranking vs hand math — a word in
    every group scores 0; the group-specific word wins; ties break to
    word ascending."""
    import math

    from quackosm_spark.operators.text import group_keywords

    rows = [
        (1, "a", "common spark spark spark"),
        (2, "a", "common alpha"),
        (3, "b", "common duck duck"),
        (4, "c", "common zeta zeta"),
    ]
    df = spark.createDataFrame(rows, "doc_id: long, source: string, text: string")
    got = {
        (r.source, r.rank): (r.word, r.n, r.score)
        for r in group_keywords(df, top_k=2).collect()
    }
    ln3 = math.log(3.0)
    assert got[("a", 1)] == ("spark", 3, round(3 * ln3, 6))
    assert got[("a", 2)] == ("alpha", 1, round(ln3, 6))
    assert got[("b", 1)] == ("duck", 2, round(2 * ln3, 6))
    # 'common' appears in all groups -> score exactly 0, ranks below
    # every group-specific word but still fills the top-k
    assert got[("b", 2)] == ("common", 1, 0.0)
    assert got[("c", 1)] == ("zeta", 2, round(2 * ln3, 6))


def test_image_channel_stats_real_decode(spark):
    """r10: per-image channel means through the REAL pure-numpy PPM and
    BMP decoders (strict=True) match the synthesizer's closed-form
    colors — including the BMP BGR swap and row padding; junk payloads
    raise the honest NotImplementedError in strict mode."""
    import pytest

    from quackosm_spark.operators import multimodal as M

    media = M.synthesize_solid_images(spark, 30)
    got = {
        r.media_id: (r.n_pixels, r.mean_r, r.mean_g, r.mean_b, r.brightness)
        for r in M.image_channel_stats(media, strict=True).collect()
    }
    assert len(got) == 30
    for i in range(30):
        r, g, b = (i * 37) % 256, (i * 59) % 256, (i * 83) % 256
        w, h = 4 + i % 3, 3 + i % 2
        assert got[i] == (
            w * h, float(r), float(g), float(b), round((r + g + b) / 3, 6)
        ), i

    junk = spark.createDataFrame(
        [(0, "image", b"\x89PNG not really", "image/png", 1, 1, None)],
        M.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception, match="NotImplementedError|codecs"):
        M.image_channel_stats(junk, strict=True).collect()
    # non-strict: the deterministic fake path yields a full row anyway
    assert M.image_channel_stats(junk, strict=False).count() == 1


def test_pq_path_spreads_narrow_corpus(spark):
    """r10: pq_encode/pq_adc_topk must not let a single-partition corpus
    serialize the ADC scan on one task (the q137 IVF starvation class) —
    the codes table leaves with cluster parallelism; an at-scale input
    passes through untouched (no added shuffle)."""
    import numpy as np

    from quackosm_spark.operators import similarity as S

    rng = np.random.RandomState(4)
    rows = [(i, [float(x) for x in p]) for i, p in enumerate(rng.randn(120, 8))]
    narrow = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>").coalesce(1)
    books = S.train_pq_codebooks(narrow, m=2, k=4)
    target = spark.sparkContext.defaultParallelism
    codes = S.pq_encode(narrow, books)
    assert codes.rdd.getNumPartitions() >= target
    wide = spark.createDataFrame(rows, "vec_id: long, embedding: array<double>").repartition(target + 3)
    assert S.pq_encode(wide, books).rdd.getNumPartitions() == target + 3


def test_spread_probe_memoized_per_frame(spark):
    """r11: _spread probes a frame's partition count ONCE — repeat calls
    on the same DataFrame object reuse the memoized verdict (no repeat
    RDD materialization) and still return the same spread decision."""
    from unittest import mock

    from quackosm_spark.operators import dedup as D

    narrow = spark.range(10).coalesce(1)
    target = spark.sparkContext.defaultParallelism
    assert D._spread(narrow).rdd.getNumPartitions() >= target
    assert D._SPREAD_MEMO.get(narrow) is True
    with mock.patch.object(
        type(narrow), "rdd", new_callable=mock.PropertyMock
    ) as rdd_prop:
        out = D._spread(narrow)  # must not touch .rdd again
        rdd_prop.assert_not_called()
    assert out.rdd.getNumPartitions() >= target

    wide = spark.range(10).repartition(target + 1)
    assert D._spread(wide) is wide
    assert D._SPREAD_MEMO.get(wide) is False


def test_drop_duplicate_segments_first_occurrence_wins(spark):
    """r10: a segment shared by several docs survives only in the
    earliest (id, pos); later copies are cut and survivors re-join in
    order; all-duplicate docs come back as empty husks; unlike
    remove_frequent_segments the first copy is PRESERVED."""
    from quackosm_spark.operators.dedup import drop_duplicate_segments

    dup = "alpha beta gamma"
    rows = [
        (1, f"{dup} one two three"),
        (2, f"zero cool one {dup}"),      # stride-ALIGNED dup -> cut
        (3, dup),                          # all-duplicate -> husk
        (4, "totally original words here"),
        (5, ""),                           # empty in, empty out
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {
        r.doc_id: (r.text_clean, r.n_kept)
        for r in drop_duplicate_segments(df, seg_words=3).collect()
    }
    assert got[1] == (f"{dup} one two three", 2)
    assert got[2] == ("zero cool one", 1)
    assert got[3] == ("", 0)
    assert got[4] == ("totally original words here", 2)
    assert got[5] == ("", 0)

    # line mode: content-anchored boundaries dedup at ANY offset
    lrows = [
        (1, "unique first line\nshared boilerplate footer"),
        (2, "another opening line\n  shared boilerplate footer  \nclosing"),
        (3, "shared boilerplate footer"),
    ]
    ldf = spark.createDataFrame(lrows, "doc_id: long, text: string")
    lgot = {
        r.doc_id: (r.text_clean, r.n_kept)
        for r in drop_duplicate_segments(ldf, by_lines=True).collect()
    }
    assert lgot[1] == ("unique first line shared boilerplate footer", 2)
    assert lgot[2] == ("another opening line closing", 2)
    assert lgot[3] == ("", 0)


def test_remove_repeated_substrings_arbitrary_offsets(spark):
    """r11: the n-gram inverted index catches a passage copied at a
    SHIFTED word offset — the case drop_duplicate_segments' default
    stride-aligned mode provably misses — plus in-document repetition,
    short-doc passthrough, and empty-doc husks."""
    from quackosm_spark.operators.dedup import (
        drop_duplicate_segments,
        remove_repeated_substrings,
    )

    passage = "p1 p2 p3 p4 p5 p6"
    rows = [
        (1, "u1 u2 " + passage),          # first home of the passage
        (2, "v1 v2 v3 " + passage + " v4"),  # same passage, offset 3
        (3, "x1 x2 x3 x4 x1 x2 x3 x4"),   # in-document repeat
        (4, "short doc"),                  # < window words: passthrough
        (5, ""),                           # empty husk
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")

    got = {
        r.doc_id: (r.text_clean, r.n_removed)
        for r in remove_repeated_substrings(df, window=4).collect()
    }
    assert got == {
        1: ("u1 u2 " + passage, 0),
        2: ("v1 v2 v3 v4", 6),
        3: ("x1 x2 x3 x4", 4),
        4: ("short doc", 0),
        5: ("", 0),
    }

    # the stride-aligned default mode misses the offset copy entirely:
    # doc 2 re-segments as (v1 v2 v3 p1)(p2 p3 p4 p5)(p6 v4), none of
    # which equals a doc-1 segment
    seg = {
        r.doc_id: r.text_clean
        for r in drop_duplicate_segments(
            df.where(F.col("doc_id").isin(1, 2)), seg_words=4
        ).collect()
    }
    assert seg[2] == "v1 v2 v3 " + passage + " v4"  # nothing removed

    import pytest as _pytest

    with _pytest.raises(ValueError):
        remove_repeated_substrings(df, window=1)


def test_psl_loader_and_resolver(spark, tmp_path):
    """r11: a supplied PSL file drives full registered-domain semantics —
    example.com.sa-class 2-level registries, 3-level rules, wildcard
    rules, exception rules — and its 2-level subset slots into the
    Column-heuristic API unchanged."""
    from quackosm_spark.operators.dedup import (
        load_public_suffix_list,
        registered_domain,
        resolve_registered_domain,
    )

    psl = tmp_path / "psl.dat"
    psl.write_text(
        "// ===BEGIN ICANN DOMAINS===\n"
        "com\n"
        "sa\n"
        "com.sa\n"
        "id\n"
        "co.id\n"
        "jp\n"
        "pref.aichi.jp\n"
        "*.ck\n"
        "!www.ck\n"
        "// ===END ICANN DOMAINS===\n"
    )
    rules = load_public_suffix_list(psl)
    assert rules.exact == {
        "com", "sa", "com.sa", "id", "co.id", "jp", "pref.aichi.jp"
    }
    assert rules.wildcard == {"ck"}
    assert rules.exception == {"www.ck"}
    assert rules.two_level_suffixes == ("co.id", "com.sa")
    assert rules.max_labels == 3

    cases = [
        # (url, expected registered domain)
        ("https://a.b.example.com.sa/x", "example.com.sa"),
        ("http://example.co.id", "example.co.id"),
        ("https://www.example.com/p", "example.com"),       # www via PSL
        ("https://deep.sub.example.pref.aichi.jp", "example.pref.aichi.jp"),
        ("https://foo.bar.ck/", "foo.bar.ck"),              # *.ck wildcard
        ("https://www.ck/", "www.ck"),                      # !www.ck
        # exception rule prevails: suffix=ck, registered=www.ck, and
        # sub.www.ck is a subdomain of it
        ("https://sub.www.ck/", "www.ck"),
        ("https://unlisted.zz", "unlisted.zz"),             # implicit '*'
        ("https://a.unlisted.zz", "unlisted.zz"),
        ("http://192.168.0.1:8080/x", "192.168.0.1"),
        ("https://com.sa/", "com.sa"),                      # host IS a suffix
        (None, None),
    ]
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(cases)], "i: long, url: string"
    )
    got = {
        r.i: r.domain
        for r in resolve_registered_domain(df, rules).collect()
    }
    for i, (u, want) in enumerate(cases):
        assert got[i] == want, f"{u!r}: {got[i]!r} != {want!r}"

    # the 2-level subset feeds the Column heuristic directly
    heur = {
        r.i: r.d
        for r in df.select(
            "i",
            registered_domain(
                "url", two_level_suffixes=rules.two_level_suffixes
            ).alias("d"),
        ).collect()
    }
    assert heur[0] == "example.com.sa"
    assert heur[1] == "example.co.id"


def test_memos_are_session_scoped_not_id_keyed(spark):
    """r12 (VERDICT r11 #7): the reader-frame and _spread plan memos hang
    on the session OBJECT, so a stopped/GC'd session takes its entries
    with it and a new session can never alias a dead session's frames
    (the id()-reuse footgun of the old module-level dicts)."""
    import types

    import __spark_entry__ as entry
    from quackosm_spark.operators import dedup as D

    df = entry._t(spark, "/root/testdata/sf0.001", "region")
    assert spark._quackosm_read_memo["/root/testdata/sf0.001/region.parquet"] is df
    # same path, same session → same frame object (the memo hit path)
    assert entry._t(spark, "/root/testdata/sf0.001", "region") is df

    # a different session object gets an independent, empty memo even if
    # it were allocated at the dead session's address — the key is the
    # attribute, not id()
    fake = types.SimpleNamespace()
    assert entry._read_memo(fake) == {}
    assert entry._read_memo(fake) is fake._quackosm_read_memo
    assert D._spread_plan_memo(fake) == {}
    assert fake._quackosm_spread_memo is not D._spread_plan_memo(spark)


def test_shingle_pair_threshold_above_one_is_empty_in_both_regimes(spark, monkeypatch):
    """ADVICE r11: threshold > 1 is nonsensical but must degrade to an
    empty result in the prefix regime (negative slice length used to
    raise) exactly as the broadcast regime does."""
    from quackosm_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "the quick brown fox leaps")],
        "doc_id: long, text: string",
    )
    monkeypatch.setenv("SPARK_GRAFT_SHINGLE_BROADCAST_CAP", "0")  # force prefix
    assert ngram_jaccard_pairs(docs, shingle=3, threshold=1.5).count() == 0
    monkeypatch.delenv("SPARK_GRAFT_SHINGLE_BROADCAST_CAP")
    assert ngram_jaccard_pairs(docs, shingle=3, threshold=1.5).count() == 0


def test_plan_size_bytes_degrades_to_prefix_regime(spark):
    """ADVICE r11: on a DataFrame without py4j internals (Spark Connect),
    _plan_size_bytes returns "infinitely large" instead of raising, so
    the regime gate picks the always-correct prefix plan."""
    import types

    from quackosm_spark.operators import dedup as D

    assert D._plan_size_bytes(types.SimpleNamespace()) == 2**63 - 1


def test_broadcast_cap_env_validation():
    """ADVICE r11: a malformed cap env var raises a clear message."""
    import os

    import pytest

    from quackosm_spark.operators import dedup as D

    os.environ["SPARK_GRAFT_SHINGLE_BROADCAST_CAP"] = "eight-megabytes"
    try:
        with pytest.raises(ValueError, match="SPARK_GRAFT_SHINGLE_BROADCAST_CAP"):
            D._unguarded_broadcast_cap()
    finally:
        del os.environ["SPARK_GRAFT_SHINGLE_BROADCAST_CAP"]
