"""Differential tests: the new distributed operators vs naive pure-Python
reference implementations on seeded random corpora (the oracle harness
covers the DuckDB comparison; these sweep different shapes/parameters)."""

from __future__ import annotations

import math
import random

import pytest
from pyspark.sql import functions as F

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]


def _random_docs(seed: int, n: int = 60):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        length = rng.randint(0, 12)
        out.append((i, " ".join(rng.choice(WORDS) for _ in range(length))))
    return out


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_edit_distance_pairs_matches_bruteforce(spark, seed):
    from quackosm_spark.operators.dedup import edit_distance_pairs

    docs = _random_docs(seed)
    # short random strings over a tiny alphabet of words → plenty of pairs
    # within distance 6, across many length bands
    max_dist = 6
    expected = {
        (a_id, b_id): _lev(a, b)
        for a_id, a in docs
        for b_id, b in docs
        if a_id < b_id and _lev(a, b) <= max_dist
    }
    d = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {(r.id_a, r.id_b): r.dist
           for r in edit_distance_pairs(d, max_dist=max_dist).collect()}
    assert got == expected


@pytest.mark.parametrize("seed,min_docs,seg_words", [(7, 2, 2), (8, 3, 3), (9, 2, 4)])
def test_remove_frequent_segments_matches_reference(spark, seed, min_docs, seg_words):
    from quackosm_spark.operators.dedup import remove_frequent_segments

    docs = _random_docs(seed, n=40)

    def segments(text):
        w = text.split()
        return [(" ".join(w[i:i + seg_words]), i) for i in range(0, len(w), seg_words)]

    df_count: dict[str, set] = {}
    for did, text in docs:
        for seg, _ in segments(text):
            df_count.setdefault(seg, set()).add(did)
    boiler = {s for s, ids in df_count.items() if len(ids) >= min_docs}
    expected = {}
    for did, text in docs:
        kept = [s for s, _ in segments(text) if s not in boiler]
        expected[did] = (" ".join(kept), len(kept))

    d = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    out = remove_frequent_segments(d, seg_words=seg_words, min_docs=min_docs)
    got = {r.doc_id: (r.text_clean, r.n_kept) for r in out.collect()}
    assert got == expected


@pytest.mark.parametrize("seed", [11, 12])
def test_bm25_matches_pure_python(spark, seed):
    from quackosm_spark.operators.search import bm25_scores

    docs = _random_docs(seed, n=50)
    terms = ["alpha", "zeta"]
    k1, b = 1.2, 0.75
    toks = {i: t.split() for i, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    expected = {}
    for did, words in toks.items():
        score, matched = 0.0, 0
        for t in terms:
            tf = words.count(t)
            df = sum(1 for v in toks.values() if t in v)
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            if tf > 0:
                matched += 1
            score += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(words) / avgdl))
        if matched:
            expected[did] = (round(score, 4), matched)

    d = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    got = {r.doc_id: (r.score, r.n_matched)
           for r in bm25_scores(d, terms).collect()}
    assert set(got) == set(expected)
    for did in expected:
        assert got[did][1] == expected[did][1]
        assert got[did][0] == pytest.approx(expected[did][0], abs=2e-4)


@pytest.mark.parametrize("seed", [21, 22])
def test_semantic_dedup_matches_bruteforce(spark, seed):
    from quackosm_spark.operators.dedup import semantic_dedup

    rng = random.Random(seed)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(8)], rng.randrange(3))
        for i in range(40)
    ]

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(dot / (na * nb), 6)

    thr = 0.5
    dropped = {
        b_id
        for a_id, a, ca in rows
        for b_id, b, cb in rows
        if a_id < b_id and ca == cb and cos(a, b) >= thr
    }
    expected = sorted(i for i, _, _ in rows if i not in dropped)

    emb = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>, label INT")
    got = sorted(r.vec_id for r in semantic_dedup(emb, "label", threshold=thr).collect())
    assert got == expected


@pytest.mark.parametrize("seed", [31, 32])
def test_verify_candidate_pairs_matches_python_jaccard(spark, seed):
    from quackosm_spark.operators.dedup import verify_candidate_pairs

    docs = _random_docs(seed, n=30)
    ids = [i for i, t in docs if t]
    rng = random.Random(seed)
    cand = sorted({(a, b) for a, b in
                   (sorted(rng.sample(ids, 2)) for _ in range(40)) if a != b})

    def shingles(t):
        t = t.lower()
        if len(t) <= 5:
            return {t[:5]} if t else set()
        return {t[i:i + 5] for i in range(len(t) - 4)}

    texts = dict(docs)
    expected = {}
    for a, b in cand:
        sa, sb = shingles(texts[a]), shingles(texts[b])
        if sa and sb:
            j = round(len(sa & sb) / len(sa | sb), 6)
            if j >= 0.3:
                expected[(a, b)] = j

    d = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    pairs = spark.createDataFrame(cand, "doc_a LONG, doc_b LONG")
    got = {(r.doc_a, r.doc_b): r.jaccard
           for r in verify_candidate_pairs(d, pairs, min_jaccard=0.3).collect()}
    assert got == expected


@pytest.mark.parametrize("seed,threshold", [(11, 0.5), (12, 0.3), (13, 0.8)])
def test_prefix_jaccard_matches_bruteforce(spark, seed, threshold):
    """Prefix-filter blocking must be invisible: exact same pair set +
    jaccard values as the O(n^2) all-pairs reference."""
    from quackosm_spark.operators.dedup import prefix_jaccard_pairs

    docs = _random_docs(seed, n=50)
    sets = {i: set(t.lower().split()) for i, t in docs if t.strip()}
    expected = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter / union >= threshold:
                expected[(a, b)] = round(inter / union, 6)

    df = spark.createDataFrame(docs, "doc_id: long, text: string")
    got = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in prefix_jaccard_pairs(df, threshold=threshold).collect()
    }
    assert got == pytest.approx(expected)


@pytest.mark.parametrize("seed", [11, 12])
def test_bpe_tokens_match_python_reference_random(spark, seed):
    """r03: the Column replace-chain BPE apply vs a per-word python BPE
    on random corpora (merges trained on the same corpus)."""
    import re

    from quackosm_spark.operators.text import (
        _BPE_NORMALIZE_RE,
        bpe_tokens,
        train_bpe_merges,
    )

    docs_rows = _random_docs(seed, n=40)
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")
    merges = train_bpe_merges(docs, n_merges=12, order_col="doc_id")

    def py_apply(text):
        norm = re.sub(_BPE_NORMALIZE_RE, " ", (text or "").lower())
        toks_all = []
        for w in norm.split():
            toks = list(w)
            for a, b in merges:
                out, i = [], 0
                while i < len(toks):
                    if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(toks[i])
                        i += 1
                toks = out
            toks_all.extend(toks)
        return toks_all

    got = {
        r["doc_id"]: r["t"]
        for r in docs.select(
            "doc_id", bpe_tokens(F.col("text"), merges).alias("t")
        ).collect()
    }
    for doc_id, text in docs_rows:
        assert got[doc_id] == py_apply(text), (doc_id, text)


@pytest.mark.parametrize("seed", [21, 22])
def test_oov_and_bigram_match_bruteforce(spark, seed):
    import collections

    from quackosm_spark.operators.text import bigram_logprob, oov_rate

    docs_rows = _random_docs(seed, n=50)
    docs = spark.createDataFrame(docs_rows, "doc_id long, text string")

    toks = {i: t.split() for i, t in docs_rows}
    counts = collections.Counter(w for ws in toks.values() for w in ws)
    vocab = {
        w
        for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    }
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_oov"])
        for r in oov_rate(docs, vocab_size=4).collect()
    }
    for i, ws in toks.items():
        if not ws:
            assert i not in got
            continue
        assert got[i] == (len(ws), sum(1 for w in ws if w not in vocab)), i

    bigrams = collections.Counter()
    prefixes = collections.Counter()
    for ws in toks.values():
        for a, b in zip(ws, ws[1:]):
            bigrams[(a, b)] += 1
            prefixes[a] += 1
    v = len(counts)
    got_bg = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in bigram_logprob(docs, k=1.0).collect()
    }
    for i, ws in toks.items():
        if len(ws) < 2:
            assert i not in got_bg
            continue
        logs = [
            math.log((bigrams[(a, b)] + 1.0) / (prefixes[a] + v))
            for a, b in zip(ws, ws[1:])
        ]
        assert got_bg[i][0] == len(logs)
        assert got_bg[i][1] == pytest.approx(
            round(sum(logs) / len(logs), 4), abs=1e-4
        ), i
