"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in Column functions (JVM-side, codegen) —
no Python UDFs — so they scale to 100 TB of documents unchanged. Each
operator's formula is deliberately expressible in ANSI SQL so the DuckDB
oracle can verify it bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword language-ID
# heuristic. Deliberately small + deterministic (shared with the SQL oracle).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "is"],
    "es": ["el", "la", "de", "que", "los"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "zh": ["的", "是", "了", "在", "和"],
}

# Modulus small enough that h*31 + c never overflows int64 under ANSI SQL
# (h < 2^30, h*31 + c < 2^36).
FINGERPRINT_MOD = 1000000007


def token_count(text: Column | str = "text") -> Column:
    """Whitespace token count (the cheap tokenizer)."""
    col = F.col(text) if isinstance(text, str) else text
    trimmed = F.trim(col)
    return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def bpe_ish_token_count(text: Column | str = "text") -> Column:
    """BPE-flavored token estimate: runs of word chars count ceil(len/4),
    each punctuation char counts 1. Pure Column arithmetic."""
    col = F.col(text) if isinstance(text, str) else text
    word_chars = F.length(F.regexp_replace(col, r"[^0-9A-Za-z]", ""))
    punct_chars = F.length(F.regexp_replace(col, r"[0-9A-Za-z\s]", ""))
    return (F.ceil(word_chars / F.lit(4.0)) + punct_chars).cast("bigint")


def quality_score(text: Column | str = "text") -> Column:
    """Heuristic quality in [0,1]: length score x alpha ratio x
    (1 - punctuation ratio). Deterministic, SQL-replicable."""
    col = F.col(text) if isinstance(text, str) else text
    n = F.length(col)
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    alpha_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(col, r"[^A-Za-z ]", "")) / n
    )
    punct_ratio = F.when(n == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(col, r"[0-9A-Za-z\s]", "")) / n
    )
    return F.round(length_score * alpha_ratio * (1.0 - punct_ratio), 6)


def language_id(text: Column | str = "text") -> Column:
    """Stopword-marker language ID: argmax over per-language marker hits.

    Ties break by language code order ('de' < 'en' < 'es' < 'fr' < 'zh');
    zero hits → 'und'. The scoring is a fixed arithmetic expression so the
    DuckDB oracle reproduces it exactly (see language_id_sql)."""
    col = F.col(text) if isinstance(text, str) else text
    tokens = F.split(F.lower(col), r"\s+")
    def _marker_test(markers):
        # factory keeps the lambda single-arg (default args would change the
        # arity Spark infers for higher-order functions)
        return lambda t: F.array_contains(markers, t)

    scores = []
    for lang in sorted(LANG_MARKERS):
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        hits = F.size(F.filter(tokens, _marker_test(markers)))
        scores.append((lang, hits))
    # deterministic argmax: sort (−hits, lang) structs, take the head
    pairs = F.array(
        *[F.struct((-hits).alias("neg"), F.lit(lang).alias("lang")) for lang, hits in scores]
    )
    top = F.sort_array(pairs)[0]
    return F.when(-top["neg"] > 0, top["lang"]).otherwise(F.lit("und"))


def language_id_sql(text_expr: str = "text") -> str:
    """DuckDB SQL replica of language_id (same tie-break, same markers)."""
    structs = []
    for lang in sorted(LANG_MARKERS):
        markers = ",".join(f"'{m}'" for m in LANG_MARKERS[lang])
        hits = (
            f"len(list_filter(string_split_regex(lower({text_expr}), '\\s+'),"
            f" t -> list_contains([{markers}], t)))"
        )
        structs.append(f"{{'neg': -({hits}), 'lang': '{lang}'}}")
    arr = f"list_sort([{', '.join(structs)}])"
    return (
        f"CASE WHEN -({arr}[1].neg) > 0 THEN {arr}[1].lang ELSE 'und' END"
    )


def fingerprint(text: str = "text") -> Column:
    """Deterministic 61-bit rolling polynomial document fingerprint:
    fold(h*31 + codepoint mod 2^61-1) over characters — pure Column
    ``aggregate``, reproducible in DuckDB via list_reduce.

    ``text`` is a column name (the expression composes via Spark SQL)."""
    return F.expr(
        f"aggregate(transform(split({text}, ''), c -> ascii(c)),"
        f" CAST(0 AS BIGINT), (h, c) -> pmod(h * 31 + c, {FINGERPRINT_MOD}))"
    )


def fingerprint_sql(text_expr: str = "text") -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT),"
        f" list_transform(string_split({text_expr}, ''), c -> ascii(c)::BIGINT)),"
        f" (h, c) -> (h * 31 + c) % {FINGERPRINT_MOD})"
    )


def analyze_documents(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-pass text analysis projection (all JVM-side): token counts,
    quality, language, fingerprint, repetition, PII counts."""
    return docs.select(
        "*",
        token_count(text_col).alias("n_tokens"),
        bpe_ish_token_count(text_col).alias("n_bpe_tokens"),
        quality_score(text_col).alias("quality"),
        language_id(text_col).alias("lang_pred"),
        fingerprint(text_col).alias("fingerprint"),
        repetition_ratio(text_col).alias("rep_ratio"),
        *pii_counts(text_col),
    )


def filter_quality(
    docs: DataFrame,
    text_col: str = "text",
    min_quality: float = 0.1,
    max_repetition: float = 0.5,
    min_tokens: int = 10,
    max_pii: int | None = None,
    langs: list[str] | None = None,
) -> DataFrame:
    """Compose the quality signals into one scan-stage predicate — the
    standard pre-training corpus filter. Pure Column expressions: no
    shuffle, pushes toward the scan, embarrassingly parallel at 100 TB."""
    pred = (
        (quality_score(text_col) >= min_quality)
        & (repetition_ratio(text_col) <= max_repetition)
        & (token_count(text_col) >= min_tokens)
    )
    if max_pii is not None:
        total_pii = None
        for c in pii_counts(text_col):
            total_pii = c if total_pii is None else total_pii + c
        pred = pred & (total_pii <= max_pii)
    if langs:
        pred = pred & language_id(text_col).isin(langs)
    return docs.where(pred)


def sliding_word_ngrams(text: Column | str = "text", n: int = 5) -> Column:
    """All (non-distinct) word n-grams of a document as an array<string> —
    JVM Column expressions only (split → sliding windows via
    transform(sequence))."""
    col = F.col(text) if isinstance(text, str) else text
    words = F.split(F.trim(col), r"\s+")

    # the split is LET-BOUND once through a 1-element transform: HOF
    # lambda bodies are interpreted, so inlining `words` in the per-gram
    # slice re-splits the whole document per element — O(words²) work
    # per document (same fix as dedup._shingles_sql, measured 2-3×)
    def grams(w: Column) -> Column:
        count = F.greatest(F.size(w) - (n - 1), F.lit(0))
        idx = F.sequence(F.lit(1), F.greatest(count, F.lit(1)))
        return F.when(count > 0, F.transform(
            idx, lambda i: F.concat_ws(" ", F.slice(w, i, n))
        )).otherwise(F.array().cast("array<string>"))

    return F.transform(F.array(words), grams).getItem(0)


def word_ngrams(text: Column | str = "text", n: int = 5) -> Column:
    """Distinct word n-grams of a document as an array<string>."""
    return F.array_distinct(sliding_word_ngrams(text, n))


def repetition_ratio(text: Column | str = "text", n: int = 3) -> Column:
    """Within-document repetition: fraction of word n-grams that are
    repeats of an earlier n-gram (1 − distinct/total). The classic
    Gopher/RefinedWeb quality signal for boilerplate-heavy or degenerate
    documents; 0.0 for docs with no n-grams."""
    grams = sliding_word_ngrams(text, n)
    total = F.size(grams)
    return F.when(total == 0, F.lit(0.0)).otherwise(
        F.round(F.lit(1.0) - F.size(F.array_distinct(grams)) / total, 6)
    )


# PII patterns chosen to behave identically under Java regex (Spark) and
# RE2 (DuckDB regexp_extract_all): no backrefs, no lookaround.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "phone": r"\+[0-9]{7,15}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_counts(text: Column | str = "text") -> list[Column]:
    """Per-pattern PII match counts (n_email, n_phone, n_ipv4) — built-in
    ``regexp_count``, JVM-side."""
    col = F.col(text) if isinstance(text, str) else text
    return [
        F.regexp_count(col, F.lit(pat)).alias(f"n_{name}")
        for name, pat in PII_PATTERNS.items()
    ]


def redact_pii(text: Column | str = "text", replacement: str = "[PII]") -> Column:
    """Replace every PII match with ``replacement`` (chained
    regexp_replace — one pass per pattern family)."""
    col = F.col(text) if isinstance(text, str) else text
    for pat in PII_PATTERNS.values():
        col = F.regexp_replace(col, pat, replacement)
    return col


def frequent_ngrams(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_docs: int = 10,
) -> DataFrame:
    """Boilerplate-phrase detection: word n-grams appearing in at least
    ``min_docs`` distinct documents (the corpus-cleaning primitive used to
    strip shared headers/footers/templates before training).

    One shuffle on the n-gram; per-doc distinct n-grams mean the count IS
    the document frequency — no COUNT(DISTINCT) needed."""
    return (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"),
        )
        .groupBy("ngram")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def unigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus-trained unigram LM score — the perplexity-style quality
    signal: avg ln P(w) per document under the corpus's own unigram
    distribution (degenerate/outlier docs score low). Returns
    (doc_id, avg_logprob); empty docs emit no row.

    Two passes: (1) vocabulary term counts, (2) join the counts back and
    average ln(cnt/total) per doc. The score join is co-keyed on the word
    with NO broadcast hint (r06, same reasoning as `bigram_logprob`): a
    web-scale vocabulary reaches 10⁸+ distinct words and a forced
    broadcast is an executor OOM AQE cannot undo — AQE localizes the join
    only when the runtime vocab size actually fits. The corpus total
    rides along as a 1-row broadcast computed in the SAME plan (no
    separate driver action). The compact per-doc token ARRAY is PERSISTED
    before exploding (r07): the token rows feed two different exchanges
    (vocab aggregate, score probe) that Spark cannot deduplicate — the
    cache keeps the tokenizer to one corpus pass. Cache lifecycle is
    caller-owned (see README "Cache lifecycle"); callers that persist
    the RESULT and run their own action can release the token cache via
    ``_unigram_logprob_cached`` instead (``logprob_band_filter`` does).
    """
    scored, _cache = _unigram_logprob_cached(docs, id_col, text_col)
    return scored


def _unigram_logprob_cached(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> tuple[DataFrame, DataFrame]:
    """`unigram_logprob` plus a handle to its internal token-array cache,
    so operators that materialize the scored frame themselves (e.g.
    ``logprob_band_filter``'s cutoff aggregate) can ``unpersist()`` the
    inner cache and leave at most ONE cached frame per call."""
    from pyspark import StorageLevel

    doc_words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("__ws"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    words = doc_words.select("doc_id", F.explode("__ws").alias("w"))
    vocab = words.groupBy("w").agg(F.count("*").cast("double").alias("cnt"))
    total_df = vocab.agg(F.sum("cnt").alias("_total"))
    scored = (
        words.join(vocab, "w")
        .join(F.broadcast(total_df))
        .groupBy("doc_id")
        .agg(
            F.round(F.avg(F.log(F.col("cnt") / F.col("_total"))), 4).alias(
                "avg_logprob"
            )
        )
    )
    return scored, doc_words


def chunk_documents(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Split documents into fixed-size overlapping character chunks (the
    RAG / context-window preparation step).

    Chunk ``i`` covers characters ``[i*stride, i*stride + size)``; the last
    chunk is allowed to be short. A document of length ``n > 0`` yields
    ``floor((n-1)/stride) + 1`` chunks, so every character belongs to at
    least one chunk and consecutive chunks overlap by ``size - stride``
    characters. Empty documents yield no chunks.

    Scale shape: pure Column expressions — ``sequence`` + ``explode`` +
    ``substring`` run inside whole-stage codegen with NO shuffle; output
    partitioning inherits the scan, so chunking 100 TB is a map-only job.
    APPENDS (chunk_idx, chunk_text, chunk_len) to the id column.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    n = F.length(F.col(text_col))
    d = docs.where(n > 0).select(
        F.col(id_col),
        F.col(text_col),
        F.explode(
            F.sequence(F.lit(0), F.floor((n - F.lit(1)) / stride).cast("int"))
        ).alias("chunk_idx"),
    )
    chunk = F.substring(F.col(text_col), F.col("chunk_idx") * stride + 1, F.lit(size))
    return d.select(
        F.col(id_col),
        F.col("chunk_idx"),
        chunk.alias("chunk_text"),
        F.length(chunk).alias("chunk_len"),
    )


def novelty_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
) -> Column | DataFrame:
    """Corpus novelty signal: the fraction of a document's distinct word
    n-grams that appear in NO other document (df == 1). High novelty =
    unique content; near-zero = boilerplate / template / near-duplicate
    text — the aggregate complement of pairwise near-dedup.

    Two hash aggregations on the gram key (doc-distinct grams → corpus
    document frequencies → per-doc share), both map-side combinable.
    Returns (doc_id, n_grams, novelty); docs with no n-grams emit no row.

    The compact per-doc gram ARRAY is PERSISTED before exploding: the
    gram rows feed two different exchanges (the df aggregate and the
    join probe), which Spark cannot deduplicate as a ReusedExchange —
    without the cache the tokenizing regex re-runs over the corpus.
    Caching the arrays (docs-sized, not exploded-gram-sized) keeps the
    cache small while both explodes stay cheap JVM ops.
    """
    from pyspark import StorageLevel

    doc_grams = docs.select(
        F.col(id_col).alias("doc_id"),
        word_ngrams(F.col(text_col), n).alias("__grams"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    grams = doc_grams.select(
        "doc_id", F.explode("__grams").alias("ngram")
    )
    df_counts = grams.groupBy("ngram").agg(F.count("*").alias("df"))
    return (
        grams.join(df_counts, "ngram")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_grams"),
            F.round(
                F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                / F.count("*"),
                6,
            ).alias("novelty"),
        )
    )


def positional_ngrams(
    text: Column | str = "text", n: int = 10
) -> Column:
    """Array of structs (pos, gram) — the word n-gram STARTING at every
    token position. The position-aware sibling of ``sliding_word_ngrams``,
    for exact-substring dedup where *where* a repeat occurs matters."""
    text = F.col(text) if isinstance(text, str) else text
    words = F.filter(F.split(F.lower(F.trim(text)), r"\s+"), lambda w: w != "")
    k = F.size(words) - (n - 1)
    return F.when(k <= 0, F.array()).otherwise(
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.struct(
                i.alias("pos"),
                F.array_join(F.slice(words, i + 1, n), " ").alias("gram"),
            ),
        )
    )


def repeated_spans(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_occurrences: int = 2,
) -> DataFrame:
    """Position-level exact-substring repeat detection — the corpus-wide
    duplicated-span method of "Deduplicating Training Data Makes Language
    Models Better" (Lee et al. 2022), re-expressed for Spark: instead of a
    suffix array, every token position's n-gram is hashed into a
    corpus-wide inverted index; positions whose n-gram occurs
    ``min_occurrences``+ times anywhere (including intra-document) are the
    duplicated-span starts. Returns one row per duplicated position
    (doc_id, pos, n_occurrences) — consumers cut or down-weight the spans.

    Scale shape: ONE shuffle on the 64-bit gram hash (count), then a
    broadcast-free shuffle-join back to positions on the same key — both
    keyed identically, so AQE plans a single co-partitioned exchange pair.
    A hot gram (boilerplate) concentrates COUNTS, not pairs: unlike the
    pair-join dedups, output is linear in corpus positions, so there is no
    quadratic blowup to guard against. The per-doc (pos, gram-hash) array
    is PERSISTED before exploding (r07): the position rows feed the count
    aggregate and the probe join through different exchanges Spark cannot
    deduplicate — hashing into the compact array first means the
    tokenize+hash pass runs once and the cache carries 64-bit hashes, not
    gram strings.
    """
    from pyspark import StorageLevel

    hashed = F.transform(
        positional_ngrams(F.col(text_col), n),
        lambda s: F.struct(
            s["pos"].alias("pos"), F.xxhash64(s["gram"]).alias("gh")
        ),
    )
    dpos = docs.select(
        F.col(id_col).alias("doc_id"), hashed.alias("__pg")
    ).persist(StorageLevel.MEMORY_AND_DISK)
    pos = dpos.select("doc_id", F.explode("__pg").alias("pg")).select(
        "doc_id",
        F.col("pg.pos").alias("pos"),
        F.col("pg.gh").alias("gh"),
    )
    counts = pos.groupBy("gh").agg(F.count("*").alias("n_occurrences"))
    return (
        pos.join(counts, "gh")
        .where(F.col("n_occurrences") >= min_occurrences)
        .select("doc_id", "pos", "n_occurrences")
    )


def duplicated_token_fraction(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 10,
    min_occurrences: int = 2,
) -> DataFrame:
    """Per-document summary of ``repeated_spans``: the fraction of n-gram
    start positions that are corpus-wide repeats (0.0 for docs shorter
    than n tokens). The drop/keep signal of the exact-substring dedup
    recipe."""
    spans = (
        repeated_spans(docs, id_col, text_col, n, min_occurrences)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_dup_positions"))
    )
    totals = docs.select(
        F.col(id_col).alias("doc_id"),
        F.greatest(
            F.lit(0), F.size(positional_ngrams(F.col(text_col), n))
        ).alias("n_positions"),
    )
    return totals.join(spans, "doc_id", "left").select(
        "doc_id",
        "n_positions",
        F.coalesce("n_dup_positions", F.lit(0)).alias("n_dup_positions"),
        F.when(F.col("n_positions") == 0, F.lit(0.0))
        .otherwise(
            F.round(
                F.coalesce("n_dup_positions", F.lit(0))
                / F.col("n_positions"),
                6,
            )
        )
        .alias("dup_fraction"),
    )


# --------------------------------------------------------------------------
# Real BPE tokenization: sample-trained merges, broadcast-applied at scale
# --------------------------------------------------------------------------
#
# The classic large-corpus pattern: TRAIN the merge table driver-side on a
# small deterministic sample (BPE training is inherently sequential), then
# APPLY it distributed as a chain of literal substring replacements — pure
# Column ops, JVM-side codegen, zero Python in the hot path, and exactly
# replicable in ANSI SQL for the oracle.
#
# Apply semantics (documented contract): normalize to [a-z0-9 ]; each word
# becomes a sequence of single-char tokens rendered as "<c><c>..."; each
# merge (a, b), in training order, is ONE left-to-right non-overlapping
# pass replacing "<a><b>" with "<ab>". The bracket markers bound BOTH ends
# of every token, so a merge can never match a token-substring ("<a><b>"
# does not match inside "<xa><b>" or "<a><bc>") and consecutive repeats
# merge exactly like BPE's left-to-right scan ("<a><a><a><a>" -> two
# "<aa>"). This is the greedy ordered single-pass variant of BPE apply
# (canonical BPE re-scans earlier rules after later merges; the single-
# pass variant is deterministic, order-stable, and SQL-expressible).

_BPE_NORMALIZE_RE = r"[^a-z0-9 ]+"
_BPE_MARK_RE = r"([a-z0-9])"


def train_bpe_merges(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    sample_rows: int = 500,
    order_col: str | None = None,
) -> list[tuple[str, str]]:
    """Driver-side classic BPE training (Sennrich et al. 2016) on a
    deterministic sample: the ``sample_rows`` first rows by ``order_col``
    (falls back to the first column). Sampling is the scale story — merge
    tables converge on a tiny fraction of a 100 TB corpus, and the result
    broadcasts to ``bpe_*`` appliers as a plain list."""
    oc = order_col or docs.columns[0]
    if sample_rows <= 100_000:
        rows = (
            docs.select(F.col(text_col).alias("t"))
            .orderBy(oc)
            .limit(int(sample_rows))
            .collect()
        )
    else:
        # TakeOrderedAndProject preallocates a per-task priority queue of
        # the LIMIT's capacity — a "take everything" sample_rows (10^9)
        # OOMs every executor thread before a single row flows. Large
        # samples stream the global sort partition-by-partition instead.
        from itertools import islice

        it = (
            docs.select(F.col(text_col).alias("t"), F.col(oc).alias("o"))
            .orderBy("o")
            .toLocalIterator()
        )
        rows = list(islice(it, int(sample_rows)))
    import re as _re
    from collections import Counter

    word_freq: Counter = Counter()
    for r in rows:
        norm = _re.sub(_BPE_NORMALIZE_RE, " ", (r["t"] or "").lower())
        for w in norm.split():
            word_freq[tuple(w)] += 1

    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pair_freq: Counter = Counter()
        for word, freq in word_freq.items():
            for i in range(len(word) - 1):
                pair_freq[(word[i], word[i + 1])] += freq
        if not pair_freq:
            break
        # deterministic tie-break: highest count, then lexicographic
        (a, b), cnt = min(
            pair_freq.items(), key=lambda kv: (-kv[1], kv[0])
        )
        if cnt < 2:
            break
        merges.append((a, b))
        merged: Counter = Counter()
        ab = a + b
        for word, freq in word_freq.items():
            out = []
            i = 0
            while i < len(word):
                if i + 1 < len(word) and word[i] == a and word[i + 1] == b:
                    out.append(ab)
                    i += 2
                else:
                    out.append(word[i])
                    i += 1
            merged[tuple(out)] += freq
        word_freq = merged
    return merges


def _bpe_marked(text: Column | str, merges: list[tuple[str, str]]) -> Column:
    col = F.col(text) if isinstance(text, str) else text
    s = F.regexp_replace(
        F.regexp_replace(F.lower(col), _BPE_NORMALIZE_RE, " "),
        _BPE_MARK_RE,
        r"<$1>",
    )
    for a, b in merges:
        s = F.replace(s, F.lit(f"<{a}><{b}>"), F.lit(f"<{a}{b}>"))
    return s


def bpe_token_count(
    text: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """Number of BPE tokens after applying ``merges`` — one '<' marker per
    token, counted as a length difference (no split/array allocation)."""
    s = _bpe_marked(text, merges)
    return (
        F.length(s) - F.length(F.replace(s, F.lit("<"), F.lit("")))
    ).cast("bigint")


def bpe_tokens(
    text: Column | str, merges: list[tuple[str, str]]
) -> Column:
    """The BPE token array itself (for vocab stats / length histograms):
    strip the outer markers, split on '><' and the inter-word ' ' runs."""
    s = _bpe_marked(text, merges)
    cleaned = F.regexp_replace(s, r"[<>]", " ")
    trimmed = F.trim(cleaned)
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")) \
        .otherwise(F.split(trimmed, r"\s+"))


def bpe_apply_sql(
    text_expr: str, merges: list[tuple[str, str]]
) -> str:
    """DuckDB replica of ``_bpe_marked`` (same normalize → mark → ordered
    single-pass replaces; both engines' ``replace`` is left-to-right
    non-overlapping, so the chains are bit-identical)."""
    s = (
        f"regexp_replace(regexp_replace(lower({text_expr}),"
        f" '{_BPE_NORMALIZE_RE}', ' ', 'g'), '{_BPE_MARK_RE}', '<\\1>', 'g')"
    )
    for a, b in merges:
        s = f"replace({s}, '<{a}><{b}>', '<{a}{b}>')"
    return s


def bpe_token_count_sql(
    text_expr: str, merges: list[tuple[str, str]]
) -> str:
    s = bpe_apply_sql(text_expr, merges)
    return f"(length({s}) - length(replace({s}, '<', '')))::BIGINT"


def bigram_logprob(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: float = 1.0,
) -> DataFrame:
    """Corpus-trained BIGRAM LM score with add-k smoothing — the CCNet-
    style perplexity signal one order up from ``unigram_logprob``:
    avg ln P(w_i | w_{i-1}) per document, P = (C(a,b)+k) / (C(a·)+k·V)
    with V the corpus unigram vocabulary size and C(a·) the count of ``a``
    as a bigram PREFIX. Returns (doc_id, n_bigrams, avg_logprob); docs
    with fewer than 2 tokens emit no row.

    Scale shape: tokenization + bigram construction are scan-stage Column
    ops (``slice``+``arrays_zip`` — no Python); C(a,b) is ONE count
    shuffle over the bigram stream, and C(a·) derives from it as a window
    sum PARTITIONED on the prefix word over the (much smaller) distinct-
    pair table — r06 dropped the second corpus-sized shuffle and its join
    (a window partition holds one word's distinct successors, bounded by
    vocabulary, not corpus). The score join is co-keyed on the bigram
    with no broadcast hint: web-scale vocabularies reach 10⁸+ distinct
    words, and a forced vocabulary-sized broadcast is an executor OOM
    that AQE cannot undo. V (vocabulary size) is a 1-row countDistinct
    branch folded into the SAME plan as a broadcast — no separate driver
    action.
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    # compact per-doc token arrays, PERSISTED (r07): this frame feeds the
    # bigram stream twice (pair-count aggregate + score probe, different
    # exchanges) and the vocabulary count — one tokenizer pass, not three.
    # Vocabulary counts tokens of ALL docs (incl. <2-token docs), so the
    # size filter applies after the cache, not before.
    d0 = docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    d = d0.where(F.size("toks") >= 2)
    bigrams = d.select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("a"),
                F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("b"),
            )
        ).alias("bg"),
    ).select("doc_id", F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))

    pair_counts = bigrams.groupBy("a", "b").agg(
        F.count("*").cast("double").alias("c_ab")
    )
    # C(a·) = Σ_b C(a,b): a prefix-partitioned window over the distinct-
    # pair table, NOT a second groupBy over the raw bigram stream
    pair_counts = pair_counts.withColumn(
        "c_a", F.sum("c_ab").over(Window.partitionBy("a"))
    )
    vocab_df = (
        d0.select(F.explode("toks").alias("w"))
        .agg(F.countDistinct("w").cast("double").alias("_v"))
    )
    return (
        bigrams.join(pair_counts, ["a", "b"])
        .join(F.broadcast(vocab_df))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_bigrams"),
            F.round(
                F.avg(
                    F.log(
                        (F.col("c_ab") + F.lit(k))
                        / (F.col("c_a") + F.lit(k) * F.col("_v"))
                    )
                ),
                4,
            ).alias("avg_logprob"),
        )
    )


def source_overlap_matrix(
    docs: DataFrame,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Cross-source contamination audit: for every unordered source pair,
    how many DISTINCT normalized-content digests appear in both, plus the
    Jaccard overlap of the two digest sets. The corpus-mixing sanity check
    run before weighting sources (a shared crawl snapshot shows up as a
    high-Jaccard pair). Returns (source_a, source_b, n_shared, n_a, n_b,
    jaccard) with source_a < source_b.

    Scale shape: one distinct over (source, digest), a self-join CO-KEYED
    on digest (per-digest fan-out bounded by the number of sources, which
    is tiny), and a pair-count aggregate. No driver-side data, no
    all-pairs document join.
    """
    digests = docs.select(
        F.col(source_col).alias("src"),
        F.sha2(F.lower(F.trim(F.col(text_col))), 256).alias("digest"),
    ).distinct()
    sizes = digests.groupBy("src").agg(F.count("*").alias("n"))
    a = digests.alias("a")
    b = digests.alias("b")
    shared = (
        a.join(b, "digest")
        .where(F.col("a.src") < F.col("b.src"))
        .groupBy(
            F.col("a.src").alias("source_a"), F.col("b.src").alias("source_b")
        )
        .agg(F.count("*").cast("bigint").alias("n_shared"))
    )
    return (
        shared.join(
            F.broadcast(sizes.withColumnRenamed("src", "source_a")
                        .withColumnRenamed("n", "n_a")),
            "source_a",
        )
        .join(
            F.broadcast(sizes.withColumnRenamed("src", "source_b")
                        .withColumnRenamed("n", "n_b")),
            "source_b",
        )
        .select(
            "source_a", "source_b", "n_shared",
            F.col("n_a").cast("bigint").alias("n_a"),
            F.col("n_b").cast("bigint").alias("n_b"),
            F.round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


def oov_rate(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    vocab_size: int = 1000,
) -> DataFrame:
    """Out-of-vocabulary rate against the corpus's own top-K vocabulary —
    the tokenizer-coverage signal: build the top-``vocab_size`` tokens by
    corpus frequency (deterministic tie-break: count DESC, token ASC),
    then score each document's fraction of tokens outside it. Returns
    (doc_id, n_tokens, n_oov, oov_frac); empty docs emit no row.

    Scale shape: vocabulary = one count shuffle + a driver-free top-K
    (orderBy+limit on the tiny aggregated table); scoring = explode +
    broadcast left-join + per-doc aggregate. The vocab table is K rows by
    construction, so the broadcast never grows with the corpus. The
    compact per-doc token ARRAY is PERSISTED before exploding — the token
    rows feed two different exchanges (vocab aggregate, scoring probe),
    which Spark cannot deduplicate, so without the cache the tokenizer
    re-runs over the corpus (same fix as `novelty_score`).
    """
    from pyspark import StorageLevel

    doc_words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.filter(
            F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
            lambda t: t != "",
        ).alias("__ws"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    words = doc_words.select("doc_id", F.explode("__ws").alias("w"))
    vocab = (
        words.groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), F.col("w").asc())
        .limit(int(vocab_size))
        .select("w", F.lit(1).alias("in_vocab"))
    )
    return (
        words.join(F.broadcast(vocab), "w", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).cast("bigint").alias("n_oov"),
        )
        .withColumn(
            "oov_frac", F.round(F.col("n_oov") / F.col("n_tokens"), 6)
        )
    )


# --------------------------------------------------------------------------
# Gopher-style quality rule set (Rae et al. 2021 §A1.1; also the RedPajama
# / Dolma filtering recipes) — per-rule boolean flags, all JVM Columns
# --------------------------------------------------------------------------

#: the stopword-presence rule's marker list (Gopher's original eight)
GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_flag_columns(
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> tuple[Column, dict[str, Column]]:
    """(n_words, {rule_name: flag Column}) for the Gopher battery — the
    raw Column form so a curation recipe can filter scan-stage with the
    conjunction instead of paying a join against the flag table."""
    col = F.col(text_col)
    words = F.filter(
        F.split(F.trim(col), r"\s+"), lambda w: w != F.lit("")
    )
    n_words = F.size(words)
    denom_w = F.greatest(n_words, F.lit(1)).cast("double")
    sum_len = F.aggregate(
        words, F.lit(0).cast("bigint"), lambda acc, w: acc + F.length(w)
    )
    mean_len = sum_len / denom_w
    n = F.length(col)
    hash_n = n - F.length(F.replace(col, F.lit("#"), F.lit("")))
    uni_ell = n - F.length(F.replace(col, F.lit("…"), F.lit("")))
    ascii_ell = (
        n - F.length(F.replace(col, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    symbol_ratio = (hash_n + uni_ell + ascii_ell) / denom_w
    lines = F.filter(
        F.split(col, r"\n"), lambda l: F.trim(l) != F.lit("")
    )
    denom_l = F.greatest(F.size(lines), F.lit(1)).cast("double")
    bullet_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.startswith(F.ltrim(l), F.lit("-"))
                | F.startswith(F.ltrim(l), F.lit("*"))
                | F.startswith(F.ltrim(l), F.lit("•")),
            )
        )
        / denom_l
    )
    ellipsis_ratio = (
        F.size(
            F.filter(
                lines,
                lambda l: F.endswith(F.rtrim(l), F.lit("..."))
                | F.endswith(F.rtrim(l), F.lit("…")),
            )
        )
        / denom_l
    )
    alpha_ratio = (
        F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]"))) / denom_w
    )
    words_lower = F.transform(words, F.lower)
    stop_hits = F.size(
        F.filter(
            F.array(*[F.lit(s) for s in GOPHER_STOPWORDS]),
            lambda s: F.array_contains(words_lower, s),
        )
    )
    flags = {
        "rule_word_count": (n_words >= min_words) & (n_words <= max_words),
        "rule_word_length": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "rule_symbol_ratio": symbol_ratio <= max_symbol_ratio,
        "rule_bullets": bullet_ratio <= max_bullet_ratio,
        "rule_ellipsis": ellipsis_ratio <= max_ellipsis_ratio,
        "rule_alpha": alpha_ratio >= min_alpha_word_ratio,
        "rule_stopwords": stop_hits >= min_stopword_hits,
    }
    return n_words, flags


def gopher_passes(text_col: str = "text", **thresholds) -> Column:
    """The combined Gopher verdict as ONE scan-stage Column predicate —
    what `recipes.curate_corpus` filters with (no flag table, no join)."""
    _, flags = gopher_flag_columns(text_col, **thresholds)
    passes = None
    for f in flags.values():
        passes = f if passes is None else (passes & f)
    return passes


def gopher_rules(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **thresholds,
) -> DataFrame:
    """The Gopher quality rule battery (Rae et al. 2021 §A1.1; also the
    RedPajama / Dolma filtering recipes) as per-rule boolean flags plus
    the combined ``passes`` verdict — the canonical pre-training corpus
    filter (word-count bounds, mean word length band, symbol-to-word
    ratio, bullet-line and ellipsis-line shares, alphabetic-word ratio,
    stopword presence).

    Every rule is a built-in Column expression (split/filter/aggregate —
    whole-stage codegen, no UDF, no shuffle): filtering 100 TB is a
    map-only scan. Ratio denominators use greatest(n, 1) so empty docs
    produce deterministic flags (they fail the word-count rule).
    Emits (id, n_words, rule_* flags, passes)."""
    n_words, flags = gopher_flag_columns(text_col, **thresholds)
    passes = None
    for f in flags.values():
        passes = f if passes is None else (passes & f)
    return docs.select(
        F.col(id_col),
        n_words.cast("int").alias("n_words"),
        *[v.alias(k) for k, v in flags.items()],
        passes.alias("passes"),
    )


def gopher_rules_sql(
    text_expr: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    max_symbol_ratio: float = 0.1,
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
    min_alpha_word_ratio: float = 0.8,
    min_stopword_hits: int = 2,
) -> str:
    """DuckDB replica of gopher_rules' flag expressions: returns the SQL
    for a struct-free SELECT fragment ``rule_* ..., passes`` given a
    ``words``/``lines`` lateral already defined — kept as one fragment so
    the oracle and any ad-hoc DuckDB user share one definition."""
    words = (
        f"list_filter(string_split_regex(trim({text_expr}), '\\s+'),"
        f" w -> w <> '')"
    )
    lines = (
        f"list_filter(string_split({text_expr}, chr(10)),"
        f" l -> trim(l) <> '')"
    )
    n_words = f"len({words})"
    denom_w = f"greatest({n_words}, 1)::DOUBLE"
    # coalesce: DuckDB list_sum([]) is NULL (Spark's F.aggregate seeds 0),
    # so an empty/whitespace-only doc must not turn the flag NULL
    mean_len = (
        f"(coalesce(list_sum(list_transform({words},"
        f" w -> length(w)::BIGINT)), 0) / {denom_w})"
    )
    n = f"length({text_expr})"
    sym = (
        f"(({n} - length(replace({text_expr}, '#', '')))"
        f" + ({n} - length(replace({text_expr}, '…', '')))"
        f" + ({n} - length(replace({text_expr}, '...', ''))) / 3)"
    )
    bullets = (
        f"len(list_filter({lines}, l -> starts_with(ltrim(l), '-')"
        f" OR starts_with(ltrim(l), '*') OR starts_with(ltrim(l), '•')))"
    )
    ells = (
        f"len(list_filter({lines}, l -> ends_with(rtrim(l), '...')"
        f" OR ends_with(rtrim(l), '…')))"
    )
    denom_l = f"greatest(len({lines}), 1)::DOUBLE"
    alpha = (
        f"len(list_filter({words}, w -> regexp_matches(w, '[A-Za-z]')))"
    )
    stops = ",".join(f"'{s}'" for s in GOPHER_STOPWORDS)
    stop_hits = (
        f"len(list_filter([{stops}],"
        f" s -> list_contains(list_transform({words}, w -> lower(w)), s)))"
    )
    flags = {
        "rule_word_count": (
            f"({n_words} >= {min_words} AND {n_words} <= {max_words})"
        ),
        "rule_word_length": (
            f"({mean_len} >= {min_mean_word_len}"
            f" AND {mean_len} <= {max_mean_word_len})"
        ),
        "rule_symbol_ratio": f"({sym} / {denom_w} <= {max_symbol_ratio})",
        "rule_bullets": f"({bullets} / {denom_l} <= {max_bullet_ratio})",
        "rule_ellipsis": f"({ells} / {denom_l} <= {max_ellipsis_ratio})",
        "rule_alpha": f"({alpha} / {denom_w} >= {min_alpha_word_ratio})",
        "rule_stopwords": f"({stop_hits} >= {min_stopword_hits})",
    }
    cols = [f"{n_words}::INT AS n_words"]
    cols += [f"{expr} AS {name}" for name, expr in flags.items()]
    cols.append(" AND ".join(flags.values()) + " AS passes")
    return ",\n       ".join(cols)


# --------------------------------------------------------------------------
# DSIR-style importance weights (Xie et al. 2023, "Data Selection for
# Language Models via Importance Resampling") — hashed unigram features
# --------------------------------------------------------------------------

def dsir_logweights(
    docs: DataFrame,
    target_source: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
    buckets: int = 4096,
) -> DataFrame:
    """Per-document log importance weight log p_target(x)/p_raw(x) under
    hashed-unigram bag-of-words models — the DSIR selection signal:
    resample the raw pool with these weights to approximate the target
    distribution. The target model is fit on ``target_source``'s docs,
    the raw model on the whole pool; both are Laplace-smoothed bucket
    histograms (+1 per bucket).

    Scale shape: one word-explode scan feeds BOTH histograms (buckets ≤
    a few thousand rows each — broadcast), and the per-doc weight is one
    more map-side join + sum. No driver data beyond two scalar totals.
    Hash is md5-derived so the DuckDB oracle reproduces weights exactly.
    Returns (id, n_tokens, logweight); empty docs emit no row. Raises
    ValueError when ``target_source`` matches nothing (a typo'd source
    must not read as an empty report).

    The compact per-doc bucket ARRAY is PERSISTED before exploding (r07):
    the bucket rows feed two histogram aggregates, two scalar-total
    actions, and the per-doc score probe — five consumers Spark cannot
    deduplicate; the cache keeps tokenize+md5 to one corpus pass and
    carries bigint buckets, not word strings."""
    from pyspark import StorageLevel

    to_bucket = lambda t: (  # noqa: E731
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("bigint")
        % buckets
    )
    d_buckets = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        F.transform(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            ),
            to_bucket,
        ).alias("__bs"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    bucketed = d_buckets.select(
        "doc_id", "source", F.explode("__bs").alias("bucket")
    )
    raw = bucketed.groupBy("bucket").agg(F.count("*").alias("cnt_r"))
    tgt = (
        bucketed.where(F.col("source") == target_source)
        .groupBy("bucket")
        .agg(F.count("*").alias("cnt_t"))
    )
    totals = raw.agg(F.sum("cnt_r")).collect()[0][0]
    total_t_row = tgt.agg(F.sum("cnt_t")).collect()[0][0]
    if total_t_row is None:
        raise ValueError(
            f"dsir_logweights: target_source {target_source!r} matched no "
            f"rows in {source_col!r}"
        )
    total_r, total_t = float(totals), float(total_t_row)
    table = (
        raw.join(tgt, "bucket", "left")
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("cnt_t"), F.lit(0)) + 1.0)
                    / F.lit(total_t + buckets)
                )
                - F.log((F.col("cnt_r") + 1.0) / F.lit(total_r + buckets))
            ).alias("logratio"),
        )
    )
    return (
        bucketed.join(F.broadcast(table), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_tokens"),
            F.round(F.sum("logratio"), 4).alias("logweight"),
        )
    )


def train_bpe_merges_distributed(
    docs: DataFrame,
    text_col: str = "text",
    n_merges: int = 32,
    min_freq: int = 2,
) -> list[tuple[str, str]]:
    """Fully DISTRIBUTED classic BPE training (Sennrich et al. 2016) —
    the 100 TB upgrade of ``train_bpe_merges``: instead of collecting a
    sample to the driver, the corpus is folded ONCE into a (word, freq)
    table (the only corpus-scale shuffle; a natural-language vocabulary
    is sublinear in corpus size), and every merge round runs on the
    cluster: adjacent-pair explode → groupBy sum → a single argmax row
    to the driver → Column-fold merge application. Driver traffic is one
    (pair, count) row per round.

    Bit-compatible with the driver-side trainer on identical input rows:
    same normalization (lowercase, ``[^a-z0-9 ]`` → space), same greedy
    left-to-right merge application (the ``aggregate`` fold consumes the
    pair exactly like the sample trainer's index walk), same
    (−count, pair) lexicographic tie-break, same ``min_freq`` stop.
    ``localCheckpoint`` truncates round-over-round lineage, as in
    ``neardup_clusters``."""
    norm = F.regexp_replace(
        F.lower(F.col(text_col)), _BPE_NORMALIZE_RE, " "
    )
    word_freq = (
        docs.select(
            F.explode(
                F.filter(F.split(norm, " "), lambda t: t != F.lit(""))
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("freq"))
        .select(
            F.filter(
                F.split(F.col("word"), ""), lambda c: c != F.lit("")
            ).alias("syms"),
            "freq",
        )
        .localCheckpoint()
    )
    merges: list[tuple[str, str]] = []
    for _ in range(int(n_merges)):
        pair_counts = (
            word_freq.where(F.size("syms") >= 2)
            .select(
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(syms) - 2),"
                        " i -> struct(syms[i] AS a, syms[i + 1] AS b))"
                    )
                ).alias("p"),
                "freq",
            )
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("cnt"))
        )
        top = (
            pair_counts.orderBy(
                F.col("cnt").desc(), F.col("a").asc(), F.col("b").asc()
            )
            .limit(1)
            .collect()
        )
        if not top or top[0]["cnt"] < min_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))
        ab = a + b
        merged = F.aggregate(
            F.col("syms"),
            F.array().cast("array<string>"),
            lambda acc, s: F.when(
                (F.size(acc) > 0)
                & (F.element_at(acc, -1) == F.lit(a))
                & (s == F.lit(b)),
                F.concat(
                    F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(ab))
                ),
            ).otherwise(F.concat(acc, F.array(s))),
        )
        word_freq = word_freq.select(
            merged.alias("syms"), "freq"
        ).localCheckpoint()
    return merges


def logprob_band_filter(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lower_q: float = 0.1,
    upper_q: float = 0.9,
) -> DataFrame:
    """Perplexity-band pruning (the CCNet / Gopher LM-filter shape): score
    every doc with the corpus's own unigram LM (`unigram_logprob`) and
    keep the middle [lower_q, upper_q] quantile band — the head is
    degenerate/boilerplate (too predictable), the tail is noise (too
    surprising). Returns (id, avg_logprob, kept).

    Scale shape: the LM is the `unigram_logprob` broadcast vocabulary;
    the band cutoffs are ONE exact-percentile aggregate (two scalars to
    the driver — bounded state, because avg_logprob rounds to 4 decimals
    so its distinct-value count is capped); the verdict is a scan-stage
    comparison. Nothing here grows with corpus size except the vocab
    table. The scored frame (2 small columns per doc) is PERSISTED before
    the cutoff aggregate so the unigram-LM lineage executes once, not
    once for the cutoffs and again for the returned projection; it stays
    cached for the caller's action (README "Cache lifecycle"). The
    unigram LM's INNER token-array cache is released here: the cutoff
    aggregate fully materializes ``scored``, after which the returned
    projection reads the scored cache and never re-touches the token
    arrays — ≤1 cached frame survives the call."""
    from pyspark import StorageLevel

    scored, token_cache = _unigram_logprob_cached(
        docs, id_col=id_col, text_col=text_col
    )
    scored = scored.persist(StorageLevel.MEMORY_AND_DISK)
    lo, hi = scored.agg(
        F.percentile("avg_logprob", lower_q),
        F.percentile("avg_logprob", upper_q),
    ).collect()[0]
    token_cache.unpersist()
    return scored.select(
        F.col("doc_id").alias(id_col),
        "avg_logprob",
        ((F.col("avg_logprob") >= lo) & (F.col("avg_logprob") <= hi)).alias(
            "kept"
        ),
    )


def hashed_tfidf(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    dim: int = 256,
) -> DataFrame:
    """Hashing-trick TF-IDF featurization in SPARSE form — the classic
    bridge from raw text to the vector-similarity stack when no learned
    embedding exists: (id, bucket, tfidf) triples with
    tf = bucket count / doc length and idf = ln(N / (1 + df_bucket)).

    md5-derived buckets keep the DuckDB oracle exact. Scale shape: one
    word-explode scan → (doc, bucket) counts (ONE shuffle); the per-doc
    length is a window sum PARTITIONED by doc over those counts (a doc's
    partition holds ≤ ``dim`` rows — r06 dropped the separate
    doc_len aggregate+join, whose branch re-ran the corpus explode since
    Catalyst's per-branch pruning defeats exchange reuse); document
    frequencies stay a groupBy branch on purpose — as a window they
    would cap parallelism at ``dim`` partitions and buffer
    corpus-scale bucket groups, while the branch is a partial-
    aggregating scan whose output is ≤ ``dim`` rows, broadcast back.
    N (the idf numerator)
    is the count of docs WITH at least one token — standard TF-IDF
    corpus size, identical to ``doc_len``'s row count — computed as a
    map-only ``count_if`` branch (no explode, no shuffle) folded into
    the SAME plan as a 1-row broadcast, so the whole featurization is
    ONE job with no separate driver-side count action. Sparse output on
    purpose — densifying 100 TB × dim doubles the shuffle for zero
    information. Empty docs emit no row."""
    w = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.filter(
                F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                lambda t: t != F.lit(""),
            )
        ).alias("w"),
    )
    bucketed = w.select(
        "doc_id",
        (
            F.conv(F.substring(F.md5(F.col("w")), 1, 8), 16, 10)
            .cast("bigint") % dim
        ).alias("bucket"),
    )
    from pyspark.sql import Window

    counts = bucketed.groupBy("doc_id", "bucket").agg(
        F.count("*").alias("tf_raw")
    )
    dl = F.sum("tf_raw").over(Window.partitionBy("doc_id"))
    dfreq = counts.groupBy("bucket").agg(
        F.count("*").cast("double").alias("df")
    )
    has_tok = F.exists(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != F.lit(""),
    )
    n_df = docs.agg(
        F.sum(F.when(has_tok, F.lit(1)).otherwise(F.lit(0)))
        .cast("double")
        .alias("_n_docs")
    )
    return (
        counts.withColumn("dl", dl)
        .join(F.broadcast(dfreq), "bucket")
        .join(F.broadcast(n_df))
        .select(
            "doc_id",
            "bucket",
            F.round(
                (F.col("tf_raw") / F.col("dl"))
                * F.log(F.col("_n_docs") / (1.0 + F.col("df"))),
                6,
            ).alias("tfidf"),
        )
    )


def contamination_overlap_report(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Per-document contamination SEVERITY vs a held-out benchmark: the
    fraction of the doc's word n-grams that appear anywhere in the
    benchmark (dedup.contamination_matches answers yes/no on ≥1 shared
    gram; training-data audits need the overlap DEGREE — a 2% brush vs a
    90% verbatim inclusion are different decisions).

    The benchmark's distinct gram set is BROADCAST (eval suites are tiny
    by construction); scoring is one map-side semi-join-free pass:
    size(array_intersect(doc_grams, bench_grams))/size(doc_grams).
    Returns (id, n_grams, n_contaminated, overlap_frac); docs with no
    n-grams emit no row."""
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("g")
    ).distinct()
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("g"),
    )
    hits = (
        grams.join(F.broadcast(bench_grams.withColumn("__hit", F.lit(1))),
                   "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_grams"),
            F.sum(F.coalesce(F.col("__hit"), F.lit(0)))
            .cast("bigint")
            .alias("n_contaminated"),
        )
    )
    return hits.select(
        "doc_id", "n_grams", "n_contaminated",
        F.round(F.col("n_contaminated") / F.col("n_grams"), 6).alias(
            "overlap_frac"
        ),
    )


def unigram_kl_by_group(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Per-group unigram-distribution divergence from the corpus — the
    TEXT-space drift/mixture audit completing the triad: `quality_psi`
    (score distributions), `similarity.embedding_drift` (vector space),
    this (token space). For each group, ``KL(P_group ‖ P_corpus)`` over
    whitespace-lowered unigrams; a high-KL source is lexically unlike
    the rest of the mix (different language/register/boilerplate) and a
    near-zero one is redundant. Returns (group, n_tokens, vocab,
    kl_divergence) — nats, 6-dp.

    No smoothing is needed BY CONSTRUCTION: KL(P‖Q) sums over P's
    support, and every group token is a corpus token, so Q(w) > 0
    wherever P(w) > 0 (the group-vs-corpus direction is what makes the
    estimator closed-form; the reverse direction would need smoothing).

    Scale shape: ONE tokenize+explode pass → (group, word) counts (the
    only corpus-sized shuffle); corpus word totals RE-AGGREGATE that
    table (vocab-sized input, not corpus-sized); the final join is
    co-keyed on word and the KL reduce is a groups-sized aggregate. No
    driver-side data, no broadcast that grows with the corpus.

    Leaves ONE caller-owned cached frame (the (group, word) counts feed
    four exchanges Catalyst can't deduplicate) — lifecycle per README
    "Cache lifecycle": LRU-evicted, or `spark.catalog.clearCache()` at a
    safe point in long sessions (hygiene test-locked).
    """
    gw = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("w"),
        )
        .groupBy("grp", "w")
        .agg(F.count("*").alias("c"))
    )
    from pyspark import StorageLevel

    gw = gw.persist(StorageLevel.MEMORY_AND_DISK)
    corpus = gw.groupBy("w").agg(F.sum("c").alias("cw"))
    totals = gw.groupBy("grp").agg(F.sum("c").alias("ng"))
    grand = gw.agg(F.sum("c").alias("n"))
    p = F.col("c") / F.col("ng")
    q = F.col("cw") / F.col("n")
    return (
        gw.join(corpus, "w")
        .join(F.broadcast(totals), "grp")
        .crossJoin(F.broadcast(grand))
        .groupBy("grp")
        .agg(
            F.max("ng").cast("bigint").alias("n_tokens"),
            F.count("*").cast("bigint").alias("vocab"),
            F.round(F.sum(p * F.log(p / q)), 6).alias("kl_divergence"),
        )
        .select(
            F.col("grp").alias(group_col), "n_tokens", "vocab",
            "kl_divergence",
        )
    )


def char_entropy(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-document Shannon entropy (bits) of the lowercased character
    distribution — the compression-ratio proxy in web-scale quality
    filtering: near-zero entropy is degenerate repetition
    ("aaaa…", padded boilerplate), unusually HIGH entropy is
    encoded/binary junk pretending to be text; both tails get cut. The
    character-level complement of `repetition_ratio` (word level) and
    `quality_score` (structural). Returns (doc_id, n_chars, entropy);
    empty texts emit no row (no distribution to measure).

    Scale shape: explode to (doc, char) → ONE groupBy with map-side
    combine (per-task state collapses to ≤ alphabet-size rows per doc)
    → per-doc entropy reduce keyed on the same id (co-partitioned —
    AQE reuses the exchange). 6-dp rounding: entropy terms are ratios
    through log2, never boundary-pinned.
    """
    ch = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.col(text_col)), ""),
                    lambda c: c != "",
                )
            ).alias("c"),
        )
        .groupBy("doc_id", "c")
        .agg(F.count("*").alias("cnt"))
    )
    tot = ch.groupBy("doc_id").agg(F.sum("cnt").alias("n"))
    p = F.col("cnt") / F.col("n")
    return (
        ch.join(tot, "doc_id")
        .groupBy("doc_id", "n")
        .agg(F.round(-F.sum(p * F.log2(p)), 6).alias("entropy"))
        .select(
            F.col("doc_id").alias(id_col),
            F.col("n").cast("bigint").alias("n_chars"),
            "entropy",
        )
    )


def pmi_collocations(
    docs: DataFrame,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 100,
) -> DataFrame:
    """Top-``top_k`` two-word collocations by pointwise mutual
    information over the corpus bigram stream — the phrase-mining signal
    (Church & Hanks 1990) used to pick merge candidates for tokenizer
    vocabularies and to surface templated boilerplate ("all rights
    reserved") that per-doc signals miss. PMI = ln(c_ab·N / (c_a·c_b))
    with all marginals taken over the bigram stream (c_a = count of ``a``
    as a prefix, c_b = count of ``b`` as a suffix, N = total bigrams), so
    one bigram count table feeds everything. Pairs below ``min_count``
    are dropped BEFORE ranking — raw PMI otherwise degenerates to
    hapax pairs (c_ab=1 scores highest by construction).

    Returns (w1, w2, n_pair, pmi, rank), rank 1 = strongest collocation;
    ties on the 6-dp pmi break to (w1, w2) ascending so the ranking is
    engine-portable.

    Scale shape: tokenization/bigrams are scan-stage Column ops (the
    `bigram_logprob` idiom); ONE corpus-sized count shuffle to the
    (a, b) pair table; both marginals are windows PARTITIONED on a word
    over that vocabulary-bounded table (never a second corpus pass); N is
    a 1-row broadcast. The final ranking is a TakeOrderedAndProject
    (`orderBy().limit(top_k)` — per-partition top-k + small merge, no
    global sort), so the rank window itself only ever orders ≤top_k
    rows no matter how large the min_count-filtered pair table grows;
    raise ``min_count`` with the corpus for statistical sanity (hapax
    pairs degenerate raw PMI), not as a perf requirement.

    The pair table is PERSISTED (one caller-owned cached frame, README
    "Cache lifecycle"): the marginal-window branch and the 1-row total
    are exchanges Catalyst can't deduplicate, and without the cache each
    re-runs the corpus tokenize (the bigram_logprob r07 lesson).
    """
    from pyspark import StorageLevel
    from pyspark.sql import Window

    if min_count < 1:
        raise ValueError("pmi_collocations: min_count must be >= 1")
    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
        lambda t: t != "",
    )
    d = docs.select(toks.alias("toks")).where(F.size("toks") >= 2)
    bigrams = d.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("toks"), 1, F.size("toks") - 1).alias("a"),
                F.slice(F.col("toks"), 2, F.size("toks") - 1).alias("b"),
            )
        ).alias("bg")
    ).select(F.col("bg.a").alias("a"), F.col("bg.b").alias("b"))
    pc = (
        bigrams.groupBy("a", "b")
        .agg(F.count("*").cast("double").alias("c_ab"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pc = pc.withColumn(
        "c_a", F.sum("c_ab").over(Window.partitionBy("a"))
    ).withColumn("c_b", F.sum("c_ab").over(Window.partitionBy("b")))
    tot = pc.agg(F.sum("c_ab").alias("__N"))
    scored = (
        pc.where(F.col("c_ab") >= float(min_count))
        .crossJoin(F.broadcast(tot))
        .select(
            F.col("a").alias("w1"),
            F.col("b").alias("w2"),
            F.col("c_ab").cast("bigint").alias("n_pair"),
            F.round(
                F.log(
                    (F.col("c_ab") * F.col("__N"))
                    / (F.col("c_a") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    order = [F.desc("pmi"), F.asc("w1"), F.asc("w2")]
    # TakeOrderedAndProject pre-prune (r11): orderBy().limit(top_k) is a
    # per-partition top-k + driver merge of top_k·partitions rows — no
    # global sort — so the rank window below only ever sees ≤top_k rows
    # regardless of how large the min_count-filtered pair table is. The
    # docstring's "raise min_count with the corpus" stays a STATISTICAL
    # floor; it is no longer the thing standing between the final sort
    # and a corpus-sized SinglePartition.
    return (
        scored.orderBy(*order)
        .limit(top_k)
        .withColumn("rank", F.row_number().over(Window.orderBy(*order)))
    )


def group_keywords(
    docs: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    top_k: int = 10,
) -> DataFrame:
    """Top-``top_k`` DISTINGUISHING terms per group by tf·idf with the
    group as the "document" unit: tf = the word's count inside the
    group, idf = ln(G / g_w) with g_w the number of groups containing
    the word — the corpus-exploration signal ("what is source X about,
    relative to the others") behind mixture naming, domain labeling,
    and eyeballing a new crawl slice. A word present in every group
    scores exactly 0 (idf = ln 1) no matter how frequent — which is the
    point. Returns (group, word, n, score, rank), rank 1 = most
    distinguishing, ties on the 6-dp score break to word ascending.

    Scale shape: ONE (group, word) count shuffle; g_w re-aggregates that
    table (vocabulary-sized input, not corpus-sized) and joins back
    co-keyed on the word; G rides a 1-row broadcast; the rank window is
    partitioned BY GROUP over the vocabulary-bounded aggregate — never a
    corpus-sized sort. The (group, word) table is PERSISTED (one
    caller-owned cached frame, README "Cache lifecycle") — its three
    consumers (idf, G, the scored join) are exchanges Catalyst can't
    deduplicate, and each would otherwise re-run the corpus tokenize
    (the unigram_kl_by_group shape).
    """
    from pyspark import StorageLevel

    gw = (
        docs.select(
            F.col(group_col).alias("grp"),
            F.explode(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "",
                )
            ).alias("w"),
        )
        .groupBy("grp", "w")
        .agg(F.count("*").alias("n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    df_w = gw.groupBy("w").agg(F.countDistinct("grp").alias("__gw"))
    n_groups = gw.agg(F.countDistinct("grp").cast("double").alias("__G"))
    from pyspark.sql import Window

    scored = (
        gw.join(df_w, "w")
        .crossJoin(F.broadcast(n_groups))
        .withColumn(
            "score",
            F.round(
                F.col("n") * F.log(F.col("__G") / F.col("__gw")), 6
            ),
        )
    )
    w = Window.partitionBy("grp").orderBy(F.desc("score"), F.asc("w"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= top_k)
        .select(
            F.col("grp").alias(group_col), F.col("w").alias("word"),
            "n", "score", "rank",
        )
    )
