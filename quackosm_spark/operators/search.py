"""Keyword-search scoring (BM25) over a document corpus.

The reference engine has no text-retrieval surface; this is part of the
training-data-pipeline extension set (benchmark-query mining, contamination
triage, corpus exploration all need "find documents matching these terms").

Scale shape: the query's terms are a small literal list, so term frequencies
are per-row Column expressions evaluated IN THE SCAN STAGE — the corpus never
shuffles to be scored. The only aggregates are two scalar statistics (corpus
size + average doc length) and one per-term document frequency row, all of
which reduce to a single tiny driver-side collect. Scoring 100 TB of
documents is therefore one map pass plus a top-k sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(text: Column | str = "text") -> Column:
    col = F.col(text) if isinstance(text, str) else text
    trimmed = F.lower(F.trim(col))
    return F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )


def term_frequency(term: str, text: Column | str = "text") -> Column:
    """Occurrences of ``term`` among the whitespace tokens of ``text`` —
    pure Column expression (no explode, no shuffle)."""
    return F.size(F.filter(_words(text), lambda w: w == F.lit(term)))


def bm25_scores(
    docs: DataFrame,
    query_terms: list[str],
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    persist: bool = False,
) -> DataFrame:
    """Score every document against ``query_terms`` with Lucene-flavored BM25
    (idf = ln(1 + (N - df + 0.5)/(df + 0.5))). Returns
    (id_col, score, n_matched) for documents matching >= 1 term.

    Two tiny driver actions compute the corpus statistics (N, avgdl, per-term
    df); the scoring itself is one map-side expression per document.
    """
    terms = list(dict.fromkeys(query_terms))  # dedupe, keep order
    # ONE aggregate fold computes every per-term tf AND the doc length in a
    # single pass over the token array: N separate `size(filter(words, ...))`
    # columns would each re-expand the split() under Catalyst's
    # CollapseProject re-inlining (measured 8.3s -> 1.3s at 100k docs).
    folded = F.aggregate(
        _words(text_col),
        F.struct(
            F.array(*[F.lit(0)] * len(terms)).alias("tf"), F.lit(0).alias("dl")
        ),
        lambda acc, w: F.struct(
            F.array(
                *[
                    acc["tf"][i] + (w == F.lit(t)).cast("int")
                    for i, t in enumerate(terms)
                ]
            ).alias("tf"),
            (acc["dl"] + 1).alias("dl"),
        ),
    )
    scored_input = docs.select(F.col(id_col), folded.alias("f")).select(
        id_col,
        F.col("f.dl").alias("dl"),
        *[F.col("f.tf")[i].alias(f"tf_{i}") for i in range(len(terms))],
    )
    # two actions consume scored_input (stats, then scoring). With
    # persist=True the tokenize+fold pass runs once — right for a single
    # huge-corpus query, but the cache outlives the call (Spark offers no
    # scoped unpersist on a returned DataFrame), so the default recomputes
    # (one extra map pass) and leaks nothing in loops/services.
    if persist:
        scored_input = scored_input.persist()

    stats = scored_input.agg(
        F.count("*").alias("n_docs"),
        F.avg("dl").alias("avgdl"),
        *[
            F.sum((F.col(f"tf_{i}") > 0).cast("long")).alias(f"df_{i}")
            for i in range(len(terms))
        ],
    ).collect()[0]
    n_docs = float(stats["n_docs"])
    avgdl = float(stats["avgdl"]) if stats["avgdl"] is not None else 0.0
    if n_docs == 0 or avgdl == 0:
        # empty corpus / all-empty docs: nothing can match; avoid div-by-zero
        # in the length normalization below
        return scored_input.select(
            id_col,
            F.lit(0.0).alias("score"),
            F.lit(0).alias("n_matched"),
        ).where(F.lit(False))

    score: Column = F.lit(0.0)
    n_matched: Column = F.lit(0)
    for i in range(len(terms)):
        df_t = float(stats[f"df_{i}"] or 0)
        idf = F.log(F.lit(1.0 + (n_docs - df_t + 0.5) / (df_t + 0.5)))
        tf = F.col(f"tf_{i}").cast("double")
        denom = tf + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl))
        score = score + idf * (tf * (k1 + 1.0)) / denom
        n_matched = n_matched + (F.col(f"tf_{i}") > 0).cast("int")

    return (
        scored_input.select(
            id_col,
            F.round(score, 4).alias("score"),
            n_matched.alias("n_matched"),
        )
        .where(F.col("n_matched") > 0)
    )


def bm25_topk(
    docs: DataFrame,
    query_terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
    persist: bool = False,
) -> DataFrame:
    """Top-k BM25 matches, deterministic tie-break on id. The limit is a
    TakeOrderedAndProject physical op — per-partition top-k then a single
    driver merge, never a global sort."""
    scored = bm25_scores(docs, query_terms, id_col, text_col, k1, b, persist)
    return scored.orderBy(F.desc("score"), F.asc(id_col)).limit(k)


def bm25_oracle_sql(
    query_terms: list[str],
    table: str = "documents",
    id_col: str = "doc_id",
    text_col: str = "text",
    k1: float = 1.2,
    b: float = 0.75,
) -> str:
    """DuckDB replica of :func:`bm25_scores` (same formula, same rounding),
    generated from the same term list so Spark and oracle can't drift."""
    terms = list(dict.fromkeys(query_terms))
    words = (
        f"CASE WHEN length(trim(lower({text_col}))) = 0 THEN []::VARCHAR[] "
        f"ELSE string_split_regex(trim(lower({text_col})), '\\s+') END"
    )
    tf_exprs = ",\n       ".join(
        f"len(list_filter(w, x -> x = '{t}')) AS tf_{i}" for i, t in enumerate(terms)
    )
    score_terms = " + ".join(
        f"ln(1.0 + (s.n_docs - s.df_{i} + 0.5) / (s.df_{i} + 0.5)) * "
        f"(tf_{i} * ({k1} + 1.0)) / "
        f"(tf_{i} + {k1} * (1.0 - {b} + {b} * dl / s.avgdl))"
        for i in range(len(terms))
    )
    matched = " + ".join(f"(tf_{i} > 0)::INT" for i in range(len(terms)))
    df_aggs = ", ".join(
        f"sum((tf_{i} > 0)::BIGINT) AS df_{i}" for i in range(len(terms))
    )
    return f"""
        WITH t AS (
            SELECT {id_col},
                   len(w) AS dl,
                   {tf_exprs}
            FROM (SELECT {id_col}, {words} AS w FROM {table})
        ),
        s AS (
            SELECT count(*)::DOUBLE AS n_docs, avg(dl) AS avgdl, {df_aggs}
            FROM t
        )
        SELECT {id_col},
               round({score_terms}, 4) AS score,
               ({matched}) AS n_matched
        FROM t, s
        WHERE ({matched}) > 0
    """


def rrf_fuse(
    rankings: list[DataFrame],
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 60,
) -> DataFrame:
    """Reciprocal-Rank Fusion (Cormack, Clarke & Büttcher 2009) of N
    ranked candidate lists: score(d) = Σ_lists 1/(k + rank_list(d)) —
    the standard hybrid-retrieval combiner (BM25 ∪ dense ANN) that needs
    no score calibration between heterogeneous rankers.

    Inputs are CANDIDATE LISTS (top-k outputs, ≤ thousands of rows each
    with an explicit ``rank_col``), so the union + one groupBy here is
    trivially cheap regardless of corpus size — the heavy lifting already
    happened inside the rankers, which scan the corpus map-side. Returns
    (id_col, rrf_score, n_lists) for every doc appearing in ≥1 list."""
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    parts = [
        r.select(
            F.col(id_col),
            (1.0 / (F.lit(float(k)) + F.col(rank_col))).alias("__contrib"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    return u.groupBy(id_col).agg(
        F.round(F.sum("__contrib"), 6).alias("rrf_score"),
        F.count("*").cast("int").alias("n_lists"),
    )


def with_rank(
    df: DataFrame, order_by: list, rank_col: str = "rank"
) -> DataFrame:
    """Append a 1-based ``rank`` by the given deterministic order — for
    feeding a scored candidate list into :func:`rrf_fuse`. Global window:
    meant for TOP-K LISTS (small by construction), not corpora."""
    from pyspark.sql import Window

    return df.withColumn(
        rank_col, F.row_number().over(Window.orderBy(*order_by))
    )


def hybrid_search(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: list[str],
    query_vec_id: int,
    k_candidates: int = 50,
    rrf_k: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    vec_id: str = "vec_id",
    mapping: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Hybrid keyword+dense retrieval: BM25 top-k over ``docs`` fused
    with exact cosine top-k around ``query_vec_id``'s embedding, by RRF.

    When the vector store keys rows differently from the document store
    (separate ingestion pipelines, re-embedded snapshots), pass
    ``mapping`` — a (``vec_id``, ``id_col``) DataFrame — and the dense
    candidate list is translated into the document id space before
    fusion. Without it, vec_id ≡ doc_id is assumed. The translation
    join BROADCASTS the k-row candidate list into the (corpus-sized)
    mapping, never the reverse. The mapping must be TOTAL and UNIQUE
    over the candidate vec_ids, and both contract violations raise
    ``ValueError`` LOUDLY (r08, ADVICE): a duplicate vec_id would fan
    one candidate into several equal-rank RRF contributions (and any
    keep-one policy picks an arbitrary doc_id), while a candidate with
    no mapping row would silently vanish from the dense list — both
    previously failed silently. Validation costs nothing extra: the
    translated candidate list is ≤k×(dups) rows by construction, so it
    is checked on the driver from the same single mapping-scan join
    that performs the translation. Each ranker is its own map-side
    corpus pass; the fusion is candidate-list-sized."""
    from quackosm_spark.operators.similarity import brute_force_topk

    bm25 = with_rank(
        bm25_topk(docs, query_terms, k=k_candidates, id_col=id_col,
                  text_col=text_col),
        [F.desc("score"), F.asc(id_col)],
    ).select(F.col(id_col), "rank")
    ann = brute_force_topk(
        embeddings,
        embeddings.where(F.col(vec_id) == query_vec_id),
        k=k_candidates,
        corpus_id=vec_id,
        query_id=vec_id,
        dim=dim,
    ).select("match_id", "rank")
    if mapping is not None:
        m = mapping.select(F.col(vec_id).alias("match_id"), F.col(id_col))
        # one embeddings scan: the k-row candidate list collects here and
        # re-enters as a literal frame, so the validation join below is
        # the ONLY pass over the corpus-sized mapping
        cand = ann.collect()
        spark = docs.sparkSession
        cand_df = spark.createDataFrame(cand, ann.schema)
        joined = m.join(F.broadcast(cand_df), "match_id").collect()
        seen: dict = {}
        for r in joined:
            if r["match_id"] in seen:
                raise ValueError(
                    "hybrid_search: mapping has duplicate rows for vec_id "
                    f"{r['match_id']!r} — candidate translation is "
                    "ambiguous; de-duplicate the mapping upstream"
                )
            seen[r["match_id"]] = r
        missing = [r["match_id"] for r in cand if r["match_id"] not in seen]
        if missing:
            raise ValueError(
                f"hybrid_search: mapping is not total — {len(missing)} dense "
                f"candidate vec_id(s) have no mapping row (e.g. "
                f"{missing[:5]!r}); they would be silently dropped from fusion"
            )
        from pyspark.sql.types import StructType

        out_schema = StructType([m.schema[id_col], ann.schema["rank"]])
        ann = spark.createDataFrame(
            [(r[id_col], r["rank"]) for r in joined], out_schema
        )
    else:
        ann = ann.select(F.col("match_id").alias(id_col), "rank")
    return rrf_fuse([bm25, ann], id_col=id_col, k=rrf_k)
