"""Approximate-nearest-neighbor search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline. One
  broadcast of the (small) query set against the corpus; the corpus side
  never shuffles.
- ``lsh_bucket_topk``: random-hyperplane LSH bucketing — the 100 TB path.
  Hyperplane signs come from a deterministic md5-derived pseudo-random
  projection so runs (and the DuckDB oracle) are reproducible without a
  stored model.
- ``ivf_topk``: IVF-style two-stage search with k-means-lite centroids
  (deterministic seeded sample), probing the nearest ``nprobe`` cells only.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd  # module-level so pandas-UDF type hints resolve

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from quackosm_spark.operators.dedup import _spread, cosine_similarity


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k by cosine: broadcast(queries) ⋈ corpus → window top-k.

    Returns (query_id, match_id, cosine, rank). The join is a broadcast
    nested loop over the small query side — the corpus never shuffles on
    a key; a narrow corpus (single-file scan) is first spread to cluster
    parallelism (`dedup._spread` — at-scale scans pass through), since
    the broadcast join preserves the stream side's partitioning and
    would otherwise score every pair in one task. The only keyed
    shuffle is the final per-query top-k.

    ``dim`` (optional): the corpus's vector dimensionality, when known at
    plan time — switches the per-pair scoring to the unrolled codegen
    cosine (`_cosine_static_dim`). Output is IDENTICAL with or without it
    (rows of any other length fall back to the HOF expression inside the
    hybrid); the difference is per-pair cost — the interpreted HOF fold
    is CodegenFallback and forces the scoring stage out of whole-stage
    codegen (r12, the q137 100× lesson: 2081 s → see SCALE.md)."""
    c = _spread(corpus).select(
        F.col(corpus_id).alias("match_id"), F.col(vec_col).cast("array<double>").alias("cv")
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), F.col(vec_col).cast("array<double>").alias("qv")
    )
    # JVM fold scoring, deliberately NOT the Arrow numpy kernel: the r11
    # swap to _cosine_pairs_udf was re-measured same-box and REGRESSED
    # (warm scoring stage 6.5 exec-s fold vs 8.9 exec-s kernel even after
    # vectorizing the kernel's validation) — the pair-expanded vectors
    # (both sides, ~1 KB/pair) must cross the Arrow boundary for the
    # kernel, and that transfer costs more than the interpreted fold's
    # per-pair arithmetic. Corpora that want the GEMM shape use
    # brute_force_topk_vectorized, which ships each corpus vector across
    # the boundary ONCE (not once per pair).
    score = (
        _cosine_static_dim(F.col("qv"), F.col("cv"), dim)
        if dim
        else cosine_similarity(F.col("qv"), F.col("cv"))
    )
    scored = c.join(F.broadcast(q), F.col("query_id") != F.col("match_id")).select(
        "query_id",
        "match_id",
        F.round(score, 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def hyperplane_signs(vec: Column, num_planes: int = 8, dim: int = 32) -> Column:
    """Deterministic random-hyperplane signature as a bit-string key.

    Plane p's coefficient for dimension d is ±1 from one md5 bit of
    ``"p:d"`` — reproducible anywhere, including the SQL oracle."""
    import hashlib

    bits = []
    for p in range(num_planes):
        coeffs = []
        for d in range(dim):
            h = hashlib.md5(f"{p}:{d}".encode()).hexdigest()
            coeffs.append(1.0 if int(h[0], 16) % 2 == 0 else -1.0)
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(c) for c in coeffs]),
                lambda x, c: x * c,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def _flip_bit(bucket: Column, i: int, num_planes: int) -> Column:
    flipped = F.when(F.substring(bucket, i + 1, 1) == "1", F.lit("0")).otherwise(
        F.lit("1")
    )
    return F.concat(
        F.substring(bucket, 1, i), flipped, F.substring(bucket, i + 2, num_planes - i - 1)
    )


def lsh_bucket_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_planes: int = 8,
    dim: int = 32,
    multi_probe: bool = False,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN: compare only within matching hyperplane buckets.

    At 100 TB the bucket key pre-partitions the corpus; each query touches
    ~corpus/2^planes vectors. ``multi_probe=True`` additionally probes every
    bucket at Hamming distance 1 from the query's signature (num_planes + 1
    buckets per query) — the standard recall/cost dial; the corpus side is
    never duplicated."""
    c = _spread(corpus).select(
        F.col(corpus_id).alias("match_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    ).withColumn("bucket", hyperplane_signs(F.col("cv"), num_planes, dim))
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("bucket", hyperplane_signs(F.col("qv"), num_planes, dim))
    if multi_probe:
        probes = F.array(
            F.col("bucket"),
            *[_flip_bit(F.col("bucket"), i, num_planes) for i in range(num_planes)],
        )
        q = q.withColumn("bucket", F.explode(probes))
    scored = c.join(F.broadcast(q), "bucket").where(
        F.col("query_id") != F.col("match_id")
    ).select(
        "query_id",
        "match_id",
        F.round(cosine_similarity(F.col("qv"), F.col("cv")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def train_ivf_centroids(
    corpus: DataFrame,
    num_cells: int = 16,
    sample_size: int = 2048,
    iterations: int = 5,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """Deterministic spherical k-means on a fixed sample (lowest ids).

    Sampling by lowest id (not `.sample()`) keeps the model reproducible
    run-to-run with no stored state; a few Lloyd iterations on the driver
    over ≤``sample_size`` vectors is enough for cell routing. At 100 TB the
    sample collect is a top-k by id (tiny), and the resulting centroid list
    broadcasts to both the corpus-assignment and query-probe sides."""
    import numpy as np

    rows = (
        corpus.select(
            F.col(corpus_id).alias("id"), F.col(vec_col).cast("array<double>").alias("v")
        )
        .orderBy("id")
        .limit(sample_size)
        .collect()
    )
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    unit = mat / norms
    k_eff = min(num_cells, len(unit))
    centroids = unit[:k_eff].copy()  # deterministic init: first k sample rows
    for _ in range(iterations):
        sims = unit @ centroids.T
        assign = sims.argmax(axis=1)
        for c_i in range(k_eff):
            members = unit[assign == c_i]
            if len(members):
                mean = members.mean(axis=0)
                n = np.linalg.norm(mean)
                if n > 0:
                    centroids[c_i] = mean / n
    return [c.tolist() for c in centroids]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_cells: int = 16,
    nprobe: int = 4,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN: spherical-k-means centroids (deterministic sample + Lloyd
    refinement), every vector assigned to its nearest centroid; queries
    probe the ``nprobe`` nearest cells. Exact within probed cells."""
    c = _spread(corpus).select(
        F.col(corpus_id).alias("match_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    centroids = train_ivf_centroids(
        corpus, num_cells, corpus_id=corpus_id, vec_col=vec_col
    )
    dim = len(centroids[0])

    c_cells = c.withColumn("cell", _nearest_cells(F.col("cv"), centroids, 1)[0])
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn("cell", F.explode(_nearest_cells(F.col("qv"), centroids, nprobe)))
    scored = c_cells.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("match_id")
    ).select(
        "query_id",
        "match_id",
        F.round(
            _cosine_static_dim(F.col("qv"), F.col("cv"), dim), 6
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


def ivf_topk_sweep(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    num_cells: int = 16,
    nprobes: Sequence[int] = (4,),
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """`ivf_topk` at SEVERAL probe depths from ONE cell model and ONE
    corpus pass — the recall-vs-cost sweep (e.g. q32's nprobe=4 approx
    side against its nprobe=num_cells exact side) without re-training
    centroids or re-assigning corpus cells per depth.

    Per (nprobe, query, match) the output is bit-identical to calling
    `ivf_topk(..., nprobe=n)` (asserted in tests/test_differential_new_ops
    .py): candidates carry the 1-based position of their cell in the
    query's nearest-cell list (``probe_pos``), so "rank within the first
    n probed cells" is a conditional running count over ONE window
    ordered exactly as ivf_topk's — ranks for every requested depth come
    out of a single window pass, and the depth fan-out is a row-local
    explode of an in-row struct array (no union re-executing the corpus
    lineage per depth). Returns (nprobe, query_id, match_id, cosine,
    rank) with rank ≤ k inside each (nprobe, query)."""
    if not nprobes:
        raise ValueError("ivf_topk_sweep: nprobes must be non-empty")
    depths = sorted(set(int(n) for n in nprobes))
    max_probe = depths[-1]
    c = _spread(corpus).select(
        F.col(corpus_id).alias("match_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    centroids = train_ivf_centroids(
        corpus, num_cells, corpus_id=corpus_id, vec_col=vec_col
    )
    dim = len(centroids[0])

    c_cells = c.withColumn("cell", _nearest_cells(F.col("cv"), centroids, 1)[0])
    q = (
        queries.select(
            F.col(query_id).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("qv"),
        )
        .select(
            "query_id",
            "qv",
            F.posexplode(
                _nearest_cells(F.col("qv"), centroids, max_probe)
            ).alias("__p0", "cell"),
        )
        .withColumn("probe_pos", F.col("__p0") + 1)
        .drop("__p0")
    )
    scored = c_cells.join(F.broadcast(q), "cell").where(
        F.col("query_id") != F.col("match_id")
    ).select(
        "query_id",
        "match_id",
        F.round(
            _cosine_static_dim(F.col("qv"), F.col("cv"), dim), 6
        ).alias("cosine"),
        "probe_pos",
    )
    w = (
        Window.partitionBy("query_id")
        .orderBy(F.desc("cosine"), F.asc("match_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = scored.withColumns(
        {
            f"__rank_{n}": F.sum(
                F.when(F.col("probe_pos") <= n, 1).otherwise(0)
            ).over(w)
            for n in depths
        }
    )
    variants = F.array(
        *[
            F.struct(
                F.lit(n).alias("nprobe"),
                F.col(f"__rank_{n}").cast("int").alias("rank"),
                (F.col("probe_pos") <= n).alias("__in"),
            )
            for n in depths
        ]
    )
    v = F.col("__v")
    return (
        ranked.select(
            "query_id", "match_id", "cosine", F.explode(variants).alias("__v")
        )
        .where(v["__in"] & (v["rank"] <= k))
        .select(
            v["nprobe"].alias("nprobe"),
            "query_id",
            "match_id",
            "cosine",
            v["rank"].alias("rank"),
        )
    )


def brute_force_topk_vectorized(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k via one numpy GEMM per Arrow batch — the 100 TB
    execution shape for ``brute_force_topk``.

    The (small) query matrix is normalized once on the driver and broadcast;
    each ``mapInPandas`` batch stacks its corpus vectors into a (B, D) array
    and computes the full (B, Q) similarity block with one matrix multiply,
    emitting only per-batch top-k candidates (k rows per query per batch).
    The final global top-k window then ranks ≤ k·num_batches rows per query
    instead of the whole corpus — the shuffle is tiny. Results are identical
    to ``brute_force_topk`` (same cosine, same tie-break), so the q20 oracle
    doubles as this operator's oracle."""
    import numpy as np
    import pandas as pd

    q_rows = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).collect()
    if not q_rows:  # empty query set → empty result with the right schema
        return corpus.sparkSession.createDataFrame(
            [], "query_id long, match_id long, cosine double, rank int"
        )
    q_ids = np.array([r["query_id"] for r in q_rows], dtype=np.int64)
    q_mat = np.array([r["qv"] for r in q_rows], dtype=np.float64)
    norms = np.linalg.norm(q_mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    q_norm = q_mat / norms

    spark = corpus.sparkSession
    bc = spark.sparkContext.broadcast((q_ids, q_norm))

    c = _spread(corpus).select(
        F.col(corpus_id).alias("match_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )

    def _block_topk(batches):
        q_ids_l, q_norm_l = bc.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf["match_id"].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["cv"].to_numpy())
            norms = np.linalg.norm(mat, axis=1, keepdims=True)
            norms[norms == 0] = 1.0
            sims = (mat / norms) @ q_norm_l.T  # (B, Q)
            out_q, out_m, out_s = [], [], []
            for j, qid in enumerate(q_ids_l):
                col = sims[:, j]
                mask = ids != qid
                cand_idx = np.nonzero(mask)[0]
                if not len(cand_idx):
                    continue
                take = min(k, len(cand_idx))
                # partial top-k then exact ordering (score desc, id asc)
                part = cand_idx[np.argpartition(-col[cand_idx], take - 1)[:take]]
                order = part[np.lexsort((ids[part], -col[part]))]
                out_q.extend([qid] * len(order))
                out_m.extend(ids[order].tolist())
                out_s.extend(np.round(col[order], 6).tolist())
            yield pd.DataFrame(
                {"query_id": out_q, "match_id": out_m, "cosine": out_s}
            )

    candidates = c.mapInPandas(
        _block_topk, schema="query_id long, match_id long, cosine double"
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("match_id"))
    return candidates.withColumn("rank", F.row_number().over(w)).where(F.col("rank") <= k)


# --------------------------------------------------------------------------
# Product quantization (PQ) — compressed-domain ANN
# --------------------------------------------------------------------------

def train_pq_codebooks(
    corpus: DataFrame,
    m: int = 8,
    k: int = 16,
    sample_size: int = 2048,
    iterations: int = 5,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the vector is split into ``m``
    contiguous subspaces and each gets its own ``k``-centroid L2 k-means,
    trained on the driver over a fixed lowest-id sample (same reproducible
    scheme as ``train_ivf_centroids``). Returns ``codebooks[m][k][dsub]``.

    PQ is the memory-side scale lever: a 64-dim float64 vector (512 B)
    compresses to ``m`` one-byte codes — 100 TB of embeddings become ~1.5 TB
    of codes that fit executor memory for in-partition scoring."""
    import numpy as np

    rows = (
        corpus.select(
            F.col(corpus_id).alias("id"),
            F.col(vec_col).cast("array<double>").alias("v"),
        )
        .orderBy("id")
        .limit(sample_size)
        .collect()
    )
    mat = np.array([r["v"] for r in rows], dtype=np.float64)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books: list[list[list[float]]] = []
    for j in range(m):
        sub = mat[:, j * dsub : (j + 1) * dsub]
        uniq = np.unique(sub, axis=0)  # sorted -> deterministic init
        k_eff = min(k, len(uniq))
        cent = uniq[:k_eff].copy()
        for _ in range(iterations):
            d2 = ((sub[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c_i in range(k_eff):
                members = sub[assign == c_i]
                if len(members):
                    cent[c_i] = members.mean(axis=0)
        books.append([c.tolist() for c in cent])
    return books


def _sub_l2(
    vec: Column, centroid: list[float], off: int = 0, whole: bool = True
) -> Column:
    """Squared L2 between dims ``[off, off+len(centroid))`` of ``vec`` and a
    literal centroid, as an UNROLLED left-associated sum of codegen-able
    arithmetic — NOT the former ``zip_with``+``aggregate`` fold, whose
    INTERPRETED lambda evaluation cost ~50 µs per call and made the PQ
    encode/ADC scans expression-bound (r12: q73 at 100× spent 5,060
    executor-seconds in one stage; see SCALE.md). Exact value parity with
    the fold: identical addition order ``((0+t₀)+t₁)+…``, NULL iff the old
    ``zip_with`` padded (vector NULL, shorter than the centroid span, or —
    with ``whole`` — longer than it) or any touched element is NULL; NaN
    components propagate through the same arithmetic.

    ``whole=True`` replicates ``zip_with(vec, cent)`` on the FULL vector
    (non-NULL iff ``size(vec) == len(centroid)``); ``off``/``whole=False``
    replicates the former ``zip_with(slice(vec, off+1, k), cent)`` callers
    (non-NULL iff ``size(vec) >= off + k``) without materializing slices.
    """
    k = len(centroid)
    s: Column = F.lit(0.0)
    for i, x in enumerate(centroid):
        d = F.get(vec, off + i) - F.lit(float(x))
        s = s + d * d
    n = F.size(vec)
    ok = (n == F.lit(off + k)) if whole else (n >= F.lit(off + k))
    return F.when(ok, s)


def _argmin_code(dists: list[Column]) -> Column:
    """Index of the smallest distance in ``dists`` via
    ``array_position(arr, array_min(arr))`` over ONE materialized distance
    array — NOT the former ``sort_array(array(struct(d, i)))[0].i``, which
    allocated and sorted a k-struct array PER ROW where this form does one
    O(k) min scan + one O(k) equality scan over a flat double array (r12,
    part of the q73 100× fix; see SCALE.md). Each distance expression
    appears exactly once (a least+CASE-WHEN form was tried first and
    duplicated the min subtree into every branch — k² node blowup, janino
    64 KB failure, interpreted-fallback OOM). Contract is bit-identical to
    the struct sort:

    - smallest d wins; equal distances tie to the LOWEST index
      (``array_position`` returns the FIRST match of the exact min value);
    - all-NULL distances → index 0 (the struct sort tied every (null, i)
      pair and took code 0; here ``array_min`` is NULL → position NULL →
      the coalesce). A distance is NULL iff the VECTOR is malformed, so
      nullity is uniform across ``dists``;
    - all-NaN distances → index 0 (the struct sort tied; here the
      position lookup yields 0-or-1 depending on equality semantics and
      the greatest/coalesce clamps both to 0). NaN-ness is likewise
      uniform — a NaN component poisons every centroid's distance — and
      ``array_min``'s ordering ranks NaN above reals, so a real minimum
      always wins when one exists.
    """
    arr = F.array(*dists)
    pos = F.array_position(arr, F.array_min(arr))
    return F.coalesce(
        F.greatest(pos - 1, F.lit(0)), F.lit(0)
    ).cast("int")


def pq_encode(
    corpus: DataFrame,
    codebooks: list[list[list[float]]],
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Encode vectors to PQ codes: per subspace, the index of the nearest
    codebook centroid (ties → lowest index). Pure Column expressions —
    encoding is a map-only codegen stage, no shuffle, no Python workers.
    Returns (id, codes: array<int>).

    The corpus is `_spread` to cluster parallelism first (r10, the q137
    lesson applied to the whole ANN family): a single-file code/corpus
    table would otherwise carry ONE partition through the broadcast
    probe join and serialize the full ADC scan on one task; at-scale
    scans pass through untouched."""
    dsub = len(codebooks[0][0])
    # materialize the array<double> cast ONCE in a child projection: the
    # unrolled distance expressions reference the vector m·k·dsub·2 times,
    # and an inline cast would re-copy the whole array at EVERY element
    # access (measured r12: 2048 casts/row made the codegen'd encode run
    # at ~5 ms/row). An aliased non-trivial projection is not re-inlined
    # by CollapseProject when referenced more than once.
    casted = _spread(corpus).select(
        F.col(corpus_id).alias("id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    v = F.col("__v")
    codes = []
    for j, book in enumerate(codebooks):
        codes.append(
            _argmin_code(
                [_sub_l2(v, cent, off=j * dsub, whole=False) for cent in book]
            )
        )
    return casted.select("id", F.array(*codes).alias("codes"))


def pq_adc_topk(
    codes: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: approx_l2²(q, x) =
    Σ_j ‖q_j − codebook_j[code_j]‖². The query side broadcasts; the code
    table (the only big side) never shuffles and never rehydrates the
    original vectors — the whole scan runs in the compressed domain. The
    per-query top-k is the usual tiny window. Returns
    (query_id, match_id, approx_l2, rank).

    The m×k subspace-distance LUT is computed ONCE PER QUERY in the
    broadcast-side projection (textbook ADC), so each corpus row pays m
    array lookups — not m·k·dsub arithmetic ops. The former inline-LUT
    form re-derived all m·k distances per (corpus×query) row and was the
    dominant cost of the whole search at 100× scale (r12; SCALE.md).
    Values are bit-identical: the same ``_sub_l2`` expressions produce the
    LUT entries, and the per-row sum keeps the same addition order.

    A persisted codes table read back from a single parquet file is
    `_spread` to cluster parallelism (r10, the match_against_ivf_index
    rule) so the broadcast join never scores every pair on one task."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    codes = _spread(codes)
    qv = F.col(vec_col).cast("array<double>")
    lut = F.array(
        *[
            F.array(
                *[_sub_l2(qv, cent, off=j * dsub, whole=False) for cent in book]
            )
            for j, book in enumerate(codebooks)
        ]
    )
    q = queries.select(
        F.col(query_id).alias("query_id"), lut.alias("__lut")
    )
    joined = codes.select(
        F.col("id").alias("match_id"), "codes"
    ).join(F.broadcast(q), F.col("query_id") != F.col("match_id"))
    dist = F.lit(0.0)
    for j in range(m):
        dist = dist + F.element_at(
            F.col("__lut")[j], F.col("codes")[j] + 1
        )
    scored = joined.select(
        "query_id", "match_id", F.round(F.sqrt(dist), 6).alias("approx_l2")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_l2"), F.asc("match_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def pq_topk_reranked(
    corpus: DataFrame,
    queries: DataFrame,
    codebooks: list[list[list[float]]],
    k: int = 10,
    shortlist: int = 50,
    corpus_id: str = "vec_id",
    query_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """The standard two-stage PQ search: ADC over compressed codes
    produces a ``shortlist`` of candidates per query (the cheap full-corpus
    scan), then ONLY those candidates are reranked with exact L2 on the
    original vectors. The expensive exact math touches shortlist×queries
    rows instead of corpus×queries — measured recall@10 on the synthetic
    embeddings: 0.22 raw ADC → 0.80 with shortlist=50, 0.92 with 100.
    Returns (query_id, match_id, l2, rank) with exact distances."""
    codes = pq_encode(corpus, codebooks, corpus_id=corpus_id, vec_col=vec_col)
    cand = pq_adc_topk(
        codes, queries, codebooks, k=shortlist,
        query_id=query_id, vec_col=vec_col,
    ).select("query_id", "match_id")
    cv = corpus.select(
        F.col(corpus_id).alias("match_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    qv = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    )
    # hybrid exact-L2: the codebook-dimension fast path is an UNROLLED
    # left-assoc sum (codegen; the interpreted zip_with fold costs ~33 µs
    # per pair — r11 measurement), with the original fold kept as the
    # fallback branch for vectors of any OTHER length, so the result is
    # bit-identical for every input (same addition order on the fast
    # path, same expression on the slow one; CaseWhen evaluates lazily)
    dim = len(codebooks) * len(codebooks[0][0])
    unrolled: Column = F.lit(0.0)
    for i in range(dim):
        d = F.get(F.col("qv"), i) - F.get(F.col("cv"), i)
        unrolled = unrolled + d * d
    fold = F.aggregate(
        F.zip_with(F.col("qv"), F.col("cv"), lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    exact = F.sqrt(
        F.when(
            (F.size(F.col("qv")) == dim) & (F.size(F.col("cv")) == dim),
            unrolled,
        ).otherwise(fold)
    )
    scored = (
        cand.join(cv, "match_id")
        .join(F.broadcast(qv), "query_id")
        .select("query_id", "match_id", F.round(exact, 6).alias("l2"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("l2"), F.asc("match_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def _argmin_cell(vec: Column, centroids: list[list[float]]) -> Column:
    """Index of the nearest centroid by squared L2 (ties → lowest index) —
    ``array_min``+``array_position`` over k unrolled literal distance
    expressions (``_argmin_code``), the ``pq_encode`` argmin pattern.
    Whole-stage-codegen-able throughout: the former ``_sub_l2`` HOF fold
    (zip_with/aggregate are CodegenFallback) forced the whole assign stage
    interpreted, and the former struct-sort allocated + sorted k structs
    per row (r12).

    Plan-size bound: the expression inlines k×dim literals, so analysis/
    codegen cost grows with k·dim — measured usable through k·dim ≈ 2^17
    (k=1024·dim=128 compiles but analysis alone takes ~tens of seconds;
    see SCALE.md "k-means argmin bound"). Callers auto-switch to
    `_argmin_cell_gemm` above `ARGMIN_LITERAL_LIMIT`."""
    return _argmin_code([_sub_l2(vec, c) for c in centroids])


# Above this k×dim product the literal-expression argmin's plan
# analysis/codegen dominates wall-clock; switch to the Arrow-batched
# GEMM kernel (still map-only, centroids ride the closure as one numpy
# array). Measured on 20k×dim rows, best-of-2 (SCALE.md "k-means argmin
# bound"): literal vs GEMM = 3.6 s / 0.5 s at k·dim=1024, 5.5 / 0.7 at
# 2048, then a codegen cliff — 45 / 1.1 at k=100·dim=32, 38 / 4.0 at
# k=128·dim=128, 220 / 7.7 at k=1024·dim=128. 2048 keeps small-k IVF
# shapes JVM-side (no Python worker in otherwise pure-JVM pipelines)
# and hands everything larger to BLAS.
ARGMIN_LITERAL_LIMIT = 2_048


def _argmin_cell_gemm(centroids: list[list[float]]):
    """Large-k argmin fallback: one Arrow-batched pandas UDF computing
    ``argmin_c(||c||² − 2·x·cᵀ)`` per batch — a (batch×dim)·(dim×k) GEMM
    instead of k×dim inlined literal expressions, so plan size is O(1)
    in k and the numpy work is BLAS-vectorized. Ties break to the lowest
    centroid index (np.argmin first-occurrence), matching the literal
    path's sort_array contract up to last-ulp distance differences
    (GEMM expands the square; the literal path sums (a−b)²)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centroids, dtype=np.float64)
    c_sq = (C * C).sum(axis=1)

    dim = C.shape[1]

    @pandas_udf("int")
    def argmin(vecs: pd.Series) -> pd.Series:
        if not len(vecs):
            return pd.Series([], dtype="Int32")
        rows, keep = [], []
        for i, vec in enumerate(vecs):
            if vec is None:
                continue
            a = np.asarray(vec, dtype=np.float64)
            if a.shape != (dim,) or np.isnan(a).any():
                continue
            rows.append(a)
            keep.append(i)
        out = pd.array([None] * len(vecs), dtype="Int32")
        if rows:
            X = np.stack(rows)
            d = c_sq[None, :] - 2.0 * (X @ C.T)
            out[keep] = d.argmin(axis=1).astype("int32")
        return pd.Series(out)

    return argmin


def _argmin_expr(vec: Column, centroids: list[list[float]]) -> Column:
    """Dispatch: literal Column argmin below ARGMIN_LITERAL_LIMIT, the
    GEMM pandas-UDF kernel above it. Both are map-only (zero shuffles)."""
    k, dim = len(centroids), len(centroids[0])
    if k * dim <= ARGMIN_LITERAL_LIMIT:
        return _argmin_cell(vec, centroids)
    return _argmin_cell_gemm(centroids)(vec)


def kmeans_fit_distributed(
    corpus: DataFrame,
    k: int,
    iters: int = 5,
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """FULL-CORPUS Lloyd k-means — the scale path when the sample-trained
    `train_ivf_centroids` isn't representative (heavy tails, rare modes).
    Initialization is the k lowest-id vectors (the same deterministic
    init contract as the sample trainer); each Lloyd round is ONE scan:

    - assignment: argmin over k broadcast centroid literals
      (`_argmin_cell` — Column math, no UDF, no shuffle);
    - update: a single groupBy(cell) aggregating k×(dim+1) sufficient
      statistics (per-dimension sums + counts) — the
      ridge_fit/BPE-distributed pattern: only O(k·dim) doubles ever
      reach the driver, per round.

    Empty cells keep their previous centroid (the standard degenerate-
    cell rule, matching the sample trainer). The projected (id, vec)
    frame is persisted for the duration of the rounds and unpersisted
    before returning. Consumers: `kmeans_assign` (cluster column for
    `dedup.semantic_dedup`), IVF cell tables, corpus bucketing.

    Input contract: all vectors must share one dimensionality — the
    MODAL vector size in the corpus is taken as that dimension (one
    cheap size-only aggregate; ties break to the larger size). NULL
    vectors, vectors of any other length, and vectors containing NULL
    elements are FILTERED OUT before seeding and before every Lloyd
    round (a malformed vector would otherwise produce a NULL assignment
    cell and NULL element sums that silently poison the update). Above
    ``ARGMIN_LITERAL_LIMIT`` (k·dim) the assignment switches from the
    inlined-literal Column argmin to the Arrow-batched GEMM kernel.
    """
    from pyspark import StorageLevel

    if k < 1:
        raise ValueError("kmeans_fit_distributed: k must be >= 1")
    v = F.col(vec_col).cast("array<double>")
    # spread a narrow scan so each Lloyd round's argmin+sufficient-stats
    # pass parallelizes (the persisted frame inherits this partitioning)
    d0 = _spread(corpus).select(
        F.col(corpus_id).alias("__kid"), v.alias("__kv")
    )
    modal = (
        d0.where(F.col("__kv").isNotNull())
        .groupBy(F.size("__kv").alias("__dim"))
        .count()
        .orderBy(F.desc("count"), F.desc("__dim"))
        .first()
    )
    if modal is None:
        raise ValueError("kmeans_fit_distributed: empty corpus")
    dim = int(modal["__dim"])
    d = d0.where(
        F.col("__kv").isNotNull()
        & (F.size("__kv") == dim)
        & ~F.exists("__kv", lambda x: x.isNull())
    ).persist(StorageLevel.MEMORY_AND_DISK)
    try:
        seed = d.orderBy("__kid").limit(k).collect()
        if not seed:
            raise ValueError("kmeans_fit_distributed: empty corpus")
        centroids = [list(map(float, r["__kv"])) for r in seed]
        for _ in range(iters):
            cell = _argmin_expr(F.col("__kv"), centroids)
            rows = (
                d.groupBy(cell.alias("__cell"))
                .agg(
                    F.count(F.lit(1)).alias("__cn"),
                    *[
                        F.sum(F.element_at("__kv", i + 1)).alias(f"__s{i}")
                        for i in range(dim)
                    ],
                )
                .collect()
            )
            for r in rows:
                n = r["__cn"]
                if n > 0:
                    centroids[r["__cell"]] = [
                        r[f"__s{i}"] / n for i in range(dim)
                    ]
        return centroids
    finally:
        d.unpersist()


def kmeans_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign every vector to its nearest centroid (squared-L2 argmin over
    broadcast literals — map-only, zero shuffles at any scale; the GEMM
    kernel takes over above ARGMIN_LITERAL_LIMIT, where malformed
    vectors assign NULL cell). Returns (id, cell); pair with
    `dedup.semantic_duplicates`' cluster input or group-wise corpus
    statistics."""
    # cast materialized in a child projection — the literal argmin
    # references the vector k·dim·2 times and an inline cast would re-copy
    # the array per element access (the r12 pq_encode lesson)
    casted = corpus.select(
        F.col(corpus_id).alias("id"),
        F.col(vec_col).cast("array<double>").alias("__v"),
    )
    return casted.select(
        "id", _argmin_expr(F.col("__v"), centroids).alias("cell")
    )


def _cosine_static_dim(a: Column, b: Column, dim: int) -> Column:
    """``cosine_similarity(a, b)`` with an UNROLLED codegen fast path for
    vectors of the plan-time-known ``dim`` — bit-identical for EVERY
    input: the unrolled branch keeps the HOF fold's left-assoc addition
    order term for term (dot, both norms, the same zero-norm/NaN masking),
    and any other shape falls back to the ORIGINAL HOF expression
    (CaseWhen branches evaluate lazily). Exists because zip_with/
    aggregate/transform are CodegenFallback — one interpreted cosine fold
    in a projection forces the whole stage out of codegen and costs
    ~100 µs/pair (the r12 q73/IVF 100× lesson; SCALE.md)."""
    dot = F.lit(0.0)
    na = F.lit(0.0)
    nb = F.lit(0.0)
    for i in range(dim):
        ai, bi = F.get(a, i), F.get(b, i)
        dot = dot + ai * bi
        na = na + ai * ai
        nb = nb + bi * bi
    denom = F.sqrt(na) * F.sqrt(nb)
    fast = F.when((denom > 0) & ~F.isnan(dot), dot / denom)
    return F.when(
        (F.size(a) == dim) & (F.size(b) == dim), fast
    ).otherwise(cosine_similarity(a, b))


def _nearest_cells(
    vec: Column, centroids: list[list[float]], n: int
) -> Column:
    """The first ``n`` cell ids by descending cosine to ``vec`` (ties →
    lowest cell id) — the shared probe-routing expression of `ivf_topk`,
    `ivf_topk_sweep`, `ivf_index`, and `match_against_ivf_index`.

    Deliberately the HOF cosine, NOT the r12 unrolled hybrid: an unrolled
    per-centroid cosine inside the struct array was A/B-measured WORSE on
    the 200k-row assignment (7.12 s vs 4.79 s warm, 54 s first-run codegen
    of the ~10k-node projection) — giant generated methods fall off the
    JIT's compile threshold and run in the bytecode interpreter. The HOF
    fold's per-row cost is bounded by num_cells·dim, and the assignment is
    one map pass; the measured pair-scoring hybrids live in the JOIN
    scorers instead (`_cosine_static_dim`)."""
    scored = F.array(
        *[
            F.struct(
                (-cosine_similarity(
                    vec, F.array(*[F.lit(x) for x in cv])
                )).alias("neg"),
                F.lit(cid).alias("cell"),
            )
            for cid, cv in enumerate(centroids)
        ]
    )
    return F.slice(
        F.transform(F.sort_array(scored), lambda s: s["cell"]), 1, n
    )


def ivf_index(
    corpus: DataFrame,
    centroids: list[list[float]],
    corpus_id: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Build the PERSISTABLE IVF index of a corpus: one row per vector —
    ``(vec_id, cell, embedding)`` with ``cell`` the nearest centroid by
    cosine. Write it as parquet ``partitionBy("cell")`` so probes scan
    only the probed cells (partition pruning), and APPEND each ingested
    batch's rows: history is never re-assigned. The ANN counterpart of
    `minhash_index` / `match_against_minhash_index`; the centroid list
    is the model contract between batches — persist it next to the
    index and pass the SAME list to every build and every match.
    Map-only Column math (argmin over broadcast centroid literals), no
    shuffle."""
    # cast materialized first (the r12 pq_encode lesson: the routing
    # expression reads the vector num_cells·dim·3 times and an inline
    # cast would re-copy the array at every element access)
    casted = corpus.select(
        F.col(corpus_id).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("embedding"),
    )
    return casted.select(
        "vec_id",
        _nearest_cells(F.col("embedding"), centroids, 1)[0].alias("cell"),
        "embedding",
    )


def match_against_ivf_index(
    queries: DataFrame,
    index: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 4,
    query_id: str = "vec_id",
    vec_col: str = "embedding",
    gemm_score: bool = False,
) -> DataFrame:
    """Incremental ANN lookup: top-``k`` matches of a query batch against
    a persisted `ivf_index` WITHOUT re-assigning (or even re-reading the
    unprobed cells of) the history corpus. Each query probes its
    ``nprobe`` nearest cells; candidates come from the index rows of
    those cells only (partition-pruned when the index is written
    ``partitionBy("cell")``); exact cosine + rank window within the
    probed set. ``nprobe = num_cells`` degenerates to exact search —
    the oracle pin, same as `ivf_topk`'s q49.

    Returns (query_id, match_id, cosine, rank). Self-pairs (same id on
    both sides, when the index already contains the query batch) are
    excluded. The query side broadcasts — the canonical regime is a
    small new batch against a big history; for a huge query batch,
    pre-split it and loop (the probe join on ~num_cells keys would
    otherwise cap parallelism at num_cells)."""
    q = queries.select(
        F.col(query_id).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("qv"),
    ).withColumn(
        "cell", F.explode(_nearest_cells(F.col("qv"), centroids, nprobe))
    )
    # A narrow index (one parquet file → one partition; broadcast joins
    # preserve the stream side's partitioning) would score EVERY pair in
    # a single task — spread it to cluster parallelism first (the
    # dedup._spread rule: at-scale scans pass through untouched).
    index = _spread(index)
    # gemm_score=True swaps the interpreted zip_with/aggregate cosine
    # fold (a dim-length array allocation PER PAIR) for one Arrow-batched
    # numpy pass. Identical 6-dp values (test-locked). Measured on the
    # 10M-pair sf1 full-probe shape: 1.95x when the join is starved of
    # parallelism; AFTER the _spread fix the 32-way Column path won
    # outright (20.1 s vs 94 s — Arrow transfer of both vectors per pair
    # outweighs the fold), so the default stays pure-Column and the flag
    # exists for few-core / huge-dim regimes where BLAS wins back.
    score = (
        _cosine_pairs_udf()(F.col("qv"), F.col("embedding"))
        if gemm_score
        else _cosine_static_dim(
            F.col("qv"), F.col("embedding"), len(centroids[0])
        )
    )
    scored = (
        index.join(F.broadcast(q), "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("match_id"),
            F.round(score, 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("match_id")
    )
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def embedding_drift(
    old: DataFrame,
    new: DataFrame,
    group_cols: Sequence[str] = (),
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-space DRIFT audit between two corpus snapshots (new
    encoder version, new crawl, re-embedded shard): per group — or
    globally with no group — the cosine between the two snapshots'
    centroid vectors and the L2 centroid shift, plus both counts. A
    centroid_cosine well below 1 means the re-embed moved the space and
    every persisted ANN index / cached neighbor list over it is stale;
    the vector-space complement of `dedup.snapshot_diff` (which audits
    membership, not geometry).

    Scale shape: the k-means sufficient-statistics pattern — each side
    aggregates (count, per-dim sums) in ONE groupBy with map-side
    combine (groups×dim doubles cross the shuffle, never vectors), then
    the two tiny aggregates join on the group. NULL and wrong-length
    vectors are excluded (the `kmeans_fit_distributed` modal-dim
    contract). Outputs round at 6 dp (ratios through sqrt — never
    boundary-pinned)."""
    gcols = list(group_cols)

    def _suff(df: DataFrame, tag: str):
        v = F.col(vec_col).cast("array<double>")
        d0 = df.select(*gcols, v.alias("__v"))
        modal = (
            d0.where(F.col("__v").isNotNull())
            .groupBy(F.size("__v").alias("__dim"))
            .count()
            .orderBy(F.desc("count"), F.desc("__dim"))
            .first()
        )
        if modal is None:
            raise ValueError("embedding_drift: empty snapshot")
        dim = int(modal["__dim"])
        d = d0.where(
            F.col("__v").isNotNull()
            & (F.size("__v") == dim)
            & ~F.exists("__v", lambda x: x.isNull())
        )
        agg = d.groupBy(*[F.col(c) for c in gcols]).agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            *[
                F.sum(F.element_at("__v", i + 1)).alias(f"__{tag}{i}")
                for i in range(dim)
            ],
        )
        return agg, dim

    o, dim_o = _suff(old, "old")
    n, dim_n = _suff(new, "new")
    if dim_o != dim_n:
        raise ValueError(
            f"embedding_drift: snapshot dims differ ({dim_o} vs {dim_n}) — "
            "centroid geometry is not comparable across dimensionalities"
        )
    joined = o.join(n, gcols) if gcols else o.crossJoin(n)
    co = [F.col(f"__old{i}") / F.col("n_old") for i in range(dim_o)]
    cn = [F.col(f"__new{i}") / F.col("n_new") for i in range(dim_o)]
    dot = sum((a * b for a, b in zip(co, cn)), F.lit(0.0))
    no = F.sqrt(sum((a * a for a in co), F.lit(0.0)))
    nn = F.sqrt(sum((b * b for b in cn), F.lit(0.0)))
    l2 = F.sqrt(sum(((a - b) * (a - b) for a, b in zip(co, cn)), F.lit(0.0)))
    cos = F.when((no > 0) & (nn > 0), dot / (no * nn))
    return joined.select(
        *gcols,
        "n_old",
        "n_new",
        F.round(cos, 6).alias("centroid_cosine"),
        F.round(l2, 6).alias("centroid_l2"),
    )


def _cosine_pairs_udf():
    """Arrow-batched cosine for candidate PAIR scoring: one numpy pass
    per batch (stacked rowwise dot/norms) instead of the interpreted
    ``zip_with``+``aggregate`` fold, which allocates a dim-length array
    per pair. Same 6-dp rounded values (float64 sum-order last-ulp
    differences sit far below the display rounding).

    Malformed rows — a NULL vector on either side, a pair whose dims
    disagree, or NaN components — score NULL instead of crashing the
    stack (ADVICE r9: the old blind ``np.stack`` raised on the data the
    default Column path tolerates). NULL, not NaN, on purpose: the
    consumer ranks ``desc(cosine)`` and Spark orders NaN ABOVE every real
    number, so a NaN mask would put garbage rows at rank 1; NULLs sort
    last, exactly like the Column path's NULL output on NULL input.
    Valid pairs vectorize in per-dim buckets (one GEMM-style pass per
    distinct dim, which is one pass for any sane corpus)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def cos(a: pd.Series, b: pd.Series) -> pd.Series:
        n = len(a)
        out = pd.array([None] * n, dtype="Float64")
        if not n:
            return pd.Series(out)
        # Fast path: a well-formed batch (no NULL vectors, one dim)
        # converts wholesale at C speed — the per-row validation loop
        # below cost ~190 µs/pair and made this kernel SLOWER than the
        # interpreted fold it replaced (measured r11: 11.5 vs 6.5
        # executor-seconds on the q20 brute stage). np.array raises on
        # ragged/None input, routing malformed batches to the slow path
        # with identical semantics.
        try:
            A = np.array(a.tolist(), dtype=np.float64)
            B = np.array(b.tolist(), dtype=np.float64)
        except (ValueError, TypeError):
            A = B = None
        if (
            A is not None
            and A.ndim == 2
            and A.shape == B.shape
        ):
            dots = (A * B).sum(axis=1)
            denom = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
            # NaN components → NULL (mask), zero-norm pairs → NULL
            ok = (
                (denom > 0)
                & ~np.isnan(A).any(axis=1)
                & ~np.isnan(B).any(axis=1)
            )
            vals = dots[ok] / denom[ok]
            out[np.nonzero(ok)[0]] = vals
            return pd.Series(out)
        buckets: dict[int, list[tuple[int, object, object]]] = {}
        for i in range(n):
            va, vb = a.iloc[i], b.iloc[i]
            if va is None or vb is None:
                continue
            aa = np.asarray(va, dtype=np.float64)
            bb = np.asarray(vb, dtype=np.float64)
            if aa.ndim != 1 or aa.shape != bb.shape:
                continue
            if np.isnan(aa).any() or np.isnan(bb).any():
                continue
            buckets.setdefault(aa.shape[0], []).append((i, aa, bb))
        for rows in buckets.values():
            idx = [r[0] for r in rows]
            A = np.stack([r[1] for r in rows])
            B = np.stack([r[2] for r in rows])
            dots = (A * B).sum(axis=1)
            denom = np.sqrt((A * A).sum(axis=1)) * np.sqrt((B * B).sum(axis=1))
            ok = denom > 0
            vals = dots[ok] / denom[ok]
            # zero-norm pairs stay NULL (the Column path's F.when with no
            # otherwise), positive-denominator pairs get real scores
            out[np.asarray(idx)[ok]] = vals
        return pd.Series(out)

    return cos
