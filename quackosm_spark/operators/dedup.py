"""Deduplication operators for training-data pipelines, designed for 100 TB.

Every variant avoids the O(n²) all-pairs trap:

- exact:          hash-groupBy (one shuffle on the digest)
- minhash LSH:    shingle → minhash → band → bucket-join (pairs only within
                  colliding buckets)
- simhash:        64-bit sign-aggregated fingerprint, banded the same way
- n-gram jaccard: inverted-index join on shared shingles (pairs must share
                  ≥1 shingle), then exact jaccard on the candidates
- embedding:      LSH-bucketed cosine (see operators.similarity for ANN)

Hash functions are md5-derived so the DuckDB oracle can reproduce scores
exactly (md5 is identical in both engines).
"""

from __future__ import annotations

import weakref
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_SHINGLE = 5  # character shingle width


def _pin_partitions(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-repartition on join key(s) with an EXPLICIT partition count.

    Self-joins on an inverted index explode in their OUTPUT; AQE sizes
    shuffle reads from INPUT bytes, so it happily coalesces a ~50 MB
    shingle shuffle to one partition and the subsequent key-equality join
    fan-out (tens of millions of rows) grinds single-threaded — observed
    at 10× bench scale when cached-table stats flipped the plan to
    SMJ + AQEShuffleRead(1 partition). A user repartition with a numeric
    count is exempt from AQE coalescing (REPARTITION_BY_NUM), which pins
    the explosion's parallelism while keeping both sides co-partitioned.
    """
    spark = df.sparkSession
    n = max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
        spark.sparkContext.defaultParallelism,
    )
    return df.repartition(n, *[F.col(c) for c in cols])


def _plan_size_bytes(df: DataFrame) -> int:
    """Catalyst's ``sizeInBytes`` estimate of the frame's optimized
    plan — driver-side only (no job runs), the same statistic Spark's
    own planner uses to decide broadcast joins. Crude in the same ways
    (filters don't shrink it without CBO, local relations are exact),
    which is fine: it gates a regime choice whose two sides produce
    identical output. ``_jdf`` is a py4j internal absent under Spark
    Connect (and any non-JVM DataFrame); degrade to "infinitely large"
    there so the gate picks the always-correct prefix regime instead of
    raising (ADVICE r11)."""
    try:
        return int(
            df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
        )
    except Exception:  # noqa: BLE001 — Spark Connect / non-py4j frames
        return 2**63 - 1


def _unguarded_broadcast_cap() -> int:
    """Max estimated SOURCE bytes for which the unguarded shingle-pair
    regime may broadcast its full inverted index (the fast small-corpus
    plan) instead of prefix-filtering. The estimate is compressed
    source bytes while the hashed index is ~8 B per character
    (~20-30× the estimate on these corpora), so the default 8 MB caps
    the broadcast relation around the low hundreds of MB — the
    measured sf1-scale index (3.5 MB estimate) broadcast 46 MB and ran
    fine, while the 100× point (37 MB estimate) must take the prefix
    plan (the broadcast plan died there with a GC allocation failure).
    Env-tunable for clusters whose memory budget or compression ratio
    differs (``SPARK_GRAFT_SHINGLE_BROADCAST_CAP`` bytes; 0 forces the
    prefix regime everywhere, which the oracle gate and the prefix
    differential test use)."""
    import os

    raw = os.environ.get("SPARK_GRAFT_SHINGLE_BROADCAST_CAP", str(8 << 20))
    try:
        return int(raw)
    except ValueError as exc:  # clear message instead of a bare int() error
        raise ValueError(
            "SPARK_GRAFT_SHINGLE_BROADCAST_CAP must be an integer byte "
            f"count (got {raw!r})"
        ) from exc


_SPREAD_MEMO: "weakref.WeakKeyDictionary[DataFrame, bool]" = (
    weakref.WeakKeyDictionary()
)


def _spread_plan_memo(spark) -> dict[int, bool]:
    """Per-session {analyzed-plan semanticHash → narrow?} memo, stored ON
    the session object (the ``_quackosm_pkg_shipped`` idiom) so entries
    die with the session — an id()-keyed module dict could alias a new
    session to a GC'd one's verdicts (ADVICE r11/VERDICT #7). The
    plan-keyed tier survives the caller constructing a semantically
    identical frame anew (every bench/driver run rebuilds
    ``docs.where(...)`` from scratch — the object-keyed tier alone misses
    then, and the probe's physical planning costs ~100 ms of driver time
    per call; measured r11 §1). Bounded: one small entry per distinct
    operator input plan per session."""
    memo = getattr(spark, "_quackosm_spread_memo", None)
    if memo is None:
        memo = {}
        spark._quackosm_spread_memo = memo
    return memo


def _spread(df: DataFrame) -> DataFrame:
    """Repartition narrow inputs so per-row hashing parallelizes.

    A small corpus read from one parquet file arrives as ONE partition, and
    the md5 shingle transform — the dominant cost of every shingle-based
    operator — would run on a single core. Inputs that already have at least
    ``defaultParallelism`` partitions (any at-scale scan) pass through
    untouched, so no shuffle is added on the 100 TB path.

    The ``df.rdd.getNumPartitions()`` probe materializes the physical plan
    (analysis + RDD conversion), so its verdict is memoized two ways:
    per DataFrame object (weak-keyed — entries die with the frame), and
    per (session, ``semanticHash``) so a *rebuilt-but-identical* frame —
    every fresh bench/driver invocation of the same query — reuses the
    verdict instead of re-planning (ADVICE r10 minor + r11 §1 measure:
    ~100 ms driver time per probe). ``semanticHash`` reads only the
    already-analyzed logical plan, so the hit path adds no planning work;
    a hash collision could at worst skip (or add) a repartition — a
    perf-only effect on a deliberately perf-only decision.
    """
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    narrow = _SPREAD_MEMO.get(df)
    if narrow is None:
        plan_memo = _spread_plan_memo(df.sparkSession)
        plan_key = df.semanticHash()
        narrow = plan_memo.get(plan_key)
        if narrow is None:
            narrow = df.rdd.getNumPartitions() < target
            plan_memo[plan_key] = narrow
        _SPREAD_MEMO[df] = narrow
    return df.repartition(target) if narrow else df


# --------------------------------------------------------------------------
# exact dedup
# --------------------------------------------------------------------------

def exact_duplicates(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Groups of byte-identical documents: (digest, keep_id, dup_ids, n_dups).

    One shuffle on md5(text); the canonical survivor is the smallest id.
    """
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count("*").alias("n_docs"),
        )
        .where(F.col("n_docs") > 1)
    )


def drop_exact_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep the smallest id per digest — window variant (W3 shape)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(F.col(id_col))
    return (
        docs.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# --------------------------------------------------------------------------
# shingles + deterministic md5-based hash family
# --------------------------------------------------------------------------

# --- SQL-text builders -----------------------------------------------------
# The shingle/minhash expression trees are large (nested lambdas, one lane
# per minhash seed). Building them through the Column API costs hundreds of
# py4j round-trips per operator call (~0.25 s of driver time for
# hashed_shingles alone, measured r11 cProfile: 633 round-trips per q17
# build); composing the SAME expression as one SQL string and parsing it
# with a single F.expr() call produces an identical Catalyst tree for one
# round-trip. Each public builder accepts Column (compat) or a SQL snippet
# string (fast path used by the in-package operators).


def _q(name: str) -> str:
    """Backtick-quote a column name for SQL-text composition."""
    return "`" + name.replace("`", "``") + "`"


def _shingles_sql(x: str, k: int) -> str:
    # lower(x) is LET-BOUND once through a 1-element transform: HOF lambda
    # bodies are interpreted, so inlining lower(x) in the per-shingle
    # lambda re-lowers the whole string per element — O(len²) char work
    # per document (measured r11: 2.5× on the bare sf0.1 hashing pass,
    # values identical). A lambda-variable read costs nothing.
    return (
        f"transform(array(lower({x})), __lx -> array_distinct(transform("
        f"sequence(1, greatest(length(__lx) - {k - 1}, 1)),"
        f" i -> substr(__lx, i, {k}))))[0]"
    )


def _hashed_shingles_expr_sql(x: str, k: int) -> str:
    return (
        f"array_distinct(transform({_shingles_sql(x, k)},"
        f" s -> cast(conv(substring(md5(s), 1, 8), 16, 10) as bigint)))"
    )


def char_shingles(text: Column | str, k: int = DEFAULT_SHINGLE) -> Column:
    """Distinct character k-shingles of lower(text) as an array.

    ``text`` may be a Column or a SQL expression snippet (one-round-trip
    construction; identical expression tree)."""
    if isinstance(text, str):
        return F.expr(_shingles_sql(text, k))
    lowered = F.lower(text)
    n = F.length(lowered)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substr(lowered, i, F.lit(k)))
    )


def _hash64(col: Column) -> Column:
    """Deterministic 32-bit-ish hash from md5 prefix (oracle-reproducible)."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def hashed_shingles(text: Column | str, k: int = DEFAULT_SHINGLE) -> Column:
    """Distinct md5-hashed shingles as ``array<bigint>``.

    One md5 per shingle — every downstream consumer (minhash seeds, jaccard
    join keys, simhash votes) derives from these bigints with cheap integer
    arithmetic instead of re-hashing strings. ``array_distinct`` runs on the
    hashed values so set sizes stay consistent with hashed-equality joins.
    ``text`` may be a Column or a SQL snippet (see char_shingles).
    """
    if isinstance(text, str):
        return F.expr(_hashed_shingles_expr_sql(text, k))
    return F.array_distinct(F.transform(char_shingles(text, k), _hash64))


# universal-hash family over the base hash: h_i = (h * (2i+3) + 7919i + 1) mod P.
# Products stay < 2^63 (h < 2^32, multiplier small), so the arithmetic is
# exact in both Spark and the DuckDB oracle.
MINHASH_P = 2_147_483_647


def seeded_minhash(hashes: Column, seed: int) -> Column:
    a, b = 2 * seed + 3, 7919 * seed + 1
    return F.array_min(
        F.transform(hashes, lambda h: (h * a + b) % F.lit(MINHASH_P))
    )


def minhash_signature_col(
    text: Column | str, num_hashes: int = 16, shingle: int = DEFAULT_SHINGLE
) -> Column:
    """The minhash signature as a raw Column expression (array<bigint>) —
    shared by the batch table form and the streaming band-bucket op.
    ``text`` may be a Column or a SQL snippet (see char_shingles)."""
    seeds = [(2 * i + 3, 7919 * i + 1) for i in range(num_hashes)]
    if isinstance(text, str):
        init = ", ".join([f"cast({MINHASH_P} as bigint)"] * num_hashes)
        lanes = ", ".join(
            f"least(element_at(acc, {i + 1}), (h * {a} + {b}) % {MINHASH_P})"
            for i, (a, b) in enumerate(seeds)
        )
        return F.expr(
            f"aggregate({_hashed_shingles_expr_sql(text, shingle)},"
            f" array({init}), (acc, h) -> array({lanes}))"
        )
    hs = hashed_shingles(text, shingle)
    return F.aggregate(
        hs,
        F.array(*[F.lit(MINHASH_P).cast("bigint")] * num_hashes),
        lambda acc, h: F.array(
            *[
                F.least(F.element_at(acc, i + 1), (h * a + b) % F.lit(MINHASH_P))
                for i, (a, b) in enumerate(seeds)
            ]
        ),
    )


def minhash_band_array(
    sig: Column | str, num_hashes: int = 16, bands: int = 4
) -> Column:
    """The LSH band keys of a signature as array<string> (band index is
    baked into the key so buckets never collide across bands). ``sig`` may
    be a Column or the NAME of a signature column (fast SQL-text path;
    only a plain name is accepted there so the signature expression is
    never duplicated per band element)."""
    rows_per_band = num_hashes // bands
    if isinstance(sig, str):
        ref = _q(sig)
        parts = ", ".join(
            "concat_ws('_', {b}, {elems})".format(
                b=b,
                elems=", ".join(
                    f"element_at({ref}, {b * rows_per_band + r + 1})"
                    for r in range(rows_per_band)
                ),
            )
            for b in range(bands)
        )
        return F.expr(f"array({parts})")
    return F.array(
        *[
            F.concat_ws(
                "_",
                F.lit(b),
                *[
                    F.element_at(sig, b * rows_per_band + r + 1)
                    for r in range(rows_per_band)
                ],
            )
            for b in range(bands)
        ]
    )


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """(doc_id, sig: array<bigint>) — min over the seeded-hash family.

    One ``aggregate`` fold over the hashed-shingle array computes ALL
    ``num_hashes`` minima in a single pass: the expensive md5 transform
    appears exactly once in the expression tree (N separate
    ``array_min(transform(...))`` expressions would each re-expand it —
    Catalyst's CollapseProject re-inlines non-deterministic-free aliases,
    so md5 would run N× per shingle).
    """
    sig = minhash_signature_col(_q(text_col), num_hashes, shingle)
    return _spread(docs).select(F.col(id_col).alias("doc_id"), sig.alias("sig"))


def minhash_lsh_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Candidate near-duplicate pairs via banding: docs sharing any full band
    of their minhash signature. Returns (doc_a, doc_b, n_bands_matched).

    Scale shape: explode to (band_key, doc) then self-join per bucket —
    pair blowup is bounded by bucket sizes, not corpus size.
    """
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle)
    banded = sigs.select(
        "doc_id",
        F.posexplode(
            minhash_band_array("sig", num_hashes, bands)
        ).alias("band", "band_key"),
    )
    # the self-join would otherwise recompute the signature hashing on BOTH
    # sides; banded is tiny (n_docs × bands rows), so persist it
    from pyspark import StorageLevel

    banded = banded.persist(StorageLevel.MEMORY_AND_DISK)
    left = banded.alias("l")
    right = banded.alias("r")
    return (
        left.join(
            right,
            (F.col("l.band_key") == F.col("r.band_key"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .groupBy(
            F.col("l.doc_id").alias("doc_a"), F.col("r.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_bands_matched"))
    )


# --------------------------------------------------------------------------
# n-gram jaccard (exact, via inverted index)
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = DEFAULT_SHINGLE,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Exact jaccard over char shingles for every pair at or above
    ``threshold``.

    Inverted index (shingle → docs), candidates pruned by the smaller
    side's rarest-first prefix (exact — see _shingle_overlap_pairs),
    |∩| verified on the full shingle arrays, jaccard with
    |A∪B| = |A|+|B|−|∩|. Never materializes non-overlapping pairs.
    Returns (doc_a, doc_b, jaccard).

    ``max_df`` guards against hot shingles going quadratic in the inverted
    index (the 100 TB scale-killer, VERDICT r01): shingles with document
    frequency > max_df are dropped from the CANDIDATE index, and the
    surviving candidate pairs are re-scored EXACTLY via array_intersect on
    the full shingle arrays. Completeness is preserved by a per-doc
    fallback: a doc whose hot-shingle count h satisfies h ≥ t·n (it could
    owe its entire overlap to hot shingles) keeps ALL its shingles
    indexed. Proof sketch: a qualifying pair has |∩| ≥ t·max(n_a, n_b);
    if either doc is non-dominated (h < t·n), some common shingle is
    non-hot and thus indexed for BOTH docs; if both are dominated, both
    are fully indexed. Either way the pair surfaces, and the verify step
    computes the same jaccard the unguarded path would.
    """
    overlaps = _shingle_overlap_pairs(
        docs, id_col, text_col, shingle, threshold, max_df
    )
    return (
        overlaps.withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
    )


def _shingle_overlap_pairs(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    shingle: int,
    threshold: float,
    max_df: int | None,
) -> DataFrame:
    """Shared inverted-index machinery behind `ngram_jaccard_pairs` and
    `containment_pairs`: (doc_a, doc_b, n_common, n_a, n_b) with
    doc_a < doc_b for a candidate-pruned superset of every pair whose
    jaccard OR containment can reach ``threshold`` (both metrics imply
    |∩| ≥ t·min(|A|,|B|), the bound the unguarded prefix filter uses);
    n_common/n_a/n_b are always exact (full-array verify), so the
    callers' ≥ t filter yields output identical to an unpruned plan.
    With ``max_df`` the pruning is the hot-shingle cap instead (see the
    jaccard docstring for its completeness proof, which is
    jaccard-specific — `containment_pairs` documents its weaker
    guarantee)."""
    # hashed-bigint join keys (cheaper shuffle + probe than 5-char strings);
    # shingle arrays are already distinct, so no post-explode dedup shuffle.
    # Persisted: both self-join sides (and the max_df verify re-join) would
    # each recompute the md5 hashing otherwise. Set sizes RIDE the exploded
    # rows (one int per row) instead of being re-attached through two
    # post-aggregate joins — r11: the former `sizes` frame cost two extra
    # broadcast joins + a third cache-consumer branch per call, visible as
    # two extra jobs and ~0.2 s of the q17 bench wall.
    from pyspark import StorageLevel

    sh_arr = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        hashed_shingles(_q(text_col), shingle).alias("hs"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    sh = sh_arr.select(
        "doc_id", F.size("hs").alias("n_sh"), F.explode("hs").alias("sh")
    )

    if max_df is not None:
        # hot shingles are by definition few distinct values → broadcast
        hot = (
            sh.groupBy("sh")
            .agg(F.count("*").alias("df"))
            .where(F.col("df") > max_df)
            .select("sh")
        )
        flagged = sh.join(
            F.broadcast(hot.withColumn("__hot", F.lit(True))), "sh", "left"
        ).withColumn("__hot", F.coalesce(F.col("__hot"), F.lit(False)))
        # per-doc hot count; the total shingle count is n_sh, already on
        # every exploded row (the arrays are distinct, so exploded row
        # count per doc == |hs|)
        doc_stats = flagged.groupBy("doc_id").agg(
            F.count_if(F.col("__hot")).alias("__h"),
        )
        indexed = _pin_partitions(
            flagged.join(doc_stats, "doc_id")
            .where(
                ~F.col("__hot")
                | (F.col("__h") >= F.lit(threshold) * F.col("n_sh"))
            )
            .select("doc_id", "sh"),
            "sh",
        )
        cand = (
            indexed.alias("a")
            .join(
                indexed.alias("b"),
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .select(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    elif _plan_size_bytes(docs) <= _unguarded_broadcast_cap():
        # Unguarded SMALL-index regime: the whole exploded index fits a
        # broadcast (Catalyst's own sizeInBytes estimate of the input,
        # the statistic Spark's planner picks broadcast joins with), so
        # generate every co-occurring pair in one broadcast-probe
        # codegen pipeline straight into the partial aggregate — no
        # exchange touches the fan-out, measured 3× faster than the
        # prefix regime below at bench scale (1.3 s vs 4.4 s warm q17
        # at sf0.1, same output). (Without the hint, a cached-stats
        # replan was observed to flip to SMJ whose 46 MB input AQE
        # coalesced to ONE partition — the whole 5·10⁷-pair explosion
        # went single-threaded. Partitioning by shingle instead
        # concentrates hot-key fan-out: measured 43 s → 227 s at 10×
        # bench scale.)
        return (
            sh.alias("a")
            .join(
                F.broadcast(sh.alias("b")),
                (F.col("a.sh") == F.col("b.sh"))
                & (F.col("a.doc_id") < F.col("b.doc_id")),
            )
            .groupBy(
                F.col("a.doc_id").alias("doc_a"),
                F.col("b.doc_id").alias("doc_b"),
                F.col("a.n_sh").alias("n_a"),
                F.col("b.n_sh").alias("n_b"),
            )
            .agg(F.count("*").alias("n_common"))
            .select("doc_a", "doc_b", "n_common", "n_a", "n_b")
        )
    else:
        # Unguarded AT-SCALE regime, r11: ASYMMETRIC prefix filter. The
        # broadcast plan above generates EVERY co-occurring pair before
        # the callers' threshold filter — hot (boilerplate) shingles
        # make that quadratic in their document frequency, measured as
        # a JVM allocation death at 100× bench scale (the 10× point
        # already ran 5·10⁷ candidates). Both public callers emit only
        # pairs with score ≥ threshold, and both metrics (jaccard ≥ t
        # AND containment ≥ t) imply |A∩B| ≥ t·min(|A|,|B|), so by
        # pigeonhole ANY (n − ceil(t·n) + 1)-subset of the SMALLER side
        # must contain a common shingle. Probe with that prefix —
        # canonically ordered by ascending global df so the hottest
        # shingles never enter the probe side — against the FULL index
        # (full, not prefixed: the containment bound only constrains
        # the smaller side, unlike prefix_jaccard_pairs' symmetric
        # jaccard-only filter). Candidate volume is bounded by prefix
        # co-occurrence instead of raw co-occurrence; the exact verify
        # below keeps the output bit-identical to the broadcast plan
        # after the callers' filter (oracle-checked at sf0.01 AND sf0.1
        # with the cap forced to 0; measured at 100×: DNF → 552 s).
        freq = sh.groupBy("sh").agg(F.count("*").alias("__df"))
        # (df, sh) packed into ONE bigint sort key — correctness only
        # needs SOME globally consistent total order plus the per-doc
        # count bound, so df saturates at 2³¹−1 (ties among ultra-hot
        # shingles break on sh) and array_sort runs its primitive fast
        # path instead of the interpreted struct comparator (measured
        # 14 → 2 exec-s on the bench corpus). sh is a 32-bit value
        # (md5-prefix hash), so the packed key stays within int64.
        _KEY = F.least(F.col("__df"), F.lit(2**31 - 1)) * F.lit(
            2**32
        ) + F.col("sh")
        ordered = (
            # df join co-keyed on the shingle with NO broadcast hint —
            # a web-scale shingle vocabulary is 10⁸+ rows (see
            # prefix_jaccard_pairs); AQE localizes it when it fits
            sh.join(freq, "sh")
            .groupBy("doc_id", "n_sh")
            .agg(F.array_sort(F.collect_list(_KEY)).alias("__o"))
        )
        # 1e-6 slack: callers qualify on round(score, 6) ≥ t, so a
        # qualifying pair can owe the probe side as little as
        # (t − 5e-7)·n common shingles; the slack also swallows FP noise
        # in the double product (the prefix_jaccard_pairs ceil lesson —
        # an over-rounded ceil SHORTENS the prefix and silently drops
        # qualifying pairs).
        t_adj = max(threshold - 1e-6, 0.0)
        # greatest(…, 0): threshold > 1 (nonsensical but tolerated by the
        # other regimes, which return empty) would make the length
        # negative and F.slice raise; an empty prefix yields the same
        # empty candidate set the broadcast regime produces (ADVICE r11)
        prefix_len = F.greatest(
            F.col("n_sh")
            - F.ceil(F.round(F.col("n_sh") * t_adj, 6)).cast("int")
            + 1,
            F.lit(0),
        )
        probe = ordered.select(
            "doc_id",
            "n_sh",
            F.explode(F.slice("__o", F.lit(1), prefix_len)).alias("__k"),
        ).select(
            "doc_id",
            "n_sh",
            (F.col("__k") % F.lit(2**32)).alias("sh"),
        )
        # smaller-set side probes (ties by id) — strict, so no self-pairs
        cand = (
            _pin_partitions(probe, "sh")
            .alias("a")
            .join(
                _pin_partitions(sh.select("doc_id", "n_sh", "sh"), "sh")
                .alias("b"),
                (F.col("a.sh") == F.col("b.sh"))
                & (
                    (F.col("a.n_sh") < F.col("b.n_sh"))
                    | (
                        (F.col("a.n_sh") == F.col("b.n_sh"))
                        & (F.col("a.doc_id") < F.col("b.doc_id"))
                    )
                ),
            )
            .select(
                F.least("a.doc_id", "b.doc_id").alias("doc_a"),
                F.greatest("a.doc_id", "b.doc_id").alias("doc_b"),
            )
            .distinct()
        )
    # exact verify on the full arrays — candidate pruning (df cap or
    # prefix filter) is invisible in the emitted rows; sizes come from
    # the arrays already in hand, not a separate join
    return (
        cand.join(
            sh_arr.select(
                F.col("doc_id").alias("doc_a"), F.col("hs").alias("__hs_a")
            ),
            "doc_a",
        )
        .join(
            sh_arr.select(
                F.col("doc_id").alias("doc_b"), F.col("hs").alias("__hs_b")
            ),
            "doc_b",
        )
        .select(
            "doc_a",
            "doc_b",
            F.size(F.array_intersect("__hs_a", "__hs_b"))
            .cast("long")
            .alias("n_common"),
            F.size("__hs_a").alias("n_a"),
            F.size("__hs_b").alias("n_b"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    shingle: int = DEFAULT_SHINGLE,
    threshold: float = 0.8,
    max_df: int | None = None,
) -> DataFrame:
    """Near-CONTAINMENT pairs: |A∩B| / min(|A|, |B|) over char shingles —
    the asymmetric complement of `ngram_jaccard_pairs` that jaccard
    structurally misses: a page fully embedded in a much larger page
    (article + boilerplate wrapper, quoted post, concatenated shard)
    has jaccard ≈ |A|/|B| → 0 but containment ≈ 1. The standard
    dedup-audit companion (Broder's containment, the
    "document-in-document" case in training-data dedup).

    Returns (doc_a, doc_b, contained_doc, containment) for pairs at or
    above ``threshold``, where ``contained_doc`` is the id of the
    smaller-shingle-set side (ties → doc_a) — the row you'd drop if
    treating containment as duplication.

    Same inverted-index scale shape as the jaccard operator (shared
    machinery): index self-join bounded by shingle co-occurrence, never
    all pairs. ``max_df`` is available but its hot-shingle fallback
    guarantee is WEAKER here: the jaccard completeness proof needs
    |∩| ≥ t·max(n_a, n_b), containment only promises t·min — a pair
    whose entire overlap is hot shingles can be missed when only its
    LARGER side is non-dominated. Unguarded mode is exact — its r11
    asymmetric prefix filter's t·min bound is exactly containment's own
    (see _shingle_overlap_pairs), so hot boilerplate shingles are pruned
    from the probe side without losing a qualifying pair. With max_df
    treat the output as high-recall-not-complete; prefer the exact
    unguarded mode when exactness matters.
    """
    overlaps = _shingle_overlap_pairs(
        docs, id_col, text_col, shingle, threshold, max_df
    )
    n_min = F.least(F.col("n_a"), F.col("n_b"))
    return (
        overlaps.withColumn(
            "containment", F.round(F.col("n_common") / n_min, 6)
        )
        .where(F.col("containment") >= threshold)
        .select(
            "doc_a",
            "doc_b",
            F.when(F.col("n_a") <= F.col("n_b"), F.col("doc_a"))
            .otherwise(F.col("doc_b"))
            .alias("contained_doc"),
            "containment",
        )
    )


# --------------------------------------------------------------------------
# near-duplicate clustering (connected components over the pair graph)
# --------------------------------------------------------------------------

def neardup_clusters(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Connected components of a candidate-pair graph → (doc_id, cluster_id).

    The missing last stage of every near-dedup pipeline: LSH/jaccard emit
    PAIRS, but dedup must keep one doc per transitive CLUSTER (a~b, b~c ⇒
    {a,b,c} together). cluster_id is the minimum doc id in the component, so
    the canonical survivor is ``doc_id == cluster_id``.

    Algorithm: min-label propagation with pointer jumping — each round every
    vertex takes the min of (its label, its neighbors' labels, its label's
    label). The neighbor step alone needs O(component diameter) rounds; the
    pointer jump (label-of-label — every label is itself a vertex id, so it
    always resolves) halves remaining chain depth per round, giving
    O(log n) rounds even on adversarial path graphs. Per round: two shuffle
    joins + one groupBy(min); ``localCheckpoint`` truncates lineage so round
    N doesn't replay rounds 1..N-1. Convergence is detected via the label
    sum, which strictly decreases until fixpoint; hitting ``max_iterations``
    without converging raises (never returns silently-wrong clusters).

    Scale/latency shape (r11): the edge table is hash-partitioned on the
    join key ``dst`` ONCE at build (the dedup aggregate runs on that same
    clustering, so the build pays a single shuffle of E) and persisted —
    every round's edges⋈labels join then reuses the cached partitioning
    and only the O(V) label table moves, instead of re-exchanging O(E)
    edge rows per round (guide §2.4; broadcast rounds are unaffected).
    Checkpoints are lazy (``eager=False``) so the convergence-sum action
    is the one that materializes each round's labels — one job per round,
    not a checkpoint job plus a sum job.
    """
    from pyspark import StorageLevel

    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .repartition("dst")
        .dropDuplicates(["src", "dst"])
        # sort ONCE at build: InMemoryRelation preserves outputOrdering,
        # so every round's sort-merge join reads the cached table already
        # sorted on the join key instead of re-sorting O(E) rows per
        # round (r12; broadcast rounds are unaffected)
        .sortWithinPartitions("dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("label"))
        .localCheckpoint(eager=False)
    )
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    for it in range(max_iterations):
        nbr = edges.join(labels, edges["dst"] == labels["id"]).select(
            edges["src"].alias("id"), "label"
        )
        jumped = (
            labels.alias("x")
            .join(labels.alias("y"), F.col("x.label") == F.col("y.id"))
            .select(F.col("x.id").alias("id"), F.col("y.label").alias("label"))
        )
        labels = (
            labels.union(nbr).union(jumped)
            .groupBy("id")
            .agg(F.min("label").alias("label"))
        ).localCheckpoint(eager=False)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    else:
        raise RuntimeError(
            f"neardup_clusters did not converge in {max_iterations} rounds"
        )
    edges.unpersist()
    return labels.select(
        F.col("id").alias("doc_id"), F.col("label").alias("cluster_id")
    )


# --------------------------------------------------------------------------
# simhash
# --------------------------------------------------------------------------

def simhash(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    bits: int = 64,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """64-bit SimHash: per bit, sign of Σ±1 over shingle hashes.

    Bit b of shingle hash decides +1/−1; fingerprint bit b = 1 iff the sum is
    positive. Two md5-derived 32-bit halves give up to 64 bits. Returns
    (doc_id, simhash: bigint).

    Built as ONE ``aggregate`` fold whose accumulator is the full
    ``bits``-lane vote array (r11): the previous per-bit formulation was
    ``bits`` separate folds, each re-expanding the md5 transform — the
    exact re-expansion trap the minhash docstring warns about — and its
    Column-API construction cost hundreds of py4j round-trips. Same
    votes, same fingerprint arithmetic (int votes, bigint 2^b sum).
    """
    if not 1 <= bits <= 63:
        raise ValueError("simhash: bits must be in [1, 63] (2^b literals)")
    votes = ", ".join(
        f"element_at(acc, {b + 1}) + "
        f"(CASE WHEN shiftright(s.{'lo' if b < 32 else 'hi'}, "
        f"{b if b < 32 else b - 32}) % 2 = 1 THEN 1 ELSE -1 END)"
        for b in range(bits)
    )
    fp = " + ".join(
        f"(CASE WHEN element_at(acc, {b + 1}) > 0 THEN cast({2 ** b} as bigint)"
        f" ELSE cast(0 as bigint) END)"
        for b in range(bits)
    )
    fingerprint = F.expr(
        f"aggregate(transform({_shingles_sql(_q(text_col), shingle)},"
        f" g -> named_struct("
        f"'lo', cast(conv(substring(md5(g), 1, 8), 16, 10) as bigint),"
        f" 'hi', cast(conv(substring(md5(g), 9, 8), 16, 10) as bigint))),"
        f" array_repeat(0, {bits}), (acc, s) -> array({votes}),"
        f" acc -> {fp})"
    )
    return _spread(docs).select(F.col(id_col).alias("doc_id"), fingerprint.alias("simhash"))


# --------------------------------------------------------------------------
# embedding cosine near-dup
# --------------------------------------------------------------------------

def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine of two array<float|double> Columns — pure ``aggregate`` +
    ``zip_with``, JVM-side. A zero-norm vector yields NULL (not a
    DIVIDE_BY_ZERO under ANSI mode — Spark 4's default — and not ±inf/NaN
    under non-ANSI, which would outrank every real match in a
    desc-cosine window); NULL input propagates to NULL as before. A NaN
    component likewise masks to NULL — Spark orders NaN ABOVE every real
    number, so a NaN cosine would take rank 1 in every desc-cosine
    top-k; the check is free (any NaN component makes the already-computed
    dot NaN)."""
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    norm = lambda v: F.sqrt(  # noqa: E731
        F.aggregate(F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x)
    )
    denom = norm(a) * norm(b)
    return F.when((denom > 0) & ~F.isnan(dot), dot / denom)


def embedding_near_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """All pairs with cosine ≥ threshold. Brute-force pair join — the
    correctness baseline. Scale routes: ``embedding_near_duplicates_blocked``
    (EXACT, block-pair GEMM, bit-identical output) or approximate
    pre-bucketing (similarity.lsh_buckets / SemDeDup clustering).
    Returns (id_a, id_b, cosine)."""
    vecs = embeddings.select(
        F.col(id_col).alias("vid"), F.col(vec_col).cast("array<double>").alias("v")
    )
    a = vecs.alias("a")
    b = vecs.alias("b")
    return (
        a.join(b, F.col("a.vid") < F.col("b.vid"))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


# --------------------------------------------------------------------------
# benchmark decontamination
# --------------------------------------------------------------------------

def contamination_matches(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 1,
) -> DataFrame:
    """Training-set decontamination: docs sharing ≥``min_shared`` word
    n-grams with any benchmark/eval document. Returns (doc_id, n_shared)
    for flagged docs — drop or audit them before training.

    Scale shape: the benchmark side is tiny relative to a 100 TB corpus, so
    its distinct n-gram set is BROADCAST — the corpus never shuffles; each
    partition streams its exploded n-grams past the in-memory benchmark set
    and partial-aggregates the per-doc hit count map-side.
    """
    from quackosm_spark.operators.text import word_ngrams

    doc_grams = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"),
    )
    bench_grams = (
        benchmark.select(F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"))
        .distinct()
    )
    return (
        doc_grams.join(F.broadcast(bench_grams), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )


# --------------------------------------------------------------------------
# segment-level (CCNet-style) dedup
# --------------------------------------------------------------------------

def _words_sql(x: str) -> str:
    """SQL text for the whitespace word-split (empty/whitespace-only text
    → empty array), shared by the segment and substring operators."""
    return (
        f"CASE WHEN (length(trim({x})) = 0) THEN cast(array() as array<string>)"
        f" ELSE split(trim({x}), '\\\\s+') END"
    )


def _segments_from_words_sql(w: str, seg_words: int) -> str:
    """Segment array over an ALREADY-PROJECTED word-array column ``w``.

    The word split must be a real column here, not an inlined
    expression: higher-order-function lambda bodies are interpreted, so
    an expression referenced inside the lambda (``slice(words, i, k)``)
    re-evaluates per array element — an inlined split costs
    O(words × segments) per document. Hoisting it to a column makes the
    lambda a cheap slice of a bound reference: measured 1.7 s → 0.5 s
    on the bare sf0.1 segment explode, values identical."""
    return (
        f"CASE WHEN (size({w}) > 0) THEN"
        f" transform(sequence(1, greatest(size({w}), 1), {seg_words}),"
        f" i -> struct(cast(i as int) as pos,"
        f" concat_ws(' ', slice({w}, i, {seg_words})) as seg))"
        f" ELSE cast(array() as array<struct<pos:int,seg:string>>) END"
    )


def _segments_sql(x: str, seg_words: int) -> str:
    """SQL-text twin of ``_segments`` (one ``F.expr`` parse instead of
    dozens of py4j round-trips per build; identical expression). Prefer
    the two-step ``_words_sql`` + ``_segments_from_words_sql`` projection
    in operators — this single-expression form re-evaluates the split
    inside the transform lambda (see _segments_from_words_sql)."""
    return _segments_from_words_sql(_words_sql(x), seg_words)


def _reassemble_sql(keep: str, pos: str, seg: str) -> tuple[Column, Column]:
    """(text_clean, n_kept) aggregate pair for the in-aggregate reassembly
    idiom shared by the segment/substring dedup operators: surviving
    (pos, seg) structs are collected, ordered by position, and joined with
    a space; rows failing ``keep`` collapse to NULL structs that
    ``collect_list`` drops. Built as two ``F.expr`` strings — the
    nested-lambda Column form costs hundreds of py4j round-trips."""
    return (
        F.expr(
            f"concat_ws(' ', transform(array_sort(collect_list("
            f"CASE WHEN {keep} THEN struct({pos}, {seg}) END)),"
            f" s -> s.{seg}))"
        ),
        F.expr(f"count_if({keep})"),
    )


def _segments(text: Column | str, seg_words: int) -> Column:
    """Non-overlapping ``seg_words``-word segments of a document as
    array<struct<pos:int, seg:string>> (pos = 1-based word offset). For
    corpora with real line breaks, split on newline instead — the counting
    and removal below are delimiter-agnostic. ``text`` may be a Column or
    a column NAME (fast one-round-trip SQL-text construction)."""
    if isinstance(text, str):
        return F.expr(_segments_sql(_q(text), seg_words))
    trimmed = F.trim(text)
    words = F.when(F.length(trimmed) == 0, F.array().cast("array<string>")).otherwise(
        F.split(trimmed, r"\s+")
    )
    idx = F.sequence(F.lit(1), F.greatest(F.size(words), F.lit(1)), F.lit(seg_words))
    return F.when(F.size(words) > 0, F.transform(
        idx,
        lambda i: F.struct(
            i.cast("int").alias("pos"),
            F.concat_ws(" ", F.slice(words, i, seg_words)).alias("seg"),
        ),
    )).otherwise(F.expr("array()").cast("array<struct<pos:int,seg:string>>"))


def frequent_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 3,
    min_docs: int = 5,
) -> DataFrame:
    """Segments (non-overlapping word chunks; stand-in for lines in a
    newline-free corpus) occurring in >= ``min_docs`` DISTINCT documents.
    Per-doc distinct before the count, so the count IS document frequency —
    one shuffle on the segment text."""
    segs = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(_q(text_col))).alias("__w"),
    ).select(
        "doc_id",
        F.explode(F.expr(_segments_from_words_sql("__w", seg_words))).alias("s"),
    ).select("doc_id", F.col("s.seg").alias("seg"))
    return (
        segs.distinct()
        .groupBy("seg")
        .agg(F.count("*").alias("n_docs"))
        .where(F.col("n_docs") >= min_docs)
    )


def remove_frequent_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 3,
    min_docs: int = 5,
) -> DataFrame:
    """CCNet-style boilerplate removal: drop every segment that appears in
    >= ``min_docs`` distinct documents, reassemble the survivors in original
    order. Returns (id_col, text_clean, n_kept) for ALL input docs (fully
    boilerplate docs come back with empty text).

    Scale shape: the over-threshold segment set is tiny (boilerplate is by
    definition repeated), so the removal join BROADCASTS it — the corpus is
    scanned once for counting (shuffle on segment) and once for the
    broadcast flag join + per-doc reassembly (shuffle on doc id). The
    reassembly keeps EVERY doc in one pass (r11): segments carry a
    broadcast-joined boilerplate flag into the doc-id groupBy, where
    `collect_list` drops the NULLed-out boilerplate structs — the old
    anti-join + third corpus scan + corpus×corpus left join that
    re-attached fully-boilerplate and empty docs are gone
    (`explode_outer` preserves empty docs as a NULL-segment row).
    """
    exploded = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.expr(_words_sql(_q(text_col))).alias("__w"),
    ).select(
        "doc_id",
        F.explode_outer(
            F.expr(_segments_from_words_sql("__w", seg_words))
        ).alias("s"),
    ).select("doc_id", F.col("s.pos").alias("pos"), F.col("s.seg").alias("seg"))
    boiler = frequent_segments(docs, id_col, text_col, seg_words, min_docs).select("seg")
    flagged = exploded.join(
        F.broadcast(boiler.withColumn("__boiler", F.lit(True))), "seg", "left"
    )
    text_clean, n_kept = _reassemble_sql(
        "(__boiler IS NULL AND seg IS NOT NULL)", "pos", "seg"
    )
    return (
        flagged.groupBy("doc_id")
        .agg(
            text_clean.alias("text_clean"),
            n_kept.cast("bigint").alias("n_kept"),
        )
        .select(F.col("doc_id").alias(id_col), "text_clean", "n_kept")
    )


# --------------------------------------------------------------------------
# semantic dedup (SemDeDup-style: within-cluster embedding cosine)
# --------------------------------------------------------------------------

def semantic_duplicates(
    embeddings: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: (id_a < id_b, cosine >=
    threshold, same cluster). The cluster column restricts the pair join to
    an equi-join on cluster id — O(sum of cluster² ) instead of corpus² —
    which is the SemDeDup trick: any clustering (k-means cells from
    similarity.train_ivf_centroids, LSH buckets, or an existing label)
    bounds the quadratic term. Returns (cluster, id_a, id_b, cosine)."""
    vecs = embeddings.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    return (
        a.join(b, (F.col("a.cluster") == F.col("b.cluster"))
               & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.cluster").alias("cluster"),
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.round(cosine_similarity(F.col("a.v"), F.col("b.v")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def _semantic_drop_ids_blocked(
    vecs: DataFrame, threshold: float, num_blocks: int
) -> DataFrame:
    """The SemDeDup drop-set via per-cluster block-pair GEMM — output
    IDENTICAL to ``semantic_duplicates(...).select(id_b).distinct()``.

    Why not the pair join: the within-cluster theta-join is equi on the
    cluster key only, so its parallelism is capped at the number of
    clusters (measured r12: q53 at 100× bench scale = 2·10⁹ pairs on ONE
    task via a broadcast join that preserves the 1-partition scan side —
    DNF >10 min) and every pair pays the interpreted zip_with/aggregate
    fold. Here each vector is hashed into ``num_blocks`` groups, every
    (cluster, dim, block-pair) becomes one task (guide §2.5 salting),
    and the task scores its pair of blocks with one float64 GEMM
    (guide §4.2).

    Identity argument (the ``embedding_near_duplicates_blocked`` pattern,
    widened): both the GEMM and the Column fold compute the same cosine
    within ≤ ~(dim+2)·ulp ABSOLUTE error (Cauchy–Schwarz bounds the dot's
    error by the norm product, so the quotient's error never inflates),
    which is ~1e-14 — far inside the ±1e-4 decision band. A pair whose
    GEMM score clears threshold + 1e-4 is a definite drop under the
    baseline's round-6 filter; below threshold − 1e-4 a definite keep;
    inside the band the pair is re-scored with the ORIGINAL
    ``round(cosine_similarity(...), 6) >= threshold`` expression, so the
    boundary decision is bit-for-bit the baseline's. Malformed vectors
    (NULL, NaN/±inf components, zero or overflowing norm, dim mismatches,
    NULL cluster) never enter the GEMM: they are routed to an exact
    fallback join that evaluates the baseline expression itself
    (NaN-cosine semantics included). Callers must pass ``vecs`` as
    (cluster, vid, v: array<double>).
    """
    import numpy as np
    import pandas as pd

    t = float(threshold)
    band = 1e-4

    sumsq = F.aggregate(
        F.transform("v", lambda x: x * x),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    # finite_ok: exactly the vectors whose every pairwise cosine is a
    # well-defined finite number the GEMM reproduces. The 1e300 norm cap
    # keeps the pairwise norm PRODUCT finite (1e150·1e150), so no
    # overflow path diverges from the fold.
    finite_ok = (
        F.col("v").isNotNull()
        & F.col("cluster").isNotNull()
        & ~F.exists(
            "v", lambda x: F.isnan(x) | (F.abs(x) == F.lit(float("inf")))
        )
        & (sumsq > 0)
        & (sumsq < 1e300)
    )
    good = vecs.where(finite_ok).select(
        "cluster",
        "vid",
        "v",
        F.size("v").alias("dim"),
        F.pmod(F.xxhash64("vid"), F.lit(num_blocks)).alias("g"),
    )

    id_type = dict(vecs.dtypes)["vid"]
    out_schema = f"vid {id_type}, partner {id_type}"

    def _flags(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = int(pdf["lo"].iloc[0])
        hi = int(pdf["hi"].iloc[0])
        a_rows = pdf[pdf["g"] == lo]
        b_rows = pdf[pdf["g"] == hi] if hi != lo else a_rows
        if not len(a_rows) or not len(b_rows):
            return pd.DataFrame({"vid": [], "partner": []})
        ma = np.asarray(a_rows["v"].tolist(), dtype=np.float64)
        mb = np.asarray(b_rows["v"].tolist(), dtype=np.float64)
        ids_a = a_rows["vid"].to_numpy()
        ids_b = b_rows["vid"].to_numpy()
        na = np.sqrt((ma * ma).sum(axis=1))
        nb = np.sqrt((mb * mb).sum(axis=1))
        sims = (ma @ mb.T) / np.outer(na, nb)
        ii, jj = np.nonzero(sims >= t - band)
        out_v, out_p = [], []
        for i, j in zip(ii.tolist(), jj.tolist()):
            va, vb = ids_a[i], ids_b[j]
            # same-block tasks see each unordered pair twice; keep the
            # va < vb orientation (also skips the i == j self-pair)
            if lo == hi and not va < vb:
                continue
            dropped, keeper = (vb, va) if va < vb else (va, vb)
            if sims[i, j] >= t + band:
                out_v.append(dropped)
                out_p.append(None)  # definite under the error bound
            else:
                out_v.append(dropped)
                out_p.append(keeper)  # boundary: exact re-score below
        return pd.DataFrame({"vid": out_v, "partner": out_p})

    flags = (
        good.withColumn(
            "h", F.explode(F.sequence(F.lit(0), F.lit(num_blocks - 1)))
        )
        .withColumn("lo", F.least("g", "h"))
        .withColumn("hi", F.greatest("g", "h"))
        .where((F.col("g") == F.col("lo")) | (F.col("g") == F.col("hi")))
        .groupBy("cluster", "dim", "lo", "hi")
        .applyInPandas(_flags, out_schema)
    )
    definite = flags.where(F.col("partner").isNull()).select("vid")
    rescored = (
        flags.where(F.col("partner").isNotNull())
        .join(
            good.select(F.col("vid"), F.col("v").alias("__va")), "vid"
        )
        .join(
            good.select(
                F.col("vid").alias("partner"), F.col("v").alias("__vb")
            ),
            "partner",
        )
        .where(
            F.round(cosine_similarity(F.col("__va"), F.col("__vb")), 6) >= t
        )
        .select("vid")
    )
    # malformed × anything pairs: evaluate the baseline expression itself
    # (a NaN cosine from ±inf components qualifies under Spark's NaN
    # ordering exactly as in the pair join; NULL cosines never do)
    weird = vecs.where(F.col("cluster").isNotNull() & ~finite_ok)
    wx = vecs.where(F.col("cluster").isNotNull())
    weird_dropped = (
        weird.alias("w")
        .join(
            wx.alias("x"),
            (F.col("w.cluster") == F.col("x.cluster"))
            & (F.col("w.vid") != F.col("x.vid")),
        )
        .where(
            F.round(cosine_similarity(F.col("w.v"), F.col("x.v")), 6) >= t
        )
        .select(
            F.when(F.col("w.vid") < F.col("x.vid"), F.col("x.vid"))
            .otherwise(F.col("w.vid"))
            .alias("vid")
        )
    )
    return definite.union(rescored).union(weird_dropped).distinct()


def semantic_dedup(
    embeddings: DataFrame,
    cluster_col: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.9,
    num_blocks: int | None = None,
) -> DataFrame:
    """Keep-set after SemDeDup: drop every vector that has a near-duplicate
    with a SMALLER id in its cluster (deterministic keep-lowest rule; one
    survivor per duplicate chain seed). Returns the kept (id_col, cluster).

    The drop-set is computed with the block-pair GEMM kernel
    (``_semantic_drop_ids_blocked``): the naive within-cluster pair join
    is equi on the cluster key only, so both its parallelism (≤ number of
    clusters) and its per-pair interpreted fold collapse at scale —
    measured r12 at 100× bench scale as a single-task 2·10⁹-pair DNF.
    ``num_blocks`` defaults to ~sqrt(2·defaultParallelism) so the
    block-pair grid saturates the cluster; raise it for very large
    clusters (per-task memory is O((cluster_size/num_blocks)² ) for the
    scores matrix). Exotic id types (non integer/string) fall back to the
    reference pair join."""
    vecs = embeddings.select(
        F.col(cluster_col).alias("cluster"),
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    id_type = dict(vecs.dtypes)["vid"]
    if id_type in ("tinyint", "smallint", "int", "bigint", "string"):
        if num_blocks is None:
            import math

            par = embeddings.sparkSession.sparkContext.defaultParallelism
            num_blocks = max(2, int(math.ceil(math.sqrt(2 * par))))
        dropped = _semantic_drop_ids_blocked(vecs, threshold, num_blocks)
    else:
        dropped = (
            semantic_duplicates(
                embeddings, cluster_col, id_col, vec_col, threshold
            )
            .select(F.col("id_b").alias("vid"))
            .distinct()
        )
    return (
        embeddings.select(
            F.col(id_col).alias("vid"), F.col(cluster_col).alias("cluster")
        )
        .join(dropped, "vid", "left_anti")  # AQE broadcasts when small; the
        # dropped set can be a large corpus fraction, so no forced hint
        .select(F.col("vid").alias(id_col), "cluster")
    )


# --------------------------------------------------------------------------
# edit-distance (typo-level) near-dup
# --------------------------------------------------------------------------

def edit_distance_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_dist: int = 4,
    band: int | None = None,
) -> DataFrame:
    """All pairs (id_a < id_b) with levenshtein(text_a, text_b) <=
    ``max_dist`` — typo-level near-duplicate detection (title/URL variants,
    OCR noise) that token-set methods (q17/q18) miss.

    Completeness argument for the blocking: edit distance <= d implies
    length difference <= d, so with length bands of width ``band`` >= d+1
    any qualifying pair lands in the same or adjacent band. Each row is
    emitted to its own band and the next one; the pair join is then EQUI on
    the band id (distinct'd, since a pair can meet in two bands) — never
    corpus x corpus. For corpora with near-uniform lengths the band
    degenerates; compose with minhash_lsh_candidates as a candidate
    prefilter in that regime. O(len^2) DP cost per surviving candidate is
    the budget knob: apply to titles/prefixes, not whole documents.
    """
    if band is None:
        band = max_dist + 1
    if band < max(max_dist, 1):
        # adjacent-band emission only catches pairs whose blocks differ by
        # <= 1, which needs band >= max_dist (else a qualifying pair can
        # straddle two band boundaries and never meet)
        raise ValueError(f"band ({band}) must be >= max_dist ({max_dist})")
    vals = docs.select(
        F.col(id_col).alias("vid"),
        F.col(text_col).alias("txt"),
        F.floor(F.length(text_col) / band).cast("long").alias("b0"),
    )
    banded = vals.select(
        "vid", "txt", F.explode(F.array(F.col("b0"), F.col("b0") + 1)).alias("blk")
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b, (F.col("a.blk") == F.col("b.blk")) & (F.col("a.vid") < F.col("b.vid")))
        .select(
            F.col("a.vid").alias("id_a"),
            F.col("b.vid").alias("id_b"),
            F.col("a.txt").alias("ta"),
            F.col("b.txt").alias("tb"),
        )
        .distinct()  # a pair can collide in two adjacent bands
        .where(F.abs(F.length("ta") - F.length("tb")) <= max_dist)  # cheap gate
        .select(
            "id_a", "id_b", F.levenshtein("ta", "tb").alias("dist")
        )
        .where(F.col("dist") <= max_dist)
    )


def verify_candidate_pairs(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    min_jaccard: float = 0.8,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Exact-similarity confirmation of LSH candidate pairs: compute the true
    shingle-set jaccard for JUST the candidates and keep pairs >=
    ``min_jaccard``. This is the standard verify step between banding and
    cluster-removal — a single band collision is only probabilistic evidence,
    and dropping documents on unverified candidates deletes unique data.

    Cost: two joins of the (small) candidate set against the per-doc hashed
    shingle arrays — the corpus is scanned once for shingles; no pair
    explosion beyond the candidates themselves. Returns
    (a_col, b_col, jaccard)."""
    hs = _spread(docs).select(
        F.col(id_col).alias("vid"),
        hashed_shingles(_q(text_col), shingle).alias("hs"),
    )
    out = (
        pairs.join(hs.select(F.col("vid").alias(a_col), F.col("hs").alias("hs_a")), a_col)
        .join(hs.select(F.col("vid").alias(b_col), F.col("hs").alias("hs_b")), b_col)
    )
    inter = F.size(F.array_intersect("hs_a", "hs_b"))
    union = F.size("hs_a") + F.size("hs_b") - inter
    return (
        out.select(
            a_col, b_col,
            F.round(inter / union, 6).alias("jaccard"),
        )
        .where(F.col("jaccard") >= min_jaccard)
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.5,
) -> DataFrame:
    """EXACT word-set jaccard join with PPJoin-style prefix filtering —
    the scalable exact-similarity path (LSH is approximate; this is not).

    Tokens are globally ordered by ascending document frequency (rarest
    first — the canonical ordering that makes prefixes maximally
    selective), ties broken by token. A set of size ``n`` only needs its
    first ``n - ceil(t*n) + 1`` tokens indexed: if ``J(A,B) >= t`` the two
    prefixes MUST share a token (prefix-filter theorem), so joining on
    prefix tokens loses nothing. Candidates are then verified with exact
    jaccard — blocking is invisible in the result, which is exactly what
    the shared brute-force oracle asserts.

    Scale shape: the inverted index holds only prefix tokens (≈(1-t) of
    all tokens), and prefix tokens are by construction the RAREST — the
    high-frequency tokens that explode a naive token self-join never enter
    the index. The document-frequency join is co-keyed on the token with
    NO broadcast hint (r06): a web-scale vocabulary is 10⁸+ rows, and a
    forced broadcast is an executor OOM AQE cannot undo — AQE localizes
    the join only when the runtime vocab size fits.
    Returns (doc_a, doc_b, jaccard).
    """
    from pyspark import StorageLevel

    if not 0.0 < threshold <= 1.0:
        raise ValueError("threshold must be in (0, 1]")
    toks = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.array_distinct(
                F.filter(
                    F.split(F.lower(F.trim(F.col(text_col))), r"\s+"),
                    lambda t: t != "",
                )
            )
        ).alias("tok"),
    )
    freq = toks.groupBy("tok").agg(F.count("*").alias("df"))
    ordered = (
        toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("df", "tok"))),
                lambda s: s["tok"],
            ).alias("toks")
        )
        .withColumn("n", F.size("toks"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # guard ceil against FP noise: t*n that is mathematically integral can
    # round up (0.07*100 -> 7.000000000000001 -> ceil 8), shortening the
    # prefix by one token and silently missing qualifying pairs
    prefix_len = (
        F.col("n")
        - F.ceil(F.round(F.col("n") * threshold, 6)).cast("int")
        + 1
    )
    prefix = ordered.select(
        "doc_id", F.explode(F.slice("toks", F.lit(1), prefix_len)).alias("tok")
    )
    cand = (
        prefix.alias("a")
        .join(
            prefix.alias("b"),
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
    )
    a = ordered.select(
        F.col("doc_id").alias("doc_a"),
        F.col("toks").alias("toks_a"),
        F.col("n").alias("n_a"),
    )
    b = ordered.select(
        F.col("doc_id").alias("doc_b"),
        F.col("toks").alias("toks_b"),
        F.col("n").alias("n_b"),
    )
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    return (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .withColumn("n_common", inter)
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
                6,
            ),
        )
        .where(
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            >= threshold
        )
        .select("doc_a", "doc_b", "jaccard")
    )


def dedup_against_corpus(
    new_docs: DataFrame,
    existing: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Incremental-ingest dedup: drop new documents whose text already
    exists (byte-identical) in the existing corpus — the every-day shape of
    a continuously-fed training corpus, where re-deduping 100 TB of history
    per batch is not an option.

    One ``left_anti`` join of the new batch against the existing DIGEST set
    (32-byte sha256 rows, not documents): the history is touched only as a
    digest scan — at steady state keep the digest table materialized
    (bucketed on digest via ``sinks.bucketed``) and the anti join is
    Exchange-free on the history side. The new batch also self-dedups
    (keep smallest id) so a batch can't introduce its own duplicates.

    sha256, not md5: md5 chosen-prefix collisions are practical, so in a
    continuously-fed corpus a crafted history entry could silently drop a
    legitimate new document; sha256 removes that adversarial surface.
    """
    digest = F.sha2(F.col(text_col), 256)
    existing_digests = existing.select(digest.alias("digest")).distinct()
    return (
        drop_exact_duplicates(new_docs, id_col=id_col, text_col=text_col)
        .withColumn("digest", digest)
        .join(existing_digests, "digest", "left_anti")
        .drop("digest")
    )


def embedding_near_duplicates_blocked(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_blocks: int = 16,
) -> DataFrame:
    """EXACT cosine near-duplicate pairs — the scale route for the
    ``embedding_near_duplicates`` baseline with IDENTICAL output: vectors
    are hashed into ``num_blocks`` groups, every unordered block pair
    becomes ONE task (each row is replicated exactly ``num_blocks`` times
    — O(n·B) rows moved instead of the O(n²) pair rows the theta-join
    materializes), and each task scores its pair of blocks with a float64
    GEMM. Candidates within a safety margin of the threshold are re-scored
    with the same sequential left-fold ``cosine_similarity`` uses, so the
    emitted 6-decimal cosines are bit-identical to the baseline's.

    Work is still O(n²·dim) — exactness costs that — but it runs as
    B·(B+1)/2 independent BLAS tasks with bounded memory instead of one
    nested-loop join, and B tunes task granularity to the cluster.
    Returns (id_a, id_b, cosine ≥ threshold).
    """
    import math

    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    out_schema = StructType([
        StructField("id_a", LongType()),
        StructField("id_b", LongType()),
        StructField("cosine", DoubleType()),
    ])
    thr = float(threshold)
    margin = 1e-6

    def _score(pdf: pd.DataFrame) -> pd.DataFrame:
        lo = int(pdf["lo"].iloc[0])
        hi = int(pdf["hi"].iloc[0])
        a_rows = pdf[pdf["g"] == lo]
        b_rows = pdf[pdf["g"] == hi] if hi != lo else a_rows
        if not len(a_rows) or not len(b_rows):
            return pd.DataFrame({"id_a": [], "id_b": [], "cosine": []}).astype(
                {"id_a": "int64", "id_b": "int64", "cosine": "float64"}
            )
        ma = np.asarray(a_rows["v"].tolist(), dtype=np.float64)
        mb = np.asarray(b_rows["v"].tolist(), dtype=np.float64)
        ids_a = a_rows["vid"].to_numpy()
        ids_b = b_rows["vid"].to_numpy()
        na = np.sqrt((ma * ma).sum(axis=1))
        nb = np.sqrt((mb * mb).sum(axis=1))
        sims = (ma @ mb.T) / np.outer(na, nb)
        ii, jj = np.nonzero(sims >= thr - margin)
        out_a, out_b, out_c = [], [], []
        for i, j in zip(ii, jj):
            va, vb = ids_a[i], ids_b[j]
            # same-block tasks see each unordered pair twice ((i,j) and
            # (j,i)) — keep one side here instead of paying a
            # dropDuplicates shuffle over the whole output
            if lo == hi:
                if va >= vb:
                    continue
            elif va == vb:
                continue
            # bit-parity re-score: sequential left folds exactly like the
            # Column-side aggregate(zip_with(...)) baseline
            xa, xb = ma[i], mb[j]
            dot = 0.0
            sa = 0.0
            sb = 0.0
            for k in range(xa.shape[0]):
                dot = dot + float(xa[k]) * float(xb[k])
                sa = sa + float(xa[k]) * float(xa[k])
                sb = sb + float(xb[k]) * float(xb[k])
            cos = round(dot / (math.sqrt(sa) * math.sqrt(sb)), 6)
            if cos >= thr:
                out_a.append(int(min(va, vb)))
                out_b.append(int(max(va, vb)))
                out_c.append(cos)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "cosine": out_c})

    b_lit = int(num_blocks)
    d = embeddings.select(
        F.col(id_col).alias("vid"),
        F.col(vec_col).cast("array<double>").alias("v"),
        F.pmod(F.col(id_col), F.lit(b_lit)).alias("g"),
    )
    tasks = (
        d.withColumn("h", F.explode(F.sequence(F.lit(0), F.lit(b_lit - 1))))
        .withColumn("lo", F.least("g", "h"))
        .withColumn("hi", F.greatest("g", "h"))
        .where((F.col("g") == F.col("lo")) | (F.col("g") == F.col("hi")))
        .drop("h")
    )
    # every unordered pair is produced by exactly ONE task (cross-block
    # pairs live only in their (lo, hi) task; same-block pairs are halved
    # in the kernel), so no dedup shuffle is needed on the output
    return tasks.groupBy("lo", "hi").applyInPandas(_score, schema=out_schema)


def dedup_keep_best(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    quality: Column | None = None,
) -> DataFrame:
    """Cluster-level near-dedup with a RETENTION POLICY: group docs into
    transitive near-duplicate clusters (exact n-gram jaccard pairs →
    connected components) and keep the highest-quality doc per cluster
    instead of the arbitrary min-id — what a production corpus actually
    wants (drop the 9 mirrors, keep the cleanest copy).

    ``quality`` defaults to ``text.quality_score``; ties break on the
    smaller doc id (deterministic). Docs in no pair are their own
    singleton cluster and always kept. One pair-graph build + the
    pointer-jumping CC rounds + ONE window over (cluster, quality desc,
    id) — the window partitions by cluster so no global sort. Returns
    (doc_id, cluster_id, quality, keep)."""
    from quackosm_spark.operators.text import quality_score

    q = quality if quality is not None else quality_score(text_col)
    pairs = ngram_jaccard_pairs(docs, id_col=id_col, text_col=text_col,
                                threshold=threshold)
    clusters = neardup_clusters(pairs)
    base = docs.select(
        F.col(id_col).alias("doc_id"), q.alias("quality")
    )
    return keep_best_assignments(base, clusters)


def keep_best_assignments(
    base: DataFrame, clusters: DataFrame
) -> DataFrame:
    """THE retention policy, factored so `dedup_keep_best` and
    `recipes.curate_corpus(keep_best_quality=True)` share one definition
    (a silent divergence in the tie-break between two copies is exactly
    the bug class this prevents; q104's oracle pins this code path for
    both callers). ``base`` = (doc_id, quality); ``clusters`` =
    (doc_id, cluster_id). Docs absent from ``clusters`` are their own
    singleton cluster and always kept; within a cluster the highest
    quality wins, ties to the smaller doc_id. One window partitioned by
    cluster — no global sort. Returns (doc_id, cluster_id, quality,
    keep)."""
    from pyspark.sql import Window

    labeled = base.join(clusters, "doc_id", "left").select(
        "doc_id",
        F.coalesce(F.col("cluster_id"), F.col("doc_id")).alias("cluster_id"),
        "quality",
    )
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    return labeled.select(
        "doc_id", "cluster_id", "quality",
        (F.row_number().over(w) == 1).alias("keep"),
    )

def soft_dedup_weights(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.2,
    weight_col: str = "sample_weight",
    pairs: DataFrame | None = None,
) -> DataFrame:
    """SoftDeDup: DOWNWEIGHT near-duplicates instead of dropping them —
    every document gets a training ``sample_weight = round(1/|cluster|, 6)``
    where the cluster is its transitive near-duplicate component (the q37
    graph); documents in no pair are singletons with weight 1. Total weight
    of a duplicated passage stays ~1 regardless of how many mirrors exist,
    so the loss contribution of repeated content is normalized without the
    recall risk of a hard drop (the keep-one policies ``dedup_keep_best`` /
    ``neardup_clusters`` sit on the same graph when hard dedup is wanted).

    ``pairs`` overrides the default exact-jaccard pair graph (e.g. feed
    LSH-verified candidates from ``verify_candidate_pairs``). Scale shape:
    the CC rounds are the pointer-jumping kernel (bounded rounds, co-keyed
    joins); the weight table is cluster-membership-sized (only docs that
    appear in a pair) and joins back to the corpus on the id key — the
    corpus itself never enters the CC loop. APPENDS ``weight_col``; payload
    columns pass through.
    """
    if pairs is None:
        pairs = ngram_jaccard_pairs(
            docs, id_col=id_col, text_col=text_col, threshold=threshold
        )
    clusters = neardup_clusters(pairs)
    sizes = clusters.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("__csz")
    )
    weights = clusters.join(sizes, "cluster_id").select(
        F.col("doc_id").alias("__wid"),
        F.round(F.lit(1.0) / F.col("__csz"), 6).alias("__w"),
    )
    out = docs.join(weights, docs[id_col] == weights["__wid"], "left")
    return out.withColumn(
        weight_col, F.coalesce(F.col("__w"), F.lit(1.0))
    ).drop("__wid", "__w")

def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Corpus snapshot comparison — the audit step between two crawls /
    dataset versions: classify every document id as ``added`` (only in
    new), ``removed`` (only in old), ``changed`` (both, different
    content digest), or ``unchanged``. Returns (id, status); feed the
    ``added``+``changed`` slice to `dedup_against_corpus` for
    incremental ingestion, or diff counts per source for drift reports.

    Scale shape: both sides reduce map-side to (id, md5 digest) — the
    full texts never meet the join — then ONE full-outer hash join on
    the id key. No windows, no skew surface (ids are unique per side).

    Presence is carried as an explicit flag per side (NOT inferred from
    digest nullness): a document with NULL text still *exists* on its
    side, so it classifies by id presence, and the changed/unchanged
    split compares digests null-safely (NULL text == NULL text is
    unchanged; NULL vs non-NULL is changed).
    """
    o = old.select(
        F.col(id_col).alias("__did"),
        F.md5(F.col(text_col)).alias("__od"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias("__did"),
        F.md5(F.col(text_col)).alias("__nd"),
        F.lit(True).alias("__in_new"),
    )
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(F.col("__od").eqNullSafe(F.col("__nd")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return o.join(n, "__did", "full_outer").select(
        F.col("__did").alias(id_col), status.alias("status")
    )

def minhash_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = DEFAULT_SHINGLE,
) -> DataFrame:
    """Build the PERSISTABLE near-duplicate index of a corpus: one row per
    (doc, band) with the LSH bucket key and the doc's full minhash
    signature — ``(doc_id, sig, band, band_key)``. Write it as parquet
    (partition by ``band`` if bucket-pruned lookups matter) and APPEND
    each ingested batch's index rows: history never needs re-shingling.
    The incremental-lookup counterpart of the one-shot
    `minhash_lsh_candidates`; pair with `match_against_minhash_index`.
    Texts never enter the index — it is signature-only by design, so it
    is small (n_docs × bands rows) and privacy-friendlier than a text
    mirror."""
    sigs = minhash_signatures(docs, id_col, text_col, num_hashes, shingle)
    return sigs.select(
        "doc_id",
        "sig",
        F.posexplode(
            minhash_band_array("sig", num_hashes, bands)
        ).alias("band", "band_key"),
    )


def match_against_minhash_index(
    new_docs: DataFrame,
    index: DataFrame,
    threshold: float = 0.7,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 16,
    bands: int = 4,
    shingle: int = DEFAULT_SHINGLE,
    exact_verify_new: bool = False,
) -> DataFrame:
    """Incremental NEAR-dup lookup: match a new batch against a persisted
    `minhash_index` WITHOUT touching the history's texts. Candidates come
    from band-bucket equality (the q18 banding); each candidate pair is
    then scored by SIGNATURE-estimated jaccard — the fraction of agreeing
    minhash components, the standard unbiased estimator — and pairs at or
    above ``threshold`` are returned as ``(doc_id, matched_doc,
    est_jaccard)``. ``num_hashes``/``bands``/``shingle`` must match the
    index build (the signature family is the contract between batches).

    Estimated-not-exact is the explicit trade: exact verification
    (`verify_candidate_pairs`) needs both texts, which an incremental
    pipeline no longer has for history. At 16 hashes the estimator's σ is
    ~0.12 at j=0.5; raise ``num_hashes`` in the index when the decision
    threshold needs tighter bands. Scale shape: the join is bounded by
    band-bucket sizes (never corpus²), the agreement score is pure
    Column math, and history cost is an index SCAN, not a re-shingle.
    Drop the flagged ids (anti-join) for ingestion, or keep the pairs
    for audit; `dedup_against_corpus` remains the EXACT-duplicate
    incremental path.

    TWO-TIER semantics with ``exact_verify_new=True``: matched pairs
    whose ``matched_doc`` is itself in the new batch (its text IS
    available — the index may already contain the batch's appended
    rows, or the batch self-collides) are re-scored with the TRUE
    shingle jaccard (`verify_candidate_pairs`) and kept only when the
    exact score clears ``threshold``; new×history pairs stay
    estimator-gated, since history texts are gone by design. Output
    gains two columns: ``jaccard`` (exact, NULL on the estimated tier)
    and ``tier`` ('exact' | 'estimated'). The extra cost is one
    shingle pass over the new batch joined to ONLY the already-matched
    pairs — no new pair surface.

    Leaves ONE caller-owned cached frame (the new batch's signatures,
    consumed by both the banding probe and the post-pair sig join) —
    lifecycle per README "Cache lifecycle": LRU-evicted, or
    `spark.catalog.clearCache()` at a safe point in long sessions
    (hygiene test-locked).
    """
    from pyspark import StorageLevel

    # signatures are consumed twice (banding probe + the post-pair sig
    # join) — persist so the md5 shingle transform runs ONCE (the
    # novelty_score/oov_rate re-computation lesson)
    new_sigs = minhash_signatures(
        new_docs, id_col, text_col, num_hashes, shingle
    ).persist(StorageLevel.MEMORY_AND_DISK)
    new_banded = new_sigs.select(
        F.col("doc_id").alias("__nid"),
        F.explode(
            minhash_band_array("sig", num_hashes, bands)
        ).alias("band_key"),
    )
    hist_banded = index.select(F.col("doc_id").alias("__hid"), "band_key")
    # the banded join carries ONLY ids — the signature arrays (the wide
    # part of the row) never ride the band fan-out shuffle; they
    # re-attach to the deduplicated pair list by id. Measured at sf0.1:
    # 1.75M joined rows collapse to 1.5M pairs before any array moves.
    pairs = (
        new_banded.join(hist_banded, "band_key")
        .select("__nid", "__hid")
        .distinct()
    )
    hist_sigs = index.groupBy(F.col("doc_id").alias("__hid")).agg(
        F.first("sig").alias("__hsig")
    )
    cand = pairs.join(
        new_sigs.select(
            F.col("doc_id").alias("__nid"), F.col("sig").alias("__nsig")
        ),
        "__nid",
    ).join(hist_sigs, "__hid")
    agree = F.aggregate(
        F.zip_with(
            F.col("__nsig"), F.col("__hsig"),
            lambda a, b: (a == b).cast("int"),
        ),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    est = F.round(agree.cast("double") / F.lit(float(num_hashes)), 6)
    matches = cand.select(
        F.col("__nid").alias(id_col),
        F.col("__hid").alias("matched_doc"),
        est.alias("est_jaccard"),
    ).where(F.col("est_jaccard") >= threshold)
    if not exact_verify_new:
        return matches
    # no broadcast hint: the ids side is batch-sized (can be large);
    # let AQE pick broadcast vs shuffle from observed size.
    new_ids = new_docs.select(F.col(id_col).alias("matched_doc")).distinct()
    nn = matches.join(new_ids, "matched_doc", "left_semi")
    nh = matches.join(new_ids, "matched_doc", "left_anti")
    exact = verify_candidate_pairs(
        new_docs,
        nn.select(
            F.col(id_col).alias("__va"), F.col("matched_doc").alias("__vb")
        ),
        id_col=id_col,
        text_col=text_col,
        a_col="__va",
        b_col="__vb",
        min_jaccard=threshold,
        shingle=shingle,
    )
    verified = nn.join(
        exact.select(
            F.col("__va").alias(id_col),
            F.col("__vb").alias("matched_doc"),
            "jaccard",
        ),
        [id_col, "matched_doc"],
        "inner",
    ).select(
        id_col, "matched_doc", "est_jaccard", "jaccard",
        F.lit("exact").alias("tier"),
    )
    estimated = nh.select(
        id_col, "matched_doc", "est_jaccard",
        F.lit(None).cast("double").alias("jaccard"),
        F.lit("estimated").alias("tier"),
    )
    return verified.unionByName(estimated)


# Query-string parameters that never change page CONTENT — the standard
# web-crawl canonicalization strip list (analytics/click attribution).
DEFAULT_TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref", "referrer",
)


def canonical_url(
    url: Column | str,
    tracking_params: Sequence[str] = DEFAULT_TRACKING_PARAMS,
) -> Column:
    """Canonical form of a URL for crawl-level deduplication — the same
    page fetched through different tracking links / fragment anchors /
    default ports must collapse to ONE key. Rules (each a pure string
    transform, deliberately reproducible in ANSI SQL so the oracle can
    pin them):

    - scheme and host lowercase; a leading ``www.`` dropped
    - default ports stripped (``:80`` for http, ``:443`` for https)
    - the ``#fragment`` dropped (client-side only — same resource)
    - tracking query parameters dropped (``utm_*`` etc., case-insensitive
      on the NAME), remaining params sorted byte-wise so param order
      doesn't split a page into two keys; ``?`` dropped when nothing
      survives
    - a single trailing ``/`` dropped from a non-root path

    Pure Column math (regexp + array ops, JVM-side, map-only at any
    scale). Returns NULL for NULL input; a string with no ``://`` is
    returned trimmed-lowercase-host-rules-unapplied (treat as already
    canonical — garbage-in passthrough keeps the operator total).
    """
    u = F.col(url) if isinstance(url, str) else url
    scheme = F.lower(F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    rest = F.regexp_replace(rest, r"#.*$", "")          # fragment
    authority = F.regexp_extract(rest, r"^([^/?]*)", 1)
    tail = F.substring(rest, F.length(authority) + 1, F.lit(2_147_483_647))
    host = F.lower(authority)
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.when(
        (scheme == "http") & host.endswith(":80"),
        F.regexp_replace(host, r":80$", ""),
    ).when(
        (scheme == "https") & host.endswith(":443"),
        F.regexp_replace(host, r":443$", ""),
    ).otherwise(host)
    path = F.regexp_extract(tail, r"^([^?]*)", 1)
    path = F.when(
        (F.length(path) > 1) & path.endswith("/"),
        F.regexp_replace(path, r"/$", ""),
    ).otherwise(path)
    query = F.when(
        tail.contains("?"), F.regexp_replace(tail, r"^[^?]*\?", "")
    ).otherwise(F.lit(""))
    drop = [p.lower() for p in tracking_params]
    params = F.filter(
        F.split(query, "&"),
        lambda kv: (F.length(kv) > 0)
        & ~F.lower(F.regexp_extract(kv, r"^([^=]*)", 1)).isin(drop),
    )
    qcanon = F.array_join(F.array_sort(params), "&")
    canon = F.concat(
        scheme, F.lit("://"), host, path,
        F.when(F.length(qcanon) > 0, F.concat(F.lit("?"), qcanon)).otherwise(
            F.lit("")
        ),
    )
    return F.when(u.isNull(), F.lit(None).cast("string")).when(
        ~u.contains("://"), u
    ).otherwise(canon)


def url_duplicates(
    docs: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_params: Sequence[str] = DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """Crawl-level URL dedup: group documents by `canonical_url` and keep
    the smallest id per canonical key (the `drop_exact_duplicates`
    keep-rule, applied to the URL instead of the content digest — the
    cheap FIRST pass of web-pipeline dedup, before any text hashing).
    Returns (canonical_url, keep_id, dup_ids sorted, n_dups) for groups
    with at least one duplicate. One groupBy shuffle on the canonical
    key; the canonicalization itself is map-only Column math.

    Ids are DEDUPLICATED per canonical key (`collect_set`), so a doc id
    that appears twice under one URL (re-crawled row, upstream join
    fan-out) never lists itself as its own duplicate — `dup_ids` holds
    only ids strictly distinct from `keep_id`, and a key whose rows all
    share one id emits nothing (ADVICE r9: the old collect_list shape
    put keep_id into dup_ids, so a downstream anti-join deleted every
    copy of the kept page).
    """
    c = canonical_url(F.col(url_col), tracking_params).alias("canonical_url")
    return (
        docs.select(c, F.col(id_col).alias("__uid"))
        .where(F.col("canonical_url").isNotNull())
        .groupBy("canonical_url")
        .agg(
            F.min("__uid").alias("keep_id"),
            F.array_sort(F.collect_set("__uid")).alias("__all"),
        )
        .where(F.size("__all") > 1)
        .select(
            "canonical_url",
            "keep_id",
            F.expr("slice(__all, 2, size(__all) - 1)").alias("dup_ids"),
            (F.size("__all") - 1).alias("n_dups"),
        )
    )


# common two-level public suffixes for the registered-domain heuristic —
# the well-known ccTLD second-level registries; a full Public Suffix List
# is a data file callers can pass in via `two_level_suffixes`
DEFAULT_TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "go.jp",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.nz", "net.nz", "org.nz",
    "co.in", "net.in", "org.in", "ac.in",
    "co.za", "org.za", "com.br", "net.br", "org.br",
    "com.mx", "com.ar", "com.cn", "net.cn", "org.cn",
    "com.tw", "com.sg", "com.hk", "com.my", "co.kr", "or.kr",
    "com.tr", "com.pl", "co.il", "com.ua",
)


def registered_domain(
    url: Column | str,
    two_level_suffixes: Sequence[str] = DEFAULT_TWO_LEVEL_SUFFIXES,
) -> Column:
    """The REGISTERED domain of a URL (`example.co.uk` for
    `https://a.b.example.co.uk/x`) — the crawl-curation grouping key for
    domain capping, domain mixing, and per-site quality stats (C4 and
    RefinedWeb both cap per registered domain, not per host, so
    `a.blogspot.com` and `b.blogspot.com` don't evade the cap as
    "different sites"... conversely the suffix list is what keeps
    `example.co.uk` from collapsing into `co.uk`).

    Heuristic, deliberately: the full Public Suffix List is a data file;
    `two_level_suffixes` covers the common ccTLD second-level registries
    and callers with the PSL can pass their own list. Rules — pure
    Column math, map-only:

    - host = lowercased authority, `www.` and any `:port` stripped
    - IP hosts (all-numeric labels) return whole
    - if the last TWO labels form a listed suffix and a third label
      exists → last three labels; else last two; a dotless host returns
      whole
    - NULL stays NULL; a non-URL string (no `://`) is treated as a bare
      host (garbage-in passthrough, same contract as `canonical_url`)
    """
    u = F.col(url) if isinstance(url, str) else url
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":\d+$", "")
    labels = F.split(host, r"\.")
    n = F.size(labels)
    last2 = F.concat_ws(
        ".", F.element_at(labels, -2), F.element_at(labels, -1)
    )
    last3 = F.concat_ws(
        ".",
        F.element_at(labels, -3),
        F.element_at(labels, -2),
        F.element_at(labels, -1),
    )
    suffixes = F.array(*[F.lit(s) for s in two_level_suffixes])
    dom = (
        F.when(host.rlike(r"^\d+(\.\d+)+$"), host)
        .when((n >= 3) & F.array_contains(suffixes, last2), last3)
        .when(n >= 2, last2)
        .otherwise(host)
    )
    return F.when(u.isNull(), F.lit(None).cast("string")).otherwise(dom)


class PslRules:
    """Parsed Public Suffix List (publicsuffix.org/list) rule sets.

    ``exact``: plain rules of any depth ('com', 'co.uk',
    'pref.aichi.jp'); ``wildcard``: the BASE of '*.'-rules ('ck' for
    '*.ck' — matches any label plus the base); ``exception``: '!'-rules
    ('www.ck' — the named domain is registrable even though a wildcard
    would make it a public suffix). All lowercased, no leading dot.
    """

    __slots__ = ("exact", "wildcard", "exception")

    def __init__(
        self,
        exact: set[str] | None = None,
        wildcard: set[str] | None = None,
        exception: set[str] | None = None,
    ) -> None:
        self.exact = set(exact or ())
        self.wildcard = set(wildcard or ())
        self.exception = set(exception or ())

    @property
    def two_level_suffixes(self) -> tuple[str, ...]:
        """The 2-label exact rules, sorted — drop-in for
        `registered_domain(two_level_suffixes=...)` when only the
        Column-heuristic path is needed."""
        return tuple(sorted(s for s in self.exact if s.count(".") == 1))

    @property
    def max_labels(self) -> int:
        """Deepest rule depth in label counts (wildcards count their
        implicit extra label) — the number of candidate-suffix joins
        `resolve_registered_domain` plans."""
        depths = (
            [s.count(".") + 1 for s in self.exact]
            + [s.count(".") + 2 for s in self.wildcard]
            + [s.count(".") + 1 for s in self.exception]
        )
        return max(depths, default=1)


def parse_psl_rules(lines) -> PslRules:
    """Parse Public Suffix List text (an iterable of lines or one
    string) into `PslRules`. Comments (`//`), blank lines, and anything
    after whitespace on a rule line are ignored, per the PSL format
    spec; rules are lowercased; the universal '*' default rule is
    implicit and not stored."""
    if isinstance(lines, str):
        lines = lines.splitlines()
    rules = PslRules()
    for raw in lines:
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        rule = line.split()[0].lower().lstrip(".")
        if rule == "*":
            continue
        if rule.startswith("!"):
            rules.exception.add(rule[1:])
        elif rule.startswith("*."):
            rules.wildcard.add(rule[2:])
        else:
            rules.exact.add(rule)
    return rules


def load_public_suffix_list(path) -> PslRules:
    """Load a Public Suffix List data file (the real
    `public_suffix_list.dat` or any same-format subset) from ``path``.
    The built-in DEFAULT_TWO_LEVEL_SUFFIXES heuristic remains the
    zero-dependency fallback when no PSL file is shipped; with one,
    either feed `rules.two_level_suffixes` to the Column-level
    `registered_domain` or use `resolve_registered_domain` for full
    PSL semantics (any-depth rules, wildcards, exceptions)."""
    with open(path, encoding="utf-8") as fh:
        return parse_psl_rules(fh)


def resolve_registered_domain(
    docs: DataFrame,
    rules: PslRules,
    url_col: str = "url",
    out_col: str = "domain",
) -> DataFrame:
    """Full-PSL registered-domain resolution as a DataFrame op: adds
    ``out_col`` with the registered (PSL-registrable) domain of
    ``url_col``. The real list has ~9,000 rules — far past what the
    Column heuristic's literal-array linear scan should carry per row —
    so matching here is ``max_labels`` BROADCAST HASH JOINS (one per
    candidate-suffix depth, each against the tiny rules table): map-only,
    no shuffle of the corpus, O(1) lookups per row.

    PSL algorithm (publicsuffix.org/list): among rules matching the
    host's trailing labels, an exception rule wins outright (its suffix
    is the rule minus its first label); otherwise the LONGEST of the
    exact matches and wildcard matches (base + one label) applies, with
    the implicit '*' default (suffix = last label) as the floor. The
    registered domain is the public suffix plus one label.

    Contract deltas vs the Column heuristic `registered_domain`:
    ``www.`` is NOT pre-stripped (the algorithm subsumes it —
    `www.example.com` resolves to `example.com` naturally, and
    stripping would corrupt exception rules like `!www.ck`); a host
    that IS a public suffix (or too short) returns itself; IP hosts
    return whole; NULL url stays NULL; port and scheme handling match.
    """
    spark = docs.sparkSession
    kmax = rules.max_labels
    rows = (
        [(s, s.count(".") + 1, "e") for s in rules.exact]
        + [(b, b.count(".") + 1, "w") for b in rules.wildcard]
        + [(x, x.count(".") + 1, "x") for x in rules.exception]
    )
    u = F.col(url_col)
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    host = F.regexp_replace(host, r":\d+$", "")
    d = docs.withColumn("__host", host).withColumn(
        "__lbl", F.split(F.col("__host"), r"\.")
    )
    n = F.size("__lbl")
    # one withColumns call (a withColumn loop costs one full analysis pass
    # per depth — O(kmax²) plan work for the 5+-depth real PSL)
    d = d.withColumns(
        {
            f"__cand{k}": F.when(
                n >= k,
                F.concat_ws(".", F.slice("__lbl", n - F.lit(k) + 1, k)),
            )
            for k in range(1, kmax + 1)
        }
    )
    if rows:
        from pyspark.sql.types import (
            IntegerType,
            StringType,
            StructField,
            StructType,
        )

        rdf = spark.createDataFrame(
            rows,
            StructType(
                [
                    StructField("__sfx", StringType()),
                    StructField("__k", IntegerType()),
                    StructField("__kind", StringType()),
                ]
            ),
        )
        for k in range(1, kmax + 1):
            rk = (
                rdf.where(F.col("__k") == k)
                .groupBy(F.col("__sfx").alias(f"__sfx{k}"))
                .agg(
                    F.max(F.col("__kind") == "e").alias(f"__e{k}"),
                    F.max(F.col("__kind") == "w").alias(f"__w{k}"),
                    F.max(F.col("__kind") == "x").alias(f"__x{k}"),
                )
            )
            d = d.join(
                F.broadcast(rk),
                d[f"__cand{k}"] == rk[f"__sfx{k}"],
                "left",
            )
    else:
        d = d.withColumns(
            {
                f"__{kind}{k}": F.lit(None).cast("boolean")
                for k in range(1, kmax + 1)
                for kind in ("e", "w", "x")
            }
        )
    exc_len = F.greatest(
        *[
            F.when(F.col(f"__x{k}"), F.lit(k))
            for k in range(1, kmax + 1)
        ],
        F.lit(None).cast("int"),
    )
    exact_len = F.greatest(
        *[
            F.when(F.col(f"__e{k}"), F.lit(k))
            for k in range(1, kmax + 1)
        ],
        F.lit(None).cast("int"),
    )
    wild_len = F.greatest(
        *[
            F.when(F.col(f"__w{k}") & (n >= k + 1), F.lit(k + 1))
            for k in range(1, kmax + 1)
        ],
        F.lit(None).cast("int"),
    )
    suffix_len = F.coalesce(
        exc_len - 1, F.greatest(exact_len, wild_len, F.lit(1))
    )
    reg = (
        F.when(u.isNull(), F.lit(None).cast("string"))
        .when(F.col("__host").rlike(r"^\d+(\.\d+)+$"), F.col("__host"))
        .when(
            n > suffix_len,
            F.concat_ws(
                ".", F.slice("__lbl", n - suffix_len, suffix_len + 1)
            ),
        )
        .otherwise(F.col("__host"))
    )
    drop = (
        ["__host", "__lbl"]
        + [f"__cand{k}" for k in range(1, kmax + 1)]
        + [f"__sfx{k}" for k in range(1, kmax + 1) if rows]
        + [f"__{t}{k}" for k in range(1, kmax + 1) for t in "ewx"]
    )
    return d.withColumn(out_col, reg).drop(*drop)


def normalize_text(text: Column | str) -> Column:
    """Aggressive dedup normalization: lowercase, strip every char
    outside [0-9a-z\\s], collapse whitespace runs to one space, trim —
    the standard pre-hash canonicalization (SlimPajama / RefinedWeb
    style) that makes exact dedup catch trivially-reformatted copies
    (case, punctuation, line-wrap churn) that byte hashing misses.
    Pure Column regexp math, map-only."""
    c = F.col(text) if isinstance(text, str) else text
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(c), r"[^0-9a-z\s]", " "),
            r"\s+",
            " ",
        )
    )


def normalized_duplicates(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """`exact_duplicates` over `normalize_text` instead of raw bytes:
    groups whose documents are identical up to case/punctuation/
    whitespace. Returns (digest, keep_id, n_docs) with digest =
    md5(normalized text) — same shape and keep-smallest-id rule as the
    byte-exact operator, same ONE-shuffle scale profile (the normalizer
    is scan-stage). Sits between byte-exact and shingle near-dup in the
    dedup ladder: run it after `exact_duplicates` (strict superset of
    its groups) and before the quadratic-ish near-dup passes it
    cheapens."""
    return exact_duplicates(
        docs.select(
            F.col(id_col), normalize_text(F.col(text_col)).alias("__norm")
        ),
        id_col,
        "__norm",
    )


def drop_duplicate_segments(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seg_words: int = 10,
    by_lines: bool = False,
) -> DataFrame:
    """FIRST-OCCURRENCE-WINS cross-document segment dedup with
    reassembly — the RefinedWeb/CCNet "line dedup" pass: a segment that
    appears in several documents survives ONLY in the earliest one
    (smallest id, then position), every later copy is cut and the
    survivors are re-joined in order. Complements
    `remove_frequent_segments` (which cuts a frequent segment from
    EVERY doc including the first — boilerplate removal, not dedup);
    here each segment keeps exactly one home, so corpus information is
    preserved while repetition is not. Returns (doc_id, text_clean,
    n_kept) for every input doc (empty string when nothing survives —
    chain `filter_quality`/`min_tokens` downstream to drop husks).

    Scale shape: segmentation is scan-stage Column math (the
    `_segments` idiom — delimiter-agnostic, swap in newline splitting
    for corpora with real lines); ONE window PARTITIONED BY md5(segment)
    ordered by (id, pos) — partition size = that segment's duplicate
    count, the thing being removed; reassembly is one groupBy on the
    doc id over the SAME rows (r11: later copies are dropped inside the
    reassembly aggregate, so there is no second corpus scan and no
    re-attach join for all-duplicate/empty docs — `posexplode_outer`
    keeps them as a NULL-segment row, routed through a per-doc window
    key so empty docs never pile into one NULL partition). No driver
    data, no global sort.

    ``by_lines=True`` segments on newlines (trimmed, empties dropped) —
    the production form: line boundaries are content-anchored, so the
    same paragraph matches at ANY offset. The default fixed-stride word
    segmentation only matches stride-ALIGNED repetition (an offset copy
    re-segments differently) — fine for the word-soup test corpus and
    for fixed-block shard formats, wrong for prose; use lines there.
    Reassembly joins with a space either way (a rebuilt corpus for
    training, not a byte-faithful reconstruction).
    """
    if by_lines:
        lines = F.filter(
            F.transform(
                F.split(F.col(text_col), "\n"), lambda ln: F.trim(ln)
            ),
            lambda ln: ln != "",
        )
        seg_arr = F.transform(
            lines,
            lambda ln, i: F.struct(
                (i + 1).cast("int").alias("pos"), ln.alias("seg")
            ),
        )
        segs = docs.select(
            F.col(id_col).alias("__did"),
            F.posexplode_outer(seg_arr).alias("__i", "__s"),
        ).select(
            "__did",
            F.col("__s.pos").alias("__pos"),
            F.col("__s.seg").alias("__seg"),
        )
    else:
        # two-step word projection — see _segments_from_words_sql for why
        # the split must be a column, not an inlined lambda subexpression
        segs = docs.select(
            F.col(id_col).alias("__did"),
            F.expr(_words_sql(_q(text_col))).alias("__w"),
        ).select(
            "__did",
            F.posexplode_outer(
                F.expr(_segments_from_words_sql("__w", seg_words))
            ).alias("__i", "__s"),
        ).select(
            "__did",
            F.col("__s.pos").alias("__pos"),
            F.col("__s.seg").alias("__seg"),
        )
    # NULL segments (empty docs) get a per-doc sentinel partition key — a
    # leading space cannot occur in a real segment (words are non-empty) —
    # so they ride the same window without a single giant NULL partition.
    part_key = F.md5(
        F.coalesce(
            F.col("__seg"), F.concat(F.lit(" "), F.col("__did").cast("string"))
        )
    )
    w = Window.partitionBy(part_key).orderBy("__did", "__pos")
    text_clean, n_kept = _reassemble_sql(
        "((__rn = 1) AND __seg IS NOT NULL)", "__pos", "__seg"
    )
    return (
        segs.withColumn("__rn", F.row_number().over(w))
        .groupBy("__did")
        .agg(
            text_clean.alias("text_clean"),
            n_kept.alias("n_kept"),
        )
        .select(F.col("__did").alias(id_col), "text_clean", "n_kept")
    )


def remove_repeated_substrings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    window: int = 50,
) -> DataFrame:
    """Exact cross-document repeated-substring removal at ARBITRARY word
    offsets — the distributed stand-in for the suffix-array pass of
    "Deduplicating Training Data Makes Language Models Better" (Lee et
    al. 2021), and the dedup-ladder rung `drop_duplicate_segments`
    cannot reach: its default mode only matches stride-ALIGNED
    repetition, so a passage copied into another document at a shifted
    offset re-segments differently and slips through. Here every
    OVERLAPPING ``window``-word n-gram is indexed, so a repeated span of
    >= ``window`` words is caught wherever it starts.

    FIRST-OCCURRENCE-WINS: for each duplicated n-gram the globally
    earliest occurrence (smallest id, then word offset) keeps its words;
    every later occurrence marks its ``window``-word span for deletion
    (in-document repeats included). A repeated span longer than
    ``window`` is removed in full from the later docs — all of its
    sliding windows are themselves duplicated — while the first home
    keeps the whole span. Docs shorter than ``window`` words emit no
    n-grams and pass through unchanged (too short to certify repetition
    at this threshold; lower ``window`` rather than special-casing).
    Returns (doc_id, text_clean, n_removed) for EVERY input doc,
    text_clean = surviving words joined by a space ('' when nothing
    survives), n_removed = words cut.

    Scale shape (all corpus-sized steps are one shuffle each, nothing
    driver-sized): n-gram construction is scan-stage Column math
    (sequence + slice over the word array — O(window) per gram, the
    inherent cost of offset-free matching); ONE window PARTITIONED BY
    md5(gram) ordered by (id, start) — partition size = that gram's
    occurrence count, the thing being removed; marked spans explode to
    covered word positions (duplicate-volume-bounded, not
    corpus-bounded); survivors are a co-partitioned (id, pos) left join
    whose covered flag is dropped inside ONE reassembly groupBy on the
    doc id (r11: the total word count rides the same aggregate, so the
    old second corpus scan + distinct + re-attach join are gone). At extreme scale swap the
    md5 partition key for a 128-bit binary hash of the gram to shrink
    shuffle bytes — the gram string itself never needs to leave the
    first shuffle. Reference semantics model: the ExactSubstr dedup of
    Lee et al. 2021 (code: google-research/deduplicate-text-datasets);
    word-granular here rather than byte-granular so the removal
    boundary is always a token boundary.
    """
    if window < 2:
        raise ValueError("remove_repeated_substrings: window must be >= 2")
    trimmed = F.trim(F.col(text_col))
    words = F.when(
        F.length(trimmed) == 0, F.array().cast("array<string>")
    ).otherwise(F.split(trimmed, r"\s+"))
    d = _spread(
        docs.select(F.col(id_col).alias("__did"), words.alias("__w"))
    )
    grams = (
        d.where(F.size("__w") >= window)
        .select(
            "__did",
            F.explode(
                F.expr(
                    f"transform(sequence(1, (size(__w) - {window}) + 1),"
                    f" i -> struct(cast(i as int) as start,"
                    f" concat_ws(' ', slice(__w, i, {window})) as gram))"
                )
            ).alias("__g"),
        )
        .select(
            "__did",
            F.col("__g.start").alias("__start"),
            F.col("__g.gram").alias("__gram"),
        )
    )
    w = Window.partitionBy(F.md5(F.col("__gram"))).orderBy(
        "__did", "__start"
    )
    marked = (
        grams.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") > 1)
        .select("__did", "__start")
    )
    covered = marked.select(
        "__did",
        F.explode(
            F.sequence(
                F.col("__start"), F.col("__start") + F.lit(window - 1)
            )
        ).alias("__pos"),
    ).distinct()
    toks = d.select(
        "__did",
        F.posexplode_outer("__w").alias("__i", "__word"),
    ).select(
        "__did",
        (F.col("__i") + 1).alias("__pos"),
        "__word",
    )
    flagged = toks.join(
        covered.withColumn("__cut", F.lit(True)), ["__did", "__pos"], "left"
    )
    text_clean, _ = _reassemble_sql(
        "(__cut IS NULL AND __word IS NOT NULL)", "__pos", "__word"
    )
    return (
        flagged.groupBy("__did")
        .agg(
            text_clean.alias("text_clean"),
            F.expr("count_if(__cut IS NOT NULL)").cast("bigint").alias(
                "n_removed"
            ),
        )
        .select(F.col("__did").alias(id_col), "text_clean", "n_removed")
    )
