"""Distributed Bloom filter: constant-size membership state for the scale
regime where even a broadcast of the exact key set is too big.

The filter is a DataFrame of ``m_bits/64`` (word_idx, bits) rows built with
a bitwise-OR aggregation — mergeable (union + bit_or), tiny (1 GB of bloom
≈ 8.6 billion bits ≈ all of a multi-TB benchmark suite at 1% FP), and
broadcastable. Standard guarantees: NO false negatives ever; false-positive
rate ≈ (1 − e^{−k·n/m})^k. Pair with an exact verify join on the survivors
(``contamination_matches_bloom``) and the composition stays EXACT while the
corpus-side scan discards ~everything map-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _positions(item: Column, m_bits: int, k: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(item, F.lit(seed)), F.lit(m_bits))
        for seed in range(k)
    ]


def bloom_build(
    items: DataFrame,
    item_col: str = "item",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Build the filter: every item sets ``k`` hash-chosen bits. One
    shuffle of at most ``m_bits/64`` rows per partition after map-side
    bit_or combine. Returns (word_idx, bits)."""
    pos = F.explode(F.array(*_positions(F.col(item_col), m_bits, k))).alias("p")
    return (
        items.select(pos)
        .select(
            (F.col("p") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 64 AS INT))").alias(
                "bit"
            ),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )


def bloom_might_contain(
    bloom: DataFrame,
    probes: DataFrame,
    item_col: str = "item",
    m_bits: int = 1 << 16,
    k: int = 4,
) -> DataFrame:
    """Filter ``probes`` to rows the bloom filter might contain (all k bits
    set). The filter table broadcasts; the probe side never shuffles —
    membership testing is map-side at any probe volume. Keeps the input
    columns of surviving rows (false positives possible, negatives never).

    Row multiplicity is preserved: the k per-row probes are regrouped on a
    per-row surrogate id, not on the value columns, so duplicate probe rows
    each survive (or not) independently. Internal temp columns are
    collision-checked against the probe schema.
    """
    rid = "__bloom_rid"
    tmp = (rid, "__bloom_p", "__bloom_w", "__bloom_b", "bits", "word_idx")
    clash = [c for c in probes.columns if c in tmp]
    if clash:
        raise ValueError(f"probe columns collide with bloom internals: {clash}")
    probe = (
        probes.withColumn(rid, F.monotonically_increasing_id())
        .withColumn(
            "__bloom_p",
            F.explode(F.array(*_positions(F.col(item_col), m_bits, k))),
        )
        .withColumn("__bloom_w", (F.col("__bloom_p") / 64).cast("long"))
        .withColumn(
            "__bloom_b",
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(__bloom_p % 64 AS INT))"),
        )
    )
    hit = probe.join(
        F.broadcast(bloom), probe["__bloom_w"] == bloom["word_idx"], "left"
    ).withColumn(
        "__bloom_set",
        F.coalesce(F.col("bits"), F.lit(0)).bitwiseAND(F.col("__bloom_b")) != 0,
    )
    return (
        hit.groupBy(rid)
        .agg(
            *[F.first(c).alias(c) for c in probes.columns],
            F.bool_and("__bloom_set").alias("__bloom_all"),
        )
        .where(F.col("__bloom_all"))
        .select(*probes.columns)
    )


def contamination_matches_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 5,
    min_shared: int = 1,
    m_bits: int = 1 << 18,
    k: int = 4,
) -> DataFrame:
    """Decontamination at the scale where the benchmark n-gram set no
    longer broadcasts exactly: a bloom filter of the benchmark grams
    rejects ~all corpus grams map-side; only bloom survivors reach the
    exact verification join, so the RESULT is identical to
    ``dedup.contamination_matches`` (same oracle) — the bloom is pure
    traffic reduction, never a correctness trade."""
    from quackosm_spark.operators.dedup import _spread
    from quackosm_spark.operators.text import word_ngrams

    doc_grams = _spread(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram"),
    )
    bench_grams = benchmark.select(
        F.explode(word_ngrams(F.col(text_col), n)).alias("ngram")
    ).distinct()
    bloom = bloom_build(bench_grams, "ngram", m_bits=m_bits, k=k)
    candidates = bloom_might_contain(
        bloom, doc_grams, "ngram", m_bits=m_bits, k=k
    )
    return (
        candidates.join(F.broadcast(bench_grams), "ngram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_shared"))
        .where(F.col("n_shared") >= min_shared)
    )
