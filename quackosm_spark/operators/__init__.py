"""Large-scale data-pipeline operators.

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding
                   cosine, transitive clustering, decontamination, CCNet
                   segment-level, SemDeDup, edit-distance
- ``similarity`` — brute-force / LSH-bucketed / IVF / GEMM-vectorized ANN
- ``search``     — BM25 keyword scoring / top-k retrieval
- ``text``       — language ID, quality scoring, token counting (whitespace,
                   BPE-ish estimate, and REAL sample-trained BPE), OOV rate,
                   bigram LM logprob, cross-source overlap audit,
                   fingerprinting, repetition ratio, PII detection/redaction,
                   boilerplate n-grams
- ``stats``      — corpus rollups (grouping sets), pivot cross-tabs, quality
                   deciles, HLL++ approximate distinct counts
- ``mix``        — training-mix construction: sequence packing, deterministic /
                   fixed-n sampling, token-budget mixtures, token-budget
                   shard manifests (two-pass parallel prefix sum)
- ``temporal``   — as-of join, interval join, exact quantiles, lag/lead deltas,
                   latest-per-key, SCD-2 history, spike detection
- ``quantiles``  — bucketed two-pass EXACT per-group quantiles (bit-equal to
                   ``percentile()`` with bounded per-task state; backs
                   exact_quantiles / winsorize / the recipe cutoffs)
- ``skew``       — salted join / salted count-distinct
- ``multimodal`` — opaque-binary media columns: decode/feature/resize/frame ops
- ``osm``        — OSM corpus statistics (taginfo-style histograms)
- ``recipes``    — end-to-end corpus-curation chain composing the above
- ``bloom``      — distributed Bloom filter (membership at set sizes past
                   exact-broadcast) + bloom-prefiltered exact decontamination
- ``graph``      — iterative graph algorithms (PageRank with dangling-mass
                   redistribution)
- ``ml``         — single-pass sufficient-statistics model fitting: ridge
                   regression via normal equations (one scan, O(p^2) bytes
                   to the driver), scan-stage linear scoring, one-pass
                   pairwise correlation matrix
"""

from quackosm_spark.operators import (
    bloom,
    dedup,
    graph,
    mix,
    ml,
    multimodal,
    osm,
    quantiles,
    recipes,
    search,
    similarity,
    skew,
    stats,
    temporal,
    text,
)

__all__ = [
    "bloom",
    "dedup",
    "graph",
    "mix",
    "ml",
    "multimodal",
    "osm",
    "quantiles",
    "recipes",
    "search",
    "similarity",
    "skew",
    "stats",
    "temporal",
    "text",
]
