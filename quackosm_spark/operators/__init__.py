"""Large-scale data-pipeline operators.

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine
- ``similarity`` — brute-force / LSH-bucketed / IVF / GEMM-vectorized ANN
- ``text``       — language ID, quality scoring, token counting, fingerprinting,
                   repetition ratio, PII detection/redaction
- ``mix``        — training-mix construction: sequence packing, deterministic sampling
- ``multimodal`` — opaque-binary media columns: decode/feature/resize/frame ops
- ``osm``        — OSM corpus statistics (taginfo-style histograms)
"""

from quackosm_spark.operators import dedup, mix, multimodal, osm, similarity, text

__all__ = ["dedup", "mix", "multimodal", "osm", "similarity", "text"]
