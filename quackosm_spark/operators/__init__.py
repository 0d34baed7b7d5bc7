"""Large-scale data-pipeline operators.

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine
- ``similarity`` — brute-force / LSH-bucketed / IVF / GEMM-vectorized ANN
- ``text``       — language ID, quality scoring, token counting, fingerprinting
- ``multimodal`` — opaque-binary media columns: decode/feature/resize/frame ops
- ``osm``        — OSM corpus statistics (taginfo-style histograms)
"""

from quackosm_spark.operators import dedup, multimodal, osm, similarity, text

__all__ = ["dedup", "multimodal", "osm", "similarity", "text"]
