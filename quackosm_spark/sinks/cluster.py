"""Multi-column Z-order clustering sink: data skipping for arbitrary
numeric predicates.

Generalizes the spatial Hilbert sort (plans/output.spatial_sort, reference
O3) to ANY numeric column set: rows are ordered along a Z-curve over the
normalized column space, so each output file covers a small hyper-rectangle
of the value domain and parquet row-group/footer min-max statistics prune
almost everything for point/range predicates on ANY clustered column —
the layout trick behind Delta/Iceberg OPTIMIZE ZORDER, here as a plain
parquet write. One agg pass for the bounds, one range shuffle, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key(
    cols: list[str],
    bounds: dict[str, tuple[float, float]],
    bits: int = 16,
) -> Column:
    """Interleave the ``bits``-bit normalized values of ``cols`` into one
    Z-curve key (pure Column bit arithmetic — codegen, no Python).

    The interleaved key occupies ``bits * len(cols)`` bits; it must fit in
    the 63 value bits of a signed long or high bits flip the sign / wrap
    mod 64 and silently corrupt the ordering, so ``bits`` is auto-scaled
    down to ``63 // len(cols)`` when the requested width doesn't fit.
    """
    n = len(cols)
    if n == 0:
        raise ValueError("zorder_key needs at least one column")
    if bits * n > 63:
        bits = 63 // n
    if bits < 1:
        raise ValueError(f"too many z-order columns ({n}): need bits >= 1 each")
    quantized = []
    for c in cols:
        lo, hi = bounds[c]
        span = (hi - lo) or 1.0
        q = F.least(
            F.lit((1 << bits) - 1),
            F.greatest(
                F.lit(0),
                ((F.col(c).cast("double") - F.lit(lo)) / F.lit(span)
                 * F.lit((1 << bits) - 1)).cast("long"),
            ),
        )
        quantized.append(q)
    key = F.lit(0).cast("long")
    for b in range(bits):
        for i, q in enumerate(quantized):
            bit = F.shiftright(q, b).bitwiseAND(F.lit(1))
            key = key + F.shiftleft(bit, b * n + i)
    return key


def cluster_write(
    df: DataFrame,
    path: str,
    cols: list[str],
    num_files: int = 16,
    bits: int = 16,
    compression: str = "zstd",
) -> None:
    """Write ``df`` as parquet Z-ordered on ``cols``: bounds in one agg
    pass, ``repartitionByRange`` on the interleaved key (range shuffle —
    each output file is one contiguous Z-range ≈ one small value-space
    tile), rows sorted within files so row groups tile even finer."""
    row = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"{c}__mn") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"{c}__mx") for c in cols],
    ).collect()[0]
    bounds = {c: (row[f"{c}__mn"], row[f"{c}__mx"]) for c in cols}
    key = zorder_key(cols, bounds, bits)
    (
        df.withColumn("__zkey", key)
        .repartitionByRange(num_files, "__zkey")
        .sortWithinPartitions("__zkey")
        .drop("__zkey")
        .write.option("compression", compression)
        .mode("overwrite")
        .parquet(path)
    )
