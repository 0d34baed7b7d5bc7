"""Graph operators: iterative algorithms expressed as DataFrame loops.

Complements ``dedup.neardup_clusters`` (connected components). The driver
coordinates iterations — each round is a co-partitioned join + aggregate,
never a collect of edge or node data — so the pattern scales to
billion-edge graphs: per-iteration state is one (node, value) table
hash-partitioned on node.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _pagerank_round(
    nodes: DataFrame,
    contrib_edges: DataFrame,
    outdeg: DataFrame,
    pr: DataFrame,
    n: int,
    damping: float,
) -> DataFrame:
    """Build one PageRank round's (node, pr) DataFrame, unmaterialized.

    The dangling mass is a 1-row aggregate attached via broadcast
    cross-join rather than collected to the driver, so materializing the
    returned frame is the round's ONLY action. Arithmetic is identical to
    the collected-scalar form: ``dm / n`` is the same IEEE double divide
    whether the numerator is a Python float or a column.
    """
    dm = pr.join(outdeg, "node", "left_anti").agg(
        F.coalesce(F.sum("pr"), F.lit(0.0)).alias("dm")
    )
    inflow = (
        contrib_edges.join(pr.withColumnRenamed("node", "src"), "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum(F.col("pr") / F.col("deg")).alias("inflow"))
    )
    return (
        nodes.join(inflow, "node", "left")
        .crossJoin(F.broadcast(dm))
        .select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (
                    F.coalesce("inflow", F.lit(0.0))
                    + F.col("dm") / F.lit(float(n))
                )
            ).alias("pr"),
        )
    )


def pagerank(
    edges: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    damping: float = 0.85,
    iterations: int = 5,
) -> DataFrame:
    """Fixed-iteration PageRank with uniform dangling-mass redistribution
    (the standard formulation): ``pr' = (1-d)/n + d * (Σ_in pr/outdeg +
    dangling_mass/n)``. Deterministic — no convergence test, exactly
    ``iterations`` rounds — so the result is reproducible and (unrolled)
    even expressible as SQL CTEs for cross-engine verification.

    Scale shape: the loop-invariant ``edges ⋈ outdeg`` join is hoisted out
    of the loop and the joined (src, dst, deg) table is hash-partitioned
    on ``src`` — the per-round join key — and persisted once, so every
    round's contribution join reuses the cached partitioning and only the
    O(V) rank table moves. Each round is ONE action: the dangling mass is
    a broadcast 1-row aggregate inside the round plan, not a driver
    collect. State is persisted and the previous round unpersisted,
    keeping lineage flat; node/edge data never leaves the executors.
    """
    e = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # repartition + sortWithinPartitions ONCE at build: InMemoryRelation
    # preserves both outputPartitioning and outputOrdering, so every
    # round's sort-merge joins read the cached tables co-partitioned AND
    # pre-sorted on the join key — no per-round Exchange, no per-round
    # Sort (broadcast rounds at small scale are unaffected).
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .repartition("node")
        .sortWithinPartitions("node")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    outdeg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    contrib_edges = (
        e.join(outdeg.withColumnRenamed("node", "src"), "src")
        .select("src", "dst", "deg")
        .repartition("src")
        .sortWithinPartitions("src")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # One setup job materializes e, outdeg and contrib_edges together;
    # e is superseded by contrib_edges for everything inside the loop.
    contrib_edges.count()
    e.unpersist()
    pr = nodes.withColumn("pr", F.lit(1.0 / n)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    for _ in range(iterations):
        new_pr = _pagerank_round(
            nodes, contrib_edges, outdeg, pr, n, damping
        ).persist(StorageLevel.MEMORY_AND_DISK)
        new_pr.count()
        pr.unpersist()
        pr = new_pr
    return pr
