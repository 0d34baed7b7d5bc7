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

    Scale shape: rank state is one (node, pr) table partitioned on node;
    each round shuffles edge contributions once on dst and reuses the
    broadcast/exchange of the static outdeg table. The only driver values
    are two scalars per round (n is hoisted, dangling mass is a 1-row agg)
    — node/edge data never leaves the executors. State is persisted and
    the previous round unpersisted, keeping lineage flat.
    """
    e = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).distinct()
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    outdeg = (
        e.groupBy(F.col("src").alias("node"))
        .agg(F.count("*").alias("deg"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    pr = nodes.withColumn("pr", F.lit(1.0 / n)).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    for _ in range(iterations):
        dm = (
            pr.join(outdeg, "node", "left_anti")
            .agg(F.coalesce(F.sum("pr"), F.lit(0.0)))
            .collect()[0][0]
        )
        inflow = (
            e.join(pr.withColumnRenamed("node", "src"), "src")
            .join(outdeg.withColumnRenamed("node", "src"), "src")
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.col("pr") / F.col("deg")).alias("inflow"))
        )
        new_pr = nodes.join(inflow, "node", "left").select(
            "node",
            (
                F.lit((1.0 - damping) / n)
                + F.lit(damping)
                * (F.coalesce("inflow", F.lit(0.0)) + F.lit(dm / n))
            ).alias("pr"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        new_pr.count()
        pr.unpersist()
        pr = new_pr
    return pr
