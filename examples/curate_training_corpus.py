"""Curate a document corpus for LLM training: dedup -> near-dedup ->
quality filter -> decontamination -> token-budget mixture -> packing ->
BPE-counted shard manifest.

Usage: python examples/curate_training_corpus.py [sf_dir]
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F

from quackosm_spark.session import get_spark
from quackosm_spark.operators.recipes import curate_corpus


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark()
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    benchmark = docs.where(F.col("doc_id") % 17 == 0)  # held-out eval slice
    train = docs.where(F.col("doc_id") % 17 != 0)

    from quackosm_spark.operators.text import train_bpe_merges

    merges = train_bpe_merges(train, n_merges=16, order_col="doc_id")
    curated, report = curate_corpus(
        train,
        benchmark=benchmark,
        budgets={"src0": 2000, "src1": 1000},
        default_budget=1500,
        pack_capacity=2048,
        shard_target_tokens=10_000,
        bpe_merges=merges,
    )
    for stage, n in report.items():
        print(f"{stage:>16}: {n} docs")
    curated.select(
        "doc_id", "source", "stream", "bin_id", "n_tokens", "shard_id"
    ).show(5)


if __name__ == "__main__":
    main()
