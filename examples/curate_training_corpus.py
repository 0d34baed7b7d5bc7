"""Curate a document corpus for LLM training: dedup -> near-dedup
(keep-best-quality retention) -> quality filter -> Gopher rule battery ->
distilled logistic quality model (rules-to-model distillation) ->
DSIR target-distribution selection -> decontamination -> token-budget
mixture -> packing -> BPE-counted shard manifest (distributed trainer).

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

    from quackosm_spark.operators.text import train_bpe_merges_distributed

    # fully distributed pair counting: only one (pair, count) row per merge
    # round reaches the driver — no sample ceiling
    merges = train_bpe_merges_distributed(train, n_merges=16)
    curated, report = curate_corpus(
        train,
        benchmark=benchmark,
        keep_best_quality=True,
        gopher={"min_words": 5, "min_stopword_hits": 0,
                "min_alpha_word_ratio": 0.5},
        quality_model=True,
        model_keep_fraction=0.8,
        model_train_fraction=0.5,
        model_label_thresholds={"min_words": 56, "min_stopword_hits": 0,
                                "min_alpha_word_ratio": 0.0,
                                "min_mean_word_len": 0.0},
        dsir_target_source="src0",
        dsir_keep_fraction=0.8,
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
