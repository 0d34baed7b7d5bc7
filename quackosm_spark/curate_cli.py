"""CLI for the training-corpus curation chain (operators.recipes).

``python -m quackosm_spark.curate_cli corpus.parquet -o out_dir`` runs
exact dedup → verified near-dedup → quality filter → optional
decontamination / token budgets / packing, prints the per-stage report,
and writes the curated corpus as zstd parquet.

This is an addition beyond the reference's CLI (which only converts OSM
data); the conversion surface lives in ``quackosm_spark.cli``.
"""

from __future__ import annotations

import argparse
import json
from typing import Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="quackosm-spark-curate",
        description="Curate a document corpus for LLM training.",
    )
    p.add_argument("corpus", help="Input parquet path (doc_id, text, ... columns)")
    p.add_argument("--output", "-o", required=True, help="Output parquet directory")
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    p.add_argument("--benchmark", help="Parquet path of held-out eval docs to decontaminate against")
    p.add_argument("--url-col", default=None,
                   help="URL column: enables the crawl-level URL-dedup stage")
    p.add_argument("--max-per-domain", type=int, default=None,
                   help="Cap docs per registered domain (requires --url-col)")
    p.add_argument("--no-near-dup", dest="near_dup", action="store_false")
    p.add_argument("--min-jaccard", type=float, default=0.8,
                   help="Exact-jaccard confirmation threshold for LSH candidates")
    p.add_argument("--min-quality", type=float, default=0.05)
    p.add_argument("--max-repetition", type=float, default=0.6)
    p.add_argument("--min-tokens", type=int, default=5)
    p.add_argument("--keep-best-quality", action="store_true",
                   help="Near-dup retention policy: keep each cluster's "
                        "highest-quality doc instead of the smallest id")
    p.add_argument("--gopher", nargs="?", const="{}", metavar="JSON",
                   help="Apply the Gopher rule battery (optionally with "
                        'threshold overrides as JSON, e.g. \'{"min_words": 30}\')')
    p.add_argument("--quality-model", action="store_true",
                   help="Distill the Gopher verdict into a logistic scorer "
                        "(trained on a deterministic sample) and keep the "
                        "top fraction of docs by model probability")
    p.add_argument("--model-keep-fraction", type=float, default=0.5)
    p.add_argument("--model-train-fraction", type=float, default=0.25)
    p.add_argument("--model-label-thresholds", metavar="JSON",
                   help="Gopher threshold overrides for the weak labels "
                        "the model distills (defaults to --gopher's)")
    p.add_argument("--dsir-target-source",
                   help="Keep the docs most like this source's distribution "
                        "(DSIR importance weights over hashed unigrams)")
    p.add_argument("--dsir-keep-fraction", type=float, default=0.5)
    p.add_argument("--budgets", help='Per-source token budgets as JSON, e.g. \'{"web": 1000000}\'')
    p.add_argument("--temperature-total-docs", type=int,
                   help="Temperature-scaled source mixing: rebalance the "
                        "surviving corpus to ~N docs with per-source quotas "
                        "proportional to n**alpha (mix.temperature_sample)")
    p.add_argument("--temperature-alpha", type=float, default=0.5)
    p.add_argument("--temperature-group-col", default="source")
    p.add_argument("--default-budget", type=int, default=10_000)
    p.add_argument("--pack-capacity", type=int, help="Sequence-packing token capacity")
    p.add_argument("--shard-target-tokens", type=int,
                   help="Append the writer's shard manifest: contiguous "
                        "~N-token shards in id order (mix.assign_token_shards)")
    p.add_argument("--bpe-merges", type=int, metavar="N",
                   help="Count shard tokens with a real BPE merge table of "
                        "N merges, trained on the corpus sample "
                        "(text.train_bpe_merges) instead of whitespace")
    p.add_argument("--no-report", dest="report", action="store_false",
                   help="Skip per-stage counts (one less action per stage; use at scale)")
    return p


def main(argv: Optional[list[str]] = None) -> str:
    args = build_parser().parse_args(argv)
    from quackosm_spark.operators.recipes import curate_corpus
    from quackosm_spark.session import get_spark

    spark = get_spark(app_name="quackosm-spark-curate")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(args.corpus)
    benchmark = spark.read.parquet(args.benchmark) if args.benchmark else None
    budgets = json.loads(args.budgets) if args.budgets else None
    merges = None
    if args.bpe_merges:
        from quackosm_spark.operators.text import train_bpe_merges

        merges = train_bpe_merges(
            docs, text_col=args.text_col, n_merges=args.bpe_merges,
            order_col=args.id_col,
        )

    curated, report = curate_corpus(
        docs,
        benchmark=benchmark,
        id_col=args.id_col,
        text_col=args.text_col,
        url_col=args.url_col,
        max_per_domain=args.max_per_domain,
        near_dup=args.near_dup,
        min_jaccard=args.min_jaccard,
        keep_best_quality=args.keep_best_quality,
        min_quality=args.min_quality,
        max_repetition=args.max_repetition,
        min_tokens=args.min_tokens,
        # bare --gopher (const "{}") means defaults-on, which must map to
        # True — an empty dict is falsy and would silently skip the stage
        gopher=(json.loads(args.gopher) or True) if args.gopher else False,
        quality_model=args.quality_model,
        model_keep_fraction=args.model_keep_fraction,
        model_train_fraction=args.model_train_fraction,
        # `is not None`: an explicit '{}' means "Gopher DEFAULT thresholds",
        # which must not fall back to --gopher's overrides (same falsy-dict
        # trap as the --gopher const handling above)
        model_label_thresholds=(
            json.loads(args.model_label_thresholds)
            if args.model_label_thresholds is not None
            else None
        ),
        dsir_target_source=args.dsir_target_source,
        dsir_keep_fraction=args.dsir_keep_fraction,
        budgets=budgets,
        default_budget=args.default_budget,
        temperature_total_docs=args.temperature_total_docs,
        temperature_alpha=args.temperature_alpha,
        temperature_group_col=args.temperature_group_col,
        pack_capacity=args.pack_capacity,
        shard_target_tokens=args.shard_target_tokens,
        bpe_merges=merges,
        report=args.report,
    )
    curated.write.mode("overwrite").option("compression", "zstd").parquet(args.output)
    for stage, n in report.items():
        print(f"{stage}: {n}")
    print(args.output)
    return args.output


if __name__ == "__main__":
    main()
