"""End-to-end corpus-curation recipe: stage chaining, monotone survivors,
determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from quackosm_spark.operators.recipes import curate_corpus

SF_DIR = "/root/testdata/sf0.001"


def test_curate_corpus_full_chain(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    benchmark = docs.where(F.col("doc_id") % 17 == 0)
    train = docs.where(F.col("doc_id") % 17 != 0)

    out, report = curate_corpus(
        train,
        benchmark=benchmark,
        budgets={"src0": 500},
        default_budget=300,
        pack_capacity=512,
    )
    rows = out.collect()
    # every enabled stage reported, counts monotonically non-increasing
    order = ["input", "exact_dedup", "near_dedup", "quality",
             "decontaminated", "budget_mix", "packed"]
    assert list(report) == order
    vals = [report[k] for k in order]
    assert all(a >= b for a, b in zip(vals, vals[1:-1]))  # packing keeps rows
    assert report["packed"] == report["budget_mix"] == len(rows)
    assert 0 < len(rows) <= report["input"]
    # packing columns appended
    assert {"stream", "bin_id"} <= set(out.columns)
    # deterministic end to end
    out2, report2 = curate_corpus(
        train, benchmark=benchmark, budgets={"src0": 500},
        default_budget=300, pack_capacity=512,
    )
    assert report2 == report
    assert sorted(r.doc_id for r in rows) == sorted(r.doc_id for r in out2.collect())


def test_curate_corpus_minimal_stages(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out, report = curate_corpus(docs, near_dup=False, report=True)
    assert list(report) == ["input", "exact_dedup", "quality"]
    assert out.count() == report["quality"] > 0
