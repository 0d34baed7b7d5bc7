"""A/B micro-bench for the bucketed two-pass order-statistic kernels.

Usage: python tools/ab_order_statistics.py <op> <variant> <n_rows>

  op      ∈ {interleave, auc, winsorize, deciles, ..., robustz}
  variant ∈ {old, new}   (old = the serial single-window / exact-percentile
                          formulation each operator had before its fix)
  n_rows  = synthetic input size

Prints ONE JSON line {"op", "variant", "n", "sec", "checksum"}; the
checksum is a value-sensitive aggregate so old/new comparability is
checked, not assumed. Inputs are deterministic Column expressions over
spark.range (no files, no RNG) so any two processes generate identical
data. Run each measurement in its OWN process for a clean JVM.

Shapes are adversarial on purpose: 97% of rows in one group (the shape
that serializes group-partitioned windows) and continuous value columns
(the shape that blows up exact-percentile buffers / distinct-score
tables). SCALE.md §13 records the numbers.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


def _docs_skewed(spark, n):
    """97% of docs in one source, 3 small sources."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 < 97, F.lit("big"))
        .otherwise(F.concat(F.lit("s"), (F.col("id") % 3).cast("string")))
        .alias("source"),
    )


def _scored(spark, n):
    """Continuous scores (distinct ≈ n), 1/3 positive labels."""
    return spark.range(n).select(
        (F.xxhash64("id").cast("double") / F.lit(2.0**63)).alias("score"),
        (F.col("id") % 3 == 0).cast("int").alias("y"),
    )


def _values_skewed(spark, n):
    """Continuous values, 97% in one group."""
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 100 < 97, F.lit("en")).otherwise(F.lit("fr")).alias("g"),
        (F.xxhash64("id", F.lit(7)).cast("double") / F.lit(2.0**63)).alias("value"),
    )


def _texts_skewed(spark, n):
    """Docs with id-derived text, 97% in one lang."""
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 100 < 97, F.lit("en")).otherwise(F.lit("fr")).alias("lang"),
        F.expr("repeat('ab cd! ', cast(id % 40 as int) + 1)").alias("text"),
    )


def run(op, variant, n, spark):
    if op == "novelty":
        # 'old' = unpersisted exploded grams feeding two exchanges (the
        # tokenizing regex runs twice); 'new' = the compact per-doc-array
        # persist in text.novelty_score
        from quackosm_spark.operators.text import novelty_score, word_ngrams

        d = _texts_skewed(spark, n).select("doc_id", "text")
        if variant == "new":
            out = novelty_score(d)
        else:
            grams = d.select(
                F.col("doc_id"),
                F.explode(word_ngrams(F.col("text"), 3)).alias("ngram"),
            )
            dfc = grams.groupBy("ngram").agg(F.count("*").alias("df"))
            out = (
                grams.join(dfc, "ngram")
                .groupBy("doc_id")
                .agg(
                    F.count("*").alias("n_grams"),
                    F.round(
                        F.sum(F.when(F.col("df") == 1, 1).otherwise(0))
                        / F.count("*"),
                        6,
                    ).alias("novelty"),
                )
            )
        chk = out.agg(
            F.count(F.lit(1)).alias("c1"), F.round(F.sum("novelty"), 2).alias("c2")
        ).collect()[0]
        return [int(chk["c1"]), float(chk["c2"])]

    if op == "sessionize":
        # 90% of events on ONE user: 'old' = the kernel's applyInPandas
        # batch shim (whole user in one pandas group), 'new' = the window
        # formulation (sort-spills). Identical outputs by contract.
        from quackosm_spark.streaming import sessionize_batch, sessionize_stream

        ev = spark.range(n).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(F.col("id") % 50).alias("user_id"),
            F.timestamp_micros(
                F.lit(1_700_000_000_000_000) + F.col("id") * 400_000_000
            ).alias("ts"),
        )
        out = sessionize_batch(ev, 1800) if variant == "new" else sessionize_stream(ev, 1800)
        chk = out.agg(
            F.count(F.lit(1)).alias("c1"), F.sum("n_events").alias("c2")
        ).collect()[0]
        return [int(chk["c1"]), int(chk["c2"])]

    if op == "interleave":
        from quackosm_spark.operators.mix import interleave_sources

        d = _docs_skewed(spark, n)
        if variant == "new":
            out = interleave_sources(d)
        else:  # the pre-r6 per-source single window
            ok = F.md5(F.col("doc_id").cast("string"))
            w = Window.partitionBy("source").orderBy(ok, "doc_id")
            out = d.withColumn("rn", F.row_number().over(w))
        chk = out.agg(
            F.sum(F.col("rn") * (F.col("doc_id") % 997)).alias("c")
        )
        return chk.collect()[0]["c"]

    if op == "auc_discrete":
        # 1000-distinct integer scores: 'new' = the r7 runtime fast path
        # (ordered window over the bounded distinct table), 'old' = the
        # bucketed strategy forced on the same data
        from quackosm_spark.operators.ml import binary_auc

        d = spark.range(n).select(
            (F.col("id") % 1000).cast("double").alias("score"),
            (F.col("id") % 3 == 0).cast("int").alias("y"),
        )
        thr = 65536 if variant == "new" else 0
        row = binary_auc(d, "score", "y", small_distinct_threshold=thr).collect()[0]
        return row["auc"]

    if op == "auc":
        from quackosm_spark.operators.ml import binary_auc

        d = _scored(spark, n)
        if variant == "new":
            row = binary_auc(d, "score", "y").collect()[0]
            return row["auc"]
        # pre-r6: unpartitioned cumulative window over the distinct-score table
        g = d.groupBy(F.col("score")).agg(
            F.count(F.lit(1)).cast("double").alias("n"),
            F.sum(F.col("y").cast("double")).alias("n_pos"),
        )
        w = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ranked = g.withColumn("cum", F.sum("n").over(w)).withColumn(
            "avg_rank", F.col("cum") - (F.col("n") - 1.0) / 2.0
        )
        tot = ranked.agg(
            F.sum(F.col("n_pos") * F.col("avg_rank")).alias("s_pos"),
            F.sum("n_pos").alias("p"),
            F.sum("n").alias("nn"),
        ).collect()[0]
        p, nn, s_pos = tot["p"], tot["nn"], tot["s_pos"]
        return (s_pos - p * (p + 1.0) / 2.0) / (p * (nn - p))

    if op == "winsorize":
        from quackosm_spark.operators.stats import winsorize

        d = _values_skewed(spark, n)
        if variant == "new":
            out = winsorize(d, "value", "g")
        else:  # pre-r7: exact-percentile aggregate bounds
            bounds = d.groupBy(F.col("g").alias("__g")).agg(
                F.percentile("value", 0.05).alias("__lo"),
                F.percentile("value", 0.95).alias("__hi"),
            )
            out = (
                d.join(F.broadcast(bounds), F.col("g") == F.col("__g"))
                .withColumn(
                    "value_w",
                    F.round(
                        F.least(F.greatest(F.col("value"), F.col("__lo")), F.col("__hi")),
                        6,
                    ),
                )
            )
        chk = out.agg(F.round(F.sum("value_w"), 4).alias("c"))
        return chk.collect()[0]["c"]

    if op == "deciles":
        from quackosm_spark.operators.stats import quality_deciles
        from quackosm_spark.operators.text import quality_score

        d = _texts_skewed(spark, n)
        if variant == "new":
            out = quality_deciles(d, group_col="lang")
        else:  # pre-r7: ntile/percent_rank window partitioned by group alone
            w = Window.partitionBy("lang").orderBy(quality_score("text"), F.col("doc_id"))
            out = d.select(
                "doc_id",
                F.col("lang"),
                quality_score("text").alias("quality"),
                F.ntile(10).over(w).alias("decile"),
                F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            )
        chk = out.agg(
            F.sum(F.col("decile") * (F.col("doc_id") % 997)).alias("c1"),
            F.round(F.sum("pct_rank"), 2).alias("c2"),
        ).collect()[0]
        return [chk["c1"], float(chk["c2"])]

    if op == "deciles_cheap":
        # isolates the WINDOW SHAPE from the scorer: the 3-regex
        # quality_score is map-parallel in BOTH deciles variants and
        # dominates wall clock at 20-40M (§15: old ≈ new there), so the
        # group-only window's serial sort hides inside the regex time.
        # Here the score is one hash expression — the ranking machinery
        # IS the workload, the shape the 100 TB claim is actually about.
        from quackosm_spark.operators.stats import quality_deciles

        d = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 100 < 97, F.lit("en"))
            .otherwise(F.lit("fr"))
            .alias("lang"),
            F.round(
                (F.xxhash64("id", F.lit(13)).cast("double") / F.lit(2.0**64))
                + F.lit(0.5),
                6,
            ).alias("score"),
        )
        if variant == "new":
            out = quality_deciles(d, group_col="lang", score_col="score")
        else:  # group-only ntile/percent_rank window (pre-r7 shape)
            w = Window.partitionBy("lang").orderBy(
                F.col("score"), F.col("doc_id")
            )
            out = d.select(
                "doc_id",
                F.col("lang"),
                F.col("score").alias("quality"),
                F.ntile(10).over(w).alias("decile"),
                F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
            )
        chk = out.agg(
            F.sum(F.col("decile") * (F.col("doc_id") % 997)).alias("c1"),
            F.round(F.sum("pct_rank"), 2).alias("c2"),
        ).collect()[0]
        return [chk["c1"], float(chk["c2"])]

    if op == "budgetsel":
        # token_budget_filter vs the naive formulation: a GLOBAL
        # ORDER BY (quality desc, id) window cumsum — one partition, one
        # task sorting the whole corpus. Cheap hash score (the
        # deciles_cheap reasoning: isolate the selection machinery).
        from quackosm_spark.operators.mix import token_budget_filter

        d = spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.round(
                (F.xxhash64("id", F.lit(13)).cast("double") / F.lit(2.0**64))
                + F.lit(0.5),
                6,
            ).alias("score"),
            (F.col("id") % 900 + 10).cast("bigint").alias("n_toks"),
        )
        if variant == "new":
            out = token_budget_filter(
                d, budget_fraction=0.5, score_col="score", tokens_col="n_toks"
            ).select("doc_id", "n_tokens", "kept")
        else:
            total = d.agg(F.sum("n_toks")).collect()[0][0]
            w = Window.orderBy(
                F.col("score").desc(), F.col("doc_id").asc()
            ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
            out = d.select(
                "doc_id",
                F.col("n_toks").alias("n_tokens"),
                (F.sum("n_toks").over(w) <= F.lit(0.5 * total)).alias("kept"),
            )
        chk = out.agg(
            F.sum(F.when(F.col("kept"), F.col("doc_id") % 997)).alias("c1"),
            F.sum(F.when(F.col("kept"), F.col("n_tokens"))).alias("c2"),
        ).collect()[0]
        return [chk["c1"], chk["c2"]]

    if op == "tempsample":
        # temperature_sample vs the naive group-serial formulation: same
        # driver-side quota table, but selection via a row_number window
        # partitioned by source ALONE — the dominant group's md5 sort
        # funnels through one task.
        from quackosm_spark.operators.mix import temperature_sample

        d = _docs_skewed(spark, n)
        total = int(n * 0.4)
        if variant == "new":
            out = temperature_sample(d, total, alpha=0.5)
        else:
            import math

            counts = {
                r["source"]: r["cnt"]
                for r in d.groupBy("source")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
            denom = sum(c ** 0.5 for _, c in sorted(counts.items()))
            quota_rows = []
            for g, c in sorted(counts.items()):
                share = math.floor(c ** 0.5 / denom * 1e6 + 0.5) / 1e6
                quota_rows.append((g, min(c, math.floor(total * share))))
            qdf = spark.createDataFrame(quota_rows, "source string, quota long")
            w = Window.partitionBy("source").orderBy(
                F.md5(F.col("doc_id").cast("string")), "doc_id"
            )
            out = (
                d.join(F.broadcast(qdf), "source")
                .withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= F.col("quota"))
                .select("doc_id", "source")
            )
        chk = out.agg(
            F.count(F.lit(1)).alias("c1"),
            F.sum(F.col("doc_id") % 997).alias("c2"),
        ).collect()[0]
        return [int(chk["c1"]), int(chk["c2"])]

    if op == "prnorm":
        # percent_rank_normalize (bucketed kernel + join-back) vs the
        # naive group-only percent_rank window on a continuous column
        # (distinct ≈ n — the adversarial shape for both the old window's
        # serial sort AND the kernel's distinct-table size).
        from quackosm_spark.operators.stats import percent_rank_normalize

        d = _values_skewed(spark, n)
        if variant == "new":
            out = percent_rank_normalize(d, "value", ["g"])
        else:
            w = Window.partitionBy("g").orderBy("value")
            out = d.withColumn("pct_rank", F.percent_rank().over(w))
        chk = out.agg(
            F.count(F.lit(1)).alias("c1"),
            F.round(F.sum("pct_rank"), 2).alias("c2"),
        ).collect()[0]
        return [int(chk["c1"]), float(chk["c2"])]

    if op == "timedecay":
        # time_decay_scores(anchor='key_max'): tiny per-key max agg +
        # co-partitioned join-back + one weighted agg (map-side combine
        # absorbs the hot key) vs the naive unordered-window formulation
        # (max(ts) OVER (PARTITION BY key)) — the window buffers the
        # dominant key's entire partition in ONE task's window exec.
        from quackosm_spark.operators.temporal import time_decay_scores

        d = spark.range(n).select(
            F.col("id").alias("event_id"),
            F.when(F.col("id") % 100 < 97, F.lit(0))
            .otherwise((F.col("id") % 1_000_000) + 1)
            .alias("user_id"),
            F.timestamp_seconds(
                F.lit(1_704_067_200) + (F.col("id") * 7919) % (90 * 86400)
            ).alias("ts"),
        )
        if variant == "new":
            out = time_decay_scores(
                d, ["user_id"], "ts", half_life_days=7.0, anchor="key_max"
            )
        else:
            w = Window.partitionBy("user_id")
            kref = F.max(F.col("ts")).over(w)
            age_days = (
                kref.cast("double") - F.col("ts").cast("double")
            ) / 86400.0
            weight = F.pow(F.lit(0.5), age_days / F.lit(7.0))
            out = (
                d.withColumn("__w", weight)
                .groupBy("user_id")
                .agg(
                    F.round(F.sum("__w"), 6).alias("decayed_score"),
                    F.count(F.lit(1)).alias("n_events"),
                    F.max("ts").alias("last_ts"),
                )
            )
        chk = out.agg(
            F.count(F.lit(1)).alias("c1"),
            F.round(F.sum("decayed_score"), 2).alias("c2"),
            F.sum(F.col("n_events") % 997).alias("c3"),
        ).collect()[0]
        return [int(chk["c1"]), float(chk["c2"]), int(chk["c3"])]

    if op == "robustz":
        # 'new' = stats.robust_zscore (two bucketed exact-quantile kernel
        # passes, bounded per-task state); 'old' = the naive exact
        # percentile() WINDOW formulation — the dominant group's values
        # buffer in ONE window task, twice (median, then MAD)
        from quackosm_spark.operators.stats import robust_zscore

        d = _values_skewed(spark, n)
        if variant == "new":
            out = robust_zscore(d, "value", ["g"])
        else:
            w = Window.partitionBy("g")
            med = F.expr("percentile(value, 0.5)").over(w)
            d2 = d.withColumn("med", med).withColumn(
                "__absdev", F.abs(F.col("value") - F.col("med"))
            )
            mad = F.expr("percentile(__absdev, 0.5)").over(w)
            out = d2.withColumn("mad", mad).withColumn(
                "robust_z",
                F.round(
                    F.when(
                        F.col("mad") > 0,
                        (F.col("value") - F.col("med"))
                        / (F.lit(1.4826) * F.col("mad")),
                    ),
                    6,
                ),
            )
        chk = out.agg(
            F.count(F.lit(1)).alias("c1"),
            F.round(F.sum("robust_z"), 2).alias("c2"),
            F.count_if(F.col("robust_z").isNull()).alias("c3"),
            F.round(F.sum("med") + F.sum("mad"), 2).alias("c4"),
        ).collect()[0]
        return [int(chk["c1"]), float(chk["c2"]), int(chk["c3"]), float(chk["c4"])]

    raise SystemExit(f"unknown op {op}")


def main():
    op, variant, n = sys.argv[1], sys.argv[2], int(sys.argv[3])
    from quackosm_spark.session import get_spark

    spark = get_spark(shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    # warm the JVM/codegen path on a tiny run so the timed run measures the plan
    run(op, variant, 10_000, spark)
    t0 = time.time()
    chk = run(op, variant, n, spark)
    sec = time.time() - t0
    print(json.dumps({"op": op, "variant": variant, "n": n, "sec": round(sec, 2), "checksum": chk}))


if __name__ == "__main__":
    main()
