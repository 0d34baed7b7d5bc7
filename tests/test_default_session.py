"""Stock-session gate (r08, VERDICT r07 "Next round" #2).

Round 7 shipped a kernel that passed every local gate and broke in the
driver: ``operators/quantiles.py`` carried internal columns ``__n`` and
``__N``, which collide under Spark's DEFAULT ``spark.sql.caseSensitive=
false`` — but every test and the oracle harness ran the repo session
(``get_spark``, caseSensitive=true, session.py), so the break was
invisible locally. The operator surface must analyze and run under a
``SparkSession.builder`` STOCK session (case-insensitive resolution,
ANSI default, no repo confs) — that is the environment the correctness
driver, and any library user, actually has.

This module runs the order-statistic kernel family and the flagship
``curate_corpus`` recipe in a SUBPROCESS with a fresh default-config
JVM (the suite's shared session fixture carries the repo confs and a
same-JVM ``getOrCreate()`` would silently inherit them), asserting
bit-equality with ``F.percentile`` where defined. Reverting the r07
``__N`` → ``__tot`` rename turns this red with AMBIGUOUS_REFERENCE.

The full-surface equivalent is ``tests/oracle_harness.py
--default-session`` (all 122 contract queries vs DuckDB on a stock
session — 122/122 green as of r08); this in-suite leg keeps the
highest-risk operators gated on every pytest run.
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent

PAYLOAD = r"""
import os, sys
sys.path.insert(0, os.environ["QS_REPO"])
os.environ["PYTHONPATH"] = os.environ["QS_REPO"]
from pyspark.sql import SparkSession, functions as F

# STOCK session: nothing semantics-affecting configured. Capacity knobs
# (master/UI/shuffle count) only — the driver harness's shape.
spark = (
    SparkSession.builder.appName("default-session-gate")
    .master("local[2]")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.shuffle.partitions", "4")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
assert spark.conf.get("spark.sql.caseSensitive") == "false", (
    "gate precondition: session must be case-INSENSITIVE (Spark default)"
)

import random
random.seed(11)
rows = [(f"g{i % 3}", random.gauss(0.0, 1.0)) for i in range(3000)]
rows += [("gnull", None)] * 4 + [(None, 1.5), (None, 2.5), (None, None)]
ev = spark.createDataFrame(rows, "grp string, value double")

# 1. exact_group_quantiles: bit-equal to F.percentile incl. NULL group,
#    all-NULL group, and interpolation.
from quackosm_spark.operators.quantiles import exact_group_quantiles
got = exact_group_quantiles(
    ev, "value", ["grp"], [0.25, 0.5, 0.95], ["p25", "p50", "p95"]
)
exp = ev.groupBy("grp").agg(
    F.percentile("value", 0.25).alias("p25"),
    F.percentile("value", 0.5).alias("p50"),
    F.percentile("value", 0.95).alias("p95"),
)
gs = {tuple(map(str, r)) for r in got.collect()}
es = {tuple(map(str, r)) for r in exp.collect()}
assert gs == es, f"kernel != F.percentile under stock session:\n{sorted(gs)}\nvs\n{sorted(es)}"
print("GATE kernel ok")

# 2. winsorize + temporal.exact_quantiles (kernel consumers)
from quackosm_spark.operators.stats import winsorize, quality_deciles
from quackosm_spark.operators.temporal import exact_quantiles
evn = ev.where(F.col("grp").isNotNull())
assert winsorize(evn, "value", "grp").count() == evn.count()
assert exact_quantiles(evn, "value", ["grp"], [0.5]).count() == 4
print("GATE consumers ok")

# 3. quality_deciles (its own bucketed-rank kernel)
docs = spark.createDataFrame(
    [(i, f"s{i % 2}", ("lorem ipsum dolor sit amet. " * (i % 7 + 1)).strip())
     for i in range(120)],
    "doc_id long, source string, text string",
)
qd = quality_deciles(docs, text_col="text", group_col="source", id_col="doc_id")
assert qd.count() == 120
print("GATE deciles ok")

# 4. curate_corpus: the flagship recipe crashes on a stock session if ANY
#    stage depends on repo session confs (r07: the model/DSIR cutoffs did).
from quackosm_spark.operators.recipes import curate_corpus
out, report = curate_corpus(
    docs,
    id_col="doc_id",
    text_col="text",
    min_jaccard=0.8,
    min_tokens=3,
    quality_model=True,
    model_keep_fraction=0.9,
    dsir_target_source="s0",
    dsir_keep_fraction=0.9,
    total_token_budget=2000,
    report=True,
)
n = out.count()
assert n > 0, f"curate_corpus kept nothing: {report}"
print(f"GATE curate ok ({n} docs, stages={list(report)})")
spark.stop()
print("GATE ALL OK")
"""


def test_operator_surface_on_stock_session():
    env = dict(
        __import__("os").environ,
        QS_REPO=str(REPO),
        SPARK_GRAFT_CPUS="2",
    )
    proc = subprocess.run(
        [sys.executable, "-c", PAYLOAD],
        capture_output=True,
        text=True,
        timeout=540,
        env=env,
        cwd=str(REPO),
    )
    assert proc.returncode == 0, (
        f"stock-session gate failed:\nSTDOUT:\n{proc.stdout[-4000:]}\n"
        f"STDERR:\n{proc.stderr[-4000:]}"
    )
    assert "GATE ALL OK" in proc.stdout
