"""Capture .explain("formatted") output for named queries into per-query
files — the before/after evidence files the optimization rounds commit
under plans/r<N>/.

Usage:
    python tools/capture_plans.py <out_dir> <tag> [q17_ngram_jaccard,...]

Writes <out_dir>/<query>_<tag>.txt for each query (default: the bench
HEADLINE list). The plan is captured at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on the repo session — the same environment the
bench times.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    out_dir = Path(sys.argv[1])
    tag = sys.argv[2]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from quackosm_spark.session import get_spark

    if len(sys.argv) > 3:
        names = sys.argv[3].split(",")
    else:
        from bench import HEADLINE

        names = list(HEADLINE)

    spark = get_spark(app_name="quackosm-spark-plan-capture")
    spark.sparkContext.setLogLevel("ERROR")
    qmap = entrymod.queries()
    out_dir.mkdir(parents=True, exist_ok=True)
    for name in names:
        df = qmap[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = out_dir / f"{name}_{tag}.txt"
        path.write_text(
            f"# {name} — explain('formatted') @ {sf_dir} [{tag}]\n\n" + plan
        )
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
