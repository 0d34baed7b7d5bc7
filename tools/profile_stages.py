"""Per-stage breakdown for named queries — the §1 'measure first' tool.

Runs each query with the bench's count() action and prints, per stage (from
the Spark UI REST API): wall duration, task count, executorRunTime,
shuffle read/write bytes, and the stage's name line. Identifies where a
query's wall-clock actually goes (scan vs exchange vs window) so the
optimization targets the real cost.

Usage: python tools/profile_stages.py q01_pricing_summary[,q05_...] [runs]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    names = sys.argv[1].split(",")
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entrymod
    from quackosm_spark.session import get_spark

    spark = get_spark(app_name="stage-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    qmap = entrymod.queries()

    from pyspark.sql import functions as F

    spark.range(100_000).groupBy((F.col("id") % 7).alias("g")).count().count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    ui = sc.uiWebUrl
    app_id = sc.applicationId

    def stages():
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app_id}/stages?status=complete"
        ) as r:
            return json.load(r)

    for name in names:
        fn = qmap[name]
        for r in range(runs):
            before_ids = {s["stageId"] for s in stages()}
            sc.setJobDescription(f"{name} run{r}")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            n = df.count()
            t_total = time.perf_counter() - t0
            time.sleep(0.3)
            new = [s for s in stages() if s["stageId"] not in before_ids]
            print(
                f"\n### {name} run{r}: build={t_build:.3f}s "
                f"total={t_total:.3f}s rows={n}"
            )
            tot_run = 0
            for s in sorted(new, key=lambda s: s["stageId"]):
                dur = (s.get("executorRunTime") or 0) / 1000.0
                tot_run += dur
                wall = "?"
                if s.get("firstTaskLaunchedTime") and s.get("completionTime"):
                    from datetime import datetime

                    fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
                    try:
                        a = datetime.strptime(s["firstTaskLaunchedTime"], fmt)
                        b = datetime.strptime(s["completionTime"], fmt)
                        wall = f"{(b - a).total_seconds():.3f}"
                    except ValueError:
                        pass
                print(
                    f"  stage {s['stageId']:>4} wall={wall:>7}s "
                    f"runTime={dur:7.3f}s tasks={s['numCompleteTasks']:>3} "
                    f"in={s.get('inputBytes', 0):>10} "
                    f"sr={s.get('shuffleReadBytes', 0):>9} "
                    f"sw={s.get('shuffleWriteBytes', 0):>9}  "
                    f"{s['name'][:60]}"
                )
            print(f"  total executorRunTime={tot_run:.3f}s")
        sc.setJobDescription(None)


if __name__ == "__main__":
    main()
