"""Focused scale-point timing: bench.py's exact methodology (untimed
session warmup, timed `df.count()`, best-of-2, calibration anchors) for
an arbitrary query subset — used for the 100x (sf10) scale points where
running the full headline list would take tens of minutes per leg.

Usage:
    python tools/scale_point.py <sf_dir> q145_containment,q150_domain_cap_kernel
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import cpu_microbench  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1]
    names = sys.argv[2].split(",")
    import os

    loadavg_start = list(os.getloadavg())
    micro_before = cpu_microbench()

    import __spark_entry__ as entrymod
    from quackosm_spark.session import get_spark

    spark = get_spark(app_name="quackosm-spark-scale-point")
    spark.sparkContext.setLogLevel("ERROR")

    from pyspark.sql import functions as F

    spark.range(100_000).groupBy((F.col("id") % 7).alias("g")).count().count()
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    qmap = entrymod.queries()
    timings: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = qmap[name]
        per = []
        for _ in range(2):
            spark.sparkContext.setJobDescription(f"scale-point {name}")
            t0 = time.perf_counter()
            n = fn(spark, sf_dir).count()
            per.append(round(time.perf_counter() - t0, 3))
        spark.sparkContext.setJobDescription(None)
        runs[name] = per
        timings[name] = min(per)
        rows[name] = n

    micro_after = cpu_microbench()
    print(json.dumps({
        "metric": "scale_point_runtime",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf_dir": sf_dir,
        "calibration": {
            "microbench_sec_before": micro_before,
            "microbench_sec_after": micro_after,
            "microbench_reference_sec": 1.2,
            "loadavg_start": loadavg_start,
            "loadavg_end": list(os.getloadavg()),
            "protocol": "best-of-2",
            "runs": runs,
        },
    }))


if __name__ == "__main__":
    main()
