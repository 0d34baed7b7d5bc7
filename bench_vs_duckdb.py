"""Head-to-head: our Spark queries vs the same queries on single-node DuckDB.

For every headline query that has a DuckDB oracle (``oracle_sql()``), run the
Spark implementation (best-of-2, steady state) and the equivalent SQL on
DuckDB over the same parquet tables (best-of-2), and print a comparison
table + one JSON line. This substantiates the "matches-or-beats the
reference's single-node throughput at the same data scale" goal with
numbers — the reference engine IS DuckDB under the hood.

Usage: python bench_vs_duckdb.py [sf_dir]   (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

TABLES = (
    "region nation customer supplier part orders lineitem events documents"
    " embeddings"
).split()


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    import duckdb

    import __spark_entry__ as entrymod
    from bench import HEADLINE
    from quackosm_spark.session import get_spark

    spark = get_spark(app_name="quackosm-spark-bench-vs-duckdb")
    spark.sparkContext.setLogLevel("ERROR")
    from pyspark.sql import functions as F

    spark.range(100_000).groupBy((F.col("id") % 7).alias("g")).count().count()

    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.sql(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
            )

    qmap = entrymod.queries()
    oracle = entrymod.oracle_sql()
    rows = []
    for name in HEADLINE:
        if name not in oracle:
            continue
        spark_best = None
        for _ in range(2):
            t0 = time.perf_counter()
            qmap[name](spark, sf_dir).count()
            dt = time.perf_counter() - t0
            spark_best = dt if spark_best is None or dt < spark_best else spark_best
        duck_best = None
        for _ in range(2):
            t0 = time.perf_counter()
            con.sql(oracle[name]).fetchall()
            dt = time.perf_counter() - t0
            duck_best = dt if duck_best is None or dt < duck_best else duck_best
        rows.append((name, round(spark_best, 3), round(duck_best, 3)))
        print(
            f"# {name}: spark {spark_best:.3f}s  duckdb {duck_best:.3f}s  "
            f"ratio {spark_best / duck_best:.2f}x",
            file=sys.stderr,
        )

    total_spark = round(sum(r[1] for r in rows), 3)
    total_duck = round(sum(r[2] for r in rows), 3)
    print(
        json.dumps(
            {
                "metric": "spark_vs_duckdb_headline_runtime",
                "sf_dir": sf_dir,
                "spark_total_sec": total_spark,
                "duckdb_total_sec": total_duck,
                "ratio": round(total_spark / total_duck, 3) if total_duck else None,
                "queries": {
                    name: {"spark": s, "duckdb": d} for name, s, d in rows
                },
            }
        )
    )


if __name__ == "__main__":
    main()
