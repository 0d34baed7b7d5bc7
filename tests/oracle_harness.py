"""Self-check harness mirroring the driver's correctness gate: run each
queries() entry in Spark and its oracle_sql() in DuckDB on the same sf dir,
compare row count, column names, and order-insensitive values."""

from __future__ import annotations

import math
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def normalize(value):
    # Full repr, NOT rounded formatting: the driver's hash serializes exact
    # values, so a "%.9g"-loose local gate lets driver-red mismatches through
    # (that is exactly how the r01 q25/q29/q47 HUGEINT-vs-BIGINT artifact
    # slipped past this harness — VERDICT r01 "What's wrong" #3).
    if isinstance(value, float):
        if math.isnan(value):
            return "nan"
        return repr(value)
    if isinstance(value, int) and not isinstance(value, bool):
        # expose int-typing differences (DuckDB HUGEINT vs Spark bigint reach
        # Python as int either way, but Decimal does not — see below)
        return f"i:{value}"
    if type(value).__name__ == "Decimal":
        return f"dec:{value}"
    if hasattr(value, "isoformat"):
        return value.isoformat()
    return str(value)


def _stock_spark():
    """A DRIVER-SHAPED session: ``SparkSession.builder`` with Spark's
    default SQL semantics (caseSensitive=false, ANSI default, no AQE
    overrides) — the environment the correctness driver runs queries in.
    Only capacity/speed knobs (master, shuffle partitions, UI, driver
    memory) are set; nothing that changes name resolution or semantics.
    The round-7 `__n`/`__N` AMBIGUOUS_REFERENCE break passed every
    repo-session gate and died here — this leg exists so that class of
    session-config-dependent bug turns red locally first."""
    import os

    from pyspark.sql import SparkSession

    pkg_parent = str(Path(__file__).resolve().parent.parent)
    existing = os.environ.get("PYTHONPATH", "")
    if pkg_parent not in existing.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            f"{pkg_parent}{os.pathsep}{existing}" if existing else pkg_parent
        )
    return (
        SparkSession.builder.appName("oracle-harness-default-session")
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )


def run(
    sf_dir: str, only: list[str] | None = None, default_session: bool = False
) -> bool:
    import __spark_entry__ as entrymod

    if default_session:
        spark = _stock_spark()
    else:
        from quackosm_spark.session import get_spark

        spark = get_spark(shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    all_ok = True
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sorted(sdf.columns)
            sset = sorted(
                tuple(normalize(r[c]) for c in scols) for r in srows
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            all_ok = False
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(sql)
            # fetch through Arrow, not fetchall(): fetchall() silently
            # coerces HUGEINT to Python int, hiding the int128-vs-int64
            # typing artifact that the driver's hash DOES see
            tbl = rel.fetch_arrow_table()
            dcols_raw = tbl.column_names
            drows = tbl.to_pylist()
            dcols = sorted(dcols_raw)
            dset = sorted(
                tuple(normalize(row[c]) for c in dcols) for row in drows
            )
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            all_ok = False
            continue
        if scols != dcols:
            print(f"FAIL {name}: columns {scols} vs {dcols}")
            all_ok = False
        elif len(sset) != len(dset):
            print(f"FAIL {name}: rows {len(sset)} vs {len(dset)}")
            all_ok = False
        elif sset != dset:
            diff = [i for i, (a, b) in enumerate(zip(sset, dset)) if a != b][:3]
            print(f"FAIL {name}: values differ, e.g.:")
            for i in diff:
                print(f"   spark  {sset[i]}")
                print(f"   duckdb {dset[i]}")
            all_ok = False
        else:
            print(f"ok   {name}: {len(sset)} rows match")
    return all_ok


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--default-session"]
    default_session = "--default-session" in sys.argv[1:]
    sf = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    only = argv[1].split(",") if len(argv) > 1 else None
    ok = run(sf, only, default_session=default_session)
    sys.exit(0 if ok else 1)
