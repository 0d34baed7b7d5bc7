"""Derive an N×-scale dataset from a driver sf directory (SCALE.md §7a).

Replicates every fact table N times with key strides so joins stay
consistent (`l_orderkey`/`o_orderkey` share a stride), and gives each
documents copy a per-copy vowel substitution so copies are independent
corpora — naive replication would make every doc N exact clones and
quadratically inflate every dedup query's TRUE answer, which measures the
workload's growth, not the engine's scaling.

Usage:
    python tools/derive_scale_dataset.py /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import sys

import duckdb

SHIFT_KEYS = {
    "region": None,
    "nation": None,
    "supplier": ("s_suppkey",),
    "customer": ("c_custkey",),
    "part": ("p_partkey",),
    "orders": ("o_orderkey",),
    "lineitem": ("l_orderkey",),
    "events": ("event_id",),
    "documents": ("doc_id",),
    "embeddings": ("vec_id",),
}


def derive(src: str, dst: str, copies: int) -> None:
    con = duckdb.connect()
    for table, keys in SHIFT_KEYS.items():
        path = f"{src}/{table}.parquet"
        out = f"{dst}/{table}.parquet"
        if keys is None:
            con.sql(
                f"COPY (SELECT * FROM '{path}') TO '{out}'"
                " (FORMAT parquet, COMPRESSION zstd)"
            )
            continue
        cols = [r[0] for r in con.sql(f"DESCRIBE SELECT * FROM '{path}'").fetchall()]
        stride = con.sql(f"SELECT max({keys[0]}) + 1 FROM '{path}'").fetchone()[0]
        sel = ", ".join(
            f"({c} + c.copy * {stride}) AS {c}" if c in keys else c for c in cols
        )
        if table == "documents":
            # per-copy character substitution keeps cross-copy shingle
            # overlap near zero (copy 0 stays verbatim)
            sel = sel.replace(
                "text",
                "CASE WHEN c.copy = 0 THEN text"
                " ELSE replace(replace(text, 'e', chr(103 + c.copy::INT)),"
                " 'a', chr(112 + c.copy::INT)) END AS text",
                1,
            )
        con.sql(
            f"""
            COPY (
              SELECT {sel}
              FROM '{path}', (SELECT unnest(range({copies})) AS copy) c
            ) TO '{out}' (FORMAT parquet, COMPRESSION zstd)
            """
        )
        n = con.sql(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows")


if __name__ == "__main__":
    import os

    src, dst = sys.argv[1], sys.argv[2]
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    derive(src, dst, copies)
