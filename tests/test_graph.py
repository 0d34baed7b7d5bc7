"""PageRank: differential test vs a dense numpy power-iteration reference."""

from __future__ import annotations

import numpy as np
import pytest


def _np_pagerank(edges, n_iter, d=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = {}
    for a, _ in edges:
        out[a] = out.get(a, 0) + 1
    pr = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        new = np.full(n, (1 - d) / n)
        dm = sum(pr[idx[v]] for v in nodes if v not in out)
        new += d * dm / n
        for a, b in edges:
            new[idx[b]] += d * pr[idx[a]] / out[a]
        pr = new
    return {v: pr[idx[v]] for v in nodes}


@pytest.mark.parametrize("iterations", [1, 4])
def test_pagerank_matches_numpy_power_iteration(spark, iterations):
    from quackosm_spark.operators.graph import pagerank

    edges = [
        ("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"),
        ("d", "c"),  # d is a source
        ("c", "e"),  # e is a sink (dangling)
    ]
    df = spark.createDataFrame(edges, "src: string, dst: string")
    got = {r.node: r.pr for r in pagerank(df, iterations=iterations).collect()}
    want = _np_pagerank(edges, iterations)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], rel=1e-12)
    # total mass conserved (dangling redistribution keeps it a distribution)
    assert sum(got.values()) == pytest.approx(1.0, rel=1e-9)
