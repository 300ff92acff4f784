"""Unit tests for operators/graph.py::pagerank against a pure-Python
reference implementation on hand-built graphs (the registry query
`pagerank_part_cooccurrence` pins the cross-engine differential; this
pins the operator's math and its invariants on known topologies)."""

from __future__ import annotations

import pytest

from lmo_data_catalog_spark.operators.graph import pagerank


def py_pagerank(edges, n_iter=3, damping=0.85):
    """Reference: same uniform-start damped formulation."""
    nodes = sorted({s for s, _ in edges})
    deg = {n: sum(1 for s, _ in edges if s == n) for n in nodes}
    rank = {n: 1.0 for n in nodes}
    for _ in range(n_iter):
        nxt = {}
        for v in {d for _, d in edges}:
            s = sum(rank[u] / deg[u] for u, d in edges if d == v)
            nxt[v] = (1.0 - damping) + damping * s
        rank = nxt
    return rank


def sym(pairs):
    """Symmetrize an undirected edge list."""
    return [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs]


@pytest.mark.parametrize(
    "pairs",
    [
        [(1, 2), (2, 3), (1, 3)],  # triangle (regular: ranks stay 1.0)
        [(0, 1), (0, 2), (0, 3)],  # star (hub accumulates rank)
        [(1, 2), (2, 3), (3, 4), (4, 5)],  # chain
    ],
)
def test_pagerank_matches_reference(spark, pairs):
    edges = sym(pairs)
    df = spark.createDataFrame(edges, ["src", "dst"])
    got = {r["node"]: r["rank"] for r in pagerank(df, n_iter=3).collect()}
    want = py_pagerank(edges, n_iter=3)
    assert set(got) == set(want)
    for n in want:
        assert got[n] == pytest.approx(want[n], rel=1e-12)


def test_pagerank_regular_graph_is_stationary(spark):
    # Every node of a k-regular graph keeps rank exactly 1.0.
    edges = sym([(1, 2), (2, 3), (1, 3)])
    df = spark.createDataFrame(edges, ["src", "dst"])
    for r in pagerank(df, n_iter=5).collect():
        assert r["rank"] == pytest.approx(1.0, abs=1e-12)


def test_pagerank_total_rank_bounded(spark):
    # With no dangling nodes, total rank is conserved at n (teleport
    # replaces exactly what damping removes).
    edges = sym([(0, 1), (0, 2), (0, 3), (2, 3)])
    df = spark.createDataFrame(edges, ["src", "dst"])
    ranks = [r["rank"] for r in pagerank(df, n_iter=4).collect()]
    assert sum(ranks) == pytest.approx(4.0, rel=1e-9)
