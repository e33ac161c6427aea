"""Katz centrality (ShardedGraph.katz) vs dense numpy truncated power series."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cassovary_ray.corpus import TOY_GRAPHS, graph_vertices
from cassovary_ray.engine import ShardedGraph

from tests.util import build_toy_layout, state_by_node


def numpy_katz(adj, alpha, beta, iterations):
    verts = sorted(graph_vertices(adj))
    idx = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for u, nbrs in adj.items():
        for v in nbrs:
            A[idx[u], idx[v]] += 1.0
    x = np.full(len(verts), float(beta))
    for _ in range(iterations):
        x = beta + alpha * (A.T @ x)
    return {v: x[idx[v]] for v in verts}


@pytest.mark.parametrize("num_parts", [1, 3])
def test_katz_g6_truncated_series(tmp_dir, num_parts):
    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, num_parts)
    with ShardedGraph(lay) as g:
        df = g.katz(alpha=0.1, beta=1.0, max_iterations=5).to_pandas()
    got = state_by_node(df, adj, "katz")
    want = numpy_katz(adj, 0.1, 1.0, 5)
    for n, w in want.items():
        assert got[n] == pytest.approx(w, rel=1e-12)


def test_katz_converges_to_fixed_point(tmp_dir):
    # alpha far below 1/lambda_max: the truncated sum approaches the solve
    adj = TOY_GRAPHS["g7"]
    verts = sorted(graph_vertices(adj))
    idx = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for u, nbrs in adj.items():
        for v in nbrs:
            A[idx[u], idx[v]] += 1.0
    alpha, beta = 0.05, 1.0
    exact = np.linalg.solve(np.eye(len(verts)) - alpha * A.T,
                            np.full(len(verts), beta))
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        df = g.katz(alpha=alpha, beta=beta, max_iterations=60,
                    tolerance=1e-14).to_pandas()
    got = state_by_node(df, adj, "katz")
    for v in verts:
        assert got[v] == pytest.approx(exact[idx[v]], rel=1e-9)


# -- eigenvector centrality (power iteration) ---------------------------------


def numpy_power_iteration(adj, iterations):
    verts = sorted(graph_vertices(adj))
    idx = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for u, nbrs in adj.items():
        for v in nbrs:
            A[idx[u], idx[v]] += 1.0
    x = np.ones(len(verts))
    x = x / np.linalg.norm(x)
    for _ in range(iterations):
        y = A.T @ x
        x = y / np.linalg.norm(y)
    return {v: x[idx[v]] for v in verts}


@pytest.mark.parametrize("num_parts", [1, 3])
def test_eigenvector_matches_numpy_power_iteration(tmp_dir, num_parts):
    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, num_parts)
    with ShardedGraph(lay) as g:
        df = g.eigenvector_centrality(max_iterations=7,
                                      tolerance=None).to_pandas()
    got = state_by_node(df, adj, "eig")
    want = numpy_power_iteration(adj, 7)
    for n, w in want.items():
        assert got[n] == pytest.approx(w, abs=1e-12)


def test_eigenvector_complete_graph_uniform(tmp_dir):
    from cassovary_ray.corpus import complete_graph

    adj = complete_graph(6)
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        df = g.eigenvector_centrality(max_iterations=50,
                                      tolerance=1e-14).to_pandas()
    got = state_by_node(df, adj, "eig")
    for v, x in got.items():
        assert x == pytest.approx(1 / np.sqrt(6), abs=1e-10)


# -- topological layers (max-plus longest path) --------------------------------


def test_topological_layers_diamond(tmp_dir):
    adj = {0: [1, 2], 1: [3], 2: [3], 3: [4]}
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 3)
    with ShardedGraph(lay) as g:
        df = g.topological_layers().to_pandas()
    got = state_by_node(df, adj, "layer")
    assert got == {0: 0, 1: 1, 2: 1, 3: 2, 4: 3}


def test_topological_layers_cycle_raises(tmp_dir):
    adj = {0: [1], 1: [2], 2: [0]}
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError, match="cycle"):
            g.topological_layers()


def test_topological_layers_vs_brute_random(tmp_dir):
    rng = np.random.default_rng(37)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 60, (300, 2))
                    if a < b})  # id-ordered → DAG
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, [])
    # brute longest-path layer by increasing id (a valid topo order here)
    want = {v: 0 for v in adj}
    for a, b in sorted(pairs):
        want[b] = max(want[b], want[a] + 1)
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 3)
    with ShardedGraph(lay) as g:
        df = g.topological_layers().to_pandas()
    got = state_by_node(df, adj, "layer")
    assert got == want


def test_katz_requires_stop_condition(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 1)
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError, match="stopping condition"):
            g.katz(max_iterations=None, tolerance=None)
