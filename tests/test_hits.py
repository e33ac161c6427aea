"""HITS golden vectors cloned from ``HitsSpec.scala:29-86`` (FIXTURES.md §4),
tolerance 5e-4; iteration counts pinned (30 for g6, 32 for g6-onlyin)."""

from __future__ import annotations

import os

import pytest

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph

from tests.util import build_toy_layout, state_by_node

HUBS_UNNORM = {10: 0.9484, 11: 1.0000, 12: 0.4543, 13: 1.0000, 14: 0.0000, 15: 0.2787}
AUTH_UNNORM = {10: 0.0945, 11: 0.4162, 12: 1.0000, 13: 0.3217, 14: 0.8324, 15: 0.0000}
HUBS_NORM = {10: 0.2576, 11: 0.2716, 12: 0.1234, 13: 0.2716, 14: 0.0000, 15: 0.0757}
AUTH_NORM = {10: 0.0355, 11: 0.1562, 12: 0.3753, 13: 0.1207, 14: 0.3123, 15: 0.0000}


def run_hits(adj, tmp_dir, num_parts=3, reverse=False, **kwargs):
    lay = os.path.join(tmp_dir, "fwd")
    rev = os.path.join(tmp_dir, "rev")
    build_toy_layout(adj, lay, num_parts, reverse=reverse)
    build_toy_layout(adj, rev, num_parts, reverse=not reverse)
    with ShardedGraph(lay, reverse_layout_dir=rev) as g:
        hubs_ds, auth_ds, iters = g.hits(**kwargs)
        hubs = state_by_node(hubs_ds.to_pandas(), adj, "hubs")
        auth = state_by_node(auth_ds.to_pandas(), adj, "authorities")
    return hubs, auth, iters


def test_g6_unnormalized(tmp_dir):
    hubs, auth, iters = run_hits(TOY_GRAPHS["g6"], tmp_dir, normalize=False)
    assert iters == 30
    for n in hubs:
        assert hubs[n] == pytest.approx(HUBS_UNNORM[n], abs=5e-4)
        assert auth[n] == pytest.approx(AUTH_UNNORM[n], abs=5e-4)


@pytest.mark.parametrize("num_parts", [1, 4])
def test_g6_normalized(tmp_dir, num_parts):
    hubs, auth, iters = run_hits(TOY_GRAPHS["g6"], tmp_dir, num_parts, normalize=True)
    assert iters == 30
    for n in hubs:
        assert hubs[n] == pytest.approx(HUBS_NORM[n], abs=5e-4)
        assert auth[n] == pytest.approx(AUTH_NORM[n], abs=5e-4)


def test_g6_onlyin_swaps_hubs_and_auth(tmp_dir):
    """`HitsSpec.scala` g6_onlyin: hubs/auth vectors swap; 32 iterations."""
    hubs, auth, iters = run_hits(TOY_GRAPHS["g6"], tmp_dir, reverse=True, normalize=True)
    assert iters == 32
    for n in hubs:
        assert hubs[n] == pytest.approx(AUTH_NORM[n], abs=5e-4)
        assert auth[n] == pytest.approx(HUBS_NORM[n], abs=5e-4)


# -- SALSA (engine.GraphShard SALSA block; numpy cross-check) ---------------

def _salsa_numpy(adj, iterations):
    import numpy as np

    verts = sorted({u for u in adj} | {v for nb in adj.values() for v in nb})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    E = [(idx[u], idx[v]) for u, nb in adj.items() for v in nb]
    outdeg = np.zeros(n); indeg = np.zeros(n)
    for u, v in E:
        outdeg[u] += 1; indeg[v] += 1
    a = np.full(n, 1.0 / n)
    h = np.zeros(n)
    for _ in range(iterations):
        h = np.zeros(n)
        for u, v in E:
            h[u] += a[v] / indeg[v]
        if h.sum() > 0:
            h = h / h.sum()
        a = np.zeros(n)
        for u, v in E:
            a[v] += h[u] / outdeg[u]
        if a.sum() > 0:
            a = a / a.sum()
    return verts, h, a


@pytest.mark.parametrize("num_parts", [1, 3])
def test_salsa_matches_numpy_reference(tmp_dir, num_parts):
    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "sfwd")
    rev = os.path.join(tmp_dir, "srev")
    build_toy_layout(adj, lay, num_parts)
    build_toy_layout(adj, rev, num_parts, reverse=True)
    with ShardedGraph(lay, reverse_layout_dir=rev) as g:
        hubs_ds, auth_ds, iters = g.salsa(max_iterations=8, tolerance=0.0)
        hubs = state_by_node(hubs_ds.to_pandas(), adj, "hubs")
        auth = state_by_node(auth_ds.to_pandas(), adj, "authorities")
    assert iters == 8
    verts, h, a = _salsa_numpy(adj, 8)
    for i, v in enumerate(verts):
        assert hubs[v] == pytest.approx(h[i], abs=1e-12)
        assert auth[v] == pytest.approx(a[i], abs=1e-12)
    # both sides are probability vectors
    assert sum(hubs.values()) == pytest.approx(1.0, abs=1e-9)
    assert sum(auth.values()) == pytest.approx(1.0, abs=1e-9)
