"""Weighted/unweighted SSSP (Bellman-Ford min-plus BSP) — hand fixtures,
random-graph brute force, parallelism invariance, checkpoint resume."""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray.engine import ShardedGraph
from cassovary_ray.layout import build_edge_layout


def _weighted_layout(tmp_dir, E, num_parts, name="lw"):
    t = pa.table({
        "src": pa.array([e[0] for e in E], pa.int64()),
        "dst": pa.array([e[1] for e in E], pa.int64()),
        "weight": pa.array([e[2] for e in E], pa.float64()),
    })
    lay = os.path.join(tmp_dir, name)
    build_edge_layout(ray.data.from_arrow(t), lay, num_parts, weighted=True)
    return lay


DIAMOND = [(0, 1, 1.0), (0, 2, 5.0), (1, 2, 1.0), (2, 3, 2.0), (1, 3, 10.0),
           (7, 8, 1.0)]


@pytest.mark.parametrize("num_parts", [1, 2, 4])
def test_weighted_diamond(tmp_dir, num_parts):
    lay = _weighted_layout(tmp_dir, DIAMOND, num_parts)
    with ShardedGraph(lay) as g:
        got = {r["vertex"]: r["dist"] for r in g.sssp([0]).take_all()}
    # cheaper 2-hop route 0->1->2 beats the direct 0->2 edge; 7/8 unreached
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 4.0}


def test_multi_source_with_offsets(tmp_dir):
    lay = _weighted_layout(tmp_dir, DIAMOND, 3)
    with ShardedGraph(lay) as g:
        got = {r["vertex"]: r["dist"]
               for r in g.sssp({0: 0.0, 7: 2.5}).take_all()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 4.0, 7: 2.5, 8: 3.5}


def test_unweighted_hops(tmp_dir):
    E = [(0, 1), (1, 2), (2, 3), (3, 4), (0, 4)]
    t = pa.table({"src": pa.array([e[0] for e in E], pa.int64()),
                  "dst": pa.array([e[1] for e in E], pa.int64())})
    lay = os.path.join(tmp_dir, "lu")
    build_edge_layout(ray.data.from_arrow(t), lay, 2)
    with ShardedGraph(lay) as g:
        got = {r["vertex"]: r["dist"] for r in g.sssp([0]).take_all()}
    assert got == {0: 0.0, 1: 1.0, 2: 2.0, 3: 3.0, 4: 1.0}


def _bellman_ford(E, sources):
    dist = dict(sources)
    for _ in range(len({v for e in E for v in e[:2]})):
        changed = False
        for s, d, w in E:
            if s in dist and dist[s] + w < dist.get(d, np.inf):
                dist[d] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist


def test_random_graph_matches_bruteforce_and_parallelism(tmp_dir):
    rng = np.random.default_rng(13)
    E = {}
    while len(E) < 140:
        a, b = (int(x) for x in rng.integers(0, 30, 2))
        if a != b and (a, b) not in E:
            E[(a, b)] = round(float(rng.uniform(0.5, 4.0)), 2)
    E = sorted((a, b, w) for (a, b), w in E.items())
    want = _bellman_ford(E, {0: 0.0})
    results = []
    for P, name in [(1, "p1"), (4, "p4")]:
        lay = _weighted_layout(tmp_dir, E, P, name=name)
        with ShardedGraph(lay) as g:
            results.append({r["vertex"]: r["dist"] for r in g.sssp([0]).take_all()})
    assert results[0] == results[1]
    got = results[0]
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_checkpoint_resume_matches_straight(tmp_dir):
    lay = _weighted_layout(tmp_dir, DIAMOND, 3)
    ck = os.path.join(tmp_dir, "ck")
    with ShardedGraph(lay) as g1:
        g1.sssp([0], max_iterations=1, checkpoint_dir=ck, checkpoint_every=1)
    with ShardedGraph(lay) as g2:
        resumed = {r["vertex"]: r["dist"]
                   for r in g2.sssp([0], checkpoint_dir=ck, resume=True).take_all()}
    assert resumed == {0: 0.0, 1: 1.0, 2: 2.0, 3: 4.0}


def test_unknown_source_raises(tmp_dir):
    lay = _weighted_layout(tmp_dir, DIAMOND, 2, name="lx")
    with ShardedGraph(lay) as g:
        with pytest.raises(Exception):
            g.sssp([12345]).take_all()
