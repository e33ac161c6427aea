"""ANF / HyperBall neighborhood function (engine.anf_*).

Exact-bitset mode is checked against a brute-force BFS pair count on the
toy graphs at several partition counts; HLL mode against the exact values
with the standard-error tolerance; effective diameter against a hand
reimplementation of the interpolation on a chain graph.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph, effective_diameter
from tests.util import build_toy_layout


def brute_force_nf(adj: dict[int, list[int]], max_t: int) -> list[int]:
    """N(t) for t=0..max_t by per-source BFS over the directed adjacency."""
    nodes = set(adj)
    for outs in adj.values():
        nodes.update(outs)
    counts = []
    dist = {}
    for s in nodes:
        d = {s: 0}
        frontier = [s]
        t = 0
        while frontier:
            t += 1
            nxt = []
            for u in frontier:
                for v in adj.get(u, []):
                    if v not in d:
                        d[v] = t
                        nxt.append(v)
            frontier = nxt
        dist[s] = d
    for t in range(max_t + 1):
        counts.append(sum(1 for s in nodes for v, dv in dist[s].items()
                          if dv <= t))
    return counts


@pytest.mark.parametrize("num_parts", [1, 3])
@pytest.mark.parametrize("name", ["g6", "g5", "dangling_g7"])
def test_exact_neighborhood_matches_bruteforce(tmp_dir, name, num_parts):
    adj = TOY_GRAPHS[name]
    want = brute_force_nf(adj, 5)
    lay = os.path.join(tmp_dir, f"anf_{name}_{num_parts}")
    build_toy_layout(adj, lay, num_parts)
    with ShardedGraph(lay) as g:
        nf = g.neighborhood_function(mode="exact", max_distance=5).to_pandas()
    got = dict(zip(nf.distance, nf.reachable_pairs))
    assert [got[t] for t in range(6)] == want


def test_exact_saturation_stop(tmp_dir):
    # max_distance=None runs until every ball is closed; the last row equals
    # the number of connected (u,v) pairs (transitive closure + self pairs)
    adj = TOY_GRAPHS["g6"]
    want = brute_force_nf(adj, 64)
    lay = os.path.join(tmp_dir, "anf_sat")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        nf = g.neighborhood_function(mode="exact").to_pandas()
    assert int(nf.reachable_pairs.iloc[-1]) == want[-1]


def test_hll_tracks_exact(tmp_dir):
    # 64 registers → ~13% stderr per vertex, much lower on the 126-vertex
    # sum; assert every N(t) estimate within 10% of exact
    adj = {i: [(i + 1) % 40, (i * 7 + 3) % 40] for i in range(40)}
    want = brute_force_nf(adj, 6)
    lay = os.path.join(tmp_dir, "anf_hll")
    build_toy_layout(adj, lay, 3)
    with ShardedGraph(lay) as g:
        nf = g.neighborhood_function(mode="hll", precision_bits=6,
                                     max_distance=6).to_pandas()
    got = dict(zip(nf.distance, nf.reachable_pairs))
    for t in range(7):
        assert abs(got[t] - want[t]) / want[t] < 0.10, (t, got[t], want[t])


def test_hll_partition_invariant(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    results = []
    for P in (1, 2, 4):
        lay = os.path.join(tmp_dir, f"anf_pinv_{P}")
        build_toy_layout(adj, lay, P)
        with ShardedGraph(lay) as g:
            nf = g.neighborhood_function(mode="hll", precision_bits=6,
                                         max_distance=4, seed=7).to_pandas()
        results.append(list(nf.reachable_pairs))
    # registers are P-invariant (max-closure of per-vertex init hashes) and
    # the sum is an exact integer fold over the 2^-20 quantization grid
    # (engine.ANF_HLL_QUANT), so N(t) is bit-identical across P
    assert results[0] == results[1]
    assert results[0] == results[2]


def test_ball_sizes_exact(tmp_dir):
    # per-vertex in-ball sizes: #sources that reach v within t
    adj = {0: [1], 1: [2], 2: []}
    lay = os.path.join(tmp_dir, "anf_balls")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        g.neighborhood_function(mode="exact", max_distance=2)
        balls = g.anf_ball_sizes().to_pandas()
    got = dict(zip(balls.vertex, balls.ball))
    assert got == {0: 1, 1: 2, 2: 3}


def test_effective_diameter_chain(tmp_dir):
    # directed 6-chain: exact NF known in closed form; check the
    # interpolated 0.9-diameter against a hand computation
    n = 6
    adj = {i: [i + 1] for i in range(n - 1)}
    lay = os.path.join(tmp_dir, "anf_eff")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        nf = g.neighborhood_function(mode="exact")
    counts = nf["reachable_pairs"].to_numpy(zero_copy_only=False).astype(float)
    target = 0.9 * counts[-1]
    t = int(np.searchsorted(counts, target))
    want = t - 1 + (target - counts[t - 1]) / (counts[t] - counts[t - 1])
    assert effective_diameter(nf) == pytest.approx(want)
    assert 0 < effective_diameter(nf) <= n - 1


def test_hyperball_balls_match_duckdb(tmp_dir):
    """Engine per-vertex HyperBall estimates == the DuckDB oracle's
    left-associated fold replay — bitwise except the linear-counting ``ln``
    branch (≤1 ulp of libm divergence, far below the gate's rounding)."""
    import duckdb

    adj = {0: [1, 1, 2], 1: [3, 0], 2: [3, 0], 3: [0, 5], 4: [0],
           6: [6], 5: [7], 7: [8]}
    lay = os.path.join(tmp_dir, "hb")
    build_toy_layout(adj, lay, 3)
    with ShardedGraph(lay) as g:
        g.neighborhood_function(mode="hll", precision_bits=6, max_distance=4)
        df = g.anf_ball_sizes().to_pandas()
    got = dict(zip(df.vertex.astype(int), df.ball))

    from cassovary_ray.oracles import hyperball_sql

    cte = " UNION ALL ".join(f"SELECT {u} AS src, {v} AS dst"
                             for u, nb in adj.items() for v in nb)
    want = {int(v): float(x)
            for v, x in duckdb.sql(hyperball_sql(cte, 6, 1, 4)).fetchall()}
    assert set(got) == set(want)
    for v in got:
        assert got[v] == pytest.approx(want[v], rel=5e-15), v


def test_anf_hll_matches_duckdb(tmp_dir):
    """Engine N(t) HLL estimates == the DuckDB oracle bit-for-bit: both
    sides sum floor(ball * 2^20) as exact integers (engine.ANF_HLL_QUANT)
    and divide by the power-of-two grid at the end."""
    import duckdb

    adj = {0: [1, 1, 2], 1: [3, 0], 2: [3, 0], 3: [0, 5], 4: [0],
           6: [6], 5: [7], 7: [8], 9: [10, 11], 10: [12], 11: [12], 12: [9]}
    lay = os.path.join(tmp_dir, "anf_sql")
    build_toy_layout(adj, lay, 3)
    with ShardedGraph(lay) as g:
        nf = g.neighborhood_function(mode="hll", precision_bits=6,
                                     max_distance=4).to_pandas()
    got = dict(zip(nf.distance.astype(int), nf.reachable_pairs))

    from cassovary_ray.oracles import anf_hll_sql

    cte = " UNION ALL ".join(f"SELECT {u} AS src, {v} AS dst"
                             for u, nb in adj.items() for v in nb)
    want = {int(t): float(x)
            for t, x in duckdb.sql(anf_hll_sql(cte, 6, 1, 4)).fetchall()}
    assert got == want
