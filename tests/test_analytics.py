"""Degrees / mutual edges / triangles / similarity / BFS — exact fixtures
from SURVEY §2.6-2.8 and FIXTURES §4 (closed forms + hand-counted toys)."""

from __future__ import annotations

import math

import pytest
import ray.data

from cassovary_ray.analytics import (
    bfs,
    degree_centrality,
    degrees,
    distinct_edges,
    local_triangle_counts,
    mutual_edge_count,
    similarity_top_k,
    triangle_count,
    undirected_canonical_edges,
    vertex_count,
)
from cassovary_ray.corpus import TOY_GRAPHS, complete_graph, er_graph

from tests.util import edges_ds_for_graph


def test_degrees_g6():
    df = degrees(edges_ds_for_graph(TOY_GRAPHS["g6"])).to_pandas()
    got = {r.vertex: (r.out_deg, r.in_deg) for r in df.itertuples()}
    assert got == {10: (3, 1), 11: (2, 2), 12: (1, 3), 13: (2, 1), 14: (1, 3), 15: (2, 1)}


def test_vertex_count_counts_dst_only_nodes():
    assert vertex_count(edges_ds_for_graph(TOY_GRAPHS["g5"])) == 5


def test_degree_centrality_normalized():
    df = degree_centrality(edges_ds_for_graph(TOY_GRAPHS["g6"]), "out").to_pandas()
    got = dict(zip(df.vertex, df.centrality))
    assert got[10] == pytest.approx(3 / 5)
    assert got[12] == pytest.approx(1 / 5)


def test_distinct_edges_dedup():
    import pyarrow as pa

    e = ray.data.from_arrow(
        pa.table({"src": [1, 1, 1, 2], "dst": [2, 2, 3, 3]})
    )
    assert distinct_edges(e).count() == 3


def test_distinct_edges_small_domain_matches_groupby_path():
    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(7)
    src = rng.integers(0, 50, 5000)
    dst = rng.integers(0, 50, 5000)
    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src, pa.int64()), "dst": pa.array(dst, pa.int64())})
    ).repartition(8)
    want = set(map(tuple, np.unique(np.c_[src, dst], axis=0)))
    for P in (1, 4):
        df = distinct_edges(e, small_domain=True, num_partitions=P).to_pandas()
        assert set(zip(df.src, df.dst)) == want
        assert len(df) == len(want)


def test_mutual_edges():
    # g7 reciprocal pairs by hand: 10↔11, 11↔14, 12↔13, 15↔16 → 4
    assert mutual_edge_count(edges_ds_for_graph(TOY_GRAPHS["g2_mutual"])) == 1
    assert mutual_edge_count(edges_ds_for_graph(TOY_GRAPHS["g2_nonmutual"])) == 0
    assert mutual_edge_count(edges_ds_for_graph(TOY_GRAPHS["g7"])) == 4


def brute_force_triangles(adj) -> int:
    und = set()
    for u, nbrs in adj.items():
        for v in nbrs:
            if u != v:
                und.add((min(u, v), max(u, v)))
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    count = 0
    for u, v in und:
        count += len(nbr[u] & nbr[v] - {u, v})
    return count // 3 if count % 3 == 0 else count / 3


@pytest.mark.parametrize("n", [4, 6, 10])
def test_triangles_complete_graph(n):
    """K_n → n(n−1)(n−2)/6 exactly (`TriangleCountSpec.scala:75-88`)."""
    got = triangle_count(edges_ds_for_graph(complete_graph(n)))
    assert got == n * (n - 1) * (n - 2) // 6


def test_triangles_g6_undirected():
    adj = TOY_GRAPHS["g6"]
    assert triangle_count(edges_ds_for_graph(adj)) == brute_force_triangles(adj)


def test_triangles_er_vs_bruteforce():
    adj = er_graph(40, 0.15, seed=7)
    want = brute_force_triangles(adj)
    assert want > 0
    assert triangle_count(edges_ds_for_graph(adj)) == want


def test_undirected_canonical():
    df = undirected_canonical_edges(edges_ds_for_graph(TOY_GRAPHS["g2_mutual"])).to_pandas()
    assert len(df) == 1 and df.iloc[0].src == 1 and df.iloc[0].dst == 2


def brute_force_similarity(adj, metric):
    nbrs = {u: set(vs) for u, vs in adj.items() if vs}
    out = {}
    for u in nbrs:
        for w in nbrs:
            if u == w:
                continue
            c = len(nbrs[u] & nbrs[w])
            if c == 0:
                continue
            if metric == "jaccard":
                s = c / len(nbrs[u] | nbrs[w])
            else:
                s = c / math.sqrt(len(nbrs[u]) * len(nbrs[w]))
            out.setdefault(u, []).append((s, w))
    return {u: sorted(v, key=lambda t: (-t[0], t[1])) for u, v in out.items()}


@pytest.mark.parametrize("metric", ["jaccard", "cosine"])
def test_similarity_vs_bruteforce(metric):
    adj = TOY_GRAPHS["g7"]
    df = similarity_top_k(edges_ds_for_graph(adj), k=3, metric=metric).to_pandas()
    want = brute_force_similarity(adj, metric)
    for u, rows in df.groupby("u"):
        rows = rows.sort_values("rank")
        expect = want[u][:3]
        assert list(rows["w"]) == [w for _, w in expect]
        for got_s, (exp_s, _) in zip(rows["score"], expect):
            assert got_s == pytest.approx(exp_s, abs=1e-12)


def test_similar_pairs_global_topk_vs_bruteforce():
    """similar_pairs_top_k (getTopKAllSimilarPairs, Similarity.scala:85-89):
    global top-k canonical pairs, score desc then (lower u, lower w)."""
    from cassovary_ray.analytics import similar_pairs_top_k

    adj = TOY_GRAPHS["g7"]
    per_u = brute_force_similarity(adj, "jaccard")
    pairs = {}
    for u, lst in per_u.items():
        for s, w in lst:
            pairs[(min(u, w), max(u, w))] = s
    want = sorted(pairs.items(), key=lambda t: (-t[1], t[0]))[:4]
    df = (similar_pairs_top_k(edges_ds_for_graph(adj), k=4)
          .to_pandas().reset_index(drop=True))
    got = [((int(r.u), int(r.w)), float(r.score)) for r in df.itertuples()]
    assert [p for p, _ in got] == [p for p, _ in want]
    for (_, gs), (_, ws) in zip(got, want):
        assert gs == pytest.approx(ws, abs=1e-12)


def test_bfs_g3():
    """BFS on g3 from 10 → [(10,0),(11,1),(12,1)] (`GraphUtilsSpec.scala:90-94`)."""
    df = bfs(edges_ds_for_graph(TOY_GRAPHS["g3"]), [10]).to_pandas()
    got = dict(zip(df.vertex, df.depth))
    assert got == {10: 0, 11: 1, 12: 1}


def test_bfs_depth_limit_and_chain():
    adj = {0: [1], 1: [2], 2: [3], 3: []}
    df = bfs(edges_ds_for_graph(adj), [0], max_depth=2).to_pandas()
    assert dict(zip(df.vertex, df.depth)) == {0: 0, 1: 1, 2: 2}


def test_cooccurrence_hub_guard_bounds_fanout():
    """Skew guard (round-2): a high-in-degree hub dst is excluded from the
    co-occurrence self-join when max_in_deg is set, bounding the deg² pair
    fan-out; pairs through normal vertices are unaffected."""
    from cassovary_ray.analytics import _cooccurrence, similarity_top_k

    # 20 spokes all point at hub 100; spokes 0 and 1 also share neighbor 50
    adj = {i: [100] for i in range(20)}
    adj[0] = [100, 50]
    adj[1] = [100, 50]
    e = edges_ds_for_graph(adj)
    exact = _cooccurrence(e, 4).to_pandas()
    assert len(exact) == 20 * 19  # every ordered spoke pair shares the hub
    guarded = _cooccurrence(e, 4, max_in_deg=5).to_pandas()
    got = {(r.u, r.w): r.common for r in guarded.itertuples()}
    assert got == {(0, 1): 1, (1, 0): 1}  # only the pairs via vertex 50
    # public surface: similarity rows collapse the same way, but degrees in
    # the denominator still count all out-edges (deg 2 each, common 1)
    sim = similarity_top_k(e, k=3, max_in_deg=5).to_pandas()
    assert set(zip(sim.u, sim.w)) == {(0, 1), (1, 0)}
    assert sim.score.tolist() == pytest.approx([1 / 3, 1 / 3])


# -- per-vertex triangles / local clustering (analytics.local_triangle_counts)


def brute_force_local_triangles(adj):
    nbr = {}
    for u, nbrs in adj.items():
        for v in nbrs:
            if u != v:
                nbr.setdefault(u, set()).add(v)
                nbr.setdefault(v, set()).add(u)
    tri = {}
    for v, ns in nbr.items():
        t = 0
        for a in ns:
            t += len((nbr[a] & ns) - {v})
        tri[v] = t // 2
    return nbr, tri


@pytest.mark.parametrize("n", [4, 6])
def test_local_triangles_complete_graph(n):
    """K_n: every vertex closes C(n−1, 2) triangles, lcc = 1."""
    df = local_triangle_counts(edges_ds_for_graph(complete_graph(n))).to_pandas()
    assert len(df) == n
    want = (n - 1) * (n - 2) // 2
    assert set(df.triangles) == {want}
    assert all(abs(x - 1.0) < 1e-12 for x in df.lcc)


def test_local_triangles_er_vs_bruteforce():
    adj = er_graph(40, 0.15, seed=7)
    nbr, tri = brute_force_local_triangles(adj)
    df = local_triangle_counts(edges_ds_for_graph(adj)).to_pandas()
    got_t = dict(zip(df.vertex, df.triangles))
    got_l = dict(zip(df.vertex, df.lcc))
    assert set(got_t) == set(nbr)
    for v in nbr:
        assert got_t[v] == tri[v], v
        d = len(nbr[v])
        want_lcc = (2.0 * tri[v]) / (d * (d - 1.0)) if d >= 2 else 0.0
        assert got_l[v] == pytest.approx(want_lcc, abs=1e-12)
    # global consistency: Σ per-vertex = 3 × total
    assert sum(got_t.values()) == 3 * triangle_count(edges_ds_for_graph(adj))


def test_local_triangles_triangle_free_graph():
    """Directed 4-cycle has no triangles; every vertex deg 2, lcc 0."""
    adj = {0: [1], 1: [2], 2: [3], 3: [0]}
    df = local_triangle_counts(edges_ds_for_graph(adj)).to_pandas()
    assert set(df.triangles) == {0} and set(df.lcc) == {0.0}
