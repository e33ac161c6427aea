"""reciprocity / degree histogram / two-hop / k-core / components-from-pairs
— brute-force-verified on hand fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray import analytics


def _edges(pairs):
    s, d = zip(*pairs) if pairs else ((), ())
    return ray.data.from_arrow(pa.table({
        "src": pa.array(list(s), pa.int64()),
        "dst": pa.array(list(d), pa.int64()),
    }))


def test_reciprocity_fixture():
    # 1<->2 mutual, 1->3 and 3->2 one-way, self-loop 4->4 dropped, dup edge
    t = analytics.reciprocity(
        _edges([(1, 2), (2, 1), (1, 3), (3, 2), (4, 4), (1, 3)]))
    d = t.to_pydict()
    assert d["mutual_edges"] == [2]
    assert d["total_edges"] == [4]
    assert d["reciprocity"] == [0.5]


def test_degree_histogram_fixture():
    # out-degrees: 1->2, 1->3 (deg 2); 2->3 (deg 1); 3 (deg 0)
    out = analytics.degree_histogram(_edges([(1, 2), (1, 3), (2, 3)]), "out")
    got = {r["deg"]: r["n_vertices"] for r in out.take_all()}
    assert got == {2: 1, 1: 1, 0: 1}
    inn = analytics.degree_histogram(_edges([(1, 2), (1, 3), (2, 3)]), "in")
    got = {r["deg"]: r["n_vertices"] for r in inn.take_all()}
    assert got == {0: 1, 1: 1, 2: 1}


def _brute_two_hop(pairs, max_mid_deg=None):
    from collections import defaultdict

    e = sorted(set(pairs))
    outn, deg = defaultdict(set), defaultdict(int)
    for s, d in e:
        outn[s].add(d)
        deg[s] += 1
        deg[d] += 1
    expect = {}
    for v in outn:
        reach = set()
        for m in outn[v]:
            if max_mid_deg is not None and deg[m] > max_mid_deg:
                continue
            reach |= outn.get(m, set())
        reach.discard(v)
        if reach:
            expect[v] = len(reach)
    return expect


@pytest.mark.parametrize("guard", [None, 3])
def test_two_hop_counts_vs_brute(guard):
    rng = np.random.default_rng(7)
    pairs = {(int(a), int(b)) for a, b in rng.integers(0, 20, (120, 2)) if a != b}
    # add a hub: vertex 99 pointed at by many, pointing at many
    pairs |= {(i, 99) for i in range(8)} | {(99, 10 + i) for i in range(8)}
    got = {r["vertex"]: r["n_two_hop"]
           for r in analytics.two_hop_counts(_edges(sorted(pairs)),
                                             max_mid_deg=guard).take_all()}
    assert got == _brute_two_hop(pairs, guard)


def test_two_hop_hub_guard_bounds_expansion():
    # star through one hub: without guard every leaf sees all other leaves;
    # with the guard the hub is never used as a middle -> no output rows
    pairs = [(i, 100) for i in range(10)] + [(100, 200 + i) for i in range(10)]
    no_guard = analytics.two_hop_counts(_edges(pairs)).take_all()
    assert {r["vertex"]: r["n_two_hop"] for r in no_guard} == {
        i: 10 for i in range(10)}
    guarded = analytics.two_hop_counts(_edges(pairs), max_mid_deg=5).take_all()
    assert guarded == []


def _brute_k_core(pairs, k):
    from collections import defaultdict

    adj = defaultdict(set)
    for s, d in pairs:
        if s != d:
            adj[s].add(d)
            adj[d].add(s)
    a = {v: set(ns) for v, ns in adj.items()}
    while True:
        bad = [v for v, ns in a.items() if len(ns) < k]
        if not bad:
            return {v: len(ns) for v, ns in a.items()}
        for v in bad:
            for w in a[v]:
                a[w].discard(v)
            a.pop(v)


def test_k_core_k4_with_pendants():
    # K4 on {0,1,2,3} plus pendant chain 3-10-11: 3-core == K4 exactly
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    pairs = k4 + [(3, 10), (10, 11)]
    t = analytics.k_core(_edges(pairs), k=3)
    got = {r["vertex"]: r["degree"] for r in t.take_all()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3}


def test_k_core_empty_and_whole():
    tri = [(0, 1), (1, 2), (2, 0)]
    whole = analytics.k_core(_edges(tri), k=2)
    got = {r["vertex"]: r["degree"] for r in whole.take_all()}
    assert got == {0: 2, 1: 2, 2: 2}
    assert analytics.k_core(_edges(tri), k=3).count() == 0


def test_k_core_vs_brute_random():
    rng = np.random.default_rng(3)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (200, 2))
                    if a != b})
    for k in (2, 4, 6):
        t = analytics.k_core(_edges(pairs), k=k)
        got = {r["vertex"]: r["degree"] for r in t.take_all()}
        assert got == _brute_k_core(pairs, k)


def test_components_from_pairs_chain_and_islands():
    # chain 1-2-3-4, island {10,11}, singleton pair graph never sees 99
    pairs = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 2, 3, 10], pa.int64()),
        "b": pa.array([2, 3, 4, 11], pa.int64()),
    }))
    got = {r["vertex"]: r["component"]
           for r in analytics.components_from_pairs(pairs).take_all()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def _brute_scc(pairs):
    """Iterative Tarjan over the directed pair set."""
    from collections import defaultdict

    adj = defaultdict(list)
    verts = set()
    for s, d in sorted(set(pairs)):
        if s != d:
            adj[s].append(d)
            verts |= {s, d}
    index, low, onstk = {}, {}, {}
    stack, out, counter = [], {}, [0]
    for root in sorted(verts):
        if root in index:
            continue
        work = [(root, 0)]
        while work:
            v, pi = work.pop()
            if pi == 0:
                index[v] = low[v] = counter[0]
                counter[0] += 1
                stack.append(v)
                onstk[v] = True
            recurse = False
            for i in range(pi, len(adj[v])):
                w = adj[v][i]
                if w not in index:
                    work.append((v, i + 1))
                    work.append((w, 0))
                    recurse = True
                    break
                if onstk.get(w):
                    low[v] = min(low[v], index[w])
            if recurse:
                continue
            if low[v] == index[v]:
                comp = []
                while True:
                    w = stack.pop()
                    onstk[w] = False
                    comp.append(w)
                    if w == v:
                        break
                m = min(comp)
                for w in comp:
                    out[w] = m
            if work:
                u = work[-1][0]
                low[u] = min(low[u], low[v])
    return out


def test_scc_cycles_and_bridge():
    pairs = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6), (6, 4), (6, 7)]
    t = analytics.scc(_edges(pairs))
    got = dict(zip(t["vertex"].to_pylist(), t["component"].to_pylist()))
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 6: 4, 7: 7}


def test_scc_dag_all_singletons():
    pairs = [(1, 2), (2, 3), (1, 3), (3, 4)]
    t = analytics.scc(_edges(pairs))
    got = dict(zip(t["vertex"].to_pylist(), t["component"].to_pylist()))
    assert got == {1: 1, 2: 2, 3: 3, 4: 4}


def test_scc_vs_brute_random():
    rng = np.random.default_rng(11)
    # sparse enough for many nontrivial SCCs
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 25, (60, 2))
                    if a != b})
    t = analytics.scc(_edges(pairs))
    got = dict(zip(t["vertex"].to_pylist(), t["component"].to_pylist()))
    assert got == _brute_scc(pairs)


def test_scc_chain_of_cycles():
    # pivot-blocked chain: 3 two-cycles linked tail-to-head, ids increasing
    # along the chain so the forward-max color floods everything each round
    pairs = []
    for i in range(3):
        a, b = 10 * i, 10 * i + 1
        pairs += [(a, b), (b, a)]
        if i:
            pairs.append((10 * (i - 1), a))
    t = analytics.scc(_edges(pairs))
    got = dict(zip(t["vertex"].to_pylist(), t["component"].to_pylist()))
    assert got == {0: 0, 1: 0, 10: 10, 11: 10, 20: 20, 21: 20}


# -- k-truss / edge triangle supports (analytics.k_truss) --------------------


def _brute_truss(pairs, k):
    E = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    while True:
        adj = {}
        for a, b in E:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        sup = {e: len(adj[e[0]] & adj[e[1]]) for e in E}
        keep = {e for e in E if sup[e] >= k - 2}
        if keep == E:
            return sup
        E = keep


def _truss_map(ds):
    df = ds.to_pandas()
    return {(int(r.src), int(r.dst)): int(r.support) for r in df.itertuples()}


def test_k_truss_k5_complete():
    # K5: every edge closes 3 triangles → 5-truss is all of K5, 6-truss empty
    k5 = [(a, b) for a in range(5) for b in range(5) if a < b]
    got = _truss_map(analytics.k_truss(_edges(k5), k=5, num_partitions=2))
    assert got == {e: 3 for e in k5}
    assert len(_truss_map(analytics.k_truss(_edges(k5), k=6))) == 0


def test_k_truss_pendant_triangle_peeled():
    # K4 plus a triangle hanging off edge (0,1): 4-truss peels the pendant
    # vertex's two edges, and (0,1)'s support drops from 3 back to 2
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    pairs = k4 + [(0, 9), (1, 9)]
    got = _truss_map(analytics.k_truss(_edges(pairs), k=4, num_partitions=2))
    assert got == {e: 2 for e in k4}


def test_k_truss_vs_brute_random():
    rng = np.random.default_rng(7)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (140, 2))
                    if a != b})
    for k in (3, 4, 5):
        got = _truss_map(analytics.k_truss(_edges(pairs), k=k,
                                           num_partitions=3))
        assert got == _brute_truss(pairs, k)


def test_k_truss_k2_passthrough_and_supports():
    # k<=2 keeps every edge; supports still reported (0 for the island edge)
    pairs = [(0, 1), (1, 2), (2, 0), (3, 4)]
    got = _truss_map(analytics.k_truss(_edges(pairs), k=2))
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1, (3, 4): 0}


def test_k_truss_incremental_matches_full_enumeration():
    """The r5 incremental path (triangles enumerated once, supports
    maintained through the peel via removed-edge neighborhood joins) must
    equal the full re-enumeration path on an E-R fixture (VERDICT r4 #2)."""
    rng = np.random.default_rng(11)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (300, 2))
                    if a != b})
    for k in (3, 4):
        inc = _truss_map(analytics.k_truss(_edges(pairs), k=k,
                                           num_partitions=3))
        # broadcast_max=0 forces every round down the distributed
        # semi/anti-join path (the corpus-scale large-round branch)
        joined = _truss_map(analytics.k_truss(_edges(pairs), k=k,
                                              num_partitions=3,
                                              broadcast_max=0))
        full = _truss_map(analytics._k_truss_full(_edges(pairs), k=k,
                                                  num_partitions=3))
        assert inc == joined == full == _brute_truss(pairs, k)


def test_edge_triangle_supports_zero_fill():
    # path edges get support 0; triangle-free graphs don't crash the join
    pairs = [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (10, 12)]
    got = _truss_map(analytics.edge_triangle_supports(_edges(pairs),
                                                      num_partitions=2))
    assert got == {(0, 1): 0, (1, 2): 0, (2, 3): 0,
                   (10, 11): 1, (11, 12): 1, (10, 12): 1}
    tri_free = _truss_map(analytics.edge_triangle_supports(
        _edges([(0, 1), (1, 2)])))
    assert tri_free == {(0, 1): 0, (1, 2): 0}


def test_local_triangles_wedge_free_path():
    # regression: a path graph has no wedges after orientation; the matched-
    # triangle join must not see an empty-schema left side
    df = analytics.local_triangle_counts(_edges([(0, 1), (1, 2)])).to_pandas()
    assert (df["triangles"] == 0).all() and len(df) == 3


# -- ego-net extraction (analytics.ego_net) -----------------------------------


def _ego_edges(ds):
    df = ds.to_pandas()
    return set(zip(df["src"].astype(int), df["dst"].astype(int)))


def test_ego_net_out_radius1():
    pairs = [(0, 1), (0, 2), (1, 3), (3, 4), (10, 11)]
    got = _ego_edges(analytics.ego_net(_edges(pairs), [0], radius=1,
                                       direction="out"))
    assert got == {(0, 1), (0, 2)}


def test_ego_net_both_radius():
    pairs = [(0, 1), (0, 2), (1, 3), (3, 4), (10, 11)]
    # undirected ball of 4 at r=1: {4,3} → induced edge (3,4)
    assert _ego_edges(analytics.ego_net(_edges(pairs), [4], radius=1)) \
        == {(3, 4)}
    # r=2: {4,3,1} → (1,3),(3,4)
    assert _ego_edges(analytics.ego_net(_edges(pairs), [4], radius=2)) \
        == {(1, 3), (3, 4)}


def test_ego_net_vs_brute_random():
    rng = np.random.default_rng(11)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (120, 2))
                    if a != b})
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    for sources, r in ([5], 1), ([5, 17], 2):
        ball = set(sources)
        frontier = set(sources)
        for _ in range(r):
            frontier = {w for v in frontier for w in adj.get(v, ())} - ball
            ball |= frontier
        want = {(a, b) for a, b in pairs if a in ball and b in ball}
        got = _ego_edges(analytics.ego_net(_edges(pairs), sources, radius=r))
        assert got == want


# -- densest subgraph (analytics.densest_subgraph) ----------------------------


def _brute_densest(pairs, eps):
    E = {(min(a, b), max(a, b)) for a, b in pairs if a != b}
    best = None
    while E:
        deg = {}
        for a, b in E:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        nv = len(deg)
        density = (2 * len(E)) / (2.0 * nv)
        if best is None or density > best[0]:
            best = (density, dict(deg))
        thresh = (1.0 + eps) * ((2 * len(E)) / nv)
        keep = {v for v, d in deg.items() if d > thresh}
        E = {(a, b) for a, b in E if a in keep and b in keep}
    return best


def test_densest_planted_clique():
    # K8 on 100..107 + sparse 30-vertex periphery: peel finds the clique
    rng = np.random.default_rng(5)
    periph = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (25, 2))
                     if a != b})
    k8 = [(a, b) for a in range(100, 108) for b in range(100, 108) if a < b]
    pairs = periph + k8 + [(0, 100)]
    want_density, want_deg = _brute_densest(pairs, 0.1)
    df = analytics.densest_subgraph(_edges(pairs), epsilon=0.1,
                                    num_partitions=2).to_pandas()
    assert dict(zip(df.vertex.astype(int), df.degree.astype(int))) == want_deg
    assert set(df.density) == {want_density}
    assert set(df.vertex) >= set(range(100, 108))


def test_densest_vs_brute_random():
    rng = np.random.default_rng(13)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (160, 2))
                    if a != b})
    want_density, want_deg = _brute_densest(pairs, 0.1)
    df = analytics.densest_subgraph(_edges(pairs), epsilon=0.1,
                                    num_partitions=3).to_pandas()
    assert dict(zip(df.vertex.astype(int), df.degree.astype(int))) == want_deg
    assert set(df.density) == {want_density}


def test_densest_empty():
    assert analytics.densest_subgraph(_edges([(1, 1)])).count() == 0


# -- conductance (analytics.conductance) ---------------------------------------


def _comm_ds(mapping):
    return ray.data.from_arrow(pa.table({
        "vertex": pa.array(list(mapping), pa.int64()),
        "community": pa.array([mapping[v] for v in mapping], pa.int64()),
    }))


def test_conductance_two_triangles_bridge():
    # triangles {0,1,2} and {10,11,12} joined by one bridge edge (2,10):
    # each side: vol 7, cut 1, total 14 → phi = 1/7
    pairs = [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10), (2, 10)]
    comm = _comm_ds({0: 0, 1: 0, 2: 0, 10: 1, 11: 1, 12: 1})
    df = analytics.conductance(_edges(pairs), comm).to_pandas()
    got = {int(r.community): (int(r.cut_edges), int(r.volume), r.conductance)
           for r in df.itertuples()}
    assert got == {0: (1, 7, 1 / 7), 1: (1, 7, 1 / 7)}


def test_conductance_no_cut_and_brute():
    # single community covering everything: cut 0, min(vol, tot-vol)=0 → 0.0
    pairs = [(0, 1), (1, 2)]
    df = analytics.conductance(_edges(pairs), _comm_ds({0: 5, 1: 5, 2: 5})).to_pandas()
    assert len(df) == 1 and df.iloc[0].cut_edges == 0 and df.iloc[0].conductance == 0.0

    rng = np.random.default_rng(17)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 30, (120, 2))
                    if a != b})
    cmap = {v: v % 4 for ab in pairs for v in ab}
    E = {(min(a, b), max(a, b)) for a, b in pairs}
    deg = {}
    for a, b in E:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    tot = 2 * len(E)
    want = {}
    for c in set(cmap.values()):
        vol = sum(d for v, d in deg.items() if cmap[v] == c)
        cut = sum(1 for a, b in E if (cmap[a] == c) != (cmap[b] == c))
        den = min(vol, tot - vol)
        want[c] = (cut, vol, cut / den if den > 0 else 0.0)
    df = analytics.conductance(_edges(pairs), _comm_ds(cmap),
                               num_partitions=3).to_pandas()
    got = {int(r.community): (int(r.cut_edges), int(r.volume), r.conductance)
           for r in df.itertuples()}
    assert got == want


# -- coreness (analytics.coreness, H-index iteration) -------------------------


def _brute_coreness(pairs):
    adj = {}
    for a, b in pairs:
        if a != b:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
    a = {v: set(ns) for v, ns in adj.items()}
    core, k = {}, 0
    while a:
        k = max(k, min(len(ns) for ns in a.values()))
        peel = [v for v, ns in a.items() if len(ns) <= k]
        while peel:
            for v in peel:
                core[v] = k
                for w in a[v]:
                    a[w].discard(v)
                del a[v]
            peel = [v for v, ns in a.items() if len(ns) <= k]
    return core


def test_coreness_k4_with_chain():
    # K4 + pendant chain 3-10-11: K4 vertices coreness 3, chain coreness 1
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    pairs = k4 + [(3, 10), (10, 11)]
    df = analytics.coreness(_edges(pairs)).to_pandas()
    got = dict(zip(df.vertex.astype(int), df.coreness.astype(int)))
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 10: 1, 11: 1}


def test_coreness_vs_brute_random():
    rng = np.random.default_rng(23)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 35, (220, 2))
                    if a != b})
    want = _brute_coreness(pairs)
    for P in (1, 3):
        df = analytics.coreness(_edges(pairs), num_partitions=P).to_pandas()
        got = dict(zip(df.vertex.astype(int), df.coreness.astype(int)))
        assert got == want


# -- Weisfeiler-Lehman refinement (analytics.wl_refinement) --------------------


def _brute_wl(pairs, rounds):
    import hashlib

    adj = {}
    for a, b in pairs:
        if a != b:
            a2, b2 = min(a, b), max(a, b)
            adj.setdefault(a2, set()).add(b2)
            adj.setdefault(b2, set()).add(a2)
    c = {v: hashlib.md5(str(len(ns)).encode()).hexdigest()
         for v, ns in adj.items()}
    for _ in range(rounds):
        c = {v: hashlib.md5(
                (c[v] + "|" + ",".join(sorted(c[u] for u in ns))).encode()
             ).hexdigest() for v, ns in adj.items()}
    return c


def test_wl_distinguishes_roles():
    # path P5: ends, their neighbors, and the center get distinct colors
    pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
    df = analytics.wl_refinement(_edges(pairs), rounds=2).to_pandas()
    got = dict(zip(df.vertex.astype(int), df.color))
    assert got == _brute_wl(pairs, 2)
    assert got[0] == got[4] and got[1] == got[3]  # mirror symmetry
    assert len({got[0], got[1], got[2]}) == 3     # three distinct roles


def test_wl_vs_brute_random():
    rng = np.random.default_rng(29)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 40, (130, 2))
                    if a != b})
    for P in (1, 3):
        df = analytics.wl_refinement(_edges(pairs), rounds=3,
                                     num_partitions=P).to_pandas()
        got = dict(zip(df.vertex.astype(int), df.color))
        assert got == _brute_wl(pairs, 3)


# -- contraction / neighbor sampling ------------------------------------------


def test_contract_graph_counts():
    # communities {0,1}->A, {2,3}->B, 4->C
    pairs = [(0, 2), (1, 2), (2, 0), (0, 1), (3, 4), (4, 4)]
    comm = _comm_ds({0: 10, 1: 10, 2: 20, 3: 20, 4: 30})
    t = analytics.contract_graph(_edges(pairs), comm).to_pandas()
    got = {(int(r.src), int(r.dst)): int(r.weight) for r in t.itertuples()}
    assert got == {(10, 20): 2, (20, 10): 1, (20, 30): 1}
    t2 = analytics.contract_graph(_edges(pairs), comm,
                                  keep_self_loops=True).to_pandas()
    got2 = {(int(r.src), int(r.dst)): int(r.weight) for r in t2.itertuples()}
    assert got2 == {(10, 20): 2, (20, 10): 1, (20, 30): 1,
                    (10, 10): 1, (30, 30): 1}


def test_sample_neighbors_deterministic_and_bounded():
    import hashlib

    rng = np.random.default_rng(19)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 25, (300, 2))
                    if a != b})
    k, seed = 3, 7
    want = {}
    bysrc = {}
    for a, b in pairs:
        bysrc.setdefault(a, []).append(b)
    for a, ds_ in bysrc.items():
        ranked = sorted(
            (hashlib.md5(f"{seed}|{a}|{d}".encode()).hexdigest(), d)
            for d in ds_)
        want[a] = sorted(d for _, d in ranked[:k])
    for P in (1, 4):
        df = analytics.sample_neighbors(
            _edges(pairs), k=k, seed=seed, num_partitions=P).to_pandas()
        got = {}
        for r in df.itertuples():
            got.setdefault(int(r.src), []).append(int(r.dst))
        assert {a: sorted(v) for a, v in got.items()} == want


# -- Boruvka minimum spanning forest -------------------------------------------


def _wedges(triples):
    s, d, w = zip(*triples) if triples else ((), (), ())
    return ray.data.from_arrow(pa.table({
        "src": pa.array(list(s), pa.int64()),
        "dst": pa.array(list(d), pa.int64()),
        "w": pa.array(list(w), pa.float64()),
    }))


def _brute_kruskal(triples):
    best = {}
    for a, b, w in triples:
        if a == b:
            continue
        k = (min(a, b), max(a, b))
        if k not in best or w < best[k]:
            best[k] = w
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    forest = set()
    for (a, b), w in sorted(best.items(), key=lambda kv: (kv[1], kv[0])):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
            forest.add((a, b, w))
    return forest


def test_msf_small_fixture():
    triples = [(0, 1, 1.0), (1, 2, 2.0), (0, 2, 3.0), (3, 4, 1.0),
               (2, 1, 0.5)]  # parallel (1,2) collapses to 0.5
    got = analytics.minimum_spanning_forest(_wedges(triples)).to_pandas()
    gset = set(zip(got.src.astype(int), got.dst.astype(int), got.w))
    assert gset == {(0, 1, 1.0), (1, 2, 0.5), (3, 4, 1.0)}


def test_msf_vs_kruskal_random():
    rng = np.random.default_rng(43)
    triples = [(int(a), int(b), float(rng.integers(1, 500)))
               for a, b in rng.integers(0, 40, (150, 2)) if a != b]
    want = _brute_kruskal(triples)
    for P in (1, 3):
        got = analytics.minimum_spanning_forest(
            _wedges(triples), num_partitions=P).to_pandas()
        gset = set(zip(got.src.astype(int), got.dst.astype(int), got.w))
        assert gset == want


def test_k_truss_empty_returns_dataset():
    # ADVICE r2: empty-truss branches must return a Dataset, not a raw
    # pyarrow.Table, so callers can keep chaining Dataset ops.
    ds = analytics.k_truss(_edges([(0, 1), (1, 2)]), k=4)
    assert hasattr(ds, "map_batches")
    assert ds.count() == 0
