"""The generic VertexProgram extension protocol (rounds.py): engine parity
for the worked Katz example, a min-combine user program, post hooks, and
the stop-rule guards — all WITHOUT touching GraphShard internals."""

from __future__ import annotations

import os

import numpy as np
import pytest

from cassovary_ray.corpus import TOY_GRAPHS, graph_vertices
from cassovary_ray.engine import ShardedGraph
from cassovary_ray.rounds import KatzProgram, VertexProgram

from tests.util import build_toy_layout, state_by_node


@pytest.mark.parametrize("num_parts", [1, 3])
def test_katz_program_matches_engine_katz(tmp_dir, num_parts):
    """VERDICT r2 #4 done-criterion: an existing engine algorithm
    re-expressed through the public protocol with identical results."""
    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, num_parts)
    with ShardedGraph(lay) as g:
        via_engine = g.katz(alpha=0.1, beta=1.0, max_iterations=7).to_pandas()
        via_program = g.run_program(KatzProgram(alpha=0.1, beta=1.0),
                                    max_iterations=7).to_pandas()
    a = state_by_node(via_engine, adj, "katz")
    b = state_by_node(via_program, adj, "katz")
    for n in a:
        # same kernels, but the generic protocol adds beta AFTER combining
        # incoming partials where katz_round starts from a beta-filled
        # buffer — float association differs at ~1e-16
        assert a[n] == pytest.approx(b[n], rel=1e-12), (n, a[n], b[n])


def test_katz_program_tolerance_stop(tmp_dir):
    adj = TOY_GRAPHS["g7"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        df = g.run_program(KatzProgram(alpha=0.05), max_iterations=60,
                           tolerance=1e-14).to_pandas()
        iters = len([m for m in g.metrics if m.extra.get("algo") == "program:KatzProgram"])
        assert iters < 60  # converged before the cap
    # fixed point of x = 1 + 0.05 A^T x
    verts = sorted(graph_vertices(adj))
    idx = {v: i for i, v in enumerate(verts)}
    A = np.zeros((len(verts), len(verts)))
    for u, nbrs in adj.items():
        for v in nbrs:
            A[idx[u], idx[v]] += 1.0
    exact = np.linalg.solve(np.eye(len(verts)) - 0.05 * A.T, np.ones(len(verts)))
    got = state_by_node(df, adj, "katz")
    for v in verts:
        assert got[v] == pytest.approx(exact[idx[v]], rel=1e-9)


class MinAncestor(VertexProgram):
    """min reachable-ancestor id per vertex — a user-style min-combine
    program: x(v) = min(x(v), min over in-edges x(u))."""

    state_name = "min_anc"
    output_column = "min_ancestor"
    combine = "min"

    def init(self, ctx):
        ctx.state[self.state_name] = ctx.verts.astype(np.float64)

    def scatter(self, ctx):
        return ctx.state[self.state_name]

    def apply(self, ctx, incoming):
        cur = ctx.state[self.state_name]
        new = np.minimum(cur, incoming)  # incoming is +inf where no edge
        changed = float((new != cur).sum())
        ctx.state[self.state_name] = new
        return changed


def numpy_min_ancestor(adj):
    verts = sorted(graph_vertices(adj))
    x = {v: float(v) for v in verts}
    for _ in range(len(verts)):
        nxt = dict(x)
        for u, nbrs in adj.items():
            for v in nbrs:
                nxt[v] = min(nxt[v], x[u])
        x = nxt
    return x


@pytest.mark.parametrize("graph", ["g6", "g2_nonmutual"])
def test_min_combine_program(tmp_dir, graph):
    adj = TOY_GRAPHS[graph]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        df = g.run_program(MinAncestor(), max_iterations=None,
                           tolerance=0.0).to_pandas()
    got = state_by_node(df, adj, "min_ancestor")
    want = numpy_min_ancestor(adj)
    assert got == want


class NormalizedDegreeMass(VertexProgram):
    """One-round program exercising the post hook: mass(v) = in-degree(v),
    post-normalized to sum 1 across the shard-local slice... no — post runs
    per shard, so normalize by the GLOBAL n_total known via ctx."""

    state_name = "mass"
    output_column = "mass"

    def init(self, ctx):
        ctx.state[self.state_name] = np.zeros(ctx.n_local)
        self.scale = 1.0 / ctx.n_total

    def scatter(self, ctx):
        return np.ones(ctx.n_local)

    def apply(self, ctx, incoming):
        ctx.state[self.state_name] = incoming
        return 0.0

    def post(self, ctx):
        ctx.state[self.state_name] = ctx.state[self.state_name] / ctx.n_total


def test_post_hook_runs(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    n = len(graph_vertices(adj))
    indeg = {v: 0 for v in graph_vertices(adj)}
    for u, nbrs in adj.items():
        for v in nbrs:
            indeg[v] += 1
    with ShardedGraph(lay) as g:
        df = g.run_program(NormalizedDegreeMass(), max_iterations=1).to_pandas()
    got = state_by_node(df, adj, "mass")
    for v, d in indeg.items():
        assert got[v] == pytest.approx(d / n)


def test_run_program_requires_stop_condition(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 1)
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError, match="stopping condition"):
            g.run_program(KatzProgram(), max_iterations=None, tolerance=None)
        bad = KatzProgram()
        bad.combine = "mean"
        with pytest.raises(ValueError, match="combine"):
            g.run_program(bad, max_iterations=2)


# ---------------------------------------------------------------------------
# Luby maximal independent set through the protocol (rounds.MISProgram)
# ---------------------------------------------------------------------------

def _random_sym_adj(n=60, p=0.08, seed=7):
    """Random symmetric self-loop-free adjacency as {v: set(nbrs)}."""
    rng = np.random.default_rng(seed)
    adj = {v: set() for v in range(n)}
    for u in range(n):
        for v in range(u + 1, n):
            if rng.random() < p:
                adj[u].add(v)
                adj[v].add(u)
    return adj


def _directed_view(adj_sym):
    """One direction per undirected edge (the layout symmetrizes back)."""
    return {u: sorted(v for v in nbrs if v > u)
            for u, nbrs in adj_sym.items()}


def numpy_luby_mis(adj_sym):
    """Round-for-round reference simulation of MISProgram's semantics."""
    from cassovary_ray.rounds import mis_priority

    undecided = set(adj_sym)
    mis = set()
    r = 0
    while undecided:
        ids = np.array(sorted(undecided), dtype=np.int64)
        pri = dict(zip(ids.tolist(), mis_priority(ids, r)))
        sel = {v for v in undecided
               if all(pri[v] < pri[u] for u in adj_sym[v] if u in undecided)}
        assert sel, "Luby round selected nothing (persistent tie?)"
        mis |= sel
        undecided -= sel
        undecided -= {u for s in sel for u in adj_sym[s]}
        r += 1
        assert r < 10_000
    return mis


@pytest.mark.parametrize("num_parts", [1, 2, 4])
def test_mis_properties_and_parity(tmp_dir, num_parts):
    from cassovary_ray.rounds import MISProgram

    adj_sym = _random_sym_adj()
    lay = os.path.join(tmp_dir, f"layout{num_parts}")
    build_toy_layout(_directed_view(adj_sym), lay, num_parts,
                     undirected=True, dedup=True)
    with ShardedGraph(lay) as g:
        df = g.run_program(MISProgram(), max_iterations=None,
                           tolerance=0.0).to_pandas()
    got = {int(v) for v, f in zip(df["vertex"], df["in_mis"]) if f == 1.0}
    # independence: no edge inside the set
    for u in got:
        assert not (adj_sym[u] & got), (u, adj_sym[u] & got)
    # maximality: every non-member has a member neighbor
    for v in set(adj_sym) - got:
        assert adj_sym[v] & got, v
    # determinism: identical to the round-for-round numpy simulation
    assert got == numpy_luby_mis(adj_sym)


def test_mis_edgeless_and_star(tmp_dir):
    from cassovary_ray.rounds import MISProgram, mis_priority

    # star: center 0 vs leaves — MIS is either {0} or all leaves
    star = {0: {i for i in range(1, 8)}}
    star.update({i: {0} for i in range(1, 8)})
    lay = os.path.join(tmp_dir, "star")
    build_toy_layout(_directed_view(star), lay, 2,
                     undirected=True, dedup=True)
    with ShardedGraph(lay) as g:
        df = g.run_program(MISProgram(), max_iterations=None,
                           tolerance=0.0).to_pandas()
    got = {int(v) for v, f in zip(df["vertex"], df["in_mis"]) if f == 1.0}
    assert got == numpy_luby_mis(star)
    assert got == {0} or got == set(range(1, 8))
    # priorities are 52-bit ints exactly representable in float64
    p = mis_priority(np.array([0, 1, 2, -5, 2**62], dtype=np.int64), 3)
    assert (p >= 0).all() and (p < 2.0**52).all()
    assert (p == np.round(p)).all()


# ---------------------------------------------------------------------------
# Luby-per-color greedy coloring through the protocol (rounds.ColoringProgram)
# ---------------------------------------------------------------------------

def numpy_luby_coloring(adj_sym, rounds_per_color=6, max_colors=64):
    """Round-for-round reference simulation of ColoringProgram's fixed
    schedule (select/notify pairs, salt = color*64 + round)."""
    from cassovary_ray.rounds import mis_priority

    uncolored = set(adj_sym)
    color = {}
    for k in range(max_colors):
        if not uncolored:
            return color
        pool = set(uncolored)          # sat-outs rejoined
        for r in range(rounds_per_color):
            if not pool:
                break
            ids = np.array(sorted(pool), dtype=np.int64)
            pri = dict(zip(ids.tolist(), mis_priority(ids, k * 64 + r)))
            sel = {v for v in pool
                   if all(pri[v] < pri[u] for u in adj_sym[v] if u in pool)}
            for v in sel:
                color[v] = k
            uncolored -= sel
            pool -= sel
            pool -= {u for s in sel for u in adj_sym[s]}
    assert not uncolored, "coloring did not finish within max_colors"
    return color


@pytest.mark.parametrize("num_parts", [1, 2, 4])
def test_coloring_proper_and_parity(tmp_dir, num_parts):
    from cassovary_ray.rounds import ColoringProgram

    adj_sym = _random_sym_adj(n=60, p=0.12, seed=11)
    lay = os.path.join(tmp_dir, f"claylayout{num_parts}")
    build_toy_layout(_directed_view(adj_sym), lay, num_parts,
                     undirected=True, dedup=True)
    with ShardedGraph(lay) as g:
        df = g.run_program(ColoringProgram(), max_iterations=None,
                           tolerance=0.0).to_pandas()
    got = {int(v): int(c) for v, c in zip(df["vertex"], df["color"])}
    # complete + proper
    assert set(got) == set(adj_sym)
    assert all(c >= 0 for c in got.values())
    for u, nbrs in adj_sym.items():
        for v in nbrs:
            assert got[u] != got[v], f"edge ({u},{v}) monochromatic"
    # exact parity with the reference simulation (schedule + priorities)
    assert got == numpy_luby_coloring(adj_sym)


def test_coloring_color_count_reasonable(tmp_dir):
    from cassovary_ray.rounds import ColoringProgram

    adj_sym = _random_sym_adj(n=80, p=0.1, seed=23)
    lay = os.path.join(tmp_dir, "claybound")
    build_toy_layout(_directed_view(adj_sym), lay, 2,
                     undirected=True, dedup=True)
    with ShardedGraph(lay) as g:
        df = g.run_program(ColoringProgram(), max_iterations=None,
                           tolerance=0.0).to_pandas()
    max_deg = max(len(n) for n in adj_sym.values())
    assert df["color"].max() <= max_deg  # <= Delta + 1 classes (0-based)


def test_coloring_matches_duckdb_unroll(tmp_dir):
    """The oracle builder evaluates the literal same schedule: DuckDB
    unroll == engine output on a toy graph (the gate re-checks at sf0.01)."""
    import duckdb

    from cassovary_ray.oracles import coloring_sql
    from cassovary_ray.rounds import ColoringProgram

    adj_sym = _random_sym_adj(n=40, p=0.15, seed=5)
    pairs = [(u, v) for u, ns in _directed_view(adj_sym).items() for v in ns]
    lay = os.path.join(tmp_dir, "claysql")
    build_toy_layout(_directed_view(adj_sym), lay, 2,
                     undirected=True, dedup=True)
    with ShardedGraph(lay) as g:
        df = g.run_program(ColoringProgram(rounds_per_color=4, max_colors=12),
                           max_iterations=None, tolerance=0.0).to_pandas()
    got = {int(v): int(c) for v, c in zip(df["vertex"], df["color"])}

    cte = " UNION ALL ".join(f"SELECT {u} AS src, {v} AS dst"
                             for u, v in pairs)
    sql = coloring_sql(cte, colors=12, rounds=4)
    want = {int(v): int(c) for v, c in duckdb.sql(sql).fetchall()}
    assert got == want
