"""node2vec second-order walks — exact Python simulator cross-check
(bit-identical RNG + integer class selection), parallelism invariance,
corpus sequences, bias sanity."""

from __future__ import annotations

import os
from collections import defaultdict

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from cassovary_ray.engine import ShardedGraph
from cassovary_ray.hashing import counter_rng_uniform
from cassovary_ray.layout import build_edge_layout


def _layout(tmp_dir, E, P, name):
    t = pa.table({"src": pa.array([e[0] for e in E], pa.int64()),
                  "dst": pa.array([e[1] for e in E], pa.int64())})
    lay = os.path.join(tmp_dir, name)
    build_edge_layout(ray.data.from_arrow(t), lay, P)
    return lay


def _random_edges(n_nodes=30, n_edges=150, seed=3):
    rng = np.random.default_rng(seed)
    E = set()
    while len(E) < n_edges:
        a, b = (int(x) for x in rng.integers(0, n_nodes, 2))
        if a != b:
            E.add((a, b))
    return sorted(E)


def _rngu(seed, wid, step):
    return float(counter_rng_uniform(seed, np.array([wid], np.uint64), step)[0])


def _simulate(E, starts, num_steps, seed, p, q, reset_prob):
    """Reference implementation of the engine's node2vec step: same
    counter-RNG streams (stride 4: reset / first-order / class / index),
    same sorted candidate order, same integer class counts — the engine
    must reproduce it bit for bit at any partition count."""
    outn = defaultdict(list)
    for s, d in E:
        outn[s].append(d)
    for k in outn:
        outn[k] = sorted(outn[k])
    nbr_set = {k: set(v) for k, v in outn.items()}
    visits: dict[int, int] = defaultdict(int)
    state = {w: (s, s, -1) for w, s in starts.items()}
    for step in range(num_steps):
        for w in sorted(state):
            start, cur, prev = state[w]
            visits[cur] += 1
            if step == num_steps - 1:
                continue
            deg = len(outn.get(cur, []))
            reset = (_rngu(seed, w, 4 * step) < reset_prob) or deg == 0
            if reset or prev < 0:
                if reset:
                    nxt, prev_out = start, -1
                else:
                    u = _rngu(seed, w, 4 * step + 1)
                    nxt = outn[cur][min(int(u * deg), deg - 1)]
                    prev_out = cur
            else:
                cands = outn[cur]
                is_ret = [c == prev for c in cands]
                is_in = [(c in nbr_set.get(prev, set())) and c != prev
                         for c in cands]
                n_ret, n_in = sum(is_ret), sum(is_in)
                n_out = len(cands) - n_ret - n_in
                W = n_ret / p + n_in * 1.0 + n_out / q
                t = _rngu(seed, w, 4 * step + 2) * W
                if t < n_ret / p:
                    cls, n_cls = is_ret, n_ret
                elif t < n_ret / p + n_in:
                    cls, n_cls = is_in, n_in
                else:
                    cls = [not r and not i for r, i in zip(is_ret, is_in)]
                    n_cls = n_out
                u = _rngu(seed, w, 4 * step + 3)
                k = min(int(u * max(n_cls, 1)), max(n_cls - 1, 0))
                idxs = [i for i, m in enumerate(cls) if m]
                nxt, prev_out = cands[idxs[k]], cur
            state[w] = (start, nxt, prev_out)
    return dict(visits)


STARTS = {0: 0, 1: 5, 2: 12, 3: 7}


@pytest.mark.parametrize("num_parts", [1, 4])
def test_matches_simulator_any_parallelism(tmp_dir, num_parts):
    E = _random_edges()
    want = _simulate(E, STARTS, 12, seed=9, p=0.5, q=2.0, reset_prob=0.1)
    lay = _layout(tmp_dir, E, num_parts, f"p{num_parts}")
    with ShardedGraph(lay) as g:
        got = {r["vertex"]: r["visits"]
               for r in g.node2vec_walks(STARTS, 12, p=0.5, q=2.0,
                                         reset_prob=0.1, seed=9).take_all()}
    assert got == want


def test_p_q_one_is_valid_walk(tmp_dir):
    E = _random_edges(seed=5)
    want = _simulate(E, STARTS, 10, seed=2, p=1.0, q=1.0, reset_prob=0.0)
    lay = _layout(tmp_dir, E, 3, "pq1")
    with ShardedGraph(lay) as g:
        got = {r["vertex"]: r["visits"]
               for r in g.node2vec_walks(STARTS, 10, seed=2).take_all()}
    assert got == want


def test_return_bias_low_p_revisits(tmp_dir):
    # 2-path graph 0<->1<->2: with p tiny the walk ping-pongs 0,1,0,1,...
    E = [(0, 1), (1, 0), (1, 2), (2, 1)]
    lay = _layout(tmp_dir, E, 2, "pp")
    with ShardedGraph(lay) as g:
        got = {r["vertex"]: r["visits"]
               for r in g.node2vec_walks({0: 0}, 20, p=1e-9, q=1e9).take_all()}
    # after the uniform first step to 1, every biased step returns:
    # visits split entirely between 0 and 1
    assert got.get(2, 0) == 0
    assert got[0] + got[1] == 20


def test_corpus_sequences_parallelism_invariant(tmp_dir):
    E = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3)]
    seqs = {}
    for P in (1, 3):
        lay = _layout(tmp_dir, E, P, f"c{P}")
        with ShardedGraph(lay) as g:
            out = g.node2vec_corpus(walks_per_vertex=2, walk_length=6,
                                    p=0.25, q=4.0, seed=5, output="sequences")
            seqs[P] = sorted((r["walker_id"], r["walk"], tuple(r["seq"]))
                             for r in out.take_all())
    assert seqs[1] == seqs[3]
    assert len(seqs[1]) == 8  # 4 vertices x 2 walks
    assert all(len(s[2]) == 6 for s in seqs[1])
    es = set(E)
    for wid, _, s in seqs[1]:
        assert s[0] == wid  # walks start at their walker's home vertex
        for a, b in zip(s, s[1:]):
            assert (a, b) in es or b == wid  # edge hop or reset-to-start


def test_invalid_pq_raises(tmp_dir):
    lay = _layout(tmp_dir, [(0, 1)], 1, "bad")
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError):
            g.node2vec_walks({0: 0}, 3, p=0.0)


def test_node2vec_visits_match_duckdb(tmp_dir):
    """The DuckDB oracle replays the literal same biased steps: SQL ==
    bit-exact simulator == engine (the engine side is pinned against the
    simulator above; the sf0.01 gate re-checks engine vs SQL end-to-end)."""
    import duckdb

    from cassovary_ray.oracles import node2vec_visits_sql

    E = _random_edges()
    E = E + [E[0]]  # a duplicate edge: candidates are a multiset
    starts = [0, 5, 12, 7, 0]
    want = _simulate(E, dict(enumerate(starts)), 12, seed=9, p=0.5, q=2.0,
                     reset_prob=0.1)
    cte = " UNION ALL ".join(f"SELECT {u} AS src, {v} AS dst" for u, v in E)
    sql = node2vec_visits_sql(cte, starts, 12, p=0.5, q=2.0,
                              reset_prob=0.1, seed=9)
    got = {int(v): int(c) for v, c in duckdb.sql(sql).fetchall()}
    assert got == want
