"""Who-To-Follow semantics (Gupta et al., WWW'13 — the reference's
flagship production application): circle of trust from exact PPR, one
personalized-SALSA bipartite round, recommendations exclude the user and
already-followed accounts, friend-of-friend consensus wins. The sf gate
query ``graph_wtf`` pins the full hash; here the ranking property is
pinned on a constructed graph."""

from __future__ import annotations

import os

import pytest

from cassovary_ray.engine import ShardedGraph
from tests.util import build_toy_layout

# 0 follows 1 and 2; BOTH follow 3; only 2 follows 4. The right
# recommendation order for user 0 is 3 (two-endorser consensus) then 4.
FOLLOW = {0: [1, 2], 1: [3], 2: [3, 4], 3: [], 4: []}


@pytest.fixture(scope="module", params=[1, 3])
def graph(tmp_path_factory, request):
    P = request.param
    base = str(tmp_path_factory.mktemp(f"wtf{P}"))
    fwd, rev = os.path.join(base, "f"), os.path.join(base, "r")
    build_toy_layout(FOLLOW, fwd, P)
    build_toy_layout(FOLLOW, rev, P, reverse=True)
    with ShardedGraph(fwd, reverse_layout_dir=rev) as g:
        yield g


def wtf_scores(g, user=0, cot_size=10):
    ppr = (g.personalized_pagerank({user: 1.0}, max_iterations=10,
                                   tolerance=0.0)
           .to_pandas().sort_values(["rank", "vertex"],
                                    ascending=[False, True]))
    cot = dict(zip(ppr.vertex[:cot_size], ppr["rank"][:cot_size]))
    _, right = g.bipartite_link_analysis(cot, num_iterations=2)
    r = right.to_pandas().set_index("vertex")["weight"]
    followed = set(FOLLOW[user]) | {user}
    return {v: w for v, w in r.items() if v not in followed}


def test_recommends_friend_of_friend_consensus_first(graph):
    rec = wtf_scores(graph)
    assert set(rec) == {3, 4}
    assert rec[3] > rec[4]


def test_scores_match_hand_computed_flow(graph):
    """With cot = all 5 vertices at PPR weights, pass 1 sends
    w(u)/outdeg(u)·0.9 along each edge: score(3) = 0.9·(w1 + w2/2),
    score(4) = 0.9·w2/2."""
    ppr = (graph.personalized_pagerank({0: 1.0}, max_iterations=10,
                                       tolerance=0.0)
           .to_pandas().set_index("vertex")["rank"])
    rec = wtf_scores(graph)
    assert rec[3] == pytest.approx(0.9 * (ppr[1] + ppr[2] / 2), rel=1e-12)
    assert rec[4] == pytest.approx(0.9 * (ppr[2] / 2), rel=1e-12)


def test_batch_wtf_invariants():
    """graph_wtf_batch at sf0.001: per-user rec lists obey the contract —
    ≤5 recs ranked 1..n by quantized score desc / rec asc, never the user
    itself, never an already-followed account."""
    import numpy as np

    from cassovary_ray.queries import QUERIES, derived_edges

    sf = "/root/testdata/sf0.001"
    out = QUERIES["graph_wtf_batch"](sf).to_pandas()
    assert len(out) > 0
    e = derived_edges(sf).to_pandas()
    followed = set(zip(e.src, e.dst))
    assert (out.user_id != out.rec).all()
    assert not any((u, r) in followed for u, r in zip(out.user_id, out.rec))
    for _, g in out.groupby("user_id"):
        g = g.sort_values("rank")
        assert list(g["rank"]) == list(range(1, len(g) + 1))
        assert len(g) <= 5
        q = np.floor(g.score.to_numpy() * 1e9).astype(np.int64)
        key = list(zip(-q, g.rec))
        assert key == sorted(key)
