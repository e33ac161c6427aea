"""PageRank golden vectors cloned from ``PageRankSpec.scala:35-111``
(FIXTURES.md §4). Tolerance 5e-5 (5e-10 for the 3-chain), matching the spec."""

from __future__ import annotations

import os

import pytest

from cassovary_ray.corpus import TOY_GRAPHS, complete_graph
from cassovary_ray.engine import ShardedGraph

from tests.util import build_pages_layout, build_toy_layout, state_by_node

G6_GOLDEN = {10: 0.12699, 11: 0.16297, 12: 0.15616, 13: 0.06098, 14: 0.25292, 15: 0.23998}
G6_ONLYIN_GOLDEN = {10: 0.19942, 11: 0.11661, 12: 0.09086, 13: 0.11661, 14: 0.23245, 15: 0.24406}
DANGLING_G7_GOLDEN = {1: 0.11622, 2: 0.21500, 3: 0.16763, 4: 0.16763, 5: 0.07625, 6: 0.14106, 7: 0.11622}
DANGLING_G7_IN_GOLDEN = {1: 0.12085, 2: 0.15194, 3: 0.05628, 4: 0.05628, 5: 0.28697, 6: 0.27141, 7: 0.05628}
G3_DANGLING_GOLDEN = {0: 0.1844167814, 1: 0.3411710471, 2: 0.4744121714}


def run_pr(adj, tmp_dir, num_parts=3, via_pages=False, reverse=False, **pr_kwargs):
    lay = os.path.join(tmp_dir, "layout")
    if via_pages:
        build_pages_layout(adj, lay, num_parts, reverse=reverse)
    else:
        build_toy_layout(adj, lay, num_parts, reverse=reverse)
    with ShardedGraph(lay) as g:
        df = g.pagerank(**pr_kwargs).to_pandas()
    return state_by_node(df, adj, "rank", hashed=via_pages), g


@pytest.mark.parametrize("num_parts", [1, 2, 3])
def test_g6_golden(tmp_dir, num_parts):
    """`PageRankSpec.scala:77-79` — and identical across partition counts."""
    got, _ = run_pr(TOY_GRAPHS["g6"], tmp_dir, num_parts, max_iterations=None)
    for n, want in G6_GOLDEN.items():
        assert got[n] == pytest.approx(want, abs=5e-5)


def test_g6_onlyin_golden(tmp_dir):
    """OnlyIn-stored g6 == PageRank over the reversed edge table
    (`PageRankSpec.scala:83-85`)."""
    got, _ = run_pr(TOY_GRAPHS["g6"], tmp_dir, reverse=True, max_iterations=None)
    for n, want in G6_ONLYIN_GOLDEN.items():
        assert got[n] == pytest.approx(want, abs=5e-5)


def test_dangling_g7_golden(tmp_dir):
    """`PageRankSpec.scala:97-105` — dangling-mass semantics."""
    got, _ = run_pr(TOY_GRAPHS["dangling_g7"], tmp_dir, max_iterations=None)
    for n, want in DANGLING_G7_GOLDEN.items():
        assert got[n] == pytest.approx(want, abs=5e-5)


def test_dangling_g7_onlyin_golden(tmp_dir):
    got, _ = run_pr(TOY_GRAPHS["dangling_g7"], tmp_dir, reverse=True, max_iterations=None)
    for n, want in DANGLING_G7_IN_GOLDEN.items():
        assert got[n] == pytest.approx(want, abs=5e-5)


def test_g3_dangling_tight_tolerance(tmp_dir):
    """`PageRankSpec.scala:107-111` — 5e-10 accuracy on the 3-chain.

    The spec's 10-digit targets are the reference's values at its tol=1e-8
    stopping iteration (not the analytic fixpoint); with identical per-round
    math and an identical T1 stopping rule we stop at the same iteration and
    reproduce them to fp rounding.
    """
    got, _ = run_pr(TOY_GRAPHS["g3_dangling"], tmp_dir, max_iterations=None, tolerance=1e-8)
    for n, want in G3_DANGLING_GOLDEN.items():
        assert got[n] == pytest.approx(want, abs=5e-10)


def test_g3_dangling_onlyin(tmp_dir):
    """Reversed 3-chain matches the reversed target vector
    (`PageRankSpec.scala:110`)."""
    got, _ = run_pr(TOY_GRAPHS["g3_dangling"], tmp_dir, reverse=True,
                    max_iterations=None, tolerance=1e-8)
    rev_targets = dict(zip([0, 1, 2], [G3_DANGLING_GOLDEN[2], G3_DANGLING_GOLDEN[1], G3_DANGLING_GOLDEN[0]]))
    for n, want in rev_targets.items():
        assert got[n] == pytest.approx(want, abs=5e-10)


def test_one_iteration_closed_form(tmp_dir):
    """1 iteration, d=0.9, closed-form targets (`PageRankSpec.scala:57-65`)."""
    got, _ = run_pr(TOY_GRAPHS["g6"], tmp_dir, damping=0.9, max_iterations=1)
    want = {
        10: 0.1 / 6 + 0.9 / 12,
        11: 0.1 / 6 + 0.9 * (1.0 / 18 + 1.0 / 12),
        12: 0.1 / 6 + 0.9 * (1.0 / 6 + 1.0 / 18),
        13: 0.1 / 6 + 0.1 / 2,
        14: 0.1 / 6 + 0.9 / 3,
        15: 1.0 / 6,
    }
    for n, w in want.items():
        assert got[n] == pytest.approx(w, abs=1e-6)


def test_zero_iterations_uniform(tmp_dir):
    """0 iterations → uniform 1/n over existing ids (`PageRankSpec.scala:48-55`)."""
    got, _ = run_pr(TOY_GRAPHS["g6"], tmp_dir, max_iterations=0)
    for n in got:
        assert got[n] == pytest.approx(1.0 / 6, abs=1e-12)


def test_rank_sums_to_one(tmp_dir):
    """Σrank = 1 ± 1e-8 after any number of rounds (`PageRankSpec.scala:67-74`)."""
    got, _ = run_pr(TOY_GRAPHS["dangling_g7"], tmp_dir, max_iterations=3)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-8)


def test_complete_graph_fixed_point(tmp_dir):
    """K_10: uniform 0.1 is the fixed point (`PageRankSpec.scala:88-95`)."""
    got, _ = run_pr(complete_graph(10), tmp_dir, max_iterations=5)
    for n in got:
        assert got[n] == pytest.approx(0.1, abs=1e-12)


def test_pages_pipeline_end_to_end(tmp_dir):
    """Full slice: pages html → extract → hash ids → layout → PageRank."""
    got, _ = run_pr(TOY_GRAPHS["g6"], tmp_dir, via_pages=True, max_iterations=None)
    for n, want in G6_GOLDEN.items():
        assert got[n] == pytest.approx(want, abs=5e-5)


def test_checkpoint_resume(tmp_dir):
    """Run 3 rounds with checkpointing; resume finishes to convergence and
    matches an uninterrupted run to 1e-12."""
    lay = os.path.join(tmp_dir, "layout")
    ck = os.path.join(tmp_dir, "ckpt")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 2)

    with ShardedGraph(lay) as g1:
        g1.pagerank(max_iterations=3, checkpoint_dir=ck, checkpoint_every=3)

    with ShardedGraph(lay) as g2:
        resumed = g2.pagerank(max_iterations=None, checkpoint_dir=ck, resume=True).to_pandas()
    assert g2.metrics[0].iteration == 4  # continued after round 3

    with ShardedGraph(lay) as g3:
        straight = g3.pagerank(max_iterations=None).to_pandas()
    a = resumed.sort_values("vertex").reset_index(drop=True)
    b = straight.sort_values("vertex").reset_index(drop=True)
    assert (a["vertex"] == b["vertex"]).all()
    assert (a["rank"] - b["rank"]).abs().max() < 1e-12


def test_matches_numpy_reference_on_er_graph(tmp_dir):
    """Beyond the toy goldens: on a 200-node E-R graph (with dangling nodes),
    the distributed result matches an independent numpy implementation of the
    reference's exact per-round recurrence to 1e-10."""
    import numpy as np

    from cassovary_ray.corpus import er_graph, graph_vertices

    adj = er_graph(200, 0.03, seed=11)
    verts = graph_vertices(adj)
    n = len(verts)
    idx = {v: i for i, v in enumerate(verts)}
    d = 0.85
    rank = np.full(n, 1.0 / n)
    out_deg = np.array([len(adj.get(v, [])) for v in verts], dtype=float)
    dangling = out_deg == 0
    for _ in range(40):  # fixed rounds; compare states exactly
        new = np.full(n, d * rank[dangling].sum() / n + (1 - d) / n)
        for v, nbrs in adj.items():
            if nbrs:
                share = d * rank[idx[v]] / len(nbrs)
                for w in nbrs:
                    new[idx[w]] += share
        rank = new

    got, _ = run_pr(adj, tmp_dir, num_parts=4, max_iterations=40)
    for v in verts:
        assert got[v] == pytest.approx(rank[idx[v]], abs=1e-10)


# -- exact Personalized PageRank (engine.personalized_pagerank) -------------


def run_ppr(adj, tmp_dir, seeds, num_parts=3, **kwargs):
    lay = os.path.join(tmp_dir, "ppr_layout")
    build_toy_layout(adj, lay, num_parts)
    with ShardedGraph(lay) as g:
        df = g.personalized_pagerank(seeds, **kwargs).to_pandas()
    return state_by_node(df, adj, "rank")


def test_ppr_matches_numpy_reference_on_er_graph(tmp_dir):
    """Independent numpy implementation of the PPR recurrence (reset AND
    dangling mass land on the normalized seed distribution) to 1e-12."""
    import numpy as np

    from cassovary_ray.corpus import er_graph, graph_vertices

    adj = er_graph(120, 0.04, seed=5)
    verts = graph_vertices(adj)
    n = len(verts)
    idx = {v: i for i, v in enumerate(verts)}
    seeds = {verts[0]: 0.5, verts[3]: 0.25, verts[7]: 0.25}
    s = np.zeros(n)
    for v, w in seeds.items():
        s[idx[v]] = w
    d = 0.85
    rank = s.copy()
    out_deg = np.array([len(adj.get(v, [])) for v in verts], dtype=float)
    dangling = out_deg == 0
    for _ in range(30):
        new = s * ((1 - d) + d * rank[dangling].sum())
        for v, nbrs in adj.items():
            if nbrs:
                share = d * rank[idx[v]] / len(nbrs)
                for w in nbrs:
                    new[idx[w]] += share
        rank = new

    got = run_ppr(adj, tmp_dir, seeds, num_parts=4, max_iterations=30,
                  tolerance=0.0)
    for v in verts:
        assert got[v] == pytest.approx(rank[idx[v]], abs=1e-10)


def test_ppr_uniform_seeds_equals_pagerank(tmp_dir):
    """Seeding EVERY vertex uniformly reduces PPR to standard PageRank."""
    from cassovary_ray.corpus import graph_vertices

    adj = TOY_GRAPHS["g6"]
    verts = graph_vertices(adj)
    seeds = {v: 1.0 for v in verts}  # normalized internally to 1/n each
    got = run_ppr(adj, tmp_dir, seeds, max_iterations=12, tolerance=0.0)
    want, _ = run_pr(adj, tmp_dir, max_iterations=12, tolerance=0.0)
    for v in verts:
        assert got[v] == pytest.approx(want[v], abs=1e-12)


def test_ppr_mass_conserved_and_localized(tmp_dir):
    """Σrank = 1 (reset+dangling mass returns to seeds) and the seed holds
    more mass than under uniform PageRank (localization)."""
    adj = TOY_GRAPHS["dangling_g7"]  # has dangling nodes
    seeds = {1: 1.0}
    got = run_ppr(adj, tmp_dir, seeds, max_iterations=None, tolerance=1e-10)
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)
    uniform, _ = run_pr(adj, tmp_dir, max_iterations=None, tolerance=1e-10)
    assert got[1] > uniform[1]


def test_ppr_unknown_seed_raises(tmp_dir):
    with pytest.raises(ValueError, match="PPR seed"):
        run_ppr(TOY_GRAPHS["g6"], tmp_dir, {999999: 1.0}, max_iterations=2)


def test_ppr_empty_seeds_raises(tmp_dir):
    with pytest.raises(ValueError, match="at least one seed"):
        run_ppr(TOY_GRAPHS["g6"], tmp_dir, {}, max_iterations=2)


# -- weighted PageRank (beyond the reference; multiplicity-weighted edges) --

def _weighted_layout(adj, weights, tmp_dir, num_parts=3):
    """weights: {(src, dst): w} over adj's edges."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cassovary_ray.layout import build_edge_layout

    src, dst, w = [], [], []
    for u, nbrs in adj.items():
        for v in nbrs:
            src.append(u); dst.append(v); w.append(weights[(u, v)])
    eds = ray.data.from_arrow(pa.table({
        "src": pa.array(src, pa.int64()),
        "dst": pa.array(dst, pa.int64()),
        "weight": pa.array(np.asarray(w, np.float64), pa.float64()),
    }))
    lay = os.path.join(tmp_dir, "wlayout")
    build_edge_layout(eds, lay, num_parts, weighted=True)
    return lay


def test_weighted_unit_weights_match_unweighted(tmp_dir):
    """All weights 1.0 → identical to the unweighted g6 golden vector."""
    adj = TOY_GRAPHS["g6"]
    weights = {(u, v): 1.0 for u, nbrs in adj.items() for v in nbrs}
    lay = _weighted_layout(adj, weights, tmp_dir)
    with ShardedGraph(lay) as g:
        df = g.pagerank(max_iterations=None).to_pandas()
    got = state_by_node(df, adj, "rank")
    for n, want in G6_GOLDEN.items():
        assert got[n] == pytest.approx(want, abs=5e-5)


@pytest.mark.parametrize("num_parts", [1, 3])
def test_weighted_pagerank_vs_numpy_reference(tmp_dir, num_parts):
    """Non-uniform weights vs an independent dense numpy power iteration
    (same dangling + damping semantics)."""
    import numpy as np

    adj = {0: [1, 2], 1: [2], 2: [0, 3], 3: []}  # 3 dangling
    weights = {(0, 1): 3.0, (0, 2): 1.0, (1, 2): 2.5, (2, 0): 0.5, (2, 3): 1.5}
    lay = _weighted_layout(adj, weights, tmp_dir, num_parts)
    iters = 12
    with ShardedGraph(lay) as g:
        df = g.pagerank(max_iterations=iters, tolerance=0.0).to_pandas()
    got = state_by_node(df, adj, "rank")

    n, d = 4, 0.85
    W = np.zeros((n, n))
    for (u, v), w in weights.items():
        W[u, v] = w
    wout = W.sum(axis=1)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        dangle = r[wout == 0].sum()
        contrib = np.zeros(n)
        for u in range(n):
            if wout[u] > 0:
                contrib += d * r[u] * W[u] / wout[u]
        r = (1 - d) / n + d * dangle / n + contrib
    for v in range(n):
        assert got[v] == pytest.approx(r[v], abs=1e-12)


def test_csr_cache_restart_and_invalidation(tmp_dir):
    """Binary shard cache (VERDICT r2 #8): a second ShardedGraph over the
    same layout loads the cached lexsorted arrays and produces identical
    ranks; rebuilding the layout (new files → new digest) invalidates."""
    import glob

    adj = TOY_GRAPHS["g6"]
    lay = os.path.join(tmp_dir, "layout")
    build_toy_layout(adj, lay, 2)
    with ShardedGraph(lay) as g:
        cold = g.pagerank(max_iterations=5).to_pandas().sort_values(
            "vertex").reset_index(drop=True)
    assert glob.glob(os.path.join(lay, "csr_cache", "*.npz"))
    with ShardedGraph(lay) as g:
        warm = g.pagerank(max_iterations=5).to_pandas().sort_values(
            "vertex").reset_index(drop=True)
    assert cold.equals(warm)
    # rebuild with DIFFERENT content: stale cache must not be used
    adj2 = {k: v for k, v in adj.items()}
    adj2[10] = list(adj2.get(10, [])) + [15]
    build_toy_layout(adj2, lay, 2)
    with ShardedGraph(lay) as g:
        after = g.pagerank(max_iterations=5).to_pandas()
    assert not cold.equals(after.sort_values("vertex").reset_index(drop=True))
