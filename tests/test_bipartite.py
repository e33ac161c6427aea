"""IterativeLinkAnalyzer flow — hand-computed fixtures.

Reset-prob pairing follows the reference CODE (IterativeLinkAnalyzer.scala:
152-156): forward (left→right) passes apply reset_prob_right on the right
dests, reverse passes apply reset_prob_left on the left dests.
"""

from __future__ import annotations

import pyarrow as pa
import pytest
import ray.data

from cassovary_ray.bipartite import iterative_link_analysis


def bip_edges():
    # lefts 1,2 ; rights 10,11,12 ; 1→{10,11}, 2→{11,12}
    return ray.data.from_arrow(pa.table({
        "src": pa.array([1, 1, 2, 2], pa.int64()),
        "dst": pa.array([10, 11, 11, 12], pa.int64()),
    }))


def test_one_pass_left_to_right():
    """Hand computation, resetR=0.2 (forward pass applies the RIGHT reset
    prob): share(l) = w_l/deg_l·0.8. w(10)=0.4, w(11)=1.2, w(12)=0.8 for
    inits {1:1, 2:2}."""
    left, right = iterative_link_analysis(
        bip_edges(), {1: 1.0, 2: 2.0}, num_iterations=1,
        reset_prob_right=0.2, num_top_contributors=2,
    )
    rw = dict(zip(right.vertex, right.weight))
    assert rw[10] == pytest.approx(1.0 / 2 * 0.8)
    assert rw[11] == pytest.approx(1.0 / 2 * 0.8 + 2.0 / 2 * 0.8)
    assert rw[12] == pytest.approx(2.0 / 2 * 0.8)
    # sorted desc by weight
    assert list(right.vertex) == [11, 12, 10]
    # contributors of 11: node 2 contributed 0.8 > node 1's 0.4
    rc = dict(zip(right.vertex, right.contributors))
    assert rc[11] == [2, 1]
    # lefts keep their initial weights after a single forward pass
    lw = dict(zip(left.vertex, left.weight))
    assert lw == {1: 1.0, 2: 2.0}


def test_two_passes_returns_to_left():
    """Pass 1 (forward) uses resetR; pass 2 (right→left) uses resetL:
    w(l) = resetL·init(l) + Σ_r w_r/deg_r·(1−resetL)."""
    resetL, resetR = 0.2, 0.3
    left, right = iterative_link_analysis(
        bip_edges(), {1: 1.0, 2: 2.0}, num_iterations=2,
        reset_prob_left=resetL, reset_prob_right=resetR,
    )
    w10, w11, w12 = 0.35, 1.05, 0.7  # from pass 1 (resetR=0.3)
    rw = dict(zip(right.vertex, right.weight))
    assert rw[10] == pytest.approx(w10)
    assert rw[11] == pytest.approx(w11)
    assert rw[12] == pytest.approx(w12)
    lw = dict(zip(left.vertex, left.weight))
    assert lw[1] == pytest.approx(0.2 * 1.0 + (w10 / 1 + w11 / 2) * 0.8)
    assert lw[2] == pytest.approx(0.2 * 2.0 + (w11 / 2 + w12 / 1) * 0.8)


def test_contributors_on_both_sides():
    """With num_iterations=2 the last TWO passes record contributors
    (IterativeLinkAnalyzer.scala:158): rights from pass 1, lefts from pass 2."""
    left, right = iterative_link_analysis(
        bip_edges(), {1: 1.0, 2: 2.0}, num_iterations=2, num_top_contributors=2,
    )
    rc = dict(zip(right.vertex, right.contributors))
    assert rc[11] == [2, 1] and rc[10] == [1] and rc[12] == [2]
    lc = dict(zip(left.vertex, left.contributors))
    # pass-2 shares (resetR=0.1 pass 1 → w10=.45, w11=1.35, w12=.9; resetL=0.1):
    # into 1: 11 gives 1.35/2·0.9=.6075 > 10's .45·0.9=.405 → [11, 10]
    # into 2: 12 gives .9·0.9=.81 > 11's .6075 → [12, 11]
    assert lc[1] == [11, 10] and lc[2] == [12, 11]


def test_induced_subgraph_restricts_to_supplied_lefts():
    """left_init a strict subset: edges from unsupplied lefts are invisible —
    right degrees and flows count only supplied-left edges, and the left
    output contains exactly the supplied nodes (IterativeLinkAnalyzer.scala:
    78-91 discovers rights only via supplied lefts)."""
    left, right = iterative_link_analysis(
        bip_edges(), {1: 1.0}, num_iterations=2,
        reset_prob_left=0.2, reset_prob_right=0.3, num_top_contributors=2,
    )
    # induced: 1→{10,11}; right 12 never appears, right 11 has induced deg 1
    assert set(right.vertex) == {10, 11}
    rw = dict(zip(right.vertex, right.weight))
    assert rw[10] == pytest.approx(1.0 / 2 * 0.7)
    assert rw[11] == pytest.approx(1.0 / 2 * 0.7)
    # left output is exactly the supplied set
    assert list(left.vertex) == [1]
    # pass 2: w(1) = 0.2·1 + (w10/1 + w11/1)·0.8  (induced right degrees = 1)
    assert left.weight.iloc[0] == pytest.approx(0.2 + (0.35 + 0.35) * 0.8)


def test_left_with_no_edges_keeps_reset_weight():
    left, right = iterative_link_analysis(
        bip_edges(), {1: 1.0, 99: 4.0}, num_iterations=2,
        reset_prob_left=0.25, num_top_contributors=1,
    )
    lw = dict(zip(left.vertex, left.weight))
    assert lw[99] == pytest.approx(0.25 * 4.0)  # reset only, no inbound flow


# -- engine path (ShardedGraph.bipartite_link_analysis) ----------------------


def run_engine_bila(tmp_dir, adj, left_init, P, tag, **kw):
    import os

    from cassovary_ray.engine import ShardedGraph
    from tests.util import build_toy_layout

    fwd = os.path.join(tmp_dir, f"bila_f_{tag}_{P}")
    rev = os.path.join(tmp_dir, f"bila_r_{tag}_{P}")
    build_toy_layout(adj, fwd, P)
    build_toy_layout(adj, rev, P, reverse=True)
    with ShardedGraph(fwd, reverse_layout_dir=rev) as g:
        left, right = g.bipartite_link_analysis(left_init, **kw)
        return left.to_pandas(), right.to_pandas()


def assert_bila_match(engine_df, pandas_df):
    e = {r.vertex: (r.weight, list(r.contributors)) for r in engine_df.itertuples()}
    p = {r.vertex: (r.weight, list(r.contributors)) for r in pandas_df.itertuples()}
    assert set(e) == set(p)
    for v in p:
        assert e[v][0] == pytest.approx(p[v][0]), f"weight mismatch at {v}"
        assert e[v][1] == p[v][1], f"contributors mismatch at {v}"


BIP_ADJ = {1: [10, 11], 2: [11, 12]}


@pytest.mark.parametrize("P", [1, 4])
@pytest.mark.parametrize("iters", [1, 2, 3])
def test_engine_matches_pandas_fixture(tmp_dir, P, iters):
    kw = dict(num_iterations=iters, reset_prob_left=0.2, reset_prob_right=0.3,
              num_top_contributors=2)
    pl, pr = iterative_link_analysis(bip_edges(), {1: 1.0, 2: 2.0}, **kw)
    el, er = run_engine_bila(tmp_dir, BIP_ADJ, {1: 1.0, 2: 2.0}, P, f"i{iters}", **kw)
    assert_bila_match(el, pl)
    assert_bila_match(er, pr)


@pytest.mark.parametrize("P", [1, 4])
def test_engine_induced_subset(tmp_dir, P):
    """left_init a strict subset: engine must also restrict flows/degrees to
    the induced subgraph."""
    kw = dict(num_iterations=2, reset_prob_left=0.2, reset_prob_right=0.3)
    pl, pr = iterative_link_analysis(bip_edges(), {1: 1.0}, **kw)
    el, er = run_engine_bila(tmp_dir, BIP_ADJ, {1: 1.0}, P, "sub", **kw)
    assert_bila_match(el, pl)
    assert_bila_match(er, pr)


def test_engine_left_without_edges(tmp_dir):
    adj = {1: [10, 11], 2: [11, 12], 99: []}
    kw = dict(num_iterations=2, reset_prob_left=0.25)
    pl, _ = iterative_link_analysis(bip_edges(), {1: 1.0, 99: 4.0}, **kw)
    el, _ = run_engine_bila(tmp_dir, adj, {1: 1.0, 99: 4.0}, 2, "noedge", **kw)
    assert_bila_match(el, pl)


def test_engine_requires_reverse_layout(tmp_dir):
    import os

    from cassovary_ray.engine import ShardedGraph
    from tests.util import build_toy_layout

    lay = os.path.join(tmp_dir, "bila_fwd_only")
    build_toy_layout(BIP_ADJ, lay, 2)
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError, match="reverse"):
            g.bipartite_link_analysis({1: 1.0})


def test_driver_fallback_edge_cap():
    """iterative_link_analysis is the driver-side fallback: above max_edges
    it refuses (pointing at ShardedGraph.bipartite_link_analysis) instead
    of materializing a corpus-scale edge table locally (VERDICT r4)."""
    with pytest.raises(ValueError, match="bipartite_link_analysis"):
        iterative_link_analysis(bip_edges(), {1: 1.0}, num_iterations=2,
                                max_edges=2)
