"""IterativeLinkAnalyzer flow — hand-computed fixture."""

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
    """Hand computation, resetL=0.2: share(l) = w_l/deg_l·0.8.
    w(10)=0.4, w(11)=0.4+0.8=1.2, w(12)=0.8 for inits {1:1, 2:2}."""
    left, right = iterative_link_analysis(
        bip_edges(), {1: 1.0, 2: 2.0}, num_iterations=1,
        reset_prob_left=0.2, num_top_contributors=2,
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


def test_two_passes_returns_to_left():
    """Second pass flows right→left: w(l) = resetR·init(l) +
    Σ_r w_r/deg_r·(1−resetR)."""
    resetL, resetR = 0.2, 0.3
    left, right = iterative_link_analysis(
        bip_edges(), {1: 1.0, 2: 2.0}, num_iterations=2,
        reset_prob_left=resetL, reset_prob_right=resetR,
    )
    w10, w11, w12 = 0.4, 1.2, 0.8  # from pass 1 (resetL=0.2)
    lw = dict(zip(left.vertex, left.weight))
    assert lw[1] == pytest.approx(0.3 * 1.0 + (w10 / 1 + w11 / 2) * 0.7)
    assert lw[2] == pytest.approx(0.3 * 2.0 + (w11 / 2 + w12 / 1) * 0.7)
