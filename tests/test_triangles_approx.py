"""Deterministic sampled triangle estimator (analytics.triangle_count_approx
— the parallel-reproducible replacement for the reference's sequential
reservoir estimator, TriangleCount.scala:20-185)."""

from __future__ import annotations

import numpy as np
import pytest

from cassovary_ray.analytics import triangle_count, triangle_count_approx
from cassovary_ray.corpus import complete_graph, er_graph
from tests.util import edges_ds_for_graph


def _one_row(adj, **kw):
    df = triangle_count_approx(edges_ds_for_graph(adj), **kw).to_pandas()
    assert len(df) == 1
    return df.iloc[0]


@pytest.mark.parametrize("parts", [1, 2, 4])
def test_partition_invariance(parts):
    """Bit-identical output at any block count — the coin is a pure function
    of (seed, edge)."""
    adj = er_graph(60, 0.15, seed=3)
    ds = edges_ds_for_graph(adj).repartition(parts)
    row = triangle_count_approx(ds, sample_prob=0.5, seed=7).to_pandas().iloc[0]
    base = _one_row(adj, sample_prob=0.5, seed=7)
    assert row.equals(base)


def test_kn_estimate_within_error():
    """K_16: T = C(16,3) = 560, wedges = 16*C(15,2) = 1680, transitivity 1.

    3σ of the plug-in DOULION stderr covers the exact count for every seed
    in 1..20 at (n=16, p=0.8) — this fixture pins one of them, so the bound
    is a property of the error bar, not a cherry-picked draw."""
    adj = complete_graph(16)
    exact = triangle_count(edges_ds_for_graph(adj))
    assert exact == 560
    row = _one_row(adj, sample_prob=0.8, seed=5)
    assert row["wedges"] == 1680
    err = 3.0 * row["stderr_est"]
    assert abs(row["triangles_est"] - exact) <= err
    assert 0.0 < row["transitivity_est"] <= 1.6


def test_er_estimate_within_error():
    adj = er_graph(80, 0.2, seed=11)
    exact = triangle_count(edges_ds_for_graph(adj))
    assert exact > 20
    row = _one_row(adj, sample_prob=0.6, seed=42)
    err = 3.0 * row["stderr_est"]
    assert abs(row["triangles_est"] - exact) <= err


def test_p_one_is_exact():
    """sample_prob=1 keeps every edge: estimate == exact, stderr == 0."""
    adj = er_graph(40, 0.2, seed=2)
    exact = triangle_count(edges_ds_for_graph(adj))
    row = _one_row(adj, sample_prob=1.0, seed=9)
    assert row["triangles_sampled"] == exact
    assert row["triangles_est"] == float(exact)
    assert row["stderr_est"] == 0.0
    deg = {}
    for u, nbrs in adj.items():
        for v in nbrs:
            if u != v:
                a, b = min(u, v), max(u, v)
                deg[a] = deg.get(a, set()) | {b}
                deg[b] = deg.get(b, set()) | {a}
    wedges = sum(len(s) * (len(s) - 1) // 2 for s in deg.values())
    assert row["wedges"] == wedges
    if wedges:
        assert row["transitivity_est"] == pytest.approx(3 * exact / wedges)


def test_bad_prob_raises():
    with pytest.raises(ValueError):
        triangle_count_approx(edges_ds_for_graph(complete_graph(4)),
                              sample_prob=0.0)
