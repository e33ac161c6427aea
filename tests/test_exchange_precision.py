"""Float32 ship precision for the BSP exchange
(``ShardedGraph(exchange_precision="f32")``): float payloads are cast to
float32 at the partition-slice boundary (``_Scatter.slice_for_part``) —
halving per-round exchange bytes, the multi-node network lever — while
integer payloads (WCC component mins) ship exact, and accumulation stays
float64 on the receive side. Default "f64" remains bit-exact."""

from __future__ import annotations

import pytest

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph
from tests.util import build_toy_layout

G6_GOLDEN = {10: 0.12699, 11: 0.16297, 12: 0.15616, 13: 0.06098,
             14: 0.25292, 15: 0.23998}


@pytest.fixture(scope="module")
def g6_layout(tmp_path_factory):
    lay = str(tmp_path_factory.mktemp("xp") / "lay")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 4)
    return lay


@pytest.fixture(scope="module")
def g6_und_layout(tmp_path_factory):
    lay = str(tmp_path_factory.mktemp("xpu") / "lay")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 4, undirected=True)
    return lay


def _pr(lay, precision):
    # 1e-7 is the tightest unbounded tolerance the f32 guard certifies
    with ShardedGraph(lay, exchange_precision=precision) as g:
        df = (g.pagerank(max_iterations=None, tolerance=1e-7)
              .to_pandas().sort_values("vertex").reset_index(drop=True))
        extra = g.metrics[-1].extra
    return df, extra


def test_f32_matches_f64_within_tolerance(g6_layout):
    base, e64 = _pr(g6_layout, "f64")
    got, e32 = _pr(g6_layout, "f32")
    assert (got["vertex"] == base["vertex"]).all()
    # per-vertex drift bounded far inside any convergence tolerance ≥ 1e-6
    assert (got["rank"] - base["rank"]).abs().max() < 1e-6
    assert abs(got["rank"].sum() - 1.0) < 1e-5
    # golden vectors still hold at the spec tolerance (raw toy ids)
    node_by_rank = dict(zip(got["vertex"], got["rank"]))
    for n, want in G6_GOLDEN.items():
        assert node_by_rank[n] == pytest.approx(want, abs=5e-5)


def test_f32_halves_float_payload_bytes():
    import numpy as np

    from cassovary_ray.engine import _payload_nbytes, _Scatter

    rng = np.random.default_rng(7)
    src = rng.integers(0, 1000, 20_000, dtype=np.int64)
    dst = rng.integers(0, 1000, 20_000, dtype=np.int64)
    verts = np.arange(1000, dtype=np.int64)
    sc = _Scatter(src, dst, verts, num_parts=4)
    sums = sc.coef_scatter_sums(rng.random(1000))
    f64_bytes = _payload_nbytes((sc.per_part(sums, False), 0.0))
    sc.exchange_dtype = np.float32
    f32_bytes = _payload_nbytes((sc.per_part(sums, False), 0.0))
    assert f32_bytes * 2 == f64_bytes
    # int payloads (e.g. WCC component mins) are never cast
    mins = sc.segment_mins(verts[sc.src_pos])
    for sl in sc.per_part(mins, False):
        assert sl.dtype == np.int64


def test_wcc_exact_under_f32(g6_und_layout):
    with ShardedGraph(g6_und_layout, exchange_precision="f32") as g:
        got = (g.weakly_connected_components().to_pandas()
               .sort_values("vertex").reset_index(drop=True))
    with ShardedGraph(g6_und_layout) as g:
        base = (g.weakly_connected_components().to_pandas()
                .sort_values("vertex").reset_index(drop=True))
    assert got.equals(base)  # int payloads never cast


def test_bad_precision_rejected(g6_layout):
    with pytest.raises(Exception):
        with ShardedGraph(g6_layout, exchange_precision="f16") as g:
            g.pagerank(max_iterations=1)


def test_f32_unbounded_tight_tolerance_rejected(g6_layout):
    """f32 quantization floors the T1 delta: an unbounded loop below 1e-7
    can oscillate forever (observed live on g6 at tol=1e-8), so the driver
    refuses it up front."""
    with ShardedGraph(g6_layout, exchange_precision="f32") as g:
        with pytest.raises(ValueError, match="f32"):
            g.pagerank(max_iterations=None, tolerance=1e-8)
        # bounded runs and certifiable tolerances are fine
        g.pagerank(max_iterations=3, tolerance=1e-8)
        g.pagerank(max_iterations=None, tolerance=1e-7)


def test_f32_guard_scales_with_state_norm(tmp_path):
    """HITS' max-rescaled state has ‖state‖₁ ≤ n, so the certified f32
    floor — and the refusal threshold — scales with n (ADVICE r4): on the
    6-vertex toy the threshold is 6e-7, refusing a tolerance PageRank
    (‖state‖₁ = 1) would accept."""
    lay, rev = str(tmp_path / "lay"), str(tmp_path / "rev")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 3)
    build_toy_layout(TOY_GRAPHS["g6"], rev, 3, reverse=True)
    with ShardedGraph(lay, reverse_layout_dir=rev,
                      exchange_precision="f32") as g:
        with pytest.raises(ValueError, match="state norm"):
            g.hits(max_iterations=None, tolerance=2e-7)
        g.hits(max_iterations=None, tolerance=6e-7)
