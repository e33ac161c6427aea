"""Per-NODE (grouped) payload packing on the PageRank exchange
(engine.GraphShard.exchange_groups — the multi-node refinement designed in
_Scatter.per_part's docstring): a receiver holds refs only to its group's
1/G share of each sender's payload, and results are bit-identical at any G."""

from __future__ import annotations

import pytest

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph
from tests.util import build_toy_layout


@pytest.fixture(scope="module")
def g6_layout(tmp_path_factory):
    lay = str(tmp_path_factory.mktemp("xg") / "lay")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 4)
    return lay


def _ranks(lay, G):
    with ShardedGraph(lay, exchange_groups=G) as g:
        df = (g.pagerank(max_iterations=None, tolerance=1e-10)
              .to_pandas().sort_values("vertex").reset_index(drop=True))
        extra = g.metrics[-1].extra
    return df, extra


def test_grouped_exchange_bit_identical(g6_layout):
    base, e1 = _ranks(g6_layout, 1)
    assert e1["exchange_objects"] == 4 and e1["exchange_groups"] == 1
    for G in (2, 4):
        df, ex = _ranks(g6_layout, G)
        assert df.equals(base), f"rank drift at exchange_groups={G}"
        assert ex["exchange_groups"] == G
        assert ex["exchange_objects"] == 4 * G
        assert ex["exchange_mb"] == e1["exchange_mb"]  # same total bytes


def test_single_node_auto_is_one_group(g6_layout):
    with ShardedGraph(g6_layout) as g:  # exchange_groups=None → per-node
        assert g.exchange_groups == 1
        g.pagerank(max_iterations=2)
        assert g.metrics[-1].extra["exchange_groups"] == 1


def test_groups_clamped_to_parts(g6_layout):
    with ShardedGraph(g6_layout, exchange_groups=99) as g:
        assert g.exchange_groups == 4  # ≤ num_parts
        df = (g.pagerank(max_iterations=None, tolerance=1e-10)
              .to_pandas().sort_values("vertex").reset_index(drop=True))
    base, _ = _ranks(g6_layout, 1)
    assert df.equals(base)
