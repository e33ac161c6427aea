"""adjacency_lists, all-paths visit counts, PageRank partition invariance."""

from __future__ import annotations

import os

import pytest

from cassovary_ray.analytics import adjacency_lists, all_paths_visit_counts
from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph

from tests.util import build_toy_layout, edges_ds_for_graph


def test_adjacency_lists_sorted():
    df = adjacency_lists(edges_ds_for_graph(TOY_GRAPHS["g6"])).to_pandas()
    got = {r.src: list(r.neighbors) for r in df.itertuples()}
    assert got == {10: [11, 12, 13], 11: [12, 14], 12: [14], 13: [12, 14],
                   14: [15], 15: [10, 11]}


def test_all_paths_counts_diamond():
    """Diamond 0→{1,2}→3: two paths reach 3; path counts are exact."""
    adj = {0: [1, 2], 1: [3], 2: [3], 3: []}
    df = all_paths_visit_counts(edges_ds_for_graph(adj), [0], max_depth=3).to_pandas()
    got = dict(zip(df.vertex, df.visits))
    assert got == {0: 1, 1: 1, 2: 1, 3: 2}


def test_all_paths_revisits_cycle():
    """2-cycle from 1, depth 4: alternating revisits counted every round
    (AllPathsWalk re-enqueues everything)."""
    df = all_paths_visit_counts(
        edges_ds_for_graph(TOY_GRAPHS["g2_mutual"]), [1], max_depth=4
    ).to_pandas()
    got = dict(zip(df.vertex, df.visits))
    assert got == {1: 3, 2: 2}  # 1 at depths 0,2,4; 2 at depths 1,3


def test_pagerank_partition_invariance(tmp_dir):
    """Same graph at P=1 vs P=4: ranks agree to fp-reduction noise (1e-12) —
    the determinism contract of SURVEY §7.3 (order-robust reductions)."""
    results = {}
    for P in (1, 4):
        lay = os.path.join(tmp_dir, f"p{P}")
        build_toy_layout(TOY_GRAPHS["dangling_g7"], lay, P)
        with ShardedGraph(lay) as g:
            df = g.pagerank(max_iterations=None).to_pandas()
        results[P] = dict(zip(df.vertex, df["rank"]))
    assert results[1].keys() == results[4].keys()
    for v in results[1]:
        assert results[1][v] == pytest.approx(results[4][v], abs=1e-12)


def test_adjacency_lists_hub_spans_blocks():
    """Boundary-merge path: a hub src whose neighbor run crosses sorted-block
    boundaries must still emit ONE complete, sorted row."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from cassovary_ray.analytics import adjacency_lists

    rng = np.random.default_rng(3)
    hub_nbrs = rng.permutation(np.arange(1000, 1500))
    srcs = np.r_[np.full(500, 7), np.arange(100, 160)]
    dsts = np.r_[hub_nbrs, np.arange(2000, 2060)]
    perm = rng.permutation(len(srcs))
    ds = ray.data.from_arrow(pa.table({
        "src": pa.array(srcs[perm], pa.int64()),
        "dst": pa.array(dsts[perm], pa.int64()),
    })).repartition(8)
    df = adjacency_lists(ds).to_pandas()
    assert len(df) == 61  # hub + 60 singles, exactly one row each
    hub = df[df.src == 7].neighbors.iloc[0]
    assert list(hub) == list(range(1000, 1500))
    single = df[df.src == 120].neighbors.iloc[0]
    assert list(single) == [2020]
