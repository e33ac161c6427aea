"""WCC + label propagation — exact integer fixtures (FIXTURES.md §4; the
reference has no WCC/LP implementation, SURVEY §2.5, so these fixtures define
the contract: component id = min vertex id, LP tie-break = smallest label)."""

from __future__ import annotations

import os

import pytest
import ray.data
import pyarrow as pa

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph

from tests.util import build_toy_layout, state_by_node


def run_wcc(adj, tmp_dir, num_parts=3):
    lay = os.path.join(tmp_dir, "und")
    build_toy_layout(adj, lay, num_parts, undirected=True)
    with ShardedGraph(lay) as g:
        df = g.weakly_connected_components().to_pandas()
    return state_by_node(df, adj, "component")


@pytest.mark.parametrize("num_parts", [1, 2, 4])
def test_g6_with_isolated_nodes(tmp_dir, num_parts):
    got = run_wcc(TOY_GRAPHS["g6_empty"], tmp_dir, num_parts)
    assert got == {0: 0, 1: 1, 10: 10, 11: 10, 12: 10, 13: 10, 14: 10, 15: 10}


def test_g5_single_component(tmp_dir):
    got = run_wcc(TOY_GRAPHS["g5"], tmp_dir)
    assert set(got.values()) == {10}


def test_g2_nonmutual_weakly_connected(tmp_dir):
    got = run_wcc(TOY_GRAPHS["g2_nonmutual"], tmp_dir)
    assert got == {1: 1, 2: 1}


def test_two_components_chain_plus_cycle(tmp_dir):
    adj = {0: [1], 1: [2], 2: [], 100: [101], 101: [100]}
    got = run_wcc(adj, tmp_dir)
    assert got == {0: 0, 1: 0, 2: 0, 100: 100, 101: 100}


def test_lp_defaults_converge_to_components(tmp_dir):
    """With default seeds (own id) and min-tie-break mode, LP on a graph whose
    components are cliques settles on the min id per clique."""
    adj = {1: [2, 3], 2: [1, 3], 3: [1, 2], 7: [8], 8: [7]}
    lay = os.path.join(tmp_dir, "und")
    build_toy_layout(adj, lay, 2, undirected=True, dedup=True)
    with ShardedGraph(lay) as g:
        df = g.label_propagation(max_iterations=20).to_pandas()
    got = state_by_node(df, adj, "label")
    assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7}


def test_lp_seeded_exact_and_parallelism_invariant(tmp_dir):
    """Seeded LP (labels on 10 and 14) floods g6 deterministically; result
    must be identical at partition counts 1 and 3 (FIXTURES §4 LP rules),
    seeds stay clamped, and every vertex ends with a seed-derived label."""
    adj = TOY_GRAPHS["g6"]
    seeds = ray.data.from_arrow(
        pa.table({"vertex": pa.array([10, 14], pa.int64()),
                  "label": pa.array([100, 200], pa.int64())})
    )
    results = {}
    for num_parts in (1, 3):
        lay = os.path.join(tmp_dir, f"und{num_parts}")
        build_toy_layout(adj, lay, num_parts, undirected=True, dedup=True)
        with ShardedGraph(lay) as g:
            df = g.label_propagation(seeds=seeds, max_iterations=30).to_pandas()
        results[num_parts] = state_by_node(df, adj, "label")
    assert results[1] == results[3]
    got = results[1]
    assert got[10] == 100 and got[14] == 200  # clamped seeds
    assert set(got.values()) <= {100, 200}


def test_wcc_checkpoint_resume(tmp_dir):
    """Interrupt WCC after 1 round; a fresh ShardedGraph resumes from the
    manifest and reaches the identical fixpoint."""
    adj = {0: [1], 1: [2], 2: [3], 3: [4], 4: [5], 5: [], 100: [101], 101: []}
    lay = os.path.join(tmp_dir, "und")
    ck = os.path.join(tmp_dir, "ck")
    build_toy_layout(adj, lay, 2, undirected=True)
    with ShardedGraph(lay) as g1:
        g1.weakly_connected_components(max_iterations=1, checkpoint_dir=ck,
                                       checkpoint_every=1)
    with ShardedGraph(lay) as g2:
        df = g2.weakly_connected_components(checkpoint_dir=ck, resume=True).to_pandas()
    got = state_by_node(df, adj, "component")
    assert got == {0: 0, 1: 0, 2: 0, 3: 0, 4: 0, 5: 0, 100: 100, 101: 100}


def test_lp_checkpoint_resume_matches_straight(tmp_dir):
    adj = TOY_GRAPHS["g6"]
    seeds = ray.data.from_arrow(
        pa.table({"vertex": pa.array([10, 14], pa.int64()),
                  "label": pa.array([100, 200], pa.int64())})
    )
    lay = os.path.join(tmp_dir, "und")
    ck = os.path.join(tmp_dir, "ck")
    build_toy_layout(adj, lay, 2, undirected=True, dedup=True)
    with ShardedGraph(lay) as g1:
        g1.label_propagation(seeds=seeds, max_iterations=2,
                             checkpoint_dir=ck, checkpoint_every=2)
    with ShardedGraph(lay) as g2:
        resumed = g2.label_propagation(seeds=seeds, max_iterations=30,
                                       checkpoint_dir=ck, resume=True).to_pandas()
    with ShardedGraph(lay) as g3:
        straight = g3.label_propagation(seeds=seeds, max_iterations=30).to_pandas()
    a = state_by_node(resumed, adj, "label")
    b = state_by_node(straight, adj, "label")
    assert a == b
    assert a[10] == 100 and a[14] == 200


def test_wcc_rejects_directed_layout(tmp_dir):
    """Manifest-flag validation (round-2 ADVICE): running WCC on a directed
    layout silently computes the wrong components, so it raises instead."""
    lay = os.path.join(tmp_dir, "directed_only")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 2)  # no undirected flag
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError, match="undirected"):
            g.weakly_connected_components()


def test_lp_rejects_non_dedup_layout(tmp_dir):
    lay = os.path.join(tmp_dir, "und_nodedup")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 2, undirected=True)  # dedup missing
    with ShardedGraph(lay) as g:
        with pytest.raises(ValueError, match="dedup"):
            g.label_propagation()


def test_lp_unknown_seed_vertex_raises(tmp_dir):
    lay = os.path.join(tmp_dir, "und_seed")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 2, undirected=True, dedup=True)
    seeds = ray.data.from_arrow(
        pa.table({"vertex": pa.array([10, 999], pa.int64()),
                  "label": pa.array([1, 2], pa.int64())})
    )
    with ShardedGraph(lay) as g:
        with pytest.raises(Exception, match="not in graph"):
            g.label_propagation(seeds=seeds, max_iterations=2)
