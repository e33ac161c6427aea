"""Dynamic directed graph: log + compaction semantics matching the
reference's ``ArrayBasedDynamicDirectedGraphSpec`` behaviors (add/remove,
duplicate add, remove-absent no-op, node auto-creation)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import ray.data

from cassovary_ray.dynamic import DynamicDirectedGraph


def edge_set(g):
    df = g.edges().to_pandas()
    return set(zip(df["src"], df["dst"]))


def test_add_and_remove_edges():
    g = DynamicDirectedGraph()
    g.add_edges([(1, 2), (1, 3), (2, 3)])
    assert edge_set(g) == {(1, 2), (1, 3), (2, 3)}
    g.remove_edges([(1, 3)])
    assert edge_set(g) == {(1, 2), (2, 3)}
    # re-add after remove resurrects the edge (latest op wins)
    g.add_edges([(1, 3)])
    assert edge_set(g) == {(1, 2), (1, 3), (2, 3)}


def test_duplicate_add_and_remove_absent_are_noops():
    g = DynamicDirectedGraph()
    g.add_edges([(1, 2)])
    g.add_edges([(1, 2), (1, 2)])  # dup within and across calls
    g.remove_edges([(9, 9)])  # absent: no-op
    assert edge_set(g) == {(1, 2)}
    assert g.edge_count() == 1


def test_nodes_from_edges_and_explicit():
    g = DynamicDirectedGraph()
    g.add_edges([(1, 2)])
    g.add_nodes([7])
    nodes = set(g.nodes().to_pandas()["vertex"])
    assert nodes == {1, 2, 7}
    # removing the only edge removes its endpoint nodes, not explicit ones
    g.remove_edges([(1, 2)])
    assert set(g.nodes().to_pandas()["vertex"]) == {7}


def test_base_edges_and_interleaved_ops():
    base = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 2, 3], pa.int64()),
        "dst": pa.array([2, 3, 4], pa.int64()),
    }))
    g = DynamicDirectedGraph(base_edges=base)
    g.remove_edges([(2, 3)])
    g.add_edges([(5, 6)])
    g.remove_edges([(5, 6)])
    g.add_edges([(5, 6)])
    assert edge_set(g) == {(1, 2), (3, 4), (5, 6)}


def test_log_checkpoint_roundtrip(tmp_dir):
    log_dir = os.path.join(tmp_dir, "mutlog")
    g = DynamicDirectedGraph()
    g.add_edges([(1, 2), (2, 3)])
    g.remove_edges([(2, 3)])
    assert g.checkpoint_log(log_dir) == 2
    g.add_edges([(3, 4)])  # post-checkpoint in-memory tail
    assert edge_set(g) == {(1, 2), (3, 4)}

    g2 = DynamicDirectedGraph.from_log(log_dir)
    assert edge_set(g2) == {(1, 2)}
    g2.add_edges([(8, 9)])  # seq continues past the persisted log
    assert edge_set(g2) == {(1, 2), (8, 9)}


def test_compacted_edges_feed_static_analytics(tmp_dir):
    from cassovary_ray import analytics

    g = DynamicDirectedGraph()
    g.add_edges([(1, 2), (2, 1), (2, 3)])
    g.remove_edges([(2, 3)])
    deg = analytics.degrees(g.edges()).to_pandas().set_index("vertex")
    assert deg.loc[1, "out_deg"] == 1 and deg.loc[1, "in_deg"] == 1
    assert deg.loc[2, "out_deg"] == 1 and deg.loc[2, "in_deg"] == 1
    assert analytics.mutual_edge_count(g.edges()) == 1


def test_bad_pairs_raise():
    g = DynamicDirectedGraph()
    with pytest.raises(ValueError):
        g.add_edges([(1, 2, 3)])
