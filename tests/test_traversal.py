"""Golden tests for the queue-based traverser fallbacks, literal fixtures
from ``TraverserSpec.scala`` (DFS :198-260, BFS :145-196), and the
MapNodeNumberer analogue (``MapNodeNumbererSpec`` duplicate semantics)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import ray.data

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.numberer import MapNodeNumberer, read_numbering
from cassovary_ray.traversal import Limits, bfs_exact, dfs

from tests.util import edges_ds_for_graph


def test_dfs_g5_discovery_finish_times():
    """``TraverserSpec.scala:198-216`` literal expectations."""
    t = dfs(edges_ds_for_graph(TOY_GRAPHS["g5"]), [10]).to_pandas()
    assert list(t.vertex) == [10, 11, 12, 13, 14]
    got_fin = dict(zip(t.vertex, t.finish))
    assert got_fin == {10: 9, 11: 5, 12: 4, 13: 8, 14: 7}
    got_disc = dict(zip(t.vertex, t.discovery))
    assert got_disc == {10: 0, 11: 1, 12: 2, 13: 3, 14: 6}


def test_dfs_g6_order_times_and_distance():
    """``TraverserSpec.scala:219-247``: visit order, discovery/finish times,
    and PathLengthTracker visit distances (node 12 is re-enqueued from 11 and
    visited at distance 2 although its first-seen depth is 1)."""
    t = dfs(edges_ds_for_graph(TOY_GRAPHS["g6"]), [10]).to_pandas()
    assert list(t.vertex) == [10, 11, 12, 14, 15, 13]
    assert dict(zip(t.vertex, t.finish)) == {10: 11, 11: 9, 12: 8, 13: 10, 14: 7, 15: 6}
    assert dict(zip(t.vertex, t.discovery)) == {10: 0, 11: 1, 12: 2, 13: 3, 14: 4, 15: 5}
    assert dict(zip(t.vertex, t.distance)) == {10: 0, 11: 1, 12: 2, 14: 3, 15: 4, 13: 1}
    assert dict(zip(t.vertex, t.depth)) == {10: 0, 11: 1, 12: 1, 14: 2, 15: 3, 13: 1}


def test_bfs_exact_g6_order_and_depths():
    """``TraverserSpec.scala:145-158``: BFS from 10 on g6."""
    t = bfs_exact(edges_ds_for_graph(TOY_GRAPHS["g6"]), [10],
                  limits=Limits(max_depth=5, max_steps=10)).to_pandas()
    assert list(t.vertex) == [10, 11, 12, 13, 14, 15]
    d = dict(zip(t.vertex, t.depth))
    assert d == {10: 0, 11: 1, 12: 1, 13: 1, 14: 2, 15: 3}


def test_bfs_exact_max_depth():
    """``:161-171``: from 15, maxDepth=1 → [15, 10, 11]."""
    t = bfs_exact(edges_ds_for_graph(TOY_GRAPHS["g6"]), [15],
                  limits=Limits(max_depth=1, max_steps=10)).to_pandas()
    assert list(t.vertex) == [15, 10, 11]


def test_bfs_exact_degree_threshold():
    """``:173-183``: numOfFriendsThresh=3 → hub 10 (3 nbrs) visited but not
    expanded → [15, 10, 11, 12, 14]."""
    t = bfs_exact(edges_ds_for_graph(TOY_GRAPHS["g6"]), [15],
                  limits=Limits(max_depth=5, max_num_edges_thresh=3,
                                max_steps=10)).to_pandas()
    assert list(t.vertex) == [15, 10, 11, 12, 14]
    assert dict(zip(t.vertex, t.depth)) == {15: 0, 10: 1, 11: 1, 12: 2, 14: 2}


def test_bfs_exact_max_steps():
    """``:185-196``: maxSteps=4 → [15, 10, 11, 12]."""
    t = bfs_exact(edges_ds_for_graph(TOY_GRAPHS["g6"]), [15],
                  limits=Limits(max_depth=5, max_num_edges_thresh=3,
                                max_steps=4)).to_pandas()
    assert list(t.vertex) == [15, 10, 11, 12]


def test_collect_adjacency_guard():
    from cassovary_ray.traversal import collect_adjacency

    with pytest.raises(ValueError, match="max_edges"):
        collect_adjacency(edges_ds_for_graph(TOY_GRAPHS["g6"]), max_edges=3)


def test_distributed_bfs_hub_prune(tmp_dir):
    """analytics.bfs max_num_edges_thresh: hub visited, never expanded."""
    from cassovary_ray.analytics import bfs

    adj = {0: [10, 1], 10: [20, 21, 22, 23, 24, 25], 1: [2], 2: []}
    got = bfs(edges_ds_for_graph(adj), [0], max_num_edges_thresh=3).to_pandas()
    d = dict(zip(got.vertex, got.depth))
    assert d == {0: 0, 10: 1, 1: 1, 2: 2}  # 20..25 unreachable via pruned hub


# -- MapNodeNumberer ---------------------------------------------------------


def numbering_ds(pairs):
    return ray.data.from_arrow(pa.table({
        "name": pa.array([p[0] for p in pairs], pa.string()),
        "id": pa.array([p[1] for p in pairs], pa.int64()),
    }))


def test_numberer_roundtrip_and_file(tmp_dir):
    p = os.path.join(tmp_dir, "map.txt")
    with open(p, "w") as f:
        f.write("banana 12\napple 2\nspoon 8\n")  # MapNodeNumberer.scala:40-44
    n = MapNodeNumberer.from_file(p)
    assert n.external_to_internal("apple") == 2
    assert n.internal_to_external(8) == "spoon"
    with pytest.raises(KeyError):
        n.external_to_internal("kiwi")


def test_numberer_duplicate_id_raises():
    with pytest.raises(ValueError, match="Duplicate id"):
        MapNodeNumberer(numbering_ds([("a", 1), ("b", 1)]))


def test_numberer_duplicate_name_raises():
    with pytest.raises(ValueError, match="Duplicate name"):
        MapNodeNumberer(numbering_ds([("a", 1), ("a", 2)]))


def test_numberer_translate_edges_broadcast():
    n = MapNodeNumberer(numbering_ds([("a", 1), ("b", 2), ("c", 3)]))
    named = ray.data.from_arrow(pa.table({
        "src": pa.array(["a", "b"], pa.string()),
        "dst": pa.array(["c", "a"], pa.string()),
    }))
    df = n.translate_edges(named).to_pandas().sort_values("src").reset_index(drop=True)
    assert list(zip(df.src, df.dst)) == [(1, 3), (2, 1)]


def test_numberer_translate_edges_join_path():
    n = MapNodeNumberer(numbering_ds([("a", 1), ("b", 2), ("c", 3)]),
                        broadcast_limit=1)
    named = ray.data.from_arrow(pa.table({
        "src": pa.array(["a", "b"], pa.string()),
        "dst": pa.array(["c", "a"], pa.string()),
    }))
    df = n.translate_edges(named).to_pandas().sort_values("src").reset_index(drop=True)
    assert list(zip(df.src, df.dst)) == [(1, 3), (2, 1)]


def test_numberer_names_of():
    n = MapNodeNumberer(numbering_ds([("a", 1), ("b", 2)]))
    verts = ray.data.from_arrow(pa.table({"vertex": pa.array([1, 2, 9], pa.int64())}))
    df = n.names_of(verts).to_pandas().sort_values("vertex")
    import pandas as pd

    got = dict(zip(df.vertex, df.name))
    assert got[1] == "a" and got[2] == "b" and pd.isna(got[9])


def test_dfs_g6_indir_golden():
    """``TraverserSpec.scala:249-270``: InDir DFS from 10 with maxSteps=10."""
    t = dfs(edges_ds_for_graph(TOY_GRAPHS["g6"]), [10],
            limits=Limits(max_steps=10), reverse=True).to_pandas()
    assert list(t.vertex) == [10, 15, 14, 11, 12, 13]
    assert dict(zip(t.vertex, t.distance)) == {10: 0, 15: 1, 14: 2, 11: 3, 12: 3, 13: 4}
    assert dict(zip(t.vertex, t.finish)) == {10: 11, 11: 6, 12: 8, 13: 7, 14: 9, 15: 10}
