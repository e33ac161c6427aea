"""BipartiteGraph data model: independent id spaces, side degrees,
unipartite encoding, and the id-space round-trip through the flow."""

from __future__ import annotations

import pyarrow as pa
import ray.data

from cassovary_ray.bipartite import BipartiteGraph, decode_vertex


def bg():
    # left 1 -> rights {1, 2}; left 2 -> right 1; left/right id 1 collide
    # on purpose: independent spaces must keep them distinct
    return BipartiteGraph(ray.data.from_arrow(pa.table({
        "left_id": pa.array([1, 1, 2], pa.int64()),
        "right_id": pa.array([1, 2, 1], pa.int64()),
    })))


def test_counts_and_degrees():
    g = bg()
    assert g.left_node_count() == 2
    assert g.right_node_count() == 2
    assert g.edge_count() == 3
    ld = g.left_nodes().to_pandas().set_index("vertex")["out_deg"]
    rd = g.right_nodes().to_pandas().set_index("vertex")["in_deg"]
    assert ld.to_dict() == {1: 2, 2: 1}
    assert rd.to_dict() == {1: 2, 2: 1}


def test_unipartite_encoding_is_collision_free():
    g = bg()
    e = g.to_unipartite().to_pandas()
    assert set(zip(e["src"], e["dst"])) == {(2, 3), (2, 5), (4, 3)}
    assert decode_vertex(2) == ("left", 1)
    assert decode_vertex(3) == ("right", 1)
    assert decode_vertex(5) == ("right", 2)


def test_src_dst_ingestion_and_dedup():
    g = BipartiteGraph(ray.data.from_arrow(pa.table({
        "src": pa.array([7, 7], pa.int64()),
        "dst": pa.array([9, 9], pa.int64()),
    })))
    assert g.edge_count() == 1
    assert g.left_node_count() == 1 and g.right_node_count() == 1


def test_flow_round_trips_id_spaces():
    g = bg()
    left, right = g.iterative_link_analysis({1: 1.0, 2: 1.0},
                                            num_iterations=2)
    # outputs are back in side-space ids
    assert set(left["vertex"]) == {1, 2}
    assert set(right["vertex"]) == {1, 2}
    # contributors of a right node are LEFT-space ids
    contribs = {v: c for v, c in zip(right["vertex"], right["contributors"])}
    assert set(contribs[1]) <= {1, 2}
    # right 1 has in-degree 2, right 2 in-degree 1: first pass gives
    # r1 = (1/2 + 1/1) * 0.9, r2 = (1/2) * 0.9
    w = {v: x for v, x in zip(right["vertex"], right["weight"])}
    assert abs(w[1] - 1.5 * 0.9) < 1e-12
    assert abs(w[2] - 0.5 * 0.9) < 1e-12
