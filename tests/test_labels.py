"""Typed node-labels surface (graph/labels/Labels.scala:19-36,
Label.scala:28-79, DirectedGraph.labelOfNode :74-77)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest
import ray.data

from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.engine import ShardedGraph
from cassovary_ray.io_text import read_node_labels
from cassovary_ray.labels import NodeLabels, flag_label

from tests.util import build_toy_layout, state_by_node


def label_ds(mapping, typ=pa.int64()):
    return ray.data.from_arrow(pa.table({
        "vertex": pa.array(list(mapping), pa.int64()),
        "label": pa.array(list(mapping.values()), typ),
    }))


def test_registry_add_get_remove_and_type_check():
    labs = NodeLabels()
    labs.add("age", label_ds({1: 30, 2: 40}))
    labs.add("name", label_ds({1: "a"}, pa.string()))
    assert labs.names() == ["age", "name"]
    assert labs.dtype("age") == "int" and labs.dtype("name") == "string"
    assert labs.get("missing") is None
    # typed get: wrong type raises (Labels.get type-tag check)
    with pytest.raises(TypeError):
        labs.get("age", expected_type="string")
    labs.remove("age")
    assert labs.names() == ["name"]
    labs.remove("age")  # -= on absent key is a no-op


def test_label_of_node_partial_semantics():
    labs = NodeLabels()
    labs.add("score", label_ds({1: 10, 5: 50}))
    assert labs.label_of_node("score", 5) == 50
    assert labs.label_of_node("score", 3) is None  # defined for some ids only
    assert labs.label_of_node("nope", 1) is None


def test_flag_label_always_true():
    verts = ray.data.from_arrow(pa.table({"vertex": pa.array([3, 7], pa.int64())}))
    labs = NodeLabels()
    labs.add("spam", flag_label(verts))
    assert labs.label_of_node("spam", 7) == 1
    assert labs.label_of_node("spam", 4) is None


def test_with_label_left_outer_join():
    labs = NodeLabels()
    labs.add("color", label_ds({1: 7, 2: 8}))
    base = ray.data.from_arrow(pa.table({
        "vertex": pa.array([1, 2, 3], pa.int64()),
        "x": pa.array([0.1, 0.2, 0.3], pa.float64()),
    }))
    df = labs.with_label(base, "color").to_pandas().sort_values("vertex")
    got = dict(zip(df.vertex, df.color))
    assert got[1] == 7 and got[2] == 8
    import pandas as pd

    assert pd.isna(got[3])  # undefined id -> null (partial label)


def test_reader_roundtrip_and_graph_attach(tmp_dir):
    p = os.path.join(tmp_dir, "labels.txt")
    with open(p, "w") as f:
        f.write("10 100\n11 200\n# comment\n12 100\n")
    lay = os.path.join(tmp_dir, "lay")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 2)
    with ShardedGraph(lay) as g:
        g.attach_label("community", read_node_labels(p))
        assert g.label_of_node("community", 11) == 200
        assert g.label_of_node("community", 14) is None


def test_lp_from_named_label_matches_explicit_seeds(tmp_dir):
    seeds_map = {10: 100, 14: 200}
    lay = os.path.join(tmp_dir, "lp")
    build_toy_layout(TOY_GRAPHS["g6"], lay, 2, undirected=True, dedup=True)
    with ShardedGraph(lay) as g1:
        explicit = g1.label_propagation(
            seeds=label_ds(seeds_map), max_iterations=15
        ).to_pandas()
    with ShardedGraph(lay) as g2:
        g2.attach_label("seeds", label_ds(seeds_map))
        named = g2.label_propagation(seeds="seeds", max_iterations=15).to_pandas()
    adj = TOY_GRAPHS["g6"]
    assert state_by_node(named, adj, "label") == state_by_node(explicit, adj, "label")
    with ShardedGraph(lay) as g3:
        with pytest.raises(KeyError):
            g3.label_propagation(seeds="unattached")
        g3.attach_label("names", label_ds({10: "x"}, pa.string()))
        with pytest.raises(TypeError):
            g3.label_propagation(seeds="names")  # string label can't seed LP
