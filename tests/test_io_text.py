"""Reader/writer round-trips against the reference's own text fixtures
(``cassovary-core/src/test/resources/graphs/*``; spec behavior from
``AdjacencyListGraphReaderSpec.scala:20-90``, ``ListOfEdgesGraphReaderSpec``,
``LabelsReaderSpec``)."""

from __future__ import annotations

import gzip
import os

import pytest

from cassovary_ray.analytics import distinct_edges, vertex_count
from cassovary_ray.hashing import hash64
from cassovary_ray.io_text import (
    read_adjacency_graph,
    read_adjacency_vertices,
    read_edge_list,
    read_node_labels,
    write_adjacency,
    write_edge_list,
)

G6_ADJ = {10: [11, 12, 13], 11: [12, 14], 12: [14], 13: [12, 14], 14: [15], 15: [10, 11]}


def write_g6_fixture(d: str) -> str:
    """The toy_6nodes adjacency fixture split across 2 part files (same
    content as the reference's toy_6nodes_adj_{1,2}.txt)."""
    os.makedirs(d, exist_ok=True)
    p1 = "10 3\n11\n12\n13\n11 2\n12\n14\n15 2\n10\n11\n"
    p2 = "12 1\n14\n13 2\n12\n14\n14 1\n15\n"
    with open(os.path.join(d, "toy_6nodes_adj_1.txt"), "w") as f:
        f.write(p1)
    with open(os.path.join(d, "toy_6nodes_adj_2.txt"), "w") as f:
        f.write(p2)
    return d


def edges_to_adj(df):
    adj = {}
    for r in df.itertuples():
        adj.setdefault(r.src, []).append(r.dst)
    return {k: sorted(v) for k, v in adj.items()}


def test_adjacency_reader_g6(tmp_dir):
    """nodeCount 6, edgeCount 11, exact adjacency
    (`AdjacencyListGraphReaderSpec.scala:22-81`)."""
    d = write_g6_fixture(os.path.join(tmp_dir, "g6"))
    edges = read_adjacency_graph(d, "toy_6nodes_adj")
    df = edges.to_pandas()
    assert len(df) == 11
    assert vertex_count(read_adjacency_graph(d, "toy_6nodes_adj")) == 6
    assert edges_to_adj(df) == {k: sorted(v) for k, v in G6_ADJ.items()}


def test_adjacency_vertices_includes_empty_nodes(tmp_dir):
    d = os.path.join(tmp_dir, "g")
    os.makedirs(d)
    with open(os.path.join(d, "part1.txt"), "w") as f:
        f.write("1 1\n2\n3 0\n")  # node 3 has no out-edges
    vs = sorted(read_adjacency_vertices(d, "part").to_pandas()["vertex"])
    assert vs == [1, 3]


def test_edge_list_reader(tmp_dir):
    p = os.path.join(tmp_dir, "edges.txt")
    with open(p, "w") as f:
        f.write("# Simple graph\n1 2\n1 3\n2 3\n3 4\n4 1\n")
    df = read_edge_list(p).to_pandas()
    assert sorted(map(tuple, df.values)) == [(1, 2), (1, 3), (2, 3), (3, 4), (4, 1)]


def test_edge_list_gzip_and_dedup(tmp_dir):
    p = os.path.join(tmp_dir, "edges.txt.gz")
    with gzip.open(p, "wt") as f:
        f.write("1 2\n1 2\n2 3\n")
    assert read_edge_list(p).count() == 3
    assert read_edge_list(p, remove_duplicates=True).count() == 2


def test_edge_list_string_ids_hash(tmp_dir):
    p = os.path.join(tmp_dir, "edges.txt")
    with open(p, "w") as f:
        f.write("alice bob\nbob carol\n")
    df = read_edge_list(p, id_type="string").to_pandas().sort_values("src")
    assert set(df["src"]) == {hash64("alice"), hash64("bob")}
    assert set(df["dst"]) == {hash64("bob"), hash64("carol")}


def test_malformed_line_raises(tmp_dir):
    p = os.path.join(tmp_dir, "bad.txt")
    with open(p, "w") as f:
        f.write("1 2\nnot-an-edge-line-with-three parts here\n")
    with pytest.raises(Exception):
        read_edge_list(p).to_pandas()


def test_node_labels_int_and_string(tmp_dir):
    p = os.path.join(tmp_dir, "labels_int.txt")
    with open(p, "w") as f:
        f.write("10 100\n11 110\n12 120\n15 150\n")
    df = read_node_labels(p).to_pandas()
    assert dict(zip(df.vertex, df.label)) == {10: 100, 11: 110, 12: 120, 15: 150}

    p2 = os.path.join(tmp_dir, "labels_str.txt")
    with open(p2, "w") as f:
        f.write("10 red\n11 blue\n")
    df2 = read_node_labels(p2, value_type="string").to_pandas()
    assert dict(zip(df2.vertex, df2.label)) == {10: "red", 11: "blue"}


def test_edge_list_round_trip(tmp_dir):
    import ray.data
    import pyarrow as pa

    edges = ray.data.from_arrow(pa.table({
        "src": pa.array([1, 1, 2, 3], pa.int64()),
        "dst": pa.array([2, 3, 3, 1], pa.int64()),
    }))
    out = os.path.join(tmp_dir, "out")
    write_edge_list(edges, out)
    back = read_edge_list(out).to_pandas()
    assert sorted(map(tuple, back.values)) == [(1, 2), (1, 3), (2, 3), (3, 1)]


def test_adjacency_round_trip(tmp_dir):
    """reverseParseNode round-trip (`AdjacencyListGraphReaderSpec.scala:83-89`)."""
    d = write_g6_fixture(os.path.join(tmp_dir, "g6"))
    edges = read_adjacency_graph(d, "toy_6nodes_adj")
    out = os.path.join(tmp_dir, "out")
    write_adjacency(edges, out)
    back = read_adjacency_graph(out, "adj").to_pandas()
    assert edges_to_adj(back) == {k: sorted(v) for k, v in G6_ADJ.items()}