"""Cassovary MemoryMappedDirectedGraph binary interop
(``io_text.write_mmap_graph`` / ``read_mmap_graph``): byte-for-byte
against an independently spec-constructed file
(``MemoryMappedDirectedGraph.scala:35-46``), round-trips, and the read
path into ``build_edge_layout`` (VERDICT r4 #6)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from cassovary_ray.io_text import (mmap_graph_edges, read_mmap_graph,
                                   write_mmap_graph)

# toy: 0->1, 0->2, 2->0, 3 has no edges but id 3 exists via n_nodes=4
EDGES = [(0, 1), (0, 2), (2, 0)]
N = 4


def spec_bytes() -> bytes:
    """The documented format, built by hand with struct:
    8 reserved + 8 n + (n+1) out-offsets + (n+1) in-offsets (absolute byte
    offsets, big-endian int64) + out-neighbor int32s + in-neighbor int32s,
    nodes sequential, neighbors ascending."""
    out_adj = {0: [1, 2], 1: [], 2: [0], 3: []}
    in_adj = {0: [2], 1: [0], 2: [0], 3: []}
    header_len = 16 + 8 * (N + 1) * 2
    buf = struct.pack(">qq", 0, N)
    off = header_len
    offs = []
    for i in range(N):
        offs.append(off)
        off += 4 * len(out_adj[i])
    offs.append(off)
    buf += b"".join(struct.pack(">q", o) for o in offs)
    offs = []
    for i in range(N):
        offs.append(off)
        off += 4 * len(in_adj[i])
    offs.append(off)
    buf += b"".join(struct.pack(">q", o) for o in offs)
    for adj in (out_adj, in_adj):
        for i in range(N):
            buf += b"".join(struct.pack(">i", v) for v in adj[i])
    return buf


def test_writer_matches_spec_bytes(tmp_path):
    path = str(tmp_path / "g.graph")
    src = np.array([e[0] for e in EDGES])
    dst = np.array([e[1] for e in EDGES])
    write_mmap_graph((src, dst), path, n_nodes=N)
    got = open(path, "rb").read()
    want = spec_bytes()
    assert got == want
    assert len(got) == 16 + 16 * (N + 1) + 8 * len(EDGES)


def test_round_trip(tmp_path):
    path = str(tmp_path / "g.graph")
    rng = np.random.default_rng(3)
    pairs = sorted({(int(a), int(b)) for a, b in rng.integers(0, 50, (300, 2))})
    src = np.array([a for a, _ in pairs])
    dst = np.array([b for _, b in pairs])
    n = write_mmap_graph((src, dst), path)
    n2, s2, d2 = read_mmap_graph(path)
    assert n2 == n == int(max(src.max(), dst.max())) + 1
    assert sorted(zip(s2, d2)) == pairs
    # writing the read-back edges reproduces the identical file
    path2 = str(tmp_path / "g2.graph")
    write_mmap_graph((s2, d2), path2, n_nodes=n)
    assert open(path, "rb").read() == open(path2, "rb").read()


def test_rejects_oversized_and_negative(tmp_path):
    with pytest.raises(ValueError, match="2\\^31"):
        write_mmap_graph((np.array([0]), np.array([1 << 31])),
                         str(tmp_path / "x"))
    with pytest.raises(ValueError, match="non-negative"):
        write_mmap_graph((np.array([-1]), np.array([0])),
                         str(tmp_path / "y"))


def test_read_into_layout_and_degrees(tmp_path):
    """mmap file → edges Dataset → build_edge_layout → engine degrees match
    the file's adjacency (the JVM-interop onboarding path)."""
    from cassovary_ray.engine import ShardedGraph
    from cassovary_ray.layout import build_edge_layout

    path = str(tmp_path / "g.graph")
    src = np.array([e[0] for e in EDGES])
    dst = np.array([e[1] for e in EDGES])
    write_mmap_graph((src, dst), path, n_nodes=N)
    ds = mmap_graph_edges(path)
    lay = str(tmp_path / "lay")
    build_edge_layout(ds, lay, 2)
    with ShardedGraph(lay) as g:
        assert g.n_edges == len(EDGES)
        ranks = g.pagerank(max_iterations=5).to_pandas()
    assert sorted(ranks["vertex"]) == [0, 1, 2]  # vertex universe from edges
    from cassovary_ray.analytics import out_degrees

    deg = out_degrees(ds).to_pandas().set_index("vertex")["out_deg"]
    assert deg.to_dict() == {0: 2, 2: 1}
