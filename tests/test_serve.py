"""Serving surface (serve.py — the CassovaryServer analogue): named-actor
session, shard-direct point lookups, per-request walks, and warm cross-process
request latency."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

import ray

from cassovary_ray import serve
from cassovary_ray.corpus import TOY_GRAPHS
from tests.util import build_toy_layout


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    lay = str(tmp_path_factory.mktemp("serve_lay"))
    adj = TOY_GRAPHS["g6"]
    build_toy_layout(adj, lay, 2)
    sess = serve.start(lay, name="test_g6")
    yield sess, adj, lay
    sess.stop()


def test_point_lookups(served):
    sess, adj, _ = served
    for v, nbrs in adj.items():
        rec = sess.node(v)
        assert rec["id"] == v
        assert rec["out_degree"] == len(nbrs)
        assert rec["out_neighbors"] == sorted(nbrs)
        assert sess.degree(v) == len(nbrs)
        assert sess.neighbors(v) == sorted(nbrs)
        assert sess.exists(v)
    missing = max(adj) + 1000
    assert sess.node(missing) is None
    assert not sess.exists(missing)
    assert sess.neighbors(missing) is None


def test_batched_nodes_order(served):
    sess, adj, _ = served
    ids = sorted(adj) + [max(adj) + 1000]
    recs = sess.nodes(ids)
    assert recs[-1] is None
    for v, rec in zip(ids[:-1], recs[:-1]):
        assert rec["id"] == v and rec["out_degree"] == len(adj[v])


def test_walk_request_matches_engine(served):
    """Server-side per-request walks == ShardedGraph.random_walks for the
    same (starts, steps, seed)."""
    from cassovary_ray.engine import ShardedGraph

    sess, adj, lay = served
    starts = sorted(adj)[:2]
    got = sess.random_walks(starts, 6, seed=7).to_pandas()
    with ShardedGraph(lay) as g:
        want = g.random_walks(starts, 6, seed=7).to_pandas()
    assert got.values.tolist() == want.values.tolist()


def test_personalized_reputation_request(served):
    sess, adj, _ = served
    t = sess.personalized_reputation(sorted(adj)[0], num_steps=200,
                                     num_walkers=20, top_k=5, seed=3)
    assert 0 < len(t) <= 5
    visits = t["visits"].to_numpy()
    assert (np.diff(visits) <= 0).all()  # VisitsCounter order


def test_info_and_connect_same_process(served):
    sess, adj, lay = served
    info = sess.info()
    assert info["n_edges"] > 0 and info["num_parts"] == 2
    sess2 = serve.connect("test_g6")
    assert sess2.degree(sorted(adj)[0]) == len(adj[sorted(adj)[0]])


def test_second_process_warm_walk_latency(served):
    """A SECOND process connects to the running named server and answers a
    walk request warm — the CassovaryServer deployment shape. Latency bar:
    min-of-5 warm requests < 250 ms (quiet-box measured ~15-40 ms; the bar
    is slack for CI noise — BASELINE.md records the measured figure)."""
    sess, adj, _ = served
    gcs = ray.get_runtime_context().gcs_address
    start = sorted(adj)[0]
    script = textwrap.dedent(f"""
        import json, time
        import ray
        ray.init(address={gcs!r}, ignore_reinit_error=True,
                 logging_level="ERROR")
        from cassovary_ray import serve
        sess = serve.connect("test_g6")
        assert sess.degree({start}) is not None      # point lookup works
        sess.random_walks([{start}], 6, seed=7)      # warm-up request
        lat = []
        for _ in range(5):
            t0 = time.perf_counter()
            t = sess.random_walks([{start}], 6, seed=7)
            lat.append(time.perf_counter() - t0)
            assert len(t) > 0
        print(json.dumps({{"min_ms": min(lat) * 1e3}}))
    """)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # force the explicit gcs address
    out = subprocess.run([sys.executable, "-c", script], env=env,
                         capture_output=True, text=True, timeout=120,
                         cwd=os.path.dirname(os.path.dirname(__file__)))
    assert out.returncode == 0, out.stderr[-2000:]
    import json

    ms = json.loads(out.stdout.strip().splitlines()[-1])["min_ms"]
    assert ms < 250.0, f"warm walk request took {ms:.1f} ms"


def test_restart_uses_shard_cache(tmp_path):
    """Second start() of the same layout goes through the binary CSR shard
    cache (engine._load_scatter_cache) — restart latency, not correctness."""
    lay = str(tmp_path / "lay")
    build_toy_layout(TOY_GRAPHS["g5"], lay, 2)
    s1 = serve.start(lay, name="test_restart")
    first = s1.info()["load_sec"]
    s1.stop()
    t0 = time.perf_counter()
    s2 = serve.start(lay, name="test_restart")
    assert s2.info()["n_vertices"] > 0
    assert os.path.isdir(os.path.join(lay, "csr_cache"))
    s2.stop()
    assert time.perf_counter() - t0 < max(10.0, 5 * max(first, 0.1))


def test_apply_delta_live(tmp_path):
    """Live dynamic update of a served graph (ConcurrentHashMapDynamicGraph
    analogue): delta lands on disk via update_edge_layout, touched shards
    hot-reload, and point lookups + walks see the new graph immediately."""
    import pyarrow as pa

    from cassovary_ray.engine import ShardedGraph

    lay = str(tmp_path / "lay")
    adj = {0: [1, 2], 1: [2], 2: [0], 3: []}
    build_toy_layout(adj, lay, 2)
    sess = serve.start(lay, name="test_delta")
    try:
        assert sess.neighbors(0) == [1, 2]
        assert sess.info()["n_edges"] == 4
        added = pa.table({"src": pa.array([0, 7], pa.int64()),
                          "dst": pa.array([7, 1], pa.int64())})
        removed = pa.table({"src": pa.array([0], pa.int64()),
                            "dst": pa.array([2], pa.int64())})
        info = sess.apply_delta(added=added, removed=removed)
        assert info["n_edges"] == 5
        assert sess.neighbors(0) == [1, 7]     # 0→2 gone, 0→7 added
        assert sess.neighbors(7) == [1]        # new vertex with an out-edge
        assert sess.degree(2) == 1             # untouched shard state intact
        assert sess.exists(7)
        # walks over the updated graph match a fresh engine on the same dir
        got = sess.random_walks([0], 5, seed=3).to_pandas()
        with ShardedGraph(lay) as g:
            want = g.random_walks([0], 5, seed=3).to_pandas()
        assert got.values.tolist() == want.values.tolist()
        # empty delta is a no-op
        assert sess.apply_delta()["n_edges"] == 5
    finally:
        sess.stop()


def test_apply_delta_with_reverse_layout(tmp_path):
    """apply_delta propagates the same delta to the reverse layout (its
    manifest's reverse flag re-reverses the rows), so in-degrees stay
    consistent after a live update."""
    import pyarrow as pa

    lay, rev = str(tmp_path / "lay"), str(tmp_path / "rev")
    adj = {0: [1], 1: [2], 2: []}
    build_toy_layout(adj, lay, 2)
    build_toy_layout(adj, rev, 2, reverse=True)
    sess = serve.start(lay, name="test_delta_rev", reverse_layout_dir=rev)
    try:
        assert sess.node(2, with_neighbors=False)["in_degree"] == 1
        added = pa.table({"src": pa.array([0], pa.int64()),
                          "dst": pa.array([2], pa.int64())})
        sess.apply_delta(added=added)
        rec = sess.node(2, with_neighbors=False)
        assert rec["in_degree"] == 2
        assert sess.neighbors(0) == [1, 2]
    finally:
        sess.stop()


def test_who_to_follow_request(tmp_path):
    """Per-request WTF on the served graph: 0 follows 1 and 2; both follow
    3; only 2 follows 4 → recommend 3 (consensus) above 4, never the user
    or accounts already followed; contributors name the endorsing circle
    members."""
    import pyarrow as pa

    follow = {0: [1, 2], 1: [3], 2: [3, 4], 3: [], 4: []}
    lay, rev = str(tmp_path / "lay"), str(tmp_path / "rev")
    build_toy_layout(follow, lay, 2)
    build_toy_layout(follow, rev, 2, reverse=True)
    sess = serve.start(lay, name="test_wtf", reverse_layout_dir=rev)
    try:
        t = sess.who_to_follow(0, num_steps=2000, num_walkers=50, seed=5)
        recs = t["vertex"].to_pylist()
        assert set(recs) <= {3, 4} and recs[0] == 3
        w = t["weight"].to_numpy(zero_copy_only=False)
        assert (np.diff(w) <= 0).all()
        contribs = t["contributors"].to_pylist()
        assert set(contribs[0]) <= {0, 1, 2, 3, 4}
        # live follow of 3 removes it from the next request's results
        sess.apply_delta(added=pa.table({"src": pa.array([0], pa.int64()),
                                         "dst": pa.array([3], pa.int64())}))
        t2 = sess.who_to_follow(0, num_steps=2000, num_walkers=50, seed=5)
        assert 3 not in t2["vertex"].to_pylist()
    finally:
        sess.stop()


def test_who_to_follow_needs_reverse(served):
    sess, _, _ = served
    with pytest.raises(Exception, match="reverse_layout_dir"):
        sess.who_to_follow(0)
