"""HTTP front end (serve_http.py — the CassovaryServer HTTP shape,
``CassovaryServer.scala:36-59``): JSON endpoints over a running
GraphServer, reachable by plain-HTTP clients with no Ray attachment —
including a subprocess client with a warm-walk latency budget."""

from __future__ import annotations

import json
import subprocess
import sys
import textwrap
import time
import urllib.request

import pytest

from cassovary_ray import serve
from cassovary_ray.corpus import TOY_GRAPHS
from cassovary_ray.serve_http import serve_http
from tests.util import build_toy_layout


@pytest.fixture(scope="module")
def http_served(tmp_path_factory):
    root = tmp_path_factory.mktemp("http_lay")
    lay, rev = str(root / "lay"), str(root / "rev")
    adj = TOY_GRAPHS["g6"]
    build_toy_layout(adj, lay, 2)
    build_toy_layout(adj, rev, 2, reverse=True)
    sess = serve.start(lay, name="test_http_g6", reverse_layout_dir=rev)
    httpd = serve_http(sess)
    host, port = httpd.server_address
    yield f"http://{host}:{port}", adj
    httpd.shutdown()
    sess.stop()


def _get(base, path):
    with urllib.request.urlopen(base + path, timeout=30) as r:
        return r.status, json.loads(r.read())


def test_info_and_node(http_served):
    base, adj = http_served
    code, info = _get(base, "/info")
    assert code == 200 and info["n_vertices"] == len(adj)
    v = sorted(adj)[0]
    code, rec = _get(base, f"/node?id={v}")
    assert code == 200 and rec["id"] == v
    assert rec["out_degree"] == len(adj[v])
    assert rec["out_neighbors"] == sorted(adj[v])
    code, rec = _get(base, f"/node?id={max(adj) + 999}")
    assert code == 200 and rec["exists"] is False


def test_neighbors_and_errors(http_served):
    base, adj = http_served
    v = sorted(adj)[1]
    code, rec = _get(base, f"/neighbors?id={v}")
    assert code == 200 and rec["neighbors"] == sorted(adj[v])
    # missing param → 400, unknown path → 404 (JSON bodies either way)
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/neighbors")
    assert e.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as e:
        _get(base, "/nope")
    assert e.value.code == 404


def test_walk_and_reputation(http_served):
    base, adj = http_served
    v = sorted(adj)[0]
    code, out = _get(base, f"/walk?start={v}&steps=20&reset=0.1&top=5")
    assert code == 200 and 0 < len(out["visits"]) <= 5
    assert all({"vertex", "visits"} <= set(r) for r in out["visits"])
    code, out = _get(base, f"/reputation?start={v}&steps=200&top=5")
    assert code == 200 and 0 < len(out["visits"]) <= 5


def test_wtf_endpoint(http_served):
    base, adj = http_served
    v = sorted(adj)[0]
    code, out = _get(base, f"/wtf?user={v}&top=3")
    assert code == 200 and "recs" in out


def test_subprocess_client_warm_walk_latency(http_served):
    """A NON-Ray subprocess hits the HTTP endpoint via localhost: the warm
    walk request must answer in < 250 ms (VERDICT r4 #8)."""
    base, adj = http_served
    v = sorted(adj)[0]
    script = textwrap.dedent(f"""
        import json, time, urllib.request
        url = "{base}/walk?start={v}&steps=20&top=5"
        urllib.request.urlopen(url, timeout=30).read()  # warm
        t0 = time.perf_counter()
        body = json.loads(urllib.request.urlopen(url, timeout=30).read())
        ms = (time.perf_counter() - t0) * 1e3
        assert body["visits"], body
        print(json.dumps({{"ms": ms}}))
    """)
    proc = subprocess.run([sys.executable, "-c", script],
                          capture_output=True, text=True, timeout=120)
    assert proc.returncode == 0, proc.stderr[-2000:]
    ms = json.loads(proc.stdout.strip().splitlines()[-1])["ms"]
    assert ms < 250, f"warm HTTP walk took {ms:.1f} ms"
