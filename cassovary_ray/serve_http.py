"""Plain-HTTP front end for the graph server — the ``CassovaryServer``
HTTP shape (``cassovary-server/src/main/scala/CassovaryServer.scala:36-59``:
a finagle service answering every request with a personalized-reputation
walk) re-expressed over :mod:`cassovary_ray.serve` for NON-Ray clients:
anything that can speak HTTP (curl, a JVM service, a load balancer health
check) can hit a running :class:`~cassovary_ray.serve.GraphServer` without
attaching to the Ray cluster.

Endpoints (GET, JSON responses):

- ``/info``                      — server/graph metadata
- ``/node?id=N``                 — existence + degrees (+ ``neighbors=0`` to skip lists)
- ``/neighbors?id=N[&max=K]``    — out-neighbor ids
- ``/walk?start=N&steps=K&reset=R&top=T``  — visit counts of a random walk
  (the reference server's per-request walk, ``CassovaryServer.scala:38-46``)
- ``/reputation?start=N&steps=K&reset=R&top=T`` — Monte-Carlo personalized
  reputation (``GraphUtils.calculatePersonalizedReputation``)
- ``/wtf?user=N&top=T``          — who-to-follow recommendations

Deployment shape: run :func:`main`-style in any process attached to the
cluster —

    session = serve.connect("default")
    httpd = serve_http(session, port=8791)   # returns after binding
    httpd.serve_forever()                    # or leave the daemon thread

The handler threads reuse ONE :class:`GraphSession`; per-request work runs
on the resident shard actors (point lookups one actor hop, walks on the
server actor), so the HTTP layer adds only JSON encoding.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

__all__ = ["serve_http", "start_http"]


def _json_default(o):
    import numpy as np

    if isinstance(o, np.integer):
        return int(o)
    if isinstance(o, np.floating):
        return float(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    return str(o)


def _walk_table_json(tbl, top: int):
    d = tbl.to_pydict()
    cols = list(d.keys())
    rows = list(zip(*[d[c] for c in cols]))[:top]
    return [dict(zip(cols, r)) for r in rows]


def _make_handler(session):
    class Handler(BaseHTTPRequestHandler):
        # quiet: BaseHTTPRequestHandler logs every request to stderr
        def log_message(self, fmt, *args):  # noqa: D102
            pass

        def _send(self, code: int, obj) -> None:
            body = json.dumps(obj, default=_json_default).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _q(self, qs, key, default=None, cast=int):
            if key not in qs:
                if default is None:
                    raise KeyError(key)
                return default
            return cast(qs[key][0])

        def do_GET(self) -> None:  # noqa: N802
            url = urlparse(self.path)
            qs = parse_qs(url.query)
            try:
                if url.path == "/info":
                    self._send(200, session.info())
                elif url.path == "/node":
                    vid = self._q(qs, "id")
                    with_n = bool(self._q(qs, "neighbors", 1))
                    node = session.node(vid, with_neighbors=with_n)
                    self._send(200, node if node is not None
                               else {"id": vid, "exists": False})
                elif url.path == "/neighbors":
                    vid = self._q(qs, "id")
                    mx = self._q(qs, "max", 0) or None
                    nbrs = session.neighbors(vid, max_neighbors=mx)
                    self._send(200, {"id": vid,
                                     "neighbors": None if nbrs is None
                                     else [int(x) for x in nbrs]})
                elif url.path in ("/walk", "/reputation"):
                    start = self._q(qs, "start")
                    steps = self._q(qs, "steps", 1000)
                    reset = self._q(qs, "reset", 0.15, float)
                    top = self._q(qs, "top", 10)
                    if url.path == "/walk":
                        tbl = session.random_walks(
                            [start], steps, reset_prob=reset, top_k=top)
                    else:
                        tbl = session.personalized_reputation(
                            start, num_steps=steps, reset_prob=reset,
                            top_k=top)
                    self._send(200, {"start": start, "steps": steps,
                                     "visits": _walk_table_json(tbl, top)})
                elif url.path == "/wtf":
                    user = self._q(qs, "user")
                    top = self._q(qs, "top", 10)
                    tbl = session.who_to_follow(user, top_k=top)
                    self._send(200, {"user": user,
                                     "recs": _walk_table_json(tbl, top)})
                else:
                    self._send(404, {"error": f"unknown path {url.path}"})
            except KeyError as e:
                self._send(400, {"error": f"missing query param {e}"})
            except Exception as e:  # surface handler faults as 500 JSON
                self._send(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve_http(session, host: str = "127.0.0.1", port: int = 0,
               daemon: bool = True) -> ThreadingHTTPServer:
    """Bind a threaded HTTP server over ``session`` and start serving on a
    background thread. Returns the server (``server.server_address`` holds
    the bound (host, port) — ``port=0`` picks a free one); call
    ``server.shutdown()`` to stop."""
    httpd = ThreadingHTTPServer((host, port), _make_handler(session))
    t = threading.Thread(target=httpd.serve_forever, daemon=daemon)
    t.start()
    return httpd


def start_http(layout_dir: str, *, name: str = "default",
               reverse_layout_dir: str | None = None,
               host: str = "127.0.0.1", port: int = 0):
    """One-call deployment: start (or reuse) the named graph server, then
    front it with HTTP. Returns ``(httpd, session)``."""
    from cassovary_ray import serve

    try:
        session = serve.connect(name)
    except ValueError:
        session = serve.start(layout_dir, name=name,
                              reverse_layout_dir=reverse_layout_dir)
    return serve_http(session, host=host, port=port), session
