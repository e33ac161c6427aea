"""Long-lived graph serving — the ``CassovaryServer`` analogue.

The reference ships a server process that keeps a renumbered graph resident
and answers per-request walk queries (``cassovary-server/src/main/scala/
CassovaryServer.scala``; SURVEY §3.3 trace: load graph once → serve
``calculatePersonalizedReputation`` per user request). The Ray-native shape:

- :func:`start` builds a **named detached** :class:`GraphServer` actor that
  owns a resident :class:`~cassovary_ray.engine.ShardedGraph` (CSR per shard
  actor, loaded once — warm restarts hit the binary shard cache) and
  pre-builds the src-indexed walk CSRs so the first request pays no load.
- :func:`connect` resolves the actor **by name from any process attached to
  the same Ray cluster** and returns a :class:`GraphSession`.
- Point lookups (``node`` / ``neighbors`` / ``degree`` — the
  ``graph/Graph.scala:25`` + ``Node.scala:31-43`` surface) bypass the server
  actor entirely: the session routes each id to its owning shard actor
  (``vertex % P``) and calls ``GraphShard.point_query`` directly — one actor
  hop per request, no central bottleneck.
- Walk requests (``random_walks`` / ``personalized_reputation`` — the
  WTF-style per-user recommendation call) run on the server actor, which
  drives the shard BSP steps and returns a small top-k Arrow table; no
  Ray Data plan is built per request.

Multi-node story: shard actors are SPREAD-scheduled, so point lookups hit
exactly one node; walk state rides the packed shard-to-shard exchange.
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa

import ray

NAMESPACE = "cassovary_serve"


@ray.remote
class GraphServer:
    """Named actor owning a resident ShardedGraph (see module docstring)."""

    def __init__(self, layout_dir: str, reverse_layout_dir: str | None = None):
        from cassovary_ray.engine import ShardedGraph

        t0 = time.perf_counter()
        self.reverse_layout_dir = reverse_layout_dir
        self.graph = ShardedGraph(layout_dir,
                                  reverse_layout_dir=reverse_layout_dir)
        # pre-build the per-src walk CSRs: first request is then warm
        ray.get([s.walk_build.remote() for s in self.graph.shards])
        self.load_sec = time.perf_counter() - t0

    def info(self) -> dict:
        g = self.graph
        return {
            "layout_dir": g.layout_dir,
            "num_parts": g.num_parts,
            "n_vertices": int(g.n_vertices),
            "n_edges": int(g.n_edges),
            "has_reverse": g.has_reverse,
            "load_sec": round(self.load_sec, 3),
        }

    def shard_handles(self) -> list:
        """Shard actor handles for direct point-lookup routing."""
        return list(self.graph.shards)

    def _visits_topk(self, top_k: int | None) -> pa.Table:
        """Collect the last run's per-shard visit tables and fold the
        global (visits desc, vertex asc) top-k in numpy — request results
        are user-facing-small, so no Dataset plan is warranted."""
        tables = ray.get(self.graph.walk_visit_refs())
        t = pa.concat_tables(tables)
        v = t["vertex"].to_numpy(zero_copy_only=False)
        c = t["visits"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -c))
        if top_k is not None:
            order = order[:top_k]
        return pa.table({"vertex": pa.array(v[order], pa.int64()),
                         "visits": pa.array(c[order], pa.int64())})

    def random_walks(self, starts, num_steps: int, *, reset_prob: float = 0.0,
                     seed: int = 1, max_out_deg: int | None = None,
                     top_k: int | None = None) -> pa.Table:
        """``ShardedGraph.random_walks`` semantics, returned as a plain
        Arrow ``(vertex, visits)`` table limited to ``top_k``."""
        wid = (np.array(sorted(starts), dtype=np.int64)
               if isinstance(starts, dict)
               else np.arange(len(starts), dtype=np.int64))
        st = (np.array([starts[w] for w in wid], dtype=np.int64)
              if isinstance(starts, dict)
              else np.asarray(starts, dtype=np.int64))
        g = self.graph
        ray.get([s.walk_reset_counts.remote() for s in g.shards])
        ray.get([s.walk_seed.remote(wid, st, False, False, False)
                 for s in g.shards])
        outs: list = []
        for step in range(num_steps):
            last = step == num_steps - 1
            outs = [s.walk_step.remote(step, seed, reset_prob, max_out_deg,
                                       last, *outs)
                    for s in g.shards]
        ray.get(outs)
        return self._visits_topk(top_k)

    def personalized_reputation(self, start: int | list[int],
                                num_steps: int = 10_000, *,
                                reset_prob: float = 0.3,
                                num_walkers: int = 100, seed: int = 1,
                                max_out_deg: int | None = None,
                                top_k: int | None = 10) -> pa.Table:
        """Per-request MC personalized PageRank
        (``GraphUtils.calculatePersonalizedReputation``,
        ``GraphUtils.scala:142-154``) — the reference server's core query."""
        starts = ([start] * num_walkers if isinstance(start, int)
                  else list(start) * max(1, num_walkers // max(1, len(start))))
        steps = max(1, num_steps // len(starts))
        return self.random_walks(starts, steps, reset_prob=reset_prob,
                                 seed=seed, max_out_deg=max_out_deg,
                                 top_k=top_k)

    def who_to_follow(self, user: int, *, top_k: int = 20,
                      cot_size: int = 10, num_steps: int = 10_000,
                      num_walkers: int = 100, reset_prob: float = 0.3,
                      seed: int = 1, num_iterations: int = 2,
                      reset_prob_left: float = 0.1,
                      reset_prob_right: float = 0.1) -> pa.Table:
        """Per-request Who-To-Follow (Gupta et al., WWW'13 — the
        reference's production recommendation service, served here the way
        Twitter served it: from a resident in-memory graph). Circle of
        trust = the user's Monte-Carlo personalized-reputation top
        ``cot_size`` (``GraphUtils.scala:142-154`` semantics, resident walk
        CSRs so the request pays no load), then ``num_iterations`` rounds
        of personalized SALSA — the bipartite BSP seeded with the visit
        counts — over the circle's induced out-edges. Recommendations
        exclude the user and its current out-neighbors. Returns an Arrow
        ``(vertex, weight, contributors)`` table, score desc / vertex asc,
        limited to ``top_k``; ``contributors`` (top circle-of-trust
        endorsers per result) make each recommendation explainable —
        "because you follow X". The batch-gate analogue (exact PPR + the
        same flow, hash-checked vs SQL) is ``queries.q_graph_wtf``."""
        g = self.graph
        if not g.has_reverse:
            raise ValueError(
                "who_to_follow needs a server started with reverse_layout_dir")
        cot = self.personalized_reputation(
            user, num_steps=num_steps, reset_prob=reset_prob,
            num_walkers=num_walkers, seed=seed, top_k=cot_size)
        vs = cot["vertex"].to_numpy(zero_copy_only=False)
        ws = cot["visits"].to_numpy(zero_copy_only=False)
        left_init = {int(v): float(w) for v, w in zip(vs, ws) if w > 0}
        if not left_init:
            return pa.table({"vertex": pa.array([], pa.int64()),
                             "weight": pa.array([], pa.float64()),
                             "contributors": pa.array([], pa.list_(pa.int64()))})
        g._bila_run(left_init, num_iterations=num_iterations,
                    reset_prob_left=reset_prob_left,
                    reset_prob_right=reset_prob_right,
                    num_top_contributors=2)
        t = pa.concat_tables(
            ray.get([s.bila_side_table.remote("right") for s in g.shards]))
        # exclude the user and accounts it already follows (a user's
        # out-neighbor list is request-sized, never corpus-sized)
        rec = ray.get(g.shards[user % g.num_parts].point_query.remote(
            [user], True, None))[0]
        followed = np.array(
            sorted(set(rec["out_neighbors"]) | {user}) if rec else [user],
            dtype=np.int64)
        v = t["vertex"].to_numpy(zero_copy_only=False)
        keep = ~np.isin(v, followed)
        t = t.filter(pa.array(keep))
        v = t["vertex"].to_numpy(zero_copy_only=False)
        w = t["weight"].to_numpy(zero_copy_only=False)
        order = np.lexsort((v, -w))[:top_k]
        return t.take(pa.array(order, pa.int64()))

    def apply_delta(self, added: pa.Table | None = None,
                    removed: pa.Table | None = None) -> dict:
        """Live dynamic update of the SERVED graph — the batch analogue of
        the reference's concurrent dynamic graphs
        (``ConcurrentHashMapDynamicGraph.scala`` /
        ``SynchronizedDynamicGraph.scala``): apply ``(src, dst)`` edge
        add/remove tables to the on-disk layout via
        ``layout.update_edge_layout`` (rewrites ONLY the touched
        partitions; same semantics, including all-copies removal and the
        monotone vertex universe), then hot-reload exactly the touched
        shard actors in place — point lookups and walks see the new graph
        with no server restart and no full CSR rebuild. When the server
        holds a reverse layout, the SAME delta is applied to it (its
        manifest's ``reverse`` flag re-reverses the rows). Requests that
        arrive mid-update are serialized behind it by the actor mailbox.
        Returns the refreshed :meth:`info`."""
        import ray.data

        from cassovary_ray.layout import update_edge_layout

        g = self.graph
        P = g.num_parts
        parts: set[int] = set()

        def ds_of(tbl: pa.Table | None):
            if tbl is None or len(tbl) == 0:
                return None
            for col in ("src", "dst"):
                v = tbl[col].to_numpy(zero_copy_only=False)
                parts.update(int(p) for p in np.unique(v % P))
            return ray.data.from_arrow(tbl)

        a, r = ds_of(added), ds_of(removed)
        if a is None and r is None:
            return self.info()
        man = update_edge_layout(g.layout_dir, added_edges=a, removed_edges=r)
        if self.reverse_layout_dir is not None:
            a2 = ray.data.from_arrow(added) if added is not None and len(added) else None
            r2 = ray.data.from_arrow(removed) if removed is not None and len(removed) else None
            update_edge_layout(self.reverse_layout_dir, added_edges=a2,
                               removed_edges=r2)
        ray.get([g.shards[p].reload.remote(True) for p in sorted(parts)])
        counts = ray.get([s.counts.remote() for s in g.shards])
        g.n_edges = man["n_edges"]
        g.n_vertices = (man["n_vertices"] if man.get("n_vertices") is not None
                        else sum(c[0] for c in counts))
        g.n_dangling = sum(c[2] for c in counts)
        return self.info()

    def stop(self) -> None:
        self.graph.shutdown()


class GraphSession:
    """Client handle: point lookups routed shard-direct, walks via server."""

    def __init__(self, server, shards: list, num_parts: int):
        self._server = server
        self._shards = shards
        self._num_parts = num_parts

    # -- point lookups (Graph.scala:25 surface) ---------------------------

    def node(self, vertex_id: int, with_neighbors: bool = True,
             max_neighbors: int | None = None) -> dict | None:
        """getNodeById: None when absent, else
        ``{id, out_degree[, in_degree][, out_neighbors]}``."""
        s = self._shards[vertex_id % self._num_parts]
        return ray.get(s.point_query.remote(
            [vertex_id], with_neighbors, max_neighbors))[0]

    def exists(self, vertex_id: int) -> bool:
        return self.node(vertex_id, with_neighbors=False) is not None

    def neighbors(self, vertex_id: int,
                  max_neighbors: int | None = None) -> list[int] | None:
        rec = self.node(vertex_id, max_neighbors=max_neighbors)
        return None if rec is None else rec["out_neighbors"]

    def degree(self, vertex_id: int) -> int | None:
        rec = self.node(vertex_id, with_neighbors=False)
        return None if rec is None else rec["out_degree"]

    def nodes(self, vertex_ids: list[int], with_neighbors: bool = True) -> list:
        """Batched lookup: ids grouped per owning shard, one call each, and
        results restored to input order."""
        ids = np.asarray(vertex_ids, dtype=np.int64)
        part = ids % self._num_parts
        futs, slots = [], []
        for p in np.unique(part):
            sel = np.nonzero(part == p)[0]
            futs.append(self._shards[int(p)].point_query.remote(
                ids[sel], with_neighbors))
            slots.append(sel)
        out: list = [None] * len(ids)
        for sel, recs in zip(slots, ray.get(futs)):
            for i, rec in zip(sel, recs):
                out[int(i)] = rec
        return out

    # -- walk requests ------------------------------------------------------

    def info(self) -> dict:
        return ray.get(self._server.info.remote())

    def random_walks(self, starts, num_steps: int, **kw) -> pa.Table:
        return ray.get(self._server.random_walks.remote(starts, num_steps, **kw))

    def personalized_reputation(self, start, **kw) -> pa.Table:
        return ray.get(self._server.personalized_reputation.remote(start, **kw))

    def who_to_follow(self, user: int, **kw) -> pa.Table:
        """Per-request WTF recommendations (see ``GraphServer.who_to_follow``)."""
        return ray.get(self._server.who_to_follow.remote(user, **kw))

    def apply_delta(self, added: pa.Table | None = None,
                    removed: pa.Table | None = None) -> dict:
        """Live edge add/remove on the served graph (see
        ``GraphServer.apply_delta``); point lookups and walks issued after
        this returns see the updated graph."""
        return ray.get(self._server.apply_delta.remote(added, removed))

    def stop(self) -> None:
        """Shut the server and its shard actors down (terminates the named
        actor; a later :func:`connect` with the same name fails)."""
        ray.get(self._server.stop.remote())
        ray.kill(self._server)


def start(layout_dir: str, *, name: str = "default",
          reverse_layout_dir: str | None = None,
          detached: bool = True) -> GraphSession:
    """Start (or replace is an error — stop first) a named graph server and
    return a connected session. ``detached=True`` keeps the actor alive
    after this driver exits, so other processes on the cluster can
    :func:`connect` (the CassovaryServer deployment shape)."""
    server = GraphServer.options(
        name=name, namespace=NAMESPACE,
        lifetime="detached" if detached else None,
        num_cpus=0,
    ).remote(layout_dir, reverse_layout_dir)
    info = ray.get(server.info.remote())  # block until resident
    shards = ray.get(server.shard_handles.remote())
    return GraphSession(server, shards, info["num_parts"])


def connect(name: str = "default") -> GraphSession:
    """Attach to a running named graph server from any process connected to
    the same Ray cluster (``ray.init(address=<gcs>)`` first)."""
    server = ray.get_actor(name, namespace=NAMESPACE)
    info = ray.get(server.info.remote())
    shards = ray.get(server.shard_handles.remote())
    return GraphSession(server, shards, info["num_parts"])
