"""Generic queue-based traversers — the reference's ``QueueBasedTraverser``
family (``graph/Traverser.scala:150-618``), faithfully emulated.

This is the documented DRIVER-SIDE SMALL-GRAPH fallback: DFS (and exact
queue-order BFS with re-enqueue policies, colors, discovery/finish times) is
inherently sequential — the queue order IS the semantics — so there is no
distributed formulation that preserves it. The edge table is collected into
an adjacency dict behind an explicit ``max_edges`` guard; corpus-scale
traversals go through the distributed ops instead (``analytics.bfs`` for
depths, ``analytics.all_paths_visit_counts`` for AllPathsWalk counts,
``engine.ShardedGraph.random_walks`` for walks).

Semantics cloned (file:line cited per rule):

- colors Unenqueued/Enqueued/Visited, ``Traverser.scala:154-191``
- ``Walk.Limits`` maxDepth / maxNumEdgesThreshold / maxSteps with
  ``Limit.isLimitReached(v) = v >= limit``, ``:143-148, :202-205``
- enqueue: count toward numEnqueuedEver, color Enqueued, LIFO inserts at the
  front preserving order, FIFO appends, ``:344-361``
- chooseNodesToEnqueue: skip children entirely when the current node's depth
  or degree hits its limit; filter by the subclass enqueue policy; cap by
  remaining maxSteps budget, ``:316-339``
- depth = first-seen depth (``DepthTracker``, ``:401-415``)
- BFS: FIFO, enqueue only Unenqueued (``:434-449``); AllPathsWalk: FIFO,
  enqueue always (``:463-478``); DFS: LIFO, enqueue unless Visited, visited
  nodes found at the queue front are skipped (``:487-545``)
- discovery time = when first enqueued; finishing time = when the node,
  already Visited, resurfaces at the queue front and is skipped — tracked by
  NOT dequeuing before processing so a node sits beneath its children
  (``DiscoveryAndFinishTimeTracker``, ``:580-618``)

Divergence (documented): neighbor expansion order is ascending node id —
the reference iterates neighbors in input-file order, which a shuffled edge
table does not preserve.
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass

import numpy as np
import pyarrow as pa

UNENQUEUED, ENQUEUED, VISITED = 0, 1, 2


@dataclass(frozen=True)
class Limits:
    """``Walk.Limits`` (``Traverser.scala:202-205``)."""

    max_depth: int | None = None
    max_num_edges_thresh: int | None = None
    max_steps: int | None = None


def _limit_reached(value: int, limit: int | None) -> bool:
    return limit is not None and value >= limit


def collect_adjacency(edges, *, reverse: bool = False, max_edges: int = 5_000_000):
    """Edge Dataset → driver-side {src: sorted ndarray of dsts}. Guarded:
    raises beyond ``max_edges`` (use the distributed ops at scale)."""
    n = edges.count()
    if n > max_edges:
        raise ValueError(
            f"collect_adjacency: {n} edges > max_edges={max_edges}; driver-"
            "side traversal is the small-graph fallback — use analytics.bfs "
            "/ engine walks at scale"
        )
    adj: dict[int, list[int]] = {}
    a, b = ("dst", "src") if reverse else ("src", "dst")
    for batch in edges.select_columns([a, b]).iter_batches(batch_format="pyarrow"):
        for s, d in zip(batch[a].to_numpy(zero_copy_only=False),
                        batch[b].to_numpy(zero_copy_only=False)):
            adj.setdefault(int(s), []).append(int(d))
    return {k: np.unique(v) for k, v in adj.items()}


class QueueTraverser:
    """The generic engine; subclass knobs are constructor args."""

    def __init__(self, adj: dict[int, np.ndarray], home_node_ids: list[int], *,
                 lifo: bool = False, enqueue_policy: str = "unenqueued",
                 limits: Limits | None = None, skip_visited_in_queue: bool = False,
                 track_times: bool = False):
        self.adj = adj
        self.lifo = lifo
        self.policy = enqueue_policy  # 'unenqueued' | 'not_visited' | 'always'
        self.limits = limits or Limits()
        self.skip_visited = skip_visited_in_queue
        # time tracking keeps the node in the queue while visiting, so that
        # it resurfaces after its children for the finishing time (:604-609)
        self.dequeue_before = not track_times
        self.track_times = track_times
        self.queue: deque[int] = deque()
        self.color: dict[int, int] = {}
        self.depth: dict[int, int] = {}
        # PathLengthTracker (:553-570): next_visit_distance overwrites on
        # every enqueue; distance is latched from it when the node is visited
        self._next_dist: dict[int, int] = {}
        self.distance: dict[int, int] = {}
        self.discovery: dict[int, int] = {}
        self.finishing: dict[int, int] = {}
        self.visit_order: list[int] = []
        self.time = 0
        self.num_enqueued_ever = 0
        self.steps = 0
        self._enqueue(list(home_node_ids), None)

    def _neighbors(self, node: int) -> np.ndarray:
        return self.adj.get(node, np.empty(0, np.int64))

    def _should_enqueue(self, color: int) -> bool:
        if self.policy == "unenqueued":
            return color == UNENQUEUED
        if self.policy == "not_visited":
            return color != VISITED
        return True

    def _enqueue(self, nodes: list[int], from_node: int | None) -> None:
        if self.track_times:
            for n in nodes:
                if n not in self.discovery:
                    self.discovery[n] = self.time
                    self.time += 1
        from_depth = self.depth.get(from_node, -1) if from_node is not None else -1
        from_dist = self.distance.get(from_node, -1) if from_node is not None else -1
        for n in nodes:
            self.depth.setdefault(n, from_depth + 1)  # first-only (:404-410)
            self._next_dist[n] = from_dist + 1  # overwrite-latest (:558-563)
        self.num_enqueued_ever += len(nodes)
        for n in nodes:
            if self.color.get(n, UNENQUEUED) == UNENQUEUED:
                self.color[n] = ENQUEUED
        if self.lifo:
            for n in reversed(nodes):
                self.queue.appendleft(n)
        else:
            self.queue.extend(nodes)

    def _choose_children(self, node: int) -> list[int]:
        nbrs = self._neighbors(node)
        if _limit_reached(self.depth[node], self.limits.max_depth) or _limit_reached(
            len(nbrs), self.limits.max_num_edges_thresh
        ):
            return []
        out = [int(n) for n in nbrs
               if self._should_enqueue(self.color.get(int(n), UNENQUEUED))]
        if self.limits.max_steps is not None:  # limitAddedToQueue (:316-326)
            out = out[: max(0, self.limits.max_steps - self.num_enqueued_ever)]
        return out

    def _find_next(self) -> int | None:
        while self.queue:
            head = self.queue[0]
            if self.skip_visited and self.color.get(head) == VISITED:
                if self.track_times and head not in self.finishing:
                    self.finishing[head] = self.time
                    self.time += 1
                self.queue.popleft()
                continue
            return head
        return None

    def run(self):
        """Drain the iterator; returns self (visit_order/depth/times filled)."""
        while True:
            if _limit_reached(self.steps, self.limits.max_steps):
                return self
            nxt = self._find_next()
            if nxt is None:
                return self
            if self.dequeue_before:
                self.queue.popleft()
            self.visit_order.append(nxt)
            self.color[nxt] = VISITED
            self.distance.setdefault(nxt, self._next_dist.get(nxt, 0))  # :566-568
            self._enqueue(self._choose_children(nxt), nxt)
            self.steps += 1


def dfs(edges, sources: list[int], *, limits: Limits | None = None,
        track_times: bool = True, reverse: bool = False,
        max_edges: int = 5_000_000):
    """Depth-first traversal with discovery/finish times
    (``DepthFirstTraverser`` + ``DiscoveryAndFinishTimeTracker``,
    ``Traverser.scala:487-618``). Driver-side small-graph fallback (see
    module docstring). Returns
    ``pa.Table(vertex, order, depth, discovery, finish)`` in visit order;
    ``discovery``/``finish`` are -1 when not tracked / never finished
    (early ``max_steps`` stop). ``reverse=True`` traverses in-edges
    (``GraphDir.InDir``)."""
    adj = collect_adjacency(edges, reverse=reverse, max_edges=max_edges)
    t = QueueTraverser(
        adj, sources, lifo=True, enqueue_policy="not_visited",
        limits=limits, skip_visited_in_queue=True, track_times=track_times,
    ).run()
    if track_times:
        # drain trailing visited entries so their finishing times register
        t._find_next()
    verts = t.visit_order
    return pa.table({
        "vertex": pa.array(verts, pa.int64()),
        "order": pa.array(range(len(verts)), pa.int64()),
        "depth": pa.array([t.depth[v] for v in verts], pa.int64()),
        "distance": pa.array([t.distance[v] for v in verts], pa.int64()),
        "discovery": pa.array([t.discovery.get(v, -1) for v in verts], pa.int64()),
        "finish": pa.array([t.finishing.get(v, -1) for v in verts], pa.int64()),
    })


def bfs_exact(edges, sources: list[int], *, limits: Limits | None = None,
              max_edges: int = 5_000_000):
    """Exact queue-order BFS (``BreadthFirstTraverser``, ``:426-450``) —
    visit ORDER matters here; for plain depths at scale use
    ``analytics.bfs``. Returns ``pa.Table(vertex, order, depth)``."""
    adj = collect_adjacency(edges, max_edges=max_edges)
    t = QueueTraverser(adj, sources, lifo=False, enqueue_policy="unenqueued",
                       limits=limits).run()
    verts = t.visit_order
    return pa.table({
        "vertex": pa.array(verts, pa.int64()),
        "order": pa.array(range(len(verts)), pa.int64()),
        "depth": pa.array([t.depth[v] for v in verts], pa.int64()),
    })
