"""Named ``InfoKeeper`` / ``NodeTourist`` API — the reference's per-node
info-recording surface (``graph/tourist/InfoKeeper.scala:22-63``,
``NodeTourist.scala``, ``VisitsCounter.scala``, ``PrevNbrCounter.scala``,
``PathsCounter.scala``) as small typed wrappers, so a user porting a custom
tourist has the extension point by name instead of re-deriving the groupby
idioms.

Scope note (SURVEY §2.7): these keepers are DRIVER-SIDE accumulators, same
as the reference's (one JVM heap there, one driver process here) — they are
the right tool for walk/traversal outputs, which are already bounded by the
walk budget, NOT for corpus-scale per-vertex state (that lives in shard
actors / Datasets). Each distributed walk output has a ``from_walk*``
bridge that fills the keeper from the engine's tables, so reference-style
code (``infoOfNode`` / ``infoAllNodes``) works over a distributed run:

    with ShardedGraph(lay) as g:
        visits = VisitsCounter.from_walk(g.random_walks([0] * 64, 50))
        visits.info_of_node(7)          # Optional[int], reference API
        visits.info_all_nodes()         # {id: count}, count desc / id asc
"""

from __future__ import annotations


class InfoKeeper:
    """Per-node info map with optional first-write-wins
    (``InfoKeeper.scala:22-63``). ``only_once=True`` keeps only the FIRST
    info recorded per node (``onlyOnce``, ``:29``)."""

    #: subclasses may pin a python type for the info values
    info_type: type | None = None

    def __init__(self, only_once: bool = False):
        self.only_once = only_once
        self._info: dict[int, object] = {}

    def record_info(self, node_id: int, info) -> None:
        """Record ``info`` for ``node_id`` (``recordInfo``, ``:34-38``)."""
        if self.info_type is not None and not isinstance(info, self.info_type):
            raise TypeError(
                f"{type(self).__name__} records {self.info_type.__name__}, "
                f"got {type(info).__name__}")
        if not (self.only_once and node_id in self._info):
            self._info[node_id] = info

    def info_of_node(self, node_id: int):
        """Info for one node, or None (``infoOfNode``, ``:43-45``)."""
        return self._info.get(node_id)

    def info_all_nodes(self) -> dict:
        """All recorded info (``infoAllNodes``, ``:62``); insertion order."""
        return dict(self._info)

    def clear(self) -> None:
        self._info.clear()


class IntInfoKeeper(InfoKeeper):
    """Int-typed keeper (``IntInfoKeeper.scala``)."""

    info_type = int


class BoolInfoKeeper(InfoKeeper):
    """Bool-typed keeper (``BoolInfoKeeper.scala``)."""

    info_type = bool


class NodeTourist:
    """Visit protocol (``NodeTourist.scala``)."""

    def visit(self, node_id: int) -> None:
        raise NotImplementedError

    def visit_all(self, node_ids) -> None:
        for n in node_ids:
            self.visit(n)


class VisitsCounter(IntInfoKeeper, NodeTourist):
    """Visit counts per node (``VisitsCounter.scala``): ``visit`` increments;
    ``info_all_nodes`` is sorted by count desc, node id asc on ties
    (``VisitsComparator``, ``VisitsCounter.scala:48-76``)."""

    def __init__(self):
        super().__init__(only_once=False)

    def visit(self, node_id: int) -> None:
        self._info[node_id] = self._info.get(node_id, 0) + 1

    def info_all_nodes(self) -> dict[int, int]:
        return dict(sorted(self._info.items(), key=lambda kv: (-kv[1], kv[0])))

    @classmethod
    def from_walk(cls, visits) -> "VisitsCounter":
        """Fill from the engine's distributed walk output
        (``ShardedGraph.random_walks`` → Dataset/Table (vertex, visits))."""
        vc = cls()
        for row in _iter_rows(visits):
            vc._info[int(row["vertex"])] = int(row["visits"])
        return vc


class PrevNbrCounter(InfoKeeper):
    """Count of each previous neighbor preceding a visit per node
    (``PrevNbrCounter.scala``). ``num_top`` bounds the per-node map returned
    by ``info_of_node`` / ``info_all_nodes`` (count desc, lower nbr id on
    ties, ``PrevNbrComparator``); ``only_once`` freezes a node's map after
    its first recorded neighbor (``:37-41``)."""

    def __init__(self, num_top: int | None = None, only_once: bool = False):
        super().__init__(only_once=only_once)
        self.num_top = num_top

    def record_info(self, node_id: int, info) -> None:
        raise NotImplementedError(
            "use record_previous_neighbor (PrevNbrCounter.scala:30-32)")

    def record_previous_neighbor(self, node_id: int, nbr_id: int) -> None:
        if self.only_once and node_id in self._info:
            return
        m = self._info.setdefault(node_id, {})
        m[nbr_id] = m.get(nbr_id, 0) + 1

    def _top(self, m: dict[int, int]) -> dict[int, int]:
        items = sorted(m.items(), key=lambda kv: (-kv[1], kv[0]))
        if self.num_top is not None:
            items = items[: self.num_top]
        return dict(items)

    def info_of_node(self, node_id: int):
        m = self._info.get(node_id)
        return None if m is None else self._top(m)

    def info_all_nodes(self) -> dict[int, dict[int, int]]:
        return {n: self._top(m) for n, m in self._info.items()}

    @classmethod
    def from_walk(cls, prev_counts, num_top: int | None = None) -> "PrevNbrCounter":
        """Fill from ``ShardedGraph.walk_prev_neighbor_counts()``
        (Dataset/Table (vertex, prev, count))."""
        pc = cls(num_top=num_top)
        for row in _iter_rows(prev_counts):
            m = pc._info.setdefault(int(row["vertex"]), {})
            m[int(row["prev"])] = int(row["count"])
        return pc


class PathsCounter(NodeTourist, InfoKeeper):
    """Count of distinct paths (since the last home-node visit) ending at
    each visited node (``PathsCounter.scala`` + ``DirectedPathCollection``):
    visiting a home node resets the current path; every visit appends the
    node and counts the current path snapshot against it. ``info_of_node``
    returns at most ``num_top`` paths, count desc, SHORTER path first on
    ties (``DirectedPathCollection.topPathsTill`` doc), lexicographic path
    as the final deterministic tie-break (the engine's
    ``walk_top_paths_table`` order)."""

    def __init__(self, num_top: int = 0, home_node_ids=()):
        super().__init__(only_once=False)
        self.num_top = num_top
        self.home_node_ids = set(home_node_ids)
        self._cur: list[int] = []

    def record_info(self, node_id: int, info) -> None:
        raise NotImplementedError("use visit (PathsCounter.scala:24-27)")

    def visit(self, node_id: int) -> None:
        if node_id in self.home_node_ids:
            self._cur = []
        self._cur.append(node_id)
        m = self._info.setdefault(node_id, {})
        snap = tuple(self._cur)
        m[snap] = m.get(snap, 0) + 1

    def _top(self, m: dict[tuple, int]) -> dict[tuple, int]:
        items = sorted(m.items(), key=lambda kv: (-kv[1], len(kv[0]), kv[0]))
        return dict(items[: self.num_top])

    def info_of_node(self, node_id: int):
        m = self._info.get(node_id)
        return None if m is None else self._top(m)

    def info_all_nodes(self) -> dict[int, dict[tuple, int]]:
        return {n: self._top(m) for n, m in self._info.items()}

    def clear(self) -> None:
        super().clear()
        self._cur = []

    @classmethod
    def from_walk(cls, top_paths, num_top: int = 2) -> "PathsCounter":
        """Fill from ``ShardedGraph.walk_top_paths(top_k)``
        (Dataset/Table (vertex, path, count))."""
        pc = cls(num_top=num_top)
        for row in _iter_rows(top_paths):
            m = pc._info.setdefault(int(row["vertex"]), {})
            m[tuple(int(x) for x in row["path"])] = int(row["count"])
        return pc


def _iter_rows(table_or_ds):
    """Rows of a pyarrow Table or a (small, walk-sized) ray Dataset."""
    import pyarrow as pa

    if isinstance(table_or_ds, pa.Table):
        return table_or_ds.to_pylist()
    return table_or_ds.iter_rows()
