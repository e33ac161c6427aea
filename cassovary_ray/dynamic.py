"""Dynamic (mutable) directed graph — the Ray-Data-first analogue of the
reference's dynamic graph family (``ArrayBasedDynamicDirectedGraph.scala:
24-54``, ``SynchronizedDynamicGraph.scala``): ``addEdge`` / ``removeEdge``
with auto-created nodes, duplicate-add dedup and remove-of-absent no-op.

Design (SURVEY §1.4's append story, realized): mutations are an **edge log**
— append-only batches of ``(src, dst, seq, op)`` rows (op 1 = add,
0 = remove) — and the current edge set is a **compaction**: group by
``(src, dst)``, latest seq wins, keep rows whose latest op is add.  The
compaction is a single hash-partitioned groupby expressed with two max
aggregates (no per-group Python):

    edge exists  ⇔  max(seq | op=add)  ==  max(seq)

At 100 TB the log lives as partitioned parquet appends (one file per
mutation batch via :meth:`checkpoint_log`); compaction streams through one
shuffle keyed the same way as the static layout, so a compacted snapshot
feeds ``layout.build_edge_layout`` / ``ShardedGraph`` directly.  This is
deliberately NOT the reference's per-node concurrent ArrayBuffer design —
a mutable shared heap does not exist on a cluster; a log + compaction is
the distributed equivalent with the same observable semantics.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

import ray.data
from ray.data.aggregate import Max


def _mutation_table(pairs, seq: int, op: int) -> pa.Table:
    arr = np.asarray(list(pairs), dtype=np.int64)
    if arr.size == 0:
        arr = arr.reshape(0, 2)
    if arr.ndim != 2 or arr.shape[1] != 2:
        raise ValueError("edge pairs must be (src, dst) 2-tuples")
    n = len(arr)
    return pa.table({
        "src": pa.array(arr[:, 0], pa.int64()),
        "dst": pa.array(arr[:, 1], pa.int64()),
        "seq": pa.array(np.full(n, seq, np.int64)),
        "op": pa.array(np.full(n, op, np.int64)),
    })


class DynamicDirectedGraph:
    """Mutable directed graph over an edge log.

    ``base_edges`` (optional ``Dataset(src, dst)``) seeds the log at seq 0 as
    adds.  Each :meth:`add_edges` / :meth:`remove_edges` call appends one
    log batch with the next sequence number; within one call duplicates are
    harmless (same (src,dst,seq,op) rows compact to one edge).  Semantics
    match ``ArrayBasedDynamicDirectedGraph``:

    - adding an existing edge is a no-op (``addEdge`` dedup, ``:37-42``)
    - removing an absent edge is a no-op (``removeEdge``, ``:44-49``)
    - nodes exist iff they appear as an endpoint of a live edge, plus any
      explicitly added via :meth:`add_nodes` (``getOrCreateNode``)
    """

    def __init__(self, base_edges=None):
        self._log_batches: list[pa.Table] = []
        self._log_datasets: list = []
        self._extra_nodes: set[int] = set()
        self._seq = 0
        if base_edges is not None:
            self._log_datasets.append(
                base_edges.map_batches(
                    lambda t: t.select(["src", "dst"])
                    .append_column("seq", pa.array(np.zeros(len(t), np.int64)))
                    .append_column("op", pa.array(np.ones(len(t), np.int64))),
                    batch_format="pyarrow",
                )
            )
        self._seq = 1

    # -- mutation ----------------------------------------------------------

    def add_edges(self, pairs) -> None:
        self._log_batches.append(_mutation_table(pairs, self._seq, 1))
        self._seq += 1

    def remove_edges(self, pairs) -> None:
        self._log_batches.append(_mutation_table(pairs, self._seq, 0))
        self._seq += 1

    def add_nodes(self, node_ids) -> None:
        """Explicitly materialized (possibly isolated) nodes
        (``getOrCreateNode``)."""
        self._extra_nodes.update(int(v) for v in node_ids)

    # -- log persistence (the 100 TB path) -----------------------------------

    def checkpoint_log(self, log_dir: str) -> int:
        """Append the in-memory mutation batches as one parquet file per
        batch under ``log_dir`` (atomic rename), then drop them from memory.
        Returns the number of files written."""
        os.makedirs(log_dir, exist_ok=True)
        wrote = 0
        for t in self._log_batches:
            if len(t) == 0:
                continue
            seq = int(t["seq"][0].as_py())
            path = os.path.join(log_dir, f"mutations-{seq:09d}.parquet")
            pq.write_table(t, path + ".tmp")
            os.replace(path + ".tmp", path)
            wrote += 1
        if wrote:
            self._log_datasets.append(
                ray.data.read_parquet(os.path.join(log_dir))
            )
        self._log_batches.clear()
        return wrote

    @classmethod
    def from_log(cls, log_dir: str) -> "DynamicDirectedGraph":
        g = cls()
        g._log_datasets.append(ray.data.read_parquet(log_dir))
        names = sorted(os.listdir(log_dir))
        if names:
            g._seq = int(names[-1].split("-")[1].split(".")[0]) + 1
        return g

    # -- views ---------------------------------------------------------------

    def _log_dataset(self):
        parts = list(self._log_datasets)
        live = [t for t in self._log_batches if len(t)]
        if live:
            parts.append(ray.data.from_arrow(live))
        if not parts:
            return ray.data.from_arrow(_mutation_table([], 0, 1))
        ds = parts[0]
        for p in parts[1:]:
            ds = ds.union(p)
        return ds

    def edges(self):
        """Compacted current edge set → ``Dataset(src, dst)`` (one shuffle)."""
        log = self._log_dataset()

        def tag(t: pa.Table) -> pa.Table:
            seq = t["seq"].to_numpy(zero_copy_only=False)
            op = t["op"].to_numpy(zero_copy_only=False)
            add_seq = np.where(op == 1, seq, np.int64(-1))
            return pa.table({"src": t["src"], "dst": t["dst"],
                             "seq": t["seq"],
                             "add_seq": pa.array(add_seq, pa.int64())})

        agg = (
            log.map_batches(tag, batch_format="pyarrow")
            .groupby(["src", "dst"])
            .aggregate(Max("seq", alias_name="last"),
                       Max("add_seq", alias_name="last_add"))
        )

        def alive(t: pa.Table) -> pa.Table:
            keep = (t["last_add"].to_numpy(zero_copy_only=False)
                    == t["last"].to_numpy(zero_copy_only=False))
            return pa.table({"src": t["src"].filter(pa.array(keep)),
                             "dst": t["dst"].filter(pa.array(keep))})

        return agg.map_batches(alive, batch_format="pyarrow")

    def nodes(self):
        """``Dataset(vertex)`` — endpoints of live edges ∪ explicit nodes."""
        from ray.data.aggregate import Count

        e = self.edges()
        v = (
            e.select_columns(["src"]).rename_columns({"src": "vertex"})
            .union(e.select_columns(["dst"]).rename_columns({"dst": "vertex"}))
            .groupby("vertex").aggregate(Count(alias_name="_c"))
            .select_columns(["vertex"])
        )
        if self._extra_nodes:
            v = v.union(ray.data.from_arrow(pa.table({
                "vertex": pa.array(sorted(self._extra_nodes), pa.int64())})))
            v = (v.groupby("vertex")
                 .aggregate(Count(alias_name="_c")).select_columns(["vertex"]))
        return v

    def edge_count(self) -> int:
        return self.edges().count()

    def node_count(self) -> int:
        return self.nodes().count()
