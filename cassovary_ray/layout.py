"""Hash-partitioned edge-table layout — the on-disk graph representation.

The reference's physical layouts are all single-heap CSR variants
(``graph/SharedArrayBasedDirectedGraph.scala:22-28`` — 256 shards keyed by
``id & 255``; ``graph/MemoryMappedDirectedGraph.scala:35-46`` — one binary
file). Our layout is the distributed analogue: the edge table written as
**hash-partitioned Parquet** (``part = src % P``, mirroring
``HashSourceMapper``, ``graph/distributed/Partitioner.scala:41-43``), plus a
vertex-universe table partitioned the same way. Each partition is read by
exactly one :class:`cassovary_ray.engine.GraphShard` actor, which builds its
in-memory CSR from it — deterministically, so a lost actor or a resumed run
rebuilds identical state from the layout alone.

Writing the layout is the build-time shuffle (SURVEY §2.4): one pass over the
edges for the partition assignment + parquet write, one ``groupby`` to derive
the vertex universe (the ``markEmptyNodes`` equivalent,
``ArrayBasedDirectedGraph.scala:225-243``). Everything downstream (PageRank /
WCC / LP / HITS rounds) re-reads only its own partition directory.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ray.data.aggregate import Count

MANIFEST_NAME = "layout.json"


def _add_part_src(batch: pa.Table, num_parts: int) -> pa.Table:
    src = batch["src"].to_numpy(zero_copy_only=False)
    part = (src % num_parts).astype(np.int64)
    return batch.append_column("part", pa.array(part, pa.int64()))


def _undirect(batch: pa.Table) -> pa.Table:
    """Edge batch → batch ∪ reversed batch (weak-direction view for WCC/LP)."""
    fwd = batch.select(["src", "dst"])
    rev = pa.table({"src": batch["dst"], "dst": batch["src"]})
    return pa.concat_tables([fwd, rev])


def _drop_self_loops(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))


def build_edge_layout(
    edges_ds,
    layout_dir: str,
    num_parts: int,
    *,
    vertices_ds=None,
    undirected: bool = False,
    dedup: bool = False,
    drop_self_loops: bool = False,
    reverse: bool = False,
    weighted: bool = False,
) -> dict:
    """Write the partitioned graph layout and return its manifest.

    Args:
        edges_ds: ``Dataset(src: int64, dst: int64)``.
        layout_dir: output directory (``edges/`` + ``vertices/`` + manifest).
        num_parts: partition count P; one CSR shard actor per partition.
        vertices_ds: optional ``Dataset(vertex: int64)`` of explicit vertices
            (e.g. crawled pages with no out-links); unioned with edge
            endpoints — the ``createEmptyNodes`` semantics
            (``ArrayBasedDirectedGraph.scala:267-281``).
        undirected: also store each edge reversed (weak-direction view).
        dedup: drop exact duplicate (src, dst) rows (opt-in, mirroring
            ``ListOfEdgesGraphReader.prepareEdges``, ``:176-189``).
        drop_self_loops: drop src == dst rows.
        reverse: swap src/dst before anything else (the reference's
            ``StoredGraphDir.OnlyIn`` view of a graph — SURVEY §1.1).
        weighted: ``edges_ds`` carries a strictly-positive ``weight: double``
            column, stored alongside (src, dst) and loaded into the CSR
            shards (weighted PageRank / weighted sum-scatters). Beyond the
            reference (Cassovary graphs are unweighted); not combinable with
            ``undirected``/``dedup`` (collapsing duplicates would need a
            weight-combine policy the caller should apply upstream instead).
    """
    import shutil

    edges_dir = os.path.join(layout_dir, "edges")
    verts_dir = os.path.join(layout_dir, "vertices")
    # rebuilding into a dir with leftover part files would silently double
    # the graph (parquet writers append new files) — clear first.
    for d in (edges_dir, verts_dir):
        shutil.rmtree(d, ignore_errors=True)
    os.makedirs(layout_dir, exist_ok=True)

    if weighted and (undirected or dedup):
        raise ValueError("weighted layouts don't support undirected/dedup; "
                         "combine weights upstream")

    ds = edges_ds
    if weighted:
        ds = ds.map_batches(
            lambda b: pa.table({"src": b["src"], "dst": b["dst"],
                                "weight": b["weight"].cast(pa.float64())}),
            batch_format="pyarrow",
        )
    if reverse:
        cols = (lambda b: {"src": b["dst"], "dst": b["src"], "weight": b["weight"]}) \
            if weighted else (lambda b: {"src": b["dst"], "dst": b["src"]})
        ds = ds.map_batches(
            lambda b: pa.table(cols(b)), batch_format="pyarrow"
        )
    if drop_self_loops:
        ds = ds.map_batches(_drop_self_loops, batch_format="pyarrow")
    if undirected:
        ds = ds.map_batches(_undirect, batch_format="pyarrow")
    if dedup:
        # exact dedup = groupby both key columns, emit one row per group.
        ds = ds.groupby(["src", "dst"]).aggregate(Count(alias_name="_c")).select_columns(["src", "dst"])

    ds = ds.map_batches(lambda b: _add_part_src(b, num_parts), batch_format="pyarrow")
    # cluster by part before the partitioned write: without it every write
    # task emits one small file into EVERY part dir (O(tasks × P) tiny files;
    # 8.5k files for 100M edges — shard loads were dominated by file-open
    # churn). After the sort each dir holds a handful of large files.
    ds = ds.sort("part")
    ds.write_parquet(edges_dir, partition_cols=["part"], min_rows_per_file=1 << 21)
    _ensure_nonempty(edges_dir, ["src", "dst"],
                     float_cols=["weight"] if weighted else None)

    # vertex universe = src ∪ dst ∪ explicit, hash-partitioned. No global
    # distinct: each batch emits its LOCAL unique endpoints (per-batch
    # combiner), the hive-partitioned write is the shuffle, and each CSR
    # shard dedups its own partition at load (np.unique) — the
    # markEmptyNodes shuffle without a groupby.
    import ray.data

    def endpoints(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        v = np.unique(np.concatenate([s, d]))
        return pa.table({"vertex": pa.array(v, pa.int64()),
                         "part": pa.array(v % num_parts, pa.int64())})

    vds = ray.data.read_parquet(edges_dir, columns=["src", "dst"]).map_batches(
        endpoints, batch_format="pyarrow", batch_size=1 << 22
    )
    vds = vds.sort("part")
    vds.write_parquet(verts_dir, partition_cols=["part"], min_rows_per_file=1 << 21)
    if vertices_ds is not None:
        vertices_ds.select_columns(["vertex"]).map_batches(
            lambda b: pa.table({
                "vertex": b["vertex"],
                "part": pa.array(
                    b["vertex"].to_numpy(zero_copy_only=False) % num_parts, pa.int64()
                ),
            }),
            batch_format="pyarrow",
        ).write_parquet(verts_dir, partition_cols=["part"])
    _ensure_nonempty(verts_dir, ["vertex"])

    n_edges = ray.data.read_parquet(edges_dir, columns=["src"]).count()
    manifest = {
        "num_parts": num_parts,
        # distinct vertex count is shard-local knowledge; ShardedGraph sums
        # it at construction (avoids a global distinct here)
        "n_vertices": None,
        "n_edges": int(n_edges),
        "undirected": undirected,
        "dedup": dedup,
        "drop_self_loops": drop_self_loops,
        "reverse": reverse,
        "weighted": weighted,
    }
    tmp = os.path.join(layout_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=1)
    os.replace(tmp, os.path.join(layout_dir, MANIFEST_NAME))
    return manifest


def _ensure_nonempty(table_dir: str, int_cols: list[str],
                     float_cols: list[str] | None = None) -> None:
    """A Dataset with zero rows writes no files at all; materialize an empty
    hive partition so readers see a valid (empty) table instead of ENOENT."""
    import pyarrow.parquet as pq

    if not os.path.isdir(table_dir) or not os.listdir(table_dir):
        part_dir = os.path.join(table_dir, "part=0")
        os.makedirs(part_dir, exist_ok=True)
        cols = {c: pa.array([], pa.int64()) for c in int_cols}
        cols.update({c: pa.array([], pa.float64()) for c in (float_cols or [])})
        empty = pa.table(cols)
        pq.write_table(empty, os.path.join(part_dir, "empty.parquet"))


def read_layout_manifest(layout_dir: str) -> dict:
    with open(os.path.join(layout_dir, MANIFEST_NAME)) as f:
        return json.load(f)


def read_partition(layout_dir: str, table: str, part: int, columns: list[str]) -> pa.Table:
    """Read one hash-partition of a layout table.

    Reads the ``part=<p>/`` subdirectory directly instead of opening the
    whole hive dataset with a filter: dataset-level discovery scans metadata
    of EVERY partition's files, and with P actors doing it concurrently the
    CSR load was O(P × total files) (114 s for 100M edges at P=32; ~4 s this
    way)."""
    import pyarrow.dataset as pads

    sub = os.path.join(layout_dir, table, f"part={part}")
    if not os.path.isdir(sub):
        return pa.table({c: pa.array([], pa.int64()) for c in columns})
    return pads.dataset(sub).to_table(columns=columns)
