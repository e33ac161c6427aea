"""Cassovary-compatible text graph formats → Ray Datasets, and back.

Formats (cloned from the reference readers/writers, SURVEY §2.1/2.2):

- **adjacency**: per node, a header line ``<id><sep><out-count>`` followed by
  ``out-count`` neighbor lines (``util/io/AdjacencyListGraphReader.scala:60-129``;
  ``reverseParseNode`` at ``:116-120``). Multi-line records → each part FILE
  is the unit of parallelism (one parse task per file, exactly the
  reference's one-shard-per-file model, ``GraphReaderFromDirectory.scala:23-46``).
- **list-of-edges**: one ``src<sep>dst`` line per edge
  (``util/io/ListOfEdgesGraphReader.scala:63-226``); ``#`` comment lines
  skipped (``FileReader.scala:52``); line-parallel.
- **node labels**: ``<id><sep><value>`` lines, int or string values
  (``util/io/LabelsReader.scala:22-91``).

External ids may be int, long or string; string ids are mapped through the
stable 63-bit hash (replacing ``SequentialNodeNumberer`` — no global dense
renumber, SURVEY §1.4). gzip part files are handled transparently
(``isGzip`` flag in the reference).

Malformed-line policy mirrors ``FileReader.scala:55-58``: raise with the
offending line.
"""

from __future__ import annotations

import gzip
import os

import numpy as np
import pyarrow as pa

import ray.data

from cassovary_ray.hashing import hash64


def _open_bytes(data: bytes, path: str) -> str:
    # detect by magic bytes, not extension: Ray's read_binary_files may have
    # already decompressed a .gz via the Arrow filesystem layer
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data.decode("utf-8")


def _id_parser(id_type: str):
    if id_type in ("int", "long"):
        return int
    if id_type == "string":
        return lambda s: hash64(s)
    raise ValueError(f"unsupported id type {id_type!r} (reader supports int/long/string)")


def read_adjacency_graph(directory: str, prefix: str = "", *, separator: str = " ",
                         id_type: str = "int"):
    """Adjacency-format directory → ``Dataset(src: int64, dst: int64)``.

    One parse task per ``prefix*`` part file (files are the shards). Nodes
    with 0 out-edges yield no edge rows — recover them via
    :func:`read_adjacency_vertices` when the vertex universe matters.
    """
    paths = sorted(
        os.path.join(directory, f) for f in os.listdir(directory) if f.startswith(prefix)
    )
    parse_id = _id_parser(id_type)

    def parse(batch: dict) -> pa.Table:
        srcs, dsts = [], []
        for path, data in zip(batch["path"], batch["bytes"]):
            lines = _open_bytes(bytes(data), str(path)).splitlines()
            i = 0
            while i < len(lines):
                line = lines[i].strip()
                i += 1
                if not line or line.startswith("#"):
                    continue
                try:
                    head, cnt_s = line.split(separator)
                    node, cnt = parse_id(head), int(cnt_s)
                except ValueError as exc:
                    raise OSError(f"malformed adjacency header {line!r} in {path}") from exc
                for k in range(cnt):
                    nbr = lines[i].strip()
                    i += 1
                    srcs.append(node)
                    dsts.append(parse_id(nbr))
        return pa.table({"src": pa.array(srcs, pa.int64()), "dst": pa.array(dsts, pa.int64())})

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="numpy"
    )


def read_adjacency_vertices(directory: str, prefix: str = "", *, separator: str = " ",
                            id_type: str = "int"):
    """All node ids that appear as adjacency headers (explicit nodes,
    including 0-out-degree ones) → ``Dataset(vertex: int64)``."""
    paths = sorted(
        os.path.join(directory, f) for f in os.listdir(directory) if f.startswith(prefix)
    )
    parse_id = _id_parser(id_type)

    def parse(batch: dict) -> pa.Table:
        verts = []
        for path, data in zip(batch["path"], batch["bytes"]):
            lines = _open_bytes(bytes(data), str(path)).splitlines()
            i = 0
            while i < len(lines):
                line = lines[i].strip()
                i += 1
                if not line or line.startswith("#"):
                    continue
                head, cnt_s = line.split(separator)
                verts.append(parse_id(head))
                i += int(cnt_s)
        return pa.table({"vertex": pa.array(verts, pa.int64())})

    return ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="numpy"
    )


def read_edge_list(path_or_dir: str, *, separator: str = " ", id_type: str = "int",
                   remove_duplicates: bool = False):
    """List-of-edges file(s) → ``Dataset(src, dst)``; ``#`` comments skipped;
    optional exact dedup (``prepareEdges`` removeDuplicates,
    ``ListOfEdgesGraphReader.scala:176-189``)."""
    parse_id = _id_parser(id_type)
    paths = [path_or_dir]
    if os.path.isdir(path_or_dir):
        paths = sorted(os.path.join(path_or_dir, f) for f in os.listdir(path_or_dir))

    def parse(batch: dict) -> pa.Table:
        srcs, dsts = [], []
        for path, data in zip(batch["path"], batch["bytes"]):
            for ln, line in enumerate(_open_bytes(bytes(data), str(path)).splitlines(), 1):
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                try:
                    a, b = line.split(separator)
                except ValueError as exc:
                    raise OSError(f"malformed edge line {ln} {line!r} in {path}") from exc
                srcs.append(parse_id(a))
                dsts.append(parse_id(b))
        return pa.table({"src": pa.array(srcs, pa.int64()), "dst": pa.array(dsts, pa.int64())})

    ds = ray.data.read_binary_files(paths, include_paths=True).map_batches(
        parse, batch_format="numpy"
    )
    if remove_duplicates:
        from cassovary_ray.analytics import distinct_edges

        ds = distinct_edges(ds)
    return ds


def read_node_labels(path: str, *, separator: str = " ", value_type: str = "int"):
    """``<id><sep><value>`` label file → ``Dataset(vertex: int64, label)``.

    Int labels stay int64; string labels become a ``large_string`` column
    (only Int and String are supported, ``LabelsReader.scala:32-35``).
    """
    if value_type not in ("int", "string"):
        raise ValueError("labels support only int and string values")

    def parse(batch: dict) -> pa.Table:
        ids, vals = [], []
        for p, data in zip(batch["path"], batch["bytes"]):
            for line in _open_bytes(bytes(data), str(p)).splitlines():
                line = line.strip()
                if not line or line.startswith("#"):
                    continue
                a, b = line.split(separator, 1)
                ids.append(int(a))
                vals.append(int(b) if value_type == "int" else b)
        label = pa.array(vals, pa.int64() if value_type == "int" else pa.string())
        return pa.table({"vertex": pa.array(ids, pa.int64()), "label": label})

    return ray.data.read_binary_files([path], include_paths=True).map_batches(
        parse, batch_format="numpy"
    )


# ---------------------------------------------------------------------------
# writers (GraphWriter.writeDirectedGraph, util/io/GraphWriter.scala:23-69)
# ---------------------------------------------------------------------------


def _write_text_parts(text_ds, directory: str, prefix: str) -> str:
    """Write a Dataset with a ``text`` column as raw ``<prefix>-*.txt`` part
    files, one per task (a CSV sink would quote embedded separators/newlines
    and corrupt the format). N writers = N blocks, mirroring
    ``GraphWriter.chunks`` (``GraphWriter.scala:54-67``)."""
    import uuid

    os.makedirs(directory, exist_ok=True)

    def write(batch: pa.Table) -> pa.Table:
        if len(batch):
            name = f"{prefix}-{uuid.uuid4().hex}.txt"
            tmp = os.path.join(directory, "." + name + ".tmp")
            with open(tmp, "w") as f:
                for line in batch["text"].to_pylist():
                    f.write(line)
                    f.write("\n")
            os.replace(tmp, os.path.join(directory, name))
        return pa.table({"written": pa.array([len(batch)], pa.int64())})

    text_ds.map_batches(write, batch_format="pyarrow").materialize()
    return directory


def write_edge_list(edges, directory: str, *, separator: str = " "):
    """Edge table → edge-list text part files — ``GraphWriter`` edge-list
    form (``GraphWriter.scala:34-38``)."""

    def fmt(batch: pa.Table) -> pa.Table:
        s = batch["src"].to_numpy(zero_copy_only=False)
        d = batch["dst"].to_numpy(zero_copy_only=False)
        lines = [f"{a}{separator}{b}" for a, b in zip(s, d)]
        return pa.table({"text": pa.array(lines, pa.string())})

    return _write_text_parts(
        edges.map_batches(fmt, batch_format="pyarrow"), directory, "edges"
    )


def write_adjacency(edges, directory: str, *, separator: str = " "):
    """Edge table → adjacency-format part files (grouped by src; the
    ``reverseParseNode`` layout ``id<sep>count\\n<nbr>\\n...``,
    ``AdjacencyListGraphReader.scala:116-120``); round-trips through
    :func:`read_adjacency_graph`.

    Grouping runs through :func:`analytics.adjacency_lists` (sort + per-block
    vectorized segment fold — no per-vertex ``map_groups``); only the final
    text formatting is per-row."""
    from cassovary_ray.analytics import adjacency_lists

    def fmt(batch: pa.Table) -> pa.Table:
        srcs = batch["src"].to_numpy(zero_copy_only=False)
        lines = [
            f"{s}{separator}{len(nbrs)}\n" + "\n".join(str(n) for n in nbrs)
            for s, nbrs in zip(srcs, batch["neighbors"].to_pylist())
        ]
        return pa.table({"text": pa.array(lines, pa.string())})

    return _write_text_parts(
        adjacency_lists(edges).map_batches(fmt, batch_format="pyarrow"),
        directory,
        "adj",
    )


# ---------------------------------------------------------------------------
# Cassovary binary CSR (MemoryMappedDirectedGraph) interop
# ---------------------------------------------------------------------------


def write_mmap_graph(edges, path: str, *, n_nodes: int | None = None) -> int:
    """Write the Cassovary ``MemoryMappedDirectedGraph`` binary file
    (format spec ``graph/MemoryMappedDirectedGraph.scala:35-46``, writer
    ``graphToFile`` ``:91-129``): exactly ``16 + 16·(n+1) + 8·m`` bytes —
    8 reserved + 8 node count, then (n+1) big-endian int64 byte-offsets
    into the out-neighbor data, (n+1) offsets into the in-neighbor data,
    then the out- and in-neighbor int32 id streams, both in sequential
    node order, neighbors sorted ascending per node. Ids must be dense
    ``0..n-1`` with ``n < 2^31`` (the reference's nodeCount==maxNodeId+1
    rule; gaps become implicit empty nodes).

    Interop utility for JVM consumers — the file is a single blob by
    definition, so this collects the edge table to the driver; the
    at-scale shard format remains the partitioned parquet layout + npz CSR
    cache. ``edges`` is a ``Dataset(src, dst)`` or an ``(src, dst)`` numpy
    pair. Returns ``n``."""
    if isinstance(edges, tuple):
        src, dst = (np.asarray(a, dtype=np.int64) for a in edges)
    else:
        df = edges.select_columns(["src", "dst"]).to_pandas()
        src = df["src"].to_numpy(np.int64)
        dst = df["dst"].to_numpy(np.int64)
    if n_nodes is None:
        n_nodes = int(max(src.max(), dst.max())) + 1 if len(src) else 0
    if n_nodes >= 1 << 31:
        raise ValueError("MemoryMappedDirectedGraph holds int32 ids: "
                         f"n={n_nodes} exceeds 2^31-1")
    if len(src) and (src.min() < 0 or dst.min() < 0):
        raise ValueError("node ids must be non-negative dense ints")
    n = int(n_nodes)
    header_len = 16 + 8 * (n + 1) * 2

    def csr(a: np.ndarray, b: np.ndarray):
        order = np.lexsort((b, a))
        deg = np.bincount(a, minlength=n).astype(np.int64)
        return deg, b[order].astype(">i4")

    out_deg, out_nbrs = csr(src, dst)
    in_deg, in_nbrs = csr(dst, src)
    out_off = header_len + 4 * np.concatenate(([0], np.cumsum(out_deg)))
    in_off = out_off[-1] + 4 * np.concatenate(([0], np.cumsum(in_deg)))
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(np.array([0, n], dtype=">i8").tobytes())
        f.write(out_off.astype(">i8").tobytes())
        f.write(in_off.astype(">i8").tobytes())
        f.write(out_nbrs.tobytes())
        f.write(in_nbrs.tobytes())
    os.replace(tmp, path)
    return n


def read_mmap_graph(path: str):
    """Read a Cassovary ``MemoryMappedDirectedGraph`` binary file into
    ``(n_nodes, src, dst)`` int64 numpy arrays (one row per out-edge, the
    same edges the in-neighbor section mirrors). The read is a
    numpy-memmap slice of the out section — loading cost is the OS page-in,
    matching the reference's load model (``:21-25``)."""
    with open(path, "rb") as f:
        head = np.frombuffer(f.read(16), dtype=">i8")
        n = int(head[1])
        out_off = np.frombuffer(f.read(8 * (n + 1)), dtype=">i8").astype(np.int64)
    header_len = 16 + 8 * (n + 1) * 2
    m_out = (out_off[-1] - out_off[0]) // 4
    nbrs = np.memmap(path, dtype=">i4", mode="r",
                     offset=header_len, shape=(int(m_out),))
    out_deg = np.diff(out_off) // 4
    src = np.repeat(np.arange(n, dtype=np.int64), out_deg)
    dst = np.asarray(nbrs, dtype=np.int64)
    return n, src, dst


def mmap_graph_edges(path: str):
    """``read_mmap_graph`` as a ``Dataset(src, dst)`` — feed straight into
    :func:`cassovary_ray.layout.build_edge_layout` to bring an existing
    Cassovary binary graph onto the engine."""
    import pyarrow as _pa

    import ray.data

    n, src, dst = read_mmap_graph(path)
    return ray.data.from_arrow(_pa.table({
        "src": _pa.array(src, _pa.int64()),
        "dst": _pa.array(dst, _pa.int64())}))
