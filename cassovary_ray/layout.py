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


def random_node_parts(vertex_ids, num_parts: int, seed: int = 1) -> np.ndarray:
    """``RandomNodeMapper`` analogue (``Partitioner.scala:36-38``): a
    "random" partition per node, as a PURE FUNCTION of (seed, id) via the
    counter RNG — deterministic at any parallelism, unlike the reference's
    stateful ``Random``. Use for storage balancing; the engine's CSR
    layouts need the co-locating ``src % P`` (``HashSourceMapper``) instead.
    Returns int64 partition ids in [0, num_parts)."""
    from cassovary_ray.hashing import counter_rng_uniform

    u = counter_rng_uniform(seed, np.asarray(vertex_ids, dtype=np.int64), 0)
    return (u * num_parts).astype(np.int64)


def assign_random_parts(ds, num_parts: int, seed: int = 1,
                        id_col: str = "vertex"):
    """Dataset helper over :func:`random_node_parts`: append a ``part``
    column for a random (but deterministic) node→instance assignment."""

    def kernel(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "part", pa.array(random_node_parts(ids, num_parts, seed), pa.int64()))

    return ds.map_batches(kernel, batch_format="pyarrow")


def _undirect(batch: pa.Table) -> pa.Table:
    """Edge batch → batch ∪ reversed batch (weak-direction view for WCC/LP)."""
    fwd = batch.select(["src", "dst"])
    rev = pa.table({"src": batch["dst"], "dst": batch["src"]})
    return pa.concat_tables([fwd, rev])


def _drop_self_loops(batch: pa.Table) -> pa.Table:
    return batch.filter(pc.invert(pc.equal(batch["src"], batch["dst"])))


# per-process batch sequence numbers keyed by task id: a Ray retry reuses
# the task id and replays the same batches in order, so (task_id, seq)
# filenames make the direct partitioned write idempotent under retries.
_TASK_SEQ: dict[str, int] = {}


def _task_file_stem() -> str:
    import uuid

    import ray

    try:
        tid = ray.get_runtime_context().get_task_id() or ""
    except Exception:
        tid = ""
    if not tid:  # driver-side execution (local scheduler edge case)
        tid = f"drv-{uuid.uuid4().hex[:12]}"
    seq = _TASK_SEQ.get(tid, 0)
    _TASK_SEQ[tid] = seq + 1
    return f"t{tid[:20]}-{seq}"


def _write_part_file(table: pa.Table, table_dir: str, part: int, stem: str,
                     sorted_ints: bool = False) -> None:
    import pyarrow.parquet as pq

    d = os.path.join(table_dir, f"part={part}")
    os.makedirs(d, exist_ok=True)
    tmp = os.path.join(d, f".{stem}.parquet.tmp")
    # snappy: measured ~2x faster than zstd on int64 edge columns and the
    # build is write-throughput-bound; shard loads re-read each file once.
    # sorted int64 columns (the vertex stream) delta-pack ~5x smaller.
    if sorted_ints:
        pq.write_table(table, tmp, compression="snappy",
                       use_dictionary=False,
                       column_encoding="DELTA_BINARY_PACKED")
    else:
        pq.write_table(table, tmp, compression="snappy")
    os.replace(tmp, os.path.join(d, f"{stem}.parquet"))


def _write_partitioned(ds, edges_dir, verts_dir, num_parts: int, *,
                       weighted: bool = False, vertex_only: bool = False,
                       batch_size: int = 1 << 21) -> int:
    """One streaming pass: split each batch by hash partition and write the
    per-part parquet files directly (plus, for edge batches, the batch's
    local unique endpoints into the vertex table). Returns total rows
    written to the primary table. See build_edge_layout for the rationale
    vs sort+write_parquet(partition_cols)."""

    def write_batch(batch: pa.Table) -> pa.Table:
        stem = _task_file_stem()
        n = len(batch)
        if n == 0:
            return pa.table({"rows": pa.array([0], pa.int64())})
        if vertex_only:
            v = batch["vertex"].to_numpy(zero_copy_only=False)
            vp = v % num_parts
            order = np.argsort(vp, kind="stable")
            v, vp = v[order], vp[order]
            bounds = np.searchsorted(vp, np.arange(num_parts + 1))
            for p in range(num_parts):
                lo, hi = bounds[p], bounds[p + 1]
                if lo == hi:
                    continue
                _write_part_file(pa.table({"vertex": pa.array(v[lo:hi], pa.int64())}),
                                 verts_dir, p, stem, sorted_ints=True)
            return pa.table({"rows": pa.array([n], pa.int64())})

        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        w = batch["weight"].to_numpy(zero_copy_only=False) if weighted else None
        part = src % num_parts
        order = np.argsort(part, kind="stable")
        src, dst, part = src[order], dst[order], part[order]
        if w is not None:
            w = w[order]
        bounds = np.searchsorted(part, np.arange(num_parts + 1))
        for p in range(num_parts):
            lo, hi = bounds[p], bounds[p + 1]
            if lo == hi:
                continue
            cols = {"src": pa.array(src[lo:hi], pa.int64()),
                    "dst": pa.array(dst[lo:hi], pa.int64())}
            if w is not None:
                cols["weight"] = pa.array(w[lo:hi], pa.float64())
            _write_part_file(pa.table(cols), edges_dir, p, stem)
        # vertex universe contribution: this batch's unique endpoints,
        # re-split by vertex % P (shards np.unique their partition at load)
        v = np.unique(np.concatenate([src, dst]))
        vp = v % num_parts
        vorder = np.argsort(vp, kind="stable")
        v, vp = v[vorder], vp[vorder]
        vbounds = np.searchsorted(vp, np.arange(num_parts + 1))
        for p in range(num_parts):
            lo, hi = vbounds[p], vbounds[p + 1]
            if lo == hi:
                continue
            _write_part_file(pa.table({"vertex": pa.array(v[lo:hi], pa.int64())}),
                             verts_dir, p, stem, sorted_ints=True)
        return pa.table({"rows": pa.array([n], pa.int64())})

    stats = ds.map_batches(write_batch, batch_format="pyarrow",
                           batch_size=batch_size)
    total = stats.sum("rows")
    return int(total or 0)


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

    # SINGLE streaming pass, no sort shuffle (VERDICT r2 #3): each write
    # task splits its batch by part with one argsort and appends one parquet
    # file per TOUCHED part dir directly, and derives the batch's LOCAL
    # unique endpoints (per-batch combiner) into vertex part files in the
    # same pass — the hive directory tree IS the shuffle, materialized at
    # write time instead of through a full range-partition sort + a second
    # read-back pass for the vertex universe and a third for the count.
    # File-count discipline: a large batch_size (4M rows) keeps files ≥
    # ~batch/P rows, so shard loads stay open()-cheap (the r1 8.5k-tiny-file
    # regression was from unsorted write_parquet fan-out of SMALL blocks).
    # Retry-safety: filenames are (task_id, seq) — a retried task reproduces
    # its batch sequence and os.replace()-overwrites its own files, so a
    # retry never duplicates rows.
    import ray.data

    n_edges = _write_partitioned(
        ds, edges_dir, verts_dir, num_parts, weighted=weighted)
    _ensure_nonempty(edges_dir, ["src", "dst"],
                     float_cols=["weight"] if weighted else None)
    if vertices_ds is not None:
        _write_partitioned(
            vertices_ds.select_columns(["vertex"]), None, verts_dir,
            num_parts, vertex_only=True)
    _ensure_nonempty(verts_dir, ["vertex"])
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


def update_edge_layout(layout_dir: str, added_edges=None, removed_edges=None,
                       *, removals_pre_resolved: bool = False) -> dict:
    """Incremental layout maintenance for a re-crawl delta
    (:func:`cassovary_ray.extract.capture_delta` → re-extracted edges):
    apply added/removed edge Datasets to an existing layout, rewriting ONLY
    the partitions the delta touches — a 10^12-doc recrawl must not rebuild
    the world. Returns the updated manifest.

    Semantics:
    - the manifest's normalization flags (reverse / drop_self_loops /
      undirected / dedup) are re-applied to the delta, so an updated layout
      equals a fresh build over the updated edge set;
    - the vertex universe is MONOTONE: new endpoints are appended, but
      removing a vertex's last edge leaves it in the universe as an empty
      node (the reference's ``createEmptyNodes`` semantics — empty nodes
      are first-class). Shards dedup their vertex partition at load, so
      appends are cheap (no read-modify-write on the vertex table);
    - weighted layouts are not supported (combine weights upstream and
      rebuild);
    - removal is ALL-COPIES: in a non-dedup layout, removing (u, v) deletes
      every multiset copy of that edge in the partition, regardless of how
      many times (u, v) appears in ``removed_edges``. This is exact for the
      whole-page-replacement recrawl flow (a page's outlinks are replaced
      wholesale, so every prior copy must go), but callers wanting to delete
      ONE instance of a duplicated edge need a counted anti-join upstream —
      this function does not do multiplicity-aware removal;
    - removals from an UNDIRECTED layout are ambiguous from directed rows
      alone (the undirected row survives while ANY directed counterpart
      does — multiplicity the dedup'd layout no longer records), so they
      raise unless ``removals_pre_resolved=True``, by which the caller
      asserts each removed (a, b) means "delete the undirected edge
      entirely" (both mirrored rows);
    - partition rewrite is write-new-then-delete-old, NOT crash-atomic: a
      crash between the two steps can leave a partition with both files.
      Re-running the same update is NOT idempotent for non-dedup layouts;
      rebuild the affected partitions (or the layout) after a mid-update
      crash.

    Scale shape: the delta is hash-partitioned by the SAME ``src % P`` key
    as the layout (one staging write), then one Ray task per affected
    partition merges old ∖ removed ∪ added — O(delta + touched partitions),
    independent of total graph size.
    """
    import shutil

    import pyarrow.parquet as pq

    import ray
    import ray.data

    man = read_layout_manifest(layout_dir)
    if man.get("weighted"):
        raise ValueError("update_edge_layout does not support weighted "
                         "layouts; combine weights upstream and rebuild")
    if man.get("undirected") and removed_edges is not None \
            and not removals_pre_resolved:
        raise ValueError(
            "removals from an undirected layout are ambiguous (the layout "
            "no longer records directed multiplicity); pass "
            "removals_pre_resolved=True if each removed (a, b) means "
            "'delete the undirected edge entirely', or rebuild")
    P = int(man["num_parts"])
    edges_dir = os.path.join(layout_dir, "edges")
    verts_dir = os.path.join(layout_dir, "vertices")
    staging = os.path.join(layout_dir, "_delta_staging")
    shutil.rmtree(staging, ignore_errors=True)

    def normalize(ds):
        if ds is None:
            return None
        if man["reverse"]:
            ds = ds.map_batches(
                lambda b: pa.table({"src": b["dst"], "dst": b["src"]}),
                batch_format="pyarrow")
        else:
            ds = ds.select_columns(["src", "dst"])
        if man["drop_self_loops"]:
            ds = ds.map_batches(_drop_self_loops, batch_format="pyarrow")
        if man["undirected"]:
            ds = ds.map_batches(_undirect, batch_format="pyarrow")
        return ds.map_batches(lambda b: _add_part_src(b, P),
                              batch_format="pyarrow")

    def stage(ds, name):
        if ds is None:
            return set()
        out = os.path.join(staging, name)
        ds.write_parquet(out, partition_cols=["part"])
        if not os.path.isdir(out):
            return set()
        return {int(d.split("=", 1)[1]) for d in os.listdir(out)
                if d.startswith("part=")}

    parts_add = stage(normalize(added_edges), "add")
    parts_rm = stage(normalize(removed_edges), "rm")
    affected = sorted(parts_add | parts_rm)
    if not affected:
        shutil.rmtree(staging, ignore_errors=True)
        return man

    @ray.remote(num_cpus=1)
    def rewrite(p: int) -> tuple[int, int, int]:
        part_dir = os.path.join(edges_dir, f"part={p}")
        os.makedirs(part_dir, exist_ok=True)
        old_files = [os.path.join(part_dir, f) for f in os.listdir(part_dir)
                     if f.endswith(".parquet")]
        old = (pa.concat_tables([pq.read_table(f, columns=["src", "dst"])
                                 for f in old_files])
               if old_files else pa.table({"src": pa.array([], pa.int64()),
                                           "dst": pa.array([], pa.int64())}))
        n_old = len(old)

        def read_stage(name):
            d = os.path.join(staging, name, f"part={p}")
            if not os.path.isdir(d):
                return None
            t = pq.read_table(d, columns=["src", "dst"])
            return t if len(t) else None

        rm = read_stage("rm")
        cur_s = old["src"].to_numpy(zero_copy_only=False)
        cur_d = old["dst"].to_numpy(zero_copy_only=False)
        if rm is not None:
            # pack (src, dst) via the partition-local dst domain — ids are
            # arbitrary int64, so match with a structured view instead
            pairs = np.rec.fromarrays([cur_s, cur_d])
            drop = np.rec.fromarrays([
                rm["src"].to_numpy(zero_copy_only=False),
                rm["dst"].to_numpy(zero_copy_only=False)])
            keep = ~np.isin(pairs, drop)
            cur_s, cur_d = cur_s[keep], cur_d[keep]
        add = read_stage("add")
        if add is not None:
            cur_s = np.concatenate([cur_s, add["src"].to_numpy(zero_copy_only=False)])
            cur_d = np.concatenate([cur_d, add["dst"].to_numpy(zero_copy_only=False)])
        if man["dedup"] and len(cur_s):
            pairs = np.rec.fromarrays([cur_s, cur_d])
            _, idx = np.unique(pairs, return_index=True)
            cur_s, cur_d = cur_s[idx], cur_d[idx]
        new = pa.table({"src": pa.array(cur_s, pa.int64()),
                        "dst": pa.array(cur_d, pa.int64())})
        tmp = os.path.join(part_dir, "data-updated.parquet.tmp")
        pq.write_table(new, tmp)
        os.replace(tmp, os.path.join(part_dir, "data-updated.parquet"))
        for f in old_files:
            if os.path.basename(f) != "data-updated.parquet":
                os.unlink(f)
        return p, n_old, len(new)

    results = ray.get([rewrite.remote(p) for p in affected])
    delta_rows = sum(n_new - n_old for _, n_old, n_new in results)

    # vertex universe: append the delta's endpoints (monotone; shards dedup)
    if parts_add:
        add_ds = ray.data.read_parquet(
            os.path.join(staging, "add"), columns=["src", "dst"])

        def endpoints(batch: pa.Table) -> pa.Table:
            v = np.unique(np.concatenate([
                batch["src"].to_numpy(zero_copy_only=False),
                batch["dst"].to_numpy(zero_copy_only=False)]))
            return pa.table({"vertex": pa.array(v, pa.int64()),
                             "part": pa.array(v % P, pa.int64())})

        add_ds.map_batches(endpoints, batch_format="pyarrow").write_parquet(
            verts_dir, partition_cols=["part"])

    shutil.rmtree(staging, ignore_errors=True)
    man["n_edges"] = int(man["n_edges"]) + int(delta_rows)
    tmp = os.path.join(layout_dir, MANIFEST_NAME + ".tmp")
    with open(tmp, "w") as f:
        json.dump(man, f, indent=1)
    os.replace(tmp, os.path.join(layout_dir, MANIFEST_NAME))
    return man


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
