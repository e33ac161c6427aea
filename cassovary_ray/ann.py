"""Similarity search over an embedding column (``embeddings(vec_id,
embedding: list<float>, label)``).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch does one float64 matmul against it, emits
  per-batch top-k partials, and a final small top-k merge runs per query.
  This is the baseline and the oracle-matchable path. Query vectors are
  fetched with a DISTRIBUTED filter (only the ≤Q matching rows cross to the
  driver), never a full-table scan.
- :func:`lsh_knn` — the scale path: random-hyperplane LSH buckets (sign-bit
  codes from a deterministic projection matrix); candidates are restricted
  to the buckets the queries land in. The bucket of a row is a PURE FUNCTION
  of its embedding, so the restriction is recomputed inside the filter stage
  from the broadcast (tiny) wanted-bucket set — no per-row driver state, no
  shuffle join, nothing materialized. Approximate — no SQL oracle.
- :func:`embedding_dup_pairs` — embedding-cosine near-duplicate pairs
  (cos ≥ threshold, a < b) via broadcast corpus matrix: exact, bounded to
  ~10^6 vectors (documented).
- :func:`embedding_dup_pairs_lsh` — the LSH-BLOCKED near-dup variant for
  corpus scale: per band, rows are grouped by their sign-bit bucket
  (``groupby`` — a hash shuffle on the bucket key, never all-pairs) and
  verified with exact cosine INSIDE the bucket group, where both vectors are
  already co-located; bands are unioned and pairs deduped with a groupby.
  Oversized buckets are star-linked (see docstring) so one degenerate bucket
  cannot emit O(n²) pairs.

All kernels compute in float64 with the same expression the DuckDB oracle
uses (dot/(|a||b|)) so scores agree to fp determinism per row (no
reduction-order sensitivity: each score is one dot product).
"""

from __future__ import annotations

import functools

import numpy as np
import pyarrow as pa

import ray

from cassovary_ray.hashing import splitmix64

from cassovary_ray import compat

# Ray 2.49 workarounds (see compat.py): empty-first-block hash-join schema
# broadcast, and Project skipping empty blocks (schema drift into joins).
# Installed here because this module issues Dataset.join calls.
compat.install()

# Stage functions below are TASK pools, not actor pools, on purpose: their
# only per-worker state is (a) the lru-cached projection matrix — a pure
# function of (n_planes, seed, dim), cached per worker process — and (b) a
# ray.get of a broadcast ref, which is a zero-copy local plasma read after
# the first pull on each node. Actor pools with num_cpus=1 PIN their CPUs
# for the pipeline's lifetime and starve downstream groupby/aggregate stages
# on small clusters (measured round 1; see also engine.py's num_cpus=0
# shard-actor note) — tasks release CPUs between batches.


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    """(ids, row-major float64 matrix) — zero-ish-copy: flatten the Arrow
    list column's value buffer and reshape (uniform-length embeddings)."""
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    col = batch["embedding"].combine_chunks()
    if isinstance(col, pa.ChunkedArray):  # zero chunks edge case
        return ids, np.empty((0, 0), dtype=np.float64)
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64, copy=False)
    if len(ids) == 0:
        return ids, flat.reshape(0, 0)
    dim = len(flat) // len(ids)
    return ids, flat.reshape(len(ids), dim)


def _load_queries(emb, query_ids: list[int]):
    """Fetch the query vectors with a distributed filter: each batch keeps
    only vec_id ∈ query set, so exactly ≤len(query_ids) rows reach the
    driver (the round-1 version full-scanned the table through driver
    ``iter_rows`` — a scale-killer on the ingest side)."""
    qarr = np.sort(np.asarray(list(set(query_ids)), dtype=np.int64))
    qref = ray.put(qarr)

    def keep_queries(batch: pa.Table) -> pa.Table:
        q = ray.get(qref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(q, ids)
        ok = (pos < len(q)) & (q[np.minimum(pos, len(q) - 1)] == ids)
        return batch.filter(pa.array(ok))

    rows = (
        emb.select_columns(["vec_id", "embedding"])
        .map_batches(keep_queries, batch_format="pyarrow")
        .take(len(qarr))
    )
    rows.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    qm = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return qids, qm


def knn_bruteforce(emb, query_ids: list[int], k: int = 5,
                   _queries: tuple | None = None):
    """Exact cosine top-k neighbors for each query id (self excluded).

    Returns ``Dataset(query_id, neighbor_id, rank)`` with rank 1..k ordered
    by (cosine desc, neighbor_id asc) — same tie-break as the similarity
    operators (lower id wins, ``Similarity.scala:20-24``).
    """
    qids, qm = _queries if _queries is not None else _load_queries(emb, query_ids)
    qnorm = np.linalg.norm(qm, axis=1)
    ref = ray.put((qids, qm, qnorm))

    def partial_topk(batch: pa.Table) -> pa.Table:
        bqids, bqm, bqnorm = ray.get(ref)
        ids, m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        sims = (bqm @ m.T) / np.maximum(bqnorm[:, None] * norms[None, :], 1e-300)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(bqids):
            s = sims[qi]
            mask = ids != qid
            cand_ids, cand_s = ids[mask], s[mask]
            top = min(k, len(cand_ids))
            if top == 0:
                continue
            sel = np.argsort(-cand_s, kind="stable")[:top]
            out_q.append(np.full(top, qid, np.int64))
            out_n.append(cand_ids[sel])
            out_s.append(cand_s[sel])
        if not out_q:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             "neighbor_id": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})
        return pa.table({"query_id": pa.array(np.concatenate(out_q)),
                         "neighbor_id": pa.array(np.concatenate(out_n)),
                         "sim": pa.array(np.concatenate(out_s), pa.float64())})

    partials = emb.map_batches(partial_topk, batch_format="pyarrow")

    def final_topk(group):
        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


@functools.lru_cache(maxsize=32)
def _planes(n_planes: int, seed: int, dim: int) -> np.ndarray:
    """Deterministic random-hyperplane matrix — a pure function of
    (seed, n_planes, dim); lru-cached per worker process, never shipped."""
    raw = splitmix64(np.arange(n_planes * dim, dtype=np.uint64) + np.uint64(seed))
    # np.float64(2**64) keeps the array float64 (a bare python-int 2**64
    # exceeds int64 and silently promoted the whole matrix to object dtype);
    # 2^64 is a power of two, so the quotient values are bit-identical.
    return ((raw.astype(np.float64) / np.float64(2**64)) - 0.5).reshape(n_planes, dim)


def _sign_codes(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    bits = (m @ planes.T) > 0
    # pack sign bits into an int64 bucket key
    return (bits.astype(np.int64) << np.arange(planes.shape[0], dtype=np.int64)).sum(axis=1)


def lsh_codes(emb, n_planes: int = 12, seed: int = 1234, dim: int = 64):
    """``(vec_id, bucket)`` — random-hyperplane sign codes. The projection
    matrix is a pure function of (seed, n_planes, dim) built per actor."""

    def code(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        c = _sign_codes(m, _planes(n_planes, seed, dim)) if len(ids) else np.empty(0, np.int64)
        return pa.table({"vec_id": pa.array(ids), "bucket": pa.array(c)})

    return emb.map_batches(code, batch_format="pyarrow")


def lsh_knn(emb, query_ids: list[int], k: int = 5, n_planes: int = 8,
            seed: int = 1234):
    """Approximate top-k: brute-force only within the queries' LSH buckets.

    Scale shape: the query vectors are fetched with a distributed filter,
    their buckets computed on the driver (Q tiny), and the ≤Q wanted bucket
    ids broadcast; the corpus restriction stage recomputes each row's bucket
    from its embedding (pure function of the broadcast projection seed) and
    keeps matching rows — ONE streaming pass, no per-row driver state, no
    join, no materialization. At 10^12 vectors the candidate set is
    ~n·Q/2^planes. Recall is approximate by construction.
    Returns ``Dataset(query_id, neighbor_id, rank)``.
    """
    qids, qm = _load_queries(emb, query_ids)
    dim = qm.shape[1]
    wanted = np.unique(_sign_codes(qm, _planes(n_planes, seed, dim)))
    wref = ray.put(wanted)

    def in_buckets(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)
        ids, m = _emb_matrix(batch)
        if not len(ids):
            return batch
        code = _sign_codes(m, _planes(n_planes, seed, dim))
        pos = np.searchsorted(w, code)
        ok = (pos < len(w)) & (w[np.minimum(pos, len(w) - 1)] == code)
        return batch.filter(pa.array(ok))

    sub = emb.map_batches(in_buckets, batch_format="pyarrow")
    return knn_bruteforce(sub, query_ids, k, _queries=(qids, qm))


@functools.lru_cache(maxsize=32)
def _ivf_centroids(n_centroids: int, seed: int, dim: int) -> np.ndarray:
    """Deterministic unit-norm centroid matrix — a pure function of
    (seed, n_centroids, dim), like :func:`_planes`. Fixed random directions
    stand in for trained k-means cells: the partitioning guarantee (every
    vector lands in exactly one cell, queries probe few cells) is identical,
    recall just benefits less from data adaptation. A k-means refinement
    would drop in here without touching the dataflow."""
    c = _planes(n_centroids, seed, dim)
    return c / np.linalg.norm(c, axis=1, keepdims=True)


def kmeans_centroids(emb, n_centroids: int = 16, iters: int = 5,
                     seed: int = 4242, dim: int = 64) -> np.ndarray:
    """Lloyd-trained IVF coarse quantizer: init from
    :func:`_ivf_centroids` (deterministic directions), then ``iters``
    streaming passes — each batch emits per-cluster (count, vector-sum)
    partials (≤ n_centroids rows per batch, k×d floats), combined on the
    driver (tiny: blocks × k rows, never the corpus). Empty clusters keep
    their previous centroid. Non-empty centroids are RENORMALIZED to unit
    length after each Lloyd update (spherical k-means, Dhillon & Modha
    2001): assignment is max-inner-product, so unnormalized means would
    bias assignment toward large-norm centroids on cosine-style embeddings.
    Returns the (k, dim) centroid matrix — pass to :func:`ivf_knn` via
    ``centroids=`` for data-adapted cells (same dataflow, better recall).
    Summation order across blocks is not pinned, so centroids are
    deterministic only to float round-off (~1e-15) — document-level results
    should not hash against an oracle."""
    cents = _ivf_centroids(n_centroids, seed, dim)
    for _ in range(iters):
        cref = ray.put(cents)

        def partial(batch: pa.Table, k_: int = n_centroids) -> pa.Table:
            c = ray.get(cref)
            ids, m = _emb_matrix(batch)
            if not len(ids):
                return pa.table({
                    "cid": pa.array([], pa.int64()),
                    "n": pa.array([], pa.int64()),
                    "vsum": pa.array([], pa.list_(pa.float64()))})
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros((k_, m.shape[1]))
            np.add.at(sums, assign, m)
            counts = np.bincount(assign, minlength=k_)
            nz = np.flatnonzero(counts)
            return pa.table({
                "cid": pa.array(nz, pa.int64()),
                "n": pa.array(counts[nz], pa.int64()),
                "vsum": pa.array([sums[i].tolist() for i in nz],
                                 pa.list_(pa.float64()))})

        parts = emb.select_columns(["vec_id", "embedding"]).map_batches(
            partial, batch_format="pyarrow").take_all()
        sums = np.zeros_like(cents)
        counts = np.zeros(n_centroids, np.int64)
        for r in parts:
            sums[r["cid"]] += np.asarray(r["vsum"])
            counts[r["cid"]] += r["n"]
        nz = counts > 0
        cents = cents.copy()
        cents[nz] = sums[nz] / counts[nz, None]
        norms = np.linalg.norm(cents[nz], axis=1, keepdims=True)
        cents[nz] = cents[nz] / np.where(norms > 0, norms, 1.0)
    return cents


def ivf_knn(emb, query_ids: list[int], k: int = 5, n_centroids: int = 16,
            nprobe: int = 4, seed: int = 4242, centroids: np.ndarray | None = None):
    """IVF-style approximate top-k: brute-force only within the ``nprobe``
    centroid cells nearest each query.

    Scale shape mirrors :func:`lsh_knn`: a row's cell is a PURE FUNCTION of
    its embedding (argmax inner product against the broadcast centroid
    matrix, ties → lowest centroid id), so the corpus restriction is one
    streaming ``map_batches`` filter against the broadcast (≤ n_centroids)
    wanted-cell set — no shuffle join, no driver-side assignment map. At
    10^12 vectors the candidate set is ~n·nprobe/n_centroids.
    ``centroids``: optional trained matrix (:func:`kmeans_centroids`) in
    place of the fixed random directions.
    Returns ``Dataset(query_id, neighbor_id, rank)``.
    """
    qids, qm = _load_queries(emb, query_ids)
    dim = qm.shape[1]
    cents = _ivf_centroids(n_centroids, seed, dim) if centroids is None \
        else np.asarray(centroids, dtype=np.float64)
    # top-nprobe cells per query; stable argsort keeps lowest cid on ties
    probes = np.argsort(-(qm @ cents.T), axis=1, kind="stable")[:, :nprobe]
    wanted = np.unique(probes)
    wref = ray.put(wanted)
    cref = ray.put(cents)

    def in_cells(batch: pa.Table) -> pa.Table:
        w = ray.get(wref)
        ids, m = _emb_matrix(batch)
        if not len(ids):
            return batch
        c = ray.get(cref)
        assign = np.argmax(m @ c.T, axis=1)  # first max = lowest cid on ties
        pos = np.searchsorted(w, assign)
        ok = (pos < len(w)) & (w[np.minimum(pos, len(w) - 1)] == assign)
        return batch.filter(pa.array(ok))

    sub = emb.map_batches(in_cells, batch_format="pyarrow")
    return knn_bruteforce(sub, query_ids, k, _queries=(qids, qm))


def embedding_dup_pairs(emb, threshold: float = 0.95):
    """``(a, b)`` pairs (a < b) with cosine ≥ threshold — embedding-space
    near-duplicate detection, EXACT via a broadcast corpus matrix.

    The corpus matrix is collected once through ``iter_batches`` and
    broadcast (``ray.put``); each batch matmuls against it. This is the
    exact/oracle path and is bounded to ~10^6 vectors × dim floats of
    driver+object-store memory — beyond that use
    :func:`embedding_dup_pairs_lsh`, which never co-locates the corpus."""
    ids_all, m_all = [], []
    for b in emb.select_columns(["vec_id", "embedding"]).iter_batches(
        batch_size=1 << 16, batch_format="pyarrow"
    ):
        i, m = _emb_matrix(b)
        ids_all.append(i)
        m_all.append(m)
    ids_all = np.concatenate(ids_all)
    m_all = np.vstack(m_all)
    norm_all = np.linalg.norm(m_all, axis=1)
    ref = ray.put((ids_all, m_all, norm_all))

    def pairs(batch: pa.Table) -> pa.Table:
        cids, cm, cnorm = ray.get(ref)
        ids, m = _emb_matrix(batch)
        norms = np.linalg.norm(m, axis=1)
        sims = (m @ cm.T) / np.maximum(norms[:, None] * cnorm[None, :], 1e-300)
        keep = (sims >= threshold) & (ids[:, None] < cids[None, :])
        bi, bj = np.nonzero(keep)
        return pa.table({"a": pa.array(ids[bi], pa.int64()),
                         "b": pa.array(cids[bj], pa.int64())})

    return emb.map_batches(pairs, batch_format="pyarrow")


def lsh_params_for(threshold: float, *, target_miss: float = 1e-4,
                   max_bands: int = 64, min_planes: int = 2,
                   max_planes: int = 24) -> tuple[int, int]:
    """Threshold-adaptive (n_planes, n_bands) for sign-random-projection
    LSH: under the hyperplane collision model a pair at cosine ≥ t agrees
    on one plane w.p. p₁ = 1 − arccos(t)/π, collides in a band of b planes
    w.p. p₁^b, and is missed by all B bands w.p. (1 − p₁^b)^B. Picks the
    FINEST bands (largest b — smallest buckets, cheapest verify) whose
    required B = ⌈ln(target_miss)/ln(1 − p₁^b)⌉ stays within ``max_bands``;
    a low threshold (wide angle) forces coarse bands + more of them — the
    honest cost of low-threshold cosine LSH. Falls back to
    (min_planes, max_bands) with a residual miss above target when even the
    coarsest bands can't reach it."""
    import math

    p1 = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    for b in range(max_planes, min_planes - 1, -1):
        p_band = p1 ** b
        if not 0.0 < p_band < 1.0:
            continue
        n_bands = math.ceil(math.log(target_miss) / math.log(1.0 - p_band))
        if n_bands <= max_bands:
            return b, n_bands
    return min_planes, max_bands


def embedding_dup_pairs_lsh(emb, threshold: float = 0.95, *,
                            n_planes: int | None = None,
                            n_bands: int | None = None,
                            seed: int = 99, max_bucket: int = 10_000,
                            target_miss: float = 1e-4):
    """LSH-blocked near-duplicate pairs — the corpus-scale path.

    Every row is keyed by its sign-bit bucket in EVERY band inside one
    ``map_batches`` (band b's projection uses an independent seed), with
    band and bucket packed into a single int64 key — so all bands ride ONE
    ``groupby`` shuffle instead of B sequential ones (same total bytes,
    B× fewer all-to-all barriers; the round-3 per-band loop serialized B
    shuffles). Within a (band, bucket) group both vectors are co-located,
    so candidate pairs are verified with EXACT cosine right there — no
    broadcast corpus, no second join, no driver state. A final
    ``groupby(a, b)`` dedups pairs found by several bands.

    Parameters default to :func:`lsh_params_for(threshold, target_miss)` —
    per-pair miss ≤ ``target_miss`` at the stated threshold under the
    hyperplane collision model (exactness *within* a bucket means precision
    is always 1.0). Pass explicit ``n_planes``/``n_bands`` to override.

    Skew guard: a bucket larger than ``max_bucket`` (degenerate mass of
    near-identical vectors) would emit O(n²) pairs; it is instead
    STAR-LINKED — every member is paired with (and verified against) the
    bucket's minimum vec_id only, bounding output to O(n) per bucket while
    keeping that bucket's verified members in one connected component
    (mirrors the reference's hub pruning discipline,
    ``Traverser.scala:93-102``). Members failing the exact check against
    the star center rely on other bands for their edges."""
    from ray.data.aggregate import Count

    from cassovary_ray.analytics import _auto_partitions, _join_safe

    P = _auto_partitions(None)
    if n_planes is None or n_bands is None:
        auto_b, auto_B = lsh_params_for(threshold, target_miss=target_miss)
        n_planes = n_planes if n_planes is not None else auto_b
        n_bands = n_bands if n_bands is not None else auto_B

    def pairs_in_bucket(g):
        import pandas as pd

        ids = g["vec_id"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"a": pd.Series([], dtype=np.int64),
                                 "b": pd.Series([], dtype=np.int64)})
        m = np.array(list(g["embedding"]), dtype=np.float64)
        order = np.argsort(ids)
        ids, m = ids[order], m[order]
        norm = np.linalg.norm(m, axis=1)
        if len(ids) > max_bucket:
            sims = (m @ m[0]) / np.maximum(norm * norm[0], 1e-300)
            keep = (sims >= threshold) & (ids != ids[0])
            return pd.DataFrame({"a": np.full(int(keep.sum()), ids[0], np.int64),
                                 "b": ids[keep].astype(np.int64)})
        sims = (m @ m.T) / np.maximum(norm[:, None] * norm[None, :], 1e-300)
        iu, ju = np.triu_indices(len(ids), k=1)
        hit = sims[iu, ju] >= threshold
        return pd.DataFrame({"a": ids[iu[hit]].astype(np.int64),
                             "b": ids[ju[hit]].astype(np.int64)})

    bands = np.arange(n_bands, dtype=np.int64)

    def all_band_keys(batch: pa.Table) -> pa.Table:
        ids, m = _emb_matrix(batch)
        if not len(ids):
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             "gbucket": pa.array([], pa.int64()),
                             "embedding": batch["embedding"]})
        codes = np.empty((n_bands, len(ids)), dtype=np.int64)
        for band in range(n_bands):
            codes[band] = _sign_codes(
                m, _planes(n_planes, seed + 7919 * band, m.shape[1]))
        # pack (band, bucket) into one key: band << n_planes | bucket
        gbucket = ((bands[:, None] << np.int64(n_planes)) | codes).ravel()
        rep = np.tile(np.arange(len(ids)), n_bands)
        return pa.table({
            "vec_id": pa.array(np.tile(ids, n_bands), pa.int64()),
            "gbucket": pa.array(gbucket, pa.int64()),
            "embedding": batch["embedding"].take(pa.array(rep, pa.int64())),
        })

    keyed = emb.select_columns(["vec_id", "embedding"]).map_batches(
        all_band_keys, batch_format="pyarrow")
    allp = _join_safe(
        keyed.groupby("gbucket").map_groups(pairs_in_bucket,
                                            batch_format="pandas"), P)
    return (
        allp.groupby(["a", "b"])
        .aggregate(Count(alias_name="_c"))
        .select_columns(["a", "b"])
    )


def embedding_dup_clusters(emb, threshold: float = 0.42,
                           num_partitions: int | None = None,
                           method: str = "lsh"):
    """``(vec_id, canonical)`` for EVERY vector: canonical = smallest vec_id
    in the vector's near-duplicate cluster (connected components over the
    cosine near-dup pair graph; singletons map to themselves) — the
    embedding-space twin of ``textops.dedup_clusters``, same composition:
    the pair graph is orders of magnitude smaller than the corpus, so
    clustering shuffles pairs, never vectors. ``keep = (vec_id == canonical)``
    is the deduplicated embedding set.

    ``method="lsh"`` (default — the corpus-scale path, VERDICT r3 #3):
    pairs come from :func:`embedding_dup_pairs_lsh` with threshold-adaptive
    parameters, so nothing in the call chain collects or broadcasts the
    corpus matrix. ``method="exact"`` uses the broadcast-matrix
    :func:`embedding_dup_pairs` (documented ≤10^6-vector bound) — the
    oracle-exact reference path."""
    from cassovary_ray.analytics import (
        _auto_partitions,
        _join_safe,
        components_from_pairs,
    )

    P = _auto_partitions(num_partitions)
    if method == "lsh":
        pair_src = embedding_dup_pairs_lsh(emb, threshold=threshold)
    elif method == "exact":
        pair_src = embedding_dup_pairs(emb, threshold=threshold)
    else:
        raise ValueError(f"method must be 'lsh' or 'exact', got {method!r}")
    pairs = pair_src.select_columns(["a", "b"]).materialize()
    ids = emb.select_columns(["vec_id"])
    if pairs.count() == 0:
        return ids.map_batches(
            lambda b: pa.table({"vec_id": b["vec_id"], "canonical": b["vec_id"]}),
            batch_format="pyarrow")
    comp = components_from_pairs(pairs, num_partitions=P)
    joined = _join_safe(ids, P).join(
        comp, "left_outer", P, on=("vec_id",), right_on=("vertex",))

    def finish(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table({"vec_id": b["vec_id"],
                         "canonical": pc.coalesce(b["component"], b["vec_id"])})

    return joined.map_batches(finish, batch_format="pyarrow")
