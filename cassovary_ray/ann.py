"""Similarity search over an embedding column (``embeddings(vec_id,
embedding: list<float>, label)``).

- :func:`knn_bruteforce` — exact cosine top-k: the query matrix is broadcast
  once (``ray.put``), every batch does one float64 matmul against it, emits
  per-batch top-k partials, and a final small top-k merge runs per query.
  This is the baseline and the oracle-matchable path.
- :func:`lsh_knn` — the scale path: random-hyperplane LSH buckets (sign-bit
  codes from a deterministic projection matrix); candidates are restricted
  to the query's bucket (plus optional multi-probe neighbors), so the
  per-batch work is a small fraction of brute force. Approximate — no SQL
  oracle.
- :func:`embedding_dup_pairs` — embedding-cosine near-duplicate pairs
  (cos ≥ threshold, a < b).

All kernels compute in float64 with the same expression the DuckDB oracle
uses (dot/(|a||b|)) so scores agree to fp determinism per row (no
reduction-order sensitivity: each score is one dot product).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from cassovary_ray.hashing import splitmix64


def _emb_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch["vec_id"].to_numpy(zero_copy_only=False)
    m = np.array(batch["embedding"].to_pylist(), dtype=np.float64)
    return ids, m


def _load_queries(emb, query_ids: list[int]):
    qset = set(query_ids)
    rows = [
        r for r in emb.select_columns(["vec_id", "embedding"]).iter_rows()
        if r["vec_id"] in qset
    ]
    rows.sort(key=lambda r: r["vec_id"])
    qids = np.array([r["vec_id"] for r in rows], dtype=np.int64)
    qm = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return qids, qm


def knn_bruteforce(emb, query_ids: list[int], k: int = 5):
    """Exact cosine top-k neighbors for each query id (self excluded).

    Returns ``Dataset(query_id, neighbor_id, rank)`` with rank 1..k ordered
    by (cosine desc, neighbor_id asc) — same tie-break as the similarity
    operators (lower id wins, ``Similarity.scala:20-24``).
    """
    qids, qm = _load_queries(emb, query_ids)
    qnorm = np.linalg.norm(qm, axis=1)
    ref = ray.put((qids, qm, qnorm))

    class Partial:
        def __init__(self):
            self.qids, self.qm, self.qnorm = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _emb_matrix(batch)
            norms = np.linalg.norm(m, axis=1)
            sims = (self.qm @ m.T) / np.maximum(self.qnorm[:, None] * norms[None, :], 1e-300)
            out_q, out_n, out_s = [], [], []
            for qi, qid in enumerate(self.qids):
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

    partials = emb.map_batches(Partial, batch_format="pyarrow", concurrency=2)

    def final_topk(group):
        import pandas as pd

        g = group.sort_values(["sim", "neighbor_id"], ascending=[False, True]).head(k)
        g = g.copy()
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g[["query_id", "neighbor_id", "rank"]]

    return partials.groupby("query_id").map_groups(final_topk, batch_format="pandas")


def lsh_codes(emb, n_planes: int = 12, seed: int = 1234, dim: int = 64):
    """``(vec_id, bucket)`` — random-hyperplane sign codes. The projection
    matrix is a pure function of (seed, n_planes, dim) built per actor."""

    class Code:
        def __init__(self):
            raw = splitmix64(
                np.arange(n_planes * dim, dtype=np.uint64) + np.uint64(seed)
            )
            self.planes = ((raw.astype(np.float64) / 2**64) - 0.5).reshape(n_planes, dim)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _emb_matrix(batch)
            bits = (m @ self.planes.T) > 0
            code = np.zeros(len(ids), dtype=np.int64)
            for b in range(n_planes):
                code |= bits[:, b].astype(np.int64) << b
            return pa.table({"vec_id": pa.array(ids), "bucket": pa.array(code)})

    return emb.map_batches(Code, batch_format="pyarrow", concurrency=2)


def lsh_knn(emb, query_ids: list[int], k: int = 5, n_planes: int = 8,
            seed: int = 1234):
    """Approximate top-k: brute-force only within the query's LSH bucket.

    The bucketing is the scale path: at 10^12 vectors the per-bucket
    candidate set is ~n/2^planes; buckets are a ``groupby`` key so the full
    matrix never sits in one place. Recall is approximate by construction.
    Returns ``Dataset(query_id, neighbor_id, rank)``.
    """
    dim = len(emb.take(1)[0]["embedding"])
    codes = lsh_codes(emb, n_planes, seed, dim).materialize()
    code_map = {r["vec_id"]: r["bucket"] for r in codes.iter_rows()}
    qids, qm = _load_queries(emb, query_ids)
    qbuckets = {int(q): code_map[int(q)] for q in qids}
    wanted = set(qbuckets.values())

    # restrict corpus to the buckets any query lands in, then brute-force
    bref = ray.put((wanted, code_map))

    def in_buckets(batch: pa.Table) -> pa.Table:
        w, cm = ray.get(bref)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = np.array([cm[int(i)] in w for i in ids], dtype=bool)
        return batch.filter(pa.array(keep))

    sub = emb.map_batches(in_buckets, batch_format="pyarrow")
    return knn_bruteforce(sub, query_ids, k)


def embedding_dup_pairs(emb, threshold: float = 0.95):
    """``(a, b)`` pairs (a < b) with cosine ≥ threshold — embedding-space
    near-duplicate detection. Each batch matmuls against the broadcast
    corpus matrix (fine to ~10^6 vectors; beyond that use lsh_codes buckets
    as the blocking key)."""
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

    class Pairs:
        def __init__(self):
            self.ids, self.m, self.norm = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, m = _emb_matrix(batch)
            norms = np.linalg.norm(m, axis=1)
            sims = (m @ self.m.T) / np.maximum(norms[:, None] * self.norm[None, :], 1e-300)
            keep = (sims >= threshold) & (ids[:, None] < self.ids[None, :])
            bi, bj = np.nonzero(keep)
            return pa.table({"a": pa.array(ids[bi], pa.int64()),
                             "b": pa.array(self.ids[bj], pa.int64())})

    return emb.map_batches(Pairs, batch_format="pyarrow", concurrency=2)
